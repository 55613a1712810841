"""Optimizer: SGD + momentum with staircase-exponential LR decay and
per-leaf gradient-norm clipping.

Reference semantics (nn_skeleton.py:329-361):

* ``tf.train.exponential_decay(lr0, step, decay_steps, factor,
  staircase=True)`` — lr = lr0 * factor^floor(step / decay_steps);
* ``tf.train.MomentumOptimizer``: accum = m*accum + g; p -= lr*accum;
* each gradient tensor independently clipped with ``tf.clip_by_norm``
  to max L2 norm (nn_skeleton.py:347-349);
* frozen layers are simply absent from ``tf.trainable_variables()`` —
  here their updates are masked to zero.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from squeezedet_tpu.config import ModelConfig


def staircase_exponential_decay(lr0: float, decay_steps: int,
                                decay_factor: float,
                                warmup_steps: int = 0) -> Callable:
    """Reference schedule (nn_skeleton.py:334) with optional linear
    warmup: lr ramps (step+1)/warmup_steps -> 1x over the first
    ``warmup_steps`` updates, then follows the staircase decay.  The
    ramp multiplies the decayed value so warmup_steps > decay_steps
    still composes sensibly (it never does in practice)."""
    def schedule(step):
        lr = lr0 * decay_factor ** jnp.floor(step / decay_steps)
        if warmup_steps > 0:
            lr = lr * jnp.minimum(1.0, (step + 1.0) / warmup_steps)
        return lr
    return schedule


def clip_by_norm_per_leaf(max_norm: float) -> optax.GradientTransformation:
    """tf.clip_by_norm applied leaf-wise: g * max_norm / max(norm, max_norm)."""

    def update_fn(updates, state, params=None):
        del params

        def clip(g):
            norm = jnp.sqrt(jnp.sum(jnp.square(g)))
            return g * (max_norm / jnp.maximum(norm, max_norm))

        return jax.tree.map(clip, updates), state

    return optax.GradientTransformation(lambda params: optax.EmptyState(),
                                        update_fn)


def _is_none(x):
    return x is None


def partition_params(params, trainable_mask):
    """Split a param tree into (trainable, frozen) trees with ``None``
    at the complementary leaves.

    Differentiating the loss w.r.t. only the trainable subtree lets XLA
    dead-code-eliminate the whole backward pass through frozen prefixes
    (e.g. squeezeDet's frozen conv1, squeezeDet.py:40-42: with conv1 and
    the input both excluded from autodiff, conv1's filter grad AND
    pool1's select-and-scatter grad vanish from the program).  The
    reference gets this for free because frozen layers are simply not in
    ``tf.trainable_variables()`` (nn_skeleton.py:67-69).
    """
    trainable = jax.tree.map(lambda p, m: p if m else None, params,
                             trainable_mask)
    frozen = jax.tree.map(lambda p, m: None if m else p, params,
                          trainable_mask)
    return trainable, frozen


def merge_params(trainable, frozen):
    """Inverse of :func:`partition_params`."""
    return jax.tree.map(lambda t, f: f if t is None else t, trainable,
                        frozen, is_leaf=_is_none)


def grads_with_frozen_zeros(grads_trainable, params):
    """Pad a trainable-only grad tree back to the full param structure
    with zeros at frozen leaves (what ``freeze_mask_transform`` would
    have produced), so optimizer state trees keep the full structure."""
    return jax.tree.map(
        lambda g, p: jnp.zeros_like(p) if g is None else g,
        grads_trainable, params, is_leaf=_is_none)


def freeze_mask_transform(trainable_mask) -> optax.GradientTransformation:
    """Zero updates for frozen leaves (mask pytree of bools)."""

    def update_fn(updates, state, params=None):
        del params
        return jax.tree.map(
            lambda g, t: g if t else jnp.zeros_like(g),
            updates, trainable_mask), state

    return optax.GradientTransformation(lambda params: optax.EmptyState(),
                                        update_fn)


def build_optimizer(cfg: ModelConfig,
                    trainable_mask) -> optax.GradientTransformation:
    """Clip -> momentum -> -lr(step), with frozen leaves masked out."""
    schedule = staircase_exponential_decay(
        cfg.learning_rate, cfg.decay_steps, cfg.lr_decay_factor,
        warmup_steps=cfg.lr_warmup_steps)
    return optax.chain(
        freeze_mask_transform(trainable_mask),
        clip_by_norm_per_leaf(cfg.max_grad_norm),
        optax.trace(decay=cfg.momentum, nesterov=False),
        optax.scale_by_schedule(lambda step: -schedule(step)),
    )


def learning_rate_at(cfg: ModelConfig, step: int) -> float:
    lr = float(cfg.learning_rate
               * cfg.lr_decay_factor ** (step // cfg.decay_steps))
    if cfg.lr_warmup_steps > 0:
        lr *= min(1.0, (step + 1.0) / cfg.lr_warmup_steps)
    return lr
