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
                                decay_factor: float) -> Callable:
    def schedule(step):
        return lr0 * decay_factor ** jnp.floor(step / decay_steps)
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
        cfg.learning_rate, cfg.decay_steps, cfg.lr_decay_factor)
    return optax.chain(
        freeze_mask_transform(trainable_mask),
        clip_by_norm_per_leaf(cfg.max_grad_norm),
        optax.trace(decay=cfg.momentum, nesterov=False),
        optax.scale_by_schedule(lambda step: -schedule(step)),
    )


def learning_rate_at(cfg: ModelConfig, step: int) -> float:
    return float(cfg.learning_rate
                 * cfg.lr_decay_factor ** (step // cfg.decay_steps))
