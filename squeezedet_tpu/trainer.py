"""Training driver: jitted train step + the train loop.

Replaces the reference's session loop (train.py:102-335): one jitted
function fuses forward + interpretation + loss + backward + momentum
update on device; the host loop only feeds prefetched batches, logs,
checkpoints and (every summary_step) renders detection visualizations.
Data parallelism: params/opt-state replicated over the mesh, batch
sharded on the ``data`` axis — XLA inserts the gradient all-reduce.
"""

from __future__ import annotations

import os
import sys
import time
from dataclasses import dataclass
from datetime import datetime
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from squeezedet_tpu.checkpoint.manager import CheckpointManager
from squeezedet_tpu.loader import PrefetchLoader
from squeezedet_tpu.models import Detector
from squeezedet_tpu.models.skeleton import Targets
from squeezedet_tpu.optim import build_optimizer, learning_rate_at
from squeezedet_tpu.parallel.mesh import (batch_sharding, image_sharding,
                                          replicated_sharding, shard_batch,
                                          shard_images)


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int = 0

    def as_tree(self):
        return {"params": self.params, "opt_state": self.opt_state,
                "step": np.asarray(self.step, np.int64)}

    @classmethod
    def from_tree(cls, tree):
        return cls(params=tree["params"], opt_state=tree["opt_state"],
                   step=int(tree["step"]))


def make_train_step(det: Detector, tx, mesh=None, donate: bool = True):
    """Build the jitted train step.

    Signature: (params, opt_state, images, targets, rng) ->
    (params, opt_state, LossBreakdown).

    Gradients are taken w.r.t. the trainable subtree only
    (``partition_params``): numerically identical to differentiating
    everything and masking (frozen grads were zeroed by the optimizer
    chain anyway, and XLA's DCE already exploited that — verified in
    the compiled HLO), but the partition makes the frozen-prefix
    backward elimination structural rather than an optimizer-dependent
    cleanup, for every backbone's freeze mask.
    """
    from squeezedet_tpu.optim import (grads_with_frozen_zeros,
                                      merge_params, partition_params)
    mask = det._trainable_mask_cache(None)

    def step_fn(params, opt_state, images, targets: Targets, rng):
        trainable, frozen = partition_params(params, mask)

        def loss_fn(tp):
            lb = det.loss(merge_params(tp, frozen), images, targets,
                          rng=rng, train=True)
            return lb.total, lb

        grads_t, lb = jax.grad(loss_fn, has_aux=True)(trainable)
        grads = grads_with_frozen_zeros(grads_t, params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, lb

    kwargs = {}
    if donate:
        kwargs["donate_argnums"] = (0, 1)
    if mesh is not None:
        rep = replicated_sharding(mesh)
        data = batch_sharding(mesh)
        imgs = image_sharding(mesh)  # + height over 'spatial' if present
        tg_shard = Targets(data, data, data, data)
        kwargs["in_shardings"] = (rep, rep, imgs, tg_shard, rep)
        kwargs["out_shardings"] = (rep, rep, rep)
    return jax.jit(step_fn, **kwargs)


def _apply_update(det: Detector, tx, mask, params, opt_state, images,
                  targets, rng):
    """Forward + backward + optimizer application shared by the
    single-step and scanned train-step builders — ONE home for the
    partition/loss/grad/update sequence so the two programs can never
    desynchronize numerically (the scanned path is contract-bound to be
    bit-equal to K single dispatches, test_train/test_multihost)."""
    from squeezedet_tpu.optim import (grads_with_frozen_zeros,
                                      merge_params, partition_params)
    trainable, frozen = partition_params(params, mask)

    def loss_fn(tp):
        lb = det.loss(merge_params(tp, frozen), images, targets,
                      rng=rng, train=True)
        return lb.total, lb

    grads_t, lb = jax.grad(loss_fn, has_aux=True)(trainable)
    grads = grads_with_frozen_zeros(grads_t, params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = jax.tree.map(lambda p, u: p + u, params, updates)
    return params, opt_state, lb


def make_train_step_device(det: Detector, tx, mesh=None,
                           donate: bool = True,
                           uint8_ingest: bool = False,
                           device_augment: bool = False,
                           device_dataset: bool = False):
    """Train step with the anchor matcher fused into the device program.

    Signature: (params, opt_state, images, gt_boxes, gt_labels, num_gt,
    rng) -> (params, opt_state, LossBreakdown).  Removes the reference's
    O(num_gt x ANCHORS) per-image numpy loop (imdb.py:197-235) from the
    host hot path.

    ``uint8_ingest``: images arrive as raw uint8 and the mean
    subtraction (imdb.py:143-144) is fused into the device program —
    4x less host→device traffic and no f32 convert/relayout on entry.

    ``device_augment``: images arrive as a raw uint8 CANVAS batch plus
    a per-image ``aug`` row (imdb.read_batch_canvas), and the whole
    drift/flip/resize/normalize pipeline runs inside this program
    (device_pipeline.augment_resize_normalize) — the signature gains
    ``aug`` after ``images``.

    ``device_dataset``: the whole split lives in HBM as one uint8
    canvas stack (imdb.load_canvas_dataset) and the step signature
    becomes (params, opt_state, dataset [N,H0,W0,3], pos [B], aug,
    gt_boxes, gt_labels, num_gt, rng): the batch canvas is GATHERED on
    device and runs the same on-device augmentation — per-step
    host->device traffic is index/aug/GT rows only (KBs vs B full
    images), so training wall speed equals device speed even on
    transfer-starved hosts (PARITY.md streaming analysis).  The
    dataset arg is never donated.  On a mesh whose ``data`` axis has
    D > 1 devices the stack is SHARDED over that axis (D chips hold D×
    the dataset, not D replicas) and the gather is shard-local
    (mesh.local_shard_gather + imdb.shard_data's per-shard sampler);
    on a single device or data-axis-1 mesh it stays whole.
    """
    from squeezedet_tpu.data.device_pipeline import ingest_and_assign
    from squeezedet_tpu.parallel.mesh import (data_axis_size,
                                              dataset_sharding,
                                              local_shard_gather)

    mask = det._trainable_mask_cache(None)
    sharded_ds = device_dataset and data_axis_size(mesh) > 1

    def _update(params, opt_state, images, targets, rng):
        return _apply_update(det, tx, mask, params, opt_state, images,
                             targets, rng)

    if device_dataset:
        def step_fn(params, opt_state, dataset, pos, aug, gt_boxes,
                    gt_labels, num_gt, rng):
            if sharded_ds:
                images = local_shard_gather(mesh, dataset, pos)
            else:
                images = jnp.take(dataset, pos, axis=0)
            images, targets = ingest_and_assign(det, images, gt_boxes,
                                                gt_labels, num_gt,
                                                uint8_ingest, aug=aug)
            return _update(params, opt_state, images, targets, rng)
    elif device_augment:
        def step_fn(params, opt_state, images, aug, gt_boxes, gt_labels,
                    num_gt, rng):
            images, targets = ingest_and_assign(det, images, gt_boxes,
                                                gt_labels, num_gt,
                                                uint8_ingest, aug=aug)
            return _update(params, opt_state, images, targets, rng)
    else:
        def step_fn(params, opt_state, images, gt_boxes, gt_labels,
                    num_gt, rng):
            images, targets = ingest_and_assign(det, images, gt_boxes,
                                                gt_labels, num_gt,
                                                uint8_ingest)
            return _update(params, opt_state, images, targets, rng)

    kwargs = {}
    if donate:
        kwargs["donate_argnums"] = (0, 1)
    if mesh is not None:
        rep = replicated_sharding(mesh)
        data = batch_sharding(mesh)
        if device_dataset:
            # dataset rows over 'data' when the axis has >1 device
            # (each chip holds its shard; the gather is shard-local),
            # else replicated; index/aug/GT rows over 'data'
            ds = dataset_sharding(mesh) if sharded_ds else rep
            kwargs["in_shardings"] = (rep, rep, ds) + (data,) * 5 \
                + (rep,)
        else:
            imgs = image_sharding(mesh)  # + height over 'spatial'
            n_data = 4 if device_augment else 3
            kwargs["in_shardings"] = (rep, rep, imgs) + (data,) * n_data \
                + (rep,)
        kwargs["out_shardings"] = (rep, rep, rep)
    return jax.jit(step_fn, **kwargs)


def _sampler_ckpt_path(train_dir: str, step: int) -> str:
    """Input-stream snapshot path for a checkpoint step.  Multi-host
    runs feed disjoint local shards, so every controller saves and
    restores its own per-process file (one shared path would race and
    collapse the hosts' cursors into one stream)."""
    suffix = "" if jax.process_count() == 1 else \
        ".p{}".format(jax.process_index())
    return os.path.join(train_dir,
                        "sampler.ckpt-{}{}.npz".format(step, suffix))


def make_train_step_device_scan(det: Detector, tx, k: int, mesh=None,
                                donate: bool = True,
                                uint8_ingest: bool = False,
                                device_augment: bool = False,
                                device_dataset: bool = False):
    """K device-matcher train steps fused into ONE device program via
    ``lax.scan`` (--steps_per_dispatch).

    Amortizes per-dispatch overhead — host round-trip, transfer
    latency, dispatch bookkeeping — across K steps: the host ships
    [K, B, ...] stacked batches once and gets the params back after K
    updates.  Numerically identical to K single dispatches when fed the
    same per-step RNG keys (pinned by test_train); the measured chain
    experiments behind PARITY.md's device-time numbers used exactly
    this construction.

    Signature: (params, opt_state, images [K,B,H,W,3],
    gt_boxes [K,B,G,4], gt_labels [K,B,G], num_gt [K,B],
    step_rngs [K]) -> (params, opt_state, LossBreakdown with [K]
    leaves, scan order).
    """
    from squeezedet_tpu.data.device_pipeline import ingest_and_assign
    from squeezedet_tpu.parallel.mesh import (data_axis_size,
                                              dataset_sharding,
                                              local_shard_gather)

    mask = det._trainable_mask_cache(None)
    sharded_ds = device_dataset and data_axis_size(mesh) > 1

    def one_step(dataset, carry, xs):
        params, opt_state = carry
        if device_dataset:
            pos, aug, gt_boxes, gt_labels, num_gt, rng = xs
            if sharded_ds:
                images = local_shard_gather(mesh, dataset, pos)
            else:
                images = jnp.take(dataset, pos, axis=0)
        elif device_augment:
            images, aug, gt_boxes, gt_labels, num_gt, rng = xs
        else:
            images, gt_boxes, gt_labels, num_gt, rng = xs
            aug = None
        images, targets = ingest_and_assign(det, images, gt_boxes,
                                            gt_labels, num_gt,
                                            uint8_ingest, aug=aug)
        params, opt_state, lb = _apply_update(
            det, tx, mask, params, opt_state, images, targets, rng)
        return (params, opt_state), lb

    if device_dataset:
        def step_fn(params, opt_state, dataset, *batch_and_rngs):
            (params, opt_state), lbs = jax.lax.scan(
                partial(one_step, dataset), (params, opt_state),
                tuple(batch_and_rngs))
            return params, opt_state, lbs
    else:
        def step_fn(params, opt_state, *batch_and_rngs):
            (params, opt_state), lbs = jax.lax.scan(
                partial(one_step, None), (params, opt_state),
                tuple(batch_and_rngs))
            return params, opt_state, lbs

    kwargs = {}
    if donate:
        kwargs["donate_argnums"] = (0, 1)
    if mesh is not None:
        rep = replicated_sharding(mesh)
        from squeezedet_tpu.parallel.mesh import (stacked_image_sharding,
                                                  stacked_sharding)
        data = stacked_sharding(mesh)
        if device_dataset:
            ds = dataset_sharding(mesh) if sharded_ds else rep
            kwargs["in_shardings"] = (rep, rep, ds) + (data,) * 5 \
                + (rep,)
        else:
            imgs = stacked_image_sharding(mesh)
            n_data = 4 if device_augment else 3
            kwargs["in_shardings"] = (rep, rep, imgs) + (data,) * n_data \
                + (rep,)
        kwargs["out_shardings"] = (rep, rep, rep)
    return jax.jit(step_fn, **kwargs)


def _write_loss_summaries(summary_writer, cfg, step: int, lb) -> None:
    """Per-step scalar summaries, shared by the single-step and scanned
    loops (reference loss summaries, nn_skeleton.py:18-29 + LR/IoU)."""
    summary_writer.scalar("loss/total_loss", float(lb.total), step)
    summary_writer.scalar("loss/confidence_loss", float(lb.conf_loss),
                          step)
    summary_writer.scalar("loss/bounding_box_loss", float(lb.bbox_loss),
                          step)
    summary_writer.scalar("loss/class_loss", float(lb.class_loss), step)
    summary_writer.scalar("mean_iou", float(lb.mean_iou), step)
    summary_writer.scalar("learning_rate", learning_rate_at(cfg, step),
                          step)


def _dispatch_cadences(covered, lb, *, start_time, cfg, log_every,
                       summary_step, summary_writer, checkpoint_step,
                       max_steps, force_materialize=False):
    """The ONE cadence implementation shared by both training loops.

    ``covered`` is the range of steps one device dispatch advanced — K
    for the scanned program, 1 otherwise; ``lb`` is that dispatch's
    loss breakdown (scalar leaves, or [K]-leading for the scan).
    Evaluates the throughput-log / loss-summary / checkpoint cadences
    over every covered step and runs the NaN divergence gate
    (reference train.py:313-325) whenever losses are materialized.

    Loss values are pulled from device ONLY when some cadence (or
    ``force_materialize``, used by the scan loop whose checkpoint gate
    wants per-step totals anyway) asks — quiet steps of the K=1 loop
    stay fully async so host work overlaps device dispatch.

    Returns ``(summary_due, checkpoint_due, totals)``; ``totals`` is
    the materialized per-covered-step loss array (None when nothing
    fired).
    """
    last = covered[-1]
    do_log = any(s % log_every == 0 for s in covered)
    do_summary = summary_writer is not None and any(
        s % summary_step == 0 for s in covered)
    checkpoint_due = any(s % checkpoint_step == 0 for s in covered) \
        or last + 1 == max_steps
    totals = None
    if do_log or do_summary or checkpoint_due or force_materialize:
        totals = np.asarray(lb.total).reshape(-1)
        assert not np.isnan(totals).any(), (
            'Model diverged. Losses in steps [{}..{}]: total {}, '
            'conf {}, bbox {}, class {}'.format(
                covered[0], last, totals,
                np.asarray(lb.conf_loss).reshape(-1),
                np.asarray(lb.bbox_loss).reshape(-1),
                np.asarray(lb.class_loss).reshape(-1)))
    if do_log:
        duration = time.time() - start_time
        k = len(covered)
        per = ('%.3f sec/batch' % duration) if k == 1 else \
            ('%.3f sec/%d-step dispatch' % (duration, k))
        print('%s: step %d, loss = %.2f (%.1f images/sec; %s)' % (
            datetime.now(), last, float(totals[-1]),
            cfg.batch_size * k / duration, per))
        sys.stdout.flush()
    if do_summary:
        lb_last = jax.tree.map(
            lambda x: np.asarray(x).reshape(-1)[-1], lb)
        _write_loss_summaries(summary_writer, cfg, last, lb_last)
    return do_summary, checkpoint_due, totals


def _save_checkpoint(ckpt, train_dir: str, imdb, loader, rng, params,
                     opt_state, *, next_step: int, max_steps: int,
                     totals) -> TrainState:
    """Divergence-gated checkpoint + input-stream snapshot, shared by
    both loops.  Saves under the last covered step (``next_step - 1``);
    blocks only on the final save so the returned state is durable.

    The input-stream snapshot is the CONSUMED batch's sampler state
    (carried through the prefetch queue with each item), so resume
    redraws exactly the batches after the last one this run trained on
    — bit-exact, independent of the prefetch lead.  ``jax_rng_key`` is
    the host key after this step's split, continuing the dropout/step
    RNG trajectory.
    """
    totals = np.asarray(totals)
    # a NaN state must never be checkpointed (and then auto-resumed
    # from); the reference checks every step (train.py:313-315), we
    # gate at least before each save.
    assert np.isfinite(totals).all(), (
        'Model diverged (losses = {}); refusing to checkpoint at step '
        '{}'.format(totals, next_step - 1))
    state = TrainState(params=jax.device_get(params),
                       opt_state=jax.device_get(opt_state),
                       step=next_step)
    # async for intermediate steps: the ~50 MB write overlaps the next
    # train steps; the final step blocks so the returned state is
    # durable before the loop exits.
    ckpt.save(next_step - 1, state.as_tree(), wait=next_step == max_steps)
    stream_state = loader.consumed_state() or imdb.sampler_state()
    np.savez(_sampler_ckpt_path(train_dir, next_step - 1),
             jax_rng_key=np.asarray(jax.random.key_data(rng)),
             jax_rng_impl=np.asarray(str(jax.random.key_impl(rng))),
             **stream_state)
    return state


def viz_prediction_images(det: Detector, params, images_np, targets,
                          max_images: int = 8):
    """Draw GT (green) + filtered predictions (red/class colors) on the
    batch (reference _viz_prediction_result, train.py:74-99).

    ``images_np`` are mean-subtracted BGR floats; means are added back
    and channels flipped so the summary displays naturally.
    Returns [N, H, W, 3] uint8 RGB.
    """
    from squeezedet_tpu.utils.util import draw_box

    cfg = det.cfg
    interp = det.predict_jit(params, jnp.asarray(images_np))
    det_boxes = np.asarray(interp.det_boxes)
    det_probs = np.asarray(interp.det_probs)
    det_class = np.asarray(interp.det_class)
    mask = np.asarray(targets.input_mask)
    gt_boxes = np.asarray(targets.box_input)
    labels = np.asarray(targets.labels)

    out = []
    n = min(max_images, images_np.shape[0])
    for i in range(n):
        im = (images_np[i] + cfg.bgr_means_array()).clip(0, 255) \
            .astype(np.uint8).copy()
        owned = np.nonzero(mask[i] > 0)[0]
        draw_box(im, [gt_boxes[i, a] for a in owned],
                 [cfg.class_names[int(np.argmax(labels[i, a]))]
                  for a in owned], (0, 255, 0))
        boxes, probs, classes = det.filter_prediction(
            det_boxes[i], det_probs[i], det_class[i])
        keep = [k for k in range(len(probs))
                if probs[k] > cfg.plot_prob_thresh]
        draw_box(im, [boxes[k] for k in keep],
                 ['%s: (%.2f)' % (cfg.class_names[classes[k]], probs[k])
                  for k in keep], (0, 0, 255))
        out.append(im[:, :, ::-1])  # BGR -> RGB
    return np.stack(out) if out else np.zeros((0, 1, 1, 3), np.uint8)


def _summary_tag(path) -> str:
    """Pytree key path -> 'conv1/kernel'-style summary tag."""
    parts = []
    for entry in path:
        key = getattr(entry, "key", None)
        parts.append(str(key if key is not None else entry))
    return "/".join(parts)


def write_histograms(summary_writer, params, grads, step: int,
                     trainable_mask=None):
    """Per-variable + per-gradient histograms for the trainable
    variables, like the reference (nn_skeleton.py:353-358 loops over
    ``tf.trainable_variables()`` for both).  ``grads`` may already be a
    trainable-only tree (``None`` at frozen leaves — those flatten away);
    ``params`` is filtered through ``trainable_mask`` when given."""
    from jax.tree_util import tree_flatten_with_path

    from squeezedet_tpu.optim import partition_params

    if trainable_mask is not None:
        params, _ = partition_params(params, trainable_mask)
    for prefix, tree in (("params", params), ("gradients", grads)):
        if tree is None:
            continue
        for path, leaf in tree_flatten_with_path(tree)[0]:
            summary_writer.histogram(
                "{}/{}".format(prefix, _summary_tag(path)),
                np.asarray(leaf), step)


def write_activation_summaries(summary_writer, det: Detector, params,
                               images_np, step: int):
    """Five-stat activation summaries — histogram, sparsity, mean, max,
    min per layer (nn_skeleton.py:736-755).  Stats reduce on device; the
    histogram uses a uniform-stride subsample of the activation."""
    stats = det.activation_stats(params, jnp.asarray(images_np))
    for name, s in stats.items():
        summary_writer.histogram("activations/" + name, s["sample"], step)
        for stat in ("sparsity", "mean", "max", "min"):
            summary_writer.scalar(
                "activation_summary/{}/{}".format(name, stat),
                float(s[stat]), step)


def train(det: Detector, imdb, *, train_dir: str, max_steps: int,
          summary_step: int = 10, checkpoint_step: int = 1000,
          seed: int = 0, mesh=None, resume: bool = True,
          summary_writer=None, log_every: int = 10,
          pretrained: Optional[dict] = None,
          viz_step: int = 0, step_tracer=None,
          device_assign: bool = False, max_gt: int = 48,
          histogram_step: int = 0,
          activation_summary: bool = False,
          uint8_ingest: bool = False,
          steps_per_dispatch: int = 1,
          rng_impl: str = "",
          pallas_grads: bool = False,
          max_to_keep: int = 5,
          device_augment: bool = False,
          device_dataset: bool = False) -> TrainState:
    """Full training loop (reference train.py:102-335).

    ``rng_impl``: PRNG implementation for the step/dropout keys, e.g.
    ``"rbg"`` (hardware RNG — measured +11% train throughput at batch
    128; the dropout stream differs from the default threefry, like any
    seed change would).  The impl is recorded in the input-stream
    snapshot so resume reconstructs the right key type.
    """
    cfg = det.cfg
    os.makedirs(train_dir, exist_ok=True)
    if uint8_ingest and not device_assign:
        raise ValueError("--uint8_ingest requires --device_assign (the "
                         "dense-target path feeds mean-subtracted f32 "
                         "images like the reference)")
    if steps_per_dispatch > 1 and not device_assign:
        raise ValueError("--steps_per_dispatch > 1 requires "
                         "--device_assign (the scanned program fuses "
                         "the anchor matcher per step)")
    if steps_per_dispatch > 1:
        skipped = [flag for flag, on in (
            ("--profile_steps", step_tracer is not None),
            ("--summary_step viz images", bool(viz_step)),
            ("--histogram_step", bool(histogram_step))) if on]
        if skipped:
            print("WARNING: steps_per_dispatch={} fuses K steps into one "
                  "device program; per-step host-side summaries are not "
                  "produced on this path — ignoring: {}. Use "
                  "--steps_per_dispatch 1 to capture them.".format(
                      steps_per_dispatch, ", ".join(skipped)))
    if device_dataset:
        device_augment = True  # same on-device pixel pipeline
    if device_augment:
        if not device_assign:
            raise ValueError("--device_augment requires --device_assign "
                             "(the canvas path feeds the in-graph "
                             "matcher)")
        if getattr(cfg, "use_native_loader", False):
            raise ValueError("--device_augment replaces the host pixel "
                             "pipeline; drop --native_loader")
        # Model-resolution pixels never exist on the host in this mode,
        # but the augmented batch exists ON DEVICE: summary steps replay
        # augment_resize_normalize on the batch's canvas rows (a jitted
        # fetch at summary cadence only) so the reference's detection
        # viz / histograms / activation stats survive (train.py:287-296,
        # nn_skeleton.py:363-372).  Multihost is the one exception: the
        # global batch's pixels span other controllers' hosts.
        if jax.process_count() > 1:
            skipped = [flag for flag, on in (
                ("--summary_step viz images", bool(viz_step)),
                ("--histogram_step", bool(histogram_step)),
                ("--activation_summary", activation_summary)) if on]
            if skipped:
                print("WARNING: --device_augment under multiple "
                      "controllers keeps no global pixel batch on any "
                      "one host; skipping: {}.".format(
                          ", ".join(skipped)))
                viz_step, histogram_step, activation_summary = 0, 0, False

    if mesh is None and len(jax.devices()) > 1:
        from squeezedet_tpu.parallel.mesh import auto_mesh
        mesh = auto_mesh(cfg.batch_size)
    if mesh is None and jax.process_count() > 1:
        # Without a mesh each controller would train an independent
        # replica on its local batch — silent divergence, not DP.  (The
        # scanned branch would otherwise also crash dereferencing mesh.)
        raise ValueError(
            "multi-controller training needs a device mesh, but "
            "batch_size={} has no divisor over the {} devices; choose "
            "a batch size divisible by a device count (or pass an "
            "explicit mesh)".format(cfg.batch_size, len(jax.devices())))
    from squeezedet_tpu.parallel.mesh import data_axis_size
    ds_shards = data_axis_size(mesh) if device_dataset else 1
    if ds_shards > 1:
        # shard the canvas stack over the mesh's data axis: D chips
        # hold D× the dataset, each batch slot group gathers its own
        # shard's rows locally (imdb.shard_data).  Must precede the
        # sampler-state restore below — the snapshot is shard-shaped.
        imdb.shard_data(ds_shards)

    rng = jax.random.key(seed, impl=rng_impl) if rng_impl \
        else jax.random.key(seed)
    rng, init_rng = jax.random.split(rng)
    params, mask, tracer = det.init(init_rng, pretrained=pretrained)
    det.set_trainable_mask(mask)
    tx = build_optimizer(cfg, mask)
    opt_state = tx.init(params)
    state = TrainState(params=params, opt_state=opt_state, step=0)

    # model_metrics.txt (train.py:138-161); one writer per job
    if jax.process_index() == 0:
        from squeezedet_tpu.utils.metrics import write_model_metrics
        write_model_metrics(os.path.join(train_dir, "model_metrics.txt"),
                            tracer)

    # auto-resume from latest checkpoint (train.py:243-245); retention
    # bounded like the reference Saver's max_to_keep=5 (train.py:240)
    ckpt = CheckpointManager(train_dir, max_to_keep=max_to_keep)
    if jax.process_count() > 1:
        # Multihost checkpointing requires train_dir on SHARED storage:
        # orbax writes the replicated tree from the primary host only,
        # so with per-host local dirs the peers would find no checkpoint
        # on resume, desync the step loop, and hang on collectives.
        # Assert every controller sees the same latest step up front.
        from jax.experimental import multihost_utils

        from squeezedet_tpu.checkpoint.manager import latest_step
        local_latest = latest_step(train_dir)
        steps = np.asarray(multihost_utils.process_allgather(
            np.asarray(-1 if local_latest is None else local_latest,
                       np.int64)))
        assert (steps == steps[0]).all(), (
            "Controllers disagree on the latest checkpoint in {} "
            "(per-process latest steps: {}). Multihost training needs "
            "train_dir on storage shared by every host — see "
            "MIGRATION.md.".format(train_dir, steps.tolist()))
    if resume:
        step, restored = ckpt.restore_latest(state.as_tree())
        if step is not None:
            state = TrainState.from_tree(restored)
            print("Resumed from step {}".format(state.step))
            # continue the input stream where the checkpoint left it
            # (epoch permutation + cursor + augmentation RNG + the
            # step-RNG key, so dropout draws also continue the
            # uninterrupted trajectory)
            sampler_file = _sampler_ckpt_path(train_dir, step)
            if os.path.exists(sampler_file):
                with np.load(sampler_file) as data:
                    imdb.set_sampler_state(dict(data))
                    if "jax_rng_key" in data:
                        impl = (str(data["jax_rng_impl"])
                                if "jax_rng_impl" in data else None)
                        rng = jax.random.wrap_key_data(
                            jnp.asarray(data["jax_rng_key"]),
                            impl=impl)
                print("Restored input-stream state ({})".format(
                    os.path.basename(sampler_file)))

    if pallas_grads:
        # Pallas filter-grad backward for stride-1 SAME convs
        # (ops/filter_grad.py).  A pallas_call is not SPMD-partitionable,
        # so this is a single-device-only optimization.
        if mesh is not None and mesh.devices.size > 1:
            print("WARNING: --pallas_grads is single-device only; "
                  "ignoring it on a {}-device mesh.".format(
                      mesh.devices.size))
        else:
            from squeezedet_tpu.models import layers
            layers.set_pallas_filter_grad("1x1")
    if device_assign:
        train_step = make_train_step_device(det, tx, mesh=mesh,
                                            uint8_ingest=uint8_ingest,
                                            device_augment=device_augment,
                                            device_dataset=device_dataset)
    else:
        train_step = make_train_step(det, tx, mesh=mesh)

    dataset_dev = None
    local_coords = None
    if device_dataset:
        from squeezedet_tpu.parallel.mesh import (dataset_sharding,
                                                  local_data_coords)
        # HBM guard models the PER-DEVICE share: 1/D of the padded
        # stack when sharded over the data axis, the whole stack when
        # replicated.  Computed from headers, before any decode.
        h0, w0 = imdb.canvas_size()
        n_total = (getattr(imdb, "_shard_rows", 0) * ds_shards
                   if ds_shards > 1 else len(imdb.image_idx))
        per_device_gib = n_total * h0 * w0 * 3 / ds_shards / 2**30
        if per_device_gib > 12.0:
            raise ValueError(
                "--device_dataset: the {}-image split is {:.1f} GiB "
                "per device as a uint8 canvas stack — too large next "
                "to params/activations in one chip's HBM; use "
                "--device_augment (per-step canvas feed) instead".format(
                    n_total, per_device_gib))
        if jax.process_count() > 1:
            # each controller decodes + uploads ONLY its devices'
            # shards; the global stack spans hosts over the data axis
            local_coords = local_data_coords(mesh)
            block = imdb.load_canvas_shards(local_coords)
            n_loaded, gib = len(block), block.nbytes / 2**30
            dataset_dev = jax.make_array_from_process_local_data(
                dataset_sharding(mesh), block)
            del block
        else:
            dataset_np = imdb.load_canvas_dataset()
            n_loaded, gib = len(dataset_np), dataset_np.nbytes / 2**30
            if mesh is not None:
                sh = (dataset_sharding(mesh) if ds_shards > 1
                      else replicated_sharding(mesh))
                dataset_dev = jax.device_put(dataset_np, sh)
            else:
                dataset_dev = jax.device_put(dataset_np)
            del dataset_np
        print("Device-resident dataset: {} images this host, {:.2f} "
              "GiB, {} over {} data shard(s), uploaded once".format(
                  n_loaded, gib,
                  "sharded" if ds_shards > 1 else "replicated",
                  ds_shards))

    # viz/histograms under --device_assign need dense Targets; rebuild
    # them from the raw batch with the same device matcher the step uses.
    viz_assign = None
    if device_assign and (viz_step or histogram_step):
        from squeezedet_tpu.data.device_pipeline import (
            assign_anchors_device)
        anchors_const = jnp.asarray(cfg.anchor_box, jnp.float32)
        viz_assign = jax.jit(partial(assign_anchors_device,
                                     num_classes=cfg.classes))

    # --device_augment/--device_dataset summary-step pixel replay: run
    # the SAME on-device augment program the step uses over the batch's
    # canvas rows (gathered from the HBM stack under device_dataset)
    # and pull the model-resolution mean-subtracted f32 pixels to host.
    aug_replay = None
    if device_augment and (viz_step or histogram_step or
                           activation_summary):
        from squeezedet_tpu.data.device_pipeline import (
            augment_resize_normalize)
        aug_replay = jax.jit(lambda canvas, aug: augment_resize_normalize(
            canvas, aug, cfg.image_height, cfg.image_width,
            cfg.bgr_means))

    def _summary_pixels(host_batch):
        """Mean-subtracted f32 model-resolution pixels of this batch for
        the viz / histogram / activation-summary consumers, whatever the
        ingest mode."""
        if not device_augment:
            return _images_for_summary(host_batch[0])
        if device_dataset:
            pos = jnp.asarray(host_batch[0])
            if ds_shards > 1:
                from squeezedet_tpu.parallel.mesh import local_shard_gather
                canvas = local_shard_gather(
                    mesh, dataset_dev,
                    jax.device_put(pos, batch_sharding(mesh)))
            else:
                canvas = jnp.take(dataset_dev, pos, axis=0)
        else:
            canvas = jnp.asarray(host_batch[0])
        return np.asarray(aug_replay(canvas, jnp.asarray(host_batch[1])))

    # gradient histograms recompute grads with a separate jitted fn on
    # histogram steps only (the fast-path step never returns grads);
    # grads are taken at the post-update params of the same batch.
    # Trainable subtree only, like the reference (nn_skeleton.py:353-358
    # histograms the grads tf.gradients returns for trainable vars).
    grad_fn = None

    def _make_grad_fn():
        from squeezedet_tpu.optim import merge_params, partition_params
        hmask = det._trainable_mask_cache(None)

        def _tgrad(p, loss_of_params):
            trainable, frozen = partition_params(p, hmask)
            return jax.grad(
                lambda tp: loss_of_params(merge_params(tp, frozen)))(
                    trainable)

        if device_assign:
            # under --device_augment the histogram batch arrives as the
            # REPLAYED pixels (already augmented + mean-subtracted f32),
            # so the uint8 normalization must not run again
            u8 = uint8_ingest and not device_augment

            def gf(p, images, gt_boxes, gt_labels, num_gt, rng):
                from squeezedet_tpu.data.device_pipeline import (
                    ingest_and_assign)
                images, tg = ingest_and_assign(det, images, gt_boxes,
                                               gt_labels, num_gt, u8)
                return _tgrad(p, lambda q: det.loss(
                    q, images, tg, rng=rng, train=True).total)
        else:
            def gf(p, images, targets, rng):
                return _tgrad(p, lambda q: det.loss(
                    q, images, targets, rng=rng, train=True).total)
        return jax.jit(gf)

    loader = PrefetchLoader(imdb, device_targets=device_assign,
                            max_gt=max_gt,
                            uint8_images=uint8_ingest,
                            device_augment=device_augment,
                            device_dataset=device_dataset).start()

    def _local_rows(item):
        """Multihost --device_dataset: every host's sampler draws the
        identical GLOBAL batch (same seed, same shard_data partition);
        each host feeds only the slots of its own data coordinates —
        the contiguous [coord*per, ...) block of the shard-major batch
        layout.

        Each host deliberately MATERIALIZES all B slots' plan rows and
        discards the non-local ones here: the RNG draws must be global
        (the shared stream is the draw sequence), and the per-slot work
        past the draw is metadata-only numpy box math — no pixel decode
        (read_batch_plan_rows) — so restricting it to the local [lo:hi)
        range would save O(B·max_gt) float ops per step at the cost of
        threading a slot range through the pinned stream contract.
        Also load-bearing for correctness: the decoded-extent size
        cache (load_canvas_shards) only covers the host's OWN shards,
        so only locally-fed slots are guaranteed decoded-size-accurate
        — exactly the slots this function keeps."""
        if local_coords is None or jax.process_count() == 1:
            return item
        per = cfg.batch_size // ds_shards
        lo = local_coords[0] * per
        hi = (local_coords[-1] + 1) * per
        return tuple(x[lo:hi] for x in item)

    def _images_for_summary(images):
        """Viz/activation consumers expect mean-subtracted f32 pixels
        (they add the means back for display); undo the uint8 ingest."""
        if uint8_ingest:
            return np.asarray(images).astype(np.float32) \
                - cfg.bgr_means_array()
        return np.asarray(images)
    try:
        params, opt_state = state.params, state.opt_state
        multihost = jax.process_count() > 1
        if mesh is not None:
            if multihost:
                # multi-controller: params/opt replicated as global
                # arrays (every process holds identical values — same
                # seed or same restored checkpoint); each host's loader
                # then feeds its own local shard of the global batch.
                from squeezedet_tpu.parallel.mesh import (
                    replicate_multihost, shard_batch_multihost,
                    shard_images_multihost)
                params = replicate_multihost(mesh,
                                             jax.device_get(params))
                opt_state = replicate_multihost(
                    mesh, jax.device_get(opt_state))
                _shard_batch = shard_batch_multihost
                _shard_images = shard_images_multihost
            else:
                rep = replicated_sharding(mesh)
                params = jax.device_put(params, rep)
                opt_state = jax.device_put(opt_state, rep)
                _shard_batch = shard_batch
                _shard_images = shard_images
        if steps_per_dispatch > 1:
            # Scanned multi-step dispatches: K steps per device program
            # (make_train_step_device_scan).  Cadences are evaluated per
            # covered step; host-side viz/histograms are a K=1 concern
            # (use --steps_per_dispatch 1 when debugging visually).
            K = steps_per_dispatch
            n_items = 5 if device_augment else 4
            scan_step = make_train_step_device_scan(
                det, tx, K, mesh=mesh, uint8_ingest=uint8_ingest,
                device_augment=device_augment,
                device_dataset=device_dataset)
            if multihost:
                # multi-controller scan: each host stacks its K LOCAL
                # batch shards into [K, B_local, ...]; the global
                # [K, B_global, ...] arrays keep the scan axis
                # replicated and the batch over 'data', matching
                # scan_step's in_shardings.  device_dataset rows carry
                # no image tensor — every item is plain [K, B, ...].
                from squeezedet_tpu.parallel.mesh import (
                    stacked_image_sharding, stacked_sharding)
                if device_dataset:
                    _stacked_sh = [stacked_sharding(mesh)] * n_items
                else:
                    _stacked_sh = [stacked_image_sharding(mesh)] + \
                        [stacked_sharding(mesh)] * (n_items - 1)
            step = state.step
            while step < max_steps:
                start_time = time.time()
                if step + K <= max_steps:
                    batches = [_local_rows(loader.get())
                               for _ in range(K)]
                    stacked = [np.stack([b[i] for b in batches])
                               for i in range(n_items)]
                    if multihost:
                        stacked = [
                            jax.make_array_from_process_local_data(
                                sh, arr)
                            for sh, arr in zip(_stacked_sh, stacked)]
                    rngs = []
                    for _ in range(K):
                        rng, r = jax.random.split(rng)
                        rngs.append(r)
                    head = (dataset_dev,) if device_dataset else ()
                    params, opt_state, lbs = scan_step(
                        params, opt_state, *head, *stacked,
                        jnp.stack(rngs))
                    k_done = K
                else:  # tail smaller than K: single-step dispatches
                    item = _local_rows(loader.get())
                    rng, r = jax.random.split(rng)
                    if device_dataset:
                        if mesh is not None:
                            batch = (dataset_dev,) + _shard_batch(
                                mesh, tuple(item))
                        else:
                            batch = (dataset_dev,) + tuple(
                                jnp.asarray(x) for x in item)
                    elif mesh is not None:
                        # raw host arrays: the shard helpers device_put
                        # (or build global arrays from) numpy directly —
                        # a jnp.asarray here would round-trip each
                        # target through the default device first
                        batch = (_shard_images(mesh, item[0]),) + \
                            _shard_batch(mesh, tuple(item[1:]))
                    else:
                        batch = (jnp.asarray(item[0]),) + tuple(
                            jnp.asarray(x) for x in item[1:])
                    params, opt_state, lbs = train_step(
                        params, opt_state, *batch, r)
                    k_done = 1
                covered = range(step, step + k_done)
                step += k_done
                _, ckpt_due, totals = _dispatch_cadences(
                    covered, lbs, start_time=start_time, cfg=cfg,
                    log_every=log_every, summary_step=summary_step,
                    summary_writer=summary_writer,
                    checkpoint_step=checkpoint_step,
                    max_steps=max_steps, force_materialize=True)
                if ckpt_due:
                    state = _save_checkpoint(
                        ckpt, train_dir, imdb, loader, rng, params,
                        opt_state, next_step=step, max_steps=max_steps,
                        totals=totals)
            state = TrainState(params=jax.device_get(params),
                               opt_state=jax.device_get(opt_state),
                               step=max_steps)
            return state

        for step in range(state.step, max_steps):
            if step_tracer is not None:
                step_tracer.on_step(step)
            start_time = time.time()
            rng, step_rng = jax.random.split(rng)
            if device_assign:
                # 4-tuple (images, gt, labels, num_gt), or 5-tuple with
                # the canvas + aug row under --device_augment.
                # summary/viz/histogram consumers read the host-local
                # copies: a batch-sharded global array spans other
                # processes' devices and cannot be np.asarray'd
                host_batch = _local_rows(loader.get())
                if device_dataset:
                    # host rows are (pos, aug, gt, labels, num_gt);
                    # the canvas gather happens inside the step
                    if mesh is not None:
                        batch = (dataset_dev,) + _shard_batch(
                            mesh, tuple(host_batch))
                    else:
                        batch = (dataset_dev,) + tuple(
                            jnp.asarray(x) for x in host_batch)
                elif mesh is not None:
                    # images get the (data[, spatial]) placement the
                    # step's in_shardings expect; anchor-space targets
                    # (and the aug rows) shard over 'data' only — raw
                    # numpy in, the helpers place it directly
                    batch = (_shard_images(mesh, host_batch[0]),) + \
                        _shard_batch(mesh, tuple(host_batch[1:]))
                else:
                    batch = (jnp.asarray(host_batch[0]),) + tuple(
                        jnp.asarray(x) for x in host_batch[1:])
                params, opt_state, lb = train_step(
                    params, opt_state, *batch, step_rng)
                targets = None
            else:
                images, targets = loader.get()
                host_batch = (images, targets)
                images = jnp.asarray(images)
                if mesh is not None:
                    images = _shard_images(mesh, images)
                    targets = _shard_batch(mesh, targets)
                params, opt_state, lb = train_step(
                    params, opt_state, images, targets, step_rng)
                targets = host_batch[1]

            do_summary, ckpt_due, totals = _dispatch_cadences(
                range(step, step + 1), lb, start_time=start_time,
                cfg=cfg, log_every=log_every, summary_step=summary_step,
                summary_writer=summary_writer,
                checkpoint_step=checkpoint_step, max_steps=max_steps)
            viz_due = do_summary and viz_step and step % viz_step == 0
            hist_due = summary_writer is not None and histogram_step \
                and step % histogram_step == 0
            pixels = None
            if viz_due or (hist_due and (device_augment
                                         or activation_summary)):
                # one replay/fetch serves viz, histograms and activation
                # summaries alike; skipped when no consumer needs pixels
                # (host-ingest histogram steps read host_batch directly)
                pixels = _summary_pixels(host_batch)
            if viz_due:
                off = 2 if device_augment else 1
                if targets is None and viz_assign is not None:
                    targets = viz_assign(
                        anchors_const, jnp.asarray(host_batch[off]),
                        jnp.asarray(host_batch[off + 1]),
                        jnp.asarray(host_batch[off + 2]))
                if targets is not None:
                    ims = viz_prediction_images(det, params, pixels,
                                                targets)
                    summary_writer.image(
                        "sample_detection_results", ims, step,
                        max_outputs=cfg.batch_size)
            if hist_due:
                if grad_fn is None:
                    grad_fn = _make_grad_fn()
                # histograms reflect this host's local batch (params
                # are replicated, so their histograms are global); a
                # multi-process global params array cannot join a jit
                # over host-local batches, so grads use a host copy
                hp = jax.device_get(params) if multihost else params
                if device_augment:
                    # grads at the replayed (augmented, normalized)
                    # pixels — the same batch the step trained on
                    grads = grad_fn(
                        hp, jnp.asarray(pixels),
                        *[jnp.asarray(x) for x in host_batch[2:]],
                        step_rng)
                elif device_assign:
                    grads = grad_fn(
                        hp, *[jnp.asarray(x) for x in host_batch],
                        step_rng)
                else:
                    grads = grad_fn(hp, jnp.asarray(host_batch[0]),
                                    host_batch[1], step_rng)
                write_histograms(summary_writer, jax.device_get(params),
                                 jax.device_get(grads), step,
                                 trainable_mask=det._trainable_mask_cache(
                                     None))
                if activation_summary:
                    write_activation_summaries(
                        summary_writer, det, params, pixels, step)
            if ckpt_due:
                state = _save_checkpoint(
                    ckpt, train_dir, imdb, loader, rng, params, opt_state,
                    next_step=step + 1, max_steps=max_steps,
                    totals=totals)
        state = TrainState(params=jax.device_get(params),
                           opt_state=jax.device_get(opt_state),
                           step=max_steps)
        return state
    finally:
        if step_tracer is not None:
            step_tracer.close()
        loader.stop()
        ckpt.wait_until_finished()
