"""On-device batched preprocessing + anchor-target assignment.

TPU-native replacement for the host-side hot loop the reference runs in
4 python threads (imdb.read_batch, imdb.py:99-249 — cv2 decode/resize,
mean subtraction, flip augmentation and the O(num_gt x 16848) greedy
anchor matcher).  Everything here is jit-compatible with static shapes:
ground truth is padded to ``max_gt`` boxes per image with a validity
count.

The greedy matcher reproduces the reference's *unclaimed anchor*
semantics (imdb.py:197-235): per GT box in order, the highest-IoU
unclaimed anchor with positive IoU, else the nearest unclaimed anchor by
squared distance in (cx, cy, w, h) space; deltas are
(dx, dy, log dw, log dh).  Equivalence to the numpy path is exact up to
IoU ties (measure zero on real data) and is covered by
tests/test_device_pipeline.py.

Dense target construction needs no duplicate-dropping (train.py:173-190)
because the claimed-mask already guarantees unique anchors per image.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from squeezedet_tpu.models.skeleton import Targets
from squeezedet_tpu.ops.boxes import batch_iou


def normalize_images(images_u8, bgr_means, dtype=jnp.float32):
    """uint8 BGR [B, H, W, 3] -> mean-subtracted compute-dtype tensor.

    Device-side equivalent of ``im.astype(float32) - BGR_MEANS``
    (imdb.py:143-144); fuses the dtype conversion into the first conv's
    input so no f32 image ever hits HBM.
    """
    means = jnp.asarray(bgr_means, dtype).reshape(1, 1, 1, 3)
    return images_u8.astype(dtype) - means


def resize_images(images, height: int, width: int):
    """Batched bilinear resize on device (serving path).

    Device-side equivalent of the per-image ``cv2.resize`` in
    imdb.read_image_batch (imdb.py:91): KITTI's native 1242x375 frames
    resize to the model resolution inside the jitted program, so the
    host ships raw uint8 frames only.  jax.image 'linear' uses the same
    half-pixel convention as cv2's bilinear; values agree to ~1e-2
    (float rounding), not bit-exact.
    """
    b, _, _, c = images.shape
    return jax.image.resize(images.astype(jnp.float32),
                            (b, height, width, c), method="linear",
                            antialias=False)


def random_flip(images, gt_boxes, rng):
    """Batched 50% horizontal flip (imdb.py:180-182).

    images: [B, H, W, C]; gt_boxes: [B, G, 4] center-format.
    Box update: cx' = (W - 1) - cx.

    Note: flips at MODEL resolution; the host path flips before the
    resize (cx' = (orig_w - 1 - cx) * x_scale), which differs by a
    sub-pixel (1 - x_scale)/2 offset.  A training pipeline mixing the
    two conventions would see that as label noise — the shipped train
    paths do all augmentation host-side (imdb._augment).
    """
    b = images.shape[0]
    w = images.shape[2]
    flip = jax.random.bernoulli(rng, 0.5, (b,))
    flipped_im = jnp.where(flip[:, None, None, None],
                           images[:, :, ::-1, :], images)
    cx = jnp.where(flip[:, None], (w - 1.0) - gt_boxes[..., 0],
                   gt_boxes[..., 0])
    boxes = gt_boxes.at[..., 0].set(cx)
    return flipped_im, boxes


def _iou_anchors(anchors, box):
    """IoU of all [A, 4] anchors vs one center-format box — delegates to
    ops.boxes.batch_iou (the single home of the util.py:32-54 math; it
    dispatches to jnp under jit)."""
    return batch_iou(anchors, box)


def _assign_one_image(anchors, gt_boxes, gt_labels, num_gt, num_classes):
    """Greedy sequential matcher for one image via lax.scan over the
    (padded) GT list, carrying the claimed-anchor mask."""
    num_anchors = anchors.shape[0]

    def step(claimed, inp):
        box, label, valid = inp
        ious = _iou_anchors(anchors, box)
        masked_iou = jnp.where(claimed, -1.0, ious)
        # Tie-break like the reference's reversed argsort (imdb.py:201):
        # among equal IoUs the LARGEST anchor index wins.
        best_iou_idx = (num_anchors - 1) - jnp.argmax(masked_iou[::-1])
        use_iou = masked_iou[best_iou_idx] > 0

        dist = jnp.sum(jnp.square(box - anchors), axis=1)
        masked_dist = jnp.where(claimed, jnp.inf, dist)
        best_dist_idx = jnp.argmin(masked_dist)

        aidx = jnp.where(use_iou, best_iou_idx, best_dist_idx)
        a = anchors[aidx]
        delta = jnp.stack([
            (box[0] - a[0]) / a[2],
            (box[1] - a[1]) / a[3],
            jnp.log(box[2] / a[2]),
            jnp.log(box[3] / a[3]),
        ])
        claimed = jnp.where(valid, claimed.at[aidx].set(True), claimed)
        return claimed, (aidx, delta, label, valid)

    claimed0 = jnp.zeros((num_anchors,), bool)
    valid = (jnp.arange(gt_boxes.shape[0]) < num_gt)
    _, (aidx, deltas, labels, valids) = jax.lax.scan(
        step, claimed0, (gt_boxes, gt_labels, valid))

    # Scatter into dense per-anchor targets.  Padded slots scatter to a
    # dummy row (num_anchors) that is sliced off.
    safe_aidx = jnp.where(valids, aidx, num_anchors)
    mask = jnp.zeros((num_anchors + 1,)).at[safe_aidx].add(1.0)[:-1]
    mask = jnp.minimum(mask, 1.0)
    dense_delta = jnp.zeros((num_anchors + 1, 4)).at[safe_aidx].set(
        deltas)[:-1]
    dense_box = jnp.zeros((num_anchors + 1, 4)).at[safe_aidx].set(
        gt_boxes)[:-1]
    onehot = jax.nn.one_hot(labels, num_classes)
    dense_labels = jnp.zeros((num_anchors + 1, num_classes)).at[
        safe_aidx].set(onehot)[:-1]
    return mask, dense_delta, dense_box, dense_labels


@partial(jax.jit, static_argnames=("num_classes",))
def assign_anchors_device(anchors, gt_boxes, gt_labels, num_gt,
                          num_classes: int) -> Targets:
    """Batched greedy anchor assignment -> dense Targets.

    Args:
      anchors: [A, 4] anchor constants.
      gt_boxes: [B, G, 4] padded center-format GT boxes (garbage in
        slots >= num_gt[b] is ignored).
      gt_labels: [B, G] int class ids.
      num_gt: [B] valid-box counts.
    """
    mask, delta, box, labels = jax.vmap(
        lambda b, l, n: _assign_one_image(anchors, b, l, n, num_classes)
    )(gt_boxes, gt_labels, num_gt)
    return Targets(input_mask=mask, box_delta_input=delta,
                   box_input=box, labels=labels)


def ingest_and_assign(det, images, gt_boxes, gt_labels, num_gt,
                      uint8_ingest: bool):
    """The train-step ingest: optional fused uint8 normalization plus
    the in-graph anchor matcher.  One home for the sequence shared by
    the single-step and scanned train steps and the histogram grad fn
    (trainer.py) — the ingest and freeze semantics must never drift
    between them.  Returns (images, Targets)."""
    cfg = det.cfg
    if uint8_ingest:
        images = normalize_images(images, cfg.bgr_means,
                                  jnp.dtype(cfg.compute_dtype))
    targets = assign_anchors_device(
        jnp.asarray(cfg.anchor_box, jnp.float32), gt_boxes, gt_labels,
        num_gt, cfg.classes)
    return images, targets
