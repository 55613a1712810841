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


def augment_resize_normalize(canvas_u8, aug, height: int, width: int,
                             bgr_means, dtype=jnp.float32):
    """Fused on-device drift crop + horizontal flip + resize +
    mean-subtract (the reference's per-image cv2 hot loop,
    imdb.py:141-193, as ONE batched device program).

    The RNG stays host-side: ``aug[:, 0:3] = (dx, dy, flip)`` are the
    BatchPlan's pre-drawn per-image decisions (reference draw order
    preserved, imdb.py:161-180), and ``aug[:, 3:5] = (ow', oh')`` are
    the post-drift source extents (orig - drift); the real image
    extents are recovered as (ow' + dx, oh' + dy).  The stream is
    therefore the same deterministic function of the seed as the host
    path — only the pixel work moves on device.

    TPU-native formulation: the crop/flip/resize composition is a
    per-image AFFINE source mapping, so the bilinear resample is
    separable into per-image weight matrices contracted on the MXU —
        out = Wy[b] @ (canvas[b] - mean) @ Wx[b]^T
    — no gathers, no dynamic shapes.  Boundary semantics match the
    host exactly: sample positions are clamped at the shifted-canvas
    border (cv2.resize border replicate), and out-of-image samples
    from a negative drift contribute the pad value, which is 0 in
    mean-subtracted space (the reference zero-pads AFTER the mean
    subtraction, imdb.py:164-177) — such positions simply receive no
    weight.  Canvas area beyond each image's real extent is masked to
    0 so batch padding never leaks through clamped samples.

    Args:
      canvas_u8: [B, H0, W0, 3] raw uint8 batch canvas (each image in
        the top-left corner; H0, W0 = dataset max extents).
      aug: [B, 5] f32 rows (dx, dy, flip, ow', oh').
    Returns mean-subtracted [B, height, width, 3] in ``dtype``.
    """
    b, h0, w0, _ = canvas_u8.shape
    dx, dy, flip = aug[:, 0], aug[:, 1], aug[:, 2]
    ow, oh = aug[:, 3], aug[:, 4]

    def weights(out_n, src_n, extent, off, flip_flag):
        # cv2.resize sample positions in post-drift space, clamped at
        # the shifted-canvas border like cv2's border replicate
        o = jnp.arange(out_n, dtype=jnp.float32)
        s = (o + 0.5) * extent / out_n - 0.5
        s = jnp.clip(s, 0.0, extent - 1.0)
        if flip_flag is not None:
            # bilinear commutes with reflection, so flipping the
            # sample position == flipping the pixels (imdb.py:180-182)
            s = jnp.where(flip_flag > 0, extent - 1.0 - s, s)
        src = s + off  # position in the original image
        cols = jnp.arange(src_n, dtype=jnp.float32)
        # src < 0 (pad region of a negative drift) matches no column
        # -> contributes 0, the mean-subtracted pad value
        return jnp.maximum(0.0, 1.0 - jnp.abs(src[:, None] -
                                              cols[None, :]))

    wy = jax.vmap(
        lambda e, off: weights(height, h0, e, off, None))(oh, dy)
    wx = jax.vmap(
        lambda e, off, f: weights(width, w0, e, off, f))(ow, dx, flip)

    means = jnp.asarray(bgr_means, jnp.float32).reshape(1, 1, 1, 3)
    x = canvas_u8.astype(jnp.float32) - means
    h_real, w_real = oh + dy, ow + dx
    ymask = jnp.arange(h0)[None, :] < h_real[:, None]
    xmask = jnp.arange(w0)[None, :] < w_real[:, None]
    x = x * ymask[:, :, None, None] * xmask[:, None, :, None]
    out = jnp.einsum("bhH,bHWc->bhWc", wy, x)
    out = jnp.einsum("bwW,bhWc->bhwc", wx, out)
    return out.astype(dtype)


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
                      uint8_ingest: bool, aug=None):
    """The train-step ingest: optional fused uint8 normalization (or,
    with ``aug``, the full on-device augment+resize program over a raw
    canvas batch) plus the in-graph anchor matcher.  One home for the
    sequence shared by the single-step and scanned train steps and the
    histogram grad fn (trainer.py) — the ingest and freeze semantics
    must never drift between them.  Returns (images, Targets)."""
    cfg = det.cfg
    if aug is not None:
        images = augment_resize_normalize(
            images, aug, cfg.image_height, cfg.image_width,
            cfg.bgr_means, jnp.dtype(cfg.compute_dtype))
    elif uint8_ingest:
        images = normalize_images(images, cfg.bgr_means,
                                  jnp.dtype(cfg.compute_dtype))
    targets = assign_anchors_device(
        jnp.asarray(cfg.anchor_box, jnp.float32), gt_boxes, gt_labels,
        num_gt, cfg.classes)
    return images, targets
