"""Shared detection skeleton: interpretation graph + loss.

The reference concentrates these in ``ModelSkeleton`` (nn_skeleton.py:72):
``_add_interpretation_graph`` (:142) splits the ConvDet output into class
softmax / confidence sigmoid / box deltas, decodes anchors with safe_exp,
clips to the image, and forms final per-anchor scores;
``_add_loss_graph`` (:285) builds the 3-term loss.  Here both are pure
jittable functions.

Channel-layout contract (nn_skeleton.py:149-177): the ConvDet output
[B, H, W, APG*(C+1+4)] is sliced as [class_probs | conf | deltas] with
anchor-major, class-minor grouping — ``reshape(preds[..., :APG*C],
[-1, C])`` — which the reshapes below reproduce exactly so TF1/caffe
checkpoints import bit-compatibly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from squeezedet_tpu.ops.boxes import safe_exp


class Interpretation(NamedTuple):
    """Decoded network output (all per-anchor, fixed shapes)."""

    pred_class_probs: jax.Array  # [B, A, C] softmax class probabilities
    pred_conf: jax.Array         # [B, A] sigmoid confidence
    pred_box_delta: jax.Array    # [B, A, 4] raw deltas
    det_boxes: jax.Array         # [B, A, 4] decoded (cx, cy, w, h), clipped
    det_probs: jax.Array         # [B, A] max_c class_prob*conf
    det_class: jax.Array         # [B, A] argmax class index (int32)
    pred_class_logits: jax.Array = None  # [B, A, C] pre-softmax (loss use)


def interpret(preds: jax.Array, anchors: jax.Array, *, num_classes: int,
              anchor_per_grid: int, image_width: int, image_height: int,
              exp_thresh: float = 1.0) -> Interpretation:
    """Interpretation graph (nn_skeleton.py:142-283) as a pure function.

    Args:
      preds: ConvDet output [B, H, W, APG*(C+1+4)].
      anchors: [A, 4] (cx, cy, w, h) anchor constants.
    """
    b = preds.shape[0]
    num_anchors = anchors.shape[0]
    c = num_classes
    apg = anchor_per_grid
    num_class_probs = apg * c
    num_conf = num_class_probs + apg

    # [class | conf | delta] channel split with anchor-major reshape
    # semantics (nn_skeleton.py:150-177).
    pred_class_logits = preds[..., :num_class_probs].reshape(
        b, num_anchors, c)
    pred_class_probs = jax.nn.softmax(pred_class_logits, axis=-1)
    pred_conf = jax.nn.sigmoid(
        preds[..., num_class_probs:num_conf].reshape(b, num_anchors))
    pred_box_delta = preds[..., num_conf:].reshape(b, num_anchors, 4)

    # Anchor decode (nn_skeleton.py:182-211).
    anchors = anchors.astype(pred_box_delta.dtype)
    ax, ay, aw, ah = anchors[:, 0], anchors[:, 1], anchors[:, 2], anchors[:, 3]
    dx = pred_box_delta[..., 0]
    dy = pred_box_delta[..., 1]
    dw = pred_box_delta[..., 2]
    dh = pred_box_delta[..., 3]
    box_cx = ax + dx * aw
    box_cy = ay + dy * ah
    box_w = aw * safe_exp(dw, exp_thresh)
    box_h = ah * safe_exp(dh, exp_thresh)

    # Corner clip to [0, W-1] x [0, H-1] with the reference's exact op order
    # (nn_skeleton.py:213-233), then back to centers with the +1 pixel w/h
    # convention (util.py:181-196).
    xmins = box_cx - box_w / 2
    ymins = box_cy - box_h / 2
    xmaxs = box_cx + box_w / 2
    ymaxs = box_cy + box_h / 2
    xmins = jnp.minimum(jnp.maximum(0.0, xmins), image_width - 1.0)
    ymins = jnp.minimum(jnp.maximum(0.0, ymins), image_height - 1.0)
    xmaxs = jnp.maximum(jnp.minimum(image_width - 1.0, xmaxs), 0.0)
    ymaxs = jnp.maximum(jnp.minimum(image_height - 1.0, ymaxs), 0.0)
    width = xmaxs - xmins + 1.0
    height = ymaxs - ymins + 1.0
    det_boxes = jnp.stack(
        [xmins + 0.5 * width, ymins + 0.5 * height, width, height], axis=-1)

    # Final score = class_prob * conf; top class (nn_skeleton.py:271-283).
    probs = pred_class_probs * pred_conf[..., None]
    det_probs = jnp.max(probs, axis=2)
    det_class = jnp.argmax(probs, axis=2).astype(jnp.int32)

    return Interpretation(pred_class_probs, pred_conf, pred_box_delta,
                          det_boxes, det_probs, det_class,
                          pred_class_logits)


def tensor_iou(box1, box2, mask, epsilon: float):
    """In-graph IoU of corner-format box stacks, masked
    (nn_skeleton.py:240-269).  box1/box2 are [4, B, A] corner tuples."""
    xmin = jnp.maximum(box1[0], box2[0])
    ymin = jnp.maximum(box1[1], box2[1])
    xmax = jnp.minimum(box1[2], box2[2])
    ymax = jnp.minimum(box1[3], box2[3])
    w = jnp.maximum(0.0, xmax - xmin)
    h = jnp.maximum(0.0, ymax - ymin)
    intersection = w * h
    w1 = box1[2] - box1[0]
    h1 = box1[3] - box1[1]
    w2 = box2[2] - box2[0]
    h2 = box2[3] - box2[1]
    union = w1 * h1 + w2 * h2 - intersection
    return intersection / (union + epsilon) * mask


def _center_to_corners(boxes):
    cx, cy, w, h = (boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3])
    return (cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2)


class Targets(NamedTuple):
    """Dense training targets (built by the data layer, train.py:163-224)."""

    input_mask: jax.Array       # [B, A] 1.0 where an anchor owns a gt box
    box_delta_input: jax.Array  # [B, A, 4] target deltas
    box_input: jax.Array        # [B, A, 4] gt boxes (cx, cy, w, h)
    labels: jax.Array           # [B, A, C] one-hot class labels


class LossBreakdown(NamedTuple):
    total: jax.Array
    class_loss: jax.Array
    conf_loss: jax.Array
    bbox_loss: jax.Array
    mean_iou: jax.Array


def detection_loss(interp: Interpretation, targets: Targets, *,
                   num_anchors: int,
                   loss_coef_class: float, loss_coef_conf_pos: float,
                   loss_coef_conf_neg: float, loss_coef_bbox: float,
                   epsilon: float = 1e-16,
                   weight_decay_term=0.0) -> LossBreakdown:
    """3-term SqueezeDet loss (nn_skeleton.py:285-327).

    The confidence target IoU goes through ``stop_gradient``: in the
    reference it is routed through a non-trainable Variable assign
    (nn_skeleton.py:100-103, 263-268), which blocks gradients into the
    decoded boxes from the conf loss.
    """
    mask = targets.input_mask  # [B, A]
    mask3 = mask[..., None]
    # Guarded against an all-background batch (every image num_gt=0 —
    # reachable here because the device pipeline pads GT, whereas the
    # reference's host loader can never feed zero objects): with no
    # positives every masked sum is 0, so dividing by 1 instead of 0
    # yields zero class/bbox losses and a pure-negative conf loss
    # rather than NaN params.  num_objects > 0 is unchanged.
    num_objects = jnp.maximum(jnp.sum(mask), 1.0)

    # Class cross-entropy, normalized by num_objects
    # (nn_skeleton.py:289-300): q*(-log p) + (1-q)*(-log(1-p)) over the
    # softmax probs.  Computed in LOG space from the logits: the
    # reference's literal formula has catastrophically cancelling
    # gradients once softmax saturates (1/(1-p+eps) ~ 1e16 intermediates
    # that only cancel analytically) — it survives there only because
    # training always starts from pretrained weights.  Values match the
    # reference's eps-floored formula; gradients are bounded.
    if interp.pred_class_logits is not None:
        logits = interp.pred_class_logits
        m = jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
        shifted = logits - m
        e = jnp.exp(shifted)
        s = jnp.sum(e, axis=-1, keepdims=True)
        log_floor = jnp.log(epsilon)
        log_p = jnp.maximum(shifted - jnp.log(s), log_floor)
        # log(1 - p_i) = log(sum_{j!=i} e_j) - log(sum_j e_j)
        log_1mp = jnp.maximum(
            jnp.log(jnp.maximum(s - e, epsilon)) - jnp.log(s), log_floor)
        class_loss = jnp.sum(
            (targets.labels * (-log_p)
             + (1 - targets.labels) * (-log_1mp))
            * mask3 * loss_coef_class) / num_objects
    else:  # probs-only caller (reference literal formula)
        p = interp.pred_class_probs
        class_loss = jnp.sum(
            (targets.labels * (-jnp.log(p + epsilon))
             + (1 - targets.labels) * (-jnp.log(1 - p + epsilon)))
            * mask3 * loss_coef_class) / num_objects

    # Confidence regression toward (stopped-gradient) IoU
    # (nn_skeleton.py:302-314).
    ious = tensor_iou(
        _center_to_corners(interp.det_boxes),
        _center_to_corners(targets.box_input),
        mask, epsilon)
    ious = jax.lax.stop_gradient(ious)
    # The reference denominator mixes the PER-IMAGE anchor count with
    # the BATCH-TOTAL object count (nn_skeleton.py:311-313), so on
    # small-anchor-count geometries at large batch it can cross zero and
    # silently flip the negative term's sign; clamp to 1 (a no-op in
    # every reference-recipe regime, where num_objects << num_anchors).
    conf_weight = (mask * loss_coef_conf_pos / num_objects
                   + (1 - mask) * loss_coef_conf_neg
                   / jnp.maximum(num_anchors - num_objects, 1.0))
    conf_loss = jnp.mean(
        jnp.sum(jnp.square(ious - interp.pred_conf) * conf_weight, axis=1))

    # Bounding-box L2 on masked deltas (nn_skeleton.py:316-324).
    bbox_loss = jnp.sum(
        loss_coef_bbox * jnp.square(
            mask3 * (interp.pred_box_delta - targets.box_delta_input))
    ) / num_objects

    mean_iou = jnp.sum(ious) / num_objects
    total = class_loss + conf_loss + bbox_loss + weight_decay_term
    return LossBreakdown(total, class_loss, conf_loss, bbox_loss, mean_iou)
