"""On-device detection postprocessing: top-K + per-class NMS.

TPU-native replacement for ``ModelSkeleton.filter_prediction``
(nn_skeleton.py:696-734) + ``util.nms`` (util.py:56-76).  The reference
walks candidates in descending-score order and suppresses every later box
that overlaps an earlier *candidate* (not an earlier survivor), so

    keep[j]  <=>  not exists i earlier-in-order, same class:
                  IoU(i, j) > thresh

which is order-free given the ranking — one [K, K] IoU matrix and a
triangular mask, no sequential loop.  With K = TOP_N_DETECTION = 64 the
whole postprocess is a handful of VPU ops fused into the inference
program; nothing leaves HBM until the final [B, K] results.

Everything is fixed-shape: outputs are padded to K with a keep mask.
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _filter_one(boxes, probs, cls_idx, *, top_n: int, nms_thresh: float,
                prob_thresh: float = None):
    """Single image: [A, 4], [A], [A] -> top_n-shaped results.

    Tie-break convention: the host reference ranks by
    ``probs.argsort()[:-N-1:-1]``; under *stable-sort* semantics that
    ranks equal scores LARGER anchor index first.  (numpy's default
    argsort is an unstable quicksort, so the reference's exact
    equal-score order is actually unspecified — this path commits to
    the deterministic stable-sort convention, which our host oracle
    ``ops/nms.py`` also uses.)  ``lax.top_k`` prefers the smaller
    index, so run it on the index-reversed vector and map back (same
    trick as the matcher's reversed argmax, device_pipeline.py)."""
    from squeezedet_tpu.ops.boxes import pairwise_iou_center

    num = probs.shape[0]
    rev_probs = probs[::-1]
    top_probs, rev_order = jax.lax.top_k(rev_probs, top_n)  # descending
    order = num - 1 - rev_order  # ties -> larger original index first
    top_boxes = jnp.take(boxes, order, axis=0)
    top_cls = jnp.take(cls_idx, order, axis=0)

    # padded/degenerate zero-area boxes: eps guards the 0/0 the host
    # reference leaves undefined (util.py:54)
    iou_mat = pairwise_iou_center(top_boxes, top_boxes, eps=1e-12)
    same_class = top_cls[:, None] == top_cls[None, :]
    # Suppression order = the host nms's own ranking (util.py:56-76
    # re-sorts with probs.argsort()[::-1]): descending prob, ties by
    # LARGER local position first — which, composed with the outer
    # selection's larger-anchor-first tie order, walks tied anchors
    # smallest-index-first.  For distinct probs this reduces to the
    # plain triangular i<j mask.
    pi, pj = top_probs[:, None], top_probs[None, :]
    li = jnp.arange(top_n)
    earlier = (pi > pj) | ((pi == pj) & (li[:, None] > li[None, :]))
    suppressed = jnp.any(
        (iou_mat > nms_thresh) & same_class & earlier, axis=0)
    keep = ~suppressed
    if prob_thresh is not None:
        keep = keep & (top_probs > prob_thresh)
    return top_boxes, top_probs, top_cls, keep


@partial(jax.jit, static_argnames=("top_n", "nms_thresh", "num_classes",
                                   "prob_thresh"))
def filter_prediction_device(boxes, probs, cls_idx, *, top_n: int,
                             nms_thresh: float, num_classes: int,
                             prob_thresh: float = 0.0):
    """Batched on-device postprocess.

    Args:
      boxes: [B, A, 4] decoded center-format boxes.
      probs: [B, A] per-anchor max class scores.
      cls_idx: [B, A] int32 class indices.
      prob_thresh: applied only when every anchor is a candidate
        (top_n >= A): the host reference switches from top-N selection
        to ``probs > PROB_THRESH`` filtering there (nn_skeleton.py:
        711-720), so the device path must drop near-zero candidates the
        same way on small configs.

    Returns:
      (boxes [B, K, 4], probs [B, K], classes [B, K], keep [B, K] bool),
      candidates in descending-probability order.
    """
    del num_classes  # suppression is same-class-pairwise; count not needed
    # tiny configs can have fewer anchors than TOP_N_DETECTION
    num_anchors = boxes.shape[1]
    thresh = prob_thresh if top_n >= num_anchors else None
    top_n = min(top_n, num_anchors)
    return jax.vmap(
        lambda b, p, c: _filter_one(b, p, c, top_n=top_n,
                                    nms_thresh=nms_thresh,
                                    prob_thresh=thresh)
    )(boxes, probs, cls_idx)


def device_results_to_lists(
        boxes: np.ndarray, probs: np.ndarray, classes: np.ndarray,
        keep: np.ndarray, num_classes: int,
        plot_prob_thresh: float = None,
) -> Tuple[List[np.ndarray], List[float], List[int]]:
    """Convert one image's fixed-shape device results into the grouped-by-
    class python lists the reference filter_prediction returns
    (nn_skeleton.py:722-734): class 0 detections first, each class in
    descending-probability order."""
    final_boxes, final_probs, final_cls = [], [], []
    for c in range(num_classes):
        for i in range(len(keep)):
            if keep[i] and classes[i] == c:
                if plot_prob_thresh is not None and \
                        probs[i] <= plot_prob_thresh:
                    continue
                final_boxes.append(boxes[i])
                final_probs.append(float(probs[i]))
                final_cls.append(int(classes[i]))
    return final_boxes, final_probs, final_cls
