"""Non-maximum suppression — host (numpy) reference path.

The reference NMS (util.py:56-76) is *not* classical cascaded greedy NMS:
it walks candidates in descending-score order and suppresses every box that
overlaps an earlier candidate by more than the threshold, **without checking
whether the earlier candidate itself survived**.  Consequently

    keep[j]  <=>  no earlier-ordered box i has IoU(i, j) > thresh

which has no sequential dependency at all — ideal for TPU (see
postprocess.py for the vectorised device formulation).  This module is the
bit-exact numpy reference used by the host pipeline and parity tests.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from .boxes import batch_iou


def nms(boxes: np.ndarray, probs: np.ndarray, threshold: float) -> List[bool]:
    """Reference-semantics NMS over center-format boxes.

    Returns a keep mask aligned with the input order (util.py:56-76).

    Equal scores walk LARGER input position first (stable ascending
    sort, reversed) — the deterministic convention the device kernel
    (postprocess.py) commits to; the reference's own equal-score order
    is unspecified (numpy's default unstable quicksort).
    """
    order = probs.argsort(kind="stable")[::-1]
    keep = [True] * len(order)
    for i in range(len(order) - 1):
        ovps = batch_iou(boxes[order[i + 1:]], boxes[order[i]])
        for j, ov in enumerate(ovps):
            if ov > threshold:
                keep[order[j + i + 1]] = False
    return keep


def filter_prediction_np(
    boxes: np.ndarray,
    probs: np.ndarray,
    cls_idx: np.ndarray,
    *,
    classes: int,
    top_n_detection: int,
    prob_thresh: float,
    nms_thresh: float,
) -> Tuple[List[np.ndarray], List[float], List[int]]:
    """Host postprocess: top-N (or prob-threshold) + per-class NMS.

    Matches ModelSkeleton.filter_prediction (nn_skeleton.py:696-734):
    output is grouped by class, each class in descending-probability order
    of the surviving candidates.
    """
    if 0 < top_n_detection < len(probs):
        # stable ascending, reversed: ties rank LARGER anchor index
        # first — the two-layer tie contract (DESIGN.md) the device
        # kernel implements; with the default unstable argsort a
        # boundary tie could select a different anchor than the device
        # top_k and the two paths would disagree by a whole box
        order = probs.argsort(kind="stable")[:-top_n_detection - 1:-1]
        probs = probs[order]
        boxes = boxes[order]
        cls_idx = cls_idx[order]
    else:
        # reversed (descending anchor index) for the same reason as the
        # top-N branch: nms()'s larger-POSITION-first tie walk then
        # resolves equal-score overlaps smaller-anchor-first, matching
        # the device kernel's (pi == pj) & (li > lj) mask.  Ascending
        # order here would flip the convention in the prob-thresh
        # regime only.
        keep_idx = np.nonzero(probs > prob_thresh)[0][::-1]
        probs = probs[keep_idx]
        boxes = boxes[keep_idx]
        cls_idx = cls_idx[keep_idx]

    final_boxes: List[np.ndarray] = []
    final_probs: List[float] = []
    final_cls: List[int] = []
    for c in range(classes):
        idx_per_class = [i for i in range(len(probs)) if cls_idx[i] == c]
        keep = nms(boxes[idx_per_class], probs[idx_per_class], nms_thresh)
        for i in range(len(keep)):
            if keep[i]:
                final_boxes.append(boxes[idx_per_class[i]])
                final_probs.append(probs[idx_per_class[i]])
                final_cls.append(c)
    return final_boxes, final_probs, final_cls
