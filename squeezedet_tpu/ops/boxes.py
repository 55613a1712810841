"""Box geometry primitives.

Behavioural contract comes from the reference ``src/utils/util.py``:

* ``bbox_transform`` (util.py:167): center (cx, cy, w, h) -> corners
  (xmin, ymin, xmax, ymax) with NO pixel offset;
* ``bbox_transform_inv`` (util.py:181): corners -> center with the
  **+1 pixel width/height convention** (w = xmax - xmin + 1);
* ``iou``/``batch_iou`` (util.py:9,32) operate on center-format boxes;
* ``safe_exp`` (util.py:219): exp that linearises above a threshold.

All functions are written against operator overloading only, so they work
on numpy arrays (host data path) and on jax arrays (inside jit) alike.
"""

from __future__ import annotations

import numpy as np


def bbox_transform(bbox):
    """Center (cx, cy, w, h) -> corner (xmin, ymin, xmax, ymax).

    ``bbox`` is a length-4 sequence of scalars or arrays; returns a list in
    the same form (reference util.py:167-179).
    """
    cx, cy, w, h = bbox
    return [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2]


def bbox_transform_inv(bbox):
    """Corner (xmin, ymin, xmax, ymax) -> center (cx, cy, w, h).

    Uses the reference's +1.0 width/height convention (util.py:189-190):
    a box spanning pixel columns xmin..xmax inclusively is xmax-xmin+1 wide.
    """
    xmin, ymin, xmax, ymax = bbox
    width = xmax - xmin + 1.0
    height = ymax - ymin + 1.0
    return [xmin + 0.5 * width, ymin + 0.5 * height, width, height]


def iou(box1, box2) -> float:
    """IoU of two center-format boxes (reference util.py:9-30)."""
    lr = min(box1[0] + 0.5 * box1[2], box2[0] + 0.5 * box2[2]) - \
        max(box1[0] - 0.5 * box1[2], box2[0] - 0.5 * box2[2])
    if lr > 0:
        tb = min(box1[1] + 0.5 * box1[3], box2[1] + 0.5 * box2[3]) - \
            max(box1[1] - 0.5 * box1[3], box2[1] - 0.5 * box2[3])
        if tb > 0:
            intersection = tb * lr
            union = box1[2] * box1[3] + box2[2] * box2[3] - intersection
            return intersection / union
    return 0.0


def batch_iou(boxes, box):
    """IoU of [N, 4] center-format boxes against a single box.

    Matches reference util.py:32-54 including its lack of an epsilon (union
    of two zero-area boxes divides by zero, as in the reference).
    """
    np_ = np if isinstance(boxes, np.ndarray) else _jnp()
    lr = np_.maximum(
        np_.minimum(boxes[:, 0] + 0.5 * boxes[:, 2], box[0] + 0.5 * box[2]) -
        np_.maximum(boxes[:, 0] - 0.5 * boxes[:, 2], box[0] - 0.5 * box[2]),
        0)
    tb = np_.maximum(
        np_.minimum(boxes[:, 1] + 0.5 * boxes[:, 3], box[1] + 0.5 * box[3]) -
        np_.maximum(boxes[:, 1] - 0.5 * boxes[:, 3], box[1] - 0.5 * box[3]),
        0)
    inter = lr * tb
    union = boxes[:, 2] * boxes[:, 3] + box[2] * box[3] - inter
    return inter / union


def pairwise_iou_center(a, b, eps: float = 0.0):
    """Pairwise IoU matrix [N, M] between center-format box sets.

    Vectorised (no python loops) so it runs on the VPU under jit.  ``eps``
    guards the division for padded zero boxes (the reference host path has
    no epsilon; pass 0 to match it on non-degenerate data).
    """
    np_ = np if isinstance(a, np.ndarray) else _jnp()
    ax1, ay1, ax2, ay2 = (a[:, 0] - a[:, 2] / 2, a[:, 1] - a[:, 3] / 2,
                          a[:, 0] + a[:, 2] / 2, a[:, 1] + a[:, 3] / 2)
    bx1, by1, bx2, by2 = (b[:, 0] - b[:, 2] / 2, b[:, 1] - b[:, 3] / 2,
                          b[:, 0] + b[:, 2] / 2, b[:, 1] + b[:, 3] / 2)
    lr = np_.maximum(
        np_.minimum(ax2[:, None], bx2[None, :]) -
        np_.maximum(ax1[:, None], bx1[None, :]), 0)
    tb = np_.maximum(
        np_.minimum(ay2[:, None], by2[None, :]) -
        np_.maximum(ay1[:, None], by1[None, :]), 0)
    inter = lr * tb
    union = (a[:, 2] * a[:, 3])[:, None] + (b[:, 2] * b[:, 3])[None, :] - inter
    return inter / (union + eps)


def safe_exp_np(w: np.ndarray, thresh: float) -> np.ndarray:
    """Numpy reference of safe_exp (util.py:219-231)."""
    slope = np.exp(thresh)
    lin = w > thresh
    lin_out = slope * (w - thresh + 1.0)
    exp_out = np.exp(np.where(lin, 0.0, w))
    return np.where(lin, lin_out, exp_out)


def safe_exp(w, thresh: float):
    """jax version of safe_exp; exp below ``thresh``, linearised above.

    The exp input is zeroed in the linear region before exponentiating, as
    the reference does, so gradients never see exp of a large value.
    """
    jnp = _jnp()
    slope = float(np.exp(thresh))
    lin = w > thresh
    lin_out = slope * (w - thresh + 1.0)
    exp_out = jnp.exp(jnp.where(lin, jnp.zeros_like(w), w))
    return jnp.where(lin, lin_out, exp_out)


def _jnp():
    import jax.numpy as jnp
    return jnp
