"""NMS parity with reference util.nms (util.py:56-76) and
filter_prediction (nn_skeleton.py:696-734)."""

import numpy as np

from squeezedet_tpu.ops.boxes import batch_iou
from squeezedet_tpu.ops.nms import filter_prediction_np, nms


def _reference_nms(boxes, probs, threshold):
    """Literal transcription of util.py:56-76 as the oracle."""
    order = probs.argsort()[::-1]
    keep = [True] * len(order)
    for i in range(len(order) - 1):
        ovps = batch_iou(boxes[order[i + 1:]], boxes[order[i]])
        for j, ov in enumerate(ovps):
            if ov > threshold:
                keep[order[j + i + 1]] = False
    return keep


def test_nms_matches_reference(rng):
    for _ in range(20):
        n = rng.randint(2, 40)
        boxes = rng.rand(n, 4) * 60 + np.array([50, 50, 30, 30])
        probs = rng.rand(n)
        assert nms(boxes, probs, 0.4) == _reference_nms(boxes, probs, 0.4)


def test_nms_suppression_uses_candidates_not_survivors():
    # Box A (top) suppresses B; B overlaps C but A does not.  Reference
    # semantics: C is STILL suppressed by candidate B even though B lost.
    boxes = np.array([
        [50.0, 50.0, 20.0, 20.0],   # A
        [62.0, 50.0, 20.0, 20.0],   # B: IoU(A,B) = 0.25
        [74.0, 50.0, 20.0, 20.0],   # C: IoU(B,C) = 0.25, IoU(A,C) = 0
    ])
    probs = np.array([0.9, 0.8, 0.7])
    keep = nms(boxes, probs, 0.2)
    assert keep == [True, False, False]


def test_filter_prediction_top_n(rng):
    n = 500
    boxes = rng.rand(n, 4) * 200 + 50
    probs = rng.rand(n)
    cls = rng.randint(0, 3, n)
    fb, fp, fc = filter_prediction_np(
        boxes, probs, cls, classes=3, top_n_detection=64,
        prob_thresh=0.005, nms_thresh=0.4)
    assert len(fb) == len(fp) == len(fc)
    assert len(fb) <= 64
    # grouped by class, descending prob within class
    order = np.argsort(fc, kind="stable")
    assert list(order) == sorted(order)  # already class-grouped
    for c in range(3):
        pc = [p for p, k in zip(fp, fc) if k == c]
        assert pc == sorted(pc, reverse=True)


def test_filter_prediction_prob_thresh_branch(rng):
    # with top_n <= 0 it takes the PROB_THRESH path (nn_skeleton.py:716-720)
    boxes = np.array([[50.0, 50, 10, 10], [200.0, 200, 10, 10]])
    probs = np.array([0.5, 0.001])
    cls = np.array([0, 1])
    fb, fp, fc = filter_prediction_np(
        boxes, probs, cls, classes=3, top_n_detection=0,
        prob_thresh=0.005, nms_thresh=0.4)
    assert len(fb) == 1 and fp[0] == 0.5
