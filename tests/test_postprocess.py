"""Device postprocess parity vs the host filter_prediction path."""

import jax.numpy as jnp
import numpy as np

from squeezedet_tpu.ops.nms import filter_prediction_np
from squeezedet_tpu.ops.postprocess import (device_results_to_lists,
                                            filter_prediction_device)


def _random_dets(rng, n=400, classes=3):
    boxes = np.stack([
        rng.rand(n) * 800 + 100,   # cx
        rng.rand(n) * 300 + 50,    # cy
        rng.rand(n) * 100 + 20,    # w
        rng.rand(n) * 80 + 20,     # h
    ], axis=1).astype(np.float32)
    probs = rng.rand(n).astype(np.float32)
    cls = rng.randint(0, classes, n).astype(np.int32)
    return boxes, probs, cls


def test_device_matches_host(rng):
    for trial in range(5):
        boxes, probs, cls = _random_dets(rng)
        db, dp, dc, keep = filter_prediction_device(
            jnp.asarray(boxes)[None], jnp.asarray(probs)[None],
            jnp.asarray(cls)[None], top_n=64, nms_thresh=0.4, num_classes=3)
        got = device_results_to_lists(
            np.asarray(db[0]), np.asarray(dp[0]), np.asarray(dc[0]),
            np.asarray(keep[0]), num_classes=3)
        want = filter_prediction_np(
            boxes, probs, cls, classes=3, top_n_detection=64,
            prob_thresh=0.005, nms_thresh=0.4)
        assert len(got[0]) == len(want[0])
        np.testing.assert_allclose(
            np.asarray(got[0]), np.asarray(want[0]), rtol=1e-5)
        np.testing.assert_allclose(got[1], want[1], rtol=1e-5)
        assert got[2] == want[2]


def test_device_batched_shapes(rng):
    boxes, probs, cls = _random_dets(rng)
    b4 = jnp.stack([jnp.asarray(boxes)] * 4)
    p4 = jnp.stack([jnp.asarray(probs)] * 4)
    c4 = jnp.stack([jnp.asarray(cls)] * 4)
    db, dp, dc, keep = filter_prediction_device(
        b4, p4, c4, top_n=64, nms_thresh=0.4, num_classes=3)
    assert db.shape == (4, 64, 4) and keep.shape == (4, 64)
    # batch entries identical -> identical results
    np.testing.assert_array_equal(np.asarray(keep[0]), np.asarray(keep[3]))


def test_probs_descending(rng):
    boxes, probs, cls = _random_dets(rng)
    _, dp, _, _ = filter_prediction_device(
        jnp.asarray(boxes)[None], jnp.asarray(probs)[None],
        jnp.asarray(cls)[None], top_n=64, nms_thresh=0.4, num_classes=3)
    p = np.asarray(dp[0])
    assert (np.diff(p) <= 1e-7).all()


def test_top_n_larger_than_anchor_count(rng):
    """Tiny grids can have fewer anchors than TOP_N_DETECTION."""
    boxes, probs, cls = _random_dets(rng, n=20)
    db, dp, dc, keep = filter_prediction_device(
        jnp.asarray(boxes)[None], jnp.asarray(probs)[None],
        jnp.asarray(cls)[None], top_n=64, nms_thresh=0.4, num_classes=3)
    assert db.shape == (1, 20, 4) and keep.shape == (1, 20)


def test_prob_thresh_applied_when_top_n_covers_all_anchors(rng):
    """When top_n >= #anchors the host reference switches to
    probs > PROB_THRESH filtering (nn_skeleton.py:711-720); the device
    path must drop the same near-zero candidates."""
    boxes, probs, cls = _random_dets(rng, n=20)
    probs = np.linspace(0.9, 0.001, 20).astype(np.float32)
    db, dp, dc, keep = filter_prediction_device(
        jnp.asarray(boxes)[None], jnp.asarray(probs)[None],
        jnp.asarray(cls)[None], top_n=64, nms_thresh=0.4, num_classes=3,
        prob_thresh=0.1)
    kept_probs = np.asarray(dp[0])[np.asarray(keep[0])]
    assert (kept_probs > 0.1).all()
    # host/device agreement on the surviving set
    hb, hp, hc = filter_prediction_np(
        boxes, probs, cls, classes=3, top_n_detection=64,
        prob_thresh=0.1, nms_thresh=0.4)
    assert sorted(np.round(kept_probs, 5)) == sorted(
        np.round(np.asarray(hp, np.float32), 5))

    # with a large top_n but no threshold, near-zero candidates survive
    _, dp2, _, keep2 = filter_prediction_device(
        jnp.asarray(boxes)[None], jnp.asarray(probs)[None],
        jnp.asarray(cls)[None], top_n=64, nms_thresh=0.4, num_classes=3)
    assert np.asarray(keep2[0]).sum() >= np.asarray(keep[0]).sum()


def test_negotiated_inference_fn_smoke():
    """serving.negotiated_inference_fn compiles and runs (on CPU the
    AUTO-layout negotiation may fall back to the default layout; either
    branch must produce working inference)."""
    import jax
    import numpy as np
    from squeezedet_tpu.config import tiny_test_config
    from squeezedet_tpu.models import get_model
    from squeezedet_tpu.serving import negotiated_inference_fn

    cfg = tiny_test_config(image_width=64, image_height=64, batch_size=2)
    det = get_model("squeezeDet", cfg)
    params, _, _ = det.init(jax.random.key(0))
    fn, fmt = negotiated_inference_fn(det, 2, params)
    x = jax.device_put(np.zeros((2, 64, 64, 3), np.uint8), fmt)
    boxes, probs, classes, keep = fn(params, x)
    assert boxes.shape[0] == 2 and probs.shape == keep.shape


def test_tied_scores_rank_like_host():
    """Exactly-tied scores (saturated sigmoids): the host ranks the
    LARGER anchor index first (probs.argsort()[::-1] reversal of a
    stable ascending sort); the device top-k must agree or NMS
    suppression order diverges."""
    n = 40
    rng = np.random.RandomState(3)
    boxes = np.stack([
        rng.uniform(50, 950, n), rng.uniform(50, 250, n),
        np.full(n, 300.0), np.full(n, 300.0)], axis=1).astype(np.float32)
    # heavily-overlapping big boxes, all same class, all tied scores
    probs = np.full((n,), 0.75, np.float32)
    cls = np.zeros((n,), np.int64)

    db, dp, dc, keep = filter_prediction_device(
        jnp.asarray(boxes)[None], jnp.asarray(probs)[None],
        jnp.asarray(cls)[None], top_n=16, nms_thresh=0.4, num_classes=3)
    got = device_results_to_lists(
        np.asarray(db[0]), np.asarray(dp[0]), np.asarray(dc[0]),
        np.asarray(keep[0]), num_classes=3)
    want = filter_prediction_np(
        boxes, probs, cls, classes=3, top_n_detection=16,
        prob_thresh=0.005, nms_thresh=0.4)
    assert len(got[0]) == len(want[0])
    np.testing.assert_allclose(np.asarray(got[0]),
                               np.asarray(want[0]), rtol=1e-6)


def test_tied_scores_prob_thresh_regime_parity():
    """Same two-layer tie contract in the PROB-THRESH regime
    (top_n >= num candidates, so the top-N reorder is skipped): the
    host path must still resolve equal-score overlaps
    smaller-anchor-first like the device kernel's
    (pi == pj) & (li > lj) mask, via the reversed candidate order in
    filter_prediction_np's else branch."""
    boxes = np.array([[100.0, 100.0, 50.0, 50.0],
                      [105.0, 102.0, 50.0, 50.0],
                      [600.0, 100.0, 50.0, 50.0],
                      [604.0, 103.0, 50.0, 50.0]], np.float32)
    probs = np.full((4,), 0.5, np.float32)
    cls = np.zeros((4,), np.int64)

    db, dp, dc, keep = filter_prediction_device(
        jnp.asarray(boxes)[None], jnp.asarray(probs)[None],
        jnp.asarray(cls)[None], top_n=64, nms_thresh=0.4, num_classes=3)
    got = device_results_to_lists(
        np.asarray(db[0]), np.asarray(dp[0]), np.asarray(dc[0]),
        np.asarray(keep[0]), num_classes=3)
    want = filter_prediction_np(
        boxes, probs, cls, classes=3, top_n_detection=64,
        prob_thresh=0.005, nms_thresh=0.4)
    assert len(want[0]) == 2  # one survivor per tied pair
    assert len(got[0]) == len(want[0])
    np.testing.assert_allclose(np.sort(np.asarray(got[0]), axis=0),
                               np.sort(np.asarray(want[0]), axis=0),
                               rtol=1e-6)
