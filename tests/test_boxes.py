"""Box math parity with reference src/utils/util.py."""

import jax.numpy as jnp
import numpy as np

from squeezedet_tpu.ops.boxes import (batch_iou, bbox_transform,
                                      bbox_transform_inv, iou,
                                      pairwise_iou_center, safe_exp,
                                      safe_exp_np)


def test_bbox_transform_roundtrip_has_plus_one_convention():
    # corners -> center carries the +1 w/h convention (util.py:189-190)
    cx, cy, w, h = bbox_transform_inv([10.0, 20.0, 30.0, 60.0])
    assert w == 30.0 - 10.0 + 1.0
    assert h == 60.0 - 20.0 + 1.0
    assert cx == 10.0 + 0.5 * w
    # center -> corners has NO offset (util.py:167-179)
    xmin, ymin, xmax, ymax = bbox_transform([cx, cy, w, h])
    assert xmax - xmin == w


def test_iou_matches_brute_force(rng):
    for _ in range(100):
        b1 = rng.rand(4) * 50 + [50, 50, 10, 10]
        b2 = rng.rand(4) * 50 + [50, 50, 10, 10]

        def area_inter(a, b):
            ax1, ay1, ax2, ay2 = a[0] - a[2] / 2, a[1] - a[3] / 2, \
                a[0] + a[2] / 2, a[1] + a[3] / 2
            bx1, by1, bx2, by2 = b[0] - b[2] / 2, b[1] - b[3] / 2, \
                b[0] + b[2] / 2, b[1] + b[3] / 2
            iw = max(0.0, min(ax2, bx2) - max(ax1, bx1))
            ih = max(0.0, min(ay2, by2) - max(ay1, by1))
            return iw * ih

        inter = area_inter(b1, b2)
        want = inter / (b1[2] * b1[3] + b2[2] * b2[3] - inter)
        np.testing.assert_allclose(iou(b1, b2), want, rtol=1e-12)


def test_batch_iou_matches_scalar(rng):
    boxes = rng.rand(32, 4) * 100 + 20
    box = rng.rand(4) * 100 + 20
    got = batch_iou(boxes, box)
    want = np.array([iou(b, box) for b in boxes])
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_pairwise_iou_center_matches_batch(rng):
    a = rng.rand(12, 4) * 100 + 20
    b = rng.rand(7, 4) * 100 + 20
    got = pairwise_iou_center(a, b)
    for j in range(7):
        np.testing.assert_allclose(got[:, j], batch_iou(a, b[j]), rtol=1e-10)


def test_safe_exp_linearizes_above_threshold():
    thresh = 1.0
    w = np.array([-3.0, 0.0, 0.999, 1.0, 1.5, 10.0, 100.0])
    got = safe_exp_np(w, thresh)
    # below: exact exp
    np.testing.assert_allclose(got[:3], np.exp(w[:3]))
    # above: slope*(w - thresh + 1) with slope = e^thresh (util.py:219-231)
    slope = np.exp(thresh)
    np.testing.assert_allclose(got[4:], slope * (w[4:] - thresh + 1.0))
    # no overflow at w=100
    assert np.isfinite(got).all()


def test_safe_exp_jax_matches_numpy(rng):
    w = rng.randn(1000).astype(np.float32) * 3
    got = np.asarray(safe_exp(jnp.asarray(w), 1.0))
    want = safe_exp_np(w, 1.0).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_safe_exp_gradient_finite_in_linear_region():
    import jax
    g = jax.grad(lambda x: safe_exp(x, 1.0))(jnp.float32(50.0))
    np.testing.assert_allclose(float(g), float(np.exp(1.0)), rtol=1e-6)
