"""int8 post-training quantization (squeezedet_tpu/quant.py).

The reference has no quantized inference; these tests pin the TPU-native
extension's math: exact epilogue semantics vs a numpy reference, the
never-clipping input-scale bound, float/int8 prediction agreement on
every supported backbone, and the partial-boundary (hybrid) mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from squeezedet_tpu.config import tiny_test_config
from squeezedet_tpu.models import get_model
from squeezedet_tpu.models import layers as L
from squeezedet_tpu.quant import (INPUT_SCALE_KEY, _quantize_conv,
                                  calibrate, input_scale, quantize_detector,
                                  quantize_images)


def test_input_scale_never_clips():
    means = (103.939, 116.779, 123.68)  # BGR_MEANS, config.py:66
    s = input_scale(means)
    u8 = np.arange(256, dtype=np.uint8).reshape(1, 8, 32, 1)
    u8 = np.repeat(u8, 3, axis=3)
    q = np.asarray(quantize_images(jnp.asarray(u8), means, s))
    # every uint8 value must land strictly inside int8 without clipping
    x = u8.astype(np.float64) - np.asarray(means)
    assert np.abs(x / s).max() <= 127.0 + 1e-6
    assert np.array_equal(q, np.clip(np.rint(x / s), -128, 127))


def _np_int8_conv(x, k, stride, padding, mult, bias, relu):
    """Direct numpy int32-accumulation + f32-epilogue evaluation."""
    kh, kw = k.shape[:2]
    b, h, w, _ = x.shape
    o = k.shape[3]
    if padding == "SAME":
        oh, ow = -(-h // stride), -(-w // stride)
        ph = max((oh - 1) * stride + kh - h, 0)
        pw = max((ow - 1) * stride + kw - w, 0)
        xp = np.pad(x.astype(np.int32),
                    ((0, 0), (ph // 2, ph - ph // 2),
                     (pw // 2, pw - pw // 2), (0, 0)))
    else:
        oh, ow = -(-(h - kh + 1) // stride), -(-(w - kw + 1) // stride)
        xp = x.astype(np.int32)
    acc = np.zeros((b, oh, ow, o), np.int32)
    for dy in range(kh):
        for dx in range(kw):
            win = xp[:, dy:dy + (oh - 1) * stride + 1:stride,
                     dx:dx + (ow - 1) * stride + 1:stride, :]
            acc += np.einsum("bhwc,co->bhwo", win,
                             k[dy, dx].astype(np.int32))
    y = acc.astype(np.float32) * mult + bias
    if relu:
        return np.clip(np.rint(np.maximum(y, 0.0)), 0, 127) \
            .astype(np.int8)
    return y


@pytest.mark.parametrize("ksize,stride,padding,relu", [
    (3, 1, "SAME", True),
    (1, 1, "SAME", True),
    (3, 2, "SAME", True),
    (3, 2, "VALID", True),
    (7, 2, "VALID", True),
    (3, 1, "SAME", False),
])
def test_conv2d_int8_matches_numpy_reference(ksize, stride, padding,
                                             relu):
    """The jitted quantized conv must agree exactly with a direct numpy
    int32-accumulation + f32-epilogue evaluation (symmetric zero-points
    keep SAME padding exact) across the geometries the backbones use."""
    rng = np.random.RandomState(0)
    x = rng.randint(-128, 128, (2, 9, 11, 8)).astype(np.int8)
    k = rng.randint(-127, 128, (ksize, ksize, 8, 5)).astype(np.int8)
    mult = rng.uniform(1e-4, 1e-2, 5).astype(np.float32)
    bias = rng.uniform(-1, 1, 5).astype(np.float32)
    params = {"kernel": jnp.asarray(k), "mult": jnp.asarray(mult),
              "bias": jnp.asarray(bias)}

    got = np.asarray(jax.jit(
        lambda p, x: L.conv2d(p, x, stride, padding, relu=relu))(
            params, jnp.asarray(x)))
    want = _np_int8_conv(x, k, stride, padding, mult, bias, relu)
    assert got.dtype == want.dtype
    if relu:
        assert np.array_equal(got, want)
    else:
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)


def test_quantize_conv_folding():
    """mult/bias folding: dequantized output of the int8 layer tracks
    the float layer within the quantization step bound."""
    rng = np.random.RandomState(1)
    layer = {"kernel": jnp.asarray(rng.randn(1, 1, 16, 4), jnp.float32),
             "bias": jnp.asarray(rng.randn(4), jnp.float32)}
    s_in, s_out = 0.05, 0.02
    q = _quantize_conv(layer, s_in, s_out)
    assert np.asarray(q["kernel"]).dtype == np.int8
    # per-channel weight scale: int8 kernel * s_w ~ float kernel
    w = np.asarray(layer["kernel"])
    s_w = np.abs(w).max(axis=(0, 1, 2)) / 127.0
    assert np.abs(np.asarray(q["kernel"]) * s_w - w).max() <= \
        s_w.max() / 2 + 1e-7
    # folded multiplier = s_in * s_w / s_out
    assert np.allclose(np.asarray(q["mult"]), s_in * s_w / s_out,
                       rtol=1e-6)
    assert np.allclose(np.asarray(q["bias"]),
                       np.asarray(layer["bias"]) / s_out, rtol=1e-6)


@pytest.mark.parametrize("net", ["squeezeDet", "squeezeDet+", "vgg16",
                                 "resnet50"])
def test_quant_predictions_track_float(net):
    cfg = tiny_test_config(net=net, image_width=96, image_height=64)
    det = get_model(net, cfg)
    params, _, _ = det.init(jax.random.key(0))
    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 255, (2, cfg.image_height, cfg.image_width, 3),
                     np.uint8)
    qp = det.quantize(params, [u8])
    fi = jax.jit(det.predict_raw)(params, jnp.asarray(u8))
    qi = jax.jit(det.predict_quant)(qp, jnp.asarray(u8))
    a = np.asarray(fi.det_boxes, np.float32)
    b = np.asarray(qi.det_boxes, np.float32)
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.999
    probs_d = np.abs(np.asarray(fi.det_probs, np.float32)
                     - np.asarray(qi.det_probs, np.float32)).max()
    assert probs_d < 0.02, probs_d


def test_normalized_entry_matches_u8_entry():
    cfg = tiny_test_config(image_width=96, image_height=64)
    det = get_model("squeezeDet", cfg)
    params, _, _ = det.init(jax.random.key(0))
    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 255, (2, cfg.image_height, cfg.image_width, 3),
                     np.uint8)
    qp = det.quantize(params, [u8])
    qi = jax.jit(det.predict_quant)(qp, jnp.asarray(u8))
    f = u8.astype(np.float32) - cfg.bgr_means_array()
    qn = jax.jit(det.predict_quant_normalized)(qp, jnp.asarray(f))
    assert np.array_equal(np.asarray(qi.det_boxes),
                          np.asarray(qn.det_boxes))


def test_partial_boundary_start():
    """start='fire4': fire2/3 stay float, the boundary squeeze carries
    in_scale, and predictions still track the float model."""
    cfg = tiny_test_config(image_width=96, image_height=64)
    det = get_model("squeezeDet", cfg)
    params, _, _ = det.init(jax.random.key(0))
    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 255, (2, cfg.image_height, cfg.image_width, 3),
                     np.uint8)
    scales = calibrate(det, params, [u8])
    qp = quantize_detector(det, params, scales, start="fire4")
    assert INPUT_SCALE_KEY not in qp
    assert "mult" not in qp["conv1"]
    assert "mult" not in qp["fire2"]["squeeze1x1"]
    assert "mult" in qp["fire4"]["squeeze1x1"]
    assert "in_scale" in qp["fire4"]["squeeze1x1"]
    assert "in_scale" not in qp["fire5"]["squeeze1x1"]
    fi = jax.jit(det.predict_raw)(params, jnp.asarray(u8))
    qi = jax.jit(det.predict_quant)(qp, jnp.asarray(u8))
    a = np.asarray(fi.det_boxes, np.float32)
    b = np.asarray(qi.det_boxes, np.float32)
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.999


def test_whole_net_mode_marks_input_scale():
    cfg = tiny_test_config(image_width=96, image_height=64)
    det = get_model("squeezeDet", cfg)
    params, _, _ = det.init(jax.random.key(0))
    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 255, (1, cfg.image_height, cfg.image_width, 3),
                     np.uint8)
    qp = det.quantize(params, [u8], start="conv1")
    assert INPUT_SCALE_KEY in qp
    assert "mult" in qp["conv1"]


def test_resnet50_block_structure():
    """resnet50 quantized tree: conv1 float, BN folded away inside the
    int8 blocks, f32 residual joins re-quantized via out_scale, and a
    mid-chain start leaves earlier blocks float."""
    cfg = tiny_test_config(net="resnet50", image_width=96,
                           image_height=64)
    det = get_model("resnet50", cfg)
    params, _, _ = det.init(jax.random.key(0))
    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 255, (2, cfg.image_height, cfg.image_width, 3),
                     np.uint8)
    qp = det.quantize(params, [u8])
    assert "mult" not in qp["conv1"]
    blk = qp["res2a"]
    assert "mult" in blk["branch2"]["branch2a"]
    assert "gamma" not in blk["branch2"]["branch2a"]  # BN folded
    assert "in_scale" in blk["branch2"]["branch2a"]   # float boundary
    assert "in_scale" in blk["branch1"]
    assert "out_scale" in blk and "shortcut_scale" not in blk
    assert "shortcut_scale" in qp["res2b"]            # identity join
    assert "mult" in qp["conv5"]

    # mid-chain start: res2/res3 stay float
    from squeezedet_tpu.quant import calibrate, quantize_detector
    scales = calibrate(det, params, [u8])
    qp3 = quantize_detector(det, params, scales, start="res4a")
    assert "mult" not in qp3["res3d"]["branch2"]["branch2a"]
    assert "in_scale" in qp3["res4a"]["branch2"]["branch2a"]
    fi = jax.jit(det.predict_raw)(params, jnp.asarray(u8))
    qi = jax.jit(det.predict_quant)(qp3, jnp.asarray(u8))
    a = np.asarray(fi.det_boxes, np.float32)
    b = np.asarray(qi.det_boxes, np.float32)
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.999


def test_percentile_calibration_clips_outliers():
    """percentile calibration yields tighter scales than abs-max when a
    single outlier inflates a layer's range, and predictions still
    track float (the requant epilogue saturates the outliers)."""
    cfg = tiny_test_config(image_width=96, image_height=64)
    det = get_model("squeezeDet", cfg)
    params, _, _ = det.init(jax.random.key(0))
    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 255, (2, cfg.image_height, cfg.image_width, 3),
                     np.uint8)
    s_max = calibrate(det, params, [u8])
    s_p = calibrate(det, params, [u8], percentile=99.0)
    assert all(s_p[k] <= s_max[k] + 1e-6 for k in s_max)
    assert any(s_p[k] < s_max[k] * 0.999 for k in s_max)

    qp = det.quantize(params, [u8], percentile=99.9)
    fi = jax.jit(det.predict_raw)(params, jnp.asarray(u8))
    qi = jax.jit(det.predict_quant)(qp, jnp.asarray(u8))
    a = np.asarray(fi.det_boxes, np.float32)
    b = np.asarray(qi.det_boxes, np.float32)
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.999


def test_quant_report_rows():
    """tools/quant_report.py: per-layer scale/utilization/SNR rows are
    produced for every taped layer and int8 SNRs are healthy."""
    from squeezedet_tpu.tools.quant_report import report

    cfg = tiny_test_config(image_width=96, image_height=64)
    det = get_model("squeezeDet", cfg)
    params, _, _ = det.init(jax.random.key(0))
    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 255, (2, cfg.image_height, cfg.image_width, 3),
                     np.uint8)
    rows, qparams = report(det, params, u8)
    names = {r[0] for r in rows}
    assert "conv1" in names and "fire11/squeeze1x1" in names \
        and "conv12" in names
    for name, scale, util, db in rows:
        assert scale > 0
        assert db > 15.0, (name, db)
        if util == util:  # int8 layer: utilization is meaningful
            assert 0 < util <= 100.0


def test_low_percentile_does_not_zero_scales():
    """A percentile at/below the ReLU sparsity must fall back to
    abs-max per layer rather than emitting a zero scale (which would
    abort quantization with a misleading assertion)."""
    cfg = tiny_test_config(image_width=96, image_height=64)
    det = get_model("squeezeDet", cfg)
    params, _, _ = det.init(jax.random.key(0))
    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 255, (1, cfg.image_height, cfg.image_width, 3),
                     np.uint8)
    scales = calibrate(det, params, [u8], percentile=10.0)
    assert all(v > 0 for v in scales.values())
    qp = quantize_detector(det, params, scales)  # must not raise
    assert "mult" in qp["conv1"]
