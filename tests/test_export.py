"""jax.export serving artifacts: serialize, reload, run, compare."""

import jax
import numpy as np

from squeezedet_tpu.config import tiny_test_config
from squeezedet_tpu.models import get_model
from squeezedet_tpu.serving import export_model, load_exported


def test_export_roundtrip_matches_direct_inference(tmp_path):
    cfg = tiny_test_config(image_width=96, image_height=96, batch_size=1)
    det = get_model("squeezeDet", cfg)
    params, _, _ = det.init(jax.random.key(0))

    path = str(tmp_path / "artifact")
    export_model(det, params, path, batch_size=1, uint8_input=True,
                 postprocess=True, platforms=("cpu",))

    fn, meta = load_exported(path)
    assert meta["class_names"] == list(cfg.class_names)
    assert meta["input_dtype"] == "uint8"

    rng = np.random.RandomState(0)
    im = rng.randint(0, 255, (1, 96, 96, 3), np.uint8)

    from squeezedet_tpu.ops.postprocess import filter_prediction_device
    interp = jax.jit(det.predict_raw)(params, im)
    ref = filter_prediction_device(
        interp.det_boxes, interp.det_probs, interp.det_class,
        top_n=cfg.top_n_detection, nms_thresh=cfg.nms_thresh,
        num_classes=cfg.classes, prob_thresh=cfg.prob_thresh)
    out = fn(im)
    assert len(out) == 4
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-5)


def test_export_raw_interpretation_f32(tmp_path):
    cfg = tiny_test_config(image_width=64, image_height=64, batch_size=2)
    det = get_model("squeezeDet", cfg)
    params, _, _ = det.init(jax.random.key(1))
    path = str(tmp_path / "raw")
    export_model(det, params, path, batch_size=2, uint8_input=False,
                 postprocess=False, platforms=("cpu",))
    fn, meta = load_exported(path)
    assert meta["postprocess"] is False
    rng = np.random.RandomState(1)
    im = rng.randn(2, 64, 64, 3).astype(np.float32)
    ref = jax.jit(det.predict)(params, im)
    boxes, probs, classes = fn(im)
    np.testing.assert_allclose(np.asarray(boxes),
                               np.asarray(ref.det_boxes),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(probs),
                               np.asarray(ref.det_probs),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(classes),
                                  np.asarray(ref.det_class))


def test_export_quantized_roundtrip(tmp_path):
    """int8 artifact: quantized program bakes in, reloads, and matches
    direct predict_quant_postprocessed exactly."""
    cfg = tiny_test_config(image_width=96, image_height=96, batch_size=1)
    det = get_model("squeezeDet", cfg)
    params, _, _ = det.init(jax.random.key(0))
    rng = np.random.RandomState(0)
    im = rng.randint(0, 255, (1, 96, 96, 3), np.uint8)
    qparams = det.quantize(params, [im])

    path = str(tmp_path / "artifact_q")
    export_model(det, qparams, path, batch_size=1, uint8_input=True,
                 postprocess=True, platforms=("cpu",), quantized=True)
    fn, meta = load_exported(path)
    assert meta["quantized"] is True

    ref = jax.jit(det.predict_quant_postprocessed)(qparams, im)
    out = fn(im)
    for a, b in zip(ref, out):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
