"""Demo entry point end-to-end (reference src/demo.py).

Image mode is driven live in the verify logs; these hermetic tests
cover the previously untested video mode (frame crop ``[500:-205,
239:-439]``, per-frame detect/draw/write loop, demo.py:44-158) and the
image-mode int8 path, at a custom resolution small enough for CPU.
"""

import glob
import os

import cv2
import numpy as np

from squeezedet_tpu.demo import main

# the reference crop (demo.py:91) removes these margins; frames must be
# margin + model resolution so the cropped frame IS the model input.
# H is odd because every cv2 video codec coerces frame dims to even:
# margins sum to 705, so only an odd model height gives an even total.
_CROP_TOP, _CROP_BOTTOM = 500, 205
_CROP_LEFT, _CROP_RIGHT = 239, 439
W, H = 320, 95


def test_video_demo_writes_cropped_frames(tmp_path):
    vid = str(tmp_path / "in.avi")
    fw, fh = _CROP_LEFT + W + _CROP_RIGHT, _CROP_TOP + H + _CROP_BOTTOM
    writer = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"MJPG"), 5,
                             (fw, fh))
    assert writer.isOpened()
    rng = np.random.RandomState(0)
    for _ in range(2):
        writer.write(rng.randint(0, 255, (fh, fw, 3), np.uint8))
    writer.release()

    out_dir = str(tmp_path / "out")
    main(["--mode", "video", "--input_path", vid, "--out_dir", out_dir,
          "--checkpoint", "", "--image_width", str(W),
          "--image_height", str(H)])
    outs = sorted(glob.glob(os.path.join(out_dir, "*.jpg")))
    assert len(outs) == 2
    im = cv2.imread(outs[0])
    # written frames are the cropped (model-resolution) frames
    assert im.shape == (H, W, 3)


def test_demo_device_postprocess_matches_host(tmp_path):
    """--device_postprocess wiring: the fused-program path must yield
    the same final (boxes, probs, classes) lists as the reference host
    filter_prediction path, including the grouped-by-class ordering the
    draw loop consumes.  plot_prob_thresh is dropped to 0.01 so random
    weights produce non-empty detections."""
    import jax
    import jax.numpy as jnp

    from squeezedet_tpu.config.kitti import config_for_net_at
    from squeezedet_tpu.demo import _filter_outputs
    from squeezedet_tpu.models import get_model

    cfg = config_for_net_at("squeezeDet", W, H).replace(
        batch_size=1, load_pretrained_model=False, plot_prob_thresh=0.01)
    det = get_model("squeezeDet", cfg)
    params, _, _ = det.init(jax.random.key(0))
    im = np.random.RandomState(0).randn(1, H, W, 3).astype(np.float32)

    interp = jax.jit(det.predict)(params, jnp.asarray(im))
    fused = jax.jit(
        lambda p, x: det.postprocess_device(det.predict(p, x)))(
            params, jnp.asarray(im))
    h_boxes, h_probs, h_cls = _filter_outputs(det, interp, cfg, False)
    d_boxes, d_probs, d_cls = _filter_outputs(det, fused, cfg, True)
    assert len(h_boxes) > 0, "threshold too high for a meaningful pin"
    assert d_cls == list(h_cls)
    np.testing.assert_allclose(np.asarray(d_probs), np.asarray(h_probs),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d_boxes), np.asarray(h_boxes),
                               rtol=1e-4, atol=1e-2)

    # CLI wiring smoke: the flag runs end-to-end and writes the output
    src = str(tmp_path / "in.png")
    cv2.imwrite(src, np.random.RandomState(0).randint(
        0, 255, (64, 200, 3), np.uint8))
    out_dir = str(tmp_path / "out")
    main(["--mode", "image", "--input_path", src, "--out_dir", out_dir,
          "--checkpoint", "", "--image_width", str(W),
          "--image_height", str(H), "--device_postprocess"])
    assert os.path.exists(os.path.join(out_dir, "out_in.png"))


def test_image_demo_int8(tmp_path):
    src = str(tmp_path / "in.png")
    rng = np.random.RandomState(0)
    cv2.imwrite(src, rng.randint(0, 255, (64, 200, 3), np.uint8))
    out_dir = str(tmp_path / "out")
    main(["--mode", "image", "--input_path", src, "--out_dir", out_dir,
          "--checkpoint", "", "--image_width", str(W),
          "--image_height", str(H), "--quantize", "int8"])
    assert os.path.exists(os.path.join(out_dir, "out_in.png"))
