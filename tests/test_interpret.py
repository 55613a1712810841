"""Interpretation-graph parity (nn_skeleton.py:142-283): channel layout,
anchor decode, clipping, final scores."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from squeezedet_tpu.config import tiny_test_config
from squeezedet_tpu.models.skeleton import interpret
from squeezedet_tpu.ops.boxes import safe_exp_np


@pytest.fixture(scope="module")
def cfg():
    return tiny_test_config()


def _np_reference_interpret(preds, anchors, C, APG, W, H, exp_thresh):
    """Numpy transcription of nn_skeleton.py:142-283 as test oracle."""
    B = preds.shape[0]
    A = anchors.shape[0]
    ncp = APG * C
    logits = preds[..., :ncp].reshape(-1, C)
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    class_probs = (e / e.sum(axis=1, keepdims=True)).reshape(B, A, C)
    conf = 1 / (1 + np.exp(-preds[..., ncp:ncp + APG].reshape(B, A)))
    delta = preds[..., ncp + APG:].reshape(B, A, 4)
    ax, ay, aw, ah = anchors.T
    cx = ax + delta[..., 0] * aw
    cy = ay + delta[..., 1] * ah
    w = aw * safe_exp_np(delta[..., 2], exp_thresh)
    h = ah * safe_exp_np(delta[..., 3], exp_thresh)
    xmin, ymin, xmax, ymax = cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2
    xmin = np.minimum(np.maximum(0.0, xmin), W - 1.0)
    ymin = np.minimum(np.maximum(0.0, ymin), H - 1.0)
    xmax = np.maximum(np.minimum(W - 1.0, xmax), 0.0)
    ymax = np.maximum(np.minimum(H - 1.0, ymax), 0.0)
    bw, bh = xmax - xmin + 1.0, ymax - ymin + 1.0
    det_boxes = np.stack([xmin + 0.5 * bw, ymin + 0.5 * bh, bw, bh], axis=-1)
    probs = class_probs * conf[..., None]
    return class_probs, conf, delta, det_boxes, probs.max(2), probs.argmax(2)


def test_interpret_matches_numpy_reference(cfg, rng):
    anchors = cfg.anchor_box.astype(np.float32)
    preds = rng.randn(2, cfg.grid_h, cfg.grid_w,
                      cfg.head_channels).astype(np.float32)
    got = interpret(jnp.asarray(preds), jnp.asarray(anchors),
                    num_classes=cfg.classes,
                    anchor_per_grid=cfg.anchor_per_grid,
                    image_width=cfg.image_width,
                    image_height=cfg.image_height,
                    exp_thresh=cfg.exp_thresh)
    want = _np_reference_interpret(
        preds, anchors, cfg.classes, cfg.anchor_per_grid,
        cfg.image_width, cfg.image_height, cfg.exp_thresh)
    np.testing.assert_allclose(got.pred_class_probs, want[0], atol=1e-6)
    np.testing.assert_allclose(got.pred_conf, want[1], atol=1e-6)
    np.testing.assert_allclose(got.pred_box_delta, want[2], atol=1e-6)
    np.testing.assert_allclose(got.det_boxes, want[3], rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(got.det_probs, want[4], atol=1e-6)
    np.testing.assert_array_equal(got.det_class, want[5])


def test_channel_layout_is_anchor_major(cfg):
    """preds[..., :APG*C].reshape(-1, C) implies channel c of anchor a sits
    at channel a*C + c (nn_skeleton.py:149-160)."""
    B, H, W = 1, cfg.grid_h, cfg.grid_w
    APG, C = cfg.anchor_per_grid, cfg.classes
    preds = np.zeros((B, H, W, cfg.head_channels), np.float32)
    a, c = 4, 2  # anchor 4 at cell (0, 0), class 2
    preds[0, 0, 0, a * C + c] = 10.0
    got = interpret(jnp.asarray(preds), jnp.asarray(cfg.anchor_box,
                    jnp.float32),
                    num_classes=C, anchor_per_grid=APG,
                    image_width=cfg.image_width,
                    image_height=cfg.image_height)
    # flat anchor index for cell (0,0) anchor a is just a
    assert int(got.det_class[0, a]) == c
    assert float(got.pred_class_probs[0, a, c]) > 0.99


def test_conf_channel_block(cfg):
    """conf for anchor a sits at channel APG*C + a (nn_skeleton.py:163-170)."""
    APG, C = cfg.anchor_per_grid, cfg.classes
    preds = np.zeros((1, cfg.grid_h, cfg.grid_w, cfg.head_channels),
                     np.float32)
    preds[0, 0, 0, APG * C + 3] = 100.0  # anchor 3 conf -> sigmoid ~ 1
    got = interpret(jnp.asarray(preds),
                    jnp.asarray(cfg.anchor_box, jnp.float32),
                    num_classes=C, anchor_per_grid=APG,
                    image_width=cfg.image_width,
                    image_height=cfg.image_height)
    assert float(got.pred_conf[0, 3]) > 0.999
    assert abs(float(got.pred_conf[0, 2]) - 0.5) < 1e-6


def test_boxes_clipped_to_image(cfg, rng):
    preds = (rng.randn(1, cfg.grid_h, cfg.grid_w, cfg.head_channels) *
             5).astype(np.float32)
    got = interpret(jnp.asarray(preds),
                    jnp.asarray(cfg.anchor_box, jnp.float32),
                    num_classes=cfg.classes,
                    anchor_per_grid=cfg.anchor_per_grid,
                    image_width=cfg.image_width,
                    image_height=cfg.image_height)
    b = np.asarray(got.det_boxes)
    # undo the +1 convention: cx = xmin + (xmax-xmin+1)/2
    xmin = b[..., 0] - b[..., 2] / 2
    xmax = b[..., 0] + b[..., 2] / 2 - 1.0
    assert (xmin >= -1e-3).all() and (xmax <= cfg.image_width - 1 + 1e-3).all()
