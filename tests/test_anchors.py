"""Anchor-grid parity with the reference set_anchors
(kitti_squeezeDet_config.py:45-79)."""

import numpy as np

from squeezedet_tpu.config import (SQUEEZEDET_ANCHOR_SHAPES,
                                   kitti_res50_config,
                                   kitti_squeezedet_config,
                                   kitti_squeezedet_plus_config,
                                   kitti_vgg16_config, make_anchor_grid)


def _reference_set_anchors(H, W, B, shapes, img_w, img_h):
    """Literal transcription of the reference math for test-oracle use."""
    anchor_shapes = np.reshape([shapes] * H * W, (H, W, B, 2))
    center_x = np.reshape(
        np.transpose(
            np.reshape(
                np.array([np.arange(1, W + 1) * float(img_w) / (W + 1)] * H * B),
                (B, H, W)),
            (1, 2, 0)),
        (H, W, B, 1))
    center_y = np.reshape(
        np.transpose(
            np.reshape(
                np.array([np.arange(1, H + 1) * float(img_h) / (H + 1)] * W * B),
                (B, W, H)),
            (2, 1, 0)),
        (H, W, B, 1))
    anchors = np.reshape(
        np.concatenate((center_x, center_y, anchor_shapes), axis=3),
        (-1, 4))
    return anchors


def test_squeezedet_anchor_grid_matches_reference():
    got = make_anchor_grid(1248, 384, 78, 24, SQUEEZEDET_ANCHOR_SHAPES)
    want = _reference_set_anchors(24, 78, 9, SQUEEZEDET_ANCHOR_SHAPES,
                                  1248, 384)
    assert got.shape == (16848, 4)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_anchor_counts_per_model():
    assert kitti_squeezedet_config().anchors == 24 * 78 * 9 == 16848
    assert kitti_squeezedet_plus_config().anchors == 22 * 76 * 9 == 15048
    assert kitti_vgg16_config().anchors == 24 * 78 * 9
    assert kitti_res50_config().anchors == 24 * 78 * 9


def test_anchor_centers_are_fractional_inset():
    g = make_anchor_grid(1248, 384, 78, 24, SQUEEZEDET_ANCHOR_SHAPES)
    # first cell center: x = 1*1248/79, y = 1*384/25
    np.testing.assert_allclose(g[0, 0], 1248.0 / 79)
    np.testing.assert_allclose(g[0, 1], 384.0 / 25)
    # anchor order is (row, col, shape): index (r*W + c)*B + b
    r, c, b = 3, 10, 4
    idx = (r * 78 + c) * 9 + b
    np.testing.assert_allclose(g[idx, 0], (c + 1) * 1248.0 / 79)
    np.testing.assert_allclose(g[idx, 1], (r + 1) * 384.0 / 25)
    np.testing.assert_allclose(g[idx, 2:], SQUEEZEDET_ANCHOR_SHAPES[b])


def test_resnet_uses_own_shape_table():
    cfg = kitti_res50_config()
    np.testing.assert_allclose(cfg.anchor_box[4, 2:], [41.0, 32.0])


def test_custom_resolution_config():
    from squeezedet_tpu.config.kitti import custom_kitti_config
    cfg = custom_kitti_config("squeezeDet", 640, 192)
    assert (cfg.grid_w, cfg.grid_h) == (40, 12)
    assert cfg.anchors == 40 * 12 * 9
    cfg_p = custom_kitti_config("squeezeDet+", 1242, 375)
    assert (cfg_p.grid_w, cfg_p.grid_h) == (76, 22)  # matches reference


def test_scale_recipe_to_batch():
    """Large-batch rescale rule (PARITY.md): LR and the conf-pos
    coefficient scale linearly with batch, decay_steps inversely (the
    staircase fires at the same sample count), warmup from the step
    budget."""
    from squeezedet_tpu.config import (kitti_squeezedet_config,
                                       scale_recipe_to_batch)
    cfg = kitti_squeezedet_config()  # batch 20, lr 0.01, conf_pos 75
    big = scale_recipe_to_batch(cfg, 160, total_steps=400)
    assert big.batch_size == 160
    np.testing.assert_allclose(big.learning_rate, cfg.learning_rate * 8)
    np.testing.assert_allclose(big.loss_coef_conf_pos,
                               cfg.loss_coef_conf_pos * 8)
    assert big.decay_steps == cfg.decay_steps // 8
    assert big.lr_warmup_steps == 40
    # other loss terms are batch-invariant and must not move
    assert big.loss_coef_bbox == cfg.loss_coef_bbox
    assert big.loss_coef_conf_neg == cfg.loss_coef_conf_neg
    assert big.loss_coef_class == cfg.loss_coef_class
