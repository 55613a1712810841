"""Per-model KITTI configurations.

Mirrors the four reference config factories
(src/config/kitti_squeezeDet_config.py, kitti_squeezeDetPlus_config.py,
kitti_vgg16_config.py, kitti_res50_config.py) plus the legacy
kitti_model_config.py variant.  All share the same training recipe; they
differ in input resolution, batch size, detection grid and anchor shapes.
"""

from __future__ import annotations

import numpy as np

from .anchors import (RESNET50_ANCHOR_SHAPES, SQUEEZEDET_ANCHOR_SHAPES,
                      make_anchor_grid)
from .base import ModelConfig, base_model_config

# Shared KITTI training recipe (kitti_squeezeDet_config.py:17-37).
_KITTI_COMMON = dict(
    weight_decay=1e-4,
    learning_rate=0.01,
    decay_steps=10000,
    max_grad_norm=1.0,
    momentum=0.9,
    lr_decay_factor=0.5,
    loss_coef_bbox=5.0,
    loss_coef_conf_pos=75.0,
    loss_coef_conf_neg=100.0,
    loss_coef_class=1.0,
    plot_prob_thresh=0.4,
    nms_thresh=0.4,
    prob_thresh=0.005,
    top_n_detection=64,
    data_augmentation=True,
    drift_x=150,
    drift_y=100,
    exclude_hard_examples=False,
    anchor_per_grid=9,
)


def _kitti_config(
    net: str,
    image_width: int,
    image_height: int,
    grid_w: int,
    grid_h: int,
    shapes: np.ndarray,
    batch_size: int = 20,
) -> ModelConfig:
    base = base_model_config("KITTI")
    anchors = make_anchor_grid(image_width, image_height, grid_w, grid_h, shapes)
    return base.replace(
        net=net,
        image_width=image_width,
        image_height=image_height,
        batch_size=batch_size,
        grid_w=grid_w,
        grid_h=grid_h,
        anchor_box=anchors,
        **_KITTI_COMMON,
    )


def kitti_squeezedet_config() -> ModelConfig:
    """1248x384 input, 24x78x9 = 16,848 anchors (kitti_squeezeDet_config.py)."""
    return _kitti_config("squeezeDet", 1248, 384, 78, 24, SQUEEZEDET_ANCHOR_SHAPES)


def kitti_squeezedet_plus_config() -> ModelConfig:
    """1242x375 input, 22x76x9 = 15,048 anchors (kitti_squeezeDetPlus_config.py)."""
    return _kitti_config("squeezeDet+", 1242, 375, 76, 22, SQUEEZEDET_ANCHOR_SHAPES)


def kitti_vgg16_config() -> ModelConfig:
    """1242x375 input, batch 5, 24x78x9 anchors (kitti_vgg16_config.py)."""
    return _kitti_config("vgg16", 1242, 375, 78, 24, SQUEEZEDET_ANCHOR_SHAPES,
                         batch_size=5)


def kitti_res50_config() -> ModelConfig:
    """1242x375 input, 24x78x9 anchors with the ResNet shape table
    (kitti_res50_config.py)."""
    return _kitti_config("resnet50", 1242, 375, 78, 24, RESNET50_ANCHOR_SHAPES)


def kitti_model_config() -> ModelConfig:
    """Legacy generic variant (kitti_model_config.py) — 1248x384, 24x78x9."""
    return _kitti_config("model", 1248, 384, 78, 24, SQUEEZEDET_ANCHOR_SHAPES)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def grid_for_net(net: str, size: int) -> int:
    """Detection-grid extent along one image dimension for a backbone.

    Encodes each backbone's downsampling arithmetic (stride-16 overall):
    squeezeDet: conv s2 SAME + three 3x3 s2 SAME pools (squeezeDet.py:40-58);
    squeezeDet+: conv1 7x7 s2 VALID + three 3x3 s2 VALID pools
    (squeezeDetPlus.py:40-64); vgg16: four 2x2 s2 SAME pools
    (vgg16_convDet.py:46-75); resnet50: conv1 s2 SAME, pool1 3x3 s2 VALID,
    res3a/res4a s2 SAME (resnet50_convDet.py:41-99).
    """
    if net in ("squeezeDet", "model"):
        return _cdiv(_cdiv(_cdiv(_cdiv(size, 2), 2), 2), 2)
    if net == "squeezeDet+":
        s = _cdiv(size - 6, 2)          # conv1 7x7 s2 VALID
        for _ in range(3):              # pool1, pool4, pool8: 3x3 s2 VALID
            s = _cdiv(s - 2, 2)
        return s
    if net == "vgg16":
        for _ in range(4):
            size = _cdiv(size, 2)
        return size
    if net == "resnet50":
        s = _cdiv(size, 2)              # conv1 s2 SAME
        s = _cdiv(s - 2, 2)             # pool1 3x3 s2 VALID
        s = _cdiv(s, 2)                 # res3a s2
        return _cdiv(s, 2)              # res4a s2
    raise ValueError("unknown net %r" % net)


def custom_kitti_config(net: str, image_width: int, image_height: int,
                        batch_size: int = 20) -> ModelConfig:
    """KITTI config at a non-standard resolution.

    No reference equivalent (resolutions are hard-coded per model there);
    the anchor grid is derived from the backbone's downsampling
    arithmetic and the same 9-shape table.
    """
    shapes = (RESNET50_ANCHOR_SHAPES if net == "resnet50"
              else SQUEEZEDET_ANCHOR_SHAPES)
    # scale the canonical shape table to the requested resolution so
    # anchors stay proportionate (the canonical tables assume ~1248x384)
    shapes = shapes * np.array([[image_width / 1248.0,
                                 image_height / 384.0]])
    cfg = _kitti_config(net, image_width, image_height,
                        grid_for_net(net, image_width),
                        grid_for_net(net, image_height),
                        shapes, batch_size=batch_size)
    # scale the drift augmentation range too (canonical +-150/+-100)
    return cfg.replace(
        drift_x=max(1, round(150 * image_width / 1248.0)),
        drift_y=max(1, round(100 * image_height / 384.0)))


def config_for_net_at(net: str, image_width: int = 0,
                      image_height: int = 0) -> ModelConfig:
    """Net config at its canonical resolution, or a custom one when
    either override is non-zero (the CLI --image_width/--image_height
    contract shared by train/eval/demo)."""
    from squeezedet_tpu.config import config_for_net
    if not (image_width or image_height):
        return config_for_net(net)
    base = config_for_net(net)
    return custom_kitti_config(net, image_width or base.image_width,
                               image_height or base.image_height)


def scale_recipe_to_batch(cfg: ModelConfig, batch_size: int,
                          warmup_frac: float = 0.1,
                          total_steps: int = 0) -> ModelConfig:
    """Rescale a config's training recipe to a different batch size.

    The measured large-batch rule (PARITY.md "Large-batch training
    recipe"), treating ``cfg``'s recipe as tuned at ``cfg.batch_size``:

    * ``learning_rate`` scales linearly with batch (Goyal et al.'s
      linear-scaling rule);
    * ``decay_steps`` scales inversely, so the staircase decay fires
      at the same SAMPLE count;
    * ``loss_coef_conf_pos`` scales linearly — the reference conf loss
      normalizes its positive term by the batch-total object count and
      then means over the batch (nn_skeleton.py:302-314), making the
      effective positive-confidence weight ∝ 1/batch; without this
      rescale the confidence head trains batch/old_batch times slower
      than the class/bbox terms and val mAP collapses with
      healthy-looking loss curves;
    * ``lr_warmup_steps`` = warmup_frac * total_steps when
      ``total_steps`` is given (large-batch SGD needs the ramp).

    Validated at the flagship geometry: batch 16 -> 128 lands inside
    the batch-16 control's seed spread on an equal sample budget.
    """
    r = batch_size / cfg.batch_size
    return cfg.replace(
        batch_size=batch_size,
        learning_rate=cfg.learning_rate * r,
        decay_steps=max(1, int(round(cfg.decay_steps / r))),
        loss_coef_conf_pos=cfg.loss_coef_conf_pos * r,
        lr_warmup_steps=(int(round(warmup_frac * total_steps))
                         if total_steps else cfg.lr_warmup_steps),
    )


def tiny_test_config(
    net: str = "squeezeDet",
    image_width: int = 96,
    image_height: int = 96,
    batch_size: int = 2,
) -> ModelConfig:
    """Small hermetic config for unit tests and multi-chip dry runs.

    Keeps the exact structure (9 anchors/cell, same recipe) at a size where
    forward/backward compile in seconds on CPU.
    """
    grid_w = grid_for_net(net, image_width)
    grid_h = grid_for_net(net, image_height)
    shapes = SQUEEZEDET_ANCHOR_SHAPES / 8.0
    cfg = _kitti_config(net, image_width, image_height, grid_w, grid_h, shapes,
                        batch_size=batch_size)
    return cfg.replace(load_pretrained_model=False)
