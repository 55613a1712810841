"""Anchor-grid generation.

Reproduces the reference anchor layout exactly
(src/config/kitti_squeezeDet_config.py:45-79):

* centers sit at *fractional* grid positions
  ``x_i = i * image_width / (W + 1)`` for ``i in 1..W`` (same for y) —
  i.e. the grid is inset, NOT aligned to feature-map strides;
* the flat anchor order is row-major over (row, col, shape):
  index = (row * W + col) * B + b;
* each anchor is (cx, cy, w, h) in pixels with the per-model fixed
  (w, h) shape table repeated at every cell.
"""

from __future__ import annotations

import numpy as np


def make_anchor_grid(
    image_width: int,
    image_height: int,
    grid_w: int,
    grid_h: int,
    shapes: np.ndarray,
) -> np.ndarray:
    """Build the dense [H*W*B, 4] anchor array (float64, like the reference).

    Args:
      image_width / image_height: model input resolution in pixels.
      grid_w / grid_h: detection-head spatial grid (W=78, H=24 for SqueezeDet).
      shapes: [B, 2] array of (w, h) anchor shapes in pixels.

    Returns:
      [grid_h * grid_w * B, 4] array of (cx, cy, w, h).
    """
    shapes = np.asarray(shapes, np.float64).reshape(-1, 2)
    B = shapes.shape[0]
    # Fractional inset centers: arange(1, W+1) * image_w / (W+1).
    cx = np.arange(1, grid_w + 1, dtype=np.float64) * float(image_width) / (grid_w + 1)
    cy = np.arange(1, grid_h + 1, dtype=np.float64) * float(image_height) / (grid_h + 1)

    # Broadcast to (H, W, B) each, then stack -> (H, W, B, 4) -> (-1, 4).
    cx_g = np.broadcast_to(cx[None, :, None], (grid_h, grid_w, B))
    cy_g = np.broadcast_to(cy[:, None, None], (grid_h, grid_w, B))
    w_g = np.broadcast_to(shapes[None, None, :, 0], (grid_h, grid_w, B))
    h_g = np.broadcast_to(shapes[None, None, :, 1], (grid_h, grid_w, B))

    anchors = np.stack([cx_g, cy_g, w_g, h_g], axis=3).reshape(-1, 4)
    return anchors


# Fixed (w, h) anchor shape tables -------------------------------------------

# Used by squeezeDet, squeezeDet+, vgg16 (kitti_squeezeDet_config.py:47-53).
SQUEEZEDET_ANCHOR_SHAPES = np.array(
    [[36., 37.], [366., 174.], [115., 59.],
     [162., 87.], [38., 90.], [258., 173.],
     [224., 108.], [78., 170.], [72., 43.]])

# ResNet50 uses a different table (kitti_res50_config.py:54-57).
RESNET50_ANCHOR_SHAPES = np.array(
    [[94., 49.], [225., 161.], [170., 91.],
     [390., 181.], [41., 32.], [128., 64.],
     [298., 164.], [232., 99.], [65., 42.]])
