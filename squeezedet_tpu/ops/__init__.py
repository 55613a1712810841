"""Box-geometry and postprocessing primitives."""

from squeezedet_tpu.ops.boxes import (  # noqa: F401
    batch_iou,
    bbox_transform,
    bbox_transform_inv,
    iou,
    pairwise_iou_center,
    safe_exp,
    safe_exp_np,
)
from squeezedet_tpu.ops.nms import filter_prediction_np, nms  # noqa: F401
