"""Utility layer: timing, drawing, dense tensors, metrics reports."""

from squeezedet_tpu.utils.util import (Timer, bgr_to_rgb,  # noqa: F401
                                       draw_box, sparse_to_dense)
from squeezedet_tpu.utils.metrics import write_model_metrics  # noqa: F401
