"""TPU-native SqueezeDet detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
BichenWuUCB/squeezeDet (reference mounted at /root/reference): four
backbones (SqueezeDet, SqueezeDet+, VGG16+ConvDet, ResNet50+ConvDet)
sharing one ConvDet head, anchor decode, loss, NMS postprocessing, the
KITTI/Pascal-VOC data layer, train/eval/demo entry points and the native
KITTI mAP evaluator.

Design: pure functions over parameter pytrees, jitted end-to-end; data
parallelism via ``jax.sharding`` meshes; fixed shapes everywhere so XLA
tiles convolutions onto the MXU.
"""

from squeezedet_tpu.config import (  # noqa: F401
    ModelConfig,
    base_model_config,
    kitti_model_config,
    kitti_res50_config,
    kitti_squeezedet_config,
    kitti_squeezedet_plus_config,
    kitti_vgg16_config,
    tiny_test_config,
)
from squeezedet_tpu.models import Detector, get_model  # noqa: F401
from squeezedet_tpu.quant import (  # noqa: F401
    calibrate,
    quantize,
    quantize_detector,
)
from squeezedet_tpu.serving import (  # noqa: F401
    export_model,
    load_exported,
    negotiated_inference_fn,
)

__version__ = "0.2.0"
