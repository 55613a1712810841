"""Serving-path helpers: layout-negotiated jitted inference.

The uint8 ingest path (``Detector.predict_raw``) feeds a mean-subtract
fusion whose output XLA lays out batch-minor; with a default row-major
entry layout XLA then inserts a full-image relayout copy before conv1
(~6% of the inference program at batch 128).  Letting XLA *negotiate*
the entry layout (AUTO) removes the copy: the negotiated layout is the
tiled form the program wants, and on real TPU hosts the host->device
DMA engine produces tiled layouts during the transfer at no extra cost.

Measured on v5e, batch 128 @ 384x1248 bf16 incl. on-device postprocess:
27.8 ms (default entry layout) -> 24.8 ms (negotiated), +12%.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax


def negotiated_inference_fn(det, batch_size: int,
                            params: Any) -> Tuple[Callable, Any]:
    """Build the fully-fused uint8 -> detections program with an XLA-
    negotiated input layout.

    Returns ``(fn, input_format)``: call ``fn(params, images)`` where
    ``images`` was placed with ``jax.device_put(np_u8, input_format)``.
    """
    import jax.numpy as jnp
    import numpy as np

    from jax._src.layout import AutoLayout, Format
    from squeezedet_tpu.ops.postprocess import filter_prediction_device

    cfg = det.cfg

    def fn(p, im):
        interp = det.predict_raw(p, im)
        return filter_prediction_device(
            interp.det_boxes, interp.det_probs, interp.det_class,
            top_n=cfg.top_n_detection, nms_thresh=cfg.nms_thresh,
            num_classes=cfg.classes, prob_thresh=cfg.prob_thresh)

    spec = jax.ShapeDtypeStruct(
        (batch_size, cfg.image_height, cfg.image_width, 3), np.uint8)
    try:
        auto = Format(AutoLayout())
        compiled = jax.jit(fn, in_shardings=(None, auto)).lower(
            params, spec).compile()
        input_format = compiled.input_formats[0][1]
        return jax.jit(fn, in_shardings=(None, input_format)), input_format
    except Exception as e:  # pragma: no cover - older jax fallback
        print("layout negotiation unavailable ({}); using default "
              "layout".format(e))
        return jax.jit(fn), jax.devices()[0]
