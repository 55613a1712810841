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


def negotiated_inference_fn(det, batch_size: int, params: Any,
                            fn: Callable = None) -> Tuple[Callable, Any]:
    """Build the fully-fused uint8 -> detections program with an XLA-
    negotiated input layout.

    Returns ``(fn, input_format)``: call ``fn(params, images)`` where
    ``images`` was placed with ``jax.device_put(np_u8, input_format)``.
    ``fn`` defaults to the bf16 serving program; pass
    ``det.predict_quant_postprocessed`` (with quantized params) for the
    int8 one.
    """
    import numpy as np

    cfg = det.cfg
    if fn is None:
        fn = det.predict_raw_postprocessed

    spec = jax.ShapeDtypeStruct(
        (batch_size, cfg.image_height, cfg.image_width, 3), np.uint8)
    try:
        # private API: inside the try so the fallback below also covers
        # jax versions where the module moves
        from jax._src.layout import AutoLayout, Format
        auto = Format(AutoLayout())
        compiled = jax.jit(fn, in_shardings=(None, auto)).lower(
            params, spec).compile()
        input_format = compiled.input_formats[0][1]
        return jax.jit(fn, in_shardings=(None, input_format)), input_format
    except Exception as e:  # pragma: no cover - older jax fallback
        print("layout negotiation unavailable ({}); using default "
              "layout".format(e))
        return jax.jit(fn), jax.devices()[0]


def mesh_inference_fn(det, batch_size: int, mesh,
                      fn: Callable = None) -> Tuple[Callable, Any, Any]:
    """Data-parallel serving program over a 1-D device mesh.

    The layout-negotiated entry above is a single-device optimization
    (a negotiated ``Format`` carries no mesh placement), so the
    multi-chip server uses the standard sharded entry instead: params
    replicated, the uint8 ``[B, H, W, 3]`` micro-batch sharded over the
    mesh's ``data`` axis.  Each chip runs the identical fused
    uint8 -> top-K program on its ``B/D`` rows; inference has no
    cross-image term, so the program contains NO collectives —
    D chips serve D× the micro-batch at one chip's latency.  The
    ``[B, K, ·]`` outputs come back batch-sharded and gather to host
    only when the handler reads its row.

    The body is wrapped in ``shard_map`` rather than left to the SPMD
    partitioner: XLA's TopK lowers to a custom-call the partitioner
    cannot split, so under plain ``jit`` + shardings it all-gathers
    the [B, anchors] score tensor to every device before selecting.
    shard_map makes every op device-local by construction — the
    zero-collective property is asserted on the compiled HLO in
    test_serve.

    Returns ``(fn, params_sharding, input_sharding)``: place the params
    once with ``jax.device_put(params, params_sharding)`` and each
    micro-batch with ``jax.device_put(np_u8, input_sharding)``.
    """
    from jax.sharding import PartitionSpec as P

    from squeezedet_tpu.parallel.mesh import (batch_sharding,
                                              replicated_sharding)

    if fn is None:
        fn = det.predict_raw_postprocessed
    d = mesh.devices.size
    if batch_size % d:
        raise ValueError(
            "serving batch {} not divisible by the {}-device mesh — "
            "pick --max_batch as a multiple of --num_devices".format(
                batch_size, d))
    jfn = jax.jit(jax.shard_map(fn, mesh=mesh,
                                in_specs=(P(), P("data")),
                                out_specs=P("data")))
    return jfn, replicated_sharding(mesh), batch_sharding(mesh)


def export_model(det, params, path: str, *, batch_size: int = 1,
                 uint8_input: bool = True, postprocess: bool = True,
                 platforms=("tpu", "cpu"), quantized: bool = False) -> None:
    """Serialize the full inference program to a deployable artifact.

    The reference ships inference as a checkpoint plus the model-builder
    source (demo.py restores variables into a rebuilt graph); the
    TPU-native deployment unit is the *program*: weights baked in,
    lowered to StableHLO via ``jax.export``, runnable on any listed
    platform without the model code or the config. ``path`` becomes a
    directory holding ``model.stablehlo`` + ``metadata.json`` (class
    names, input geometry, output contract — what a serving frontend
    needs to label and draw detections).

    With ``quantized=True``, ``params`` is the int8 tree from
    ``Detector.quantize`` and the artifact bakes in the int8 program
    (4x smaller weights; same input/output contract).
    """
    import json
    import os

    import numpy as np
    from jax import export as jax_export

    cfg = det.cfg

    def fn(images):
        if quantized:
            interp = det.predict_quant(params, images) if uint8_input \
                else det.predict_quant_normalized(params, images)
        elif uint8_input:
            interp = det.predict_raw(params, images)
        else:
            interp = det.predict(params, images)
        if not postprocess:
            return (interp.det_boxes, interp.det_probs, interp.det_class)
        boxes, probs, classes, keep = det.postprocess_device(interp)
        return (boxes, probs, classes, keep)

    spec = jax.ShapeDtypeStruct(
        (batch_size, cfg.image_height, cfg.image_width, 3),
        np.uint8 if uint8_input else np.float32)
    exported = jax_export.export(jax.jit(fn), platforms=list(platforms))(
        spec)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "model.stablehlo"), "wb") as f:
        f.write(exported.serialize())
    meta = {
        "net": det.net or type(det).__name__,
        "class_names": list(cfg.class_names),
        "image_height": cfg.image_height,
        "image_width": cfg.image_width,
        "batch_size": batch_size,
        "input_dtype": "uint8" if uint8_input else "float32",
        "input_is_bgr_raw": bool(uint8_input),
        "quantized": bool(quantized),
        "bgr_means": [float(m) for m in cfg.bgr_means],
        "postprocess": bool(postprocess),
        "outputs": ("boxes[B,K,4] cx,cy,w,h; probs[B,K]; classes[B,K]; "
                    "keep[B,K]" if postprocess else
                    "det_boxes[B,A,4]; det_probs[B,A]; det_class[B,A]"),
        "plot_prob_thresh": float(cfg.plot_prob_thresh),
        "platforms": list(platforms),
    }
    with open(os.path.join(path, "metadata.json"), "w") as f:
        json.dump(meta, f, indent=2)


def load_exported(path: str):
    """Load an :func:`export_model` artifact.

    Returns ``(fn, metadata)`` where ``fn(images)`` is a jit-compiled
    callable (re-traceable on any platform the artifact was lowered
    for) and ``metadata`` is the saved dict.
    """
    import json
    import os

    from jax import export as jax_export

    with open(os.path.join(path, "model.stablehlo"), "rb") as f:
        exported = jax_export.deserialize(f.read())
    with open(os.path.join(path, "metadata.json")) as f:
        meta = json.load(f)
    return jax.jit(exported.call), meta
