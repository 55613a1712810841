"""Post-training int8 quantization (PTQ) for TPU serving.

The reference framework has no quantized inference (its serving story
is the f32 TF1 graph, src/demo.py); this module is a TPU-native
extension motivated by the inference roofline: the bf16 program is
HBM-bandwidth-bound (PARITY.md round-2 analysis), and int8 activations
halve the dominant traffic while the MXU's int8 path doubles peak
throughput.  Measured full-chain device self-time: 1.45x faster than
bf16 at batch 128 (see PARITY.md round-3 int8 section).

Scheme (standard symmetric PTQ, chosen for exactness properties):

- **Weights**: per-output-channel symmetric int8,
  ``s_w[o] = max|W[..., o]| / 127``.
- **Activations**: per-tensor symmetric int8, scales calibrated as the
  abs-max over calibration batches of the float model's activation
  tape (post-ReLU tensors occupy [0, 127] — the sign bit is idle but
  the MXU has no unsigned path, and per-channel weight scales recover
  most of the precision).
- **Input**: ``s_in`` is the *exact* bound of ``uint8 - bgr_mean``
  (max(mean, 255-mean) over channels), so input quantization needs no
  calibration and never clips.
- **Folding**: every scale is folded offline into one per-channel f32
  multiplier + bias per conv (``y8 = clip(round(max(acc*m + b, 0)), 0,
  127)``), which XLA fuses into the conv epilogue — no separate
  dequant/quant passes exist in the compiled program.
- **Zero-points are all zero** (symmetric), so SAME zero-padding and
  the virtual-concat kernel split (layers.conv2d_pair) stay exact in
  the quantized domain.

The quantized parameter tree mirrors the float tree (same layer keys),
with each conv layer's ``{kernel f32, bias}`` replaced by
``{kernel int8, mult f32[O], bias f32[O]}``; ``models.layers.conv2d``
and ``conv2d_pair`` detect the quantized form and take the int8 path,
so the *same* ``backbone.apply`` executes both precisions.

Supported nets: squeezeDet, squeezeDet+ (fire chains), vgg16 (conv
chain), resnet50 (frozen-stats BN folded into the int8 convs; the
residual joins run in f32 and re-quantize at the block's calibrated
scale — :func:`_quantize_resnet`).
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

Scales = Dict[str, float]

#: key for the input quantization scale riding inside the quantized
#: parameter tree (backbone ``apply`` only reads its layer names, so
#: the extra leaf is inert during the forward pass).
INPUT_SCALE_KEY = "__input_scale__"


def input_scale(bgr_means) -> float:
    """Exact abs-bound of ``uint8 - bgr_mean``, as an int8 scale."""
    m = np.asarray(bgr_means, np.float64).reshape(-1)
    return float(max(m.max(), 255.0 - m.min()) / 127.0)


def quantize_images(images_u8, bgr_means, scale):
    """uint8 BGR [B, H, W, 3] -> int8 in the model's input domain.

    The device-side twin of ``normalize_images`` (imdb.py:143-144) for
    the int8 path; with ``scale = input_scale(bgr_means)`` the result
    never clips and the worst-case rounding error is scale/2 (~0.6 gray
    levels).
    """
    means = jnp.asarray(bgr_means, jnp.float32).reshape(1, 1, 1, 3)
    return quantize_images_normalized(
        images_u8.astype(jnp.float32) - means, scale)


def quantize_images_normalized(images_f, scale):
    """Already-normalized float images (``x - bgr_mean``, the eval/host
    pipeline's format, imdb.read_image_batch) -> int8 input domain.
    One formula shared with every activation boundary
    (layers.quantize_activation) so input and activation quantization
    can never diverge."""
    from squeezedet_tpu.models.layers import quantize_activation
    return quantize_activation(images_f, scale)


def calibrate_normalized(det, params, batches_f: Iterable,
                         percentile: Optional[float] = None) -> Scales:
    """Collect per-layer activation ranges from the float model, fed
    already-normalized float batches (``x - bgr_mean``).

    Runs the float forward with the activation tape (the same
    instrumentation the five-stat summaries use) and reduces each
    layer's |activation| on device, keeping only running scalars on
    host.  Default reduction is abs-max (safe for ReLU nets);
    ``percentile`` (e.g. 99.99) instead takes that per-batch
    |activation| percentile — the standard PTQ knob when rare outliers
    would stretch a tensor's scale and crush its resolution — still
    max-combined across batches.
    """
    cfg = det.cfg

    @jax.jit
    def batch_stats(p, x):
        tape = {}
        det.backbone.apply(p, x.astype(jnp.dtype(cfg.compute_dtype)),
                           cfg, train=False, tape=tape)
        if percentile is None:
            return {k: jnp.max(jnp.abs(v.astype(jnp.float32)))
                    for k, v in tape.items()}
        out = {}
        for k, v in tape.items():
            a = jnp.abs(v.astype(jnp.float32))
            p = jnp.percentile(a.reshape(-1), percentile)
            # post-ReLU tensors are routinely majority-zero, so a low
            # percentile can land ON the zeros; fall back to abs-max
            # rather than emitting a zero scale
            out[k] = jnp.where(p > 0, p, jnp.max(a))
        return out

    out: Scales = {}
    n = 0
    for x in batches_f:
        m = jax.device_get(batch_stats(params, jnp.asarray(x)))
        for k, v in m.items():
            out[k] = max(out.get(k, 0.0), float(v))
        n += 1
    assert n > 0, "calibration needs at least one batch"
    return out


def calibrate(det, params, batches_u8: Iterable,
              percentile: Optional[float] = None) -> Scales:
    """:func:`calibrate_normalized` over uint8 batches (typically a few
    training batches), normalizing on device first."""
    from squeezedet_tpu.data.device_pipeline import normalize_images
    means = np.asarray(det.cfg.bgr_means, np.float32)

    def normalized():
        for u8 in batches_u8:
            yield normalize_images(jnp.asarray(u8), means, jnp.float32)

    return calibrate_normalized(det, params, normalized(),
                                percentile=percentile)


def _quantize_conv(layer: dict, s_in: float,
                   s_out: Optional[float]) -> dict:
    """Quantize one conv layer's params, folding scales.

    ``s_out=None`` marks the ConvDet head: its epilogue dequantizes to
    f32 for the interpretation graph instead of re-quantizing.
    """
    w = np.asarray(layer["kernel"], np.float32)
    b = np.asarray(layer["bias"], np.float32)
    s_w = np.abs(w).max(axis=(0, 1, 2)) / 127.0
    s_w = np.maximum(s_w, 1e-30)  # all-zero channels quantize to zeros
    k_q = np.clip(np.rint(w / s_w), -127, 127).astype(np.int8)
    if s_out is None:
        mult = (s_in * s_w).astype(np.float32)
        bias = b.astype(np.float32)
    else:
        mult = (s_in * s_w / s_out).astype(np.float32)
        bias = (b / s_out).astype(np.float32)
    return {"kernel": jnp.asarray(k_q), "mult": jnp.asarray(mult),
            "bias": jnp.asarray(bias)}


def _act_scale(scales: Scales, name: str) -> float:
    absmax = scales[name]
    assert absmax > 0.0, \
        "activation {} is identically zero in calibration".format(name)
    return absmax / 127.0


def _quantize_fire_chain(mod, params, scales: Scales, s_input: float,
                         head: str, start: str) -> dict:
    """squeezeDet / squeezeDet+ walk: conv1 -> fire2..11 -> head.

    Max-pooling between stages is scale-invariant, so each layer's
    input scale is exactly its producer's output scale; both expand
    halves share the fire's tape scale (they are consumed through the
    virtual concat as one tensor, layers.conv2d_pair).

    ``start`` names the first quantized layer ("conv1" = whole net);
    earlier layers stay float and the boundary fire's squeeze carries
    ``in_scale`` so layers.conv2d quantizes its float input inline.
    """
    q = {}
    quantizing = start == "conv1"
    s_prev = _act_scale(scales, "conv1")
    if quantizing:
        q["conv1"] = _quantize_conv(params["conv1"], s_input, s_prev)
        boundary = {}
    else:
        q["conv1"] = dict(params["conv1"])
        boundary = {"in_scale": np.float32(s_prev)}
    for name, _, _, _ in mod._FIRES:
        if not quantizing and name == start:
            # boundary already carries the previous layer's in_scale
            quantizing = True
        if not quantizing:
            q[name] = {k: dict(v) for k, v in params[name].items()}
            s_prev = _act_scale(scales, name)
            boundary = {"in_scale": np.float32(s_prev)}
            continue
        s_sq = _act_scale(scales, name + "/squeeze1x1")
        s_out = _act_scale(scales, name)
        q[name] = {
            "squeeze1x1": dict(
                _quantize_conv(params[name]["squeeze1x1"], s_prev, s_sq),
                **boundary),
            "expand1x1": _quantize_conv(params[name]["expand1x1"],
                                        s_sq, s_out),
            "expand3x3": _quantize_conv(params[name]["expand3x3"],
                                        s_sq, s_out),
        }
        boundary = {}
        s_prev = s_out
    assert quantizing, "start layer {!r} not in the chain".format(start)
    q[head] = _quantize_conv(params[head], s_prev, None)
    return q


def _quantize_conv_chain(mod, params, scales: Scales, s_input: float,
                         head: str, start: str) -> dict:
    """vgg16 walk: conv1_1..conv5_3 -> head (dropout is identity at
    inference, so the head consumes conv5_3's scale directly)."""
    q = {}
    quantizing = False
    s_prev = s_input
    boundary = {}
    for name, _, _ in mod._CONVS:
        if name == start:
            quantizing = True
            # from the very first conv, the input itself arrives int8
            # (quantize_images) — no float boundary to re-quantize
            boundary = {} if name == mod._CONVS[0][0] else \
                {"in_scale": np.float32(s_prev)}
        if not quantizing:
            q[name] = dict(params[name])
            s_prev = _act_scale(scales, name)
            continue
        s_out = _act_scale(scales, name)
        q[name] = dict(_quantize_conv(params[name], s_prev, s_out),
                       **boundary)
        boundary = {}
        s_prev = s_out
    assert quantizing, "start layer {!r} not in the chain".format(start)
    q[head] = _quantize_conv(params[head], s_prev, None)
    return q


def _fold_bn(layer: dict, eps: float) -> dict:
    """Fold frozen-stats BatchNorm into conv weights+bias (the standard
    inference-time identity): ``y = conv(x, W)*inv + (beta - mean*inv)``
    with ``inv = gamma/sqrt(var+eps)`` becomes a plain conv with
    ``W' = W*inv[o]`` and ``b' = bias*inv + beta - mean*inv``."""
    inv = np.asarray(layer["gamma"], np.float64) / np.sqrt(
        np.asarray(layer["var"], np.float64) + eps)
    w = np.asarray(layer["kernel"], np.float64) * inv
    b = np.asarray(layer["beta"], np.float64) - \
        np.asarray(layer["mean"], np.float64) * inv
    if "bias" in layer:
        b = b + np.asarray(layer["bias"], np.float64) * inv
    return {"kernel": jnp.asarray(w, jnp.float32),
            "bias": jnp.asarray(b, jnp.float32)}


def _quantize_resnet(mod, params, scales: Scales, start: str,
                     eps: float) -> dict:
    """resnet50 walk: conv1 stays float (conv_bn at full resolution);
    quantization starts at block ``start`` (e.g. 'res2a').  Inside a
    quantized block, branch2a/b re-quantize to int8, branch2c and the
    block-'a' projection shortcut dequantize to f32, the residual join
    runs in f32 (exactly the float graph's add+relu), and the merged
    output re-quantizes at the block's calibrated scale
    (``out_scale``, applied in resnet50.apply)."""
    q = {"conv1": dict(params["conv1"]),
         "conv5": None}  # filled below
    quantizing = False
    s_prev = _act_scale(scales, "conv1")
    boundary = {}
    for stage, blocks, _, _, _ in mod._STAGES:
        for block in blocks:
            name = "res{}{}".format(stage, block)
            if name == start:
                quantizing = True
                boundary = {"in_scale": np.float32(s_prev)}
            if not quantizing:
                q[name] = {k: (dict(v) if k == "branch1" else
                               {s: dict(c) for s, c in v.items()})
                           for k, v in params[name].items()}
                s_prev = _act_scale(scales, name)
                continue
            p = params[name]
            entry = {}
            if "branch1" in p:
                entry["branch1"] = dict(
                    _quantize_conv(_fold_bn(p["branch1"], eps),
                                   s_prev, None), **boundary)
            elif not boundary:
                # identity shortcut over an int8 input: apply
                # dequantizes it with the producer's scale before the
                # f32 join (a float boundary input needs no scale)
                entry["shortcut_scale"] = np.float32(s_prev)
            s_2a = _act_scale(scales, name + "_branch2a")
            s_2b = _act_scale(scales, name + "_branch2b")
            entry["branch2"] = {
                "branch2a": dict(
                    _quantize_conv(_fold_bn(p["branch2"]["branch2a"],
                                            eps), s_prev, s_2a),
                    **boundary),
                "branch2b": _quantize_conv(
                    _fold_bn(p["branch2"]["branch2b"], eps), s_2a, s_2b),
                "branch2c": _quantize_conv(
                    _fold_bn(p["branch2"]["branch2c"], eps), s_2b, None),
            }
            s_prev = _act_scale(scales, name)
            entry["out_scale"] = np.float32(s_prev)
            q[name] = entry
            boundary = {}
    assert quantizing, "start layer {!r} not in the chain".format(start)
    q["conv5"] = _quantize_conv(params["conv5"], s_prev, None)
    return q


#: default quantization boundary per net.  Whole-net int8 measured
#: fastest among the int8 variants (fire-boundary hybrids pay the
#: float->int8 re-quantize pass without saving enough VPU work); note
#: the tuned bf16 program still wins overall on v5e — s8 sublane
#: packing taxes every non-MXU op at the high-resolution early stages
#: (PARITY.md int8 study has the sweep).  resnet50's conv1 (a conv_bn
#: over the raw image) always stays float; its blocks quantize from
#: res2a.
DEFAULT_START = {"squeezeDet": "conv1", "squeezeDet+": "conv1",
                 "vgg16": "conv1_1", "resnet50": "res2a"}


def quantize_detector(det, params, scales: Scales,
                      start: str = "") -> dict:
    """Float params + calibration scales -> int8 parameter tree.

    The result plugs into the unchanged ``backbone.apply``.  ``start``
    names the first quantized layer (default: the measured-best
    boundary per net, :data:`DEFAULT_START`); layers before it stay
    float.  With ``start='conv1'``/``'conv1_1'`` the whole net is int8
    and the input image itself is quantized; ``Detector.predict_quant``
    detects that mode from the tree (:data:`INPUT_SCALE_KEY` present
    only then).
    """
    from squeezedet_tpu.models import resnet50, squeezedet, \
        squeezedet_plus, vgg16
    start = start or DEFAULT_START.get(det.net, "")
    s_input = input_scale(det.cfg.bgr_means)
    if det.backbone is squeezedet:
        q = _quantize_fire_chain(squeezedet, params, scales, s_input,
                                 head="conv12", start=start)
    elif det.backbone is squeezedet_plus:
        q = _quantize_fire_chain(squeezedet_plus, params, scales,
                                 s_input, head="conv12", start=start)
    elif det.backbone is vgg16:
        q = _quantize_conv_chain(vgg16, params, scales, s_input,
                                 head="conv6", start=start)
    elif det.backbone is resnet50:
        q = _quantize_resnet(resnet50, params, scales, start=start,
                             eps=det.cfg.batch_norm_epsilon)
    else:
        raise ValueError("unknown backbone for quantization")
    if start in ("conv1", "conv1_1"):
        q[INPUT_SCALE_KEY] = np.float32(s_input)
    return q


def quantize(det, params, batches_u8: Iterable, start: str = "",
             percentile: Optional[float] = None) -> dict:
    """One-call PTQ: calibrate on ``batches_u8`` then quantize."""
    return quantize_detector(det, params,
                             calibrate(det, params, batches_u8,
                                       percentile=percentile),
                             start=start)


def calib_batch_from_images(path: str, width: int, height: int,
                            limit: int = 8) -> np.ndarray:
    """Load calibration frames for the serve/export/demo CLIs: ``path``
    is an image file, a directory of images, or a glob pattern; returns
    one uint8 BGR batch resized to the model resolution (up to
    ``limit`` frames)."""
    import glob
    import os

    import cv2

    if os.path.isdir(path):
        files = sorted(
            f for f in glob.glob(os.path.join(path, "*"))
            if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp")))
    elif not os.path.isfile(path):
        files = sorted(glob.glob(path))
    else:
        files = [path]
    frames = []
    for f in files[:limit]:
        im = cv2.imread(f)
        if im is None:
            continue
        frames.append(cv2.resize(im, (width, height)))
    assert frames, "no readable calibration images under {}".format(path)
    return np.stack(frames).astype(np.uint8)
