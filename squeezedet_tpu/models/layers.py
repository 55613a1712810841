"""Functional layer library.

Replaces the reference's graph-building layer constructors
(``ModelSkeleton._conv_layer`` nn_skeleton.py:471, ``_conv_bn_layer``
nn_skeleton.py:374, ``_pooling_layer`` nn_skeleton.py:565, ``_fc_layer``
nn_skeleton.py:589) with pure ``init``/``apply`` pairs over parameter
pytrees.  Every apply function is shape-static and jit-safe; convolutions
are NHWC x HWIO so XLA lowers them straight onto the MXU.

Each ``init_*`` also records per-layer parameter / FLOP / activation
counts into a :class:`NetTracer`, mirroring the reference's
``model_size_counter`` / ``flop_counter`` / ``activation_counter``
(nn_skeleton.py:127-135, 451-463, 549-561, 584-585, 684-692), and marks
trainability so the optimizer can freeze layers and apply weight decay
only to trainable kernels (nn_skeleton.py:51-70).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, object]


# ---------------------------------------------------------------------------
# Initializers (match TF semantics used by the reference)
# ---------------------------------------------------------------------------

def truncated_normal(key, shape, stddev: float, dtype=jnp.float32):
    """tf.truncated_normal_initializer: N(0, stddev) clipped to 2 sigma."""
    return stddev * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def xavier_uniform_conv(key, shape, dtype=jnp.float32):
    """tf.contrib.layers.xavier_initializer_conv2d (uniform Glorot).

    shape is HWIO; fan counts include the receptive field.
    """
    h, w, cin, cout = shape
    fan_in = h * w * cin
    fan_out = h * w * cout
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def xavier_uniform_fc(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


# ---------------------------------------------------------------------------
# Static shape/accounting walker
# ---------------------------------------------------------------------------

def _out_size(size: int, k: int, s: int, padding: str) -> int:
    if padding == "SAME":
        return -(-size // s)
    return -(-(size - k + 1) // s)


@dataclass
class NetTracer:
    """Walks static shapes through the net during init and keeps the same
    accounting the reference dumps to model_metrics.txt (train.py:138-161)."""

    height: int
    width: int
    channels: int
    model_size_counter: List[Tuple[str, int]] = field(default_factory=list)
    flop_counter: List[Tuple[str, int]] = field(default_factory=list)
    activation_counter: List[Tuple[str, int]] = field(default_factory=list)
    debug: bool = False
    batch: int = 1

    @classmethod
    def for_config(cls, cfg) -> "NetTracer":
        t = cls(cfg.image_height, cfg.image_width, 3,
                debug=cfg.debug_mode, batch=cfg.batch_size)
        # reference: activation_counter starts with the input entry
        # (nn_skeleton.py:135)
        t.activation_counter.append(
            ("input", cfg.image_width * cfg.image_height * 3))
        return t

    def _debug_print(self, name: str) -> None:
        """DEBUG_MODE layer shape prints (nn_skeleton.py:510-511,
        618-619): same text, input shape as NHWC at init time."""
        print('Input tensor shape to {}: ({}, {}, {}, {})'.format(
            name, self.batch, self.height, self.width, self.channels))

    def conv(self, name: str, filters: int, size: int, stride: int,
             padding: str, relu: bool) -> None:
        if self.debug:
            self._debug_print(name)
        in_ch = self.channels
        self.height = _out_size(self.height, size, stride, padding)
        self.width = _out_size(self.width, size, stride, padding)
        self.channels = filters
        self.model_size_counter.append((name, (1 + size * size * in_ch) * filters))
        flops = (1 + 2 * in_ch * size * size) * filters * self.height * self.width
        if relu:
            flops += 2 * filters * self.height * self.width
        self.flop_counter.append((name, flops))
        self.activation_counter.append(
            (name, self.height * self.width * self.channels))

    def pool(self, name: str, size: int, stride: int, padding: str) -> None:
        self.height = _out_size(self.height, size, stride, padding)
        self.width = _out_size(self.width, size, stride, padding)
        self.activation_counter.append(
            (name, self.height * self.width * self.channels))

    def fc(self, name: str, hiddens: int, relu: bool) -> None:
        if self.debug:
            self._debug_print(name)
        dim = self.height * self.width * self.channels
        self.model_size_counter.append((name, (dim + 1) * hiddens))
        flops = 2 * dim * hiddens + hiddens
        if relu:
            flops += 2 * hiddens
        self.flop_counter.append((name, flops))
        self.activation_counter.append((name, hiddens))
        self.height, self.width, self.channels = 1, 1, hiddens

    def snapshot(self) -> Tuple[int, int, int]:
        return self.height, self.width, self.channels

    def restore(self, snap: Tuple[int, int, int]) -> None:
        self.height, self.width, self.channels = snap

    def total_flops(self) -> int:
        return sum(f for _, f in self.flop_counter)

    def total_params(self) -> int:
        return sum(p for _, p in self.model_size_counter)


# ---------------------------------------------------------------------------
# Conv layer (reference _conv_layer, nn_skeleton.py:471-563)
# ---------------------------------------------------------------------------

def init_conv(key, tracer: NetTracer, name: str, filters: int, size: int,
              stride: int, *, padding: str = "SAME", freeze: bool = False,
              xavier: bool = False, relu: bool = True, stddev: float = 0.001,
              pretrained: Optional[dict] = None) -> Tuple[Params, Params]:
    """Returns (params, trainable_mask) for a conv layer and advances tracer.

    ``pretrained`` maps layer name -> [kernel OIHW, bias] (the caffe joblib
    pickle layout, nn_skeleton.py:493-508); falls back to random init on
    shape mismatch exactly like the reference.
    """
    in_ch = tracer.channels
    kshape = (size, size, in_ch, filters)
    kernel = None
    bias = None
    if pretrained is not None and name in pretrained:
        kval = np.transpose(np.asarray(pretrained[name][0]), (2, 3, 1, 0))
        bval = np.asarray(pretrained[name][1])
        if kval.shape == kshape and bval.shape == (filters,):
            kernel = jnp.asarray(kval, jnp.float32)
            bias = jnp.asarray(bval, jnp.float32)
        else:
            print("Shape of the pretrained parameter of {} does not match, "
                  "use randomly initialized parameter".format(name))
    elif pretrained is not None:
        print("Cannot find {} in the pretrained model, use randomly "
              "initialized parameter".format(name))
    if kernel is None:
        kkey, _ = jax.random.split(key)
        if xavier:
            kernel = xavier_uniform_conv(kkey, kshape)
        else:
            kernel = truncated_normal(kkey, kshape, stddev)
        bias = jnp.zeros((filters,), jnp.float32)

    tracer.conv(name, filters, size, stride, padding, relu)
    params = {"kernel": kernel, "bias": bias}
    mask = {"kernel": not freeze, "bias": not freeze}
    return params, mask


# --- optional Pallas filter-gradient path (--pallas_grads) -----------------
#
# False: plain XLA autodiff.  "1x1": stride-1 SAME *1x1* convs with
# C % 128 == 0 and 16-aligned spatial size route their backward *filter*
# gradient through the Pallas huge-K GEMM kernel (ops/filter_grad.py);
# data gradients stay on XLA's transposed conv.  True: additionally
# route odd-sized spatial kernels (3x3, 5x5).  "interpret": like True,
# in Pallas interpreter mode (CPU test path).
#
# MEASURED OUTCOME (round 3, batch 128 K=3, v5e): the kernel is 3.7x
# faster than XLA on an isolated 1x1 filter grad (0.163 vs 0.610 ms),
# but BOTH modes are a net loss at the full-program level — device
# self-time 61.4 (off) vs 64.4 ("1x1") vs 65.3 ms/step (True) — because
# the custom VJP severs XLA's conv/elementwise fusions and forces
# residual materialization (new copy-start/slice-start ops around every
# routed conv).  Kept as a tested, default-off experimental lever; see
# PARITY.md train-step roofline.  Module-level because it's a
# tracing-time choice, like compute dtype.  NOT supported under
# multi-device meshes (a pallas_call is not SPMD-partitionable); the
# trainer only enables it on 1-device meshes.
_PALLAS_FILTER_GRAD = False


def set_pallas_filter_grad(mode) -> None:
    """Enable/disable the Pallas filter-grad backward (False/"1x1"/
    True/'interpret').  Affects subsequently *traced* programs."""
    global _PALLAS_FILTER_GRAD
    assert mode in (False, True, "1x1", "interpret"), mode
    _PALLAS_FILTER_GRAD = mode


def _pallas_dw_eligible(x, kernel) -> bool:
    kh, kw, c, _ = kernel.shape
    if not _PALLAS_FILTER_GRAD:
        return False
    if kh % 2 != 1 or kw % 2 != 1 or c % 128 != 0:
        return False
    if _PALLAS_FILTER_GRAD == "1x1" and not (
            kh == kw == 1 and (x.shape[1] * x.shape[2]) % 16 == 0):
        return False
    return _PALLAS_FILTER_GRAD == "interpret" or \
        jax.default_backend() == "tpu"


@jax.custom_vjp
def _conv_s1_same(x, kernel):
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _conv_s1_same_fwd(x, kernel):
    return _conv_s1_same(x, kernel), (x, kernel)


def _conv_s1_same_bwd(res, g):
    from squeezedet_tpu.ops.filter_grad import filter_grad
    x, kernel = res
    kh, kw = kernel.shape[:2]
    # data grad: correlate g with the spatially-flipped, IO-swapped
    # kernel (standard transposed-conv identity for stride 1 SAME)
    kflip = jnp.flip(kernel, (0, 1)).swapaxes(2, 3)
    dx = jax.lax.conv_general_dilated(
        g, kflip, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    dw = filter_grad(x, g, kh=kh, kw=kw,
                     interpret=_PALLAS_FILTER_GRAD == "interpret")
    return dx, dw.astype(kernel.dtype)


_conv_s1_same.defvjp(_conv_s1_same_fwd, _conv_s1_same_bwd)


def _conv_op(x, kernel, stride: int, padding: str):
    """The raw convolution, routed through the Pallas-backward custom
    VJP when enabled and applicable."""
    if stride == 1 and padding == "SAME" and _pallas_dw_eligible(x, kernel):
        return _conv_s1_same(x, kernel)
    return jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _conv_op_int8(x, kernel, stride: int, padding: str):
    """int8 x int8 -> int32 convolution (TPU MXU int8 path).

    Symmetric quantization keeps SAME zero-padding exact: quantized 0
    is real 0, so no zero-point correction is needed at the borders.
    """
    return jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def _quant_epilogue(acc_i32, params: Params, relu: bool):
    """Scale an int32 conv accumulator into the layer's output domain.

    ``mult``/``bias`` come pre-folded by quant.quantize_detector:
    - relu layers: mult = s_in*s_w[o]/s_out, bias = b[o]/s_out, and the
      result re-quantizes to int8 in [0, 127] (post-relu activations
      are non-negative, so the sign bit is structurally idle).
    - the ConvDet head (relu=False): mult = s_in*s_w[o], bias = b[o],
      and the result stays float32 for the interpretation graph.
    XLA fuses the whole epilogue (multiply/add/clamp/convert) into the
    conv consumer, so the int8 tensor is what hits HBM.
    """
    y = acc_i32.astype(jnp.float32) * params["mult"] + params["bias"]
    if not relu:
        return y
    return jnp.clip(jnp.round(jnp.maximum(y, 0.0)), 0, 127) \
        .astype(jnp.int8)


def is_quantized(params: Params) -> bool:
    """True for a conv layer pytree produced by quant.quantize_detector
    (int8 kernel + folded requant multiplier instead of f32 weights)."""
    return "mult" in params


def quantize_activation(x, scale):
    """Float activation -> int8 at ``scale`` (symmetric, round-to-
    nearest): the generic float->int8 boundary op of the PTQ path
    (quant.py) — also used by resnet50's residual joins, which run in
    f32 and re-quantize the merged block output."""
    y = x.astype(jnp.float32) * (1.0 / scale)
    return jnp.clip(jnp.round(y), -128, 127).astype(jnp.int8)


def _quant_boundary(params: Params, x):
    """Quantize a float activation entering a quantized conv.

    Hybrid float->int8 boundaries (quant.py keeps the input stage in
    float: the mean-subtract fuses into conv1 and the largest requant
    epilogue disappears) store the producer's activation scale as
    ``in_scale`` on the first quantized consumer; int8 inputs pass
    through untouched.
    """
    if x.dtype == jnp.int8:
        return x
    return quantize_activation(x, params["in_scale"])


def conv2d(params: Params, x, stride: int, padding: str = "SAME",
           relu: bool = True):
    """NHWC conv + bias (+ relu).  Matches tf.nn.conv2d 'SAME'/'VALID'.

    With int8-quantized params (quant.quantize_detector) and an int8
    activation tensor, computes the conv on the MXU's int8 path with
    int32 accumulation and a folded requantization epilogue.
    """
    if is_quantized(params):
        return _quant_epilogue(
            _conv_op_int8(_quant_boundary(params, x), params["kernel"],
                          stride, padding),
            params, relu)
    kernel = params["kernel"].astype(x.dtype)
    y = _conv_op(x, kernel, stride, padding)
    y = y + params["bias"].astype(y.dtype)
    if relu:
        y = jnp.maximum(y, 0)
    return y


def space_to_depth(x):
    """[B, H, W, C] -> [B, H/2, W/2, 4C]; channel order (py, px, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def _s2d_kernel_3x3(kernel):
    """[3, 3, C, O] stride-2 kernel -> [2, 2, 4C, O] block kernel whose
    channel order matches :func:`space_to_depth`.  Taps beyond the 3x3
    window are zero."""
    _, _, c, o = kernel.shape
    padded = jnp.zeros((4, 4, c, o), kernel.dtype).at[:3, :3].set(kernel)
    # [dy, dx, c, o] -> [by, py, bx, px, c, o] -> [by, bx, (py px c), o]
    padded = padded.reshape(2, 2, 2, 2, c, o)
    return padded.transpose(0, 2, 1, 3, 4, 5).reshape(2, 2, 4 * c, o)


def conv2d_s2d(params: Params, x, relu: bool = True):
    """3x3 stride-2 SAME conv computed as a space-to-depth 2x2 stride-1
    conv — bit-identical math, TPU-friendly shape.

    A stride-2 conv with C_in=3 starves the MXU: the im2col contraction
    is only 27 deep and strided loads waste half the sublanes.  Folding
    a 2x2 pixel block into channels makes it a dense stride-1 conv with
    a 48-deep contraction the MXU tiles cleanly (the standard MLPerf
    ResNet frontend trick).  Requires even H and W.
    """
    kernel = _s2d_kernel_3x3(params["kernel"].astype(x.dtype))
    # SAME for k=3 s2 on even dims pads (0, 1); one extra zero row/col
    # makes the padded size even for the block reshape (the extra block
    # only ever multiplies zero taps).
    x = jnp.pad(x, ((0, 0), (0, 2), (0, 2), (0, 0)))
    y = jax.lax.conv_general_dilated(
        space_to_depth(x), kernel,
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y + params["bias"].astype(y.dtype)
    if relu:
        y = jnp.maximum(y, 0)
    return y


# ---------------------------------------------------------------------------
# Conv + frozen-stats BatchNorm (reference _conv_bn_layer,
# nn_skeleton.py:374-468).  Mean/var are constants (never trained), so the
# whole BN is an affine transform XLA fuses into the conv epilogue.
# ---------------------------------------------------------------------------

def init_conv_bn(key, tracer: NetTracer, name: str, filters: int, size: int,
                 stride: int, *, padding: str = "SAME", freeze: bool = False,
                 relu: bool = True, conv_with_bias: bool = False,
                 stddev: float = 0.001,
                 xavier: bool = False,
                 bn_name: Optional[str] = None,
                 scale_name: Optional[str] = None,
                 pretrained: Optional[dict] = None) -> Tuple[Params, Params]:
    in_ch = tracer.channels
    kshape = (size, size, in_ch, filters)
    if pretrained is not None:
        kernel = jnp.asarray(
            np.transpose(np.asarray(pretrained[name][0]), (2, 3, 1, 0)),
            jnp.float32)
        bias = (jnp.asarray(np.asarray(pretrained[name][1]), jnp.float32)
                if conv_with_bias else None)
        mean = jnp.asarray(np.asarray(pretrained[bn_name][0]), jnp.float32)
        var = jnp.asarray(np.asarray(pretrained[bn_name][1]), jnp.float32)
        gamma = jnp.asarray(np.asarray(pretrained[scale_name][0]), jnp.float32)
        beta = jnp.asarray(np.asarray(pretrained[scale_name][1]), jnp.float32)
    else:
        kkey, _ = jax.random.split(key)
        kernel = (xavier_uniform_conv(kkey, kshape) if xavier
                  else truncated_normal(kkey, kshape, stddev))
        bias = jnp.zeros((filters,), jnp.float32) if conv_with_bias else None
        mean = jnp.zeros((filters,), jnp.float32)
        var = jnp.ones((filters,), jnp.float32)
        gamma = jnp.ones((filters,), jnp.float32)
        beta = jnp.zeros((filters,), jnp.float32)

    tracer.conv(name, filters, size, stride, padding, relu)
    params = {"kernel": kernel, "gamma": gamma, "beta": beta,
              "mean": mean, "var": var}
    mask = {"kernel": not freeze, "gamma": not freeze, "beta": not freeze,
            "mean": False, "var": False}
    if conv_with_bias:
        params["bias"] = bias
        mask["bias"] = not freeze
    return params, mask


def conv_bn(params: Params, x, stride: int, *, padding: str = "SAME",
            relu: bool = True, eps: float = 1e-5):
    if is_quantized(params):
        # BN was folded into the int8 kernel + epilogue at quantize
        # time (quant._fold_bn); relu=False taps (branch2c/branch1)
        # dequantize to f32 for the residual join.
        return _quant_epilogue(
            _conv_op_int8(_quant_boundary(params, x), params["kernel"],
                          stride, padding),
            params, relu)
    kernel = params["kernel"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in params:
        y = y + params["bias"].astype(y.dtype)
    # Frozen-stats batch norm as affine: gamma*(y-mean)/sqrt(var+eps)+beta.
    inv = (params["gamma"] * jax.lax.rsqrt(params["var"] + eps))
    y = y * inv.astype(y.dtype) + (
        params["beta"] - params["mean"] * inv).astype(y.dtype)
    if relu:
        y = jnp.maximum(y, 0)
    return y


# ---------------------------------------------------------------------------
# Pooling / dropout / fire
# ---------------------------------------------------------------------------

def record(tape, name: str, activation) -> None:
    """Store a layer activation in ``tape`` (a dict) when tracing for
    activation summaries; no-op (and zero graph cost) when tape is None.
    Concat-free fire pairs are materialized as their virtual concat only
    on the summary path."""
    if tape is None:
        return
    if isinstance(activation, tuple):
        activation = jnp.concatenate(activation, axis=-1)
    tape[name] = activation


def max_pool(x, size: int, stride: int, padding: str = "SAME"):
    """tf.nn.max_pool equivalent via reduce_window."""
    return jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else
        jnp.asarray(jnp.iinfo(x.dtype).min, x.dtype),
        jax.lax.max,
        window_dimensions=(1, size, size, 1),
        window_strides=(1, stride, stride, 1),
        padding=padding,
    )


def dropout(x, keep_prob: float, rng, train: bool):
    """Inverted dropout matching tf.nn.dropout (nn_skeleton.py:78).

    Random-bit footprint matters here: the ConvDet input is 184M
    elements at batch 128, and ``jax.random.bernoulli`` materializes
    u32 bits + an f32 uniform per element (~14% of the measured train
    step).  When keep_prob is representable as q/256 (0.5 always is),
    one u8 of entropy per element gives the exact same Bernoulli(q/256)
    marginal at a quarter of the bit traffic; otherwise fall back to
    the f32 path.
    """
    if not train or keep_prob >= 1.0:
        return x
    q = round(keep_prob * 256)
    if 0 < q < 256 and abs(q - keep_prob * 256) < 1e-9:
        bits = jax.random.bits(rng, x.shape, dtype=jnp.uint8)
        mask = bits < jnp.uint8(q)  # P = q/256 exactly
    else:
        mask = jax.random.bernoulli(rng, keep_prob, x.shape)
    return jnp.where(mask, x / keep_prob, jnp.zeros_like(x))


def init_fire(key, tracer: NetTracer, name: str, s1x1: int, e1x1: int,
              e3x3: int, *, freeze: bool = False, stddev: float = 0.01,
              xavier: bool = False,
              pretrained: Optional[dict] = None) -> Tuple[Params, Params]:
    """Fire module: squeeze1x1 -> concat(expand1x1, expand3x3)
    (squeezeDet.py:81-106)."""
    k1, k2, k3 = jax.random.split(key, 3)
    sq, sq_m = init_conv(k1, tracer, name + "/squeeze1x1", s1x1, 1, 1,
                         stddev=stddev, freeze=freeze, xavier=xavier,
                         pretrained=pretrained)
    snap = tracer.snapshot()
    e1, e1_m = init_conv(k2, tracer, name + "/expand1x1", e1x1, 1, 1,
                         stddev=stddev, freeze=freeze, xavier=xavier,
                         pretrained=pretrained)
    tracer.restore(snap)
    e3, e3_m = init_conv(k3, tracer, name + "/expand3x3", e3x3, 3, 1,
                         stddev=stddev, freeze=freeze, xavier=xavier,
                         pretrained=pretrained)
    # after concat, channels = e1x1 + e3x3
    tracer.channels = e1x1 + e3x3
    params = {"squeeze1x1": sq, "expand1x1": e1, "expand3x3": e3}
    mask = {"squeeze1x1": sq_m, "expand1x1": e1_m, "expand3x3": e3_m}
    return params, mask


def fire(params: Params, x):
    sq = conv2d(params["squeeze1x1"], x, 1)
    e1 = conv2d(params["expand1x1"], sq, 1)
    e3 = conv2d(params["expand3x3"], sq, 1)
    return jnp.concatenate([e1, e3], axis=3)


def conv2d_pair(params: Params, xa, xb, stride: int = 1,
                relu: bool = True):
    """Conv over a *virtual* concat: conv(concat(xa, xb), k) ==
    conv(xa, k[:, :, :Ca]) + conv(xb, k[:, :, Ca:]).

    Lets the fire chain skip materializing every expand concat
    (squeezeDet.py:106) — measured -14% inference time at batch 128
    bf16 with bit-identical results (pure float associativity).
    """
    k = params["kernel"]
    ca = xa.shape[-1]
    if is_quantized(params):
        xa = _quant_boundary(params, xa)
        xb = _quant_boundary(params, xb)
        acc = _conv_op_int8(xa, k[:, :, :ca], stride, "SAME") + \
            _conv_op_int8(xb, k[:, :, ca:], stride, "SAME")
        return _quant_epilogue(acc, params, relu)
    ya = _conv_op(xa, k[:, :, :ca].astype(xa.dtype), stride, "SAME")
    yb = _conv_op(xb, k[:, :, ca:].astype(xb.dtype), stride, "SAME")
    y = ya + yb + params["bias"].astype(ya.dtype)
    return jnp.maximum(y, 0) if relu else y


def fire_pair(params: Params, pair, *, pool=None, padding: str = "SAME",
              tape=None, name: str = ""):
    """Fire module over (expand1x1, expand3x3) halves, returning halves.

    ``pair`` is either a single tensor (first fire) or an (a, b) tuple;
    ``pool`` optionally applies (size, stride) max-pooling to both
    halves — pooling commutes with channel concatenation.

    ``tape``/``name``: when tracing activations, the squeeze output is
    recorded as ``<name>/squeeze1x1`` (the reference summarizes every
    conv layer, nn_skeleton.py:543-547; quant calibration also needs
    this internal activation's range).
    """
    if isinstance(pair, tuple):
        sq = conv2d_pair(params["squeeze1x1"], pair[0], pair[1], 1)
    else:
        sq = conv2d(params["squeeze1x1"], pair, 1)
    if name:
        record(tape, name + "/squeeze1x1", sq)
    a = conv2d(params["expand1x1"], sq, 1)
    b = conv2d(params["expand3x3"], sq, 1)
    if pool is not None:
        size, stride = pool
        a = max_pool(a, size, stride, padding)
        b = max_pool(b, size, stride, padding)
    return a, b


# ---------------------------------------------------------------------------
# FC layer (reference _fc_layer, nn_skeleton.py:589-694) — capability parity;
# none of the four shipped backbones use it.
# ---------------------------------------------------------------------------

def init_fc(key, tracer: NetTracer, name: str, hiddens: int, *,
            flatten: bool = False, relu: bool = True, xavier: bool = False,
            stddev: float = 0.001,
            pretrained: Optional[dict] = None) -> Tuple[Params, Params]:
    if flatten:
        dim = tracer.height * tracer.width * tracer.channels
    else:
        dim = tracer.channels
    weights = None
    if pretrained is not None and name in pretrained:
        kval = np.asarray(pretrained[name][0])
        bval = np.asarray(pretrained[name][1])
        try:
            if flatten:
                assert kval.shape == (hiddens, dim)
                kval = np.reshape(
                    np.transpose(
                        np.reshape(kval, (hiddens, tracer.channels,
                                          tracer.height, tracer.width)),
                        (2, 3, 1, 0)),
                    (dim, -1))
            else:
                kval = np.transpose(kval, (1, 0))
            assert kval.shape == (dim, hiddens)
            weights = jnp.asarray(kval, jnp.float32)
            bias = jnp.asarray(bval, jnp.float32)
        except (AssertionError, ValueError):
            weights = None
            print("Shape of the pretrained parameter of {} does not match, "
                  "use randomly initialized parameter".format(name))
    if weights is None:
        kkey, _ = jax.random.split(key)
        if xavier:
            weights = xavier_uniform_fc(kkey, (dim, hiddens))
        else:
            weights = truncated_normal(kkey, (dim, hiddens), stddev)
        bias = jnp.zeros((hiddens,), jnp.float32)
    tracer.fc(name, hiddens, relu)
    return ({"weights": weights, "bias": bias},
            {"weights": True, "bias": True})


def fc(params: Params, x, *, flatten: bool = False, relu: bool = True):
    if flatten:
        x = x.reshape(x.shape[0], -1)
    y = jnp.dot(x, params["weights"].astype(x.dtype),
                preferred_element_type=x.dtype) + params["bias"].astype(x.dtype)
    if relu:
        y = jnp.maximum(y, 0)
    return y


# ---------------------------------------------------------------------------
# Weight decay helper
# ---------------------------------------------------------------------------

def weight_decay_loss(params, trainable_mask, wd: float):
    """Sum of wd * 0.5*||k||^2 over trainable kernel/weights leaves
    (reference _variable_with_weight_decay, nn_skeleton.py:51-70 — decay on
    conv kernels and fc weights only, and only when trainable)."""
    total = 0.0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        key_name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if key_name not in ("kernel", "weights"):
            continue
        m = trainable_mask
        ok = True
        for p in path:
            k = p.key if hasattr(p, "key") else str(p)
            m = m.get(k) if isinstance(m, dict) else m
            if m is None:
                ok = False
                break
        if ok and m:
            total = total + wd * 0.5 * jnp.sum(
                jnp.square(leaf.astype(jnp.float32)))
    return total
