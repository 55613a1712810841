"""Pallas filter-gradient kernel for stride-1 SAME convolutions.

Why this exists (the one train-step op class XLA schedules badly): the
round-3 roofline (PARITY.md) measured the ConvDet head's filter
gradients at 12% MXU utilization (~10 ms/step at batch 128) and a
12 ms tail of skinny filter grads lowered to VPU multiply-reduce — the
only remaining levers called out as "hand-written backward kernels".

A stride-1 filter grad is a huge-contraction GEMM in disguise:

    dW[di, dj, ci, co] = sum_{b,y,x} X[b, y+di-ph, x+dj-pw, ci]
                                   * dY[b, y, x, co]

Flatten each image's SAME-padded frame (with zero guard rows) to
[L, C] and zero-embed dY into the same frame geometry; then every tap
(di, dj) is ONE dot_general contracting a length-``plen`` row window,
with the X window merely *shifted* by the tap's flat offset
o = (di-ph)*Wp + (dj-pw).  Out-of-window terms vanish because dY's
frame borders are zero; the guard rows keep shifted reads in bounds.
The kernel grid walks the batch, DMAs each image's X frame into VMEM
once (double-buffered), and accumulates all kh*kw taps into an f32
[taps, C, O] accumulator that lives in VMEM across the whole grid —
X is read from HBM exactly once, and the MXU sees dense [plen, C] x
[plen, O] contractions instead of XLA's dilated-window conv-grad
lowering.

1x1 convolutions degenerate naturally (no padding, one tap): that case
covers the fire squeeze layers, whose grads XLA lowers to VPU reduces.

Used by models/layers.py through a custom VJP on the stride-1 SAME
conv path (reference backward semantics: plain TF autodiff of
tf.nn.conv2d, nn_skeleton.py:329-361 — this computes the same
gradient; parity pinned by tests/test_filter_grad.py).

MEASURED OUTCOME (round 3): 3.7x faster than XLA's lowering on an
isolated 1x1 filter grad (0.163 vs 0.610 ms device time), but a net
LOSS inside the full train step — the custom VJP boundary severs XLA's
conv/elementwise fusions and forces residual materialization, costing
more than the kernel saves (61.4 -> 64.4 ms/step device self-time with
the "1x1" mode).  Shipped default-off behind --pallas_grads; see
models/layers.py and PARITY.md.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUBLANE = 16  # alignment for DMA row starts/lengths (bf16 tile)


def _frame_geometry(h: int, w: int, kh: int, kw: int):
    """Frame layout shared by X and dY.

    Returns (rows, wp, g, p0, plen, offsets) where the frame is
    [rows, wp] flattened row-major, X's SAME-padded image sits at row
    ``g``, dY sits at row ``g + ph`` / col ``pw``, contraction runs
    over flat positions [p0, p0+plen), and offsets[t] is tap t's flat
    shift (di-major).
    """
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    wp = w + kw - 1                      # SAME column padding
    hx = h + kh - 1                      # SAME row padding
    omax = ph * wp + pw                  # largest |tap offset|
    # dY nonzero flat range given a g-row top guard:
    #   first = (g + ph) * wp + pw,  last = (g + ph + h - 1) * wp + pw + w - 1
    # choose g so that p0 (16-aligned floor of first) minus omax >= 0
    g = 0
    while True:
        first = (g + ph) * wp + pw
        p0 = (first // _SUBLANE) * _SUBLANE
        if p0 - omax >= 0:
            break
        g += 1
    last = (g + ph + h - 1) * wp + pw + w - 1
    plen = -(-(last + 1 - p0) // _SUBLANE) * _SUBLANE
    # bottom guard: shifted reads reach p0 + plen - 1 + omax
    need = p0 + plen + omax
    rows = -(-need // wp)
    rows += (-rows) % 2                  # keep frame length even-ish
    # round total frame length to a 16-row multiple for DMA
    length = rows * wp
    length = -(-length // _SUBLANE) * _SUBLANE
    offsets = [
        (di - ph) * wp + (dj - pw) for di in range(kh) for dj in range(kw)
    ]
    return length, wp, g, p0, plen, offsets


def _kernel(x_ref, dy_ref, out_ref, *, p0: int, plen: int,
            offsets: Tuple[int, ...]):
    # One batch image per grid step; Pallas pipelines the HBM->VMEM
    # block fetches (double-buffered) while the MXU runs the taps.
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    dy_win = dy_ref[0, pl.ds(p0, plen), :]
    for t, off in enumerate(offsets):
        xs = x_ref[0, pl.ds(p0 + off, plen), :]
        out_ref[t] += jax.lax.dot_general(
            xs, dy_win, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("kh", "kw", "interpret"))
def filter_grad(x, dy, *, kh: int, kw: int, interpret: bool = False):
    """dW [kh, kw, C, O] (f32) of a stride-1 SAME NHWC conv.

    x: [B, H, W, C] activations; dy: [B, H, W, O] output cotangent.
    kh/kw must be odd (SAME with symmetric padding).
    """
    b, h, w, c = x.shape
    o = dy.shape[-1]
    assert dy.shape[:3] == (b, h, w), (x.shape, dy.shape)
    assert kh % 2 == 1 and kw % 2 == 1, (kh, kw)

    length, wp, g, p0, plen, offsets = _frame_geometry(h, w, kh, kw)
    ph, pw = (kh - 1) // 2, (kw - 1) // 2

    if kh == 1 and kw == 1 and (h * w) % _SUBLANE == 0:
        # fast path: frames are plain reshapes, no copies
        xf = x.reshape(b, h * w, c)
        dyf = dy.reshape(b, h * w, o)
        p0, plen, offsets, length = 0, h * w, [0], h * w
    else:
        # zero-embed X's SAME-padded image at frame row g+ph (the g
        # guard rows + ph SAME rows are one combined top pad), col pw
        xpad = jnp.pad(x, ((0, 0), (g + ph, 0), (pw, wp - w - pw),
                           (0, 0)))
        flat = xpad.reshape(b, -1, c)
        xf = jnp.pad(flat, ((0, 0), (0, length - flat.shape[1]), (0, 0)))
        dypad = jnp.pad(dy, ((0, 0), (g + ph, 0), (pw, wp - w - pw),
                             (0, 0)))
        dflat = dypad.reshape(b, -1, o)
        dyf = jnp.pad(dflat, ((0, 0), (0, length - dflat.shape[1]),
                              (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, p0=p0, plen=plen,
                          offsets=tuple(offsets)),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, xf.shape[1], c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dyf.shape[1], o), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((len(offsets), c, o), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((len(offsets), c, o), jnp.float32),
        interpret=interpret,
    )(xf, dyf)
    return out.reshape(kh, kw, c, o)
