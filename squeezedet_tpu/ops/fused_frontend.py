"""Pallas fused front-end: conv1 (3x3 stride-2 SAME) + bias + ReLU +
pool1 (3x3 stride-2 SAME maxpool) in one kernel.

Status & measured outcome (batch 128 bf16, 384x1248, v5e): exact parity
with the XLA path (0 ulp in f32), but 11.9 ms vs XLA's 10.5 ms for
conv1+pool1.  XLA lowers convolutions to *native MXU convolution*
instructions with spatial operand reuse, which a C_in=3 im2col-GEMM
formulation (K=27) cannot beat; the HBM-round-trip saving (~1 GB of
intermediates) does not compensate for the ~52k small [27,384]x[27,64]
dots.  Kept as working, tested Pallas infrastructure (manual HBM->VMEM
DMA with halo windows, phase-split striding, roll-based pooling) rather
than wired into the default model; the default path stays on XLA convs.

Round-2 addendum — why no dot-based formulation can win here: the MXU
streams one M-column per cycle through the full 128(K)x128(N) array, so
a K=27, N=64 GEMM uses 10.5% of each cycle regardless of how many
positions are batched per dot; all 15.3M conv-output positions of a
128-batch therefore cost >= ~16 ms of MXU time as an im2col GEMM.
Block-Toeplitz packing (segment of 42 input columns as K=126, 20
outputs as N over 10 dots) raises density only to the Toeplitz
sparsity 27/126 = 21% (~8 ms) — still 2x XLA's 3.86 ms native conv,
which reuses operands spatially inside the MXU.  A round-2 HBM-im2col
prestage variant also measured 35.7 ms for the XLA gather alone.  The
frontend stays on XLA's native convolution by necessity, not neglect.

Layout strategy: C_in=3 makes the conv a K=27 GEMM.  Mosaic supports
neither >2D gathers nor strided slices, so all striding is resolved
ahead of time: one fused XLA prestage splits the image into four
column-phase channel planes x_p[B, 3, Hp, W/4] (p = column mod 4, W/4
in lanes).  In-kernel, even conv columns (2q) read taps from phases
(0, 1, 2) and odd columns (2q+1) from (2, 3, 0-shifted), each assembled
into a [27, W/4] lhsT that hits the MXU via dot_general(((0,), (0,)));
3x3 pooling then reduces to jnp.maximum + pltpu.roll (lane/sublane
shifts), with row pooling composed over unrolled conv rows in python.
SAME padding needs no left/top pad for these shapes (pad_total = 1,
low = 0), matching tf.nn.conv2d/max_pool exactly.

Constraints: H % 4 == 0, W % 4 == 0, pool rows (H/4) divisible by the
row tile (8).  squeezeDet's 384x1248 and the test sizes satisfy them;
callers fall back to the unfused path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_ROWS = 8  # pool-output rows per kernel invocation


def _prestage(images, kernel, dtype):
    """One fused XLA pass: dtype cast + column mod-4 phase split into
    channel planes [B, 3, Hp, W/4] (Hp padded so every row tile's input
    window is in-bounds)."""
    b, h, w, _ = images.shape
    x = images.astype(dtype)
    xr = x.reshape(b, h, w // 4, 4, 3)
    # DMA slice sizes must be tile-aligned: rows (sublanes) to 16
    # (bf16 tile) — each tile reads 4*TILE_ROWS+16 rows (only +3 used)
    # — and lanes to 128
    pad = (4 * TILE_ROWS * (-(-h // (4 * TILE_ROWS))) + 16) - h
    wq = w // 4
    wpad = -(-wq // 128) * 128 - wq
    phases = []
    for p in range(4):
        xp = xr[:, :, :, p, :].transpose(0, 3, 1, 2)  # [B, 3, H, W/4]
        phases.append(jnp.pad(
            xp, ((0, 0), (0, 0), (0, pad), (0, wpad))))
    k27 = kernel.reshape(27, -1).astype(dtype)  # (di, dj, c) -> rows
    return phases, k27


def _kernel(x0_hbm, x1_hbm, x2_hbm, x3_hbm, k_ref, b_ref, out_ref,
            x0_s, x1_s, x2_s, x3_s, sems, *, conv_rows: int,
            quarter_w: int, padded_w: int):
    b = pl.program_id(0)
    t = pl.program_id(1)
    in_rows = 4 * TILE_ROWS + 16  # 16-aligned DMA; tail rows unused

    copies = []
    for i, (hbm, s) in enumerate(((x0_hbm, x0_s), (x1_hbm, x1_s),
                                  (x2_hbm, x2_s), (x3_hbm, x3_s))):
        start = pl.multiple_of(t * 4 * TILE_ROWS, 4 * TILE_ROWS)
        cp = pltpu.make_async_copy(
            hbm.at[b, :, pl.ds(start, in_rows), :], s, sems.at[i])
        cp.start()
        copies.append(cp)
    for cp in copies:
        cp.wait()

    x0, x1, x2, x3 = x0_s[:], x1_s[:], x2_s[:], x3_s[:]
    # phase-0 of the NEXT 4-column group (input col 4q+4); right edge is
    # conv SAME zero padding
    lane = jax.lax.broadcasted_iota(jnp.int32, x0.shape, 2)
    # Mosaic rotates need 32-bit data; round-trip narrow dtypes via f32
    def _roll(v, shift, axis):
        if v.dtype.itemsize == 4:
            return pltpu.roll(v, shift=shift, axis=axis)
        return pltpu.roll(v.astype(jnp.float32), shift=shift,
                          axis=axis).astype(v.dtype)

    x0n = jnp.where(lane == quarter_w - 1, jnp.zeros_like(x0),
                    _roll(x0, padded_w - 1, 2))

    k27 = k_ref[:]                        # [27, 64]
    bias = b_ref[:].astype(jnp.float32)   # [1, 64]

    def row_block(src, r):
        # src[:, r, :] as [3, padded_w] without 3D-gather lowering
        return jax.lax.slice_in_dim(src, r, r + 1, axis=1).reshape(
            3, padded_w)

    def conv_row(srcs, ci):
        taps = []
        for di in range(3):
            r = 2 * ci + di
            for src in srcs:              # dj = 0, 1, 2
                taps.append(row_block(src, r))
        lhs_t = jnp.concatenate(taps, axis=0)   # [27, W/4]
        y = jax.lax.dot_general(
            lhs_t, k27, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [W/4, 64]
        y = jnp.maximum(y + bias, 0.0)
        # zero conv rows past the true image (pool pad; safe because
        # post-ReLU values are >= 0, so a 0 candidate never wins)
        valid = (2 * TILE_ROWS * t + ci) < conv_rows
        return jnp.where(valid, y, jnp.zeros_like(y)).astype(
            out_ref.dtype)

    n_conv = 2 * TILE_ROWS + 1
    m1_rows = []
    sub = None
    for ci in range(n_conv):
        y_even = conv_row((x0, x1, x2), ci)        # conv cols 2q
        y_odd = conv_row((x2, x3, x0n), ci)        # conv cols 2q+1
        # pool cols: m1[q] = max(y[2q], y[2q+1], y[2q+2]); y[2q+2] is
        # the next even column = sublane roll of y_even
        if sub is None:
            sub = jax.lax.broadcasted_iota(jnp.int32, y_even.shape, 0)
        y_even_next = jnp.where(
            sub == quarter_w - 1, jnp.zeros_like(y_even),
            _roll(y_even, padded_w - 1, 0))
        m1 = jnp.maximum(jnp.maximum(y_even, y_odd), y_even_next)
        # drop the lane-padding rows (conv cols >= W/2 are garbage)
        m1_rows.append(jax.lax.slice_in_dim(m1, 0, quarter_w, axis=0))

    # pool rows composed in python: out row p <- conv rows 2p..2p+2
    out = jnp.stack([
        jnp.maximum(jnp.maximum(m1_rows[2 * p], m1_rows[2 * p + 1]),
                    m1_rows[2 * p + 2])
        for p in range(TILE_ROWS)
    ])
    out_ref[0] = out


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv1_pool1_fused(images, kernel, bias, *, interpret: bool = False):
    """images [B, H, W, 3] (any float dtype) -> [B, H/4, W/4, filters].

    Exactly equivalent (up to dot accumulation order) to
    ``max_pool(relu(conv2d(x, kernel, stride 2, SAME) + bias), 3, 2,
    SAME)`` — the squeezeDet conv1+pool1 stack (squeezeDet.py:40-44).
    """
    b, h, w, cin = images.shape
    assert cin == 3 and h % 4 == 0 and w % 4 == 0, (h, w, cin)
    pool_h, pool_w = h // 4, w // 4
    assert pool_h % TILE_ROWS == 0, (pool_h, TILE_ROWS)
    conv_rows, quarter_w = h // 2, w // 4
    filters = kernel.shape[-1]
    dtype = images.dtype

    phases, k27 = _prestage(images, kernel, dtype)
    in_rows = 4 * TILE_ROWS + 16
    padded_w = -(-quarter_w // 128) * 128

    return pl.pallas_call(
        functools.partial(_kernel, conv_rows=conv_rows,
                          quarter_w=quarter_w, padded_w=padded_w),
        grid=(b, pool_h // TILE_ROWS),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 4 + [
            pl.BlockSpec((27, filters), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, filters), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_ROWS, pool_w, filters),
                               lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, pool_h, pool_w, filters),
                                       dtype),
        scratch_shapes=[pltpu.VMEM((3, in_rows, padded_w), dtype)] * 4
        + [pltpu.SemaphoreType.DMA((4,))],
        interpret=interpret,
    )(*phases, k27, bias.reshape(1, -1).astype(dtype))
