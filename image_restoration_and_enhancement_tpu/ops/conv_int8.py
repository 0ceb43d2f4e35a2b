"""Implicit-GEMM int8 3x3 convolution (Pallas TPU kernel).

Why: the serving loop's convs are its FLOP bulk. XLA's s8xs8 conv lowering
measured only ~1.3x bf16 on v5e (scripts/probe_int8.py) while s8 *matmul*
runs 244 TOPS (1.66x bf16) — so lowering the 3x3 convs as nine accumulated
MXU matmuls recovers the matmul rate.

Trick (keeps every tap slice contiguous, no im2col materialization):
pad the input spatially by 1, flatten (H+2, W+2) to one padded-row axis of
stride S = W+2. Then tap (dy, dx) of output position m is the input row
m + dy*S + dx — a *contiguous* row range for the whole tile. The kernel
computes output rows for the padded-width grid (the 2 garbage columns per
row absorb the row-wrap bleed) and the caller slices them off; that's
(W+2)/W ≈ 3% redundant MXU work for perfectly contiguous loads.

Kernel structure:
  grid = (B, m_tiles, n_tiles)   # n innermost
  x    : [B, P, C] int8, HBM-resident (memory_space ANY); one manual DMA
         of [tile_m + halo, C] into VMEM scratch per (b, i), reused
         across the n_tiles loop (halo = 2S + 2 covers all nine taps)
  w    : [9, C, tile_n] int8 blocks via BlockSpec (VMEM)
  scale: [1, tile_n] f32 = act_scale * w_scale[n] — folded into the
         in-kernel epilogue so the output is written once, in bf16
  body : acc(int32) = sum_{t<9} dot(xs[off_t : off_t+tile_m], w[t])
         with off_t = (t//3)*S + t%3; epilogue acc * scale -> out dtype

The (H*S vs H*W) output padding is sliced away by the caller; stride-2 /
dilated / non-3x3 convs stay on the XLA int8 path (ops/quant.py).
"""
from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(x_hbm, w_ref, scale_ref, o_ref, xs, sem, *,
            tile_m: int, halo: int, stride_s: int, n_tiles: int):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    # one DMA per (b, i) tile, reused across the n-tile loop
    @pl.when(j == 0)
    def _load():
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(i * tile_m, tile_m + halo), :], xs, sem
        )
        cp.start()
        cp.wait()

    acc = jnp.zeros((tile_m, w_ref.shape[-1]), jnp.int32)
    for t in range(9):
        off = (t // 3) * stride_s + (t % 3)
        acc = acc + lax.dot(
            xs[pl.ds(off, tile_m), :], w_ref[t],
            preferred_element_type=jnp.int32,
        )
    o_ref[0] = (acc.astype(jnp.float32) * scale_ref[:]).astype(o_ref.dtype)


def conv3x3_same_int8(
    x_q: jnp.ndarray,          # [B, H+2, W+2, C] int8 (already padded + quantized)
    w_q: jnp.ndarray,          # [3, 3, C, N] int8
    out_scale: jnp.ndarray,    # [N] f32 (act_scale * per-channel w_scale)
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns [B, H, W, N] in out_dtype."""
    b, hp, wp, c = x_q.shape
    h, w = hp - 2, wp - 2
    n = w_q.shape[-1]
    s = wp  # padded row stride

    m_total = h * s
    # int8 DMAs whose row count is not a multiple of the 32-row sublane
    # packing crash the Mosaic compiler (bisected on v5e: 32-multiple copies
    # compile, 390-row copies kill tpu_compile_helper) — round the halo up;
    # the taps only ever read the first 2s+2 of it.
    halo = _round_up(2 * s + 2, 32)
    tile_m = int(os.environ.get("IRET_CONV_TILE_M", "512"))
    tile_m = min(tile_m, _round_up(m_total, 8))
    m_tiles = pl.cdiv(m_total, tile_m)
    # flatten + pad the row axis so every tile's [tile_m + halo] window reads
    # in-bounds
    p_needed = m_tiles * tile_m + halo
    x_flat = x_q.reshape(b, hp * wp, c)
    if p_needed > hp * wp:
        x_flat = jnp.pad(x_flat, ((0, 0), (0, p_needed - hp * wp), (0, 0)))

    tile_n = int(os.environ.get("IRET_CONV_TILE_N", "512"))
    tile_n = min(tile_n, n)
    n_tiles = pl.cdiv(n, tile_n)
    w_flat = w_q.reshape(9, c, n)
    # int8 DMAs also require the lane axis to be a 128-multiple (same
    # Mosaic bisect as the halo note above: c=384 compiles, c=320/64 crash).
    # Zero channel padding is exact for the int32 accumulation.
    cp_ = _round_up(c, 128)
    if cp_ != c:
        x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (0, cp_ - c)))
        w_flat = jnp.pad(w_flat, ((0, 0), (0, cp_ - c), (0, 0)))
        c = cp_

    out = pl.pallas_call(
        functools.partial(_kernel, tile_m=tile_m, halo=halo, stride_s=s,
                          n_tiles=n_tiles),
        grid=(b, m_tiles, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec((9, c, tile_n), lambda b, i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda b, i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_m, tile_n), lambda b, i, j: (b, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m_tiles * tile_m, n), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_m + halo, c), jnp.int8),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * m_total * 9 * c * n,
            bytes_accessed=x_flat.size + w_flat.size + b * m_total * n * 2,
            transcendentals=0,
        ),
    )(x_flat, w_flat, out_scale.reshape(1, n).astype(jnp.float32))
    # drop the m padding, reshape to the padded-width grid, cut the 2
    # garbage columns
    return out[:, :m_total].reshape(b, h, s, n)[:, :, :w, :]
