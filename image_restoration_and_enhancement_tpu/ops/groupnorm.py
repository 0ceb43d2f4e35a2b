"""Fused GroupNorm(+SiLU) Pallas kernel.

Profiling the 512px sampling loop (CLAUDE.md) shows GroupNorm chains are a
major elementwise cost: the XLA lowering runs separate convert/reduce
passes per norm. This kernel does one HBM read + one write per tensor:

- grid over the batch; each cell holds the full (H, W, C) activation in
  VMEM (bf16) — all SD UNet levels fit (<= 2.6MB at 512px inputs).
- group statistics via MXU matmuls against one-hot group maps
  (ones-vector row sum -> per-channel sums -> per-group sums), chunked
  over rows so squares are computed in float32 without materializing a
  full fp32 copy.
- normalize + affine + optional SiLU on the VPU, written back in bf16.

Falls back to flax GroupNorm off-TPU or when the tensor exceeds the VMEM
budget (the VAE's 512x512 layers).
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Mosaic double-buffers the per-grid-cell input AND output blocks, so the
# kernel's VMEM footprint is ~4x the per-sample tensor size (16MB VMEM).
_VMEM_BUDGET_BYTES = int(3.5 * 1024 * 1024)
_CHUNK = 512


def _kernel(x_ref, scale_ref, bias_ref, cmap_ref, gmap_ref, o_ref,
            *, groups: int, eps: float, act: str, rows: int, cols: int):
    """x: [1, rows, cols] bf16; cmap: [cols, groups] one-hot; gmap = cmap.T."""
    n_chunks = pl.cdiv(rows, _CHUNK)

    def stats_body(i, carry):
        s, ss = carry
        chunk = x_ref[0, pl.ds(i * _CHUNK, _CHUNK), :].astype(jnp.float32)
        # mask padded tail rows (rows may not divide by _CHUNK)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, chunk.shape, 0) + i * _CHUNK
        chunk = jnp.where(row_ids < rows, chunk, 0.0)
        ones = jnp.ones((1, chunk.shape[0]), jnp.float32)
        s = s + jax.lax.dot(ones, chunk, preferred_element_type=jnp.float32)
        ss = ss + jax.lax.dot(ones, chunk * chunk, preferred_element_type=jnp.float32)
        return s, ss

    zero = jnp.zeros((1, cols), jnp.float32)
    col_sum, col_sumsq = jax.lax.fori_loop(0, n_chunks, stats_body, (zero, zero))

    # per-group stats via one-hot contraction, then broadcast back per channel
    g_sum = jax.lax.dot(col_sum, cmap_ref[:], preferred_element_type=jnp.float32)
    g_sumsq = jax.lax.dot(col_sumsq, cmap_ref[:], preferred_element_type=jnp.float32)
    count = jnp.float32(rows * cols // groups)
    g_mean = g_sum / count
    # E[x^2]-E[x]^2 can go slightly negative in fp32 for large mean/std
    # ratios; clamp so rsqrt never sees a negative operand.
    g_var = jnp.maximum(g_sumsq / count - g_mean * g_mean, 0.0)
    g_rstd = jax.lax.rsqrt(g_var + eps)
    mean_c = jax.lax.dot(g_mean, gmap_ref[:], preferred_element_type=jnp.float32)
    rstd_c = jax.lax.dot(g_rstd, gmap_ref[:], preferred_element_type=jnp.float32)

    w = rstd_c * scale_ref[:]          # [1, cols]
    b = bias_ref[:] - mean_c * w       # [1, cols]

    def norm_body(i, _):
        chunk = x_ref[0, pl.ds(i * _CHUNK, _CHUNK), :].astype(jnp.float32)
        y = chunk * w + b
        if act == "silu":
            y = y * jax.nn.sigmoid(y)
        o_ref[0, pl.ds(i * _CHUNK, _CHUNK), :] = y.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_chunks, norm_body, 0)


def _pallas_group_norm(x, scale, bias, groups, eps, act, interpret=False):
    b, h, w_, c = x.shape
    rows, cols = h * w_, c
    x2 = x.reshape(b, rows, cols)
    rows_p = ((rows + _CHUNK - 1) // _CHUNK) * _CHUNK
    if rows_p != rows:
        x2 = jnp.pad(x2, ((0, 0), (0, rows_p - rows), (0, 0)))
    gc = c // groups
    cmap = jnp.asarray(
        np.repeat(np.eye(groups, dtype=np.float32), gc, axis=0)
    )  # [C, G]
    gmap = cmap.T  # [G, C]
    out = pl.pallas_call(
        functools.partial(_kernel, groups=groups, eps=eps, act=act,
                          rows=rows, cols=cols),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, rows_p, cols), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cols), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cols), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cols, groups), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((groups, cols), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows_p, cols), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, rows_p, cols), x.dtype),
        interpret=interpret,
    )(x2, scale.reshape(1, c).astype(jnp.float32),
      bias.reshape(1, c).astype(jnp.float32), cmap, gmap)
    return out[:, :rows].reshape(b, h, w_, c)


def _reference_group_norm(x, scale, bias, groups, eps, act):
    """Lane-friendly two-stage GroupNorm (XLA path).

    The naive formulation (flax nn.GroupNorm and our previous reference)
    reshapes channels to [..., groups, C/groups] and reduces over the tiny
    minor group dim — on TPU that shrinks the vector lane dim to C/groups
    (4-16 for SD shapes) and measured only ~170 GB/s. This version keeps C
    on the lanes: one fused pass computes per-channel sum/sumsq in fp32,
    the per-group combine happens on a tiny [B, G] tensor, and the
    normalize is a single elementwise pass (optionally fused with SiLU).
    """
    b, h, w_, c = x.shape
    gc = c // groups
    n = h * w_ * gc  # elements per group

    # IRET_GN_STATS_BARRIER=1 (captured at trace time): stop XLA from
    # fusing the sum/sumsq stats reduce into the PRODUCING conv's epilogue.
    # The int8 serving trace shows conv fusions carrying these stats run at
    # 150-227 TOPS vs 380 for epilogue-free peers (docs/STATUS.md); the
    # barrier trades that cap for one extra read of the already-
    # materialized activation.
    if os.environ.get("IRET_GN_STATS_BARRIER") == "1":
        x = jax.lax.optimization_barrier(x)

    xf = x.astype(jnp.float32)
    s = jnp.sum(xf, axis=(1, 2))                 # [B, C], fused convert+reduce
    ss = jnp.sum(jnp.square(xf), axis=(1, 2))    # [B, C], same pass
    g_sum = s.reshape(b, groups, gc).sum(-1)     # [B, G] (tiny)
    g_sumsq = ss.reshape(b, groups, gc).sum(-1)
    g_mean = g_sum / n
    # one-pass E[x^2]-E[x]^2 can cancel to a small negative in fp32 for
    # large mean/std ratios (e.g. mean 5000 / std 0.1) — clamp like
    # FusedLayerNorm does, or rsqrt returns NaN and poisons the forward.
    g_var = jnp.maximum(g_sumsq / n - jnp.square(g_mean), 0.0)
    g_rstd = jax.lax.rsqrt(g_var + eps)

    # per-channel affine folded into one multiply-add: y = x*w + b2
    rstd_c = jnp.repeat(g_rstd, gc, axis=-1)     # [B, C]
    mean_c = jnp.repeat(g_mean, gc, axis=-1)
    w = rstd_c * scale.astype(jnp.float32)[None, :]
    b2 = bias.astype(jnp.float32)[None, :] - mean_c * w
    y = xf * w[:, None, None, :] + b2[:, None, None, :]
    if act == "silu":
        y = jax.nn.silu(y)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _group_norm_pallas_diff(x, scale, bias, groups, eps, act):
    return _pallas_group_norm(x, scale, bias, groups, eps, act)


def _gn_fwd(x, scale, bias, groups, eps, act):
    return _pallas_group_norm(x, scale, bias, groups, eps, act), (x, scale, bias)


def _gn_bwd(groups, eps, act, res, g):
    # backward via the XLA reference implementation (recompute)
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_: _reference_group_norm(x_, s_, b_, groups, eps, act),
        x, scale, bias,
    )
    return vjp(g)


_group_norm_pallas_diff.defvjp(_gn_fwd, _gn_bwd)


def group_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    groups: int,
    eps: float = 1e-5,
    act: Optional[str] = None,
    backend: Optional[str] = None,
) -> jnp.ndarray:
    """Fused GroupNorm with optional SiLU. x: [B,H,W,C]. Differentiable
    (pallas forward, XLA-recompute backward)."""
    act = act or "none"
    fits = x.shape[1] * x.shape[2] * x.shape[3] * x.dtype.itemsize <= _VMEM_BUDGET_BYTES
    if backend == "pallas_interpret":
        return _pallas_group_norm(x, scale, bias, groups, eps, act, interpret=True)
    on_tpu = jax.devices()[0].platform == "tpu"
    # Measured end-to-end on v5e: the standalone kernel LOSES ~12% vs letting
    # XLA fuse the norm into neighboring ops (the custom call is a fusion
    # barrier). Kept as an opt-in (IRET_FUSED_GN=1) for future Mosaic
    # versions / bigger fusions; default path is the XLA lowering.
    import os

    opt_in = os.environ.get("IRET_FUSED_GN") == "1"
    if (backend == "pallas") or (backend is None and on_tpu and fits and opt_in):
        return _group_norm_pallas_diff(x, scale, bias, groups, eps, act)
    return _reference_group_norm(x, scale, bias, groups, eps, act)
