"""Attention ops: Pallas TPU fused-attention kernel + XLA reference path.

This is the hot op of the whole framework: every UNet transformer block runs
self-attention over up to 4096 latent tokens plus cross-attention against 77
text tokens, 20-30 times per sampled image (the reference runs these inside
diffusers' torch attention; here they are first-party).

Design notes (TPU):
- Sequence lengths are small enough (<= 4096) that K/V for one (batch, head)
  fit comfortably in VMEM, so the kernel holds K/V resident and streams Q
  blocks — a single-pass fused attention with no online-softmax carry and no
  HBM materialization of the N x N score matrix.
- head_dim is 40/80/160 (SD1.5) — padded to the 128-lane boundary inside the
  kernel; zero-padded K columns are masked with -inf before softmax.
- Softmax statistics in float32 on the VPU; both matmuls hit the MXU with
  float32 accumulation.
- Backward: custom_vjp recomputes attention with the XLA path (memory-light,
  lets XLA fuse the backward matmuls); forward stays on the Pallas kernel.

Public API: attention(q, k, v) with shapes [B, Nq, H, D] / [B, Nk, H, D].
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# XLA reference path (differentiable, used for backward + CPU)
# ---------------------------------------------------------------------------


def xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Plain dot-product attention, [B, N, H, D] layout, fp32 softmax.

    IRET_XLA_ATTN_BF16_SCORES=1 (serving experiment, measured NEGATIVE):
    round the score matrix to bf16 at the matmul epilogue and compute
    softmax statistics on the fly — the idea was to halve the bandwidth
    of the materialized [B,H,N,N] tensor at the N=4096 sites. Measured
    2.62 vs 3.20 img/s end-to-end (-18%): the hand-rolled max/exp/sum
    breaks XLA's pattern-matched softmax lowering, which is worth far
    more than the halved score bytes. Left opt-in as the record of the
    experiment; numerics are fine (max diff ~8e-3)."""
    d = q.shape[-1]
    scale = 1.0 / (d**0.5)
    if os.environ.get("IRET_XLA_ATTN_BF16_SCORES") == "1" and q.dtype == jnp.bfloat16:
        s = jnp.einsum(
            "bqhd,bkhd->bhqk", q * jnp.asarray(scale, q.dtype), k,
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp((s - m).astype(jnp.float32)).astype(jnp.bfloat16)
        l = jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
        o = jnp.einsum(
            "bhqk,bkhd->bqhd", p, v, preferred_element_type=jnp.float32
        )
        return (o / l.transpose(0, 2, 1, 3)).astype(q.dtype)  # l: [b,h,q,1]->[b,q,h,1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * scale, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v).astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas fused attention
# ---------------------------------------------------------------------------


def _fused_attention_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len: int,
                            norm_bound: bool):
    """One Q block vs all K/V for one (batch*head). Block shapes:
    q/o: [block_q, Dp], k/v: [Nkp, Dp].

    Inputs stay in their storage dtype (bf16) so the MXU runs at full rate;
    accumulation and softmax statistics are float32. The 1/sqrt(d) scale is
    pre-folded into Q by the caller (one tiny pass over Q instead of a
    full pass over the [block_q, Nk] score matrix here), and the softmax
    denominator is applied AFTER the PV matmul — dividing the [block_q, Dp]
    output instead of the Nk-wide probability matrix (exp(s-m) stays
    correct; sum(p)=l is factored out of the linear PV product).

    norm_bound (opt-in, IRET_ATTN_NORM_BOUND=1): the kernel is VPU-bound
    on passes over the [block_q, Nk] score matrix at large Nk, so instead
    of the row max (an Nk-wide reduce pass) the softmax can shift by the
    Cauchy-Schwarz bound ||q_i|| * max_j ||k_j|| >= max_j s_ij, computed
    from d-wide norms (~Nk/d times cheaper). Any upper bound is a
    mathematically exact softmax shift and exp(s - bound) <= 1 cannot
    overflow — BUT the bound is ~sqrt(d) looser than the true max for
    weakly-correlated q/k, so fp32 exp underflows (gap > ~87) zero out
    confident heads when logits are large (test
    test_pallas_norm_bound_extreme shows the cliff at ~|logit| 150 for
    d=40). Default is the exact row max; flip on only for models whose
    logit range is verified small."""
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [block_q, Nkp] fp32
    # IRET_ATTN_SCORES_BF16=1: keep the VMEM-resident score block in bf16 —
    # the kernel is VPU/VMEM-bound on the max/exp/sum passes at large Nk
    # and this halves their bytes. Costs ~3e-3 absolute score error
    # (softmax is shift-invariant so the max pass is unaffected).
    if os.environ.get("IRET_ATTN_SCORES_BF16") == "1":
        s = s.astype(jnp.bfloat16)
    nkp = s.shape[-1]
    if kv_len < nkp:  # mask zero-padded K columns (static)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, -jnp.inf)
    if norm_bound:
        qf = q_ref[0].astype(jnp.float32)
        kf = k_ref[0].astype(jnp.float32)
        qn = jnp.sqrt(jnp.sum(qf * qf, axis=-1, keepdims=True))  # [bq, 1]
        kn = jnp.sqrt(jnp.max(jnp.sum(kf * kf, axis=-1)))        # scalar
        m = qn * kn
    else:
        m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m).astype(v_ref.dtype)
    l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
    if norm_bound:
        # if every exp underflowed (pathological logit gaps) return 0s,
        # not NaN from 0/0
        l = jnp.maximum(l, 1e-30)
    o = jax.lax.dot_general(
        p, v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o * pl.reciprocal(l, approx=False)).astype(o_ref.dtype)


def _pick_block_q(nq: int, nkp: int, dp: int = 128) -> int:
    env = os.environ.get("IRET_ATTN_BLOCK_Q")
    if env:
        return min(int(env), _round_up(nq, 8))
    if nkp <= 256:
        # cross-attention (77-token text KV): per-block work is tiny, so use
        # huge Q blocks — the fp32 score block is only [block_q, nkp].
        return min(2048, _round_up(nq, 8))
    if dp >= 512:
        # wide single-head attention (VAE mid block, d=512): the K/V blocks
        # alone are 4MB each, so halve the fp32 score block to stay inside
        # Mosaic's 16MB scoped-VMEM limit (512 blocks OOM at 18M when the
        # grid grows past batch 8).
        return min(256, _round_up(nq, 8))
    return min(512, _round_up(nq, 8))


def _pallas_attention_bhnd(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Fused attention on [BH, N, D] tensors."""
    bh, nq, d = q.shape
    nk = k.shape[1]
    scale = 1.0 / (d**0.5)

    # IRET_ATTN_NO_DPAD=1: keep the true head_dim as the block lane dim
    # (legal when the block equals the full array dim) instead of
    # zero-padding to 128 lanes. Measured (v5e, CFG batch 16): helps at
    # N=4096/d=40 (10.3 vs 11.9ms — still behind XLA's 8.4) but HURTS the
    # shipping window sites (N=1024/d=80: 2.51 vs 2.08ms padded), so the
    # padded layout stays the default.
    no_dpad = os.environ.get("IRET_ATTN_NO_DPAD") == "1"
    dp = d if no_dpad else _round_up(d, _LANE)
    nkp = _round_up(nk, _LANE)
    block_q = _pick_block_q(nq, nkp, dp)
    nqp = _round_up(nq, block_q)

    qp = jnp.pad((q * jnp.asarray(scale, q.dtype)), ((0, 0), (0, nqp - nq), (0, dp - d)))
    kp = jnp.pad(k, ((0, 0), (0, nkp - nk), (0, dp - d)))
    vp = jnp.pad(v, ((0, 0), (0, nkp - nk), (0, dp - d)))

    # NOTE: like every IRET_* knob in this module, read at trace time —
    # changing it after a function is jitted has no effect until re-trace.
    norm_bound = os.environ.get("IRET_ATTN_NORM_BOUND", "0") == "1"
    grid = (bh, nqp // block_q)
    out = pl.pallas_call(
        functools.partial(_fused_attention_kernel, kv_len=nk,
                          norm_bound=norm_bound),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkp, dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkp, dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, nqp, dp), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * nqp * nkp * dp,
            bytes_accessed=(qp.size + kp.size + vp.size) * q.dtype.itemsize,
            transcendentals=bh * nqp * nkp,
        ),
    )(qp, kp, vp)
    return out[:, :nq, :d]


def _packed_attention_kernel(q_ref, k_ref, v_ref, o_ref, *,
                             heads: int, head_dim: int, kv_len: int,
                             scale: float):
    """All heads of one Q block vs all K/V for one batch element.

    Blocks keep the projection layout [block, H*D]: q/o [block_q, H*D],
    k/v [Nkp, H*D]. The per-head split happens here as static lane slices
    (an in-VMEM relayout) instead of a transposed+padded HBM copy of
    q/k/v and the output — which the [BH, N, D] kernel layout costs
    (measured ~30 GB of copy/pad/transpose traffic per 20-step 512px
    sampling call). MXU cost is unchanged: the contraction/output dims are
    the same head_dim the padded layout runs.

    STATUS (measured on v5e, 2026-08-17): numerically correct (interpret
    parity tests below) but does NOT compile at SD level-0 shapes — Mosaic
    stack-allocates the unrolled per-head slice relayouts and overflows
    the 16MB scoped-VMEM limit (26.2M at block_q=512, 21.8M at 256, i.e.
    the K/V head-slice buffers dominate, not the score matrix). Kept as an
    opt-in (IRET_ATTN_PACKED=1) research path; the shipping kernel is the
    [BH, N, D] layout above."""
    outs = []
    for h in range(heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh = q_ref[0][:, sl] * jnp.asarray(scale, q_ref.dtype)
        s = jax.lax.dot_general(
            qh, k_ref[0][:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [block_q, Nkp] fp32
        nkp = s.shape[-1]
        if kv_len < nkp:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m).astype(v_ref.dtype)
        l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p, v_ref[0][:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append((o * pl.reciprocal(l, approx=False)).astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=-1)


def pallas_attention_packed(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, heads: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused attention on projection-layout tensors: q [B, Nq, H*D],
    k/v [B, Nk, H*D] -> [B, Nq, H*D]. No host-side transposes or pads."""
    b, nq, hd = q.shape
    nk = k.shape[1]
    d = hd // heads
    scale = 1.0 / (d**0.5)

    nkp = _round_up(nk, 8)
    block_q = _pick_block_q(nq, _round_up(nk, _LANE), _round_up(d, _LANE))
    nqp = _round_up(nq, block_q)
    qp = jnp.pad(q, ((0, 0), (0, nqp - nq), (0, 0))) if nqp != nq else q
    kp = jnp.pad(k, ((0, 0), (0, nkp - nk), (0, 0))) if nkp != nk else k
    vp = jnp.pad(v, ((0, 0), (0, nkp - nk), (0, 0))) if nkp != nk else v

    grid = (b, nqp // block_q)
    out = pl.pallas_call(
        functools.partial(
            _packed_attention_kernel, heads=heads, head_dim=d, kv_len=nk,
            scale=scale,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkp, hd), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkp, hd), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, hd), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, nqp, hd), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * nqp * _round_up(nk, _LANE) * heads * _round_up(d, _LANE),
            bytes_accessed=(qp.size + kp.size + vp.size) * q.dtype.itemsize,
            transcendentals=b * heads * nqp * nk,
        ),
    )(qp, kp, vp)
    return out[:, :nq] if nqp != nq else out


def pallas_attention_packed_grid(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, heads: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Packed-layout fused attention, head split via the grid.

    Same contract as pallas_attention_packed (q [B, Nq, H*D] -> o same),
    but the per-head slicing happens in the BlockSpec index maps: grid
    (B, H, q-blocks) with lane-dim blocks of head_dim, so each cell sees
    clean [block, D] operands and VMEM stays small (no unrolled per-head
    buffers). The cost moved to the DMA: q/k/v/o move as D-lane-wide
    strided slices of the [.., H*D] arrays instead of one dense stream."""
    b, nq, hd = q.shape
    nk = k.shape[1]
    d = hd // heads
    scale = 1.0 / (d**0.5)

    nkp = _round_up(nk, 8)
    block_q = _pick_block_q(nq, _round_up(nk, _LANE), _round_up(d, _LANE))
    nqp = _round_up(nq, block_q)
    qp = jnp.pad(q, ((0, 0), (0, nqp - nq), (0, 0))) if nqp != nq else q
    kp = jnp.pad(k, ((0, 0), (0, nkp - nk), (0, 0))) if nkp != nk else k
    vp = jnp.pad(v, ((0, 0), (0, nkp - nk), (0, 0))) if nkp != nk else v

    def kernel(q_ref, k_ref, v_ref, o_ref):
        s = jax.lax.dot_general(
            q_ref[0] * jnp.asarray(scale, q_ref.dtype), k_ref[0],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
        if nk < nkp:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < nk, s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m).astype(v_ref.dtype)
        l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p, v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0] = (o * pl.reciprocal(l, approx=False)).astype(o_ref.dtype)

    grid = (b, heads, nqp // block_q)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, h, i: (b, i, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkp, d), lambda b, h, i: (b, 0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkp, d), lambda b, h, i: (b, 0, h),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, h, i: (b, i, h),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nqp, hd), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * nqp * _round_up(nk, _LANE) * heads * _round_up(d, _LANE),
            bytes_accessed=(qp.size + kp.size + vp.size) * q.dtype.itemsize,
            transcendentals=b * heads * nqp * nk,
        ),
    )(qp, kp, vp)
    return out[:, :nq] if nqp != nq else out


def _flash_attention_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                            *, kv_len: int, block_k: int, n_chunks: int):
    """Flash-style online-softmax chunk step for one (bh, q_block).

    The single-pass kernel above is VPU-bound at Nk=4096: each softmax
    statistic is a pass over the full [block_q, Nk] score matrix while the
    MXU waits. Here KV is chunked along the (sequential) innermost grid dim
    and softmax runs per [block_q, block_k] tile with running (m, l, acc)
    scratch carried across chunks — Mosaic software-pipelines consecutive
    grid cells, overlapping chunk j's VPU softmax with chunk j+1's MXU
    matmuls. Standard online-softmax rescale (exp(m_prev - m_new)) keeps
    the result exact."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [block_q, block_k] fp32
    if kv_len % block_k:  # mask padded KV columns (static: no-op when aligned)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
        s = jnp.where(col < kv_len, s, -jnp.inf)
    m_prev = m_scr[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_scr[:, :1] = l_scr[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:, :1] = m_new

    @pl.when(j == n_chunks - 1)
    def _finish():
        o_ref[0] = (
            acc_scr[:] * pl.reciprocal(l_scr[:, :1], approx=False)
        ).astype(o_ref.dtype)


def _pallas_flash_bhnd(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Flash-chunked attention on [BH, N, D]; exact, for large Nk."""
    bh, nq, d = q.shape
    nk = k.shape[1]
    scale = 1.0 / (d**0.5)

    dp = _round_up(d, _LANE)
    block_q = int(os.environ.get("IRET_FLASH_BLOCK_Q", "512"))
    block_q = min(block_q, _round_up(nq, 8))
    block_k = int(os.environ.get("IRET_FLASH_BLOCK_K", "1024"))
    block_k = min(block_k, _round_up(nk, _LANE))
    nqp = _round_up(nq, block_q)
    nkp = _round_up(nk, block_k)
    n_chunks = nkp // block_k

    qp = jnp.pad((q * jnp.asarray(scale, q.dtype)),
                 ((0, 0), (0, nqp - nq), (0, dp - d)))
    kp = jnp.pad(k, ((0, 0), (0, nkp - nk), (0, dp - d)))
    vp = jnp.pad(v, ((0, 0), (0, nkp - nk), (0, dp - d)))

    grid = (bh, nqp // block_q, n_chunks)
    out = pl.pallas_call(
        functools.partial(_flash_attention_kernel, kv_len=nk,
                          block_k=block_k, n_chunks=n_chunks),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dp), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dp), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, dp), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, nqp, dp), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANE), jnp.float32),  # running max
            pltpu.VMEM((block_q, _LANE), jnp.float32),  # running sum
            pltpu.VMEM((block_q, dp), jnp.float32),     # output accumulator
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * nqp * nkp * dp,
            bytes_accessed=(qp.size + kp.size + vp.size) * q.dtype.itemsize,
            transcendentals=bh * nqp * nkp,
        ),
    )(qp, kp, vp)
    return out[:, :nq, :d]


def pallas_flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Flash-chunked attention, [B, N, H, D] layout."""
    b, nq, h, d = q.shape
    nk = k.shape[1]
    qt = q.transpose(0, 2, 1, 3).reshape(b * h, nq, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * h, nk, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * h, nk, d)
    out = _pallas_flash_bhnd(qt, kt, vt, interpret=interpret)
    return out.reshape(b, h, nq, d).transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# Int8 attention (serving-only, part of the IRET_QUANT=int8 path)
#
# At the N=4096/d=40 level-0 sites the op is MXU-PADDING-bound, not only
# softmax-bound: the QK^T contraction depth (40) and the PV output width
# (40) each use 40/128 of the systolic array, so the padded MXU time is
# ~3.2x the logical FLOP time (~7ms bf16 per site at CFG batch 16 — right
# at XLA's measured 8.5ms). Quantizing Q/K to s8 halves the QK^T pass (v5e
# int8 MXU rate ~1.55x measured), and the kernel below removes the VPU sum
# pass by augmenting V with a ones column (the row sum rides the PV matmul
# in the padding lanes for free) and normalizes after PV ([block_q, 128]
# instead of [block_q, Nk]).
#
# Numerics (SageAttention-style): K is smoothed by subtracting its
# per-(bh, channel) token mean before quantization — q_i . k_mean is
# constant along each score row, so softmax is invariant, and it removes
# the channel outliers that dominate per-tensor K scales. Quantization is
# dynamic per-tensor symmetric s8 with the 1/sqrt(d) scale folded into Q
# before quantization. P and V stay bf16 for the PV matmul.
# ---------------------------------------------------------------------------


def _smooth_quantize_qk(q: jnp.ndarray, k: jnp.ndarray):
    """[BH, N, D] bf16 -> (q_s8, k_s8, scale_f32). Q arrives pre-scaled."""
    kf = k.astype(jnp.float32)
    kf = kf - jnp.mean(kf, axis=1, keepdims=True)  # softmax-invariant smooth
    qf = q.astype(jnp.float32)
    sq = jnp.maximum(jnp.max(jnp.abs(qf)) / 127.0, 1e-8)
    sk = jnp.maximum(jnp.max(jnp.abs(kf)) / 127.0, 1e-8)
    q8 = jnp.clip(jnp.round(qf / sq), -127, 127).astype(jnp.int8)
    k8 = jnp.clip(jnp.round(kf / sk), -127, 127).astype(jnp.int8)
    return q8, k8, (sq * sk).astype(jnp.float32)


def _int8_attention_kernel(q_ref, k_ref, v_ref, s_ref, o_ref, *,
                           kv_len: int, block_k: int, head_dim: int):
    """One Q block vs all K/V for one (batch*head), KV chunked IN-CELL.

    q: [block_q, Dp] s8 (pre-scaled by 1/sqrt(d), quantized)
    k: [Nkp, Dp] s8, v: [Nkp, Dp] bf16 with v[:, head_dim] == 1 (ones
       column: the row sum of P rides the PV matmul on the MXU)
    s: [1, 1] f32 in SMEM — sq * sk dequant scale

    The KV loop is a Python-unrolled in-cell loop (not a grid dim): chunk
    j+1's MXU matmuls carry no dependence on chunk j's VPU softmax tail,
    giving Mosaic's scheduler the chance to overlap them — the grid-dim
    flash variant above measured zero overlap across cells. Online-softmax
    rescale touches only the [block_q, Dp] accumulator, never an Nk-wide
    tensor; the VPU work per element is one max-compare and one exp."""
    # exp via exp2 with log2(e) folded into the dequant scale: saves one
    # full VPU pass over every score block (the softmax is invariant — the
    # same ones-column row sum normalizes in the exp2 domain).
    scale2 = s_ref[0, 0] * 1.4426950408889634
    nkp = k_ref.shape[1]
    n_chunks = nkp // block_k

    def qk(j):
        return jax.lax.dot_general(
            q_ref[0], k_ref[0, j * block_k:(j + 1) * block_k],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [block_q, block_k] int32

    # Software pipeline: chunk j+1's QK matmul is ISSUED before chunk j's
    # softmax tail, hoping the MXU crunches the next score block while the
    # VPU does the current block's convert/max/exp2. MEASURED RESULT
    # (v5e, N=4096/d=40/CFG-16): no effect — 9.76ms pipelined vs 9.67ms
    # naive order; Mosaic/TPU gives no MXU/VPU overlap within a kernel
    # (consistent with the flash-chunked and in-cell-chunk negatives in
    # docs/STATUS.md). Kept because it costs nothing and the exp2 fold
    # below is a real (small) VPU saving. XLA's own attention lowering at
    # these shapes is a single mega-fusion (QK + softmax + PV-as-dilated-
    # conv epilogue) running at the padded bf16 MXU floor (~7ms per site
    # end-to-end), which no kernel formulation here has beaten.
    s32_next = qk(0)
    m = None
    acc = None
    for j in range(n_chunks):
        s32 = s32_next
        if j + 1 < n_chunks:
            s32_next = qk(j + 1)  # MXU issue before this chunk's VPU work
        s = s32.astype(jnp.float32) * scale2
        lo = j * block_k
        if kv_len < lo + block_k:  # mask zero-padded K columns (static)
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + lo
            s = jnp.where(col < kv_len, s, -jnp.inf)
        m_c = jnp.max(s, axis=-1, keepdims=True)
        if m is None:
            m_new = m_c
            p = jnp.exp2(s - m_new)
            acc = jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0, lo:lo + block_k],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            m_new = jnp.maximum(m, m_c)
            alpha = jnp.exp2(m - m_new)
            p = jnp.exp2(s - m_new)
            pv = jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0, lo:lo + block_k],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = acc * alpha + pv
        m = m_new
    l = acc[:, head_dim:head_dim + 1]  # ones-column row sum
    o_ref[0] = (acc * pl.reciprocal(l, approx=False)).astype(o_ref.dtype)


def _pallas_int8_bhnd(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Int8-QK fused attention on [BH, N, D]; serving-only."""
    bh, nq, d = q.shape
    nk = k.shape[1]
    scale = 1.0 / (d**0.5)

    dp = _round_up(d + 1, _LANE)  # +1: ones column for the row sum
    block_q = _pick_block_q(nq, _round_up(nk, _LANE), dp)
    nqp = _round_up(nq, block_q)
    block_k = min(int(os.environ.get("IRET_ATTN_INT8_CHUNK", "1024")),
                  _round_up(nk, _LANE))
    nkp = _round_up(nk, block_k)

    q8, k8, s_qk = _smooth_quantize_qk(q * jnp.asarray(scale, q.dtype), k)
    qp = jnp.pad(q8, ((0, 0), (0, nqp - nq), (0, dp - d)))
    kp = jnp.pad(k8, ((0, 0), (0, nkp - nk), (0, dp - d)))
    vp = jnp.pad(v, ((0, 0), (0, nkp - nk), (0, dp - d)))
    ones_col = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, dp), 2) == d)
    vp = jnp.where(ones_col, jnp.ones((), vp.dtype), vp)
    # zero-padded KV rows must not contribute to the row sum: unmask only
    # real rows (the -inf score mask above handles them when block-unaligned)
    if nkp > nk:
        row = jax.lax.broadcasted_iota(jnp.int32, (1, nkp, 1), 1)
        vp = jnp.where(row < nk, vp, jnp.zeros((), vp.dtype))

    grid = (bh, nqp // block_q)
    out = pl.pallas_call(
        functools.partial(_int8_attention_kernel, kv_len=nk,
                          block_k=block_k, head_dim=d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkp, dp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkp, dp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, dp), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, nqp, dp), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * nqp * nkp * dp,
            bytes_accessed=(qp.size + kp.size + 2 * vp.size),
            transcendentals=bh * nqp * nkp,
        ),
    )(qp, kp, vp, s_qk.reshape(1, 1))
    return out[:, :nq, :d]


def pallas_int8_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Int8-QK fused attention, [B, N, H, D] layout (serving-only)."""
    b, nq, h, d = q.shape
    nk = k.shape[1]
    qt = q.transpose(0, 2, 1, 3).reshape(b * h, nq, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * h, nk, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * h, nk, d)
    out = _pallas_int8_bhnd(qt, kt, vt, interpret=interpret)
    return out.reshape(b, h, nq, d).transpose(0, 2, 1, 3)


def xla_attention_int8_pv(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray
) -> jnp.ndarray:
    """Fully-quantized XLA attention: s8 QK^T AND s8 PV. [B, N, H, D].

    Why: at the N=4096/d=40 level-0 sites the op sits at the PADDED-MXU
    floor (~7ms/site at CFG batch 16) — the d=40 contraction of QK^T and
    the d=40 output width of PV each use 40/128 of the systolic array, and
    XLA's mega-fusion already hides the softmax VPU work under the MXU
    (every Pallas formulation lost because Mosaic gives no MXU/VPU
    overlap, docs/STATUS.md). Quantizing BOTH matmuls to s8 (v5e int8 MXU
    ~2x bf16) is the only remaining way to shrink the padded MXU time
    while leaving the overlap to XLA's scheduler.

    Numerics (SageAttention-style, serving-only, quality-gated by
    scripts/eval_quant_quality.py):
    - Q/K: dynamic per-tensor s8 with K token-mean smoothing
      (softmax-invariant — see _smooth_quantize_qk).
    - P: after the exact fp32 max-shift, exp(s - m) lies in (0, 1] with
      the row max EXACTLY 1, so a fixed scale of 127 is per-row optimal:
      p8 = round(p * 127), no clip needed.
    - V: per-(batch*head, channel) s8 scales (free — dequant is a
      per-output-column multiply).
    - Normalization: V gets a constant 127-valued ones column, so the
      PV matmul's padding lanes carry 127 * sum(p8) — the row sum of the
      SAME quantized p8, so first-order P-rounding error cancels in the
      divide (the trick the Pallas int8 kernel uses). No VPU sum pass.
      The row sum can't be 0: the max element quantizes to exactly 127.
    """
    b, nq, h, d = q.shape
    nk = k.shape[1]
    scale = 1.0 / (d**0.5)
    qt = (q * jnp.asarray(scale, q.dtype)).transpose(0, 2, 1, 3).reshape(b * h, nq, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * h, nk, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * h, nk, d)
    q8, k8, s_qk = _smooth_quantize_qk(qt, kt)
    s32 = jax.lax.dot_general(
        q8, k8, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.int32
    )  # [BH, Nq, Nk]
    s = s32.astype(jnp.float32) * s_qk
    m = jnp.max(s, axis=-1, keepdims=True)
    p8 = jnp.round(jnp.exp(s - m) * 127.0).astype(jnp.int8)
    vf = vt.astype(jnp.float32)
    sv = jnp.maximum(jnp.max(jnp.abs(vf), axis=1, keepdims=True), 1e-8) / 127.0
    v8 = jnp.clip(jnp.round(vf / sv), -127, 127).astype(jnp.int8)
    ones = jnp.full((b * h, nk, 1), 127, jnp.int8)
    v8e = jnp.concatenate([v8, ones], axis=-1)
    o32 = jax.lax.dot_general(
        p8, v8e, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.int32
    )  # [BH, Nq, D+1]
    l = o32[..., d:].astype(jnp.float32)  # = 127 * sum_j p8
    o = o32[..., :d].astype(jnp.float32) * (sv * 127.0) / l
    return o.reshape(b, h, nq, d).transpose(0, 2, 1, 3).astype(q.dtype)


def xla_attention_int8(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """XLA attention with s8 QK^T: halves the dominant (padding-bound) QK
    matmul while keeping XLA's pattern-matched softmax lowering intact
    (the bf16-scores experiment showed hand-rolled softmax loses more than
    it saves). [B, N, H, D] layout."""
    b, nq, h, d = q.shape
    scale = 1.0 / (d**0.5)
    qt = (q * jnp.asarray(scale, q.dtype)).transpose(0, 2, 1, 3).reshape(b * h, nq, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * h, k.shape[1], d)
    q8, k8, s_qk = _smooth_quantize_qk(qt, kt)
    s32 = jax.lax.dot_general(
        q8, k8, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.int32
    )  # [BH, Nq, Nk]
    p = jax.nn.softmax(s32.astype(jnp.float32) * s_qk, axis=-1)
    vt = v.transpose(0, 2, 1, 3).reshape(b * h, k.shape[1], d)
    o = jax.lax.dot_general(
        p.astype(v.dtype), vt, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return o.reshape(b, h, nq, d).transpose(0, 2, 1, 3).astype(q.dtype)


def pallas_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Fused attention, [B, N, H, D] layout."""
    b, nq, h, d = q.shape
    nk = k.shape[1]
    qt = q.transpose(0, 2, 1, 3).reshape(b * h, nq, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * h, nk, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * h, nk, d)
    out = _pallas_attention_bhnd(qt, kt, vt, interpret=interpret)
    return out.reshape(b, h, nq, d).transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# Dispatch + custom VJP
# ---------------------------------------------------------------------------


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


@jax.custom_vjp
def _attention_tpu(q, k, v):
    return pallas_attention(q, k, v)


def _attention_tpu_fwd(q, k, v):
    return pallas_attention(q, k, v), (q, k, v)


def _attention_tpu_bwd(res, g):
    # Recompute-based backward through the XLA path: O(N*D) residual memory.
    q, k, v = res
    _, vjp = jax.vjp(xla_attention, q, k, v)
    return vjp(g)


_attention_tpu.defvjp(_attention_tpu_fwd, _attention_tpu_bwd)


def _packed_call(q, k, v, interpret=False, variant="grid"):
    b, nq, h, d = q.shape
    nk = k.shape[1]
    impl = (
        pallas_attention_packed_grid if variant == "grid"
        else pallas_attention_packed
    )
    out = impl(
        q.reshape(b, nq, h * d), k.reshape(b, nk, h * d),
        v.reshape(b, nk, h * d), heads=h, interpret=interpret,
    )
    return out.reshape(b, nq, h, d)


@jax.custom_vjp
def _attention_tpu_packed(q, k, v):
    return _packed_call(q, k, v)


def _attention_tpu_packed_fwd(q, k, v):
    return _packed_call(q, k, v), (q, k, v)


_attention_tpu_packed.defvjp(_attention_tpu_packed_fwd, _attention_tpu_bwd)


@jax.custom_vjp
def _attention_tpu_flash(q, k, v):
    return pallas_flash_attention(q, k, v)


def _attention_tpu_flash_fwd(q, k, v):
    return pallas_flash_attention(q, k, v), (q, k, v)


_attention_tpu_flash.defvjp(_attention_tpu_flash_fwd, _attention_tpu_bwd)


@jax.custom_vjp
def _attention_tpu_int8(q, k, v):
    return pallas_int8_attention(q, k, v)


def _attention_tpu_int8_fwd(q, k, v):
    return pallas_int8_attention(q, k, v), (q, k, v)


_attention_tpu_int8.defvjp(_attention_tpu_int8_fwd, _attention_tpu_bwd)


# The xla int8 variants are serving-only approximations; round() has zero
# gradient, so differentiate through the exact XLA path instead of
# silently returning zeros.
@jax.custom_vjp
def _attention_xla_int8(q, k, v):
    return xla_attention_int8(q, k, v)


def _attention_xla_int8_fwd(q, k, v):
    return xla_attention_int8(q, k, v), (q, k, v)


_attention_xla_int8.defvjp(_attention_xla_int8_fwd, _attention_tpu_bwd)


@jax.custom_vjp
def _attention_xla_int8_pv(q, k, v):
    return xla_attention_int8_pv(q, k, v)


def _attention_xla_int8_pv_fwd(q, k, v):
    return xla_attention_int8_pv(q, k, v), (q, k, v)


_attention_xla_int8_pv.defvjp(_attention_xla_int8_pv_fwd, _attention_tpu_bwd)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    backend: Optional[str] = None,
) -> jnp.ndarray:
    """Multi-head attention, [B, N, H, D]. backend: None|"pallas"|"xla".

    None selects the Pallas kernel on TPU for large sequence lengths (where
    it beats XLA; measured on v5e the crossover is ~2k query tokens, tunable
    via IRET_ATTN_PALLAS_MIN) and the XLA path elsewhere.
    """
    if backend is None:
        # The pallas kernel wins only in a WINDOW of sequence lengths,
        # measured end-to-end on v5e (512px/20-step loop, batch 8):
        #   pallas N>=2048 everywhere: 2.746 img/s
        #   pallas N>=1024 everywhere: 2.818
        #   XLA everywhere:            3.110
        #   pallas only N in [1024, 2048], XLA elsewhere: 3.202  <- default
        # Below 1024 and at/above 4096 XLA's materialized-softmax attention
        # is faster: the kernel is VPU-bound on score-matrix passes at
        # large Nk (isolated: 11.9ms vs XLA 8.7ms at N=4096, CFG batch 16,
        # scripts/bench_attn.py), and at tiny N the score tensor is cheap
        # enough that fusion-friendliness wins.
        min_n = int(os.environ.get("IRET_ATTN_PALLAS_MIN", "1024"))
        max_n = int(os.environ.get("IRET_ATTN_PALLAS_MAX_N", "2048"))
        # Very wide heads (VAE mid block: 1 head, d=512) keep 2x 4MB K/V
        # blocks resident and overflow Mosaic's 16MB scoped VMEM once the
        # grid grows past ~8 batch elements; XLA costs ~0.2% there.
        max_d = int(os.environ.get("IRET_ATTN_PALLAS_MAX_D", "384"))
        # Above the single-pass window the flash-chunked kernel can take
        # over (KV chunks + online softmax overlap MXU/VPU; see
        # _flash_attention_kernel). 0 disables; default off until the
        # v5e A/B lands (scripts/bench_attn.py).
        flash_min = int(os.environ.get("IRET_ATTN_FLASH_MIN", "0"))
        # Quantized XLA attention for the largest self-attention sites
        # (serving-only; read at trace time like every IRET_* knob).
        # Requires BOTH nq and nk >= the threshold so 77-token
        # cross-attention never takes it.
        x8_min = int(os.environ.get("IRET_ATTN_XLA_INT8_MIN", "0"))
        if (_on_tpu() and x8_min > 0 and q.shape[1] >= x8_min
                and k.shape[1] >= x8_min):
            backend = (
                "xla_int8_pv"
                if os.environ.get("IRET_ATTN_XLA_INT8_PV", "1") == "1"
                else "xla_int8"
            )
        elif (_on_tpu() and flash_min > 0 and q.shape[1] >= flash_min
                and q.shape[-1] <= max_d):
            backend = "flash"
        elif (_on_tpu() and min_n <= q.shape[1] <= max_n
                and q.shape[-1] <= max_d):
            backend = (
                "pallas_packed" if os.environ.get("IRET_ATTN_PACKED") == "1"
                else "pallas"
            )
        else:
            backend = "xla"
    if backend == "flash":
        return _attention_tpu_flash(q, k, v)
    if backend == "flash_interpret":  # tests
        return pallas_flash_attention(q, k, v, interpret=True)
    if backend == "int8":
        return _attention_tpu_int8(q, k, v)
    if backend == "int8_interpret":  # tests
        return pallas_int8_attention(q, k, v, interpret=True)
    if backend == "xla_int8":
        return _attention_xla_int8(q, k, v)
    if backend == "xla_int8_pv":
        return _attention_xla_int8_pv(q, k, v)
    if backend == "pallas":
        return _attention_tpu(q, k, v)
    if backend == "pallas_packed":
        return _attention_tpu_packed(q, k, v)
    if backend == "xla":
        return xla_attention(q, k, v)
    if backend == "pallas_interpret":  # tests
        return pallas_attention(q, k, v, interpret=True)
    if backend == "pallas_packed_interpret":  # tests
        return _packed_call(q, k, v, interpret=True)
    raise ValueError(f"Unknown attention backend: {backend}")
