"""Token merging (ToMe) for the UNet's large self-attention sites.

Serving-side approximation after "Token Merging for Fast Stable Diffusion"
(Bolya & Hoffman, 2023): before a self-attention op over N spatial tokens,
merge the r most-redundant tokens into their nearest neighbours (bipartite
soft matching against a strided destination grid), run attention over the
N - r survivors, then unmerge by copying each destination's output back to
the tokens that merged into it. Everything is static-shaped and jittable:
the token COUNT after merging is fixed at trace time; *which* tokens merge
is data-dependent (argsort of cosine similarities) and costs one small
matmul + sort + gathers/scatters per site.

Why it pays on this workload (see docs/STATUS.md perf profile): the five
N=4096 self-attention sites are the top block of the 512px serving program
(~35% of device time) and sit at their exact-math floor — both the XLA and
Pallas backends are bound by softmax work that scales with N^2. Merging
50% of tokens lands the op at N=2048, which quarters the score/softmax
work AND falls inside the measured Pallas fast window [1024, 2048]
(ops/attention.py dispatch).

This is an OPT-IN approximate mode exactly like the CFG-cache turbo path
(core/sampling.py cfg_cache_interval): default off, enabled per-trace via
`tome_mode()` / `set_tome()` or the IRET_TOME env var, quality-gated by
scripts/eval_quant_quality.py --tome before serving with it. Applied to
self-attention only (cross-attention and the feed-forward stay exact, the
ToMe-SD default), and only at sites with N >= IRET_TOME_MIN (default 4096
= the 64x64-latent level-0 blocks at 512px; smaller sites are cheap and
quality-sensitive).

The reference has no analog (exact torch SDPA end to end); this is a
beyond-reference serving feature. Reference hot path for scale:
/root/reference/src/inference.py:486-494 (20-step img2img serving loop).
"""
from __future__ import annotations

import contextlib
import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_TOME_OVERRIDE: Optional[float] = None


def current_ratio() -> float:
    """Fraction of tokens to merge at eligible self-attention sites.

    0.0 (default) disables merging. Resolution order: the set_tome()/
    tome_mode() override, then the IRET_TOME env var."""
    if _TOME_OVERRIDE is not None:
        return _TOME_OVERRIDE
    try:
        return float(os.environ.get("IRET_TOME", "0") or 0.0)
    except ValueError:
        return 0.0


def min_tokens() -> int:
    return int(os.environ.get("IRET_TOME_MIN", "4096"))


def set_tome(ratio: Optional[float]):
    """Set the merge ratio persistently for functions traced afterwards.
    None falls back to the IRET_TOME env var; 0.0 forces off."""
    global _TOME_OVERRIDE
    _TOME_OVERRIDE = ratio


@contextlib.contextmanager
def tome_mode(ratio: Optional[float]):
    """Set the merge ratio for functions TRACED inside the context
    (already-jitted functions keep the ratio they were traced with)."""
    global _TOME_OVERRIDE
    prev = _TOME_OVERRIDE
    _TOME_OVERRIDE = 0.0 if ratio is None else ratio
    try:
        yield
    finally:
        _TOME_OVERRIDE = prev


def plan(h: int, w: int, sx: int = 2, sy: int = 2) -> Tuple[np.ndarray, np.ndarray]:
    """Static bipartite split of the h*w token grid: one destination token
    per sy x sx tile (top-left), the rest are merge sources. Returns
    (dst_idx [Nd], src_idx [Ns]) flat row-major indices."""
    ii, jj = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    is_dst = ((ii % sy) == 0) & ((jj % sx) == 0)
    idx = np.arange(h * w).reshape(h, w)
    return idx[is_dst].astype(np.int32), idx[~is_dst].astype(np.int32)


def merge_count(h: int, w: int, ratio: float, sx: int = 2, sy: int = 2) -> int:
    """Number of tokens merged away: ratio*N, capped at the source-set size
    (only source tokens can merge) and floored at 0. Static."""
    n = h * w
    ns = n - (-(-h // sy)) * (-(-w // sx))  # n - ceil(h/sy)*ceil(w/sx)
    return max(0, min(int(n * ratio), ns))


def build_merge(
    metric: jnp.ndarray, h: int, w: int, r: int, sx: int = 2, sy: int = 2
) -> Tuple[Callable, Callable, int]:
    """Build (merge, unmerge) closures from a similarity metric.

    metric: [B, N, C] token features the matching is computed on (ToMe-SD
    uses the transformer-block input). merge(x: [B,N,C]) -> [B, N-r, C]
    with merged destinations replaced by the fp32 mean of their group;
    unmerge(y: [B,N-r,C]) -> [B,N,C] copies each destination's row back to
    every token that merged into it. Token order after merge is
    [destinations (Nd), unmerged sources (Ns-r)] — attention is permutation
    -equivariant so the order only needs to be consistent between the two
    closures."""
    b, n, c = metric.shape
    assert n == h * w, (n, h, w)
    dst_idx, src_idx = plan(h, w, sx, sy)
    nd, ns = len(dst_idx), len(src_idx)
    r = max(0, min(int(r), ns))
    if r == 0:
        ident = lambda x: x
        return ident, ident, n

    # TPU shape note: everything below avoids batched SCATTERS (slow,
    # HBM-serialized on TPU). The destination accumulate is a one-hot
    # matmul (MXU), and unmerge is ONE inverse-permutation gather; the
    # only scatters left are on tiny int32 [B, Ns] index maps. The
    # similarity einsum runs in the input dtype (bf16 in serving) with
    # fp32 accumulation — ranking needs no more.
    mn = metric.astype(jnp.float32)
    mn = mn / (jnp.linalg.norm(mn, axis=-1, keepdims=True) + 1e-6)
    mn = mn.astype(metric.dtype)
    scores = jnp.einsum(
        "bsc,bdc->bsd", mn[:, src_idx], mn[:, dst_idx],
        preferred_element_type=jnp.float32,
    )
    node_max = jnp.max(scores, axis=-1)                       # [B, Ns]
    node_dst = jnp.argmax(scores, axis=-1).astype(jnp.int32)  # [B, Ns]
    order = jnp.argsort(-node_max, axis=-1).astype(jnp.int32)
    merged_pos = order[:, :r]       # positions into the src list
    unm_pos = order[:, r:]          # [B, Ns-r]
    dst_of_merged = jnp.take_along_axis(node_dst, merged_pos, axis=1)  # [B, r]

    bidx = jnp.arange(b)[:, None]
    # row index into the merged output for every ORIGINAL token: dst token
    # k -> row k; unmerged source i -> row nd+i; merged source -> its
    # destination's row. Built with two tiny int32 scatters + a static
    # permutation, consumed by one big gather in unmerge().
    src_rows = jnp.zeros((b, ns), jnp.int32)
    src_rows = src_rows.at[bidx, unm_pos].set(
        nd + jnp.arange(ns - r, dtype=jnp.int32)[None]
    )
    src_rows = src_rows.at[bidx, merged_pos].set(dst_of_merged)
    row_of_token = jnp.zeros((b, n), jnp.int32)
    row_of_token = row_of_token.at[:, dst_idx].set(
        jnp.arange(nd, dtype=jnp.int32)[None]
    )
    row_of_token = row_of_token.at[:, src_idx].set(src_rows)

    def merge(x: jnp.ndarray) -> jnp.ndarray:
        xs = x[:, src_idx]
        xd = x[:, dst_idx]
        xm = jnp.take_along_axis(xs, merged_pos[..., None], axis=1)
        xu = jnp.take_along_axis(xs, unm_pos[..., None], axis=1)
        # destination accumulate on the MXU: one-hot [B, r, Nd] @ xm
        onehot = (
            dst_of_merged[..., None] == jnp.arange(nd, dtype=jnp.int32)
        ).astype(x.dtype)
        sums = jnp.einsum(
            "brd,brc->bdc", onehot, xm, preferred_element_type=jnp.float32
        )
        cnt = 1.0 + jnp.sum(onehot.astype(jnp.float32), axis=1)  # [B, Nd]
        xd = ((xd.astype(jnp.float32) + sums) / cnt[..., None]).astype(x.dtype)
        return jnp.concatenate([xd, xu], axis=1)  # [B, Nd + Ns - r, C]

    def unmerge(y: jnp.ndarray) -> jnp.ndarray:
        return jnp.take_along_axis(y, row_of_token[..., None], axis=1)

    return merge, unmerge, n - r
