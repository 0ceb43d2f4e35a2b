#!/usr/bin/env python3
"""Micro-benchmark the attention kernel variants on the attached TPU.

Compares, at SD1.5 hot shapes (CFG batch 16, 512px latents):
  xla            — materialized-softmax XLA attention
  pallas         — shipping [BH, N, D] fused kernel (host transpose+pad)
  packed-grid    — [B, N, H*D] layout, head split via grid/BlockSpec

Relay-safe: every timing closes with a host scalar fetch.
Env: ATTN_B (16), ATTN_N (4096), ATTN_H (8), ATTN_D (40), ATTN_NK.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from image_restoration_and_enhancement_tpu.ops import attention as attn


def timeit(f, args, iters=20):
    x = f(*args)
    _ = float(jnp.mean(x.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        x = f(*args)
    _ = float(jnp.mean(x.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3


def run_case(b, n, h, d, nk):
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (b, n, h, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, nk, h, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, nk, h, d), jnp.bfloat16)

    flops = 4 * b * h * n * nk * d
    cases = {
        "xla": jax.jit(lambda q, k, v: attn.attention(q, k, v, backend="xla")),
        "pallas": jax.jit(lambda q, k, v: attn.attention(q, k, v, backend="pallas")),
        "flash": jax.jit(lambda q, k, v: attn.attention(q, k, v, backend="flash")),
        "int8": jax.jit(lambda q, k, v: attn.attention(q, k, v, backend="int8")),
        "xla_int8": jax.jit(lambda q, k, v: attn.attention(q, k, v, backend="xla_int8")),
        "xla_int8_pv": jax.jit(lambda q, k, v: attn.attention(q, k, v, backend="xla_int8_pv")),
        "packed-grid": jax.jit(
            lambda q, k, v: attn._packed_call(q, k, v, variant="grid")
        ),
    }
    for name, f in cases.items():
        try:
            ms = timeit(f, (q, k, v))
            print(f"{name:12s} {ms:8.3f} ms   {flops/ms/1e9:7.1f} TFLOP/s (logical)")
        except Exception as e:  # compile failures are findings, not crashes
            print(f"{name:12s} FAILED: {type(e).__name__}: {str(e)[:200]}")


def main():
    b = int(os.environ.get("ATTN_B", "16"))
    h = int(os.environ.get("ATTN_H", "8"))
    d = int(os.environ.get("ATTN_D", "40"))
    if os.environ.get("ATTN_SWEEP") == "1":
        # the SD1.5 512px self-attention ladder: (N, heads, head_dim)
        for (n, hh, dd) in [(4096, 8, 40), (1024, 8, 80), (256, 8, 160)]:
            print(f"--- N={n} H={hh} D={dd} CFG-batch {b} ---")
            run_case(b, n, hh, dd, n)
        return
    n = int(os.environ.get("ATTN_N", "4096"))
    nk = int(os.environ.get("ATTN_NK", str(n)))
    run_case(b, n, h, d, nk)


if __name__ == "__main__":
    main()
