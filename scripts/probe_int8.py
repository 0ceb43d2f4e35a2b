#!/usr/bin/env python3
"""Probe: does XLA hit the v5e int8 MXU rate (394 TOPS) for s8xs8 matmul
and conv? Decides the int8 serving-path design (weight+activation int8 is
only worth it if the native rate is ~2x bf16).

Relay-safe timing: every measured region closes with a host fetch.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def timeit(fn, *args, iters=20):
    fn(*args)  # compile
    _ = float(jnp.sum(fn(*args).astype(jnp.float32)))  # drain
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    results = {}
    key = jax.random.PRNGKey(0)
    # --- matmul: 8192x8192x8192 ---
    m = n = k = 8192
    a8 = jax.random.randint(key, (m, k), -127, 127, jnp.int8)
    b8 = jax.random.randint(key, (k, n), -127, 127, jnp.int8)
    abf = a8.astype(jnp.bfloat16)
    bbf = b8.astype(jnp.bfloat16)

    @jax.jit
    def mm_i8(a, b):
        return jax.lax.dot(a, b, preferred_element_type=jnp.int32)

    @jax.jit
    def mm_bf(a, b):
        return jax.lax.dot(a, b, preferred_element_type=jnp.float32)

    flops = 2 * m * n * k
    t = timeit(mm_i8, a8, b8)
    results["matmul_int8_tops"] = round(flops / t / 1e12, 1)
    print(results, flush=True)
    t = timeit(mm_bf, abf, bbf)
    results["matmul_bf16_tflops"] = round(flops / t / 1e12, 1)

    # --- conv: SD level-1 shape, 16x64x64x640 -> 640, 3x3 ---
    B, H, W, C = 16, 64, 64, 640
    x8 = jax.random.randint(key, (B, H, W, C), -127, 127, jnp.int8)
    k8 = jax.random.randint(key, (3, 3, C, C), -127, 127, jnp.int8)
    xbf = x8.astype(jnp.bfloat16)
    kbf = k8.astype(jnp.bfloat16)
    dn = jax.lax.conv_dimension_numbers(x8.shape, k8.shape, ("NHWC", "HWIO", "NHWC"))

    def conv(x, w, pt):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=pt,
        )

    conv_i8 = jax.jit(lambda x, w: conv(x, w, jnp.int32))
    conv_bf = jax.jit(lambda x, w: conv(x, w, jnp.float32))
    cflops = 2 * B * H * W * C * C * 9
    try:
        t = timeit(conv_i8, x8, k8)
        results["conv_int8_tops"] = round(cflops / t / 1e12, 1)
    except Exception as e:
        results["conv_int8_error"] = str(e)[:200]
    print(results, flush=True)
    t = timeit(conv_bf, xbf, kbf)
    results["conv_bf16_tflops"] = round(cflops / t / 1e12, 1)

    # --- mixed: int8 weights dequantized inline into a bf16 conv
    # (weight-only quant: bandwidth win only) ---
    scale = jnp.bfloat16(0.01)

    conv_wonly = jax.jit(
        lambda x, w: conv(x, (w.astype(jnp.bfloat16) * scale), jnp.float32)
    )
    t = timeit(conv_wonly, xbf, k8)
    results["conv_w8abf16_tflops"] = round(cflops / t / 1e12, 1)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
