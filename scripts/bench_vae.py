#!/usr/bin/env python3
"""Isolate where VAE encode/decode time goes on the TPU.

The 512px profile shows VAE enc+dec ~286ms per batch-4 while the conv
roofline is ~3-4x lower; this ablates the suspects: the mid-block
attention backend, the GroupNorms, and per-resolution decoder stages.
Relay-safe: timings close with a host scalar fetch; params are jit
arguments (closure capture would embed them as constants)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import flax.linen as nn

from image_restoration_and_enhancement_tpu import config as C
from image_restoration_and_enhancement_tpu.models.vae import AutoencoderKL
from image_restoration_and_enhancement_tpu.models.layers import ResnetBlock2D


def timeit(fn, params, x, iters=8):
    out = fn(params, x)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    y = x
    for _ in range(iters):
        y = fn(params, y)
    _ = float(jnp.sum(y.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    batch = int(os.environ.get("PROF_BATCH", "8"))
    size = int(os.environ.get("PROF_SIZE", "512"))
    lat = size // 8
    dt_ = jnp.bfloat16

    vae = AutoencoderKL(C.SD15.vae, dtype=dt_)
    params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
    params = jax.tree.map(lambda x: x.astype(dt_), params)

    @jax.jit
    def dec(p, z):
        img = vae.apply({"params": p}, z, method=vae.decode)
        return jnp.zeros_like(z) + jnp.mean(img).astype(z.dtype)

    z = jnp.zeros((batch, lat, lat, 4), dt_)
    print(f"VAE decode ({batch}x{lat}->{size}):  {timeit(dec, params, z)*1e3:8.2f} ms")

    @jax.jit
    def enc(p, img):
        d = vae.apply({"params": p}, img, method=vae.encode)
        return jnp.zeros_like(img) + jnp.mean(d.mean).astype(img.dtype)

    img = jnp.zeros((batch, size, size, 3), dt_)
    print(f"VAE encode ({batch}x{size}):         {timeit(enc, params, img)*1e3:8.2f} ms")

    # --- single resnet block at each decoder resolution ------------------
    for res, ch in [(lat, 512), (lat * 2, 512), (lat * 4, 256), (size, 128)]:
        blk = ResnetBlock2D(ch, groups=32, eps=1e-6, use_time_emb=False, dtype=dt_)
        p = blk.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, ch)))["params"]
        p = jax.tree.map(lambda x: x.astype(dt_), p)

        @jax.jit
        def blk_fwd(p_, x, blk=blk):
            return blk.apply({"params": p_}, x)

        x = jnp.zeros((batch, res, res, ch), dt_)
        t = timeit(blk_fwd, p, x)
        flops = 2 * 2 * batch * res * res * 9 * ch * ch  # 2 convs 3x3xCxC
        print(f"resnet {res:4d}px c{ch:4d}:            {t*1e3:8.2f} ms"
              f"  ~{flops/t/1e12:5.1f} TFLOP/s")

    # --- bare conv at the two hottest decoder resolutions ----------------
    for res, ch in [(size, 128), (lat * 4, 256)]:
        conv = nn.Conv(ch, (3, 3), padding=1, dtype=dt_)
        p = conv.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, ch)))["params"]
        p = jax.tree.map(lambda x: x.astype(dt_), p)

        @jax.jit
        def conv_fwd(p_, x, conv=conv):
            return conv.apply({"params": p_}, x)

        x = jnp.zeros((batch, res, res, ch), dt_)
        t = timeit(conv_fwd, p, x)
        flops = 2 * batch * res * res * 9 * ch * ch
        print(f"conv3x3 {res:4d}px c{ch:4d}:           {t*1e3:8.2f} ms"
              f"  ~{flops/t/1e12:5.1f} TFLOP/s")

    # --- GN alone at the hottest resolution -------------------------------
    gn = nn.GroupNorm(32, epsilon=1e-6, dtype=dt_)
    p = gn.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 128)))["params"]

    @jax.jit
    def gn_fwd(p_, x):
        return gn.apply({"params": p_}, x)

    x = jnp.zeros((batch, size, size, 128), dt_)
    t = timeit(gn_fwd, p, x)
    gb = 2 * batch * size * size * 128 * 2 / 1e9
    print(f"groupnorm {size}px c128:           {t*1e3:8.2f} ms"
          f"  ~{gb/t:5.0f} GB/s eff")


if __name__ == "__main__":
    main()
