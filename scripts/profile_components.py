#!/usr/bin/env python3
"""Honest per-component timing on the attached TPU (relay-safe: every
measurement closes with a host scalar fetch; params are passed as jit
arguments, never closed over — closure capture would embed them as
constants and force a full params fetch through the relay)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from image_restoration_and_enhancement_tpu import config as C
from image_restoration_and_enhancement_tpu.core import sampling


def timeit(fn, params, chain_arg, iters=8):
    """fn(params, chain_arg) -> array of same shape as chain_arg (chained)."""
    out = fn(params, chain_arg)
    _ = float(jnp.sum(out.astype(jnp.float32)))  # warmup + drain
    t0 = time.perf_counter()
    x = chain_arg
    for _ in range(iters):
        x = fn(params, x)
    _ = float(jnp.sum(x.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    batch = int(os.environ.get("PROF_BATCH", "4"))
    size = int(os.environ.get("PROF_SIZE", "512"))
    lat = size // 8
    attn_backend = os.environ.get("PROF_ATTN", None)

    modules = sampling.SDModules.create(
        C.SD15, dtype=jnp.bfloat16, attention_backend=attn_backend
    )
    params = sampling.init_params(modules, jax.random.PRNGKey(0), image_size=size)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    ctx = jnp.zeros((2 * batch, 77, 768), jnp.float32)
    t = jnp.zeros((2 * batch,), jnp.int32)

    @jax.jit
    def unet_fwd(p, lat_in):
        out = modules.unet.apply({"params": p["unet"]}, lat_in, t, ctx)
        return out.astype(lat_in.dtype)

    lat_in = jnp.zeros((2 * batch, lat, lat, 4), jnp.bfloat16)
    dt = timeit(unet_fwd, params, lat_in)
    tf = 2 * batch * 0.34e12 * (lat / 64) ** 2
    print(f"UNet fwd  (2x{batch}, {lat}x{lat}): {dt*1e3:8.2f} ms  "
          f"~{tf/dt/1e12:.1f} TFLOP/s")

    @jax.jit
    def vae_dec(p, z):
        img = modules.vae.apply({"params": p["vae"]}, z, method=modules.vae.decode)
        return jnp.zeros_like(z) + jnp.mean(img).astype(z.dtype)

    z = jnp.zeros((batch, lat, lat, 4), jnp.bfloat16)
    dt = timeit(vae_dec, params, z)
    print(f"VAE decode ({batch}, {lat}->{size}):   {dt*1e3:8.2f} ms")

    @jax.jit
    def vae_enc(p, img):
        d = modules.vae.apply({"params": p["vae"]}, img, method=modules.vae.encode)
        return jnp.zeros_like(img) + jnp.mean(d.mean).astype(img.dtype)

    img = jnp.zeros((batch, size, size, 3), jnp.bfloat16)
    dt = timeit(vae_enc, params, img)
    print(f"VAE encode ({batch}, {size}):          {dt*1e3:8.2f} ms")

    @jax.jit
    def clip_fwd(p, x):
        out = modules.text_encoder.apply(
            {"params": p["text_encoder"]}, jnp.zeros((batch, 77), jnp.int32)
        )
        return x + jnp.mean(out).astype(x.dtype)

    dt = timeit(clip_fwd, params, jnp.zeros((1,), jnp.bfloat16))
    print(f"CLIP encode ({batch}):                 {dt*1e3:8.2f} ms")

    # full sampling loop for reference
    fn = sampling.make_img2img_fn(modules, 20, 1.0, 5.0, sampler="ddim")
    ctx1 = jnp.zeros((batch, 77, 768), jnp.float32)

    def loop(p, x):
        return fn(p, x, ctx1, ctx1, jax.random.PRNGKey(0))

    img_f = jnp.zeros((batch, size, size, 3), jnp.float32)
    out = loop(params, img_f)
    _ = float(jnp.mean(out))
    t0 = time.perf_counter()
    x = img_f
    for i in range(3):
        x = loop(params, x)
    _ = float(jnp.mean(x))
    dt = (time.perf_counter() - t0) / 3
    print(f"full 20-step loop ({batch}@{size}):    {dt*1e3:8.2f} ms  "
          f"-> {batch/dt:.2f} img/s")


if __name__ == "__main__":
    main()
