#!/usr/bin/env python3
"""Off-happy-path sampling probes (verify surface 2).

Exercises the configs the headline bench does NOT: no-CFG (gs=0, the
reference SR path), the PLMS sampler, the 9-channel inpaint UNet, and a
non-512 resolution — on whatever backend is attached (TPU or CPU).
Checks outputs are finite and in [-1, 1]. Relay-safe: closes with host
fetches; params are jit arguments.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from image_restoration_and_enhancement_tpu import config as C
from image_restoration_and_enhancement_tpu.core import sampling


def check(tag, img):
    arr = jax.device_get(img).astype("float32")
    ok = bool((arr == arr).all())
    print(f"{tag}: {arr.shape} finite= {ok} range=({arr.min():.3f},{arr.max():.3f})")
    assert ok, f"{tag}: non-finite output"
    assert arr.min() >= -1.001 and arr.max() <= 1.001, f"{tag}: range violation"


def main():
    size = int(os.environ.get("PROBE_SIZE", "256"))
    batch = int(os.environ.get("PROBE_BATCH", "2"))
    key = jax.random.PRNGKey(7)

    modules = sampling.SDModules.create(C.SD15, dtype=jnp.bfloat16)
    params = sampling.init_params(modules, jax.random.PRNGKey(0), image_size=size)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    image = jnp.zeros((batch, size, size, 3), jnp.float32)
    ctx = sampling.encode_text(modules, params, jnp.zeros((batch, 77), jnp.int32))

    # no-CFG + PLMS (reference SR path semantics: gs=0, src/inference.py:570)
    fn = sampling.make_img2img_fn(modules, 12, 0.6, 0.0, sampler="plms")
    check(f"img2img{size}/plms/gs0", fn(params, image, ctx, None, key))

    # 9-ch inpaint UNet + DDIM + CFG
    modules9 = sampling.SDModules.create(C.SD15_INPAINT, dtype=jnp.bfloat16)
    params9 = sampling.init_params(modules9, jax.random.PRNGKey(1), image_size=size)
    params9 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params9)
    mask = jnp.zeros((batch, size, size, 1), jnp.float32).at[:, 64:128, 64:128].set(1.0)
    fn9 = sampling.make_inpaint_fn(modules9, 12, 0.75, 7.0, sampler="ddim")
    check(f"inpaint{size}/ddim/cfg", fn9(params9, image, mask, ctx, ctx, key))

    print("probes OK")


if __name__ == "__main__":
    main()
