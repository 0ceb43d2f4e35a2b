"""A/B the implicit-GEMM Pallas int8 3x3 conv (ops/conv_int8.py) vs XLA's
s8xs8 conv lowering at the serving loop's real shapes.

Shapes: UNet levels at 512px serving (latent 64x64, CFG batch 16) and the
VAE decoder's 512px stages (batch 8). Timing closes with a host fetch
(CLAUDE.md: block_until_ready does not drain the relay queue).

Usage: python scripts/bench_conv_int8.py [--shapes unet|vae|all]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from image_restoration_and_enhancement_tpu.ops import conv_int8  # noqa: E402

# (tag, B, H, W, C, N)
UNET_SHAPES = [
    ("unet_l0_64px_c320", 16, 64, 64, 320, 320),
    ("unet_l1_32px_c640", 16, 32, 32, 640, 640),
    ("unet_l2_16px_c1280", 16, 16, 16, 1280, 1280),
    ("unet_l3_8px_c1280", 16, 8, 8, 1280, 1280),
]
VAE_SHAPES = [
    ("vae_dec_512px_c128", 8, 512, 512, 128, 128),
    ("vae_dec_256px_c256", 8, 256, 256, 256, 256),
    ("vae_dec_512px_c256_to_128", 8, 512, 512, 256, 128),
]


def _time(fn, *args, iters=20, reps=3):
    out = fn(*args)
    float(jnp.mean(out.astype(jnp.float32)))  # warm + sync
    best = float("inf")
    for _ in range(reps):  # min-of-reps: the relay adds large run-to-run noise
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.mean(out.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="all", choices=["unet", "vae", "all"])
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    shapes = {"unet": UNET_SHAPES, "vae": VAE_SHAPES,
              "all": UNET_SHAPES + VAE_SHAPES}[args.shapes]

    key = jax.random.PRNGKey(0)
    for tag, b, h, w, c, n in shapes:
        xq = jax.random.randint(key, (b, h + 2, w + 2, c), -127, 128, jnp.int8)
        wq = jax.random.randint(key, (3, 3, c, n), -127, 128, jnp.int8)
        scale = jnp.full((n,), 1e-4, jnp.float32)

        dn = jax.lax.conv_dimension_numbers(
            (b, h, w, c), (3, 3, c, n), ("NHWC", "HWIO", "NHWC"))

        @jax.jit
        def xla_conv(xp, wgt, s, dn=dn, h=h, w=w):
            acc = jax.lax.conv_general_dilated(
                xp[:, 1:h + 1, 1:w + 1, :], wgt, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=dn, preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * s).astype(jnp.bfloat16)

        @jax.jit
        def pallas_conv(xp, wgt, s):
            return conv_int8.conv3x3_same_int8(xp, wgt, s,
                                               out_dtype=jnp.bfloat16)

        flops = 2 * b * h * w * 9 * c * n
        try:
            t_xla = _time(xla_conv, xq, wq, scale, iters=args.iters)
        except Exception as e:  # noqa: BLE001
            print(f"{tag}: XLA FAILED: {type(e).__name__}: {e}")
            t_xla = None
        try:
            t_pl = _time(pallas_conv, xq, wq, scale, iters=args.iters)
        except Exception as e:  # noqa: BLE001
            print(f"{tag}: PALLAS FAILED: {type(e).__name__}: {str(e)[:500]}")
            t_pl = None
        msg = f"{tag}: "
        if t_xla:
            msg += f"xla {t_xla*1e3:7.2f}ms {flops/t_xla/1e12:6.1f} TOPS | "
        if t_pl:
            msg += f"pallas {t_pl*1e3:7.2f}ms {flops/t_pl/1e12:6.1f} TOPS"
            if t_xla:
                msg += f" | speedup {t_xla/t_pl:.2f}x"
        print(msg)


if __name__ == "__main__":
    main()
