#!/usr/bin/env python3
"""Calibrate per-layer int8 activation scales for the int8_static serving
mode (ops/quant.py).

Runs the full img2img program under dynamic int8 quantization on one or
more calibration batches, records every quantized conv/dense input's
absmax (maxed over denoise steps, VAE encode/decode and all batches), and
writes {site: absmax} JSON. Serving then loads the table
(quant.load_static_table) and traces with IRET_QUANT=int8_static — the
hot program carries NO per-activation absmax reduces (the int8 path's
measured main overhead; see ops/quant.py module docstring for numbers).

Usage:
  python scripts/calibrate_quant.py --out outputs/quant_calib.json \
      [--checkpoint outputs/models/denoising/best] [--images dir_or_none] \
      [--size 512] [--batch 8] [--steps 20] [--prompts "a photo" ...]

Without --images, random uniform [-1,1] images are used — fine for scale
calibration of a random-init stack (benchmarks); use real task inputs when
calibrating a trained checkpoint for serving.
"""
import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from image_restoration_and_enhancement_tpu import config as C  # noqa: E402
from image_restoration_and_enhancement_tpu.core import sampling  # noqa: E402
from image_restoration_and_enhancement_tpu.models.tokenizer import load_tokenizer  # noqa: E402


def load_images(path, size, batch):
    from PIL import Image

    files = sorted(
        f for ext in ("*.png", "*.jpg", "*.jpeg")
        for f in glob.glob(os.path.join(path, ext))
    )[:batch]
    if not files:
        raise SystemExit(f"no images under {path}")
    ims = []
    for f in files:
        im = Image.open(f).convert("RGB").resize((size, size), Image.BICUBIC)
        ims.append(np.asarray(im, np.float32) / 127.5 - 1.0)
    while len(ims) < batch:
        ims.append(ims[-1])
    return jnp.asarray(np.stack(ims))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="outputs/quant_calib.json")
    ap.add_argument("--checkpoint", default=None,
                    help="orbax/pipeline checkpoint dir; random init if unset")
    ap.add_argument("--images", default=None)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--strength", type=float, default=1.0)
    ap.add_argument("--guidance_scale", type=float, default=5.0)
    ap.add_argument("--sampler", default="ddim", choices=["ddim", "plms"])
    ap.add_argument("--prompts", nargs="*", default=["a high quality photo"])
    ap.add_argument("--seeds", type=int, nargs="*", default=[0, 1])
    args = ap.parse_args()

    modules = sampling.SDModules.create(C.SD15, dtype=jnp.bfloat16)
    if args.checkpoint:
        from image_restoration_and_enhancement_tpu.core import checkpoint as ckpt

        params = ckpt.load_pipeline(args.checkpoint)
    else:
        params = sampling.init_params(modules, jax.random.PRNGKey(0),
                                      image_size=args.size)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    tok = load_tokenizer(args.checkpoint)
    ids = jnp.asarray(tok([args.prompts[i % len(args.prompts)]
                           for i in range(args.batch)]))
    uncond_ids = jnp.asarray(tok([""] * args.batch))
    ctx = sampling.encode_text(modules, params, ids)
    uncond = sampling.encode_text(modules, params, uncond_ids)

    calib = sampling.make_calib_img2img_fn(
        modules, args.steps, args.strength, args.guidance_scale,
        sampler=args.sampler,
    )

    table = {}
    for seed in args.seeds:
        if args.images:
            image = load_images(args.images, args.size, args.batch)
        else:
            image = jax.random.uniform(
                jax.random.PRNGKey(seed), (args.batch, args.size, args.size, 3),
                minval=-1.0, maxval=1.0,
            )
        _, stats = calib(params, image, ctx, uncond, jax.random.PRNGKey(seed))
        stats = {k: float(v) for k, v in stats.items()}  # host fetch syncs
        for k, v in stats.items():
            table[k] = max(table.get(k, 0.0), v)
        print(f"seed {seed}: {len(stats)} sites")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"sites": table,
                   "meta": {"size": args.size, "steps": args.steps,
                            "sampler": args.sampler,
                            "checkpoint": args.checkpoint or "random-init"}},
                  f, indent=1, sort_keys=True)
    print(f"wrote {len(table)} site scales -> {args.out}")


if __name__ == "__main__":
    main()
