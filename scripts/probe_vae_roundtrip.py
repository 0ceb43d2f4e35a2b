#!/usr/bin/env python3
"""Measure a frozen VAE's round-trip quality on a pairs split — the hard
ceiling on any serve mode's output quality (everything the pipeline emits
passes through decode; reference relies on the pretrained SD VAE here,
src/inference.py:486-494 decodes through it).

For N input/gt pairs it reports PSNR of:
  rt_input_vs_gt    decode(encode(input))  vs gt   — the ceiling of a
                    near-passthrough (low-strength) serve
  rt_input_vs_input decode(encode(input))  vs input — recon fidelity on
                    the degraded (off-manifold) inputs
  rt_gt_vs_gt       decode(encode(gt))     vs gt   — recon fidelity on
                    clean images (what a perfect UNet's output decodes at)
  input_vs_gt       the do-nothing baseline to beat

Prints one JSON line; used by the round-5 chain to decide how much more
mixed-VAE training the hard family needs.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True,
                   help="Pipeline dir with a vae component")
    p.add_argument("--pairs", default="data/pairs_hard/denoise/val")
    p.add_argument("--n", type=int, default=32)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from image_restoration_and_enhancement_tpu import config as C
    from image_restoration_and_enhancement_tpu.core import checkpoint as ckpt
    from image_restoration_and_enhancement_tpu.metrics import functional as F
    from image_restoration_and_enhancement_tpu.models.vae import AutoencoderKL

    cfg = ckpt.load_pipeline_model_config(args.checkpoint) or C.SD15
    vae = AutoencoderKL(cfg.vae, dtype=getattr(jnp, args.dtype))
    params = ckpt.load_pipeline(args.checkpoint)["vae"]

    # params MUST be an argument, not a closure: closed-over params embed as
    # HLO constants and overflow the remote-compile request (relay gotcha)
    @jax.jit
    def roundtrip(params, x):
        post = vae.apply({"params": params}, x, method=vae.encode)
        return vae.apply({"params": params}, post.mean, method=vae.decode)

    def load_dir(d):
        files = sorted(os.listdir(d))[: args.n]
        out = []
        for f in files:
            img = Image.open(os.path.join(d, f)).convert("RGB")
            if img.size != (args.size, args.size):
                img = img.resize((args.size, args.size), Image.LANCZOS)
            out.append(np.asarray(img, np.float32) / 127.5 - 1.0)
        return np.stack(out)

    inp = load_dir(os.path.join(args.pairs, "input"))
    gt = load_dir(os.path.join(args.pairs, "gt"))

    def rt(x):
        outs = []
        for i in range(0, len(x), args.batch):
            y = roundtrip(params, jnp.asarray(x[i : i + args.batch]))
            outs.append(np.asarray(y, np.float32))  # host fetch = sync
        return np.concatenate(outs)

    rt_inp, rt_gt = rt(inp), rt(gt)

    def mean_psnr(a, b):
        vals = [
            float(F.psnr(jnp.asarray((x + 1) / 2), jnp.asarray((y + 1) / 2)))
            for x, y in zip(a, b)
        ]
        return round(float(np.mean(vals)), 3)

    print(json.dumps({
        "checkpoint": args.checkpoint,
        "pairs": args.pairs,
        "n": len(inp),
        "dtype": args.dtype,
        "rt_input_vs_gt": mean_psnr(rt_inp, gt),
        "rt_input_vs_input": mean_psnr(rt_inp, inp),
        "rt_gt_vs_gt": mean_psnr(rt_gt, gt),
        "input_vs_gt": mean_psnr(inp, gt),
    }))


if __name__ == "__main__":
    main()
