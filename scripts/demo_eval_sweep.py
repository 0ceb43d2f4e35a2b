#!/usr/bin/env python3
"""Serving-protocol sweep for the restoration-learning demo checkpoint.

The demo trains with a fixed validation protocol (PLMS, strength 0.6, 20
steps, no CFG — a guess). This sweeps the sampler protocol on the TRAINED
checkpoint — strength grid, then a K-seed self-ensemble (mean of
independent samples; the classic test-time ensemble from the SR
literature — sampling noise is zero-mean, so averaging trades diversity
for fidelity) at the best strength. Reports PSNR/SSIM per point and
updates docs/artifacts/demo_learning/summary.json with the best serving
protocol alongside the training-time numbers.

Run AFTER scripts/demo_restoration_learning.py. CPU by default (the demo
stack is small); never touches the TPU relay unless --platform default.
"""
import argparse
import json
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="outputs/demo_learning")
    p.add_argument("--strengths", default="0.3,0.45,0.6,0.75,0.9")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--ensemble", type=int, default=4)
    p.add_argument("--platform", default="cpu", choices=["cpu", "default"])
    p.add_argument("--artifact_dir", default="docs/artifacts/demo_learning")
    args = p.parse_args()

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from demo_restoration_learning import demo_model_config
    from image_restoration_and_enhancement_tpu.core import checkpoint as ckpt
    from image_restoration_and_enhancement_tpu.core import sampling
    from image_restoration_and_enhancement_tpu.metrics import functional as F
    from image_restoration_and_enhancement_tpu.tasks.registry import get_task

    modules = sampling.SDModules.create(demo_model_config(), dtype=jnp.float32)
    params = ckpt.load_pipeline(os.path.join(args.out, "model", "best"))

    vdir = os.path.join(args.out, "pairs", "denoise", "val")
    names = sorted(os.listdir(os.path.join(vdir, "gt")))
    gt = np.stack([
        np.asarray(Image.open(os.path.join(vdir, "gt", n)), np.float32) / 127.5 - 1
        for n in names
    ])
    x = jnp.asarray(np.stack([
        np.asarray(Image.open(os.path.join(vdir, "input", n)), np.float32) / 127.5 - 1
        for n in names
    ]))

    # context: the demo trains with the task prompt; tokenizer lives in the
    # checkpoint dir (falls back to the byte tokenizer the trainer used)
    from image_restoration_and_enhancement_tpu.models.tokenizer import load_tokenizer
    spec = get_task("denoise")
    tok = load_tokenizer(os.path.join(args.out, "model", "best"),
                         vocab_size=demo_model_config().text_encoder.vocab_size)
    ctx = sampling.encode_text(modules, params, jnp.asarray(tok([spec.prompt])))
    ctx = jnp.broadcast_to(ctx, (x.shape[0],) + ctx.shape[1:])

    g01 = (gt + 1) / 2

    def metrics(out):
        o01 = (np.asarray(out, np.float32) + 1) / 2
        ps = [float(F.psnr(jnp.asarray(o), jnp.asarray(g)))
              for o, g in zip(o01, g01)]
        ss = [float(F.ssim(jnp.asarray(o), jnp.asarray(g)))
              for o, g in zip(o01, g01)]
        return float(np.mean(ps)), float(np.mean(ss))

    results = {}
    # zero-model control: the frozen VAE's round-trip of the noisy input
    # (mode, no sampling). The VAE is trained on clean images only, so its
    # manifold projection already removes some noise; the diffusion points
    # below must beat THIS, not just the raw input, for the UNet to be
    # credited with learning restoration.
    rt = sampling.decode_latents(
        modules, params,
        sampling.encode_image(modules, params, x, jax.random.PRNGKey(0),
                              sample=False),
    )
    ps, ss = metrics(rt)
    results["vae_roundtrip"] = {"psnr": round(ps, 4), "ssim": round(ss, 4)}
    print(f"vae_roundtrip: psnr {ps:7.3f}  ssim {ss:.4f}")
    vae_rt_psnr = ps

    best_s, best_p = None, -1e9
    for s in [float(v) for v in args.strengths.split(",")]:
        fn = sampling.make_img2img_fn(modules, num_inference_steps=args.steps,
                                      strength=s, guidance_scale=0.0,
                                      sampler="plms")
        out = fn(params, x, ctx, None, jax.random.PRNGKey(42))
        ps, ss = metrics(out)
        results[f"strength_{s:g}"] = {"psnr": round(ps, 4), "ssim": round(ss, 4)}
        print(f"strength {s:4.2f}: psnr {ps:7.3f}  ssim {ss:.4f}")
        if ps > best_p:
            best_s, best_p = s, ps

    fn = sampling.make_img2img_fn(modules, num_inference_steps=args.steps,
                                  strength=best_s, guidance_scale=0.0,
                                  sampler="plms")
    acc = None
    for k in range(args.ensemble):
        out = np.asarray(fn(params, x, ctx, None, jax.random.PRNGKey(100 + k)),
                         np.float32)
        acc = out if acc is None else acc + out
    ps, ss = metrics(acc / args.ensemble)
    results[f"ensemble_{args.ensemble}_strength_{best_s:g}"] = {
        "psnr": round(ps, 4), "ssim": round(ss, 4),
    }
    print(f"ensemble x{args.ensemble} @ strength {best_s:g}: "
          f"psnr {ps:7.3f}  ssim {ss:.4f}")

    spath = os.path.join(args.artifact_dir, "summary.json")
    summary = json.load(open(spath)) if os.path.exists(spath) else {}
    summary["serving_sweep"] = results
    diffusion_best = max(v["psnr"] for k, v in results.items()
                         if k != "vae_roundtrip")
    summary["best_serving_psnr"] = round(diffusion_best, 4)
    summary["vae_roundtrip_psnr"] = results["vae_roundtrip"]["psnr"]
    summary["beats_do_nothing_served"] = bool(
        diffusion_best > summary.get("input_baseline_psnr", 1e9))
    summary["beats_vae_roundtrip"] = bool(diffusion_best > vae_rt_psnr)
    os.makedirs(args.artifact_dir, exist_ok=True)
    with open(spath, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: summary[k] for k in
                      ("best_serving_psnr", "beats_do_nothing_served")}))


if __name__ == "__main__":
    main()
