#!/usr/bin/env python3
"""Quality gate for the int8 serving path (ops/quant.py).

Runs the SAME weights through the img2img pipeline with quant off and on,
on real val pairs, and reports (a) PSNR/SSIM of each mode vs ground truth
and (b) PSNR between the two outputs (the int8-induced delta). The int8
path ships only while the bf16<->int8 output PSNR stays high and the
gt-metrics delta is within noise (VERDICT r1 #1: "quality-gated via the
existing PSNR/SSIM eval harness").

Usage (defaults match the round-2 real training run):
    python scripts/eval_quant_quality.py \
        --checkpoint outputs/models/denoising_realrun/best \
        --pairs data/pairs/denoise/val --n 8 --size 256
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from image_restoration_and_enhancement_tpu import config as C
from image_restoration_and_enhancement_tpu.core import checkpoint as ckpt
from image_restoration_and_enhancement_tpu.core import sampling
from image_restoration_and_enhancement_tpu.metrics import functional as F
from image_restoration_and_enhancement_tpu.models.tokenizer import load_tokenizer
from image_restoration_and_enhancement_tpu.ops import quant, token_merge
from image_restoration_and_enhancement_tpu.tasks.registry import get_task


def load_batch(pairs_dir: str, n: int, size: int, with_mask: bool = False):
    in_dir, gt_dir = os.path.join(pairs_dir, "input"), os.path.join(pairs_dir, "gt")
    names = sorted(os.listdir(in_dir))[:n]
    def rd(d, name):
        img = Image.open(os.path.join(d, name)).convert("RGB").resize((size, size))
        return np.asarray(img, np.float32) / 127.5 - 1.0
    x = np.stack([rd(in_dir, m) for m in names])
    g = np.stack([rd(gt_dir, m) for m in names])
    mask = None
    if with_mask:
        mask_dir = os.path.join(pairs_dir, "mask")
        def rdm(name):
            img = Image.open(os.path.join(mask_dir, name)).convert("L")
            img = img.resize((size, size), Image.NEAREST)
            return (np.asarray(img, np.float32) / 255.0 > 0.5).astype(np.float32)
        mask = jnp.asarray(np.stack([rdm(m) for m in names])[..., None])
    return jnp.asarray(x), jnp.asarray(g), mask


_CALIB_DONE: set = set()


def run(modules, params, ctx, un, x, steps, strength, gs, sampler, mode,
        cfg_cache=1, attn_int8_min=0, tome=0.0, batch=0, mask=None):
    """Serve x through the pipeline in the given mode; chunks of `batch`
    (0 = all at once) so wide gates (n=32) reuse the batch-8 program."""
    # calibration first, with the attention-quant knob UNSET: the static
    # table is cached per (sampler settings, shape) key and reused across
    # every mode of one gate, so an attn_int8_min from the first quantized
    # run must never silently bake into it (ADVICE r3 #2)
    os.environ.pop("IRET_ATTN_XLA_INT8_MIN", None)
    b = batch or len(x)
    if mode == "int8_static":
        if mask is not None:
            raise ValueError("int8_static gate has no inpaint calib twin; "
                             "gate inpaint with --modes '' (bf16/tome/turbo)")
        # calibrate on the first chunk (one dynamic-int8 pass), then trace
        # the serving fn with the scales baked in as constants. The scales
        # depend only on (params, inputs, sampler settings) — identical for
        # the int8_static / turbo / tome / combo runs of one gate — so
        # calibrate ONCE per settings key, not once per run (each pass is a
        # full multi-minute 20-step device program at 512px).
        ck = (steps, strength, gs, sampler, (b,) + tuple(x.shape[1:]))
        if ck not in _CALIB_DONE:
            calib = sampling.make_calib_img2img_fn(modules, steps, strength,
                                                   gs, sampler=sampler)
            _, stats = calib(params, x[:b], ctx, un, jax.random.PRNGKey(42))
            quant.load_static_table({k: float(v) for k, v in stats.items()})
            _CALIB_DONE.add(ck)
    # attention-quantization knob is trace-time (ops/attention.py dispatch):
    # set it only around the quantized serving run so the bf16 reference
    # (and the calibration above) stays exact
    if attn_int8_min:
        os.environ["IRET_ATTN_XLA_INT8_MIN"] = str(attn_int8_min)
    with quant.quant_mode(mode), token_merge.tome_mode(tome or None):
        if mask is not None:
            fn = sampling.make_inpaint_fn(modules, steps, strength, gs, sampler,
                                          cfg_cache_interval=cfg_cache)
        else:
            fn = sampling.make_img2img_fn(modules, steps, strength, gs, sampler,
                                          cfg_cache_interval=cfg_cache)
        outs = []
        for i in range(0, len(x), b):
            key = jax.random.PRNGKey(42 + i)
            if mask is not None:
                out = fn(params, x[i:i + b], mask[i:i + b], ctx, un, key)
            else:
                out = fn(params, x[i:i + b], ctx, un, key)
            outs.append(np.asarray(out, np.float32))  # host fetch drains relay
    return np.concatenate(outs)


def metrics_vs(a01, b01):
    ps, ss = [], []
    for p, g in zip(a01, b01):
        ps.append(float(F.psnr(jnp.asarray(p), jnp.asarray(g))))
        ss.append(float(F.ssim(jnp.asarray(p), jnp.asarray(g))))
    return float(np.mean(ps)), float(np.mean(ss))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", default="outputs/models/denoising_realrun/best")
    p.add_argument("--pairs", default="data/pairs/denoise/val")
    p.add_argument("--task", default="denoise")
    p.add_argument("--n", type=int, default=8)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--batch", type=int, default=8,
                   help="serve in chunks of this batch (0 = one batch of n) "
                        "so n=32 wide gates reuse the compiled batch-8 "
                        "program instead of compiling a batch-32 one")
    p.add_argument("--strength", type=float, default=None,
                   help="override the task's serving strength (the wide "
                        "gate runs each task at >=2 strengths)")
    p.add_argument("--modes", default="int8,int8_static",
                   help="comma list; '' skips straight to the approximate-"
                        "mode gates (inpaint has no int8_static calib twin)")
    p.add_argument("--cfg_cache", type=int, default=1,
                   help="also gate the approximate turbo mode: int8_static "
                        "with cfg_cache_interval=K (core/sampling.py)")
    p.add_argument("--tome", type=float, default=0.0,
                   help="also gate the approximate token-merge mode: "
                        "int8_static with this merge ratio at the N>=4096 "
                        "self-attention sites (ops/token_merge.py)")
    p.add_argument("--attn_int8_min", type=int, default=0,
                   help="gate the quantized-attention path: route "
                        "self-attention with N >= this through s8 QK/PV "
                        "(IRET_ATTN_XLA_INT8_MIN) in the quantized runs; "
                        "the bf16 reference run stays exact")
    args = p.parse_args()

    spec = get_task(args.task)
    modules = sampling.SDModules.create(spec.model_config, dtype=jnp.bfloat16)
    params = ckpt.load_pipeline(args.checkpoint)
    tok = load_tokenizer(args.checkpoint,
                         vocab_size=spec.model_config.text_encoder.vocab_size)
    ctx = sampling.encode_text(modules, params, jnp.asarray(tok([spec.prompt])))
    s = spec.sampler
    strength = args.strength if args.strength is not None else s.strength
    un = (sampling.encode_text(modules, params, jnp.asarray(tok([""])))
          if s.guidance_scale > 1.0 else None)
    uses_mask = spec.uses_mask
    x, gt, mask = load_batch(args.pairs, args.n, args.size, with_mask=uses_mask)
    # tome/turbo gates compose over the shipping base mode: int8_static for
    # img2img tasks, exact bf16 for inpaint (no static calib twin there)
    base_mode = None if uses_mask else "int8_static"
    common = dict(batch=args.batch, mask=mask)
    print(f"gate: task={args.task} n={len(x)} size={args.size} "
          f"strength={strength:g} batch={args.batch or len(x)}")

    out_bf16 = run(modules, params, ctx, un, x, s.num_inference_steps,
                   strength, s.guidance_scale, s.sampler, mode=None, **common)
    b01 = (out_bf16 + 1) / 2
    g01 = (np.asarray(gt) + 1) / 2
    p_b, s_b = metrics_vs(b01, g01)
    print(f"bf16        vs gt   : psnr {p_b:7.3f}  ssim {s_b:.4f}")

    def report(out, lbl):
        o01 = (out + 1) / 2
        p_q, s_q = metrics_vs(o01, g01)
        p_x, s_x = metrics_vs(o01, b01)
        print(f"{lbl:11s} vs gt   : psnr {p_q:7.3f}  ssim {s_q:.4f}")
        print(f"{lbl:11s} vs bf16 : psnr {p_x:7.3f}  ssim {s_x:.4f}")
        # repo-wide sign convention: mode − exact, positive = mode better
        print(f"gt-psnr delta ({lbl} - bf16): {p_q - p_b:+.4f} dB")

    for mode in filter(None, args.modes.split(",")):
        report(run(modules, params, ctx, un, x, s.num_inference_steps,
                   strength, s.guidance_scale, s.sampler, mode=mode,
                   attn_int8_min=args.attn_int8_min, **common), mode)
    if args.cfg_cache > 1:
        report(run(modules, params, ctx, un, x, s.num_inference_steps,
                   strength, s.guidance_scale, s.sampler, mode=base_mode,
                   cfg_cache=args.cfg_cache, attn_int8_min=args.attn_int8_min,
                   **common), f"turbo(k={args.cfg_cache})")
    if args.tome > 0.0:
        report(run(modules, params, ctx, un, x, s.num_inference_steps,
                   strength, s.guidance_scale, s.sampler, mode=base_mode,
                   tome=args.tome, attn_int8_min=args.attn_int8_min, **common),
               f"tome({args.tome:g})")
    if args.cfg_cache > 1 and args.tome > 0.0:
        # the combined fast-serving candidate: every approximate knob on at
        # once (int8_static + CFG cache + token merge) — gated as shipped
        report(run(modules, params, ctx, un, x, s.num_inference_steps,
                   strength, s.guidance_scale, s.sampler, mode=base_mode,
                   cfg_cache=args.cfg_cache, tome=args.tome,
                   attn_int8_min=args.attn_int8_min, **common),
               f"combo(k{args.cfg_cache}+t{args.tome:g})")


if __name__ == "__main__":
    main()
