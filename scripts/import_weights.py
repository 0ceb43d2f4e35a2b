#!/usr/bin/env python3
"""One-command weights import + numeric parity harness.

Converts external torch artifacts into this framework's formats and
(optionally) records/checks per-module output goldens so weight-import
fidelity is a measured number, not a claim (SURVEY §7 risk #1; the
reference simply loads hub weights, src/inference.py:139-197).

Typical use on a weights-available machine:

    # import everything + record goldens from OUR modules
    python scripts/import_weights.py \
        --sd15 /path/to/stable-diffusion-v1-5 \
        --sd_inpaint /path/to/stable-diffusion-inpainting \
        --lpips /path/to/lpips_alex.(safetensors|pth) \
        --inception /path/to/inception_v3.(safetensors|pth) \
        --rrdb /path/to/RealESRGAN_x4plus.(safetensors|pth) \
        --record_goldens goldens/

    # later / elsewhere: verify the imported stacks still reproduce them
    python scripts/import_weights.py --check_goldens goldens/ \
        --pretrained_root outputs/pretrained

When `diffusers` + `torch` are importable AND --sd15 is given, the probe
outputs of the torch UNet/VAE/text-encoder are recorded alongside ours
(`*_torch` keys), so the goldens also pin cross-framework parity
(per-module max-abs delta printed).

Outputs:
    outputs/pretrained/sd15/        our pipeline layout (+ tokenizer files)
    outputs/pretrained/sd15_inpaint/
    weights/lpips_alex.safetensors
    weights/inception_v3.safetensors
    weights/realesrgan_x4.safetensors
    goldens/sd15_goldens.npz
"""
import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# parity gates: fp32 per-module thresholds (max abs delta on unit-scale
# activations). Loose enough for cross-backend matmul reassociation,
# tight enough to catch any wrong/missing/transposed weight.
THRESHOLDS = {
    "text_encoder": 5e-3,
    "vae_encode": 5e-3,
    "vae_decode": 5e-3,
    "unet": 5e-3,
    "img2img": 2e-2,  # 5 steps of accumulated error
}


def _load_torch_file(path: str):
    """Load a torch artifact as {name: np.ndarray}: safetensors preferred,
    .pth/.pt via torch (cpu build is in the env)."""
    if path.endswith(".safetensors"):
        from image_restoration_and_enhancement_tpu.core.checkpoint import (
            load_torch_safetensors,
        )

        return load_torch_safetensors(path)
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "params_ema" in obj:  # Real-ESRGAN release zips
        obj = obj["params_ema"]
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.numpy() for k, v in obj.items()}


def import_sd_dir(src: str, dst: str, config) -> None:
    from image_restoration_and_enhancement_tpu.core import checkpoint as ckpt

    params = ckpt.import_hf_pipeline(src)
    ckpt.save_pipeline(dst, params, config)
    # tokenizer files ride along so load_tokenizer finds the real BPE
    tok_src = os.path.join(src, "tokenizer")
    for fname in ("vocab.json", "merges.txt"):
        for cand in (os.path.join(tok_src, fname), os.path.join(src, fname)):
            if os.path.exists(cand):
                shutil.copy(cand, os.path.join(dst, fname))
                break
    print(f"imported SD pipeline {src} -> {dst} "
          f"(components: {sorted(params)})")


def import_metric_weights(kind: str, src: str, weights_dir: str) -> None:
    from image_restoration_and_enhancement_tpu.core.checkpoint import save_params

    state = _load_torch_file(src)
    if kind == "lpips":
        from image_restoration_and_enhancement_tpu.metrics.perceptual import (
            import_lpips_torch_state,
        )

        tree, fname = import_lpips_torch_state(state), "lpips_alex.safetensors"
    elif kind == "inception":
        from image_restoration_and_enhancement_tpu.metrics.inception import (
            import_inception_torch_state,
        )

        tree, fname = import_inception_torch_state(state), "inception_v3.safetensors"
    else:
        from image_restoration_and_enhancement_tpu.models.rrdbnet import (
            import_rrdb_torch_state,
        )

        tree, fname = import_rrdb_torch_state(state), "realesrgan_x4.safetensors"
    os.makedirs(weights_dir, exist_ok=True)
    out = os.path.join(weights_dir, fname)
    save_params(tree, out)
    print(f"imported {kind} weights {src} -> {out}")


# ---------------------------------------------------------------------------
# parity probes
# ---------------------------------------------------------------------------


def _probe_inputs(config=None, image_size: int = 256):
    """Deterministic probe tensors (host-side, framework-agnostic)."""
    rng = np.random.default_rng(42)
    if config is None:
        from image_restoration_and_enhancement_tpu import config as C

        config = C.SD15
    vs = config.text_encoder.vocab_size
    body = [min(320 + i, vs - 3) for i in range(75)]
    lat = image_size // 8
    return {
        "input_ids": np.array([[vs - 2] + body + [vs - 1]], dtype=np.int32),
        "image": (rng.random((1, image_size, image_size, 3),
                             dtype=np.float32) * 2 - 1),
        "latents": rng.standard_normal((1, lat, lat, 4), dtype=np.float32),
        "timestep": np.array([501], dtype=np.int32),
        "context": rng.standard_normal(
            (1, 77, config.unet.cross_attention_dim), dtype=np.float32) * 0.2,
    }


def run_our_probes(pipeline_dir: str, config=None, image_size: int = 256) -> dict:
    """Run every module of the imported SD stack on the fixed probes."""
    import jax
    import jax.numpy as jnp

    from image_restoration_and_enhancement_tpu import config as C
    from image_restoration_and_enhancement_tpu.core import checkpoint as ckpt
    from image_restoration_and_enhancement_tpu.core import sampling

    if config is None:
        config = C.SD15
    probes = _probe_inputs(config, image_size)
    modules = sampling.SDModules.create(config, dtype=jnp.float32)
    params = ckpt.load_pipeline(pipeline_dir)
    out = {}
    out["text_encoder"] = np.asarray(
        sampling.encode_text(modules, params, jnp.asarray(probes["input_ids"]))
    )
    # deterministic VAE: posterior mode (no sampling) for comparability
    post = modules.vae.apply(
        {"params": params["vae"]}, jnp.asarray(probes["image"]),
        method=modules.vae.encode,
    )
    mode = post.mean if hasattr(post, "mean") else post[0]
    out["vae_encode"] = np.asarray(mode) * modules.config.vae.scaling_factor
    out["vae_decode"] = np.asarray(
        sampling.decode_latents(modules, params, jnp.asarray(probes["latents"]))
    )
    out["unet"] = np.asarray(
        modules.unet.apply(
            {"params": params["unet"]},
            jnp.asarray(probes["latents"]),
            jnp.asarray(probes["timestep"]),
            jnp.asarray(probes["context"]),
            None,
        )
    )
    fn = sampling.make_img2img_fn(
        modules, num_inference_steps=5, strength=0.8, guidance_scale=7.5,
        sampler="plms", jit=False,
    )
    ctx = out["text_encoder"]
    vs = config.text_encoder.vocab_size
    uncond_ids = np.array([[vs - 2, vs - 1] + [0] * 75], dtype=np.int32)
    un = np.asarray(
        sampling.encode_text(modules, params, jnp.asarray(uncond_ids))
    )
    out["img2img"] = np.asarray(
        fn(params, jnp.asarray(probes["image"]), jnp.asarray(ctx),
           jnp.asarray(un), jax.random.PRNGKey(42))
    )
    return out


def run_torch_probes(sd_dir: str) -> dict:
    """Same probes through diffusers/torch, if importable. NCHW<->NHWC
    conversions at the boundary."""
    try:
        import torch
        from diffusers import AutoencoderKL, UNet2DConditionModel
        from transformers import CLIPTextModel
    except Exception as e:  # pragma: no cover - env-dependent
        print(f"torch/diffusers unavailable ({e}); skipping torch goldens")
        return {}
    probes = _probe_inputs()
    out = {}
    with torch.no_grad():
        te = CLIPTextModel.from_pretrained(os.path.join(sd_dir, "text_encoder"))
        out["text_encoder_torch"] = te(
            torch.from_numpy(probes["input_ids"]).long()
        ).last_hidden_state.numpy()
        vae = AutoencoderKL.from_pretrained(os.path.join(sd_dir, "vae"))
        img = torch.from_numpy(probes["image"].transpose(0, 3, 1, 2))
        post = vae.encode(img).latent_dist
        out["vae_encode_torch"] = (
            post.mode().numpy().transpose(0, 2, 3, 1) * vae.config.scaling_factor
        )
        lat = torch.from_numpy(probes["latents"].transpose(0, 3, 1, 2))
        dec = vae.decode(lat / vae.config.scaling_factor).sample
        out["vae_decode_torch"] = dec.clamp(-1, 1).numpy().transpose(0, 2, 3, 1)
        unet = UNet2DConditionModel.from_pretrained(os.path.join(sd_dir, "unet"))
        eps = unet(
            lat, torch.from_numpy(probes["timestep"]).long(),
            torch.from_numpy(probes["context"]),
        ).sample
        out["unet_torch"] = eps.numpy().transpose(0, 2, 3, 1)
    return out


def record_goldens(pipeline_dir: str, goldens_dir: str, sd_dir=None) -> None:
    os.makedirs(goldens_dir, exist_ok=True)
    arrays = run_our_probes(pipeline_dir)
    if sd_dir:
        arrays.update(run_torch_probes(sd_dir))
    path = os.path.join(goldens_dir, "sd15_goldens.npz")
    np.savez_compressed(path, **arrays)
    print(f"recorded goldens -> {path}: {sorted(arrays)}")
    # cross-framework deltas, when both sides present
    for name in ("text_encoder", "vae_encode", "vae_decode", "unet"):
        tk = f"{name}_torch"
        if tk in arrays:
            d = float(np.abs(arrays[name] - arrays[tk]).max())
            status = "OK" if d <= THRESHOLDS[name] else "FAIL"
            print(f"  {name:<14} ours-vs-torch max|Δ| = {d:.3e}  [{status}]")


def check_goldens(pipeline_dir: str, goldens_dir: str) -> int:
    path = os.path.join(goldens_dir, "sd15_goldens.npz")
    ref = dict(np.load(path))
    ours = run_our_probes(pipeline_dir)
    failures = 0
    for name, arr in ours.items():
        # prefer the torch-side golden (cross-framework), else our recording
        target = ref.get(f"{name}_torch", ref.get(name))
        if target is None:
            continue
        d = float(np.abs(arr - target).max())
        thr = THRESHOLDS.get(name, 1e-2)
        status = "OK" if d <= thr else "FAIL"
        failures += status == "FAIL"
        print(f"  {name:<14} max|Δ| = {d:.3e} (thr {thr:g})  [{status}]")
    return failures


def main():
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--sd15", help="diffusers SD1.5 pipeline directory")
    p.add_argument("--sd_inpaint", help="diffusers SD-inpainting directory")
    p.add_argument("--lpips", help="LPIPS AlexNet torch weights")
    p.add_argument("--inception", help="torchvision inception_v3 weights")
    p.add_argument("--rrdb", help="Real-ESRGAN x4plus weights")
    p.add_argument("--pretrained_root", default="outputs/pretrained",
                   help="Where imported pipelines land (point "
                        "IRET_PRETRAINED_ROOT here to serve them)")
    p.add_argument("--weights_dir",
                   default=os.environ.get("IRET_WEIGHTS_DIR", "weights"))
    p.add_argument("--record_goldens", metavar="DIR",
                   help="Record parity goldens after import")
    p.add_argument("--check_goldens", metavar="DIR",
                   help="Check the imported sd15 stack against recorded goldens")
    args = p.parse_args()

    from image_restoration_and_enhancement_tpu import config as C

    sd15_out = os.path.join(args.pretrained_root, "sd15")
    if args.sd15:
        import_sd_dir(args.sd15, sd15_out, C.SD15)
    if args.sd_inpaint:
        import_sd_dir(args.sd_inpaint,
                      os.path.join(args.pretrained_root, "sd15_inpaint"),
                      C.SD15_INPAINT)
    for kind in ("lpips", "inception", "rrdb"):
        if getattr(args, kind):
            import_metric_weights(kind, getattr(args, kind), args.weights_dir)

    if args.record_goldens:
        record_goldens(sd15_out, args.record_goldens, sd_dir=args.sd15)
    if args.check_goldens:
        if check_goldens(sd15_out, args.check_goldens):
            sys.exit(1)
    if not any([args.sd15, args.sd_inpaint, args.lpips, args.inception,
                args.rrdb, args.check_goldens]):
        p.print_help()


if __name__ == "__main__":
    main()
