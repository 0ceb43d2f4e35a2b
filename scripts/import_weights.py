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
    import dataclasses

    from image_restoration_and_enhancement_tpu.core import checkpoint as ckpt

    # the source pipeline's scheduler config wins over our defaults: a
    # diffusers checkpoint trained with e.g. different betas/prediction_type
    # must serve with THOSE values (the reference inherits them implicitly
    # via from_pretrained; /root/reference/src/inference.py:139-197)
    sched_path = os.path.join(src, "scheduler", "scheduler_config.json")
    if os.path.exists(sched_path):
        with open(sched_path) as f:
            sc = json.load(f)
        fields = {f.name for f in dataclasses.fields(type(config.scheduler))}
        overrides = {k: v for k, v in sc.items() if k in fields}
        # fail the import loudly on values the samplers don't implement
        # (e.g. diffusers ships beta_schedule="squaredcos_cap_v2" checkpoints;
        # deferring the error to first sampler build would let a broken
        # import look successful — ADVICE r4 #2)
        supported = {
            "beta_schedule": {"scaled_linear", "linear"},
            "prediction_type": {"epsilon"},
            "timestep_spacing": {"leading"},
        }
        for key, allowed in supported.items():
            if key in overrides and overrides[key] not in allowed:
                raise ValueError(
                    f"unsupported scheduler {key}={overrides[key]!r} in "
                    f"{sched_path} (supported: {sorted(allowed)})"
                )
        if overrides:
            config = dataclasses.replace(
                config,
                scheduler=dataclasses.replace(config.scheduler, **overrides),
            )
            print(f"scheduler config from {sched_path}: {overrides}")

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


_REHEARSAL_MERGES = [
    ("t", "h"), ("th", "e</w>"), ("i", "n"), ("r", "e"), ("o", "n"),
    ("a", "n"), ("e", "r"), ("s", "t"), ("e", "n"), ("o", "r"),
    ("a", "l"), ("d", "e"), ("de", "n"), ("den", "o"), ("deno", "i"),
    ("denoi", "s"), ("denois", "e</w>"), ("i", "m"), ("im", "a"),
    ("ima", "g"), ("imag", "e</w>"), ("c", "o"), ("co", "l"),
    ("col", "or"), ("q", "u"), ("qu", "al"), ("i", "t"), ("it", "y</w>"),
    ("h", "i"), ("hi", "g"), ("hig", "h</w>"), ("r", "es"),
    ("e", "s"), ("o", "t"), ("ot", "o</w>"), ("p", "h"), ("ph", "ot"),
]


def build_bpe_assets(tokdir: str, vocab_size=None) -> int:
    """Write CLIP-shaped BPE assets (vocab.json + merges.txt) to tokdir:
    the 256 byte-unicode symbols, their </w> forms, a merge table that
    fires on the task prompts, optional <extra_N> padding up to exactly
    `vocab_size`, and the CLIP special tokens LAST (eos is the largest
    id, matching the real CLIP vocab layout — our pooling semantics and
    transformers' legacy-pooling carve-out both depend on that; see
    tests/test_cross_framework.py). Returns the final vocab size."""
    from image_restoration_and_enhancement_tpu.models import tokenizer as tok

    b2u = tok._bytes_to_unicode()
    base = [b2u[i] for i in sorted(b2u)]
    vocab = {}
    for s in base:
        vocab[s] = len(vocab)
    for s in base:
        vocab[s + "</w>"] = len(vocab)
    for a, b in _REHEARSAL_MERGES:
        m = a + b
        if m not in vocab:
            vocab[m] = len(vocab)
    if vocab_size is not None:
        need = vocab_size - 2 - len(vocab)
        if need < 0:
            raise ValueError(
                f"vocab_size {vocab_size} < BPE base vocab {len(vocab) + 2}")
        for i in range(need):
            vocab[f"<extra_{i}>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    os.makedirs(tokdir, exist_ok=True)
    with open(os.path.join(tokdir, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(tokdir, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
        for a, b in _REHEARSAL_MERGES:
            f.write(f"{a} {b}\n")
    return len(vocab)


def make_rehearsal_dir(dst: str, config=None, seed: int = 0):
    """Build a FAKE diffusers-layout SD pipeline directory: random
    weights, REAL names/shapes/file formats (VERDICT r3 #5).

    Without real SD1.5 weights in this air-gapped env, the harness risk
    that IS testable is name-map/layout drift: this constructs the exact
    directory shape `import_sd_dir` expects from a diffusers checkout —
    torch-format safetensors for unet/vae (export_torch_state_dict emits
    canonical diffusers names; pinned by tests/test_import_rehearsal.py),
    a REAL `transformers.CLIPTextModel` state dict for the text encoder
    (true `text_model.*` prefixes from the actual upstream library),
    tokenizer vocab/merges, scheduler/scheduler_config.json and
    model_index.json. Returns the (possibly vocab-adjusted) config the
    fake pipeline was built with, so `import_sd_dir(dst, out, cfg)` ->
    serve -> record/check_goldens round-trips on the day real weights
    appear, with zero new code.
    """
    import dataclasses

    import jax
    import jax.numpy as jnp
    from safetensors import numpy as st_numpy

    from image_restoration_and_enhancement_tpu import config as C
    from image_restoration_and_enhancement_tpu.core import checkpoint as ckpt
    from image_restoration_and_enhancement_tpu.core import sampling

    if config is None:
        config = C.TINY_SD
    # tokenizer first: the BPE byte alphabet sets a floor of 551 entries;
    # grow the text tower (and keep eos/pad as the top ids) to fit.
    n_vocab = build_bpe_assets(
        os.path.join(dst, "tokenizer"),
        vocab_size=max(config.text_encoder.vocab_size, 552),
    )
    if n_vocab != config.text_encoder.vocab_size:
        config = dataclasses.replace(
            config,
            text_encoder=dataclasses.replace(
                config.text_encoder, vocab_size=n_vocab,
                bos_token_id=n_vocab - 2, eos_token_id=n_vocab - 1,
                pad_token_id=n_vocab - 1,
            ),
        )

    modules = sampling.SDModules.create(config, dtype=jnp.float32)
    params = sampling.init_params(modules, jax.random.PRNGKey(seed),
                                  image_size=64)
    for comp in ("unet", "vae"):
        sd = {k: np.ascontiguousarray(v) for k, v in
              ckpt.export_torch_state_dict(params[comp]).items()}
        os.makedirs(os.path.join(dst, comp), exist_ok=True)
        st_numpy.save_file(
            sd, os.path.join(dst, comp, "diffusion_pytorch_model.safetensors"))
        with open(os.path.join(dst, comp, "config.json"), "w") as f:
            cls = ("UNet2DConditionModel" if comp == "unet"
                   else "AutoencoderKL")
            json.dump({"_class_name": cls,
                       "in_channels": getattr(config, comp).in_channels},
                      f, indent=2)

    # text encoder: a REAL transformers model so the state-dict names are
    # the upstream library's, not our own export's.
    import torch
    import transformers

    tc = config.text_encoder
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=tc.vocab_size, hidden_size=tc.hidden_size,
        intermediate_size=tc.intermediate_size,
        num_hidden_layers=tc.num_hidden_layers,
        num_attention_heads=tc.num_attention_heads,
        max_position_embeddings=tc.max_position_embeddings,
        bos_token_id=tc.bos_token_id, eos_token_id=tc.eos_token_id,
        pad_token_id=tc.pad_token_id, hidden_act=tc.hidden_act,
        layer_norm_eps=tc.layer_norm_eps, attn_implementation="eager",
    )
    torch.manual_seed(seed)
    text_model = transformers.CLIPTextModel(hf_cfg)
    sd = {k: np.ascontiguousarray(v.detach().numpy())
          for k, v in text_model.state_dict().items()
          # non-persistent-ish buffers diffusers checkpoints omit
          if "position_ids" not in k}
    os.makedirs(os.path.join(dst, "text_encoder"), exist_ok=True)
    st_numpy.save_file(sd, os.path.join(dst, "text_encoder",
                                        "model.safetensors"))
    with open(os.path.join(dst, "text_encoder", "config.json"), "w") as f:
        json.dump(hf_cfg.to_dict(), f, indent=2)

    os.makedirs(os.path.join(dst, "scheduler"), exist_ok=True)
    with open(os.path.join(dst, "scheduler", "scheduler_config.json"),
              "w") as f:
        json.dump({"_class_name": "PNDMScheduler",
                   "skip_prk_steps": True,
                   **dataclasses.asdict(config.scheduler)}, f, indent=2)
    with open(os.path.join(dst, "model_index.json"), "w") as f:
        json.dump({"_class_name": "StableDiffusionPipeline",
                   "_diffusers_version": "0.0.0-rehearsal",
                   "unet": ["diffusers", "UNet2DConditionModel"],
                   "vae": ["diffusers", "AutoencoderKL"],
                   "text_encoder": ["transformers", "CLIPTextModel"],
                   "tokenizer": ["transformers", "CLIPTokenizer"],
                   "scheduler": ["diffusers", "PNDMScheduler"]},
                  f, indent=2)
    print(f"rehearsal pipeline dir -> {dst} (vocab {n_vocab})")
    return config


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
        # prefer the config the pipeline was saved with (e.g. the tiny
        # rehearsal stack); fall back to SD1.5
        config = ckpt.load_pipeline_model_config(pipeline_dir) or C.SD15
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
    # Import + parity probes are a host-side job: pin the CPU backend
    # BEFORE first jax use. The JAX_PLATFORMS env var is NOT enough on
    # relay-attached boxes (the TPU plugin wins; CLAUDE.md) — and a
    # stray import-harness client on the relay can wedge concurrent
    # training. IRET_IMPORT_DEVICE=tpu opts out.
    if os.environ.get("IRET_IMPORT_DEVICE", "cpu") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

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
    p.add_argument("--make_rehearsal", metavar="DIR",
                   help="Build a FAKE diffusers-layout pipeline dir (random "
                        "weights, real names/shapes) to rehearse the import "
                        "path air-gapped; pair with --sd15 <DIR> afterwards")
    args = p.parse_args()

    rehearsal_cfg = None
    if args.make_rehearsal:
        rehearsal_cfg = make_rehearsal_dir(args.make_rehearsal)

    from image_restoration_and_enhancement_tpu import config as C

    sd15_out = os.path.join(args.pretrained_root, "sd15")
    if args.sd15:
        cfg = C.SD15
        if rehearsal_cfg is not None and os.path.abspath(
                args.sd15) == os.path.abspath(args.make_rehearsal):
            cfg = rehearsal_cfg  # tiny rehearsal dir: import with its config
        import_sd_dir(args.sd15, sd15_out, cfg)
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
                args.rrdb, args.check_goldens, args.make_rehearsal]):
        p.print_help()


if __name__ == "__main__":
    main()
