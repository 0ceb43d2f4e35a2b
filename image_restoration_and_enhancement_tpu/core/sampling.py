"""Jitted Stable-Diffusion sampling loops (img2img + inpaint), TPU-native.

Replaces the reference's use of diffusers' StableDiffusionImg2ImgPipeline /
StableDiffusionInpaintPipeline (invoked at src/inference.py:486-494,
:566-573, :664-672, :758-767): CLIP encode -> VAE encode -> strength-
truncated PLMS/DDIM loop with classifier-free guidance inside one
``lax.scan`` -> VAE decode, all in a single jit-compiled function.

Key TPU decisions:
- The whole denoise loop is ONE compiled program: no host round-trips
  between steps (the torch pipeline re-enters Python 20-30x per image).
- Step plans (timesteps, PLMS order codes) are host-precomputed static
  arrays closed over as scan inputs (see core/schedulers.py), so shapes are
  static regardless of `strength`.
- CFG runs as a single batched UNet call over [uncond; cond] (2B batch),
  keeping the MXU fed, and is skipped entirely when guidance_scale <= 1
  (matching diffusers semantics, e.g. the reference SR path's gs=0,
  src/inference.py:570).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SDModelConfig
from ..models.clip_text import CLIPTextModel
from ..models.unet import UNet2DCondition
from ..models.vae import AutoencoderKL
from . import schedulers as sched


@dataclasses.dataclass(frozen=True)
class SDModules:
    """Module bundle for one SD stack (shared across tasks of one config)."""

    config: SDModelConfig
    unet: UNet2DCondition
    vae: AutoencoderKL
    text_encoder: CLIPTextModel
    text_encoder_2: Optional[CLIPTextModel] = None

    @property
    def is_sdxl(self) -> bool:
        return self.config.unet.addition_embed_type == "text_time"

    @classmethod
    def create(
        cls,
        config: SDModelConfig,
        dtype=jnp.bfloat16,
        attention_backend: Optional[str] = None,
        remat: bool = False,
    ) -> "SDModules":
        te2 = None
        if config.text_encoder_2 is not None:
            te2 = CLIPTextModel(config.text_encoder_2, dtype=dtype, with_projection=True)
        return cls(
            config=config,
            unet=UNet2DCondition(
                config.unet, dtype=dtype, attention_backend=attention_backend,
                remat=remat,
            ),
            vae=AutoencoderKL(config.vae, dtype=dtype),
            text_encoder=CLIPTextModel(config.text_encoder, dtype=dtype),
            text_encoder_2=te2,
        )


def encode_text(modules: SDModules, params, input_ids: jnp.ndarray) -> jnp.ndarray:
    """Token ids [B, 77] -> conditioning [B, 77, hidden]."""
    return modules.text_encoder.apply({"params": params["text_encoder"]}, input_ids)


def encode_text_sdxl(
    modules: SDModules, params, input_ids: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SDXL dual-tower conditioning: concat of both towers' penultimate
    hidden states [B, 77, d1+d2] plus the bigG pooled embedding [B, d2]
    (reference SDXL branch, train_denoising.py:531-594)."""
    out1 = modules.text_encoder.apply(
        {"params": params["text_encoder"]}, input_ids, return_dict=True
    )
    out2 = modules.text_encoder_2.apply(
        {"params": params["text_encoder_2"]}, input_ids, return_dict=True
    )
    context = jnp.concatenate(
        [out1["penultimate_hidden_state"], out2["penultimate_hidden_state"]], axis=-1
    )
    return context, out2["pooled"]


def sdxl_time_ids(batch: int, size: int) -> jnp.ndarray:
    """Micro-conditioning ids: (orig_h, orig_w, crop_t, crop_l, tgt_h, tgt_w)."""
    row = jnp.asarray([size, size, 0, 0, size, size], jnp.float32)
    return jnp.broadcast_to(row, (batch, 6))


def encode_image(
    modules: SDModules, params, image: jnp.ndarray, key: jax.Array, sample: bool = True
) -> jnp.ndarray:
    """Image [-1,1] NHWC -> scaled latents (x scaling_factor)."""
    vae = modules.vae
    dist = vae.apply({"params": params["vae"]}, image, method=vae.encode)
    z = dist.sample(key) if sample else dist.mode
    return z * modules.config.vae.scaling_factor


def decode_latents(modules: SDModules, params, latents: jnp.ndarray) -> jnp.ndarray:
    vae = modules.vae
    img = vae.apply(
        {"params": params["vae"]}, latents / modules.config.vae.scaling_factor,
        method=vae.decode,
    )
    return jnp.clip(img, -1.0, 1.0)


def _denoise_loop(
    modules: SDModules,
    params,
    latents: jnp.ndarray,
    context: jnp.ndarray,
    uncond_context: Optional[jnp.ndarray],
    plan: sched.StepPlan,
    guidance_scale: float,
    sampler: str,
    extra_channels: Optional[jnp.ndarray] = None,
    added_cond: Optional[dict] = None,
    cfg_layout: str = "halves",
    collect_quant_stats: bool = False,
    cfg_cache_interval: int = 1,
) -> jnp.ndarray:
    """Run the full sampling loop as one lax.scan.

    extra_channels: per-step constant channels concatenated to the latents
    (the inpaint mask + masked-image latents, diffusers 9-ch layout).
    added_cond: SDXL additive conditioning {"text_embeds", "time_ids"},
    batch-matched to `latents` (duplicated internally under CFG).
    cfg_layout: how the CFG batch of 2B rows is ordered.
      "halves" (default): [all-uncond; all-cond] — matches diffusers and is
        the measured-fastest single-chip layout.
      "interleaved": [img0-u, img0-c, img1-u, img1-c, ...] via a [B,2,...]
        stack/reshape — under data-parallel sharding of the batch axis each
        image's CFG pair lands on the same chip, so the duplicate/split is
        a local reshape instead of a cross-chip all-to-all (verified by HLO
        inspection on an 8-device mesh; "halves" compiles to ~50
        all-to-alls over the denoise loop).
    cfg_cache_interval (k): OPT-IN approximate serving mode. k=1 (default)
      is the exact loop — every step runs the full CFG pair, bit-identical
      to before. k>1 recomputes the UNCOND branch only every k-th step
      (and on the final step), reusing the previous uncond eps between:
      the uncond prediction is prompt-independent and drifts slowly across
      adjacent timesteps, so skipped steps run the UNet at HALF the CFG
      batch. This changes outputs — gate with scripts/eval_quant_quality.py
      (--cfg_cache) before serving with it. The reference has no analog
      (exact 20-step CFG loop, /root/reference/src/inference.py:486-494).
    """
    cfg = modules.config.scheduler
    ac = jnp.asarray(sched.make_alphas_cumprod(cfg), dtype=jnp.float32)
    fa = sched.final_alpha_cumprod(cfg)
    do_cfg = guidance_scale > 1.0 and uncond_context is not None

    # Contexts may be encoded once per prompt ([1, 77, d]); broadcast to the
    # image batch before the CFG stack.
    b = latents.shape[0]
    context = jnp.broadcast_to(context, (b,) + context.shape[1:])
    interleaved = cfg_layout == "interleaved"
    if do_cfg:
        uncond = jnp.broadcast_to(uncond_context, (b,) + uncond_context.shape[1:])
        if interleaved:
            ctx_all = jnp.stack([uncond, context], axis=1).reshape(
                (2 * b,) + context.shape[1:]
            )
        else:
            ctx_all = jnp.concatenate([uncond, context], axis=0)
    else:
        ctx_all = context

    added_all = None
    if added_cond is not None:
        added_all = jax.tree.map(
            lambda v: jnp.broadcast_to(v, (b,) + v.shape[1:]), added_cond
        )
        if do_cfg:
            dup = (
                (lambda v: jnp.repeat(v, 2, axis=0))
                if interleaved
                else (lambda v: jnp.concatenate([v, v], axis=0))
            )
            added_all = jax.tree.map(dup, added_all)

    # CFG prefix dedup: the uncond/cond halves are identical until the
    # first cross-attention, so the UNet can take the half batch and
    # duplicate internally (models/unet.py). Measured on v5e at 512px it
    # LOSES ~2.3% end-to-end (3.13 vs 3.20 img/s: the in-graph duplicate
    # copy + broken fusion patterns outweigh the saved prefix FLOPs), so
    # it is opt-in via IRET_CFG_DEDUP=1. SDXL text_time conditioning is
    # incompatible either way (pooled text feeds the time embedding).
    import os

    dedup = (
        os.environ.get("IRET_CFG_DEDUP") == "1"
        and do_cfg and not modules.is_sdxl
        and not interleaved  # the UNet's internal dup appends halves
        and modules.config.unet.attn_levels[0]
    )

    def unet_eps(lat: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        model_in = lat
        if extra_channels is not None:
            model_in = jnp.concatenate([lat, extra_channels], axis=-1)
        if do_cfg and not dedup:
            if interleaved:
                model_in = jnp.repeat(model_in, 2, axis=0)
            else:
                model_in = jnp.concatenate([model_in, model_in], axis=0)
        eps = modules.unet.apply(
            {"params": params["unet"]},
            model_in,
            jnp.broadcast_to(t, (model_in.shape[0],)),
            ctx_all,
            added_all,
            cfg_dedup=dedup,
        )
        if do_cfg:
            if interleaved:
                pair = eps.reshape((b, 2) + eps.shape[1:])
                eps_u, eps_c = pair[:, 0], pair[:, 1]
            else:
                eps_u, eps_c = jnp.split(eps, 2, axis=0)
            eps = eps_u + guidance_scale * (eps_c - eps_u)
        return eps

    xs = {
        "t": jnp.asarray(plan.timesteps),
        "prev_t": jnp.asarray(plan.prev_timesteps),
        "code": jnp.asarray(plan.order_codes),
        "append": jnp.asarray(plan.append),
    }

    # --- CFG-cache (opt-in, k > 1): see the docstring above ---------------
    k = int(cfg_cache_interval)
    cfg_cache = k > 1 and do_cfg and not dedup and not collect_quant_stats
    if cfg_cache:
        n = len(plan.timesteps)
        full_mask = (np.arange(n) % k == 0)
        full_mask[-1] = True  # always refresh guidance on the final step
        xs["full"] = jnp.asarray(full_mask)

        def unet_eps_cond_only(lat: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
            model_in = lat
            if extra_channels is not None:
                model_in = jnp.concatenate([lat, extra_channels], axis=-1)
            ctx_c = ctx_all[1::2] if interleaved else ctx_all[b:]
            added_c = None
            if added_all is not None:
                added_c = jax.tree.map(
                    (lambda v: v[1::2]) if interleaved else (lambda v: v[b:]),
                    added_all,
                )
            return modules.unet.apply(
                {"params": params["unet"]},
                model_in,
                jnp.broadcast_to(t, (model_in.shape[0],)),
                ctx_c,
                added_c,
            )

        def unet_eps_full(lat: jnp.ndarray, t: jnp.ndarray):
            """Full CFG pair; also returns the fresh uncond eps for reuse."""
            model_in = lat
            if extra_channels is not None:
                model_in = jnp.concatenate([lat, extra_channels], axis=-1)
            if interleaved:
                model_in = jnp.repeat(model_in, 2, axis=0)
            else:
                model_in = jnp.concatenate([model_in, model_in], axis=0)
            eps = modules.unet.apply(
                {"params": params["unet"]},
                model_in,
                jnp.broadcast_to(t, (model_in.shape[0],)),
                ctx_all,
                added_all,
            )
            if interleaved:
                pair = eps.reshape((b, 2) + eps.shape[1:])
                eps_u, eps_c = pair[:, 0], pair[:, 1]
            else:
                eps_u, eps_c = jnp.split(eps, 2, axis=0)
            return eps_u + guidance_scale * (eps_c - eps_u), eps_u

        def eps_with_cache(lat, t, eps_u_prev, full):
            """Returns (guided eps, uncond eps carry), both f32 so the two
            lax.cond branches and the scan carry agree on dtype."""

            def full_branch(lat):
                eps, eps_u = unet_eps_full(lat, t)
                return eps.astype(jnp.float32), eps_u.astype(jnp.float32)

            def cached_branch(lat):
                eps_c = unet_eps_cond_only(lat, t).astype(jnp.float32)
                return (
                    eps_u_prev + guidance_scale * (eps_c - eps_u_prev),
                    eps_u_prev,
                )

            return jax.lax.cond(full, full_branch, cached_branch, lat)

    def unet_eps_stats(lat, t):
        """unet_eps + {site: absmax} for every quantized call in this step.
        The sink entries are traced values of THIS scan-body trace, so they
        must leave the body as scan outputs (core/quant calibration)."""
        from ..ops import quant

        with quant.calib_sink() as sink:
            eps = unet_eps(lat, t)
        stats = {}
        for name, val in sink:
            stats[name] = jnp.maximum(stats[name], val) if name in stats else val
        return eps, stats

    if sampler == "plms":
        if cfg_cache:

            def body(carry, x):
                lat, pc, eps_u = carry
                eps, eps_u = eps_with_cache(lat, x["t"], eps_u, x["full"])
                pc, lat = sched.plms_step(
                    ac, fa, pc, lat, eps, x["t"], x["prev_t"], x["code"],
                    x["append"]
                )
                return (lat, pc, eps_u), None

            init = (latents.astype(jnp.float32),
                    sched.plms_init_carry(latents),
                    jnp.zeros(latents.shape, jnp.float32))
            (latents, _, _), stats = jax.lax.scan(body, init, xs)
        else:

            def body(carry, x):
                lat, pc = carry
                if collect_quant_stats:
                    eps, stats = unet_eps_stats(lat, x["t"])
                else:
                    eps, stats = unet_eps(lat, x["t"]), None
                pc, lat = sched.plms_step(
                    ac, fa, pc, lat, eps, x["t"], x["prev_t"], x["code"],
                    x["append"]
                )
                return (lat, pc), stats

            init = (latents.astype(jnp.float32), sched.plms_init_carry(latents))
            (latents, _), stats = jax.lax.scan(body, init, xs)
    elif sampler == "ddim":
        if cfg_cache:

            def body(carry, x):
                lat, eps_u = carry
                eps, eps_u = eps_with_cache(lat, x["t"], eps_u, x["full"])
                lat = sched.ddim_step(ac, fa, lat, eps, x["t"], x["prev_t"])
                return (lat, eps_u), None

            (latents, _), stats = jax.lax.scan(
                body,
                (latents.astype(jnp.float32),
                 jnp.zeros(latents.shape, jnp.float32)),
                xs,
            )
        else:

            def body(lat, x):
                if collect_quant_stats:
                    eps, stats = unet_eps_stats(lat, x["t"])
                else:
                    eps, stats = unet_eps(lat, x["t"]), None
                return sched.ddim_step(ac, fa, lat, eps, x["t"], x["prev_t"]), stats

            latents, stats = jax.lax.scan(body, latents.astype(jnp.float32), xs)
    else:
        raise ValueError(f"Unknown sampler: {sampler}")
    if collect_quant_stats:
        step_max = jax.tree.map(lambda v: jnp.max(v, axis=0), stats)
        return latents, step_max
    return latents


def make_img2img_fn(
    modules: SDModules,
    num_inference_steps: int,
    strength: float,
    guidance_scale: float,
    sampler: str = "plms",
    jit: bool = True,
    cfg_layout: str = "halves",
    cfg_cache_interval: int = 1,
) -> Callable:
    """Build fn(params, image, prompt_ctx, uncond_ctx, key) -> image.

    `image` NHWC in [-1, 1]; contexts from encode_text — or, for SDXL
    stacks, (context, pooled) tuples from encode_text_sdxl. Deterministic
    given the key (the reference fixes seed 42, src/inference.py:483).
    cfg_cache_interval > 1 enables the opt-in approximate CFG-cache serving
    mode (see _denoise_loop).
    """
    cfg = modules.config.scheduler
    plan_fn = sched.plms_step_plan if sampler == "plms" else sched.ddim_step_plan
    plan = plan_fn(cfg, num_inference_steps, strength)
    ac = jnp.asarray(sched.make_alphas_cumprod(cfg), dtype=jnp.float32)

    def fn(params, image, prompt_ctx, uncond_ctx, key):
        added = None
        if modules.is_sdxl:
            prompt_ctx, pooled = prompt_ctx
            if uncond_ctx is not None:
                # CFG halves share micro-conditioning; pooled embeds differ
                # between uncond/cond only via the context stack below.
                uncond_ctx, _ = uncond_ctx
            added = {
                "text_embeds": pooled,
                "time_ids": sdxl_time_ids(pooled.shape[0], image.shape[1]),
            }
        k_enc, k_noise = jax.random.split(key)
        latents0 = encode_image(modules, params, image, k_enc)
        noise = jax.random.normal(k_noise, latents0.shape, jnp.float32)
        latents = sched.add_noise(ac, latents0, noise, jnp.asarray(plan.init_timestep))
        latents = _denoise_loop(
            modules, params, latents, prompt_ctx, uncond_ctx, plan,
            guidance_scale, sampler, added_cond=added, cfg_layout=cfg_layout,
            cfg_cache_interval=cfg_cache_interval,
        )
        return decode_latents(modules, params, latents)

    return jax.jit(fn) if jit else fn


def make_calib_img2img_fn(
    modules: SDModules,
    num_inference_steps: int,
    strength: float,
    guidance_scale: float,
    sampler: str = "plms",
    jit: bool = True,
    cfg_layout: str = "halves",
) -> Callable:
    """Calibration twin of make_img2img_fn for the int8_static serving mode.

    Runs the identical program under DYNAMIC int8 quantization
    (ops/quant.py) and returns (image, {site: activation_absmax}) where the
    absmax of every quantized conv/dense input is maxed over all denoise
    steps plus the VAE encode/decode. Feed several representative batches,
    take the elementwise max of the dicts, and pass the result to
    quant.load_static_table() before tracing the int8_static serving fn.
    """
    from ..ops import quant

    cfg = modules.config.scheduler
    plan_fn = sched.plms_step_plan if sampler == "plms" else sched.ddim_step_plan
    plan = plan_fn(cfg, num_inference_steps, strength)
    ac = jnp.asarray(sched.make_alphas_cumprod(cfg), dtype=jnp.float32)

    def _merge(into: dict, sink):
        for name, val in sink:
            into[name] = jnp.maximum(into[name], val) if name in into else val

    def fn(params, image, prompt_ctx, uncond_ctx, key):
        with quant.quant_mode("int8"):
            added = None
            if modules.is_sdxl:
                prompt_ctx, pooled = prompt_ctx
                if uncond_ctx is not None:
                    uncond_ctx, _ = uncond_ctx
                added = {
                    "text_embeds": pooled,
                    "time_ids": sdxl_time_ids(pooled.shape[0], image.shape[1]),
                }
            stats: dict = {}
            k_enc, k_noise = jax.random.split(key)
            with quant.calib_sink() as sink:
                latents0 = encode_image(modules, params, image, k_enc)
            _merge(stats, sink)
            noise = jax.random.normal(k_noise, latents0.shape, jnp.float32)
            latents = sched.add_noise(
                ac, latents0, noise, jnp.asarray(plan.init_timestep)
            )
            latents, loop_stats = _denoise_loop(
                modules, params, latents, prompt_ctx, uncond_ctx, plan,
                guidance_scale, sampler, added_cond=added, cfg_layout=cfg_layout,
                collect_quant_stats=True,
            )
            for name, val in loop_stats.items():
                stats[name] = jnp.maximum(stats[name], val) if name in stats else val
            with quant.calib_sink() as sink:
                image_out = decode_latents(modules, params, latents)
            _merge(stats, sink)
            return image_out, stats

    return jax.jit(fn) if jit else fn


def make_inpaint_fn(
    modules: SDModules,
    num_inference_steps: int,
    strength: float,
    guidance_scale: float,
    sampler: str = "ddim",
    jit: bool = True,
    cfg_layout: str = "halves",
    cfg_cache_interval: int = 1,
) -> Callable:
    """Build fn(params, image, mask, prompt_ctx, uncond_ctx, key) -> image.

    9-channel diffusers layout per step: [latents(4), mask(1),
    masked_image_latents(4)]. Note the reference *trains* a different
    order (train_inpainting.py:504-516) than diffusers inference uses —
    here train and inference share this one layout.

    mask: NHWC [B,H,W,1] in {0,1}, 1 = hole to fill.
    """
    cfg = modules.config.scheduler
    plan_fn = sched.plms_step_plan if sampler == "plms" else sched.ddim_step_plan
    plan = plan_fn(cfg, num_inference_steps, strength)
    ac = jnp.asarray(sched.make_alphas_cumprod(cfg), dtype=jnp.float32)

    def fn(params, image, mask, prompt_ctx, uncond_ctx, key):
        k_enc, k_mask_enc, k_noise = jax.random.split(key, 3)
        b, h, w, _ = image.shape
        lat_h, lat_w = h // 8, w // 8

        masked_image = image * (1.0 - mask)
        masked_latents = encode_image(modules, params, masked_image, k_mask_enc)
        mask_lat = jax.image.resize(mask, (b, lat_h, lat_w, 1), method="nearest")

        latents0 = encode_image(modules, params, image, k_enc)
        noise = jax.random.normal(k_noise, latents0.shape, jnp.float32)
        latents = sched.add_noise(ac, latents0, noise, jnp.asarray(plan.init_timestep))

        # extra channels ride along un-noised each step; the loop handles the
        # CFG batch duplication after concatenation.
        latents = _denoise_loop(
            modules, params, latents, prompt_ctx, uncond_ctx, plan,
            guidance_scale, sampler,
            extra_channels=jnp.concatenate([mask_lat, masked_latents], axis=-1),
            cfg_layout=cfg_layout,
            cfg_cache_interval=cfg_cache_interval,
        )
        return decode_latents(modules, params, latents)

    return jax.jit(fn) if jit else fn


def make_sharded_img2img_fn(
    modules: SDModules,
    mesh,
    num_inference_steps: int,
    strength: float,
    guidance_scale: float,
    sampler: str = "plms",
    data_axis: Optional[str] = "data",
    model_axis: Optional[str] = None,
    spatial_axis: Optional[str] = None,
    cfg_cache_interval: int = 1,
):
    """Multi-chip serving: the img2img program jitted over a device mesh.

    `data_axis=None` replicates the batch (single-image high-resolution
    serving over a spatial/model-only mesh). Otherwise the image batch
    (and per-image contexts) shard over `data_axis`, and
    the denoise loop uses the "interleaved" CFG layout so each image's
    uncond/cond pair stays on its own chip — HLO-verified on an 8-device
    mesh to compile with zero collectives in the pure-DP case (the
    "halves" layout compiles to ~50 all-to-alls). The reference serves
    strictly single-GPU (src/inference.py:139-197).
    If `model_axis` is given, UNet projections are additionally
    tensor-parallel over it (Megatron-style, parallel.sharding_rules) and
    XLA inserts the per-layer collectives over ICI.
    If `spatial_axis` is given, the image HEIGHT additionally shards over
    it — the sequence-parallel analog for vision (SURVEY §5.7: resolution
    is this framework's context length). GSPMD partitions the convs
    spatially (halo exchanges over ICI); semantics are unchanged, so one
    image larger than a chip's memory can be served by a mesh row. The
    program is traced under the parallel.spatial policy: UNet/VAE levels
    stay height-sharded only while each shard holds >= 4 rows and are
    pinned to batch-only sharding deeper (XLA's SPMD partitioner returns
    WRONG VALUES for convs on thinner shards — measured geometry in
    parallel/spatial.py; deep levels are a few KB so the gate costs one
    tiny all-gather). Use XLA attention for this mode (the Pallas custom
    calls have no partitioning rule, so GSPMD would gather their operands
    to every chip): build SDModules with attention_backend="xla". The
    image height must divide by the spatial-axis size (even input shards).

    Returns (fn, shard_params_fn): call `params = shard_params_fn(params)`
    once, then fn(params, image, prompt_ctx, uncond_ctx, key) with a global
    batch divisible by the data-axis size.
    """
    inner_fn = make_img2img_fn(
        modules, num_inference_steps, strength, guidance_scale, sampler,
        jit=False, cfg_layout="interleaved",
        cfg_cache_interval=cfg_cache_interval,
    )
    return _shard_serving_fn(
        mesh, inner_fn, data_axis=data_axis, model_axis=model_axis,
        spatial_axis=spatial_axis, n_spatial_args=1,
    )


def make_sharded_inpaint_fn(
    modules: SDModules,
    mesh,
    num_inference_steps: int,
    strength: float,
    guidance_scale: float,
    sampler: str = "ddim",
    data_axis: Optional[str] = "data",
    model_axis: Optional[str] = None,
    spatial_axis: Optional[str] = None,
    cfg_cache_interval: int = 1,
):
    """Multi-chip inpaint serving: make_inpaint_fn jitted over a mesh.

    Same layout contract as make_sharded_img2img_fn (which documents the
    axes); the mask shards like the image ([B, H, W, 1] over
    (data_axis, spatial_axis)). Returns (fn, shard_params_fn) with
    fn(params, image, mask, prompt_ctx, uncond_ctx, key)."""
    inner_fn = make_inpaint_fn(
        modules, num_inference_steps, strength, guidance_scale, sampler,
        jit=False, cfg_layout="interleaved",
        cfg_cache_interval=cfg_cache_interval,
    )
    return _shard_serving_fn(
        mesh, inner_fn, data_axis=data_axis, model_axis=model_axis,
        spatial_axis=spatial_axis, n_spatial_args=2,
    )


def _shard_serving_fn(mesh, inner_fn, data_axis, model_axis, spatial_axis,
                      n_spatial_args):
    """Shared sharding wrapper for the serving factories.

    inner_fn(params, *spatial_args, prompt_ctx, uncond_ctx, key): the first
    n_spatial_args arrays are [B, H, ...]-shaped and shard over
    (data_axis, spatial_axis); contexts shard over data_axis only."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel import sharding_rules as sr
    from ..parallel import spatial as sp_policy

    if spatial_axis is not None:
        # The policy is consulted at TRACE time by the model blocks
        # (models/layers.py constrain_spatial) — activate it around the
        # traced body, not around the jit() call below.
        def base_fn(*call_args):
            with sp_policy.spatial_sharding(
                mesh, data_axis=data_axis, spatial_axis=spatial_axis
            ):
                return inner_fn(*call_args)
    else:
        base_fn = inner_fn

    batch_sh = NamedSharding(mesh, P(data_axis))
    image_sh = NamedSharding(mesh, P(data_axis, spatial_axis))
    repl = NamedSharding(mesh, P())

    def shard_params_fn(params):
        shardings = jax.tree.map(lambda _: repl, params)
        if model_axis is not None:
            shardings = dict(shardings)
            shardings["unet"] = sr.tp_shardings(
                params["unet"], mesh, model_axis=model_axis
            )
        return jax.tree.map(jax.device_put, params, shardings)

    jitted = jax.jit(base_fn, out_shardings=image_sh)

    if spatial_axis is not None:
        sp_size = dict(zip(mesh.axis_names, mesh.devices.shape))[spatial_axis]
    else:
        sp_size = 1

    def fn(params, *args):
        """Contexts must be per-image ([B, 77, d]); the batch B is global
        and must divide by the data-axis size."""
        spatial_args = args[:n_spatial_args]
        prompt_ctx, uncond_ctx, key = args[n_spatial_args:]
        if sp_size > 1 and spatial_args[0].shape[1] % sp_size != 0:
            raise ValueError(
                f"spatial sharding: image height {spatial_args[0].shape[1]} "
                f"must divide by the {spatial_axis!r} axis size {sp_size} "
                f"(uneven input shards)"
            )
        spatial_args = tuple(
            jax.device_put(a, image_sh) for a in spatial_args
        )
        prompt_ctx = jax.device_put(prompt_ctx, batch_sh)
        if uncond_ctx is not None:
            uncond_ctx = jax.device_put(uncond_ctx, batch_sh)
        return jitted(params, *spatial_args, prompt_ctx, uncond_ctx, key)

    return fn, shard_params_fn


def init_params(
    modules: SDModules, key: jax.Array, image_size: int = 256, seq_len: int = 77
):
    """Random-init the full parameter bundle {unet, vae, text_encoder[,_2]}."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    lat = image_size // 8
    ucfg = modules.config.unet
    added = None
    if modules.is_sdxl:
        pooled_dim = modules.config.text_encoder_2.hidden_size
        added = {
            "text_embeds": jnp.zeros((1, pooled_dim)),
            "time_ids": jnp.zeros((1, 6)),
        }
    unet_vars = modules.unet.init(
        k1,
        jnp.zeros((1, lat, lat, ucfg.in_channels)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, seq_len, ucfg.cross_attention_dim)),
        added,
    )
    vae_vars = modules.vae.init(k2, jnp.zeros((1, 16, 16, modules.config.vae.in_channels)))
    te_vars = modules.text_encoder.init(k3, jnp.zeros((1, seq_len), jnp.int32))
    out = {
        "unet": unet_vars["params"],
        "vae": vae_vars["params"],
        "text_encoder": te_vars["params"],
    }
    if modules.text_encoder_2 is not None:
        out["text_encoder_2"] = modules.text_encoder_2.init(
            k4, jnp.zeros((1, seq_len), jnp.int32), return_dict=True
        )["params"]
    return out
