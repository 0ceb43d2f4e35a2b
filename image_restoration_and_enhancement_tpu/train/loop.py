"""Generic data-parallel fine-tune step for all four restoration tasks.

One jitted train step replaces the four near-identical torch loops
(reference: scripts/train_denoising.py:614-722, train_super_resolution.py,
train_colorization.py, train_inpainting.py). Recipe parity:

- freeze VAE + text encoder, train the UNet only       (train_denoising.py:248-249)
- epsilon-MSE with the soft-conditioning latent blend  (:634-646)
- optional lambda * L1 image loss                       (:681-697) — NOTE the
  reference decodes the predicted image under torch.no_grad(), so its L1
  term carries no gradient; here the decode is differentiated (the term
  actually trains), with `stop_image_grad=True` available for bug-parity.
- AdamW lr 5e-6 betas (0.9,0.999) wd 0.01              (:255-260)
- cosine schedule, 5% warmup                            (:267-272)
- grad clip 1.0                                         (:706-707)
- gradient accumulation (optax.MultiSteps)              (accelerate accum 8)
- NaN/Inf loss skip (optax.apply_if_finite)             (:699-702)

TPU-native: bf16 compute / fp32 params+optimizer, batch sharded over the
`data` mesh axis with XLA-inserted gradient all-reduce, text embeddings
precomputed once (:527-610) and closed over.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SDModelConfig
from ..core import schedulers as sched
from ..core.sampling import SDModules
from ..tasks.registry import TaskSpec, soft_conditioning_blend


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Trainer knobs; defaults mirror the reference CLIs
    (train_denoising.py:930-965)."""

    num_epochs: int = 10
    batch_size: int = 1  # per-step global batch
    learning_rate: float = 5e-6
    gradient_accumulation_steps: int = 8
    weight_decay: float = 0.01
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    max_grad_norm: float = 1.0
    warmup_frac: float = 0.05
    lambda_img: float = 0.05
    image_size: int = 256
    seed: int = 42
    save_steps: int = 500
    stop_image_grad: bool = False  # True = reproduce the reference's no-grad L1
    # "adamw" = reference recipe (needs ~10GB optimizer state for the 860M
    # UNet in fp32); "adafactor" = factored second moments, the memory-lean
    # choice for single 16GB chips (fits 256px batch 8 with remat).
    optimizer: str = "adamw"
    # NaN/Inf skip: "apply_if_finite" (exact reference semantics, costs a
    # zeros/select temp per param) or "zero_grads" (lighter: non-finite
    # grads are zeroed, optimizer still steps with zero gradient).
    nan_guard: str = "apply_if_finite"
    # Orbax train-state (exact resume) save cadence in EPOCHS. The final
    # epoch is always saved. The state is ~3.2GiB for the 860M UNet; on
    # slow disks an every-epoch cadence dominated wall-clock (measured:
    # 12.5min/save vs 2-6min compute epochs). 0 = final epoch only.
    state_save_epochs: int = 5


class TrainState(train_state.TrainState):
    """Flax TrainState over UNet params only (VAE/CLIP frozen outside)."""


def make_optimizer(cfg: TrainConfig, num_train_steps: int) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.learning_rate,
        warmup_steps=max(1, int(num_train_steps * cfg.warmup_frac)),
        decay_steps=max(2, num_train_steps),
        end_value=0.0,
    )
    if cfg.optimizer == "adamw":
        opt = optax.adamw(
            schedule, b1=cfg.adam_b1, b2=cfg.adam_b2, weight_decay=cfg.weight_decay
        )
    elif cfg.optimizer == "adafactor":
        opt = optax.adafactor(schedule)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer}")
    parts = [optax.clip_by_global_norm(cfg.max_grad_norm), opt]
    if cfg.nan_guard == "zero_grads":
        parts.insert(0, optax.zero_nans())
    tx = optax.chain(*parts)
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    if cfg.nan_guard == "apply_if_finite":
        # Skip updates on non-finite grads (reference NaN/Inf loss skip).
        tx = optax.apply_if_finite(tx, max_consecutive_errors=10_000)
    return tx


def create_train_state(
    cfg: TrainConfig, unet_params, num_train_steps: int, apply_fn=None
) -> TrainState:
    return TrainState.create(
        apply_fn=apply_fn, params=unet_params, tx=make_optimizer(cfg, num_train_steps)
    )


def make_loss_fn(
    modules: SDModules, task: TaskSpec, cfg: TrainConfig
) -> Callable:
    """Build loss(unet_params, frozen, batch, context, key) -> (loss, metrics).

    batch: {"input": [B,H,W,3] in [-1,1], "gt": [B,H,W,3],
            optional "mask": [B,H,W,1] in {0,1}}.
    context: [1 or B, 77, ctx_dim] precomputed text embeddings.
    """
    sch = modules.config.scheduler
    ac = jnp.asarray(sched.make_alphas_cumprod(sch), dtype=jnp.float32)
    sf = modules.config.vae.scaling_factor
    vae = modules.vae
    uses_mask = task.uses_mask

    def loss_fn(unet_params, frozen, batch, context, key):
        k_t, k_noise, k_enc1, k_enc2 = jax.random.split(key, 4)
        inp, gt = batch["input"], batch["gt"]
        b = gt.shape[0]

        # Frozen VAE encodes (sampled posteriors, as the reference does).
        enc = lambda img, k: vae.apply(
            {"params": frozen["vae"]}, img, method=vae.encode
        ).sample(k) * sf
        input_latents = jax.lax.stop_gradient(enc(inp, k_enc1))
        gt_latents = jax.lax.stop_gradient(enc(gt, k_enc2))

        t = jax.random.randint(k_t, (b,), 0, sch.num_train_timesteps)
        noise = jax.random.normal(k_noise, gt_latents.shape, jnp.float32)
        noisy_gt = sched.add_noise(ac, gt_latents, noise, t)
        model_input = soft_conditioning_blend(
            input_latents, noisy_gt, t, sch.num_train_timesteps
        )

        if uses_mask:
            mask = batch["mask"]
            lh, lw = model_input.shape[1], model_input.shape[2]
            mask_lat = jax.image.resize(mask, (b, lh, lw, 1), method="nearest")
            # diffusers 9-ch order: [latents, mask, masked_image_latents];
            # the training input IS the masked image, so its latents fill
            # the masked-image slot.
            model_input = jnp.concatenate([model_input, mask_lat, input_latents], axis=-1)

        # SDXL stacks condition on (context, pooled) plus time ids
        # (reference SDXL branch, train_denoising.py:531-594).
        added = None
        if isinstance(context, tuple):
            context_arr, pooled = context
            from ..core.sampling import sdxl_time_ids

            added = {
                "text_embeds": jnp.broadcast_to(pooled, (b,) + pooled.shape[1:]),
                "time_ids": sdxl_time_ids(b, gt.shape[1]),
            }
        else:
            context_arr = context
        ctx = jnp.broadcast_to(context_arr, (b,) + context_arr.shape[1:])
        eps_pred = modules.unet.apply(
            {"params": unet_params}, model_input, t, ctx, added
        )

        mse = jnp.mean((eps_pred - noise) ** 2)
        metrics = {"mse": mse}
        loss = mse

        if cfg.lambda_img > 0.0:
            pred_x0 = sched.pred_x0_from_eps(ac, noisy_gt, eps_pred, t)
            if cfg.stop_image_grad:
                pred_x0 = jax.lax.stop_gradient(pred_x0)
            pred_img = vae.apply(
                {"params": frozen["vae"]}, pred_x0 / sf, method=vae.decode
            )
            # reference compares in [0,1] space (train_denoising.py:692-697)
            img_l1 = jnp.mean(jnp.abs((pred_img + 1.0) / 2.0 - (gt + 1.0) / 2.0))
            loss = loss + cfg.lambda_img * img_l1
            metrics["img_l1"] = img_l1

        metrics["loss"] = loss
        return loss, metrics

    return loss_fn


def make_train_step(
    modules: SDModules,
    task: TaskSpec,
    cfg: TrainConfig,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
) -> Callable:
    """Build the jitted step(state, frozen, batch, context, key) ->
    (state, metrics). With a mesh, the batch is sharded over `data` and the
    gradient all-reduce is inserted by XLA from sharding propagation."""
    loss_fn = make_loss_fn(modules, task, cfg)

    def step(state: TrainState, frozen, batch, context, key):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, frozen, batch, context, key
        )
        new_state = state.apply_gradients(grads=grads)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step,
        in_shardings=(repl, repl, data, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )
