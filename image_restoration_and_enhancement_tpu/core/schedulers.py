"""Diffusion noise schedulers as pure, jittable functions.

TPU-first re-implementation of the scheduler semantics the reference consumes
from `diffusers`:

- ``DDPMScheduler.add_noise`` — used by all four trainers (reference:
  scripts/train_denoising.py:641).
- ``PNDMScheduler`` with ``skip_prk_steps=True`` (i.e. PLMS) — the img2img
  inference sampler (reference: outputs/models/denoising/best/scheduler/
  scheduler_config.json: scaled_linear betas 0.00085->0.012, 1000 steps,
  epsilon prediction, steps_offset 1, "leading" spacing).
- ``DDIMScheduler`` — the inpaint sampler (reference: outputs/models/
  inpainting/best/scheduler/scheduler_config.json).

Design: diffusers keeps *mutable Python state* (ets buffer, counter) inside
scheduler objects and decides step behavior at call time. That doesn't map to
XLA. Here every run is split into:

1. a **host-side static step plan** (`ddim_step_plan` / `plms_step_plan`):
   numpy arrays of per-call effective timesteps, previous timesteps and PLMS
   order codes, with the img2img `strength` truncation and the PLMS
   counter==1 timestep-swap baked in; and
2. **pure jittable step functions** that consume plan rows inside
   `lax.scan` — the PLMS multistep history becomes an explicit carry
   (`PlmsCarry`) instead of object state.

This gives bit-faithful diffusers semantics with fully static shapes.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SchedulerConfig

# ---------------------------------------------------------------------------
# Schedule tables
# ---------------------------------------------------------------------------


def make_betas(cfg: SchedulerConfig) -> np.ndarray:
    """Beta schedule table, float64 on host for precision."""
    if cfg.beta_schedule == "scaled_linear":
        return (
            np.linspace(
                cfg.beta_start**0.5,
                cfg.beta_end**0.5,
                cfg.num_train_timesteps,
                dtype=np.float64,
            )
            ** 2
        )
    if cfg.beta_schedule == "linear":
        return np.linspace(
            cfg.beta_start, cfg.beta_end, cfg.num_train_timesteps, dtype=np.float64
        )
    raise ValueError(f"Unknown beta schedule: {cfg.beta_schedule}")


def make_alphas_cumprod(cfg: SchedulerConfig) -> np.ndarray:
    """Cumulative product of alphas, the only table samplers need."""
    return np.cumprod(1.0 - make_betas(cfg), axis=0)


def final_alpha_cumprod(cfg: SchedulerConfig) -> float:
    """alpha_bar used for the step to "before time 0"."""
    ac = make_alphas_cumprod(cfg)
    return 1.0 if cfg.set_alpha_to_one else float(ac[0])


# ---------------------------------------------------------------------------
# Forward process
# ---------------------------------------------------------------------------


def add_noise(
    alphas_cumprod: jnp.ndarray,
    sample: jnp.ndarray,
    noise: jnp.ndarray,
    timesteps: jnp.ndarray,
) -> jnp.ndarray:
    """q(x_t | x_0): sqrt(a_bar_t) x_0 + sqrt(1 - a_bar_t) eps.

    `timesteps` is integer, shaped [B] (or scalar); broadcasts over
    trailing sample dims. Math in float32 regardless of sample dtype.
    """
    ac = alphas_cumprod[timesteps].astype(jnp.float32)
    while ac.ndim < sample.ndim:
        ac = ac[..., None]
    out = jnp.sqrt(ac) * sample.astype(jnp.float32) + jnp.sqrt(1.0 - ac) * noise.astype(
        jnp.float32
    )
    return out.astype(sample.dtype)


def pred_x0_from_eps(
    alphas_cumprod: jnp.ndarray,
    sample: jnp.ndarray,
    eps: jnp.ndarray,
    timesteps: jnp.ndarray,
) -> jnp.ndarray:
    """x_0 estimate from an epsilon prediction (used by the L1 image loss)."""
    ac = alphas_cumprod[timesteps].astype(jnp.float32)
    while ac.ndim < sample.ndim:
        ac = ac[..., None]
    x0 = (sample.astype(jnp.float32) - jnp.sqrt(1.0 - ac) * eps.astype(jnp.float32)) / jnp.sqrt(ac)
    return x0.astype(sample.dtype)


# ---------------------------------------------------------------------------
# Step plans (host-side, static)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class StepPlan:
    """Static per-call schedule for one sampling run.

    Attributes:
      timesteps: int32 [S] — effective timestep fed to the model at call i.
        (For PLMS call 1 this includes diffusers' t <- t + ratio swap.)
      prev_timesteps: int32 [S] — effective previous timestep at call i.
      order_codes: int32 [S] — PLMS combine rule per call: 0 = raw eps,
        1 = avg with history (and restore cur_sample), 2/3/4 = multistep
        order. All zeros for DDIM.
      append: bool [S] — whether call i pushes eps into the history buffer
        (False only for PLMS call 1).
      init_timestep: the timestep used to noise the init latents for
        img2img (== timesteps[0]).
      num_inference_steps: the *pre-truncation* step count (sets ratio).
    """

    timesteps: np.ndarray
    prev_timesteps: np.ndarray
    order_codes: np.ndarray
    append: np.ndarray
    init_timestep: int
    num_inference_steps: int

    @property
    def num_calls(self) -> int:
        return int(self.timesteps.shape[0])


def _leading_timesteps_ascending(cfg: SchedulerConfig, num_inference_steps: int) -> np.ndarray:
    """diffusers "leading" spacing: i * (T // S), rounded, + steps_offset."""
    ratio = cfg.num_train_timesteps // num_inference_steps
    return (np.arange(num_inference_steps) * ratio).round().astype(np.int64) + cfg.steps_offset


def _strength_start(num_inference_steps: int, strength: float) -> int:
    """diffusers img2img get_timesteps truncation point (scheduler order 1)."""
    init_timestep = min(int(num_inference_steps * strength), num_inference_steps)
    return max(num_inference_steps - init_timestep, 0)


def ddim_step_plan(
    cfg: SchedulerConfig, num_inference_steps: int, strength: float = 1.0
) -> StepPlan:
    """DDIM plan with img2img strength truncation."""
    ratio = cfg.num_train_timesteps // num_inference_steps
    full = _leading_timesteps_ascending(cfg, num_inference_steps)[::-1]
    trunc = full[_strength_start(num_inference_steps, strength) :].copy()
    if trunc.size == 0:  # strength == 0: nothing to do; keep 1 no-op-ish step
        trunc = full[-1:].copy()
    prev = trunc - ratio
    zeros = np.zeros_like(trunc)
    return StepPlan(
        timesteps=trunc.astype(np.int32),
        prev_timesteps=prev.astype(np.int32),
        order_codes=zeros.astype(np.int32),
        append=np.ones_like(trunc, dtype=bool),
        init_timestep=int(trunc[0]),
        num_inference_steps=num_inference_steps,
    )


def plms_step_plan(
    cfg: SchedulerConfig, num_inference_steps: int, strength: float = 1.0
) -> StepPlan:
    """PLMS (PNDM skip_prk_steps=True) plan with strength truncation.

    Reproduces diffusers' timestep list — descending with the second entry
    duplicated — and its call-counter behavior: the counter-1 call swaps
    (t, prev_t) and does not append to the eps history.
    """
    ratio = cfg.num_train_timesteps // num_inference_steps
    asc = _leading_timesteps_ascending(cfg, num_inference_steps)
    full = np.concatenate([asc[:-1], asc[-2:-1], asc[-1:]])[::-1]
    trunc = full[_strength_start(num_inference_steps, strength) :].copy()
    if trunc.size == 0:
        trunc = full[-1:].copy()

    ts, prevs, codes, append = [], [], [], []
    ets_len = 0
    for counter, t in enumerate(int(x) for x in trunc):
        prev_t = t - ratio
        if counter == 1:
            # diffusers step_plms: second call re-runs the first timestep pair
            # swapped and skips the history append.
            prev_t, t = t, t + ratio
            append.append(False)
            codes.append(1)
        else:
            ets_len = min(ets_len + 1, 4)
            append.append(True)
            if counter == 0:
                codes.append(0)
            else:
                codes.append(min(ets_len, 4))
        ts.append(t)
        prevs.append(prev_t)
    return StepPlan(
        timesteps=np.asarray(ts, dtype=np.int32),
        prev_timesteps=np.asarray(prevs, dtype=np.int32),
        order_codes=np.asarray(codes, dtype=np.int32),
        append=np.asarray(append, dtype=bool),
        init_timestep=int(trunc[0]),
        num_inference_steps=num_inference_steps,
    )


# ---------------------------------------------------------------------------
# Pure step functions
# ---------------------------------------------------------------------------


def ddim_step(
    alphas_cumprod: jnp.ndarray,
    final_alpha: float,
    sample: jnp.ndarray,
    eps: jnp.ndarray,
    t: jnp.ndarray,
    prev_t: jnp.ndarray,
) -> jnp.ndarray:
    """Deterministic DDIM update (eta = 0, epsilon prediction).

    x_{t-1} = sqrt(a_prev) * x0_pred + sqrt(1 - a_prev) * eps
    """
    sample = sample.astype(jnp.float32)
    eps = eps.astype(jnp.float32)
    a_t = alphas_cumprod[t].astype(jnp.float32)
    a_prev = jnp.where(
        prev_t >= 0, alphas_cumprod[jnp.maximum(prev_t, 0)], jnp.float32(final_alpha)
    ).astype(jnp.float32)
    x0 = (sample - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
    return jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps


def ddpm_step(
    alphas_cumprod: jnp.ndarray,
    sample: jnp.ndarray,
    eps: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """Ancestral DDPM update with fixed-small posterior variance."""
    sample = sample.astype(jnp.float32)
    eps = eps.astype(jnp.float32)
    a_t = alphas_cumprod[t].astype(jnp.float32)
    a_prev = jnp.where(t > 0, alphas_cumprod[jnp.maximum(t - 1, 0)], jnp.float32(1.0))
    alpha_t = a_t / a_prev
    beta_t = 1.0 - alpha_t
    x0 = (sample - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
    mean = (
        jnp.sqrt(a_prev) * beta_t / (1.0 - a_t) * x0
        + jnp.sqrt(alpha_t) * (1.0 - a_prev) / (1.0 - a_t) * sample
    )
    var = jnp.clip(beta_t * (1.0 - a_prev) / (1.0 - a_t), 1e-20)
    return mean + jnp.where(t > 0, jnp.sqrt(var) * noise.astype(jnp.float32), 0.0)


class PlmsCarry(NamedTuple):
    """Explicit carry replacing diffusers' mutable PLMS state.

    ets: [4, ...] history of eps predictions, most recent first.
    cur_sample: the latents saved at call 0 and restored at call 1.
    """

    ets: jnp.ndarray
    cur_sample: jnp.ndarray


def plms_init_carry(latents: jnp.ndarray) -> PlmsCarry:
    z = jnp.zeros_like(latents, dtype=jnp.float32)
    return PlmsCarry(ets=jnp.stack([z, z, z, z]), cur_sample=z)


def _plms_prev_sample(
    alphas_cumprod: jnp.ndarray,
    final_alpha: float,
    sample: jnp.ndarray,
    eps_eff: jnp.ndarray,
    t: jnp.ndarray,
    prev_t: jnp.ndarray,
) -> jnp.ndarray:
    """diffusers PNDMScheduler._get_prev_sample, epsilon prediction."""
    a_t = alphas_cumprod[t].astype(jnp.float32)
    a_prev = jnp.where(
        prev_t >= 0, alphas_cumprod[jnp.maximum(prev_t, 0)], jnp.float32(final_alpha)
    ).astype(jnp.float32)
    b_t = 1.0 - a_t
    b_prev = 1.0 - a_prev
    sample_coeff = jnp.sqrt(a_prev / a_t)
    denom = a_t * jnp.sqrt(b_prev) + jnp.sqrt(a_t * b_t * a_prev)
    return sample_coeff * sample - (a_prev - a_t) * eps_eff / denom


def plms_step(
    alphas_cumprod: jnp.ndarray,
    final_alpha: float,
    carry: PlmsCarry,
    sample: jnp.ndarray,
    eps: jnp.ndarray,
    t: jnp.ndarray,
    prev_t: jnp.ndarray,
    order_code: jnp.ndarray,
    append: jnp.ndarray,
) -> Tuple[PlmsCarry, jnp.ndarray]:
    """One PLMS call. Returns (new_carry, prev_sample).

    order_code selects the eps combination (see StepPlan); append gates the
    history push. Both come from the static plan but are passed as traced
    scan inputs so a single compiled step serves the whole loop.
    """
    sample = sample.astype(jnp.float32)
    eps = eps.astype(jnp.float32)
    ets, cur_sample = carry.ets, carry.cur_sample

    pushed = jnp.concatenate([eps[None], ets[:-1]], axis=0)
    ets = jnp.where(append, pushed, ets)

    def c0(_):
        return eps

    def c1(_):
        # History was not pushed this call: ets[0] is the call-0 eps.
        return (eps + ets[0]) / 2.0

    def c2(_):
        return (3.0 * ets[0] - ets[1]) / 2.0

    def c3(_):
        return (23.0 * ets[0] - 16.0 * ets[1] + 5.0 * ets[2]) / 12.0

    def c4(_):
        return (55.0 * ets[0] - 59.0 * ets[1] + 37.0 * ets[2] - 9.0 * ets[3]) / 24.0

    eps_eff = jax.lax.switch(jnp.clip(order_code, 0, 4), [c0, c1, c2, c3, c4], None)

    # Call 0 banks the sample; call 1 restores it.
    new_cur = jnp.where(order_code == 0, sample, cur_sample)
    use_sample = jnp.where(order_code == 1, cur_sample, sample)

    prev_sample = _plms_prev_sample(
        alphas_cumprod, final_alpha, use_sample, eps_eff, t, prev_t
    )
    return PlmsCarry(ets=ets, cur_sample=new_cur), prev_sample
