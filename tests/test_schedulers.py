"""Scheduler math: tables, add_noise, DDIM/PLMS step plans and steps."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_restoration_and_enhancement_tpu.config import SchedulerConfig
from image_restoration_and_enhancement_tpu.core import schedulers as sched

CFG = SchedulerConfig()


def test_beta_table_endpoints():
    betas = sched.make_betas(CFG)
    assert betas.shape == (1000,)
    np.testing.assert_allclose(betas[0], 0.00085, rtol=1e-6)
    np.testing.assert_allclose(betas[-1], 0.012, rtol=1e-6)
    # scaled_linear: sqrt(beta) is linear
    sq = np.sqrt(betas)
    diffs = np.diff(sq)
    np.testing.assert_allclose(diffs, diffs[0], rtol=1e-5)


def test_alphas_cumprod_monotone():
    ac = sched.make_alphas_cumprod(CFG)
    assert np.all(np.diff(ac) < 0)
    assert 0 < ac[-1] < ac[0] < 1


def test_add_noise_matches_closed_form():
    ac = jnp.asarray(sched.make_alphas_cumprod(CFG), dtype=jnp.float32)
    x = jnp.ones((2, 4, 4, 4))
    n = jnp.full((2, 4, 4, 4), 2.0)
    t = jnp.array([0, 999])
    out = sched.add_noise(ac, x, n, t)
    for b, tt in enumerate([0, 999]):
        expect = np.sqrt(ac[tt]) * 1.0 + np.sqrt(1 - ac[tt]) * 2.0
        np.testing.assert_allclose(out[b], expect, rtol=1e-5)


def test_pred_x0_inverts_add_noise():
    ac = jnp.asarray(sched.make_alphas_cumprod(CFG), dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (1, 8, 8, 4))
    eps = jax.random.normal(jax.random.fold_in(key, 1), (1, 8, 8, 4))
    t = jnp.array([500])
    xt = sched.add_noise(ac, x0, eps, t)
    rec = sched.pred_x0_from_eps(ac, xt, eps, t)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), atol=1e-4)


def test_ddim_plan_leading_spacing():
    plan = sched.ddim_step_plan(CFG, 20, strength=1.0)
    # leading spacing: 0,50,...,950 then +1 offset, descending
    expect = (np.arange(20) * 50 + 1)[::-1]
    np.testing.assert_array_equal(plan.timesteps, expect)
    np.testing.assert_array_equal(plan.prev_timesteps, expect - 50)
    assert plan.init_timestep == 951


def test_ddim_plan_strength_truncation():
    plan = sched.ddim_step_plan(CFG, 20, strength=0.5)
    # init_timestep=10 -> t_start=10 -> 10 steps remain
    assert plan.num_calls == 10
    assert plan.init_timestep == 451
    assert plan.timesteps[-1] == 1


def test_plms_plan_duplicate_second_step():
    plan = sched.plms_step_plan(CFG, 20, strength=1.0)
    assert plan.num_calls == 21
    # raw list duplicates the second entry; call 1 swaps to (t+ratio, t)
    assert plan.timesteps[0] == 951
    assert plan.timesteps[1] == 951  # 901 + 50 swap
    assert plan.prev_timesteps[1] == 901
    assert plan.order_codes[0] == 0
    assert plan.order_codes[1] == 1
    assert not plan.append[1]
    assert plan.order_codes[2] == 2
    assert plan.order_codes[3] == 3
    assert list(plan.order_codes[4:]) == [4] * (plan.num_calls - 4)


def test_plms_plan_strength():
    plan = sched.plms_step_plan(CFG, 20, strength=0.5)
    # full list has 21 entries; t_start=10 -> 11 calls
    assert plan.num_calls == 11
    assert plan.order_codes[0] == 0
    assert plan.order_codes[1] == 1


def test_ddim_step_perfect_eps_recovers_x0():
    """With the true eps at every step, DDIM walks back to
    sqrt(fa)*x0 + sqrt(1-fa)*eps (set_alpha_to_one=False ends at
    alpha_bar[0], not 1)."""
    ac = jnp.asarray(sched.make_alphas_cumprod(CFG), dtype=jnp.float32)
    fa = sched.final_alpha_cumprod(CFG)
    key = jax.random.PRNGKey(1)
    x0 = jax.random.normal(key, (1, 4, 4, 4))
    eps = jax.random.normal(jax.random.fold_in(key, 2), (1, 4, 4, 4))
    plan = sched.ddim_step_plan(CFG, 50, strength=1.0)
    sample = sched.add_noise(ac, x0, eps, jnp.array(plan.init_timestep))
    for i in range(plan.num_calls):
        t = jnp.array(plan.timesteps[i])
        pt = jnp.array(plan.prev_timesteps[i])
        # true eps consistent with (sample, x0) at time t
        a_t = ac[t]
        true_eps = (sample - jnp.sqrt(a_t) * x0) / jnp.sqrt(1 - a_t)
        sample = sched.ddim_step(ac, fa, sample, true_eps, t, pt)
    expect = np.sqrt(fa) * np.asarray(x0) + np.sqrt(1 - fa) * np.asarray(true_eps)
    np.testing.assert_allclose(np.asarray(sample), expect, atol=5e-3)
    np.testing.assert_allclose(np.asarray(sample), np.asarray(x0), atol=0.2)


def test_plms_step_perfect_eps_recovers_x0():
    ac = jnp.asarray(sched.make_alphas_cumprod(CFG), dtype=jnp.float32)
    fa = sched.final_alpha_cumprod(CFG)
    key = jax.random.PRNGKey(3)
    x0 = jax.random.normal(key, (1, 4, 4, 4))
    eps = jax.random.normal(jax.random.fold_in(key, 4), (1, 4, 4, 4))
    plan = sched.plms_step_plan(CFG, 50, strength=1.0)
    sample = sched.add_noise(ac, x0, eps, jnp.array(plan.init_timestep))
    carry = sched.plms_init_carry(sample)
    for i in range(plan.num_calls):
        t = jnp.array(plan.timesteps[i])
        pt = jnp.array(plan.prev_timesteps[i])
        a_t = ac[t]
        true_eps = (sample - jnp.sqrt(a_t) * x0) / jnp.sqrt(1 - a_t)
        carry, sample = sched.plms_step(
            ac, fa, carry, sample, true_eps, t, pt,
            jnp.array(plan.order_codes[i]), jnp.array(plan.append[i]),
        )
    # Ends at alpha_bar[0] (set_alpha_to_one=False): x0 up to ~sqrt(1-fa).
    np.testing.assert_allclose(np.asarray(sample), np.asarray(x0), atol=0.2)
    err = np.abs(np.asarray(sample) - np.asarray(x0)).mean()
    assert err < 0.1


def test_plms_reference_state_machine_parity():
    """Cross-check plms_step against an independent re-derivation of the
    diffusers PLMS state machine (mutable-list style) on random eps."""
    n_steps = 8
    ac = sched.make_alphas_cumprod(CFG).astype(np.float64)
    fa = sched.final_alpha_cumprod(CFG)
    rng = np.random.default_rng(0)
    sample0 = rng.normal(size=(2, 2)).astype(np.float64)
    eps_seq = rng.normal(size=(n_steps + 1, 2, 2)).astype(np.float64)

    ratio = CFG.num_train_timesteps // n_steps
    asc = np.arange(n_steps) * ratio + CFG.steps_offset
    full = np.concatenate([asc[:-1], asc[-2:-1], asc[-1:]])[::-1]

    # --- mutable-state emulation of diffusers.step_plms ---
    def get_prev(sample, t, pt, e):
        a_t = ac[t]
        a_prev = ac[pt] if pt >= 0 else fa
        coeff = (a_prev / a_t) ** 0.5
        denom = a_t * (1 - a_prev) ** 0.5 + (a_t * (1 - a_t) * a_prev) ** 0.5
        return coeff * sample - (a_prev - a_t) * e / denom

    ets, cur_sample, counter = [], None, 0
    sample = sample0.copy()
    expected = []
    for t in full:
        e = eps_seq[counter]
        pt = t - ratio
        if counter != 1:
            ets = ets[-3:] + [e]
        else:
            pt, t = t, t + ratio
        if len(ets) == 1 and counter == 0:
            eff = e
            cur_sample = sample
        elif len(ets) == 1 and counter == 1:
            eff = (e + ets[-1]) / 2
            sample = cur_sample
        elif len(ets) == 2:
            eff = (3 * ets[-1] - ets[-2]) / 2
        elif len(ets) == 3:
            eff = (23 * ets[-1] - 16 * ets[-2] + 5 * ets[-3]) / 12
        else:
            eff = (55 * ets[-1] - 59 * ets[-2] + 37 * ets[-3] - 9 * ets[-4]) / 24
        sample = get_prev(sample, t, pt, eff)
        expected.append(sample.copy())
        counter += 1

    # --- our pure-functional version ---
    plan = sched.plms_step_plan(CFG, n_steps, strength=1.0)
    acj = jnp.asarray(ac, dtype=jnp.float32)
    s = jnp.asarray(sample0, dtype=jnp.float32)
    carry = sched.plms_init_carry(s)
    for i in range(plan.num_calls):
        carry, s = sched.plms_step(
            acj, fa, carry, s, jnp.asarray(eps_seq[i], dtype=jnp.float32),
            jnp.array(plan.timesteps[i]), jnp.array(plan.prev_timesteps[i]),
            jnp.array(plan.order_codes[i]), jnp.array(plan.append[i]),
        )
        np.testing.assert_allclose(np.asarray(s), expected[i], rtol=2e-4, atol=2e-4)


def test_ddpm_step_t0_returns_mean():
    ac = jnp.asarray(sched.make_alphas_cumprod(CFG), dtype=jnp.float32)
    x = jnp.ones((1, 2, 2, 4))
    eps = jnp.zeros_like(x)
    noise = jnp.ones_like(x) * 100.0  # must be ignored at t=0
    out = sched.ddpm_step(ac, x, eps, jnp.array(0), noise)
    assert np.all(np.isfinite(np.asarray(out)))
    assert np.abs(np.asarray(out)).max() < 10.0
