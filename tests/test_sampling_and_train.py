"""End-to-end tiny-model tests: jitted sampling loops + the train step,
including the 8-virtual-device data-parallel path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_restoration_and_enhancement_tpu import config as C
from image_restoration_and_enhancement_tpu.core import sampling
from image_restoration_and_enhancement_tpu.parallel import mesh as meshlib
from image_restoration_and_enhancement_tpu.tasks.registry import get_task
from image_restoration_and_enhancement_tpu.train import loop as train_loop


@pytest.fixture(scope="module")
def tiny_stack():
    modules = sampling.SDModules.create(
        C.TINY_SD, dtype=jnp.float32, attention_backend="xla"
    )
    params = sampling.init_params(modules, jax.random.PRNGKey(0), image_size=64)
    return modules, params


@pytest.fixture(scope="module")
def tiny_inpaint_stack():
    modules = sampling.SDModules.create(
        C.TINY_SD_INPAINT, dtype=jnp.float32, attention_backend="xla"
    )
    params = sampling.init_params(modules, jax.random.PRNGKey(0), image_size=64)
    return modules, params


def _ctx(modules, params, batch=1):
    ids = jnp.zeros((batch, 77), jnp.int32)
    return sampling.encode_text(modules, params, ids)


def test_img2img_plms_runs_and_is_deterministic(tiny_stack):
    modules, params = tiny_stack
    fn = sampling.make_img2img_fn(modules, num_inference_steps=4, strength=0.5,
                                  guidance_scale=5.0, sampler="plms")
    img = jnp.zeros((1, 64, 64, 3))
    ctx = _ctx(modules, params)
    un = _ctx(modules, params)
    key = jax.random.PRNGKey(42)
    out1 = fn(params, img, ctx, un, key)
    out2 = fn(params, img, ctx, un, key)
    assert out1.shape == (1, 64, 64, 3)
    assert float(jnp.abs(out1).max()) <= 1.0
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    out3 = fn(params, img, ctx, un, jax.random.PRNGKey(7))
    assert not np.allclose(np.asarray(out1), np.asarray(out3))


def test_img2img_ddim_no_cfg(tiny_stack):
    modules, params = tiny_stack
    fn = sampling.make_img2img_fn(modules, num_inference_steps=4, strength=0.8,
                                  guidance_scale=0.0, sampler="ddim")
    out = fn(params, jnp.zeros((2, 64, 64, 3)), _ctx(modules, params, 2), None,
             jax.random.PRNGKey(0))
    assert out.shape == (2, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_inpaint_fn_runs(tiny_inpaint_stack):
    modules, params = tiny_inpaint_stack
    fn = sampling.make_inpaint_fn(modules, num_inference_steps=3, strength=0.6,
                                  guidance_scale=5.0, sampler="ddim")
    img = jnp.zeros((1, 64, 64, 3))
    mask = jnp.zeros((1, 64, 64, 1)).at[:, 16:32, 16:32].set(1.0)
    out = fn(params, img, mask, _ctx(modules, params), _ctx(modules, params),
             jax.random.PRNGKey(0))
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------


def _batch(task_name, b=2, size=64):
    rng = np.random.default_rng(0)
    batch = {
        "input": jnp.asarray(rng.random((b, size, size, 3), np.float32) * 2 - 1),
        "gt": jnp.asarray(rng.random((b, size, size, 3), np.float32) * 2 - 1),
    }
    if task_name == "inpaint":
        batch["mask"] = jnp.asarray(
            (rng.random((b, size, size, 1)) > 0.8).astype(np.float32)
        )
    return batch


@pytest.mark.parametrize("task_name", ["denoise", "inpaint"])
def test_train_step_reduces_shapes_and_is_finite(task_name, tiny_stack, tiny_inpaint_stack):
    modules, params = tiny_inpaint_stack if task_name == "inpaint" else tiny_stack
    task = get_task(task_name)
    cfg = train_loop.TrainConfig(gradient_accumulation_steps=1, lambda_img=0.05)
    step = train_loop.make_train_step(modules, task, cfg, donate=False)
    state = train_loop.create_train_state(cfg, params["unet"], num_train_steps=10)
    frozen = {"vae": params["vae"]}
    ctx = _ctx(modules, params)
    batch = _batch(task_name)
    new_state, metrics = step(state, frozen, batch, ctx, jax.random.PRNGKey(0))
    assert new_state.step == 1
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["mse"]))
    assert float(metrics["grad_norm"]) > 0
    # first update is zero (cosine schedule warms up from lr=0); params must
    # move once past warmup
    new_state, _ = step(new_state, frozen, batch, ctx, jax.random.PRNGKey(1))
    diff = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, new_state.params
    )
    assert max(jax.tree.leaves(diff)) > 0


def test_train_step_grad_accum_defers_update(tiny_stack):
    modules, params = tiny_stack
    task = get_task("denoise")
    cfg = train_loop.TrainConfig(gradient_accumulation_steps=2, lambda_img=0.0)
    step = train_loop.make_train_step(modules, task, cfg, donate=False)
    state = train_loop.create_train_state(cfg, params["unet"], num_train_steps=10)
    frozen = {"vae": params["vae"]}
    ctx = _ctx(modules, params)
    s1, _ = step(state, frozen, _batch("denoise"), ctx, jax.random.PRNGKey(0))
    # first micro-step: accumulation only, params unchanged
    diff = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, s1.params
    )))
    assert diff == 0.0
    # steps 2-4: completes two optimizer updates; the second uses a
    # post-warmup (nonzero) learning rate, so params must move
    s = s1
    for i in range(1, 4):
        s, _ = step(s, frozen, _batch("denoise"), ctx, jax.random.PRNGKey(i))
    diff2 = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, s.params
    )))
    assert diff2 > 0.0


def test_train_step_data_parallel_mesh(tiny_stack):
    """DP over the 8-device virtual CPU mesh must agree with single-device."""
    assert jax.device_count() >= 8, "conftest must force 8 virtual devices"
    modules, params = tiny_stack
    task = get_task("denoise")
    cfg = train_loop.TrainConfig(gradient_accumulation_steps=1, lambda_img=0.0)
    mesh = meshlib.make_mesh((8,), ("data",))

    step_dp = train_loop.make_train_step(modules, task, cfg, mesh=mesh, donate=False)
    step_1d = train_loop.make_train_step(modules, task, cfg, donate=False)

    state = train_loop.create_train_state(cfg, params["unet"], num_train_steps=10)
    frozen = {"vae": params["vae"]}
    ctx = _ctx(modules, params)
    batch = _batch("denoise", b=8)
    key = jax.random.PRNGKey(0)

    with mesh:
        sdp, mdp = step_dp(state, frozen, meshlib.shard_batch(batch, mesh), ctx, key)
    s1, m1 = step_1d(state, frozen, batch, ctx, key)
    np.testing.assert_allclose(float(mdp["loss"]), float(m1["loss"]), rtol=1e-4)
    # same global gradient -> same updated params
    d = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), sdp.params, s1.params
    )
    assert max(jax.tree.leaves(d)) < 1e-5


def test_cfg_cache_interval_semantics():
    """k=1 is the exact loop; k=2 with 2 steps makes every step a 'full'
    step (step 0 by modulo, step 1 as the forced final refresh) so outputs
    must match the exact loop; k=2 with 5 steps actually exercises the
    cached branch and must stay finite and bounded."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from image_restoration_and_enhancement_tpu import config as C
    from image_restoration_and_enhancement_tpu.core import sampling

    modules = sampling.SDModules.create(C.TINY_SD, dtype=jnp.float32)
    params = sampling.init_params(modules, jax.random.PRNGKey(0), image_size=64)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    ctx = sampling.encode_text(modules, params, jnp.zeros((1, 77), jnp.int32))
    uctx = sampling.encode_text(modules, params, jnp.ones((1, 77), jnp.int32))
    key = jax.random.PRNGKey(1)

    exact2 = sampling.make_img2img_fn(modules, 2, 1.0, 5.0, sampler="ddim",
                                      jit=False)(params, img, ctx, uctx, key)
    cache2 = sampling.make_img2img_fn(modules, 2, 1.0, 5.0, sampler="ddim",
                                      jit=False, cfg_cache_interval=2)(
        params, img, ctx, uctx, key)
    np.testing.assert_allclose(np.asarray(cache2), np.asarray(exact2),
                               atol=1e-5)

    exact5 = sampling.make_img2img_fn(modules, 5, 1.0, 5.0, sampler="ddim",
                                      jit=False)(params, img, ctx, uctx, key)
    cache5 = sampling.make_img2img_fn(modules, 5, 1.0, 5.0, sampler="ddim",
                                      jit=False, cfg_cache_interval=2)(
        params, img, ctx, uctx, key)
    c5 = np.asarray(cache5)
    assert np.isfinite(c5).all()
    assert c5.min() >= -1.0 and c5.max() <= 1.0
    # the cached branch must actually have been taken on steps 1 and 3
    assert float(np.abs(c5 - np.asarray(exact5)).max()) > 1e-7

    # PLMS variant compiles and runs too
    cache_plms = sampling.make_img2img_fn(modules, 4, 1.0, 5.0,
                                          sampler="plms", jit=False,
                                          cfg_cache_interval=2)(
        params, img, ctx, uctx, key)
    assert np.isfinite(np.asarray(cache_plms)).all()

    # no CFG -> knob is inert (identical program path)
    nocfg = sampling.make_img2img_fn(modules, 3, 1.0, 0.0, sampler="ddim",
                                     jit=False)(params, img, ctx, None, key)
    nocfg_k = sampling.make_img2img_fn(modules, 3, 1.0, 0.0, sampler="ddim",
                                       jit=False, cfg_cache_interval=4)(
        params, img, ctx, None, key)
    np.testing.assert_array_equal(np.asarray(nocfg), np.asarray(nocfg_k))
