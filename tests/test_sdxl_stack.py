"""SDXL stack end-to-end (tiny): dual-tower encoding, sampling, train step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_restoration_and_enhancement_tpu import config as C
from image_restoration_and_enhancement_tpu.core import sampling
from image_restoration_and_enhancement_tpu.tasks.registry import get_task
from image_restoration_and_enhancement_tpu.train import loop as train_loop


@pytest.fixture(scope="module")
def sdxl_stack():
    modules = sampling.SDModules.create(
        C.TINY_SDXL, dtype=jnp.float32, attention_backend="xla"
    )
    params = sampling.init_params(modules, jax.random.PRNGKey(0), image_size=64)
    return modules, params


def test_sdxl_bundle_has_second_encoder(sdxl_stack):
    modules, params = sdxl_stack
    assert modules.is_sdxl
    assert "text_encoder_2" in params


def test_encode_text_sdxl_shapes(sdxl_stack):
    modules, params = sdxl_stack
    ids = jnp.zeros((2, 77), jnp.int32)
    ctx, pooled = sampling.encode_text_sdxl(modules, params, ids)
    d = C.TINY_SDXL.text_encoder.hidden_size + C.TINY_SDXL.text_encoder_2.hidden_size
    assert ctx.shape == (2, 77, d)
    assert pooled.shape == (2, C.TINY_SDXL.text_encoder_2.hidden_size)


def test_sdxl_img2img_sampling(sdxl_stack):
    modules, params = sdxl_stack
    fn = sampling.make_img2img_fn(modules, num_inference_steps=3, strength=0.5,
                                  guidance_scale=5.0, sampler="ddim")
    ids = jnp.zeros((1, 77), jnp.int32)
    cond = sampling.encode_text_sdxl(modules, params, ids)
    out = fn(params, jnp.zeros((1, 64, 64, 3)), cond, cond, jax.random.PRNGKey(0))
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_sdxl_train_step(sdxl_stack):
    modules, params = sdxl_stack
    task = get_task("denoise")
    cfg = train_loop.TrainConfig(gradient_accumulation_steps=1, lambda_img=0.0)
    step = train_loop.make_train_step(modules, task, cfg, donate=False)
    state = train_loop.create_train_state(cfg, params["unet"], num_train_steps=10)
    frozen = {"vae": params["vae"]}
    rng = np.random.default_rng(0)
    batch = {
        "input": jnp.asarray(rng.random((2, 64, 64, 3), np.float32) * 2 - 1),
        "gt": jnp.asarray(rng.random((2, 64, 64, 3), np.float32) * 2 - 1),
    }
    cond = sampling.encode_text_sdxl(modules, params, jnp.zeros((1, 77), jnp.int32))
    new_state, metrics = step(state, frozen, batch, cond, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
