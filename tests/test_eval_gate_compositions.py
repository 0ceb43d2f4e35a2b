"""The quality-gate script's mode compositions, on the tiny stack.

scripts/run_stage56_r3.sh fires eval_quant_quality.py unattended against
the fresh workflow checkpoint with int8_static + turbo (cfg_cache) + ToMe
in one process; this pins the exact `run()` compositions it will trace so
a wiring bug can't silently void those measurements. (The full-size CLI
needs an SD15-shaped checkpoint, so the CLI surface itself is exercised
on the chip; the composition logic is identical here.)"""
import importlib.util
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_restoration_and_enhancement_tpu import config as C
from image_restoration_and_enhancement_tpu.core import sampling

_SPEC = importlib.util.spec_from_file_location(
    "eval_quant_quality",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "eval_quant_quality.py"),
)
eqq = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(eqq)


@pytest.fixture(scope="module")
def tiny():
    modules = sampling.SDModules.create(
        C.TINY_SD, dtype=jnp.float32, attention_backend="xla"
    )
    params = sampling.init_params(modules, jax.random.PRNGKey(0), image_size=64)
    ids = jnp.zeros((1, 77), jnp.int32)
    ctx = sampling.encode_text(modules, params, ids)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(-0.5, 0.5, (1, 64, 64, 3)), jnp.float32
    )
    return modules, params, ctx, x


def _run(tiny, monkeypatch, **kw):
    modules, params, ctx, x = tiny
    monkeypatch.setenv("IRET_TOME_MIN", "64")  # tiny sites qualify
    return eqq.run(modules, params, ctx, ctx, x, steps=3, strength=0.8,
                   gs=5.0, sampler="ddim", **kw)


def test_bf16_reference_run(tiny, monkeypatch):
    out = _run(tiny, monkeypatch, mode=None)
    assert out.shape == (1, 64, 64, 3) and np.isfinite(out).all()


def test_int8_static_with_tome(tiny, monkeypatch):
    # the gate_combo composition: static-quantized serving + token merging
    out = _run(tiny, monkeypatch, mode="int8_static", tome=0.5)
    assert out.shape == (1, 64, 64, 3) and np.isfinite(out).all()


def test_int8_static_with_turbo(tiny, monkeypatch):
    # the turbo composition: static-quantized serving + CFG cache k=2
    out = _run(tiny, monkeypatch, mode="int8_static", cfg_cache=2)
    assert out.shape == (1, 64, 64, 3) and np.isfinite(out).all()


def test_chunked_wide_gate(tiny, monkeypatch):
    # the round-5 wide gate (n=32) serves in batch-size chunks; a 3-image
    # input with batch=2 must produce all 3 outputs through 2 device calls
    modules, params, ctx, x = tiny
    monkeypatch.setenv("IRET_TOME_MIN", "64")
    x3 = jnp.concatenate([x, x * 0.5, x * -0.5])
    out = eqq.run(modules, params, ctx, ctx, x3, steps=2, strength=0.8,
                  gs=5.0, sampler="ddim", mode=None, batch=2)
    assert out.shape == (3, 64, 64, 3) and np.isfinite(out).all()


def test_inpaint_gate_with_tome(tiny, monkeypatch):
    # inpaint gates run make_inpaint_fn with the mask (9-ch UNet variant);
    # tome composes over the exact path there (no int8_static calib twin)
    modules = sampling.SDModules.create(
        C.TINY_SD_INPAINT, dtype=jnp.float32, attention_backend="xla"
    )
    params = sampling.init_params(modules, jax.random.PRNGKey(0), image_size=64)
    ctx = sampling.encode_text(modules, params, jnp.zeros((1, 77), jnp.int32))
    x = tiny[3]
    monkeypatch.setenv("IRET_TOME_MIN", "64")
    mask = jnp.ones(x.shape[:3] + (1,), jnp.float32)
    out = eqq.run(modules, params, ctx, ctx, x, steps=2, strength=1.0,
                  gs=5.0, sampler="ddim", mode=None, tome=0.5, mask=mask)
    assert out.shape == (1, 64, 64, 3) and np.isfinite(out).all()
    with pytest.raises(ValueError):
        eqq.run(modules, params, ctx, ctx, x, steps=2, strength=1.0,
                gs=5.0, sampler="ddim", mode="int8_static", mask=mask)
