"""Token-merge (ToMe) serving approximation: ops/token_merge.py.

Covers the static bipartite plan, merge/unmerge closure correctness
(identity at r=0, exact reconstruction when merged tokens are true
duplicates, global-constant invariance through real attention math), and
the trace-time policy wiring through BasicTransformerBlock (off by
default, exact-equal at ratio 0, shape-preserving when on)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_restoration_and_enhancement_tpu.models.layers import Transformer2D
from image_restoration_and_enhancement_tpu.ops import token_merge as tm
from image_restoration_and_enhancement_tpu.ops.attention import xla_attention


def test_plan_partitions_grid():
    dst, src = tm.plan(8, 8)
    assert len(dst) == 16 and len(src) == 48
    assert sorted(np.concatenate([dst, src]).tolist()) == list(range(64))
    # dst = top-left of each 2x2 tile
    assert set(dst.tolist()) == {i * 8 + j for i in range(0, 8, 2) for j in range(0, 8, 2)}


def test_merge_count_caps_at_source_set():
    assert tm.merge_count(8, 8, 0.5) == 32
    assert tm.merge_count(8, 8, 0.9) == 48  # only the 48 src tokens can merge
    assert tm.merge_count(8, 8, 0.0) == 0
    assert tm.merge_count(64, 64, 0.5) == 2048  # the N=4096 -> 2048 serving point


def test_r0_is_identity():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 8)), jnp.float32)
    m, u, nm = tm.build_merge(x, 8, 8, 0)
    assert nm == 64
    np.testing.assert_array_equal(np.asarray(u(m(x))), np.asarray(x))


def test_duplicate_tiles_reconstruct_exactly():
    # Each 2x2 tile holds 4 identical tokens: every src matches its own
    # tile's dst (cosine 1.0), the merged mean equals the original, and
    # unmerge reconstructs the input bit-for-bit up to fp32 rounding.
    rng = np.random.default_rng(1)
    base = rng.normal(size=(2, 4, 4, 8)).astype(np.float32)
    x = jnp.asarray(np.repeat(np.repeat(base, 2, 1), 2, 2).reshape(2, 64, 8))
    r = tm.merge_count(8, 8, 0.75)
    assert r == 48
    m, u, nm = tm.build_merge(x, 8, 8, r)
    assert nm == 16
    xm = m(x)
    assert xm.shape == (2, 16, 8)
    np.testing.assert_allclose(np.asarray(u(xm)), np.asarray(x), atol=1e-5)


def test_constant_tokens_invariant_through_attention():
    # With every token identical, exact attention returns the same output
    # for each token, and the merged path must return exactly the same
    # image-level result after unmerge.
    b, h, w, heads, d = 2, 8, 8, 2, 4
    tok = np.random.default_rng(2).normal(size=(b, 1, heads * d)).astype(np.float32)
    x = jnp.asarray(np.broadcast_to(tok, (b, h * w, heads * d)).copy())

    def attn(t):
        q = t.reshape(b, -1, heads, d)
        return xla_attention(q, q, q).reshape(b, -1, heads * d)

    exact = attn(x)
    m, u, nm = tm.build_merge(x, h, w, tm.merge_count(h, w, 0.5))
    assert nm == 32
    merged = u(attn(m(x)))
    np.testing.assert_allclose(np.asarray(merged), np.asarray(exact), atol=1e-5)


def _tiny_transformer(ratio, min_tokens_env, monkeypatch):
    monkeypatch.setenv("IRET_TOME_MIN", str(min_tokens_env))
    mod = Transformer2D(heads=2, head_dim=4, groups=4, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 8, 8, 8)), jnp.float32)
    ctx = jnp.asarray(np.random.default_rng(4).normal(size=(1, 5, 8)), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x, ctx)
    with tm.tome_mode(ratio):
        out = mod.apply(params, x, ctx)
    return np.asarray(out)


def test_transformer_policy_off_is_exact(monkeypatch):
    base = _tiny_transformer(None, 16, monkeypatch)
    off = _tiny_transformer(0.0, 16, monkeypatch)
    np.testing.assert_array_equal(base, off)
    # below the N threshold the ratio is ignored entirely
    gated = _tiny_transformer(0.5, 4096, monkeypatch)
    np.testing.assert_array_equal(base, gated)


def test_transformer_policy_on_runs_and_differs(monkeypatch):
    base = _tiny_transformer(None, 16, monkeypatch)
    on = _tiny_transformer(0.5, 16, monkeypatch)
    assert on.shape == base.shape
    assert np.all(np.isfinite(on))
    assert not np.array_equal(on, base)  # it IS an approximation
    # ...but a sane one: outputs stay correlated with the exact path
    c = np.corrcoef(on.ravel(), base.ravel())[0, 1]
    assert c > 0.9


def test_sampling_e2e_with_tome(monkeypatch):
    # Full jitted img2img loop on the tiny stack with merging active at the
    # tiny model's largest self-attention sites: runs, finite, in-range, and
    # deterministic for a fixed key.
    from image_restoration_and_enhancement_tpu import config as C
    from image_restoration_and_enhancement_tpu.core import sampling

    monkeypatch.setenv("IRET_TOME_MIN", "64")
    modules = sampling.SDModules.create(
        C.TINY_SD, dtype=jnp.float32, attention_backend="xla"
    )
    params = sampling.init_params(modules, jax.random.PRNGKey(0), image_size=64)
    ids = jnp.zeros((1, 77), jnp.int32)
    ctx = sampling.encode_text(modules, params, ids)
    with tm.tome_mode(0.5):
        fn = sampling.make_img2img_fn(modules, num_inference_steps=3,
                                      strength=0.8, guidance_scale=5.0,
                                      sampler="ddim")
        out1 = fn(params, jnp.zeros((1, 64, 64, 3)), ctx, ctx,
                  jax.random.PRNGKey(42))
        out2 = fn(params, jnp.zeros((1, 64, 64, 3)), ctx, ctx,
                  jax.random.PRNGKey(42))
    assert out1.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out1)).all()
    assert float(jnp.abs(out1).max()) <= 1.0
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_pipeline_tome_kwarg():
    # the product serving surface: RestorationPipeline(tome_ratio=r) arms
    # the trace-time policy exactly like the quant/cfg_cache knobs
    from image_restoration_and_enhancement_tpu.infer.pipeline import (
        RestorationPipeline,
    )

    # The ratio is scoped to THIS pipeline's traces (ADVICE r3 #3: the old
    # process-global set_tome at construction leaked into every other
    # pipeline's traces); construction must NOT mutate the global policy.
    p = RestorationPipeline(tome_ratio=0.25)
    assert p._tome_ratio == 0.25
    assert tm.current_ratio() == 0.0  # global untouched
    with tm.tome_mode(p._tome_ratio):  # what _run_sd wraps traces in
        assert tm.current_ratio() == 0.25


def test_pipeline_tome_ignored_under_spatial_sharding():
    import jax

    from image_restoration_and_enhancement_tpu.infer.pipeline import (
        RestorationPipeline,
    )
    from image_restoration_and_enhancement_tpu.parallel import mesh as meshlib

    mesh = meshlib.make_mesh((1,), ("sp",), devices=jax.devices()[:1])
    p = RestorationPipeline(tome_ratio=0.25, mesh=mesh, spatial_axis="sp")
    assert p._tome_ratio == 0.0  # guarded off, not silently wrong
    with tm.tome_mode(p._tome_ratio):
        assert tm.current_ratio() == 0.0


def test_pipeline_tome_env_var_also_guarded_under_spatial_sharding(monkeypatch):
    # IRET_TOME is an equally documented enable path (docs/SERVING.md); the
    # spatial guard must force the ratio off for THIS pipeline's traces —
    # otherwise the env value is resolved at trace time inside the
    # sp-sharded program (the exact GSPMD hazard the guard exists for).
    # It must NOT disable ToMe process-globally: another (non-sharded)
    # pipeline in the same process keeps its env-enabled ratio (ADVICE r3).
    import jax

    from image_restoration_and_enhancement_tpu.infer.pipeline import (
        RestorationPipeline,
    )
    from image_restoration_and_enhancement_tpu.parallel import mesh as meshlib

    monkeypatch.setenv("IRET_TOME", "0.5")
    mesh = meshlib.make_mesh((1,), ("sp",), devices=jax.devices()[:1])
    p = RestorationPipeline(mesh=mesh, spatial_axis="sp")
    assert p._tome_ratio == 0.0
    with tm.tome_mode(p._tome_ratio):
        assert tm.current_ratio() == 0.0
    # the global env-resolved policy survives the sharded construction
    assert tm.current_ratio() == 0.5
    other = RestorationPipeline()
    assert other._tome_ratio is None  # defers to the env at trace time


def test_sharded_dp_serving_with_tome(monkeypatch):
    # ToMe composes with data-parallel sharded serving: the merge indices
    # are per-image, so batch sharding stays collective-free. Sharded and
    # unsharded programs agree (same trace-time policy).
    from image_restoration_and_enhancement_tpu import config as C
    from image_restoration_and_enhancement_tpu.core import sampling
    from image_restoration_and_enhancement_tpu.parallel import mesh as meshlib

    monkeypatch.setenv("IRET_TOME_MIN", "64")
    modules = sampling.SDModules.create(C.TINY_SD, dtype=jnp.float32,
                                        attention_backend="xla")
    params = sampling.init_params(modules, jax.random.PRNGKey(0), image_size=64)
    mesh = meshlib.make_mesh((8,), ("data",))
    key = jax.random.PRNGKey(3)
    image = jax.random.uniform(key, (8, 64, 64, 3), minval=-1.0, maxval=1.0)
    ctx = sampling.encode_text(modules, params, jnp.zeros((8, 77), jnp.int32))
    with tm.tome_mode(0.5):
        fn, shard_params = sampling.make_sharded_img2img_fn(
            modules, mesh, num_inference_steps=3, strength=0.8,
            guidance_scale=5.0, sampler="ddim",
        )
        out = fn(shard_params(params), image, ctx, ctx, key)
        ref_fn = sampling.make_img2img_fn(modules, 3, 0.8, 5.0, sampler="ddim")
        ref = ref_fn(params, image, ctx, ctx, key)
    assert out.shape == (8, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_env_policy_parse(monkeypatch):
    monkeypatch.setenv("IRET_TOME", "0.5")
    assert tm.current_ratio() == 0.5
    monkeypatch.setenv("IRET_TOME", "")
    assert tm.current_ratio() == 0.0
    monkeypatch.setenv("IRET_TOME", "bogus")
    assert tm.current_ratio() == 0.0
    with tm.tome_mode(0.25):
        assert tm.current_ratio() == 0.25
    tm.set_tome(0.75)
    assert tm.current_ratio() == 0.75
    tm.set_tome(None)
