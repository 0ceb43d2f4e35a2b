"""Tensor-parallel sharding over a 2-D (data, model) virtual mesh:
forward parity with the replicated model, and a sharded train step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from image_restoration_and_enhancement_tpu import config as C
from image_restoration_and_enhancement_tpu.core import sampling
from image_restoration_and_enhancement_tpu.parallel import mesh as meshlib
from image_restoration_and_enhancement_tpu.parallel import sharding_rules as sr


@pytest.fixture(scope="module")
def stack():
    modules = sampling.SDModules.create(C.TINY_SD, dtype=jnp.float32,
                                        attention_backend="xla")
    params = sampling.init_params(modules, jax.random.PRNGKey(0), image_size=64)
    return modules, params


def test_partition_specs_target_attention(stack):
    _, params = stack
    specs = sr.tree_partition_specs(params["unet"])
    got = specs["down_blocks_0"]["attentions_0"]["transformer_blocks_0"]
    assert got["attn1"]["to_q"]["kernel"] == P(None, "model")
    assert got["attn1"]["to_out"]["kernel"] == P("model", None)
    assert got["ff"]["proj_in"]["kernel"] == P(None, "model")
    assert got["ff"]["proj_out"]["kernel"] == P("model", None)
    # convs replicated
    assert specs["conv_in"]["kernel"] == P()


def test_tp_forward_matches_replicated(stack):
    modules, params = stack
    mesh = meshlib.make_mesh((2, 2), ("data", "model"),
                             devices=jax.devices()[:4])
    sr.validate_divisibility(params["unet"], mesh)

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    t = jnp.array([3, 7])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 77, C.TINY_UNET.cross_attention_dim))

    ref = modules.unet.apply({"params": params["unet"]}, x, t, ctx)

    with mesh:
        p_tp = sr.shard_params(params["unet"], mesh)
        data_sh = NamedSharding(mesh, P("data"))
        x_s = jax.device_put(x, data_sh)
        fn = jax.jit(lambda p, x: modules.unet.apply({"params": p}, x, t, ctx))
        out = fn(p_tp, x_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_tp_dp_train_step(stack):
    """Full train step over the 2-D mesh: grads respect the TP shardings."""
    from image_restoration_and_enhancement_tpu.tasks.registry import get_task
    from image_restoration_and_enhancement_tpu.train import loop as train_loop

    modules, params = stack
    mesh = meshlib.make_mesh((2, 4), ("data", "model"))
    task = get_task("denoise")
    cfg = train_loop.TrainConfig(gradient_accumulation_steps=1, lambda_img=0.0)
    loss_fn = train_loop.make_loss_fn(modules, task, cfg)

    rng = np.random.default_rng(0)
    batch = {
        "input": jnp.asarray(rng.random((4, 64, 64, 3), np.float32) * 2 - 1),
        "gt": jnp.asarray(rng.random((4, 64, 64, 3), np.float32) * 2 - 1),
    }
    ctx = sampling.encode_text(modules, params, jnp.zeros((1, 77), jnp.int32))

    grad_fn = jax.jit(jax.grad(lambda p, f, b, c, k: loss_fn(p, f, b, c, k)[0]))
    ref_grads = grad_fn(params["unet"], {"vae": params["vae"]}, batch, ctx,
                        jax.random.PRNGKey(0))

    with mesh:
        p_tp = sr.shard_params(params["unet"], mesh)
        frozen = meshlib.replicate({"vae": params["vae"]}, mesh)
        batch_s = meshlib.shard_batch(batch, mesh)
        g = grad_fn(p_tp, frozen, batch_s, ctx, jax.random.PRNGKey(0))
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(ref_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-5)


def test_sharded_img2img_serving_dp():
    """Data-parallel multi-chip serving: batch 8 over 8 virtual devices,
    output matches the unsharded program."""
    modules = sampling.SDModules.create(C.TINY_SD, dtype=jnp.float32,
                                        attention_backend="xla")
    params = sampling.init_params(modules, jax.random.PRNGKey(0), image_size=64)
    mesh = meshlib.make_mesh((8,), ("data",))
    key = jax.random.PRNGKey(3)
    image = jax.random.uniform(key, (8, 64, 64, 3), minval=-1.0, maxval=1.0)
    ctx = sampling.encode_text(modules, params, jnp.zeros((8, 77), jnp.int32))

    fn, shard_params = sampling.make_sharded_img2img_fn(
        modules, mesh, num_inference_steps=3, strength=0.8,
        guidance_scale=5.0, sampler="ddim",
    )
    out = fn(shard_params(params), image, ctx, ctx, key)
    assert out.shape == (8, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()

    ref_fn = sampling.make_img2img_fn(modules, 3, 0.8, 5.0, sampler="ddim")
    ref = ref_fn(params, image, ctx, ctx, key)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_sharded_img2img_serving_dp_tp():
    """2-D serving layout: batch over data axis, UNet projections over the
    model axis (XLA inserts the TP collectives)."""
    modules = sampling.SDModules.create(C.TINY_SD, dtype=jnp.float32,
                                        attention_backend="xla")
    params = sampling.init_params(modules, jax.random.PRNGKey(0), image_size=64)
    mesh = meshlib.make_mesh((4, 2), ("data", "model"))
    key = jax.random.PRNGKey(4)
    image = jax.random.uniform(key, (4, 64, 64, 3), minval=-1.0, maxval=1.0)
    ctx = sampling.encode_text(modules, params, jnp.zeros((4, 77), jnp.int32))

    with mesh:
        fn, shard_params = sampling.make_sharded_img2img_fn(
            modules, mesh, num_inference_steps=2, strength=1.0,
            guidance_scale=0.0, sampler="plms", model_axis="model",
        )
        out = fn(shard_params(params), image, ctx, None, key)
    assert out.shape == (4, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_sharded_img2img_serving_dp_sp():
    """Spatial sharding (the sequence-parallel analog for vision): image
    height over the `sp` axis, batch over `data`. GSPMD partitions the
    convs with halo exchanges; output must match the unsharded program.

    The level-gated policy (parallel/spatial.py) is load-bearing here:
    without it XLA's SPMD partitioner returns wrong values for convs whose
    shards hold fewer rows than the window (measured 0.13 max abs at
    latent 16 / sp 2 on the CPU backend). 128px -> TINY_UNET levels
    16/8/4/2: levels 16 and 8 shard over sp=2, 4 and 2 are pinned
    batch-only."""
    modules = sampling.SDModules.create(C.TINY_SD, dtype=jnp.float32,
                                        attention_backend="xla")
    params = sampling.init_params(modules, jax.random.PRNGKey(0), image_size=128)
    mesh = meshlib.make_mesh((4, 2), ("data", "sp"))
    key = jax.random.PRNGKey(5)
    image = jax.random.uniform(key, (4, 128, 128, 3), minval=-1.0, maxval=1.0)
    ctx = sampling.encode_text(modules, params, jnp.zeros((4, 77), jnp.int32))

    fn, shard_params = sampling.make_sharded_img2img_fn(
        modules, mesh, num_inference_steps=3, strength=0.8,
        guidance_scale=5.0, sampler="ddim", spatial_axis="sp",
    )
    out = fn(shard_params(params), image, ctx, ctx, key)
    assert out.shape == (4, 128, 128, 3)
    assert np.isfinite(np.asarray(out)).all()

    ref_fn = sampling.make_img2img_fn(modules, 3, 0.8, 5.0, sampler="ddim")
    ref = ref_fn(params, image, ctx, ctx, key)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    # 64px -> every UNet level below the 4-rows/shard gate: the policy pins
    # them batch-only, so this stays CORRECT (it would miscompile if the
    # input sharding propagated down the pyramid unchecked).
    small = jax.random.uniform(key, (4, 64, 64, 3), minval=-1.0, maxval=1.0)
    out_s = fn(shard_params(params), small, ctx, ctx, key)
    ref_s = sampling.make_img2img_fn(modules, 3, 0.8, 5.0, sampler="ddim")(
        params, small, ctx, ctx, key)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(ref_s), atol=2e-4)

    # Uneven input shards (height not divisible by sp) are rejected.
    bad = jax.random.uniform(key, (4, 63, 63, 3), minval=-1.0, maxval=1.0)
    with pytest.raises(ValueError, match="image height"):
        fn(shard_params(params), bad, ctx, ctx, key)


def test_sharded_img2img_serving_dp_tp_sp():
    """3-D serving layout: batch over `data`, UNet projections over
    `model` (Megatron TP), image height over `sp` (level-gated spatial
    policy). All three compose in one program; output must match the
    unsharded reference."""
    modules = sampling.SDModules.create(C.TINY_SD, dtype=jnp.float32,
                                        attention_backend="xla")
    params = sampling.init_params(modules, jax.random.PRNGKey(0), image_size=128)
    mesh = meshlib.make_mesh((2, 2, 2), ("data", "model", "sp"))
    key = jax.random.PRNGKey(6)
    image = jax.random.uniform(key, (2, 128, 128, 3), minval=-1.0, maxval=1.0)
    ctx = sampling.encode_text(modules, params, jnp.zeros((2, 77), jnp.int32))

    with mesh:
        fn, shard_params = sampling.make_sharded_img2img_fn(
            modules, mesh, num_inference_steps=2, strength=0.8,
            guidance_scale=5.0, sampler="ddim", model_axis="model",
            spatial_axis="sp",
        )
        out = fn(shard_params(params), image, ctx, ctx, key)
    assert out.shape == (2, 128, 128, 3)

    ref_fn = sampling.make_img2img_fn(modules, 2, 0.8, 5.0, sampler="ddim")
    ref = ref_fn(params, image, ctx, ctx, key)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_sharded_inpaint_serving_dp_sp():
    """The inpaint program (9-ch UNet, mask + masked-latent side channels)
    under batch + spatial sharding matches the unsharded program."""
    modules = sampling.SDModules.create(C.TINY_SD_INPAINT, dtype=jnp.float32,
                                        attention_backend="xla")
    params = sampling.init_params(modules, jax.random.PRNGKey(0), image_size=128)
    mesh = meshlib.make_mesh((4, 2), ("data", "sp"))
    key = jax.random.PRNGKey(7)
    image = jax.random.uniform(key, (4, 128, 128, 3), minval=-1.0, maxval=1.0)
    mask = jnp.zeros((4, 128, 128, 1)).at[:, 32:96, 32:96].set(1.0)
    ctx = sampling.encode_text(modules, params, jnp.zeros((4, 77), jnp.int32))

    fn, shard_params = sampling.make_sharded_inpaint_fn(
        modules, mesh, num_inference_steps=3, strength=0.9,
        guidance_scale=5.0, sampler="ddim", spatial_axis="sp",
    )
    out = fn(shard_params(params), image, mask, ctx, ctx, key)
    assert out.shape == (4, 128, 128, 3)

    ref_fn = sampling.make_inpaint_fn(modules, 3, 0.9, 5.0, sampler="ddim",
                                      cfg_layout="interleaved")
    ref = ref_fn(params, image, mask, ctx, ctx, key)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_cfg_interleaved_matches_halves():
    """The interleaved CFG layout (chip-local pairs for sharded serving)
    must be bitwise-identical to the default halves layout."""
    modules = sampling.SDModules.create(C.TINY_SD, dtype=jnp.float32,
                                        attention_backend="xla")
    params = sampling.init_params(modules, jax.random.PRNGKey(0), image_size=64)
    key = jax.random.PRNGKey(5)
    image = jax.random.uniform(key, (4, 64, 64, 3), minval=-1.0, maxval=1.0)
    ctx = sampling.encode_text(modules, params, jnp.zeros((4, 77), jnp.int32))
    un = sampling.encode_text(modules, params, jnp.ones((4, 77), jnp.int32))
    f_h = sampling.make_img2img_fn(modules, 3, 0.8, 7.5, jit=False)
    f_i = sampling.make_img2img_fn(modules, 3, 0.8, 7.5, jit=False,
                                   cfg_layout="interleaved")
    np.testing.assert_array_equal(
        np.asarray(f_h(params, image, ctx, un, key)),
        np.asarray(f_i(params, image, ctx, un, key)),
    )


def test_sharded_img2img_dp_has_no_collectives():
    """Pure-DP serving must compile to ZERO inter-chip communication: the
    interleaved CFG layout keeps each image's uncond/cond pair chip-local
    (the halves layout compiles to ~50 all-to-alls in the denoise loop)."""
    import re
    from collections import Counter
    from jax.sharding import NamedSharding, PartitionSpec as P

    modules = sampling.SDModules.create(C.TINY_SD, dtype=jnp.float32,
                                        attention_backend="xla")
    params = sampling.init_params(modules, jax.random.PRNGKey(0), image_size=64)
    mesh = meshlib.make_mesh((8,), ("data",))
    batch_sh = NamedSharding(mesh, P("data"))
    params_s = meshlib.replicate(params, mesh)
    image = jax.device_put(jnp.zeros((8, 64, 64, 3)), batch_sh)
    ctx = jax.device_put(
        jnp.zeros((8, 77, C.TINY_SD.unet.cross_attention_dim)), batch_sh)
    f_i = sampling.make_img2img_fn(modules, 3, 0.8, 7.5, jit=False,
                                   cfg_layout="interleaved")
    txt = (
        jax.jit(f_i, out_shardings=batch_sh)
        .lower(params_s, image, ctx, ctx, jax.random.PRNGKey(1))
        .compile().as_text()
    )
    colls = Counter(re.findall(
        r"\b(all-reduce|all-gather|all-to-all|collective-permute|reduce-scatter)\b",
        txt))
    assert not colls, f"unexpected collectives in DP serving HLO: {colls}"


def test_sharded_img2img_with_cfg_cache():
    """Turbo mode composes with the sharded serving factory: the cached
    half-batch cond-only UNet call must also stay chip-local under the
    interleaved CFG layout."""
    modules = sampling.SDModules.create(C.TINY_SD, dtype=jnp.float32,
                                        attention_backend="xla")
    params = sampling.init_params(modules, jax.random.PRNGKey(0), image_size=64)
    mesh = meshlib.make_mesh((8,), ("data",))
    key = jax.random.PRNGKey(5)
    image = jax.random.uniform(key, (8, 64, 64, 3), minval=-1.0, maxval=1.0)
    ctx = sampling.encode_text(modules, params, jnp.zeros((8, 77), jnp.int32))
    uctx = sampling.encode_text(modules, params, jnp.ones((8, 77), jnp.int32))

    fn, shard_params = sampling.make_sharded_img2img_fn(
        modules, mesh, num_inference_steps=4, strength=1.0,
        guidance_scale=5.0, sampler="ddim", cfg_cache_interval=2,
    )
    out = fn(shard_params(params), image, ctx, uctx, key)
    assert out.shape == (8, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()

    # matches the single-program turbo loop (interleaved layout)
    ref_fn = sampling.make_img2img_fn(modules, 4, 1.0, 5.0, sampler="ddim",
                                      cfg_layout="interleaved",
                                      cfg_cache_interval=2)
    ref = ref_fn(params, image, ctx, uctx, key)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_spatial_policy_gating_unit():
    """parallel/spatial.constrain: height-sharded only while every shard
    keeps >= min_rows rows (and H divides); batch-only otherwise; no-op
    with no active policy or non-4D input."""
    from image_restoration_and_enhancement_tpu.parallel import spatial as sp

    mesh = meshlib.make_mesh((4, 2), ("data", "sp"))

    with sp.spatial_sharding(mesh, "data", "sp", min_rows=4):
        def f(x):
            return sp.constrain(x)
        for h, expect_sp in [(16, True), (8, True), (4, False), (2, False),
                             (6, False)]:  # 6 % 2 == 0 but 3 < min_rows
            y = jax.jit(f)(jax.device_put(
                jnp.zeros((4, h, 8, 8)),
                jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))))
            spec = y.sharding.spec
            got_sp = len(spec) > 1 and spec[1] == "sp"
            assert got_sp == expect_sp, (h, spec)
        # non-4D passes through untouched
        z = jnp.zeros((4, 77, 16))
        assert sp.constrain(z) is z
    # no policy active -> identity
    w = jnp.zeros((4, 16, 16, 8))
    assert sp.constrain(w) is w


def test_sharded_img2img_sdxl_dp_sp():
    """The SDXL stack (dual text towers, (context, pooled) tuples,
    text_time conditioning) serves under batch + spatial sharding and
    matches the unsharded program."""
    modules = sampling.SDModules.create(C.TINY_SDXL, dtype=jnp.float32,
                                        attention_backend="xla")
    params = sampling.init_params(modules, jax.random.PRNGKey(0), image_size=128)
    mesh = meshlib.make_mesh((2, 2), ("data", "sp"),
                             devices=jax.devices()[:4])
    key = jax.random.PRNGKey(8)
    image = jax.random.uniform(key, (2, 128, 128, 3), minval=-1.0, maxval=1.0)
    ids = jnp.zeros((2, 77), jnp.int32)
    ctx = sampling.encode_text_sdxl(modules, params, ids)

    fn, shard_params = sampling.make_sharded_img2img_fn(
        modules, mesh, num_inference_steps=2, strength=0.8,
        guidance_scale=5.0, sampler="ddim", spatial_axis="sp",
    )
    out = fn(shard_params(params), image, ctx, ctx, key)
    assert out.shape == (2, 128, 128, 3)

    ref_fn = sampling.make_img2img_fn(modules, 2, 0.8, 5.0, sampler="ddim",
                                      cfg_layout="interleaved")
    ref = ref_fn(params, image, ctx, ctx, key)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_gspmd_conv_miscompile_boundary_pinned():
    """Pin the GSPMD wrong-values boundary that MIN_ROWS_PER_SHARD guards.

    parallel/spatial.py's whole reason to exist is that XLA's SPMD
    partitioner silently produces wrong values (not an error) for a conv
    whose height shard holds fewer rows than the window needs. This test
    pins that boundary itself: (a) the ungated geometry (3x3 stride-1
    pad-1 conv, H=2 over sp=2 -> 1 row/shard; the module docstring's
    measured case, re-probed 2026-08: max abs err 5.26) reproduces a
    LARGE error vs the unsharded program, and (b) the policy at
    min_rows=4 pins the same geometry batch-only and is bit-exact. If
    (a) stops reproducing after a jax upgrade the test SKIPS with a
    pointer to re-evaluate the gate, rather than failing."""
    from image_restoration_and_enhancement_tpu.parallel import spatial as sp

    mesh = meshlib.make_mesh((4, 2), ("data", "sp"))
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 2, 8, 8))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 8, 8)) * 0.1

    def conv(t):
        return jax.lax.conv_general_dilated(
            t, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    ref = jax.jit(conv)(x)
    x_dp = jax.device_put(x, NamedSharding(mesh, P("data")))

    def conv_forced(t):
        t = jax.lax.with_sharding_constraint(
            t, NamedSharding(mesh, P("data", "sp")))
        return conv(t)

    bad = jax.jit(conv_forced)(x_dp)
    err = float(jnp.max(jnp.abs(bad - ref)))
    if err < 1e-5:
        pytest.skip(
            "GSPMD halo-exchange miscompile no longer reproduces on this "
            "jax — re-evaluate MIN_ROWS_PER_SHARD (parallel/spatial.py)")
    assert err > 1e-3, f"boundary error regime changed: {err}"

    with sp.spatial_sharding(mesh, "data", "sp", min_rows=4):
        def conv_gated(t):
            t = sp.constrain(t)
            return conv(t)
        good = jax.jit(conv_gated)(x_dp)
    np.testing.assert_array_equal(np.asarray(good), np.asarray(ref))


def test_sharded_img2img_serving_dp_sp4_gate_boundary():
    """sp=4 serving — the geometry where the gate does real work at every
    level below the top: 128px -> TINY_UNET latent levels 16/8/4/2; at
    sp=4 only level 16 shards (exactly min_rows=4 rows/shard, the
    boundary), and 8/4/2 ALL cross into the miscompile regime (2, 1, and
    non-divisible rows/shard) and must be pinned batch-only. Decision
    asserts + output parity with the unsharded program prove the gate
    catches each of them."""
    from image_restoration_and_enhancement_tpu.parallel import spatial as sp

    mesh = meshlib.make_mesh((2, 4), ("data", "sp"))

    # (a) the gating decisions at sp=4, asserted level by level
    with sp.spatial_sharding(mesh, "data", "sp", min_rows=4):
        for h, expect_sp in [(16, True), (8, False), (4, False), (2, False)]:
            y = jax.jit(sp.constrain)(jax.device_put(
                jnp.zeros((2, h, 8, 8)), NamedSharding(mesh, P("data"))))
            spec = y.sharding.spec
            got_sp = len(spec) > 1 and spec[1] == "sp"
            assert got_sp == expect_sp, (h, spec)

    # (b) end-to-end parity through the sharded sampler
    modules = sampling.SDModules.create(C.TINY_SD, dtype=jnp.float32,
                                        attention_backend="xla")
    params = sampling.init_params(modules, jax.random.PRNGKey(0),
                                  image_size=128)
    key = jax.random.PRNGKey(9)
    image = jax.random.uniform(key, (2, 128, 128, 3), minval=-1.0, maxval=1.0)
    ctx = sampling.encode_text(modules, params, jnp.zeros((2, 77), jnp.int32))

    fn, shard_params = sampling.make_sharded_img2img_fn(
        modules, mesh, num_inference_steps=2, strength=0.8,
        guidance_scale=5.0, sampler="ddim", spatial_axis="sp",
    )
    out = fn(shard_params(params), image, ctx, ctx, key)
    assert out.shape == (2, 128, 128, 3)

    ref_fn = sampling.make_img2img_fn(modules, 2, 0.8, 5.0, sampler="ddim")
    ref = ref_fn(params, image, ctx, ctx, key)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
