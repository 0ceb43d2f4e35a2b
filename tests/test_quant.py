"""Int8 serving-path (ops/quant.py) numerics: off-mode bitwise parity,
quantization error bounds, and the quantized UNet/sampling loop."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_restoration_and_enhancement_tpu import config as C
from image_restoration_and_enhancement_tpu.core import sampling
from image_restoration_and_enhancement_tpu.models.layers import QConv, QDense
from image_restoration_and_enhancement_tpu.ops import quant


def test_off_mode_is_bitwise_plain():
    """With quantization off (the default), QConv/QDense must be the exact
    lax primitives — the training path and all checkpoints are untouched."""
    assert quant.current_mode() is None
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 8, 8, 16))
    qc = QConv(32, (3, 3), padding=1)
    pc = nn.Conv(32, (3, 3), padding=1)
    p = qc.init(key, x)
    np.testing.assert_array_equal(qc.apply(p, x), pc.apply(p, x))
    xd = jax.random.normal(key, (4, 16))
    qd = QDense(32)
    pd = nn.Dense(32)
    p = qd.init(key, xd)
    np.testing.assert_array_equal(qd.apply(p, xd), pd.apply(p, xd))


def test_int8_dense_error_bound():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (64, 256))
    w = jax.random.normal(jax.random.PRNGKey(2), (256, 128)) * 0.05
    ref = x @ w
    with quant.quant_mode("int8"):
        got = quant.dot_general(x, w, (((1,), (0,)), ((), ())))
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def test_int8_conv_error_bound():
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, 16, 16, 64))
    w = jax.random.normal(jax.random.PRNGKey(4), (3, 3, 64, 64)) * 0.05
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    ref = jax.lax.conv_general_dilated(x, w, (1, 1), "SAME", dimension_numbers=dn)
    with quant.quant_mode("int8"):
        got = quant.conv_general_dilated(x, w, (1, 1), "SAME",
                                         dimension_numbers=dn)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def test_int8_per_channel_scales_handle_skewed_weights():
    """Per-output-channel weight scales: a channel 100x larger than the
    rest must not wipe out the small channels' precision."""
    x = jax.random.normal(jax.random.PRNGKey(5), (32, 64))
    w = jax.random.normal(jax.random.PRNGKey(6), (64, 8)) * 0.01
    w = w.at[:, 0].mul(100.0)
    ref = x @ w
    with quant.quant_mode("int8"):
        got = quant.dot_general(x, w, (((1,), (0,)), ((), ())))
    rel_small = float(
        jnp.linalg.norm(got[:, 1:] - ref[:, 1:]) / jnp.linalg.norm(ref[:, 1:])
    )
    assert rel_small < 0.02, rel_small


@pytest.fixture(scope="module")
def tiny_stack():
    modules = sampling.SDModules.create(C.TINY_SD, dtype=jnp.float32,
                                        attention_backend="xla")
    params = sampling.init_params(modules, jax.random.PRNGKey(0), image_size=64)
    return modules, params


def test_quantized_unet_forward_close(tiny_stack):
    modules, params = tiny_stack
    lat = jax.random.normal(jax.random.PRNGKey(7), (1, 8, 8, 4))
    t = jnp.asarray([500])
    ctx = jax.random.normal(
        jax.random.PRNGKey(8), (1, 77, C.TINY_SD.unet.cross_attention_dim)
    ) * 0.2
    ref = modules.unet.apply({"params": params["unet"]}, lat, t, ctx, None)
    with quant.quant_mode("int8"):
        got = modules.unet.apply({"params": params["unet"]}, lat, t, ctx, None)
    assert np.isfinite(np.asarray(got)).all()
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.15, rel  # accumulated w8a8 noise over the whole UNet


def test_quantized_img2img_close_to_bf16_psnr(tiny_stack):
    """End-to-end sampling with the int8 UNet: finite, and close to the
    full-precision loop (the real quality gate for SD1.5 runs on imported
    weights via metrics/evaluate)."""
    modules, params = tiny_stack
    img = jax.random.uniform(jax.random.PRNGKey(9), (1, 64, 64, 3),
                             minval=-1.0, maxval=1.0)
    ids = jnp.zeros((1, 77), jnp.int32)
    ctx = sampling.encode_text(modules, params, ids)
    key = jax.random.PRNGKey(42)
    fn = sampling.make_img2img_fn(modules, 4, 0.5, 5.0, jit=False)
    ref = fn(params, img, ctx, ctx, key)
    with quant.quant_mode("int8"):
        fnq = sampling.make_img2img_fn(modules, 4, 0.5, 5.0, jit=False)
        got = fnq(params, img, ctx, ctx, key)
    assert np.isfinite(np.asarray(got)).all()
    mse = float(jnp.mean((got - ref) ** 2))
    psnr = 10 * np.log10(4.0 / max(mse, 1e-12))  # range [-1,1] -> peak 2
    assert psnr > 25.0, psnr


def test_implicit_gemm_conv_kernel_matches_xla_int8(monkeypatch):
    """The Pallas implicit-GEMM int8 conv (interpret mode) must match the
    XLA int8 conv path bit-for-bit at several SD shapes (same quantized
    operands, same int32 accumulation)."""
    from image_restoration_and_enhancement_tpu.ops import conv_int8

    key = jax.random.PRNGKey(11)
    for (b, h, w, c, n) in [(2, 8, 8, 32, 16), (1, 16, 6, 16, 8),
                            (1, 5, 5, 8, 8)]:
        x = jax.random.normal(jax.random.fold_in(key, h * w), (b, h, w, c))
        wgt = jax.random.normal(jax.random.fold_in(key, c), (3, 3, c, n)) * 0.1
        dn = jax.lax.conv_dimension_numbers(x.shape, wgt.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        with quant.quant_mode("int8"):
            ref = quant.conv_general_dilated(x, wgt, (1, 1), ((1, 1), (1, 1)),
                                             dimension_numbers=dn)
        xq, sx = quant._quantize_per_tensor(x)
        wq, sw = quant._quantize_weight_out_channel(wgt)
        xp = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
        got = conv_int8.conv3x3_same_int8(xp, wq, sx * sw,
                                          out_dtype=x.dtype, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_implicit_gemm_conv_kernel_tiling(monkeypatch):
    """Ragged m/n tiling: tile_m smaller than a row block and tile_n < N."""
    from image_restoration_and_enhancement_tpu.ops import conv_int8

    monkeypatch.setenv("IRET_CONV_TILE_M", "16")
    monkeypatch.setenv("IRET_CONV_TILE_N", "8")
    x = jax.random.normal(jax.random.PRNGKey(12), (1, 10, 7, 16))
    wgt = jax.random.normal(jax.random.PRNGKey(13), (3, 3, 16, 24)) * 0.1
    dn = jax.lax.conv_dimension_numbers(x.shape, wgt.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    with quant.quant_mode("int8"):
        ref = quant.conv_general_dilated(x, wgt, (1, 1), ((1, 1), (1, 1)),
                                         dimension_numbers=dn)
    xq, sx = quant._quantize_per_tensor(x)
    wq, sw = quant._quantize_weight_out_channel(wgt)
    xp = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
    got = conv_int8.conv3x3_same_int8(xp, wq, sx * sw, out_dtype=x.dtype,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_conv_kernel_hw_gate_routes_by_spatial_size(monkeypatch):
    """IRET_CONV_KERNEL_HW limits Pallas-kernel routing to the listed
    spatial heights (per-shape measured window, like the attention
    dispatch); other shapes stay on the XLA int8 conv."""
    from image_restoration_and_enhancement_tpu.ops import conv_int8

    calls = []
    real = conv_int8.conv3x3_same_int8

    def spy(*a, **kw):
        calls.append(a[0].shape)
        return real(*a, interpret=True, **{k: v for k, v in kw.items()
                                           if k != "interpret"})

    monkeypatch.setattr(conv_int8, "conv3x3_same_int8", spy)
    monkeypatch.setenv("IRET_CONV_KERNEL", "1")
    monkeypatch.setenv("IRET_CONV_KERNEL_HW", "8,16")

    key = jax.random.PRNGKey(7)
    for h, should_route in [(8, True), (16, True), (4, False)]:
        calls.clear()
        x = jax.random.normal(jax.random.fold_in(key, h), (1, h, h, 16))
        wgt = jax.random.normal(jax.random.fold_in(key, 99), (3, 3, 16, 8)) * 0.1
        dn = jax.lax.conv_dimension_numbers(x.shape, wgt.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        with quant.quant_mode("int8"):
            out = quant.conv_general_dilated(
                x, wgt, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)
        assert bool(calls) == should_route, (h, calls)
        assert np.isfinite(np.asarray(out)).all()


def test_static_calibration_roundtrip(tiny_stack):
    """int8_static: calibrate -> static table -> serving trace has no
    dynamic fallbacks and stays close to the bf16 loop (the absmax reduces
    are gone from the graph; that's the perf point, asserted on HLO)."""
    modules, params = tiny_stack
    img = jax.random.uniform(jax.random.PRNGKey(10), (1, 64, 64, 3),
                             minval=-1.0, maxval=1.0)
    ids = jnp.zeros((1, 77), jnp.int32)
    ctx = sampling.encode_text(modules, params, ids)
    key = jax.random.PRNGKey(42)

    calib = sampling.make_calib_img2img_fn(modules, 4, 0.5, 5.0, jit=False)
    out, stats = calib(params, img, ctx, ctx, key)
    assert np.isfinite(np.asarray(out)).all()
    assert len(stats) > 10  # unet + vae sites
    assert all(np.isfinite(float(v)) and float(v) > 0 for v in stats.values())

    quant.load_static_table({k: float(v) for k, v in stats.items()})
    try:
        with quant.quant_mode("int8_static"):
            fnq = sampling.make_img2img_fn(modules, 4, 0.5, 5.0, jit=False)
            got = fnq(params, img, ctx, ctx, key)
            lowered = jax.jit(fnq).lower(params, img, ctx, ctx, key)
        assert quant.static_misses() == set()
        ref = sampling.make_img2img_fn(modules, 4, 0.5, 5.0, jit=False)(
            params, img, ctx, ctx, key)
        mse = float(jnp.mean((got - ref) ** 2))
        psnr = 10 * np.log10(4.0 / max(mse, 1e-12))
        assert psnr > 25.0, psnr
        # the whole point: no per-activation absmax reduces in the graph.
        # Weight-quant reduces remain (hoisted out of the loop by XLA), so
        # compare against the dynamic-mode trace which has strictly more.
        n_static = lowered.as_text().count("reduce(")
        with quant.quant_mode("int8"):
            fdyn = sampling.make_img2img_fn(modules, 4, 0.5, 5.0, jit=False)
            n_dyn = jax.jit(fdyn).lower(params, img, ctx, ctx, key).as_text().count("reduce(")
        assert n_static < n_dyn, (n_static, n_dyn)
    finally:
        quant.load_static_table({})


def test_1x1_conv_as_dot_matches_conv_form(monkeypatch):
    """IRET_PROJ1X1_AS_DOT routes quantized 1x1 convs through dot_general;
    the integer accumulation is exact, so both forms must agree bitwise."""
    key = jax.random.PRNGKey(7)
    x = jax.random.normal(key, (2, 8, 8, 96))
    w = jax.random.normal(jax.random.PRNGKey(8), (1, 1, 96, 32)) * 0.05
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    with quant.quant_mode("int8"):
        conv_form = quant.conv_general_dilated(x, w, (1, 1), "SAME",
                                               dimension_numbers=dn)
        monkeypatch.setenv("IRET_PROJ1X1_AS_DOT", "1")
        dot_form = quant.conv_general_dilated(x, w, (1, 1), "SAME",
                                              dimension_numbers=dn)
    assert conv_form.shape == dot_form.shape
    np.testing.assert_array_equal(np.asarray(conv_form), np.asarray(dot_form))


def test_pad_conv_cin_exact(monkeypatch):
    """Zero-padding the input-channel axis must not change the integer
    accumulation: bitwise-equal outputs."""
    key = jax.random.PRNGKey(9)
    x = jax.random.normal(key, (1, 4, 4, 960))
    w = jax.random.normal(jax.random.PRNGKey(10), (3, 3, 960, 32)) * 0.02
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    with quant.quant_mode("int8"):
        plain = quant.conv_general_dilated(x, w, (1, 1), "SAME",
                                           dimension_numbers=dn)
        monkeypatch.setenv("IRET_PAD_CONV_CIN", "1")
        padded = quant.conv_general_dilated(x, w, (1, 1), "SAME",
                                            dimension_numbers=dn)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(padded))
