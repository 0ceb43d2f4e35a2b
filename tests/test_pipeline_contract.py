"""RestorationPipeline public-contract tests (classical-fallback paths —
no checkpoints on disk, so every task exercises its fallback chain)."""
import numpy as np
import pytest
from PIL import Image

from image_restoration_and_enhancement_tpu.infer.pipeline import RestorationPipeline


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    root = tmp_path_factory.mktemp("models")
    return RestorationPipeline(models_root=str(root))


@pytest.fixture
def color_img(rng):
    arr = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
    return Image.fromarray(arr)


def test_process_contract_keys(pipeline, color_img):
    out = pipeline.process(color_img, ["denoise"])
    assert set(out) >= {"original", "denoised", "final"}
    assert isinstance(out["final"], Image.Image)
    assert out["final"].size == color_img.size


def test_process_sequential_tasks(pipeline, color_img):
    out = pipeline.process(color_img, ["denoise", "sr"])
    assert "denoised" in out and "super_resolved" in out
    # SR x4 applied to the running image
    assert out["super_resolved"].size == (160, 160)
    assert out["final"].size == (160, 160)


def test_process_swallows_errors_and_keeps_final(pipeline, color_img):
    out = pipeline.process(color_img, ["not_a_task", "denoise"])
    assert "final" in out and "denoised" in out


def test_colorize_skips_color_images(pipeline):
    arr = np.zeros((32, 32, 3), np.uint8)
    arr[..., 0] = 250  # strongly colored
    out = pipeline.colorize(Image.fromarray(arr))
    np.testing.assert_array_equal(np.array(out), arr)


def test_colorize_runs_on_gray(pipeline, rng):
    g = (rng.random((32, 32)) * 255).astype(np.uint8)
    arr = np.stack([g] * 3, -1)
    out = np.array(pipeline.colorize(Image.fromarray(arr)))
    assert out.shape == (32, 32, 3)


def test_inpaint_no_mask_no_damage_returns_original(pipeline, rng):
    arr = (rng.random((32, 32, 3)) * 155 + 50).astype(np.uint8)  # mid-tones
    out = pipeline.inpaint(Image.fromarray(arr))
    np.testing.assert_array_equal(np.array(out), arr)


def test_inpaint_with_mask_returns_image(pipeline, color_img):
    mask = np.zeros((40, 40), np.uint8)
    mask[5:15, 5:15] = 255
    out = pipeline.inpaint(color_img, mask=Image.fromarray(mask))
    assert out.size == color_img.size


def test_pretrained_sentinel_uses_fallbacks():
    p = RestorationPipeline(
        config={name: {"fine_tuned_dir": "nonexistent"} for name in
                ("denoise", "sr_x4", "colorize", "inpaint")}
    )
    assert p._load_stack("denoise") is None  # classical fallback mode


def test_numpy_input_accepted(pipeline, rng):
    arr = (rng.random((24, 24, 3)) * 255).astype(np.uint8)
    out = pipeline.denoise(arr, strength=0.3)
    assert isinstance(out, Image.Image)


def test_diffusion_backend_without_weights_is_hard_error():
    """backend='diffusion' with no checkpoint anywhere must raise, never
    silently serve a random-init UNet (reference always has hub weights;
    inference.py:62-83)."""
    p = RestorationPipeline(
        config={"denoise": {"fine_tuned_dir": "nonexistent",
                            "default_backend": "diffusion"}}
    )
    with pytest.raises(RuntimeError, match="diffusion"):
        p._load_stack("denoise")


def test_pretrained_dir_loads_stack(tmp_path):
    """pretrained_dir pointing at one of our pipeline checkpoints must load
    in pretrained mode (reference pretrained_id path, inference.py:139-197)."""
    import jax
    import jax.numpy as jnp

    from image_restoration_and_enhancement_tpu import config as C
    from image_restoration_and_enhancement_tpu.core import checkpoint as ckpt
    from image_restoration_and_enhancement_tpu.core import sampling

    modules = sampling.SDModules.create(C.TINY_SD, dtype=jnp.float32)
    params = sampling.init_params(modules, jax.random.PRNGKey(0), image_size=64)
    pdir = str(tmp_path / "pretrained_sd")
    ckpt.save_pipeline(pdir, params, C.TINY_SD)

    from image_restoration_and_enhancement_tpu.tasks import registry
    import dataclasses as dc

    tiny_spec = dc.replace(registry.get_task("denoise"), model_config=C.TINY_SD)
    p = RestorationPipeline(
        config={"denoise": {"fine_tuned_dir": "nonexistent",
                            "pretrained_dir": pdir,
                            "default_backend": "diffusion"}},
        dtype=jnp.float32,
    )
    # patch the spec so the tiny checkpoint matches the model config
    import image_restoration_and_enhancement_tpu.infer.pipeline as pl
    orig = registry.TASKS["denoise"]
    registry.TASKS["denoise"] = tiny_spec
    try:
        stack = p._load_stack("denoise")
    finally:
        registry.TASKS["denoise"] = orig
    assert stack is not None
    assert "unet" in stack["params"]


def test_pipeline_quant_and_turbo_knobs(tmp_path):
    """quant="int8_static" + quant_calib JSON + cfg_cache_interval wired
    through RestorationPipeline: the diffusion denoise path must run on the
    tiny stack and produce a valid image under all three knobs at once."""
    import json

    import jax
    import jax.numpy as jnp
    import numpy as np

    from image_restoration_and_enhancement_tpu import config as C
    from image_restoration_and_enhancement_tpu.core import checkpoint as ckpt
    from image_restoration_and_enhancement_tpu.core import sampling
    from image_restoration_and_enhancement_tpu.ops import quant
    from image_restoration_and_enhancement_tpu.tasks import registry
    import dataclasses as dc

    modules = sampling.SDModules.create(C.TINY_SD, dtype=jnp.float32)
    params = sampling.init_params(modules, jax.random.PRNGKey(0), image_size=64)
    pdir = str(tmp_path / "ft" / "best")
    ckpt.save_pipeline(pdir, params, C.TINY_SD)

    # calibrate on a dummy image to build a real site table
    calib = sampling.make_calib_img2img_fn(modules, 2, 0.5, 5.0, jit=False)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    ctx = sampling.encode_text(modules, params, jnp.zeros((1, 77), jnp.int32))
    _, stats = calib(params, img, ctx, ctx, jax.random.PRNGKey(0))
    cpath = str(tmp_path / "calib.json")
    with open(cpath, "w") as f:
        json.dump({"sites": {k: float(v) for k, v in stats.items()}}, f)

    tiny_spec = dc.replace(registry.get_task("denoise"), model_config=C.TINY_SD)
    orig = registry.TASKS["denoise"]
    registry.TASKS["denoise"] = dc.replace(
        tiny_spec,
        sampler=dc.replace(tiny_spec.sampler, num_inference_steps=3),
    )
    try:
        p = RestorationPipeline(
            config={"denoise": {"fine_tuned_dir": str(tmp_path / "ft"),
                                "default_backend": "diffusion"}},
            dtype=jnp.float32,
            quant="int8_static",
            quant_calib=cpath,
            cfg_cache_interval=2,
        )
        rng = np.random.RandomState(0)
        x = rng.randint(0, 255, (64, 64, 3), np.uint8)
        out = np.asarray(p.denoise(x))
        assert out.shape == x.shape and out.dtype == np.uint8
        assert np.isfinite(out.astype(np.float32)).all()
    finally:
        registry.TASKS["denoise"] = orig
        quant.set_mode(None)
        quant.load_static_table({})


def test_pipeline_spatial_sharded_serving(tmp_path):
    """mesh + spatial_axis wired through RestorationPipeline: the denoise
    diffusion path runs the sharded img2img program (image height over
    `sp`, batch replicated) and matches the single-device pipeline's
    output exactly (same seed, same weights)."""
    import dataclasses as dc

    import jax
    import jax.numpy as jnp
    import numpy as np

    from image_restoration_and_enhancement_tpu import config as C
    from image_restoration_and_enhancement_tpu.core import checkpoint as ckpt
    from image_restoration_and_enhancement_tpu.core import sampling
    from image_restoration_and_enhancement_tpu.parallel import mesh as meshlib
    from image_restoration_and_enhancement_tpu.tasks import registry

    modules = sampling.SDModules.create(C.TINY_SD, dtype=jnp.float32)
    params = sampling.init_params(modules, jax.random.PRNGKey(0), image_size=64)
    pdir = str(tmp_path / "ft" / "best")
    ckpt.save_pipeline(pdir, params, C.TINY_SD)

    tiny_spec = dc.replace(registry.get_task("denoise"), model_config=C.TINY_SD)
    orig = registry.TASKS["denoise"]
    registry.TASKS["denoise"] = dc.replace(
        tiny_spec, sampler=dc.replace(tiny_spec.sampler, num_inference_steps=3),
    )
    cfg = {"denoise": {"fine_tuned_dir": str(tmp_path / "ft"),
                       "default_backend": "diffusion"}}
    rng = np.random.RandomState(0)
    x = rng.randint(0, 255, (128, 128, 3), np.uint8)
    try:
        ref = np.asarray(RestorationPipeline(config=cfg, dtype=jnp.float32,
                                             attention_backend="xla").denoise(x))
        mesh = meshlib.make_mesh((2,), ("sp",), devices=jax.devices()[:2])
        p = RestorationPipeline(config=cfg, dtype=jnp.float32,
                                mesh=mesh, spatial_axis="sp")
        assert p.attention_backend == "xla"  # forced by spatial_axis
        out = np.asarray(p.denoise(x))
    finally:
        registry.TASKS["denoise"] = orig
    assert out.shape == x.shape and out.dtype == np.uint8
    np.testing.assert_allclose(out.astype(np.int32), ref.astype(np.int32),
                               atol=1)  # uint8 rounding of fp noise


def test_int8_static_miss_warning_and_strict_mode(tmp_path, caplog, monkeypatch):
    """Calibration/serving drift must be LOUD: serving int8_static with an
    empty/stale calibration table warns per missing site, and
    IRET_QUANT_STRICT=1 turns it into a hard error (VERDICT r2 weak #3)."""
    import logging as _logging

    import jax
    import jax.numpy as jnp
    import numpy as np

    from image_restoration_and_enhancement_tpu import config as C
    from image_restoration_and_enhancement_tpu.core import checkpoint as ckpt
    from image_restoration_and_enhancement_tpu.core import sampling
    from image_restoration_and_enhancement_tpu.ops import quant
    from image_restoration_and_enhancement_tpu.tasks import registry
    import dataclasses as dc

    modules = sampling.SDModules.create(C.TINY_SD, dtype=jnp.float32)
    params = sampling.init_params(modules, jax.random.PRNGKey(0), image_size=64)
    pdir = str(tmp_path / "ft" / "best")
    ckpt.save_pipeline(pdir, params, C.TINY_SD)

    orig = registry.TASKS["denoise"]
    registry.TASKS["denoise"] = dc.replace(
        orig, model_config=C.TINY_SD,
        sampler=dc.replace(orig.sampler, num_inference_steps=2),
    )
    try:
        # int8_static with an EMPTY table: every site is a miss
        p = RestorationPipeline(
            config={"denoise": {"fine_tuned_dir": str(tmp_path / "ft"),
                                "default_backend": "diffusion"}},
            dtype=jnp.float32, quant="int8_static",
        )
        quant.load_static_table({})
        x = np.random.RandomState(0).randint(0, 255, (64, 64, 3), np.uint8)
        with caplog.at_level(_logging.WARNING):
            out = np.asarray(p.denoise(x))
        assert out.shape == x.shape
        assert any("calibration table" in r.message for r in caplog.records)

        # strict mode: same situation is a hard error THROUGH THE PUBLIC
        # API — StrictQuantError must not be swallowed into the classical
        # fallback by denoise()/process() (that silent degradation is what
        # strict mode exists to prevent)
        from image_restoration_and_enhancement_tpu.infer.pipeline import (
            StrictQuantError,
        )

        monkeypatch.setenv("IRET_QUANT_STRICT", "1")
        p2 = RestorationPipeline(
            config={"denoise": {"fine_tuned_dir": str(tmp_path / "ft"),
                                "default_backend": "diffusion"}},
            dtype=jnp.float32, quant="int8_static",
        )
        quant.load_static_table({})
        import pytest as _pytest

        with _pytest.raises(StrictQuantError, match="calibration table"):
            p2.denoise(x)
        with _pytest.raises(StrictQuantError, match="calibration table"):
            p2.process(x, ["denoise"])
    finally:
        registry.TASKS["denoise"] = orig
        quant.set_mode(None)
        quant.load_static_table({})
