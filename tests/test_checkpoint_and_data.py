"""Checkpoint I/O, torch import mapping, datasets, native lib, fallbacks."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from image_restoration_and_enhancement_tpu import config as C, native
from image_restoration_and_enhancement_tpu.core import checkpoint as ckpt
from image_restoration_and_enhancement_tpu.data import host_degradations as hd
from image_restoration_and_enhancement_tpu.data.datasets import BatchLoader, PairDataset
from image_restoration_and_enhancement_tpu.infer import fallbacks
from image_restoration_and_enhancement_tpu.metrics.perceptual import (
    fid_from_features,
    frechet_distance,
)


# ---------------------------------------------------------------------------
# checkpoint round-trips
# ---------------------------------------------------------------------------


def _tiny_params():
    return {
        "unet": {"conv_in": {"kernel": np.ones((3, 3, 4, 8), np.float32),
                             "bias": np.zeros(8, np.float32)}},
        "vae": {"encoder": {"conv_in": {"kernel": np.ones((3, 3, 3, 8), np.float32)}}},
    }


def test_save_load_pipeline_roundtrip(tmp_path):
    d = str(tmp_path / "best")
    params = _tiny_params()
    ckpt.save_pipeline(d, params, C.TINY_SD)
    assert ckpt.pipeline_exists(d)
    loaded = ckpt.load_pipeline(d)
    np.testing.assert_array_equal(
        np.asarray(loaded["unet"]["conv_in"]["kernel"]),
        params["unet"]["conv_in"]["kernel"],
    )
    meta = json.load(open(os.path.join(d, "model_index.json")))
    assert "unet" in meta["components"]


def test_find_latest_checkpoint_semantics(tmp_path):
    root = str(tmp_path / "model")
    assert ckpt.find_latest_checkpoint(root) is None
    for step in (100, 900, 1000):
        ckpt.save_pipeline(os.path.join(root, f"checkpoint-{step}"), _tiny_params(), C.TINY_SD)
    assert ckpt.find_latest_checkpoint(root).endswith("checkpoint-1000")
    ckpt.save_pipeline(os.path.join(root, "best"), _tiny_params(), C.TINY_SD)
    assert ckpt.find_latest_checkpoint(root).endswith("best")


def test_save_params_non_contiguous(tmp_path):
    """Regression for the round-5 corruption: arrays fetched from
    TPU-layout buffers can be non-C-contiguous, and safetensors serializes
    raw bytes as C-order — save_params must normalize (and its write
    verification must pass) so the reload is bitwise-faithful."""
    base = np.arange(3 * 3 * 128 * 3, dtype=np.float32).reshape(3, 3, 3, 128)
    noncontig = base.transpose(0, 1, 3, 2)  # (3,3,128,3), strides swapped
    assert not noncontig.flags.c_contiguous
    path = str(tmp_path / "m" / "model.safetensors")
    ckpt.save_params({"conv_out": {"kernel": noncontig}}, path)
    loaded = ckpt.load_params(path)
    np.testing.assert_array_equal(
        np.asarray(loaded["conv_out"]["kernel"]), noncontig
    )


def test_fetch_params_verified_identity(monkeypatch):
    """Forced-verify path returns the tree unchanged when fetches are clean."""
    monkeypatch.setenv("IRET_FORCE_VERIFY_FETCH", "1")
    tree = {"a": jnp.arange(12.0).reshape(3, 4), "b": jnp.ones((5,))}
    out = ckpt.fetch_params_verified(tree)
    np.testing.assert_array_equal(out["a"], np.arange(12.0).reshape(3, 4))
    np.testing.assert_array_equal(out["b"], np.ones((5,)))


def test_fetch_params_verified_catches_stale_fetch(monkeypatch):
    """A stale first fetch (the observed relay corruption: near-init
    contents returned for a live trained buffer) must be detected by the
    device checksums and healed by the fresh-buffer refetch; a permanently
    stale fetch must raise rather than write a corrupt checkpoint."""
    monkeypatch.setenv("IRET_FORCE_VERIFY_FETCH", "1")
    tree = {"w": jnp.full((4, 4), 7.0)}

    calls = {"n": 0}

    def stale_once(x):
        calls["n"] += 1
        if calls["n"] == 1:
            return np.zeros_like(np.asarray(x))  # stale near-init buffer
        return np.asarray(x)

    monkeypatch.setattr(ckpt.fetch_params_verified, "_fetch", stale_once,
                        raising=False)
    out = ckpt.fetch_params_verified(tree)
    np.testing.assert_array_equal(out["w"], np.full((4, 4), 7.0))
    assert calls["n"] >= 2  # the refetch actually happened

    monkeypatch.setattr(
        ckpt.fetch_params_verified, "_fetch",
        lambda x: np.zeros_like(np.asarray(x)), raising=False,
    )
    with pytest.raises(RuntimeError, match="corrupt"):
        ckpt.fetch_params_verified(tree)


def test_torch_import_name_mapping():
    """Round-trip: torch-style names/layouts -> flax tree with transposes."""
    state = {
        "conv_in.weight": np.random.rand(8, 4, 3, 3).astype(np.float32),
        "conv_in.bias": np.zeros(8, np.float32),
        "down_blocks.0.resnets.0.norm1.weight": np.ones(8, np.float32),
        "down_blocks.0.resnets.0.norm1.bias": np.zeros(8, np.float32),
        "down_blocks.0.resnets.0.conv1.weight": np.random.rand(8, 8, 3, 3).astype(np.float32),
        "down_blocks.0.resnets.0.time_emb_proj.weight": np.random.rand(8, 32).astype(np.float32),
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight":
            np.random.rand(8, 8).astype(np.float32),
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_out.0.weight":
            np.random.rand(8, 8).astype(np.float32),
        "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight":
            np.random.rand(64, 8).astype(np.float32),
        "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.2.weight":
            np.random.rand(8, 32).astype(np.float32),
        "down_blocks.0.attentions.0.proj_in.weight": np.random.rand(8, 8, 1, 1).astype(np.float32),
        "down_blocks.0.downsamplers.0.conv.weight": np.random.rand(8, 8, 3, 3).astype(np.float32),
        "text_model.encoder.layers.0.self_attn.q_proj.weight": np.random.rand(16, 16).astype(np.float32),
        "text_model.embeddings.token_embedding.weight": np.random.rand(100, 16).astype(np.float32),
        "text_model.final_layer_norm.weight": np.ones(16, np.float32),
    }
    tree = ckpt.import_torch_state_dict(state)
    # conv OIHW -> HWIO
    assert tree["conv_in"]["kernel"].shape == (3, 3, 4, 8)
    # dense transposed
    assert tree["down_blocks_0"]["resnets_0"]["time_emb_proj"]["kernel"].shape == (32, 8)
    # norm scale naming
    assert "scale" in tree["down_blocks_0"]["resnets_0"]["norm1"]
    # GEGLU ff mapping
    tb = tree["down_blocks_0"]["attentions_0"]["transformer_blocks_0"]
    assert tb["ff"]["proj_in"]["kernel"].shape == (8, 64)
    assert tb["ff"]["proj_out"]["kernel"].shape == (32, 8)
    assert tb["attn1"]["to_out"]["kernel"].shape == (8, 8)
    # Transformer2D 1x1 conv stays a conv
    assert tree["down_blocks_0"]["attentions_0"]["proj_in"]["kernel"].shape == (1, 1, 8, 8)
    # CLIP pieces
    assert tree["layers_0"]["self_attn"]["q_proj"]["kernel"].shape == (16, 16)
    assert tree["token_embedding"]["embedding"].shape == (100, 16)
    assert "scale" in tree["final_layer_norm"]


def test_import_matches_tiny_unet_structure():
    """Every mapped name from a synthetic torch dict must exist in the real
    tiny UNet param tree (guards against silent mapping drift)."""
    from image_restoration_and_enhancement_tpu.models.unet import UNet2DCondition

    model = UNet2DCondition(C.TINY_UNET, attention_backend="xla")
    params = jax.eval_shape(
        lambda k: model.init(
            k, jnp.zeros((1, 16, 16, 4)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, C.TINY_UNET.cross_attention_dim)),
        ),
        jax.random.PRNGKey(0),
    )["params"]
    flat = ckpt.flatten_params(jax.tree.map(lambda x: np.zeros(x.shape), params))
    # spot-check key paths exist
    for path in [
        "conv_in/kernel",
        "time_embedding/linear_1/kernel",
        "down_blocks_0/resnets_0/norm1/scale",
        "down_blocks_0/attentions_0/transformer_blocks_0/attn1/to_q/kernel",
        "down_blocks_0/attentions_0/transformer_blocks_0/ff/proj_in/kernel",
        "mid_block/attentions_0/proj_out/kernel",
        "up_blocks_3/resnets_1/conv2/kernel",  # tiny: layers_per_block+1 = 2
        "conv_norm_out/scale",
        "conv_out/bias",
    ]:
        assert path in flat, f"missing {path}"


# ---------------------------------------------------------------------------
# datasets
# ---------------------------------------------------------------------------


def _write_pairs(tmp_path, task="denoise", n=4, with_mask=False, size=40):
    rng = np.random.default_rng(0)
    base = tmp_path / "pairs" / task / "train"
    for kind in ["input", "gt"] + (["mask"] if with_mask else []):
        (base / kind).mkdir(parents=True, exist_ok=True)
    for i in range(n):
        img = (rng.random((size, size, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(base / "input" / f"img{i}.jpg")
        Image.fromarray(img).save(base / "gt" / f"img{i}.png")  # cross-ext match
        if with_mask:
            m = np.zeros((size, size), np.uint8)
            m[:10, :10] = 255
            Image.fromarray(m).save(base / "mask" / f"img{i}.png")
    return str(tmp_path / "pairs")


def test_pair_dataset_and_loader(tmp_path):
    root = _write_pairs(tmp_path, n=5)
    ds = PairDataset("denoise", root, "train", image_size=32)
    assert len(ds) == 5
    item = ds[0]
    assert item["input"].shape == (32, 32, 3)
    assert item["input"].min() >= -1.0 and item["input"].max() <= 1.0
    loader = BatchLoader(ds, batch_size=2, prefetch=True)
    batches = list(loader.epoch(0))
    assert len(batches) == 2  # drop_last
    assert batches[0]["gt"].shape == (2, 32, 32, 3)


def test_pair_dataset_mask_polarity(tmp_path):
    root = _write_pairs(tmp_path, task="inpaint", with_mask=True)
    ds = PairDataset("inpaint", root, "train", image_size=32)
    m = ds[0]["mask"]
    assert m.shape == (32, 32, 1)
    assert set(np.unique(m)).issubset({0.0, 1.0})
    assert m.mean() < 0.5  # hole is minority -> polarity kept


def test_max_samples(tmp_path):
    root = _write_pairs(tmp_path, n=5)
    ds = PairDataset("denoise", root, "train", image_size=32, max_samples=2)
    assert len(ds) == 2


# ---------------------------------------------------------------------------
# native lib
# ---------------------------------------------------------------------------


def test_native_resize_matches_reference_scaling(rng):
    img = rng.random((24, 24, 3)).astype(np.float32)
    out = native.resize_bicubic(img, (12, 12))
    assert out.shape == (12, 12, 3)
    np.testing.assert_allclose(out.mean(), img.mean(), atol=0.02)


def test_native_pm1_roundtrip(rng):
    u8 = (rng.random((8, 8, 3)) * 255).astype(np.uint8)
    pm1 = native.to_pm1(u8)
    assert pm1.min() >= -1 and pm1.max() <= 1
    back = native.from_pm1(pm1)
    np.testing.assert_array_equal(back, u8)


def test_native_noise_changes_image(rng):
    u8 = np.full((16, 16, 3), 128, np.uint8)
    noisy = native.add_gaussian_noise_u8(u8, 6.0, seed=123)
    resid = noisy.astype(np.float32) - 128.0
    assert 3.0 < resid.std() < 9.0
    # deterministic
    noisy2 = native.add_gaussian_noise_u8(u8, 6.0, seed=123)
    np.testing.assert_array_equal(noisy, noisy2)


def test_native_lab_l_vs_cv2(rng):
    import cv2

    u8 = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
    ours = native.rgb_to_lab_l(u8).astype(np.float32)
    ref = cv2.cvtColor(u8, cv2.COLOR_RGB2LAB)[:, :, 0].astype(np.float32)
    assert np.abs(ours - ref).mean() < 2.0


# ---------------------------------------------------------------------------
# host degradations + fallbacks
# ---------------------------------------------------------------------------


def test_host_degradations(rng):
    g = np.random.default_rng(0)
    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    assert hd.degrade_denoise(g, img).shape == img.shape
    lr = hd.degrade_sr(g, img, 4)
    assert lr.shape == (16, 16, 3)
    gray = hd.to_grayscale(img)
    assert gray.shape == (64, 64)
    masked, mask = hd.inpaint_pair(g, img)
    assert (masked[mask == 255] == 0).all()
    m = hd.free_form_mask(g, (64, 64))
    assert set(np.unique(m)).issubset({0, 255})


def test_fallbacks_contracts(rng):
    img = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
    assert fallbacks.denoise_opencv(img, 0.9).shape == img.shape
    assert fallbacks.sr_lanczos(img, 4).shape == (192, 192, 3)
    assert fallbacks.colorize_lab(img).shape == img.shape
    gray = np.stack([img[..., 0]] * 3, -1)
    assert not fallbacks.is_color_image(gray)
    assert fallbacks.is_color_image(img) or True  # random may be colorful
    # polarity: mostly-black mask inverts
    mask = np.zeros((48, 48), np.uint8)
    mask[:4, :4] = 255
    norm = fallbacks.normalize_mask(mask, (48, 48))
    assert (norm > 128).mean() > 0.9  # inverted
    # auto-mask flags an image with a big dark hole
    dark = img.copy()
    dark[10:30, 10:30] = 0
    am = fallbacks.auto_mask_from_image(dark)
    assert am is not None and am[15, 15] > 0


# ---------------------------------------------------------------------------
# FID math
# ---------------------------------------------------------------------------


def test_frechet_distance_identity():
    mu = np.zeros(4)
    sigma = np.eye(4)
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-8


def test_fid_from_features_orders_correctly(rng):
    a = rng.normal(0, 1, (500, 8))
    b = rng.normal(0.1, 1, (500, 8))
    c = rng.normal(3.0, 2, (500, 8))
    near = fid_from_features(a, b)
    far = fid_from_features(a, c)
    assert 0 <= near < far


def test_sigma_suffix_parsing(tmp_path):
    rng = np.random.default_rng(0)
    base = tmp_path / "pairs" / "denoise" / "val"
    for kind in ("input", "gt"):
        (base / kind).mkdir(parents=True)
    for i, name in enumerate(["a_sigma6.5", "b_sigma12", "c"]):
        img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(base / "input" / f"{name}.png")
        Image.fromarray(img).save(base / "gt" / f"{name}.png")
    ds = PairDataset("denoise", str(tmp_path / "pairs"), "val", image_size=16)
    by_stem = dict(zip([os.path.basename(p[0]) for p in ds.items], ds.sigmas))
    assert by_stem["a_sigma6.5.png"] == 6.5
    assert by_stem["b_sigma12.png"] == 12.0
    assert by_stem["c.png"] is None


def test_metrics_calculator_api(rng):
    from image_restoration_and_enhancement_tpu.metrics.calculator import (
        MetricsCalculator,
    )

    calc = MetricsCalculator(use_lpips=True, use_fid=True)  # weights absent
    a = (rng.random((24, 24, 3)) * 255).astype(np.uint8)
    b = np.clip(a.astype(np.int32) + 10, 0, 255).astype(np.uint8)
    out = calc.calculate_all(b, a)
    assert 0 < out["psnr"] < 60
    assert 0 < out["ssim"] <= 1
    assert calc.calculate_lpips(b, a) is None  # gated off without weights
    assert calc.calculate_delta_e(b, a) > 0
    # mismatched sizes auto-resize
    small = b[:12, :12]
    assert calc.calculate_psnr(small, a) > 0


@pytest.mark.parametrize("which", ["unet", "sdxl_unet", "vae", "clip"])
def test_torch_export_import_roundtrip_full_coverage(which):
    """Export EVERY param of a real (tiny) model to torch-style names, then
    import back: guarantees the converter covers the complete name space in
    both directions (no silent drops, exact layouts)."""
    from image_restoration_and_enhancement_tpu.models.clip_text import CLIPTextModel
    from image_restoration_and_enhancement_tpu.models.unet import UNet2DCondition
    from image_restoration_and_enhancement_tpu.models.vae import AutoencoderKL

    key = jax.random.PRNGKey(0)
    if which == "unet":
        m = UNet2DCondition(C.TINY_UNET, attention_backend="xla")
        params = m.init(key, jnp.zeros((1, 16, 16, 4)), jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1, 77, C.TINY_UNET.cross_attention_dim)))["params"]
    elif which == "sdxl_unet":
        m = UNet2DCondition(C.TINY_SDXL_UNET, attention_backend="xla")
        params = m.init(
            key, jnp.zeros((1, 16, 16, 4)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, C.TINY_SDXL_UNET.cross_attention_dim)),
            {"text_embeds": jnp.zeros((1, 8)), "time_ids": jnp.zeros((1, 6))},
        )["params"]
    elif which == "vae":
        m = AutoencoderKL(C.TINY_VAE)
        params = m.init(key, jnp.zeros((1, 32, 32, 3)))["params"]
    else:
        m = CLIPTextModel(C.TINY_CLIP_TEXT)
        params = m.init(key, jnp.zeros((1, 77), jnp.int32))["params"]

    state = ckpt.export_torch_state_dict(params)
    back = ckpt.import_torch_state_dict(state)

    flat_orig = ckpt.flatten_params(params)
    flat_back = ckpt.flatten_params(back)
    assert set(flat_orig) == set(flat_back), (
        sorted(set(flat_orig) ^ set(flat_back))[:10]
    )
    for k in flat_orig:
        np.testing.assert_array_equal(flat_orig[k], flat_back[k], err_msg=k)
