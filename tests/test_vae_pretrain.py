"""VAE reconstruction pretraining (tiny) + frozen-component seeding into
the task trainer via train_task(vae_init=...)."""
import csv
import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from image_restoration_and_enhancement_tpu import config as C
from image_restoration_and_enhancement_tpu.core import checkpoint as ckpt
from image_restoration_and_enhancement_tpu.train.loop import TrainConfig
from image_restoration_and_enhancement_tpu.train.trainer import train_task
from image_restoration_and_enhancement_tpu.train.vae_pretrain import (
    VAEPretrainConfig, pretrain_vae,
)


@pytest.fixture(scope="module")
def clean_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("clean")
    rng = np.random.default_rng(0)
    for split, n in [("train", 6), ("val", 2)]:
        d = root / split
        d.mkdir(parents=True)
        for i in range(n):
            img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(d / f"c{i}.png")
    return str(root)


@pytest.fixture(scope="module")
def vae_out(clean_root, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("vae_out"))
    cfg = VAEPretrainConfig(num_epochs=2, batch_size=2, image_size=64)
    metrics = pretrain_vae(
        data_root=clean_root, output_dir=out, cfg=cfg,
        model_config=C.TINY_SD, use_mesh=False, dtype=jnp.float32,
    )
    return out, metrics


def test_vae_pretrain_tiny_end_to_end(vae_out):
    out, metrics = vae_out
    assert np.isfinite(metrics["psnr"])
    assert np.isfinite(metrics["latent_std"]) and metrics["latent_std"] > 0
    assert ckpt.pipeline_exists(os.path.join(out, "best"))
    assert ckpt.pipeline_exists(os.path.join(out, "final"))
    loaded = ckpt.load_pipeline(os.path.join(out, "best"))
    assert set(loaded) == {"vae"}
    with open(os.path.join(out, "metrics_vae.csv")) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2
    assert {"epoch", "psnr", "latent_std", "train_loss"} <= set(rows[0])
    assert os.path.exists(os.path.join(out, "training_vae.log"))


@pytest.fixture(scope="module")
def pair_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("pairs")
    rng = np.random.default_rng(0)
    for split, n in [("train", 4), ("val", 2)]:
        base = root / "denoise" / split
        for kind in ("input", "gt"):
            (base / kind).mkdir(parents=True)
        for i in range(n):
            img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(base / "gt" / f"i{i}.png")
            noisy = np.clip(
                img.astype(np.float32) + rng.normal(0, 10, img.shape), 0, 255
            ).astype(np.uint8)
            Image.fromarray(noisy).save(base / "input" / f"i{i}.png")
    return str(root)


def test_train_task_vae_init_seeds_frozen_vae(vae_out, pair_root, tmp_path):
    vae_dir, _ = vae_out
    best = os.path.join(vae_dir, "best")
    seeded_vae = ckpt.load_pipeline(best)["vae"]
    out_dir = str(tmp_path / "out")
    cfg = TrainConfig(
        num_epochs=1, batch_size=2, gradient_accumulation_steps=1,
        lambda_img=0.0, image_size=64, save_steps=-1,
    )
    train_task(
        "denoise", data_root=pair_root, output_dir=out_dir, cfg=cfg,
        vae_init=best, use_mesh=False, dtype=jnp.float32,
        model_config=C.TINY_SD,
    )
    saved = ckpt.load_pipeline(os.path.join(out_dir, "best"))
    got = jax.tree.leaves(saved["vae"])
    want = jax.tree.leaves(seeded_vae)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w))


def test_vae_init_overwrites_stale_frozen_vae_in_best(vae_out, pair_root, tmp_path):
    """A best/ left by a run WITHOUT --vae_init holds a random frozen VAE;
    a later run WITH --vae_init trains the UNet against the seeded VAE and
    its best-save must overwrite the stale one (skip_existing would
    otherwise keep it, and serving best/ would decode through the wrong
    VAE — silent garbage)."""
    vae_dir, _ = vae_out
    best = os.path.join(vae_dir, "best")
    seeded_vae = ckpt.load_pipeline(best)["vae"]
    out_dir = str(tmp_path / "out")
    cfg = TrainConfig(
        num_epochs=1, batch_size=2, gradient_accumulation_steps=1,
        lambda_img=0.0, image_size=64, save_steps=-1,
    )
    # run 1: no vae_init -> best/vae is the random-init frozen VAE
    train_task(
        "denoise", data_root=pair_root, output_dir=out_dir, cfg=cfg,
        use_mesh=False, dtype=jnp.float32, model_config=C.TINY_SD,
    )
    stale = jax.tree.leaves(ckpt.load_pipeline(os.path.join(out_dir, "best"))["vae"])
    want = jax.tree.leaves(seeded_vae)
    assert any(
        not np.allclose(np.asarray(s), np.asarray(w))
        for s, w in zip(stale, want)
    )
    # run 2: same output_dir, now seeded — best/vae must be the seeded one
    train_task(
        "denoise", data_root=pair_root, output_dir=out_dir, cfg=cfg,
        vae_init=best, use_mesh=False, dtype=jnp.float32,
        model_config=C.TINY_SD,
    )
    got = jax.tree.leaves(ckpt.load_pipeline(os.path.join(out_dir, "best"))["vae"])
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w))
