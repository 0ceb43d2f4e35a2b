"""End-to-end trainer orchestration on a tiny model + synthetic pairs:
epochs, validation, metrics.csv, best/final checkpoints, exact resume."""
import csv
import os

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from image_restoration_and_enhancement_tpu import config as C
from image_restoration_and_enhancement_tpu.core import checkpoint as ckpt
from image_restoration_and_enhancement_tpu.train.loop import TrainConfig
from image_restoration_and_enhancement_tpu.train.trainer import train_task


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


def test_train_task_tiny_end_to_end(pair_root, tmp_path):
    out_dir = str(tmp_path / "out")
    cfg = TrainConfig(
        num_epochs=2, batch_size=2, gradient_accumulation_steps=1,
        lambda_img=0.0, image_size=64, save_steps=-1,
    )
    metrics = train_task(
        "denoise", data_root=pair_root, output_dir=out_dir, cfg=cfg,
        use_mesh=False, dtype=jnp.float32, model_config=C.TINY_SD,
    )
    assert "psnr" in metrics and np.isfinite(metrics["psnr"])
    # best + final checkpoints exist and load
    assert ckpt.pipeline_exists(os.path.join(out_dir, "best"))
    assert ckpt.pipeline_exists(os.path.join(out_dir, "final"))
    loaded = ckpt.load_pipeline(os.path.join(out_dir, "best"))
    assert {"unet", "vae", "text_encoder"} <= set(loaded)
    # metrics.csv has 2 epoch rows with the denoise column set
    csv_path = os.path.join(out_dir, "metrics_denoise.csv")
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2
    assert {"epoch", "psnr", "ssim", "psnr_y", "ssim_y", "train_loss"} <= set(rows[0])
    # val strip saved
    assert os.path.exists(os.path.join(out_dir, "val_samples", "epoch_1.png"))
    # training log written
    assert os.path.exists(os.path.join(out_dir, "training_denoise.log"))
    # orbax train state saved for exact resume
    from image_restoration_and_enhancement_tpu.core.checkpoint import TrainCheckpointer

    tc = TrainCheckpointer(os.path.join(out_dir, "train_state"))
    assert tc.latest_step() == 4  # 2 epochs x 2 steps
