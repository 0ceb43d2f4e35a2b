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


def test_state_save_epochs_never(pair_root, tmp_path):
    """state_save_epochs=-1 skips ALL orbax train-state saves (weights-only
    throwaway runs on slow disks); best/ + final/ pipelines still land."""
    out_dir = str(tmp_path / "out_nostate")
    cfg = TrainConfig(
        num_epochs=2, batch_size=2, gradient_accumulation_steps=1,
        lambda_img=0.0, image_size=64, save_steps=-1, state_save_epochs=-1,
    )
    train_task(
        "denoise", data_root=pair_root, output_dir=out_dir, cfg=cfg,
        use_mesh=False, dtype=jnp.float32, model_config=C.TINY_SD,
    )
    assert ckpt.pipeline_exists(os.path.join(out_dir, "best"))
    assert ckpt.pipeline_exists(os.path.join(out_dir, "final"))
    state_dir = os.path.join(out_dir, "train_state")
    steps = os.listdir(state_dir) if os.path.isdir(state_dir) else []
    assert not steps, f"state_save_epochs=-1 wrote train state: {steps}"


def test_resume_continues_epoch_schedule(pair_root, tmp_path):
    """--resume must continue where the state left off: train only the
    REMAINING epochs (epoch offset derived from state.step), keep CSV epoch
    numbering monotonic, and keep best-checkpoint selection monotonic by
    restoring best val PSNR from best/model_index.json."""
    out_dir = str(tmp_path / "out_resume")
    base = dict(batch_size=2, gradient_accumulation_steps=1, lambda_img=0.0,
                image_size=64, save_steps=-1, state_save_epochs=1)
    train_task(
        "denoise", data_root=pair_root, output_dir=out_dir,
        cfg=TrainConfig(num_epochs=1, **base),
        use_mesh=False, dtype=jnp.float32, model_config=C.TINY_SD,
    )
    # pretend the 3-epoch run was interrupted after epoch 1: resume to 3
    train_task(
        "denoise", data_root=pair_root, output_dir=out_dir,
        cfg=TrainConfig(num_epochs=3, **base),
        use_mesh=False, dtype=jnp.float32, model_config=C.TINY_SD,
        resume=True,
    )
    with open(os.path.join(out_dir, "metrics_denoise.csv")) as f:
        rows = list(csv.DictReader(f))
    assert [r["epoch"] for r in rows] == ["1", "2", "3"], rows
    from image_restoration_and_enhancement_tpu.core.checkpoint import TrainCheckpointer

    tc = TrainCheckpointer(os.path.join(out_dir, "train_state"))
    assert tc.latest_step() == 6  # 3 epochs x 2 steps total, not 1+3 epochs


def test_train_cli_base_model_sdxl(pair_root, tmp_path):
    """Reference exposes --base_model on the trainer CLI
    (train_denoising.py:950,:531-594); ours must reach the SDXL stack
    end-to-end from the command line."""
    import subprocess
    import sys

    out_dir = str(tmp_path / "out_sdxl")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "train_denoising.py"),
         "--base_model", "tiny_sdxl", "--data_root", pair_root,
         "--output_dir", out_dir, "--num_epochs", "1", "--batch_size", "2",
         "--gradient_accumulation_steps", "1", "--image_size", "64",
         "--save_steps", "-1", "--no_mesh", "--lambda_img", "0.0"],
        capture_output=True, text=True, timeout=1200,
        env=dict(os.environ, IRET_PLATFORM="cpu"),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert ckpt.pipeline_exists(os.path.join(out_dir, "final"))
    meta = ckpt.load_pipeline(os.path.join(out_dir, "best"))
    # SDXL stack carries the second text tower
    assert "text_encoder_2" in meta or "unet" in meta


def test_validation_lpips_column_populated(pair_root, tmp_path, monkeypatch):
    """With LPIPS weights available, run_validation must fill the lpips CSV
    column (reference validation computes LPIPS, train_denoising.py:328-519).
    Weights are absent in this env, so stub the perceptual entry points."""
    from image_restoration_and_enhancement_tpu.train import trainer as T

    monkeypatch.setattr(T.perceptual, "lpips_available", lambda: True)
    monkeypatch.setattr(
        T.perceptual, "lpips_pairs",
        lambda preds, gts: [0.123 for _ in preds],
    )
    out_dir = str(tmp_path / "out_lpips")
    cfg = TrainConfig(
        num_epochs=1, batch_size=2, gradient_accumulation_steps=1,
        lambda_img=0.0, image_size=64, save_steps=-1,
    )
    train_task(
        "denoise", data_root=pair_root, output_dir=out_dir, cfg=cfg,
        use_mesh=False, dtype=jnp.float32, model_config=C.TINY_SD,
    )
    with open(os.path.join(out_dir, "metrics_denoise.csv")) as f:
        rows = list(csv.DictReader(f))
    assert rows and abs(float(rows[0]["lpips"]) - 0.123) < 1e-6


def test_non_main_process_writes_nothing(pair_root, tmp_path, monkeypatch):
    """Multi-host write gating (SURVEY §2.3; reference accelerator.
    is_main_process at train_denoising.py:726,:780): on process_index!=0
    the trainer must train but write NO logs/CSV/strips/checkpoints.

    The Orbax train-state save is intentionally NOT gated — orbax saves
    are collective (every process must participate; each writes its own
    shards). A fake process_index=1 in a single-process test would make
    orbax wait forever for the phantom primary, so stub it while
    asserting it IS still invoked on the non-main process."""
    import jax

    from image_restoration_and_enhancement_tpu.core import checkpoint as _ck

    monkeypatch.setattr(jax, "process_index", lambda: 1)
    orbax_calls = []
    monkeypatch.setattr(
        _ck.TrainCheckpointer, "save",
        lambda self, step, state, wait=False, checksums=None:
            orbax_calls.append(step))
    out_dir = str(tmp_path / "out_worker")
    cfg = TrainConfig(
        num_epochs=1, batch_size=2, gradient_accumulation_steps=1,
        lambda_img=0.0, image_size=64, save_steps=-1,
    )
    metrics = train_task(
        "denoise", data_root=pair_root, output_dir=out_dir, cfg=cfg,
        use_mesh=False, dtype=jnp.float32, model_config=C.TINY_SD,
    )
    assert np.isfinite(metrics.get("train_loss", metrics.get("psnr", 0.0)))
    assert orbax_calls, "collective train-state save must run on every process"
    written = []
    for base, _, files in os.walk(out_dir):
        written += [os.path.join(base, f) for f in files]
    assert written == [], written


def test_setup_logging_replaces_previous_handler(tmp_path):
    """Back-to-back runs in one process (e.g. VAE pretrain then train_task)
    must not stack file handlers — stacking duplicates every later record
    into every earlier run's log file."""
    import logging

    from image_restoration_and_enhancement_tpu.train.trainer import _setup_logging

    root = logging.getLogger()
    try:
        _setup_logging(str(tmp_path / "a"), "vae")
        _setup_logging(str(tmp_path / "b"), "denoise")
        tagged = [h for h in root.handlers
                  if getattr(h, "_iret_task_log", False)]
        assert len(tagged) == 1
        assert tagged[0].baseFilename.endswith(
            os.path.join("b", "training_denoise.log"))
    finally:
        for h in [h for h in root.handlers
                  if getattr(h, "_iret_task_log", False)]:
            root.removeHandler(h)
            h.close()
