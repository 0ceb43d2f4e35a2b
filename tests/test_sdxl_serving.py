"""SDXL fine-tunes must serve through RestorationPipeline.process().

VERDICT r2 weak #6: `--base_model sdxl` could train a checkpoint the
pipeline couldn't load (encode_text was SD1.5-only and there was no
model-config override). Now checkpoints are self-describing
(model_index.json carries the SDModelConfig; core/checkpoint.py
load_pipeline_model_config) and _context dispatches via modules.is_sdxl.
Reference stack source: train_denoising.py:531-594 (SDXL branch)."""
import os

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from image_restoration_and_enhancement_tpu import config as C
from image_restoration_and_enhancement_tpu.core import checkpoint as ckpt
from image_restoration_and_enhancement_tpu.infer.pipeline import RestorationPipeline
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
            Image.fromarray(img).save(base / "input" / f"i{i}.png")
    return str(root)


@pytest.fixture(scope="module")
def models_root(pair_root, tmp_path_factory):
    """Train a tiny-SDXL denoise checkpoint through the production path
    (same as scripts/train_denoising.py --base_model tiny_sdxl)."""
    root = tmp_path_factory.mktemp("models")
    out_dir = os.path.join(str(root), "denoising")
    cfg = TrainConfig(
        num_epochs=1, batch_size=2, gradient_accumulation_steps=1,
        lambda_img=0.0, image_size=64, save_steps=-1,
    )
    train_task(
        "denoise", data_root=pair_root, output_dir=out_dir, cfg=cfg,
        use_mesh=False, dtype=jnp.float32, model_config=C.TINY_SDXL,
    )
    return str(root)


def test_checkpoint_is_self_describing(models_root):
    best = os.path.join(models_root, "denoising", "best")
    mc = ckpt.load_pipeline_model_config(best)
    assert mc is not None
    assert mc == C.TINY_SDXL
    assert mc.text_encoder_2 is not None


def test_sdxl_checkpoint_serves_through_process(models_root):
    p = RestorationPipeline(models_root=models_root, dtype=jnp.float32)
    img = (np.random.default_rng(1).random((64, 64, 3)) * 255).astype(np.uint8)
    res = p.process(img, ["denoise"])
    # the SDXL stack must actually have been used (not a classical fallback)
    stack = p._stacks["denoise"]
    assert stack is not None and stack["modules"].is_sdxl
    assert isinstance(p._ctx_cache[("denoise", p.prompts["denoise"])], tuple)
    out = np.asarray(res["denoised"])
    assert out.shape == (64, 64, 3)
    assert np.isfinite(out.astype(np.float32)).all()


def test_model_config_string_override(models_root):
    """Explicit per-task model_config='tiny_sdxl' (string preset) works."""
    p = RestorationPipeline(
        config={"denoise": {"model_config": "tiny_sdxl"}},
        models_root=models_root, dtype=jnp.float32,
    )
    stack = p._load_stack("denoise")
    assert stack is not None and stack["modules"].is_sdxl


def test_model_dir_fine_tuned_dir_still_self_describes(models_root):
    """fine_tuned_dir can be the MODEL dir (reference semantics resolve it
    to best/ or checkpoint-N). The self-description lookup must read the
    directory actually loaded, not the configured parent — a stale src_dir
    served SDXL weights through SD1.5-configured modules."""
    p = RestorationPipeline(
        config={"denoise": {
            "fine_tuned_dir": os.path.join(models_root, "denoising")}},
        dtype=jnp.float32,
    )
    stack = p._load_stack("denoise")
    assert stack is not None and stack["modules"].is_sdxl
