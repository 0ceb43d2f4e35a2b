"""Programmatic surface of app.py (the Gradio UI module): process_image
must work without gradio installed and without checkpoints (classical
fallbacks), preserving the reference's gallery contract (app.py:55-141)."""
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import app  # noqa: E402


def test_process_image_gallery_contract(tmp_path, monkeypatch):
    # no checkpoints anywhere -> classical fallbacks
    monkeypatch.setattr(app, "_pipeline", None)
    from image_restoration_and_enhancement_tpu.infer import pipeline as pl

    monkeypatch.setattr(pl, "DEFAULT_MODEL_ROOT", str(tmp_path / "none"),
                        raising=False)
    rng = np.random.RandomState(0)
    img = Image.fromarray(rng.randint(0, 255, (96, 96, 3), np.uint8))

    gallery, final = app.process_image(img, ["denoise", "colorize"],
                                       mode="pretrained")
    captions = [c for _, c in gallery]
    assert captions[0] == "original" and captions[-1] == "final"
    assert "denoised" in captions
    assert final is not None and np.asarray(final).shape[2] == 3

    # None image contract
    gallery, final = app.process_image(None, ["denoise"])
    assert gallery == [] and final is None


def test_pretrained_mode_reinitializes(monkeypatch):
    monkeypatch.setattr(app, "_pipeline", None)
    p1 = app.initialize_pipeline("pretrained")
    p2 = app.initialize_pipeline("pretrained")
    assert p1 is p2  # cached while the mode is unchanged
    p3 = app.initialize_pipeline("fine_tuned")
    assert p3 is not p2
