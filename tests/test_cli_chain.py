"""End-to-end CLI chain smoke: clean images -> synthetic pairs ->
predictions (classical fallbacks; no checkpoints) -> evaluation JSON.

This is the reference's acceptance flow (SURVEY §3.4/§3.5:
make_synthetic_pairs -> generate_predictions -> evaluate_model) driven
through the real argparse entry points in subprocesses, so path
conventions and CLI contracts are covered — a crash here is exactly the
class of bug unit tests miss (e.g. evaluate_model's bare --out_json
dirname crash, fixed 10b5dd2)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(REPO, "scripts")


def _run(args, cwd):
    # IRET_PLATFORM pins the subprocess to CPU even where a TPU
    # plugin overrides JAX_PLATFORMS (package __init__ hook) — the
    # chain is classical-fallback CPU work and must not depend on
    # (or block on) the TPU relay.
    env = dict(os.environ, IRET_PLATFORM="cpu")
    p = subprocess.run(
        [sys.executable, *args], cwd=cwd, capture_output=True, text=True,
        timeout=600, env=env,
    )
    assert p.returncode == 0, f"{args[0]} failed:\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}"
    return p.stdout


@pytest.mark.slow
def test_pairs_predict_evaluate_chain(tmp_path):
    rng = np.random.default_rng(0)
    clean = tmp_path / "data" / "clean" / "test"
    clean.mkdir(parents=True)
    for i in range(2):
        arr = (rng.random((64, 64, 3)) * 255).astype("uint8")
        Image.fromarray(arr).save(clean / f"img_{i}.jpg")

    _run([os.path.join(SCRIPTS, "make_synthetic_pairs.py"),
          "--clean_root", "data/clean", "--out_root", "data/pairs",
          "--splits", "test", "--seed", "0"], cwd=tmp_path)
    for task in ("denoise", "sr_x4", "colorize", "inpaint"):
        assert (tmp_path / "data" / "pairs" / task / "test" / "input").is_dir()
    assert (tmp_path / "data" / "pairs" / "inpaint" / "test" / "mask").is_dir()

    # no checkpoints under models_root -> classical fallback backends
    _run([os.path.join(SCRIPTS, "generate_predictions.py"),
          "--data_root", "data/pairs", "--out_root", "preds",
          "--models_root", "nonexistent_models",
          "--tasks", "denoise", "inpaint", "--max_images", "1"], cwd=tmp_path)

    _run([os.path.join(SCRIPTS, "evaluate_model.py"),
          "--pred_root", "preds", "--data_root", "data/pairs",
          "--tasks", "denoise", "inpaint",
          "--out_json", "results.json"], cwd=tmp_path)  # bare filename on purpose

    results = json.loads((tmp_path / "results.json").read_text())
    for task in ("denoise", "inpaint"):
        assert results[task]["num_images"] == 1
        assert np.isfinite(results[task]["metrics"]["psnr"]["mean"])
