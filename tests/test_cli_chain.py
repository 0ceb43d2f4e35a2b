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


@pytest.mark.slow
def test_evaluate_fail_loud_and_input_baseline(tmp_path):
    """VERDICT r3 weak #2: a requested task with missing dirs must exit
    nonzero (no silently-partial evaluation JSON), and the committed eval
    carries the do-nothing input baseline so 'restores' is measurable."""
    rng = np.random.default_rng(1)
    for kind in ("input", "gt"):
        d = tmp_path / "data" / "pairs" / "denoise" / "test" / kind
        d.mkdir(parents=True)
    pred = tmp_path / "preds" / "denoise"
    pred.mkdir(parents=True)
    for i in range(2):
        gt = (rng.random((32, 32, 3)) * 255).astype("uint8")
        noisy = np.clip(gt.astype(np.int16) + rng.integers(-40, 40, gt.shape),
                        0, 255).astype("uint8")
        Image.fromarray(gt).save(
            tmp_path / "data" / "pairs" / "denoise" / "test" / "gt" / f"i{i}.png")
        Image.fromarray(noisy).save(
            tmp_path / "data" / "pairs" / "denoise" / "test" / "input" / f"i{i}.png")
        # prediction = gt (perfect restore) so beats_input_baseline is True
        Image.fromarray(gt).save(pred / f"i{i}.png")

    out = _run([os.path.join(SCRIPTS, "evaluate_model.py"),
                "--pred_root", "preds", "--data_root", "data/pairs",
                "--tasks", "denoise", "--out_json", "results.json"],
               cwd=tmp_path)
    assert "do-nothing baseline" in out
    results = json.loads((tmp_path / "results.json").read_text())
    assert results["denoise"]["beats_input_baseline"] is True
    assert np.isfinite(results["denoise"]["input_baseline"]["psnr"]["mean"])
    # paired per-image treatment (VERDICT r4 #3): perfect restore vs noisy
    # input -> strictly positive delta, win-rate 1, CI above zero
    pd = results["denoise"]["paired_delta"]["psnr"]
    assert pd["n"] == 2
    assert pd["mean"] > 0 and pd["win_rate"] == 1.0
    assert pd["ci95"][0] <= pd["mean"] <= pd["ci95"][1]
    assert "per_image" not in results["denoise"]  # kept out of the JSON

    # missing task dirs -> nonzero exit (sr_x4 was requested but absent)
    env = dict(os.environ, IRET_PLATFORM="cpu")
    p = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, "evaluate_model.py"),
         "--pred_root", "preds", "--data_root", "data/pairs",
         "--tasks", "denoise", "sr_x4", "--out_json", "r2.json"],
        cwd=tmp_path, capture_output=True, text=True, timeout=600, env=env,
    )
    assert p.returncode != 0
    assert "MISSING" in p.stdout
    # --allow_missing restores the legacy skip behavior
    p = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, "evaluate_model.py"),
         "--pred_root", "preds", "--data_root", "data/pairs",
         "--tasks", "denoise", "sr_x4", "--allow_missing",
         "--out_json", "r3.json"],
        cwd=tmp_path, capture_output=True, text=True, timeout=600, env=env,
    )
    assert p.returncode == 0


def test_paired_delta_stats_unit():
    """paired_delta_stats matches by stem, drops unmatched, and computes
    mean/CI/win-rate on the per-image deltas."""
    from image_restoration_and_enhancement_tpu.metrics.evaluate import (
        paired_delta_stats,
    )

    out = {"a": 10.0, "b": 12.0, "c": 14.0, "only_out": 99.0}
    base = {"a": 9.0, "b": 13.0, "c": 10.0, "only_base": 0.0}
    d = paired_delta_stats(out, base)
    assert d["n"] == 3
    deltas = np.array([1.0, -1.0, 4.0])
    assert d["mean"] == pytest.approx(deltas.mean())
    assert d["win_rate"] == pytest.approx(2 / 3)
    sem = deltas.std(ddof=1) / np.sqrt(3)
    assert d["ci95"][0] == pytest.approx(deltas.mean() - 1.96 * sem)
    assert d["ci95"][1] == pytest.approx(deltas.mean() + 1.96 * sem)
    # <2 matched stems -> no CI defined
    assert paired_delta_stats({"a": 1.0}, {"a": 2.0}) is None
    assert paired_delta_stats({"a": 1.0}, {"b": 2.0}) is None


def test_fid_random_init_exercise(tmp_path, monkeypatch):
    """VERDICT r3 #7: the full FID path (InceptionV3 features + Frechet)
    must be exercisable without the air-gapped weights, clearly keyed as
    weights-pending so it can never read as a real FID."""
    from image_restoration_and_enhancement_tpu.metrics import perceptual
    from image_restoration_and_enhancement_tpu.metrics.evaluate import evaluate_task

    rng = np.random.default_rng(2)
    pred = tmp_path / "pred"
    gt = tmp_path / "gt"
    pred.mkdir(); gt.mkdir()
    for i in range(3):
        Image.fromarray((rng.random((32, 32, 3)) * 255).astype("uint8")).save(
            pred / f"i{i}.png")
        Image.fromarray((rng.random((32, 32, 3)) * 255).astype("uint8")).save(
            gt / f"i{i}.png")

    assert not perceptual.fid_available()  # air-gapped env precondition
    res = evaluate_task(str(pred), str(gt), use_fid=True)
    assert "fid" not in res and "fid_random_init_weights_pending" not in res

    monkeypatch.setenv("IRET_FID_RANDOM_INIT", "1")
    res = evaluate_task(str(pred), str(gt), use_fid=True)
    assert "fid" not in res  # never mistakable for a real FID
    assert np.isfinite(res["fid_random_init_weights_pending"])
