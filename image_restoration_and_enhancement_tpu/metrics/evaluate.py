"""Directory-level evaluation — the `evaluate_task` equivalent, batched on TPU.

Reference semantics (src/metrics.py:238-348): match prediction and ground-
truth files by filename stem across extensions (:269-282), accumulate
per-image PSNR/SSIM (+LPIPS when available), compute dataset-level FID
optionally, and report mean/std/min/max/median statistics (:332-346).

TPU-native: images are loaded on host, stacked into fixed-size batches and
evaluated with one jitted vmapped metric kernel per resolution bucket
(the reference loops per image through skimage on CPU).
"""
from __future__ import annotations

import functools
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..data.datasets import IMG_EXTS, _list_stems
from . import functional as F


@functools.lru_cache(maxsize=16)
def _metric_fn(with_color: bool, with_y: bool):
    def one(pred, gt):
        return F.calculate_all(pred, gt, with_color=with_color, with_y=with_y)

    return jax.jit(jax.vmap(one))


def _stats(values: List[float]) -> Dict[str, float]:
    arr = np.asarray(values, dtype=np.float64)
    return {
        "mean": float(arr.mean()),
        "std": float(arr.std()),
        "min": float(arr.min()),
        "max": float(arr.max()),
        "median": float(np.median(arr)),
    }


def paired_delta_stats(
    out_per_image: Dict[str, float], base_per_image: Dict[str, float]
) -> Optional[Dict[str, float]]:
    """Paired per-image statistics of output-vs-baseline metric deltas.

    Extends the reference's dataset-level stats block (src/metrics.py:332-346)
    with the paired treatment a "beats the do-nothing baseline" claim needs:
    mean delta, normal-approximation 95% CI of the mean, and win-rate (the
    fraction of images where the output strictly beats the baseline). Images
    are matched by filename stem; unmatched stems are dropped. Returns None
    when fewer than 2 stems match (no CI is defined there).
    """
    stems = sorted(set(out_per_image) & set(base_per_image))
    if len(stems) < 2:
        return None
    d = np.asarray(
        [out_per_image[s] - base_per_image[s] for s in stems], dtype=np.float64
    )
    n = len(d)
    sem = float(d.std(ddof=1)) / np.sqrt(n)
    mean = float(d.mean())
    return {
        "n": n,
        "mean": mean,
        "ci95": [mean - 1.96 * sem, mean + 1.96 * sem],
        "win_rate": float((d > 0).mean()),
    }


def evaluate_task(
    pred_dir: str,
    gt_dir: str,
    with_color: bool = False,
    with_y: bool = False,
    use_lpips: bool = False,
    use_fid: bool = False,
    batch_size: int = 16,
    resize_to_gt: bool = True,
    return_per_image: bool = False,
) -> Dict:
    """Evaluate all matched pred/gt pairs; returns {metrics: {name: stats},
    num_images, (lpips/fid when enabled and weights are available)}.

    With return_per_image=True the result also carries
    ``per_image: {metric: {stem: value}}`` so callers can run paired
    statistics between two evaluations of the same split (evaluate_model.py's
    output-vs-input paired deltas)."""
    preds = _list_stems(pred_dir)
    gts = _list_stems(gt_dir)
    stems = sorted(set(preds) & set(gts))
    if not stems:
        raise FileNotFoundError(f"No matched pairs between {pred_dir} and {gt_dir}")

    # bucket by gt resolution so each bucket evaluates as one jitted batch
    buckets: Dict[Tuple[int, int], List[Tuple[str, np.ndarray, np.ndarray]]] = {}
    for s in stems:
        gt = np.array(Image.open(gts[s]).convert("RGB"), dtype=np.float32) / 255.0
        pr_img = Image.open(preds[s]).convert("RGB")
        if resize_to_gt and pr_img.size != (gt.shape[1], gt.shape[0]):
            pr_img = pr_img.resize((gt.shape[1], gt.shape[0]), Image.LANCZOS)
        pr = np.array(pr_img, dtype=np.float32) / 255.0
        buckets.setdefault(gt.shape[:2], []).append((s, pr, gt))

    acc: Dict[str, List[float]] = {}
    per_image: Dict[str, Dict[str, float]] = {}
    fn = _metric_fn(with_color, with_y)
    for pairs in buckets.values():
        for i in range(0, len(pairs), batch_size):
            chunk = pairs[i : i + batch_size]
            pb = jnp.asarray(np.stack([p for _, p, _ in chunk]))
            gb = jnp.asarray(np.stack([g for _, _, g in chunk]))
            out = jax.device_get(fn(pb, gb))
            for name, vals in out.items():
                vals = np.asarray(vals).tolist()
                acc.setdefault(name, []).extend(vals)
                dst = per_image.setdefault(name, {})
                for (stem, _, _), v in zip(chunk, vals):
                    dst[stem] = float(v)

    result = {
        "num_images": len(stems),
        "metrics": {name: _stats(vals) for name, vals in acc.items()},
    }
    if return_per_image:
        result["per_image"] = per_image

    if use_lpips or use_fid:
        from . import perceptual

        flat = [(p, g) for pairs in buckets.values() for _, p, g in pairs]
        if use_lpips and perceptual.lpips_available():
            lp = perceptual.lpips_pairs([p for p, _ in flat], [g for _, g in flat])
            result["metrics"]["lpips"] = _stats(lp)
        if use_fid and (perceptual.fid_available() or perceptual.fid_random_init_ok()):
            # with imported weights this is a real FID; in the explicit
            # IRET_FID_RANDOM_INIT=1 exercise mode the number is keyed so it
            # can never be mistaken for one (weights are air-gapped here)
            key = "fid" if perceptual.fid_available() else "fid_random_init_weights_pending"
            result[key] = perceptual.fid(
                [p for p, _ in flat], [g for _, g in flat]
            )
    return result


def print_results(task: str, result: Dict) -> None:
    print(f"\n=== {task} ({result['num_images']} images) ===")
    for name, stats in sorted(result["metrics"].items()):
        print(
            f"  {name:8s} mean {stats['mean']:.4f}  std {stats['std']:.4f}  "
            f"min {stats['min']:.4f}  max {stats['max']:.4f}  median {stats['median']:.4f}"
        )
    if "fid" in result:
        print(f"  fid      {result['fid']:.4f}")
    if "fid_random_init_weights_pending" in result:
        print(f"  fid (RANDOM-INIT trunk, weights pending — pipeline "
              f"exercise only) {result['fid_random_init_weights_pending']:.4f}")
    if "input_baseline" in result:
        ib = result["input_baseline"]
        print(f"  input-vs-gt do-nothing baseline: psnr "
              f"{ib['psnr']['mean']:.4f}  ssim {ib['ssim']['mean']:.4f}")
    for name, d in sorted(result.get("paired_delta", {}).items()):
        print(
            f"  paired Δ{name} (output−input, n={d['n']}): "
            f"mean {d['mean']:+.4f}  95% CI [{d['ci95'][0]:+.4f}, "
            f"{d['ci95'][1]:+.4f}]  win-rate {d['win_rate']:.2f}"
        )
