"""MetricsCalculator — object API parity with the reference (src/metrics.py:58-235).

A thin stateful wrapper over the functional jnp metrics (metrics/functional.py)
and the perceptual model ports (metrics/perceptual.py), keeping the
reference's call surface: construct once with use_lpips/use_fid toggles, then
`calculate_psnr/ssim/lpips/delta_e(pred, gt)` on uint8 RGB numpy arrays and
`calculate_all(pred, gt) -> dict`. Mismatched shapes resize pred to gt, as
the reference does (:85-86).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np
from PIL import Image

from . import functional as F
from . import perceptual


def _to01(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.dtype == np.uint8:
        return img.astype(np.float32) / 255.0
    return np.clip(img.astype(np.float32), 0.0, 1.0)


def _match(pred: np.ndarray, gt: np.ndarray) -> np.ndarray:
    if pred.shape != gt.shape:
        pred_img = Image.fromarray(
            (np.clip(pred, 0, 1) * 255).astype(np.uint8)
            if pred.dtype != np.uint8 else pred
        )
        pred_img = pred_img.resize((gt.shape[1], gt.shape[0]), Image.LANCZOS)
        pred = np.asarray(pred_img)
    return pred


class MetricsCalculator:
    """Per-image metric bundle. LPIPS/FID require imported weights and are
    silently disabled otherwise (reference gates on package availability,
    src/metrics.py:11-37)."""

    def __init__(self, use_lpips: bool = True, use_fid: bool = True):
        self.use_lpips = use_lpips and perceptual.lpips_available()
        self.use_fid = use_fid and perceptual.fid_available()

    def calculate_psnr(self, pred, gt) -> float:
        pred = _match(pred, gt)
        return float(F.psnr(jnp.asarray(_to01(pred)), jnp.asarray(_to01(gt))))

    def calculate_ssim(self, pred, gt) -> float:
        pred = _match(pred, gt)
        return float(F.ssim(jnp.asarray(_to01(pred)), jnp.asarray(_to01(gt))))

    def calculate_delta_e(self, pred, gt, use_delta_e2000: bool = False) -> float:
        """ΔE in LAB. The reference's use_delta_e2000 branch computes the
        same ΔE76 Euclidean distance (src/metrics.py:134-148 — its ΔE2000 is
        unimplemented by its own admission); the kwarg is kept for call-site
        parity."""
        pred = _match(pred, gt)
        return float(F.delta_e76(jnp.asarray(_to01(pred)), jnp.asarray(_to01(gt))))

    def calculate_lpips(self, pred, gt) -> Optional[float]:
        if not self.use_lpips:
            return None
        pred = _match(pred, gt)
        return perceptual.lpips_pairs([_to01(pred)], [_to01(gt)])[0]

    def calculate_fid(self, preds, gts) -> Optional[float]:
        """Dataset-level FID over sequences of images."""
        if not self.use_fid:
            return None
        return perceptual.fid([_to01(p) for p in preds], [_to01(g) for g in gts])

    def calculate_all(self, pred, gt) -> Dict[str, Optional[float]]:
        out = {
            "psnr": self.calculate_psnr(pred, gt),
            "ssim": self.calculate_ssim(pred, gt),
        }
        if self.use_lpips:
            out["lpips"] = self.calculate_lpips(pred, gt)
        return out
