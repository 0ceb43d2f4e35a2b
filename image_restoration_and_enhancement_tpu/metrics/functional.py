"""Image-quality metrics as pure jnp functions (vmappable, jit-friendly).

Numerically matches the reference's metric stack (src/metrics.py:82-148):
- PSNR: skimage.metrics.peak_signal_noise_ratio with data_range.
- SSIM: skimage.metrics.structural_similarity defaults (win_size 7, uniform
  window, K1=0.01, K2=0.03, sample-covariance correction, edge crop,
  channel mean).
- Delta-E 76: Euclidean distance in CIE LAB.
- Y/L-channel variants used by the SR and colorization trainers
  (train_super_resolution.py:351-366, train_colorization.py:285-310).

All functions take float images in [0, 1] (HWC or NHWC) and treat the final
axis as channels. Where the reference computes on uint8 [0,255] with
data_range=255, results are identical to computing on [0,1] with
data_range=1 (both PSNR and SSIM are scale-invariant given a matching
data_range).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.image import rgb_to_lab, uniform_filter, y_channel


def psnr(pred: jnp.ndarray, gt: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio in dB. Works on any matching shapes."""
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    mse = jnp.mean((pred - gt) ** 2)
    return 10.0 * jnp.log10((data_range**2) / jnp.maximum(mse, 1e-12))


def ssim(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    data_range: float = 1.0,
    win_size: int = 7,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Structural similarity, skimage-default semantics (uniform 7x7 window).

    Accepts HWC (channel mean, like channel_axis=2) or HW1/HW2D inputs.
    """
    if pred.ndim == 2:
        pred = pred[..., None]
        gt = gt[..., None]
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)

    np_ = win_size * win_size
    cov_norm = np_ / (np_ - 1.0)  # skimage sample-covariance correction
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    ux = uniform_filter(pred, win_size)
    uy = uniform_filter(gt, win_size)
    uxx = uniform_filter(pred * pred, win_size)
    uyy = uniform_filter(gt * gt, win_size)
    uxy = uniform_filter(pred * gt, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    a1 = 2.0 * ux * uy + c1
    a2 = 2.0 * vxy + c2
    b1 = ux * ux + uy * uy + c1
    b2 = vx + vy + c2
    s = (a1 * a2) / (b1 * b2)
    # Valid-region filtering already excludes the pad skimage crops.
    return jnp.mean(s)


def delta_e76(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Mean CIE76 color difference. Inputs sRGB [0,1] (..., 3)."""
    lab_p = rgb_to_lab(pred)
    lab_g = rgb_to_lab(gt)
    return jnp.mean(jnp.sqrt(jnp.sum((lab_p - lab_g) ** 2, axis=-1)))


def psnr_y(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """PSNR on the BT.601 luma channel."""
    return psnr(y_channel(pred), y_channel(gt))


def ssim_y(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return ssim(y_channel(pred), y_channel(gt))


def psnr_l(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """PSNR on the LAB L channel scaled to [0,1] (colorization metric)."""
    return psnr(rgb_to_lab(pred)[..., 0] / 100.0, rgb_to_lab(gt)[..., 0] / 100.0)


def ssim_l(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return ssim(rgb_to_lab(pred)[..., 0] / 100.0, rgb_to_lab(gt)[..., 0] / 100.0)


def calculate_all(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    with_color: bool = False,
    with_y: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Core metric bundle (LPIPS/FID are model-based; see metrics.perceptual)."""
    out = {"psnr": psnr(pred, gt), "ssim": ssim(pred, gt)}
    if with_y:
        out["psnr_y"] = psnr_y(pred, gt)
        out["ssim_y"] = ssim_y(pred, gt)
    if with_color:
        out["psnr_l"] = psnr_l(pred, gt)
        out["ssim_l"] = ssim_l(pred, gt)
        out["delta_e"] = delta_e76(pred, gt)
    return out


# Batched variants: vmap over the leading axis, then mean.
psnr_batch = jax.vmap(psnr)
ssim_batch = jax.vmap(ssim)
delta_e76_batch = jax.vmap(delta_e76)
