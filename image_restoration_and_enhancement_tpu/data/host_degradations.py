"""Host-side degradation synthesis for offline pair generation.

The on-device jnp degradations (data/degradations.py) are ideal inside the
training loop where shapes are fixed; the offline pair generator
(scripts/make_synthetic_pairs.py equivalent) processes images at their
native sizes, where per-shape XLA recompiles would dominate. This module
provides the same degradation semantics on the host: numpy + the native C++
preprocessing library (noise, LAB-L) + cv2 only for true JPEG encode/decode.

Parameter ranges mirror the reference generator
(scripts/make_synthetic_pairs.py:29-114): noise sigma 5-8 (3-15 with
artifacts), JPEG quality 30-90, motion-blur kernels 5-15 px, SR blur
k in {3,5,7}, stroke masks easy (3-7 strokes, 5-20 px) / hard (8-15,
20-40) mixed 70/30.
"""
from __future__ import annotations

from typing import Optional, Tuple

import cv2
import numpy as np

from .. import native
from ..ops.image import motion_blur_kernel


def add_gaussian_noise(
    rng: np.random.Generator, img_u8: np.ndarray, sigma_range=(5.0, 8.0)
) -> np.ndarray:
    sigma = rng.uniform(*sigma_range)
    return native.add_gaussian_noise_u8(img_u8, sigma, int(rng.integers(1, 2**62)))


def add_jpeg_compression(
    rng: np.random.Generator, img_u8: np.ndarray, quality_range=(30, 90)
) -> np.ndarray:
    quality = int(rng.integers(quality_range[0], quality_range[1] + 1))
    ok, enc = cv2.imencode(".jpg", cv2.cvtColor(img_u8, cv2.COLOR_RGB2BGR),
                           [int(cv2.IMWRITE_JPEG_QUALITY), quality])
    if not ok:
        return img_u8
    return cv2.cvtColor(cv2.imdecode(enc, cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB)


def add_motion_blur(
    rng: np.random.Generator, img_u8: np.ndarray, kernel_size_range=(5, 15)
) -> np.ndarray:
    size = int(rng.integers(kernel_size_range[0], kernel_size_range[1] + 1))
    angle = rng.uniform(0.0, 360.0)
    kern = motion_blur_kernel(size, angle)
    return cv2.filter2D(img_u8, -1, kern)


def degrade_denoise(
    rng: np.random.Generator, img_u8: np.ndarray, with_artifacts: bool = False,
    sigma_range=(5.0, 8.0),
) -> np.ndarray:
    """Reference default sigma in [5, 8] (make_synthetic_pairs.py:29-35).
    sigma_range parameterizes the hard-degradation family (sigma>=40) used
    by the measured-restoration runs: at sigma in [5,8] the do-nothing input
    baseline is ~36 dB — unbeatable from random init — while sigma>=40 puts
    it at ~12-14 dB, leaving measurable restoration headroom."""
    if not with_artifacts:
        return add_gaussian_noise(rng, img_u8, sigma_range)
    out = add_gaussian_noise(rng, img_u8, (3.0, 15.0))
    if rng.random() < 0.3:
        out = add_jpeg_compression(rng, out, (40, 85))
    if rng.random() < 0.2:
        out = add_motion_blur(rng, out, (3, 8))
    return out


def degrade_sr(
    rng: np.random.Generator,
    img_u8: np.ndarray,
    scale: int = 4,
    use_jpeg: bool = False,
    use_motion_blur: bool = False,
) -> np.ndarray:
    if use_motion_blur and rng.random() < 0.3:
        blur = add_motion_blur(rng, img_u8, (5, 12))
    else:
        k = int(rng.choice([3, 5, 7]))
        blur = cv2.GaussianBlur(img_u8, (k, k), sigmaX=0)
    h, w = blur.shape[:2]
    lr = cv2.resize(blur, (w // scale, h // scale), interpolation=cv2.INTER_CUBIC)
    if use_jpeg:
        lr = add_jpeg_compression(rng, lr, (40, 85))
    return lr


def to_grayscale(img_u8: np.ndarray) -> np.ndarray:
    """LAB L channel (the reference's colorization input)."""
    return native.rgb_to_lab_l(img_u8)


def resize_to_max_size(img_u8: np.ndarray, max_size: int = 1024) -> np.ndarray:
    h, w = img_u8.shape[:2]
    scale = max_size / max(h, w)
    if scale < 1.0:
        return cv2.resize(img_u8, (int(w * scale), int(h * scale)),
                          interpolation=cv2.INTER_AREA)
    return img_u8


def free_form_mask(
    rng: np.random.Generator,
    hw: Tuple[int, int],
    num_strokes=(5, 15),
    thickness_range=(10, 40),
) -> np.ndarray:
    """Stroke mask in {0,255} uint8 via distance-to-segment rasterization
    (same geometry as the device version, numpy-vectorized per stroke)."""
    h, w = hw
    mask = np.zeros((h, w), dtype=bool)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    for _ in range(int(rng.integers(num_strokes[0], num_strokes[1] + 1))):
        n_pts = int(rng.integers(4, 9))
        px = rng.uniform(0, w - 1, n_pts).astype(np.float32)
        py = rng.uniform(0, h - 1, n_pts).astype(np.float32)
        half = rng.integers(thickness_range[0], thickness_range[1] + 1) / 2.0
        for i in range(n_pts - 1):
            vx, vy = px[i + 1] - px[i], py[i + 1] - py[i]
            denom = max(vx * vx + vy * vy, 1e-8)
            t = np.clip(((xs - px[i]) * vx + (ys - py[i]) * vy) / denom, 0.0, 1.0)
            d2 = (xs - (px[i] + t * vx)) ** 2 + (ys - (py[i] + t * vy)) ** 2
            mask |= d2 <= half * half
    return mask.astype(np.uint8) * 255


def inpaint_pair(
    rng: np.random.Generator, img_u8: np.ndarray, easy_ratio: float = 0.7
) -> Tuple[np.ndarray, np.ndarray]:
    h, w = img_u8.shape[:2]
    if rng.random() < easy_ratio:
        mask = free_form_mask(rng, (h, w), (3, 7), (5, 20))
    else:
        mask = free_form_mask(rng, (h, w), (8, 15), (20, 40))
    masked = img_u8.copy()
    masked[mask == 255] = 0
    return masked, mask
