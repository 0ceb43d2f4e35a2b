"""On-device degradation synthesis: the synthetic-pair factory, TPU-native.

Re-implements the reference's host-side OpenCV degradation generators
(reference: scripts/make_synthetic_pairs.py:29-114) as pure jnp functions
driven by `jax.random` — vmappable, jittable, static-shaped — so pairs can be
synthesized on-the-fly on device during training instead of (only) being
pre-rendered to disk:

- Gaussian noise, sigma uniform in a range          (:29-35)
- JPEG compression artifacts                        (:38-43) — here a real
  8x8-block DCT quantization simulator, not a host JPEG round-trip
- Motion blur with random length/angle              (:46-64) — rasterized as
  a distance-to-segment kernel with static shape
- SR degradation: blur -> bicubic /scale            (:67-81)
- LAB-L grayscale                                   (:84-90)
- Free-form stroke masks, easy/hard mix             (:104-114, :186-190)

All images float in [0,1], HWC. Sigma-like parameters are expressed in
[0,255] units to mirror the reference CLI, and divided by 255 internally.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.image import gaussian_blur, resize, rgb_to_grayscale

# ---------------------------------------------------------------------------
# Noise
# ---------------------------------------------------------------------------


def gaussian_noise(
    key: jax.Array, img: jnp.ndarray, sigma_range: Tuple[float, float] = (5.0, 8.0)
) -> jnp.ndarray:
    """Additive Gaussian noise; sigma sampled uniformly (in 0-255 units)."""
    k_sigma, k_noise = jax.random.split(key)
    sigma = jax.random.uniform(
        k_sigma, (), minval=sigma_range[0] / 255.0, maxval=sigma_range[1] / 255.0
    )
    noise = jax.random.normal(k_noise, img.shape, dtype=jnp.float32) * sigma
    return jnp.clip(img.astype(jnp.float32) + noise, 0.0, 1.0)


# ---------------------------------------------------------------------------
# JPEG artifacts (8x8 DCT quantization)
# ---------------------------------------------------------------------------

# Standard Annex-K quantization tables.
_JPEG_LUMA_Q = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float32,
)
_JPEG_CHROMA_Q = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.float32,
)


def _dct8_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix."""
    n = 8
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m.astype(np.float32)


_DCT8 = _dct8_matrix()

# Full-range RGB<->YCbCr (JFIF).
_RGB2YCC = np.array(
    [
        [0.299, 0.587, 0.114],
        [-0.168736, -0.331264, 0.5],
        [0.5, -0.418688, -0.081312],
    ],
    dtype=np.float32,
)
_YCC2RGB = np.linalg.inv(_RGB2YCC).astype(np.float32)


def _quality_scale(quality: jnp.ndarray) -> jnp.ndarray:
    q = jnp.clip(quality.astype(jnp.float32), 1.0, 100.0)
    return jnp.where(q < 50.0, 5000.0 / q, 200.0 - 2.0 * q)


def _blockify(x: jnp.ndarray) -> jnp.ndarray:
    """(H, W, C) -> (H/8, W/8, C, 8, 8)."""
    h, w, c = x.shape
    x = x.reshape(h // 8, 8, w // 8, 8, c)
    return x.transpose(0, 2, 4, 1, 3)


def _unblockify(b: jnp.ndarray) -> jnp.ndarray:
    nh, nw, c, _, _ = b.shape
    return b.transpose(0, 3, 1, 4, 2).reshape(nh * 8, nw * 8, c)


def jpeg_artifacts(key: jax.Array, img: jnp.ndarray, quality_range=(30, 90)) -> jnp.ndarray:
    """Differentiable-ish JPEG artifact simulation via DCT quantization.

    Quality sampled uniformly as an integer in quality_range (inclusive),
    following the reference's cv2 JPEG round-trip semantics.
    """
    quality = jax.random.randint(key, (), quality_range[0], quality_range[1] + 1)
    return jpeg_quantize(img, quality)


def jpeg_quantize(img: jnp.ndarray, quality: jnp.ndarray) -> jnp.ndarray:
    h, w, _ = img.shape
    ph = (-h) % 8
    pw = (-w) % 8
    x = jnp.pad(img.astype(jnp.float32), ((0, ph), (0, pw), (0, 0)), mode="edge")

    ycc = x @ jnp.asarray(_RGB2YCC).T  # Y in [0,1], Cb/Cr centered at 0
    ycc = ycc * 255.0
    ycc = ycc.at[..., 0].add(-128.0)

    scale = _quality_scale(quality)
    qtab = jnp.stack([_JPEG_LUMA_Q, _JPEG_CHROMA_Q, _JPEG_CHROMA_Q])  # [3,8,8]
    qtab = jnp.clip(jnp.floor((qtab * scale + 50.0) / 100.0), 1.0, 255.0)

    blocks = _blockify(ycc)  # [nh, nw, 3, 8, 8]
    d = jnp.asarray(_DCT8)
    coefs = jnp.einsum("ij,abcjk,lk->abcil", d, blocks, d)
    coefs = jnp.round(coefs / qtab) * qtab
    rec = jnp.einsum("ji,abcjk,kl->abcil", d, coefs, d)

    rec = _unblockify(rec)
    rec = rec.at[..., 0].add(128.0)
    rgb = (rec / 255.0) @ jnp.asarray(_YCC2RGB).T
    return jnp.clip(rgb[:h, :w], 0.0, 1.0)


# ---------------------------------------------------------------------------
# Motion blur (static-shape kernel from traced length/angle)
# ---------------------------------------------------------------------------


def _line_kernel(length: jnp.ndarray, angle_rad: jnp.ndarray, max_size: int) -> jnp.ndarray:
    """Anti-aliased linear motion kernel of traced length inside a static
    max_size x max_size support (distance-to-segment rasterization)."""
    c = (max_size - 1) / 2.0
    ys = jax.lax.broadcasted_iota(jnp.float32, (max_size, max_size), 0) - c
    xs = jax.lax.broadcasted_iota(jnp.float32, (max_size, max_size), 1) - c
    dx = jnp.cos(angle_rad)
    dy = jnp.sin(angle_rad)
    half = (length - 1.0) / 2.0
    # Projection of each pixel onto the line direction, clamped to the segment.
    t = jnp.clip(xs * dx + ys * dy, -half, half)
    dist = jnp.sqrt((xs - t * dx) ** 2 + (ys - t * dy) ** 2)
    k = jnp.clip(1.0 - dist, 0.0, 1.0)  # ~1px soft line
    return k / jnp.maximum(jnp.sum(k), 1e-8)


def motion_blur_random(
    key: jax.Array,
    img: jnp.ndarray,
    kernel_size_range: Tuple[int, int] = (5, 15),
    angle_range: Tuple[float, float] = (0.0, 360.0),
) -> jnp.ndarray:
    k_size, k_angle = jax.random.split(key)
    max_size = kernel_size_range[1] | 1  # odd static support
    length = jax.random.uniform(
        k_size, (), minval=float(kernel_size_range[0]), maxval=float(kernel_size_range[1])
    )
    angle = jnp.deg2rad(
        jax.random.uniform(k_angle, (), minval=angle_range[0], maxval=angle_range[1])
    )
    kern = _line_kernel(length, angle, max_size)
    squeeze = img.ndim == 3
    x = img[None] if squeeze else img
    c = x.shape[-1]
    pad = max_size // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
    kern4 = jnp.broadcast_to(kern[:, :, None, None], (max_size, max_size, 1, c)).astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        xp, kern4, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    return out[0] if squeeze else out


# ---------------------------------------------------------------------------
# Task degradations
# ---------------------------------------------------------------------------


def degrade_denoise(
    key: jax.Array, img: jnp.ndarray, with_artifacts: bool = False
) -> jnp.ndarray:
    """Denoise-task input (reference: make_synthetic_pairs.py:163-172)."""
    if not with_artifacts:
        return gaussian_noise(key, img, (5.0, 8.0))
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    out = gaussian_noise(k1, img, (3.0, 15.0))
    out = jnp.where(
        jax.random.uniform(k2) < 0.3, jpeg_artifacts(k3, out, (40, 85)), out
    )
    out = jnp.where(
        jax.random.uniform(k4) < 0.2, motion_blur_random(k5, out, (3, 8)), out
    )
    return out


def degrade_sr(
    key: jax.Array, img: jnp.ndarray, scale: int = 4
) -> jnp.ndarray:
    """SR-task LR input: Gaussian blur (k in {3,5,7}, cv2 sigma-from-k) then
    bicubic /scale (reference: make_synthetic_pairs.py:67-81)."""
    k_blur, k_choice = jax.random.split(key)
    ksize = jax.random.choice(k_choice, jnp.asarray([3, 5, 7]))
    # cv2.GaussianBlur(sigmaX=0) derives sigma = 0.3*((k-1)*0.5 - 1) + 0.8.
    sigma = 0.3 * ((ksize.astype(jnp.float32) - 1.0) * 0.5 - 1.0) + 0.8
    # Static radius 3 covers k<=7.
    blurred = _gaussian_blur_traced_sigma(img, sigma, radius=3)
    h, w = img.shape[-3], img.shape[-2]
    return resize(blurred, (h // scale, w // scale), method="bicubic", antialias=True)


def _gaussian_blur_traced_sigma(img: jnp.ndarray, sigma: jnp.ndarray, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k1 = jnp.exp(-0.5 * (x / jnp.maximum(sigma, 1e-6)) ** 2)
    k1 = k1 / jnp.sum(k1)
    squeeze = img.ndim == 3
    xin = img[None] if squeeze else img
    c = xin.shape[-1]
    for kern in (k1[:, None], k1[None, :]):
        kh, kw = kern.shape
        xp = jnp.pad(xin, ((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)), mode="edge")
        k4 = jnp.broadcast_to(kern[:, :, None, None], (kh, kw, 1, c)).astype(xin.dtype)
        xin = jax.lax.conv_general_dilated(
            xp, k4, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        )
    return xin[0] if squeeze else xin


def degrade_colorize(img: jnp.ndarray) -> jnp.ndarray:
    """Colorize-task input: LAB L channel replicated to 3 channels."""
    g = rgb_to_grayscale(img, mode="lab_l")
    return jnp.repeat(g, 3, axis=-1)


# ---------------------------------------------------------------------------
# Free-form masks
# ---------------------------------------------------------------------------


def free_form_mask(
    key: jax.Array,
    hw: Tuple[int, int],
    num_strokes: Tuple[int, int] = (5, 15),
    thickness_range: Tuple[int, int] = (10, 40),
    max_points: int = 8,
) -> jnp.ndarray:
    """Random stroke mask in {0,1}, shape (H, W, 1).

    Each stroke is a polyline of 4..max_points vertices rasterized by
    distance-to-segment <= thickness/2 (the reference draws cv2 lines;
    this is the static-shape equivalent). num_strokes[1] is the static
    upper bound; the sampled count disables surplus strokes.
    """
    h, w = hw
    max_strokes = num_strokes[1]
    keys = jax.random.split(key, 3)
    n_strokes = jax.random.randint(keys[0], (), num_strokes[0], num_strokes[1] + 1)

    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)

    def one_stroke(carry, inp):
        mask = carry
        k, active = inp
        kp, kn, kt = jax.random.split(k, 3)
        pts_x = jax.random.uniform(kp, (max_points,), minval=0.0, maxval=w - 1.0)
        pts_y = jax.random.uniform(jax.random.fold_in(kp, 1), (max_points,), minval=0.0, maxval=h - 1.0)
        n_pts = jax.random.randint(kn, (), 4, max_points + 1)
        thick = jax.random.randint(kt, (), thickness_range[0], thickness_range[1] + 1)
        half = thick.astype(jnp.float32) / 2.0

        def seg_dist(i, m):
            x0, y0 = pts_x[i], pts_y[i]
            x1, y1 = pts_x[i + 1], pts_y[i + 1]
            vx, vy = x1 - x0, y1 - y0
            denom = jnp.maximum(vx * vx + vy * vy, 1e-8)
            t = jnp.clip(((xs - x0) * vx + (ys - y0) * vy) / denom, 0.0, 1.0)
            d2 = (xs - (x0 + t * vx)) ** 2 + (ys - (y0 + t * vy)) ** 2
            seg_on = (i + 1 < n_pts).astype(jnp.float32)
            return jnp.maximum(m, seg_on * (d2 <= half * half).astype(jnp.float32))

        stroke_mask = jax.lax.fori_loop(0, max_points - 1, seg_dist, jnp.zeros((h, w), jnp.float32))
        mask = jnp.maximum(mask, active.astype(jnp.float32) * stroke_mask)
        return mask, None

    stroke_keys = jax.random.split(keys[1], max_strokes)
    active = jnp.arange(max_strokes) < n_strokes
    mask, _ = jax.lax.scan(one_stroke, jnp.zeros((h, w), jnp.float32), (stroke_keys, active))
    return mask[..., None]


def inpaint_mask(key: jax.Array, hw: Tuple[int, int], easy_ratio: float = 0.7) -> jnp.ndarray:
    """Easy/hard mask mix (reference: make_synthetic_pairs.py:186-190)."""
    k_mix, k_easy, k_hard = jax.random.split(key, 3)
    easy = free_form_mask(k_easy, hw, num_strokes=(3, 7), thickness_range=(5, 20))
    hard = free_form_mask(k_hard, hw, num_strokes=(8, 15), thickness_range=(20, 40))
    return jnp.where(jax.random.uniform(k_mix) < easy_ratio, easy, hard)


def degrade_inpaint(
    key: jax.Array, img: jnp.ndarray, easy_ratio: float = 0.7
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (masked_input, mask). Masked pixels are zeroed, as in the
    reference (make_synthetic_pairs.py:191-192)."""
    mask = inpaint_mask(key, img.shape[-3:-1], easy_ratio)
    return img * (1.0 - mask), mask
