"""Pure-jnp image operations: color spaces, resizing, blurs.

These replace the reference's host-side cv2/PIL/skimage calls
(reference: src/metrics.py:113-148 LAB conversion, scripts/
make_synthetic_pairs.py:29-101 degradation primitives, src/inference.py:596
LANCZOS resize) with vmappable, jit-friendly TPU ops.

Convention: images are float32 NHWC or HWC in [0, 1] unless stated otherwise.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Color spaces
# ---------------------------------------------------------------------------

# sRGB -> XYZ (D65), rows = X,Y,Z.
_RGB2XYZ = np.array(
    [
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ],
    dtype=np.float32,
)
_XYZ2RGB = np.linalg.inv(_RGB2XYZ).astype(np.float32)
_D65_WHITE = np.array([0.95047, 1.0, 1.08883], dtype=np.float32)


def _srgb_to_linear(c: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def _linear_to_srgb(c: jnp.ndarray) -> jnp.ndarray:
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(c <= 0.0031308, c * 12.92, 1.055 * c ** (1.0 / 2.4) - 0.055)


def rgb_to_lab(rgb: jnp.ndarray) -> jnp.ndarray:
    """sRGB [0,1] (..., 3) -> CIE LAB (L in [0,100]). Matches skimage.color.rgb2lab."""
    lin = _srgb_to_linear(rgb.astype(jnp.float32))
    xyz = lin @ jnp.asarray(_RGB2XYZ).T
    xyz = xyz / jnp.asarray(_D65_WHITE)
    eps = (6.0 / 29.0) ** 3
    kappa = 1.0 / (3.0 * (6.0 / 29.0) ** 2)
    f = jnp.where(xyz > eps, jnp.cbrt(xyz), kappa * xyz + 4.0 / 29.0)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    L = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    return jnp.stack([L, a, b], axis=-1)


def lab_to_rgb(lab: jnp.ndarray) -> jnp.ndarray:
    """CIE LAB -> sRGB [0,1]."""
    L, a, b = lab[..., 0], lab[..., 1], lab[..., 2]
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0
    f = jnp.stack([fx, fy, fz], axis=-1)
    delta = 6.0 / 29.0
    xyz = jnp.where(f > delta, f**3, 3.0 * delta**2 * (f - 4.0 / 29.0))
    xyz = xyz * jnp.asarray(_D65_WHITE)
    lin = xyz @ jnp.asarray(_XYZ2RGB).T
    return jnp.clip(_linear_to_srgb(lin), 0.0, 1.0)


def rgb_to_ycbcr(rgb: jnp.ndarray) -> jnp.ndarray:
    """ITU-R BT.601 full-range YCbCr (the PIL 'YCbCr' convention), in [0,1]."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 0.5
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 0.5
    return jnp.stack([y, cb, cr], axis=-1)


def y_channel(rgb: jnp.ndarray) -> jnp.ndarray:
    """Luma channel used by the reference's Y-channel PSNR/SSIM
    (reference: scripts/train_denoising.py:368-383)."""
    return rgb_to_ycbcr(rgb)[..., 0]


def rgb_to_grayscale(rgb: jnp.ndarray, mode: str = "lab_l") -> jnp.ndarray:
    """Grayscale (..., 1). mode="lab_l" matches the reference's colorization
    input (LAB L channel, scripts/make_synthetic_pairs.py:84-90);
    mode="luma" is plain BT.601."""
    if mode == "lab_l":
        g = rgb_to_lab(rgb)[..., 0] / 100.0
    elif mode == "luma":
        g = y_channel(rgb)
    else:
        raise ValueError(mode)
    return jnp.clip(g, 0.0, 1.0)[..., None]


# ---------------------------------------------------------------------------
# Resizing
# ---------------------------------------------------------------------------


def resize(
    img: jnp.ndarray,
    out_hw: Tuple[int, int],
    method: str = "bicubic",
    antialias: bool = True,
) -> jnp.ndarray:
    """Resize (..., H, W, C) spatially. Methods: nearest|bilinear|bicubic|lanczos3."""
    shape = img.shape[:-3] + (out_hw[0], out_hw[1], img.shape[-1])
    return jax.image.resize(img, shape, method=method, antialias=antialias)


def upscale_bicubic(img: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Bicubic upscale by an integer factor (the SR conditioning transform,
    reference: scripts/train_super_resolution.py:514-519)."""
    h, w = img.shape[-3], img.shape[-2]
    return resize(img, (h * factor, w * factor), method="bicubic", antialias=False)


# ---------------------------------------------------------------------------
# Blurs (separable depthwise convs)
# ---------------------------------------------------------------------------


def gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / max(sigma, 1e-6)) ** 2)
    return (k / k.sum()).astype(np.float32)


def _depthwise_conv(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 2-D conv, NHWC, SAME padding via edge-replicate."""
    squeeze = img.ndim == 3
    if squeeze:
        img = img[None]
    n, h, w, c = img.shape
    kh, kw = kernel.shape
    pad_h, pad_w = kh // 2, kw // 2
    x = jnp.pad(img, ((0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0)), mode="edge")
    kern = jnp.broadcast_to(kernel[:, :, None, None], (kh, kw, 1, c))
    out = jax.lax.conv_general_dilated(
        x,
        kern.astype(img.dtype),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return out[0] if squeeze else out


def gaussian_blur(img: jnp.ndarray, sigma: float, radius: int | None = None) -> jnp.ndarray:
    """Separable Gaussian blur; img (..., H, W, C) in any float dtype."""
    if radius is None:
        radius = max(1, int(round(3.0 * sigma)))
    k1 = jnp.asarray(gaussian_kernel1d(sigma, radius))
    img = _depthwise_conv(img, k1[:, None])
    return _depthwise_conv(img, k1[None, :])


def box_blur(img: jnp.ndarray, size: int) -> jnp.ndarray:
    k1 = jnp.full((size,), 1.0 / size, dtype=jnp.float32)
    img = _depthwise_conv(img, k1[:, None])
    return _depthwise_conv(img, k1[None, :])


def motion_blur_kernel(size: int, angle_deg: float) -> np.ndarray:
    """Linear motion-blur kernel (reference: make_synthetic_pairs.py:46-64)."""
    k = np.zeros((size, size), dtype=np.float32)
    c = (size - 1) / 2.0
    theta = np.deg2rad(angle_deg)
    dx, dy = np.cos(theta), np.sin(theta)
    for i in range(size):
        t = i - c
        x = int(round(c + t * dx))
        y = int(round(c + t * dy))
        if 0 <= x < size and 0 <= y < size:
            k[y, x] = 1.0
    s = k.sum()
    return k / s if s > 0 else k


def motion_blur(img: jnp.ndarray, size: int, angle_deg: float) -> jnp.ndarray:
    return _depthwise_conv(img, jnp.asarray(motion_blur_kernel(size, angle_deg)))


def uniform_filter(img: jnp.ndarray, size: int) -> jnp.ndarray:
    """Valid-region uniform filter: (..., H, W, C) -> (..., H-s+1, W-s+1, C).

    Runs at HIGHEST precision: SSIM computes variances as E[x^2] - E[x]^2,
    where TPU-default bf16 convolution error dominates the tiny variance of
    smooth images (observed SSIM > 1 without this)."""
    squeeze = img.ndim == 3
    if squeeze:
        img = img[None]
    c = img.shape[-1]
    kern = jnp.full((size, size, 1, c), 1.0 / (size * size), dtype=jnp.float32)
    out = jax.lax.conv_general_dilated(
        img.astype(jnp.float32),
        kern,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out[0] if squeeze else out
