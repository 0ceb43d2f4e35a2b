"""Image ops + metrics: cross-checked against cv2 (an independent
implementation) and analytic identities."""
import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_restoration_and_enhancement_tpu.metrics import functional as F
from image_restoration_and_enhancement_tpu.ops import image as ops


@pytest.fixture
def img_pair(rng):
    a = rng.random((32, 48, 3), dtype=np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape).astype(np.float32), 0, 1)
    return a, b


def test_psnr_matches_cv2(img_pair):
    a, b = img_pair
    ours = float(F.psnr(jnp.asarray(b), jnp.asarray(a)))
    ref = cv2.PSNR((a * 255).astype(np.uint8), (b * 255).astype(np.uint8), 255.0)
    a8 = (a * 255).astype(np.uint8).astype(np.float32) / 255.0
    b8 = (b * 255).astype(np.uint8).astype(np.float32) / 255.0
    ours_q = float(F.psnr(jnp.asarray(b8), jnp.asarray(a8)))
    assert abs(ours_q - ref) < 0.01
    assert abs(ours - ref) < 0.5  # quantization gap only


def test_psnr_identical_is_large():
    x = jnp.ones((8, 8, 3)) * 0.5
    assert float(F.psnr(x, x)) > 100


def test_ssim_identity_and_ordering(img_pair):
    a, b = img_pair
    s_same = float(F.ssim(jnp.asarray(a), jnp.asarray(a)))
    s_noisy = float(F.ssim(jnp.asarray(b), jnp.asarray(a)))
    assert s_same > 0.9999
    assert 0 < s_noisy < s_same


def test_ssim_against_direct_numpy(img_pair):
    """Direct sliding-window numpy SSIM (skimage formula, independent impl)."""
    a, b = img_pair
    a1, b1 = a[..., 0], b[..., 0]
    win, k1, k2, dr = 7, 0.01, 0.03, 1.0
    c1, c2 = (k1 * dr) ** 2, (k2 * dr) ** 2
    covn = win * win / (win * win - 1.0)
    H, W = a1.shape
    vals = []
    for i in range(H - win + 1):
        for j in range(W - win + 1):
            pa = a1[i : i + win, j : j + win]
            pb = b1[i : i + win, j : j + win]
            ux, uy = pa.mean(), pb.mean()
            vx = covn * (np.mean(pa * pa) - ux * ux)
            vy = covn * (np.mean(pb * pb) - uy * uy)
            vxy = covn * (np.mean(pa * pb) - ux * uy)
            vals.append(
                ((2 * ux * uy + c1) * (2 * vxy + c2))
                / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
            )
    expect = float(np.mean(vals))
    ours = float(F.ssim(jnp.asarray(b1), jnp.asarray(a1)))
    assert abs(ours - expect) < 1e-3  # float32 conv vs float64 sliding window


def test_rgb_lab_roundtrip_and_cv2_parity(rng):
    rgb = rng.random((16, 16, 3), dtype=np.float32)
    lab = np.asarray(ops.rgb_to_lab(jnp.asarray(rgb)))
    # cv2 float RGB->LAB yields true L in [0,100], a/b signed
    lab_cv = cv2.cvtColor(rgb, cv2.COLOR_RGB2Lab)
    np.testing.assert_allclose(lab, lab_cv, atol=0.5)  # fp32; L scale 0..100
    back = np.asarray(ops.lab_to_rgb(jnp.asarray(lab)))
    np.testing.assert_allclose(back, rgb, atol=0.05)


def test_delta_e_zero_for_identical(rng):
    x = jnp.asarray(rng.random((8, 8, 3), dtype=np.float32))
    assert float(F.delta_e76(x, x)) < 1e-4


def test_y_channel_range(rng):
    x = jnp.asarray(rng.random((8, 8, 3), dtype=np.float32))
    y = np.asarray(ops.y_channel(x))
    assert y.min() >= -1e-6 and y.max() <= 1 + 1e-6


def test_gaussian_blur_preserves_mean(rng):
    x = jnp.asarray(rng.random((16, 16, 3), dtype=np.float32))
    out = ops.gaussian_blur(x, sigma=1.5)
    assert out.shape == x.shape
    np.testing.assert_allclose(float(out.mean()), float(x.mean()), atol=0.02)
    # blur reduces variance
    assert float(out.var()) < float(x.var())


def test_resize_shapes():
    x = jnp.zeros((32, 32, 3))
    assert ops.resize(x, (8, 8)).shape == (8, 8, 3)
    assert ops.upscale_bicubic(x[None], 4).shape == (1, 128, 128, 3)


def test_grayscale_lab_l(rng):
    x = jnp.asarray(rng.random((8, 8, 3), dtype=np.float32))
    g = ops.rgb_to_grayscale(x, mode="lab_l")
    assert g.shape == (8, 8, 1)
    # replicating the gray channel gives a chromaticity-free image (a=b=0)
    gray3 = jnp.repeat(g, 3, -1)
    lab = np.asarray(ops.rgb_to_lab(gray3))
    np.testing.assert_allclose(lab[..., 1:], 0.0, atol=0.2)
