"""Degradation synthesis: shapes, ranges, statistical properties, determinism."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_restoration_and_enhancement_tpu.data import degradations as deg


@pytest.fixture
def img(rng):
    return jnp.asarray(rng.random((64, 64, 3), dtype=np.float32))


def test_gaussian_noise_sigma_in_range(img):
    key = jax.random.PRNGKey(0)
    noisy = deg.gaussian_noise(key, img, (5.0, 8.0))
    resid = np.asarray(noisy - img)
    sigma = resid.std() * 255.0
    assert 3.0 < sigma < 10.0  # clipping shrinks it slightly
    assert noisy.shape == img.shape
    assert float(noisy.min()) >= 0 and float(noisy.max()) <= 1


def test_gaussian_noise_deterministic(img):
    key = jax.random.PRNGKey(7)
    a = deg.gaussian_noise(key, img)
    b = deg.gaussian_noise(key, img)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_jpeg_artifacts_lossy_but_close(img):
    key = jax.random.PRNGKey(1)
    out = deg.jpeg_artifacts(key, img, (30, 30))
    err = float(jnp.abs(out - img).mean())
    assert 0.001 < err < 0.2
    # higher quality -> lower error
    out_hq = deg.jpeg_quantize(img, jnp.array(95))
    err_hq = float(jnp.abs(out_hq - img).mean())
    assert err_hq < err


def test_jpeg_on_smooth_image_nearly_exact():
    x = jnp.full((32, 32, 3), 0.5)
    out = deg.jpeg_quantize(x, jnp.array(90))
    assert float(jnp.abs(out - x).max()) < 0.02


def test_motion_blur_shapes_and_smoothing(img):
    key = jax.random.PRNGKey(2)
    out = deg.motion_blur_random(key, img, (5, 15))
    assert out.shape == img.shape
    assert float(out.var()) < float(img.var())


def test_degrade_sr_downscales(img):
    key = jax.random.PRNGKey(3)
    lr = deg.degrade_sr(key, img, scale=4)
    assert lr.shape == (16, 16, 3)


def test_degrade_colorize_gray(img):
    g = deg.degrade_colorize(img)
    assert g.shape == img.shape
    np.testing.assert_allclose(np.asarray(g[..., 0]), np.asarray(g[..., 1]))


def test_free_form_mask_properties():
    key = jax.random.PRNGKey(4)
    m = deg.free_form_mask(key, (64, 64), num_strokes=(3, 7), thickness_range=(5, 20))
    m = np.asarray(m)
    assert m.shape == (64, 64, 1)
    assert set(np.unique(m)).issubset({0.0, 1.0})
    frac = m.mean()
    assert 0.005 < frac < 0.9


def test_inpaint_masking_zeroes_pixels(img):
    key = jax.random.PRNGKey(5)
    masked, mask = deg.degrade_inpaint(key, img)
    masked, mask = np.asarray(masked), np.asarray(mask)
    assert masked.shape == img.shape
    hole = mask[..., 0] > 0.5
    assert hole.any()
    np.testing.assert_allclose(masked[hole], 0.0)
    keep = ~hole
    np.testing.assert_allclose(masked[keep], np.asarray(img)[keep])


def test_degrade_denoise_artifacts_mode(img):
    key = jax.random.PRNGKey(6)
    out = deg.degrade_denoise(key, img, with_artifacts=True)
    assert out.shape == img.shape
    assert float(jnp.abs(out - img).mean()) > 0


def test_vmappable_over_batch(rng):
    batch = jnp.asarray(rng.random((4, 32, 32, 3), dtype=np.float32))
    keys = jax.random.split(jax.random.PRNGKey(8), 4)
    noisy = jax.vmap(deg.gaussian_noise)(keys, batch)
    assert noisy.shape == batch.shape
    # different keys -> different noise
    assert not np.allclose(np.asarray(noisy[0] - batch[0]), np.asarray(noisy[1] - batch[1]))
