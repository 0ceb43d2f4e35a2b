"""On-device synthetic pair loader: contracts per task."""
import numpy as np
import pytest
from PIL import Image

from image_restoration_and_enhancement_tpu.data.synthetic import (
    SyntheticPairLoader,
    list_clean_images,
)


@pytest.fixture(scope="module")
def clean_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("clean")
    rng = np.random.default_rng(0)
    for i in range(4):
        img = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(d / f"c{i}.png")
    return str(d)


@pytest.mark.parametrize("task", ["denoise", "sr_x4", "colorize", "inpaint"])
def test_loader_batches(task, clean_dir):
    paths = list_clean_images(clean_dir)
    loader = SyntheticPairLoader(task, paths, image_size=32, batch_size=2, seed=1)
    batches = list(loader.epoch(0))
    assert len(batches) == 2
    b = batches[0]
    assert b["input"].shape == (2, 32, 32, 3)
    assert b["gt"].shape == (2, 32, 32, 3)
    inp = np.asarray(b["input"])
    assert inp.min() >= -1.001 and inp.max() <= 1.001
    if task == "inpaint":
        m = np.asarray(b["mask"])
        assert m.shape == (2, 32, 32, 1)
        assert set(np.unique(m)).issubset({0.0, 1.0})
    if task == "colorize":
        g = np.asarray(b["input"])
        np.testing.assert_allclose(g[..., 0], g[..., 1], atol=1e-5)


def test_fresh_degradations_each_epoch(clean_dir):
    paths = list_clean_images(clean_dir)
    loader = SyntheticPairLoader("denoise", paths, image_size=32, batch_size=4,
                                 seed=1)
    b0 = np.asarray(next(iter(loader.epoch(0)))["input"])
    b1 = np.asarray(next(iter(loader.epoch(1)))["input"])
    assert not np.allclose(b0, b1)
