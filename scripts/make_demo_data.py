#!/usr/bin/env python3
"""Generate synthetic demo images + masks under data/demo (the reference
ships photo examples there for the Gradio UI; we synthesize procedural
images so the repo stays self-contained)."""
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from image_restoration_and_enhancement_tpu.data import host_degradations as hd


def _procedural_image(seed: int, size: int = 256) -> np.ndarray:
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:size, 0:size].astype(np.float32) / size
    img = np.stack([
        0.5 + 0.5 * np.sin(2 * np.pi * (3 * x + rng.uniform(0, 1))),
        0.5 + 0.5 * np.cos(2 * np.pi * (2 * y + rng.uniform(0, 1))),
        0.5 + 0.5 * np.sin(2 * np.pi * (x * y * 4 + rng.uniform(0, 1))),
    ], axis=-1)
    # add some blobs
    for _ in range(6):
        cy, cx = rng.uniform(0, size, 2)
        r = rng.uniform(10, 50)
        d2 = (np.mgrid[0:size, 0:size][0] - cy) ** 2 + (np.mgrid[0:size, 0:size][1] - cx) ** 2
        blob = np.exp(-d2 / (2 * r * r))[..., None]
        color = rng.uniform(0, 1, 3)
        img = img * (1 - 0.7 * blob) + 0.7 * blob * color
    return (img.clip(0, 1) * 255).astype(np.uint8)


def main():
    out_img = "data/demo/images"
    out_mask = "data/demo/mask"
    os.makedirs(out_img, exist_ok=True)
    os.makedirs(out_mask, exist_ok=True)
    rng = np.random.default_rng(42)
    for i in range(4):
        img = _procedural_image(i)
        name = f"demo_{i}.png"
        if i == 0:  # noisy
            img = hd.add_gaussian_noise(rng, img, (10.0, 12.0))
        elif i == 1:  # low-res look
            img = hd.degrade_sr(rng, img, 4)
        elif i == 2:  # grayscale
            g = hd.to_grayscale(img)
            img = np.stack([g] * 3, axis=-1)
        else:  # damaged + mask
            img, mask = hd.inpaint_pair(rng, img)
            Image.fromarray(mask).save(os.path.join(out_mask, name))
        Image.fromarray(img).save(os.path.join(out_img, name))
    print("wrote demo data under data/demo/")


if __name__ == "__main__":
    main()
