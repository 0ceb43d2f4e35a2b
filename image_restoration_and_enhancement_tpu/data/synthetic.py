"""On-device synthetic pair pipeline: degrade clean images on the TPU.

A TPU-native alternative to pre-rendered pairs (the reference can only train
from disk pairs produced offline by make_synthetic_pairs.py): clean images
are loaded once, and each batch's degradations are synthesized on device by
the jitted vmapped generators in data/degradations.py — fresh degradations
every epoch (infinite augmentation), zero extra disk, and the degradation
cost rides the accelerator instead of the host.

Usage:
    loader = SyntheticPairLoader("denoise", clean_paths, image_size=256,
                                 batch_size=8)
    for batch in loader.epoch(epoch_idx):   # dict of device arrays
        ...
"""
from __future__ import annotations

import functools
import os
from typing import Dict, Iterator, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from .. import native
from ..tasks.registry import get_task
from . import degradations as deg

IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def list_clean_images(directory: str) -> List[str]:
    return [
        os.path.join(directory, n)
        for n in sorted(os.listdir(directory))
        if os.path.splitext(n)[1].lower() in IMG_EXTS
    ]


@functools.lru_cache(maxsize=8)
def _degrade_batch_fn(task_name: str, image_size: int, sr_scale: int):
    """Build the jitted per-batch degradation: clean [B,H,W,3] in [0,1] ->
    batch dict in [-1,1] matching the PairDataset contract."""
    spec = get_task(task_name)

    def one(key, clean):
        if spec.name == "denoise":
            inp = deg.degrade_denoise(key, clean)
        elif spec.name == "sr_x4":
            lr = deg.degrade_sr(key, clean, scale=sr_scale)
            # bicubic back up: the SR training conditioning
            inp = jax.image.resize(
                lr, (image_size, image_size, 3), method="bicubic"
            )
            inp = jnp.clip(inp, 0.0, 1.0)
        elif spec.name == "colorize":
            inp = deg.degrade_colorize(clean)
        elif spec.name == "inpaint":
            inp, mask = deg.degrade_inpaint(key, clean)
            return {"input": inp * 2 - 1, "gt": clean * 2 - 1, "mask": mask}
        else:
            raise ValueError(spec.name)
        return {"input": inp * 2 - 1, "gt": clean * 2 - 1}

    @jax.jit
    def batch_fn(key, clean_batch):
        keys = jax.random.split(key, clean_batch.shape[0])
        return jax.vmap(one)(keys, clean_batch)

    return batch_fn


class SyntheticPairLoader:
    """Loads clean images once (host, resized via the native lib), then
    yields freshly-degraded device batches."""

    def __init__(
        self,
        task: str,
        clean_paths: Sequence[str],
        image_size: int = 256,
        batch_size: int = 8,
        seed: int = 0,
        sr_scale: int = 4,
        cache_in_memory: bool = True,
    ):
        self.task = get_task(task).name
        self.image_size = image_size
        self.batch_size = batch_size
        self.seed = seed
        self.sr_scale = sr_scale
        self.paths = list(clean_paths)
        if not self.paths:
            raise ValueError("no clean images given")
        self._cache: Optional[np.ndarray] = None
        if cache_in_memory:
            self._cache = np.stack([self._load(p) for p in self.paths])

    def _load(self, path: str) -> np.ndarray:
        img = np.array(Image.open(path).convert("RGB"), dtype=np.float32)
        if img.shape[:2] != (self.image_size, self.image_size):
            img = native.resize_bicubic(img, (self.image_size, self.image_size))
        return np.clip(img / 255.0, 0.0, 1.0)

    def __len__(self) -> int:
        return len(self.paths) // self.batch_size

    def epoch(self, epoch_idx: int = 0) -> Iterator[Dict[str, jnp.ndarray]]:
        order = np.arange(len(self.paths))
        np.random.default_rng(self.seed + epoch_idx).shuffle(order)
        fn = _degrade_batch_fn(self.task, self.image_size, self.sr_scale)
        base_key = jax.random.fold_in(jax.random.PRNGKey(self.seed), epoch_idx)
        for bi in range(len(self)):
            idxs = order[bi * self.batch_size : (bi + 1) * self.batch_size]
            if self._cache is not None:
                clean = self._cache[idxs]
            else:
                clean = np.stack([self._load(self.paths[i]) for i in idxs])
            yield fn(jax.random.fold_in(base_key, bi), jnp.asarray(clean))
