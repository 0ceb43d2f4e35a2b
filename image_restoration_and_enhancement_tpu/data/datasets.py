"""Pair datasets + double-buffered host->device input pipeline.

Replaces the four near-identical torch `Dataset` classes embedded in the
reference trainers (train_denoising.py:27-81, train_super_resolution.py:
27-78, train_colorization.py:27-70, train_inpainting.py:27-86) with one
task-parameterized loader over the shared directory convention

    data/pairs/{task}/{split}/{input,gt[,mask]}

Semantics parity:
- pairs matched by filename stem across extensions (the reference's
  cross-extension matching, metrics.py:269-282; colorize inputs are .png)
- images resized to `image_size` and normalized to [-1, 1]
- SR inputs bicubic-upsampled to the GT size before batching
  (train_super_resolution.py:514-519)
- inpaint masks NEAREST-resized, polarity auto-fixed (>50% white means
  inverted; train_inpainting.py:72-76), binarized {0,1}
- `max_samples` smoke-test knob (train_denoising.py:962-965)

TPU-native additions: background-thread prefetch (the reference runs
num_workers=0, fully synchronous) and native C++ resize/normalize for the
host hot path.
"""
from __future__ import annotations

import os
import queue
import threading
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np
from PIL import Image

from .. import native
from ..tasks.registry import get_task

IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def _list_stems(directory: str) -> Dict[str, str]:
    out = {}
    if not os.path.isdir(directory):
        return out
    for name in sorted(os.listdir(directory)):
        stem, ext = os.path.splitext(name)
        if ext.lower() in IMG_EXTS:
            out[stem] = os.path.join(directory, name)
    return out


def _load_rgb(path: str) -> np.ndarray:
    return np.array(Image.open(path).convert("RGB"))


def _load_gray(path: str) -> np.ndarray:
    return np.array(Image.open(path).convert("L"))


class PairDataset:
    """Input/GT(-mask) pairs for one task+split, normalized to [-1,1] NHWC."""

    def __init__(
        self,
        task: str,
        root: str = "data/pairs",
        split: str = "train",
        image_size: int = 256,
        max_samples: Optional[int] = None,
        sr_upscale: bool = True,
    ):
        self.spec = get_task(task)
        self.image_size = image_size
        self.sr_upscale = sr_upscale and self.spec.name == "sr_x4"
        base = os.path.join(root, self.spec.pair_dir, split)
        inputs = _list_stems(os.path.join(base, "input"))
        gts = _list_stems(os.path.join(base, "gt"))
        masks = _list_stems(os.path.join(base, "mask")) if self.spec.uses_mask else {}
        stems = sorted(set(inputs) & set(gts))
        if self.spec.uses_mask:
            stems = [s for s in stems if s in masks]
        if max_samples is not None:
            stems = stems[:max_samples]
        self.items: List[Tuple[str, str, Optional[str]]] = [
            (inputs[s], gts[s], masks.get(s)) for s in stems
        ]
        if not self.items:
            raise FileNotFoundError(f"No pairs under {base}")
        # optional noise level from a `_sigma<float>` stem suffix
        # (reference: train_denoising.py:67-72); None when absent
        self.sigmas: List[Optional[float]] = []
        for s in stems:
            sigma = None
            if "_sigma" in s:
                try:
                    sigma = float(s.split("_sigma")[-1])
                except ValueError:
                    pass
            self.sigmas.append(sigma)

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        inp_path, gt_path, mask_path = self.items[idx]
        size = self.image_size

        def prep(path: str) -> np.ndarray:
            u8 = _load_rgb(path)
            if u8.shape[:2] != (size, size):
                # SR: bicubic-upsample LR to target (train conditioning);
                # other tasks simply resize to the train resolution. clip:
                # bicubic resampling overshoots [0,255] slightly.
                f = native.resize_bicubic(u8.astype(np.float32), (size, size))
                return np.clip(f / 127.5 - 1.0, -1.0, 1.0).astype(np.float32)
            # size-matched hot path: one fused u8 -> [-1,1] pass (native
            # C++ when built; measured vs the 3-pass numpy float chain by
            # scripts/bench_loader.py). IRET_NATIVE_NORM=0 = numpy A/B.
            if os.environ.get("IRET_NATIVE_NORM", "1") != "0":
                return native.to_pm1(u8)
            return u8.astype(np.float32) / 127.5 - 1.0

        out = {"input": prep(inp_path), "gt": prep(gt_path)}
        if mask_path is not None:
            m = _load_gray(mask_path).astype(np.float32) / 255.0
            m = np.array(
                Image.fromarray((m * 255).astype(np.uint8)).resize(
                    (size, size), Image.NEAREST
                ),
                dtype=np.float32,
            ) / 255.0
            m = (m > 0.5).astype(np.float32)
            if m.mean() > 0.5:  # polarity auto-fix (reference :72-76)
                m = 1.0 - m
            out["mask"] = m[..., None]
        return out


class BatchLoader:
    """Shuffling, epoch-based batcher with one-batch background prefetch."""

    def __init__(
        self,
        dataset: PairDataset,
        batch_size: int,
        seed: int = 0,
        shuffle: bool = True,
        drop_last: bool = True,
        prefetch: bool = True,
    ):
        self.ds = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch

    def __len__(self) -> int:
        n = len(self.ds)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _collate(self, idxs) -> Dict[str, np.ndarray]:
        samples = [self.ds[i] for i in idxs]
        return {
            k: np.stack([s[k] for s in samples]) for k in samples[0]
        }

    def epoch(self, epoch_idx: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.ds))
        if self.shuffle:
            np.random.default_rng(self.seed + epoch_idx).shuffle(order)
        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order) - (self.batch_size - 1 if self.drop_last else 0),
                           self.batch_size)
        ]
        if not self.prefetch:
            for idxs in batches:
                yield self._collate(idxs)
            return

        q: "queue.Queue" = queue.Queue(maxsize=2)

        def worker():
            for idxs in batches:
                q.put(self._collate(idxs))
            q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            yield item
