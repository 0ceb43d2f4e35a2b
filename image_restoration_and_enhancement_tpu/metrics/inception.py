"""Flax InceptionV3 (pool3 features) for FID.

First-party port of the torchvision `inception_v3` feature extractor the
reference uses for FID (src/metrics.py:72-80: fc removed, 2048-d pooled
features, ImageNet normalization, 299x299 inputs). Inference-only: BatchNorm
runs from imported running statistics (eps 1e-3, no affine recomputation).

Weights: import once from a torchvision checkpoint with
`import_inception_torch_state` and save to weights/inception_v3.safetensors
(see metrics/perceptual.py for gating).
"""
from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


class BasicConv2d(nn.Module):
    out_channels: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: int | Tuple[Tuple[int, int], Tuple[int, int]] = 0

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.out_channels, self.kernel, strides=self.strides,
            padding=self.padding, use_bias=False, name="conv",
        )(x)
        # inference-mode BatchNorm from imported running stats
        scale = self.param("bn_scale", nn.initializers.ones, (self.out_channels,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.out_channels,))
        mean = self.param("bn_mean", nn.initializers.zeros, (self.out_channels,))
        var = self.param("bn_var", nn.initializers.ones, (self.out_channels,))
        x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias
        return nn.relu(x)


def _avgpool3(x):
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=2, name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(_avgpool3(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(_avgpool3(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(_avgpool3(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """299x299x3 in [0,1] (ImageNet-normalized internally) -> [B, 2048]."""

    @nn.compact
    def __call__(self, x):
        x = (x - jnp.asarray(_IMAGENET_MEAN)) / jnp.asarray(_IMAGENET_STD)
        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # pool3 -> 2048


@functools.lru_cache(maxsize=1)
def _inception_fn():
    import os

    from ..core.checkpoint import load_params
    from .perceptual import _INCEPTION_PATH, fid_random_init_ok

    model = InceptionV3Features()
    if os.path.exists(_INCEPTION_PATH):
        params = load_params(_INCEPTION_PATH)
    elif fid_random_init_ok():
        # weights-pending exercise mode: seeded random trunk so the full
        # feature+Frechet path runs at eval scale (perceptual.fid docstring)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3), jnp.float32)
        )["params"]
    else:
        raise RuntimeError("InceptionV3 weights not imported")
    return jax.jit(lambda x: model.apply({"params": params}, x))


def inception_features(images: Sequence[np.ndarray], batch_size: int = 8) -> np.ndarray:
    """images: list of float [0,1] HWC arrays -> [N, 2048] features."""
    fn = _inception_fn()
    feats = []
    for i in range(0, len(images), batch_size):
        chunk = images[i : i + batch_size]
        batch = np.stack([
            np.asarray(jax.image.resize(jnp.asarray(im), (299, 299, 3), "bilinear"))
            for im in chunk
        ])
        feats.append(np.asarray(fn(jnp.asarray(batch))))
    return np.concatenate(feats, axis=0)


def import_inception_torch_state(state: Dict[str, np.ndarray]) -> Dict:
    """torchvision inception_v3 state dict -> our param tree."""
    out: Dict = {}

    def put(path: List[str], leaf: str, arr: np.ndarray):
        node = out
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = arr

    for key, arr in state.items():
        arr = np.asarray(arr)
        parts = key.split(".")
        if parts[0] in ("fc", "AuxLogits"):
            continue
        *mods, param_owner, leaf = parts
        path = mods + [param_owner]
        if param_owner == "conv" and leaf == "weight":
            put(path, "kernel", arr.transpose(2, 3, 1, 0))
        elif param_owner == "bn":
            name = {"weight": "bn_scale", "bias": "bn_bias",
                    "running_mean": "bn_mean", "running_var": "bn_var"}.get(leaf)
            if name:
                put(mods, name, arr)
        # num_batches_tracked etc. ignored
    return out
