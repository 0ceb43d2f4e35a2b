"""RRDBNet — Real-ESRGAN's generator, in Flax (NHWC).

The reference optionally upscales with Real-ESRGAN when the package is
installed (src/inference.py:327-367, :579-591), sitting between the SD
img2img path and the LANCZOS fallback. This is the first-party equivalent:
the standard RRDB (Residual-in-Residual Dense Block) super-resolution
network (23 blocks, 64 features, x4 pixel-unshuffle-free upsampling), whose
published weights can be imported once via `import_rrdb_torch_state`.

Without imported weights the pipeline skips this backend (same gating as
the reference's optional dependency).
"""
from __future__ import annotations

import functools
import os
from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import nearest_upsample_2x

WEIGHTS_PATH = os.path.join(
    os.environ.get("IRET_WEIGHTS_DIR", "weights"), "realesrgan_x4.safetensors"
)


class DenseBlock(nn.Module):
    """5-conv dense block with 0.2-scaled residual."""

    features: int = 64
    growth: int = 32

    @nn.compact
    def __call__(self, x):
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        c1 = lrelu(nn.Conv(self.growth, (3, 3), padding=1, name="conv1")(x))
        c2 = lrelu(nn.Conv(self.growth, (3, 3), padding=1, name="conv2")(
            jnp.concatenate([x, c1], -1)))
        c3 = lrelu(nn.Conv(self.growth, (3, 3), padding=1, name="conv3")(
            jnp.concatenate([x, c1, c2], -1)))
        c4 = lrelu(nn.Conv(self.growth, (3, 3), padding=1, name="conv4")(
            jnp.concatenate([x, c1, c2, c3], -1)))
        c5 = nn.Conv(self.features, (3, 3), padding=1, name="conv5")(
            jnp.concatenate([x, c1, c2, c3, c4], -1))
        return x + 0.2 * c5


class RRDB(nn.Module):
    features: int = 64
    growth: int = 32

    @nn.compact
    def __call__(self, x):
        h = DenseBlock(self.features, self.growth, name="rdb1")(x)
        h = DenseBlock(self.features, self.growth, name="rdb2")(h)
        h = DenseBlock(self.features, self.growth, name="rdb3")(h)
        return x + 0.2 * h


class RRDBNet(nn.Module):
    """x4 SR generator. Input/output RGB in [0,1], NHWC."""

    num_blocks: int = 23
    features: int = 64
    growth: int = 32

    @nn.compact
    def __call__(self, x):
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        feat = nn.Conv(self.features, (3, 3), padding=1, name="conv_first")(x)
        body = feat
        for i in range(self.num_blocks):
            body = RRDB(self.features, self.growth, name=f"body_{i}")(body)
        body = nn.Conv(self.features, (3, 3), padding=1, name="conv_body")(body)
        feat = feat + body
        # x4: two nearest-x2 + conv stages
        for name in ("conv_up1", "conv_up2"):
            feat = nearest_upsample_2x(feat)
            feat = lrelu(nn.Conv(self.features, (3, 3), padding=1, name=name)(feat))
        feat = lrelu(nn.Conv(self.features, (3, 3), padding=1, name="conv_hr")(feat))
        return nn.Conv(3, (3, 3), padding=1, name="conv_last")(feat)


def weights_available() -> bool:
    return os.path.exists(WEIGHTS_PATH)


@functools.lru_cache(maxsize=1)
def _sr_fn():
    from ..core.checkpoint import load_params

    params = load_params(WEIGHTS_PATH)
    model = RRDBNet()
    return jax.jit(lambda x: model.apply({"params": params}, x))


def upscale_x4(img01: np.ndarray) -> np.ndarray:
    """float [0,1] HWC -> x4 upscaled, requires imported weights."""
    fn = _sr_fn()
    out = fn(jnp.asarray(img01, jnp.float32)[None])[0]
    return np.clip(np.asarray(out), 0.0, 1.0)


def import_rrdb_torch_state(state: Dict[str, np.ndarray]) -> Dict:
    """Real-ESRGAN torch state dict -> our param tree.

    torch names: conv_first, body.N.rdbM.convK, conv_body, conv_up1/2,
    conv_hr, conv_last (weights OIHW)."""
    out: Dict = {}

    def put(path, leaf, arr):
        node = out
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = arr

    import re

    for key, arr in state.items():
        arr = np.asarray(arr)
        # body.N.rdbM.convK -> body_N.rdbM.convK; a plain .replace("body.",
        # "body_") would also mangle "conv_body.weight" and silently drop
        # that conv (caught by tests/test_cross_framework.py's torch golden)
        parts = re.sub(r"(?:^|(?<=\.))body\.(\d+)\.", r"body_\1.", key).split(".")
        *mods, leaf = parts
        if leaf == "weight":
            put(mods, "kernel", arr.transpose(2, 3, 1, 0))
        elif leaf == "bias":
            put(mods, "bias", arr)
    return out
