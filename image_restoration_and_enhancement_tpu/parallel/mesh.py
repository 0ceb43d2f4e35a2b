"""Device-mesh and sharding utilities.

The reference has no real parallelism (HF Accelerate wrapped single-GPU runs;
SURVEY §2.3). Here data/model parallelism is first-class and TPU-native:
a `jax.sharding.Mesh` with named axes, `NamedSharding` annotations on the
jitted train/infer steps, and XLA-inserted collectives riding ICI.

Axes:
  data  — batch sharding (DP); gradients all-reduce over this axis.
  model — reserved for tensor-parallel sharding of the UNet projections
          (wired by parallel.sharding_rules).

Multi-host: call `jax.distributed.initialize()` before `make_mesh()` and the
same code spans slices (DCN between hosts, ICI within).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a mesh over the available devices.

    Default: 1-D data-parallel mesh over all devices. Pass shape=(dp, tp)
    with axis_names=("data", "model") for 2-D layouts.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),)
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh shape {shape} != #devices {len(devices)}")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Device_put a pytree of [B, ...] arrays sharded on the batch dim."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    """Device_put a pytree fully replicated over the mesh."""
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def local_batch_size(global_batch: int, mesh: Mesh, axis: str = "data") -> int:
    n = mesh.shape[axis]
    if global_batch % n != 0:
        raise ValueError(f"global batch {global_batch} not divisible by {axis}={n}")
    return global_batch // n
