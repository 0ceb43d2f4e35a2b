"""Level-gated spatial sharding — the sequence-parallel analog for vision.

Resolution is this framework's context length (SURVEY §5.7): sharding image
HEIGHT over a mesh axis lets one image larger than a chip's memory be served
by a mesh row, with GSPMD inserting conv halo exchanges over ICI.

Why a *policy* instead of plain input sharding: XLA's SPMD partitioner
produces WRONG VALUES (not an error) when a convolution's input shard holds
fewer rows than the window needs. Measured on the 8-virtual-device CPU
backend (jax 0.9, /tmp/probe_sp13 grid, re-derived in
tests/test_tensor_parallel.py):

- 3x3 stride-2 pad-1 conv, input H=4 over 2 shards (2 rows/shard):
  max abs error 6.4 vs the unsharded program.
- 3x3 stride-1 pad-1 conv, input H=2 over 2 shards (1 row/shard): error 3.6.
- The same convs with >= 4 input rows per shard are bit-exact.

A UNet/VAE pyramid halves H per level, so deep levels always hit the bad
geometry. The fix that is also the right performance design: keep
activations height-sharded only while each shard holds >= MIN_ROWS_PER_SHARD
input rows, and constrain deeper levels to batch-only sharding (they are a
few KB — the single all-gather at the gate is noise, and halo exchange at
1-row shards would be all overhead anyway).

The policy is a trace-time contextvar, like the int8 serving mode
(ops/quant.py): `models/layers.py` blocks call `constrain(x)` on their
outputs, which is a no-op unless a policy is active when the function is
*traced*. `core/sampling.make_sharded_img2img_fn(spatial_axis=...)` wraps
its program in `spatial_sharding(...)`.
"""
from __future__ import annotations

import contextlib
import contextvars
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Convs are exact with 4+ input rows per shard (3x3 stride-2's window plus
# halo); below that GSPMD's halo exchange miscompiles. See module docstring.
MIN_ROWS_PER_SHARD = 4

_policy: contextvars.ContextVar[Optional[tuple]] = contextvars.ContextVar(
    "spatial_sharding_policy", default=None
)


@contextlib.contextmanager
def spatial_sharding(
    mesh: Mesh,
    data_axis: str = "data",
    spatial_axis: str = "sp",
    min_rows: int = MIN_ROWS_PER_SHARD,
):
    """Activate the spatial policy for code traced inside this context."""
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    if spatial_axis not in sizes:
        raise ValueError(f"mesh has no axis {spatial_axis!r}: {mesh.axis_names}")
    token = _policy.set((mesh, data_axis, spatial_axis, sizes[spatial_axis], min_rows))
    try:
        yield
    finally:
        _policy.reset(token)


def active() -> bool:
    return _policy.get() is not None


def constrain(x):
    """Pin a [B, H, W, C] activation to the active spatial policy.

    Height-sharded over the spatial axis while every shard keeps
    >= min_rows rows (and H divides evenly); batch-only below that.
    No-op when no policy is active or x is not rank-4 — safe to call
    unconditionally from model blocks (captured at trace time)."""
    pol = _policy.get()
    if pol is None or getattr(x, "ndim", 0) != 4:
        return x
    mesh, data_axis, spatial_axis, sp_size, min_rows = pol
    h = x.shape[1]
    if h % sp_size == 0 and h // sp_size >= min_rows:
        spec = P(data_axis, spatial_axis)
    else:
        spec = P(data_axis)
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
