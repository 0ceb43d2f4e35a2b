"""Parameter sharding rules: tensor parallelism for the SD stack.

The reference has no model parallelism at all (SURVEY §2.3). Here TP is
expressed the TPU way: `PartitionSpec`s over a ("data", "model") mesh
attached to the parameter pytree; XLA's SPMD partitioner inserts the
all-gather / reduce-scatter collectives over ICI. No explicit communication
code — the specs ARE the strategy.

What gets sharded on "model" (Megatron-style pairs, collective-free inside
each transformer block):
- attention to_q/to_k/to_v kernels: output (head) dim  -> column parallel
- attention to_out kernel: input dim                   -> row parallel
- GEGLU ff proj_in: output dim; ff proj_out: input dim
- CLIP q/k/v + fc1 column, out_proj + fc2 row
- time-embedding MLP linear_1 column / linear_2 row

Convs, norms and embeddings stay replicated: at SD1.5 scale the conv
weights are small relative to activations, and channel-sharded convs force
activation all-gathers around every GroupNorm. Batch stays sharded on
"data" (see parallel/mesh.py).
"""
from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path-suffix regex, PartitionSpec for a 2-D [in, out] kernel)
_COLUMN = ("to_q/kernel", "to_k/kernel", "to_v/kernel", "ff/proj_in/kernel",
           "q_proj/kernel", "k_proj/kernel", "v_proj/kernel", "fc1/kernel",
           "time_embedding/linear_1/kernel")
_ROW = ("to_out/kernel", "ff/proj_out/kernel", "out_proj/kernel",
        "fc2/kernel", "time_embedding/linear_2/kernel")
_COLUMN_BIAS = ("to_q/bias", "to_k/bias", "to_v/bias", "ff/proj_in/bias",
                "q_proj/bias", "k_proj/bias", "v_proj/bias", "fc1/bias",
                "time_embedding/linear_1/bias")


def partition_spec_for(path: str, ndim: int, model_axis: str = "model") -> P:
    """PartitionSpec for one parameter by its '/'-joined path."""
    if ndim == 2:
        for suf in _COLUMN:
            if path.endswith(suf):
                return P(None, model_axis)
        for suf in _ROW:
            if path.endswith(suf):
                return P(model_axis, None)
    if ndim == 1:
        for suf in _COLUMN_BIAS:
            if path.endswith(suf):
                return P(model_axis)
    return P()


def tree_partition_specs(params, model_axis: str = "model"):
    """PartitionSpec pytree matching `params` (any SD component or bundle)."""

    def rec(prefix: str, node):
        if isinstance(node, dict):
            return {k: rec(f"{prefix}/{k}" if prefix else k, v) for k, v in node.items()}
        return partition_spec_for(prefix, np.ndim(node), model_axis)

    return rec("", params)


def shard_params(params, mesh: Mesh, model_axis: str = "model"):
    """device_put the params with TP sharding over the mesh."""
    specs = tree_partition_specs(params, model_axis)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def tp_shardings(params, mesh: Mesh, model_axis: str = "model"):
    """NamedSharding pytree (for jit in_shardings)."""
    specs = tree_partition_specs(params, model_axis)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def validate_divisibility(params, mesh: Mesh, model_axis: str = "model") -> None:
    """Check every sharded dim divides by the model-axis size."""
    n = mesh.shape[model_axis]
    specs = tree_partition_specs(params, model_axis)
    flat_p = jax.tree.leaves(params)
    flat_s = jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P))
    for arr, spec in zip(flat_p, flat_s):
        for dim, axis in enumerate(spec):
            if axis == model_axis and np.shape(arr)[dim] % n != 0:
                raise ValueError(
                    f"param dim {np.shape(arr)} not divisible by {model_axis}={n}"
                )
