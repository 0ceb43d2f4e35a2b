"""Repo-root conftest: make the package importable and force a CPU test mesh.

Tests run on an 8-device virtual CPU platform (the standard way to exercise
pjit/shard_map multi-chip semantics without a TPU pod). Must be set before
jax is imported anywhere.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(__file__))
