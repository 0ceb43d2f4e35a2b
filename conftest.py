"""Repo-root conftest: make the package importable and force a CPU test mesh.

Tests run on an 8-device virtual CPU platform (the standard way to exercise
pjit/shard_map multi-chip semantics without a TPU pod). Must be set before
jax is imported anywhere.
"""
import os
import sys

# Force-override: the driver environment presets JAX_PLATFORMS (e.g. a real
# TPU via "axon") and the plugin wins over the env var, so also pin the jax
# config explicitly. Tests must run on the virtual 8-device CPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(__file__))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
