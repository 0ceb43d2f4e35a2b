"""Fused GroupNorm(+SiLU) kernel vs flax/reference implementations."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_restoration_and_enhancement_tpu.ops.groupnorm import (
    _reference_group_norm,
    group_norm,
)


@pytest.mark.parametrize("shape,groups", [
    ((2, 8, 8, 32), 4),
    ((1, 16, 16, 40), 8),   # gc=5, rows not multiple of chunk
    ((1, 3, 5, 16), 4),     # odd spatial
])
def test_pallas_groupnorm_matches_flax(shape, groups):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, shape, jnp.float32) * 2 + 0.5
    c = shape[-1]
    scale = jax.random.normal(jax.random.fold_in(key, 1), (c,)) * 0.5 + 1.0
    bias = jax.random.normal(jax.random.fold_in(key, 2), (c,)) * 0.1

    flax_gn = nn.GroupNorm(groups, epsilon=1e-5)
    variables = {"params": {"scale": scale, "bias": bias}}
    expect = flax_gn.apply(variables, x)

    got = group_norm(x, scale, bias, groups, eps=1e-5, backend="pallas_interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=2e-4, rtol=2e-4)

    ref = _reference_group_norm(x, scale, bias, groups, 1e-5, "none")
    np.testing.assert_allclose(np.asarray(ref), np.asarray(expect), atol=2e-4, rtol=2e-4)


def test_pallas_groupnorm_silu_fusion():
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (1, 8, 8, 16), jnp.float32)
    scale = jnp.ones((16,))
    bias = jnp.zeros((16,))
    got = group_norm(x, scale, bias, 4, act="silu", backend="pallas_interpret")
    flax_gn = nn.GroupNorm(4, epsilon=1e-5)
    expect = jax.nn.silu(
        flax_gn.apply({"params": {"scale": scale, "bias": bias}}, x)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=2e-4, rtol=2e-4)


def test_groupnorm_bf16_io():
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, 32), jnp.bfloat16)
    out = group_norm(x, jnp.ones((32,)), jnp.zeros((32,)), 8,
                     backend="pallas_interpret")
    assert out.dtype == jnp.bfloat16
    ref = _reference_group_norm(x, jnp.ones((32,)), jnp.zeros((32,)), 8, 1e-5, "none")
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=0.05
    )


def test_groupnorm_large_mean_no_nan():
    """One-pass E[x^2]-E[x]^2 can cancel negative in fp32 at large
    mean/std ratios (ADVICE r1: mean 5000 / std 0.1 gave var=-26 ->
    rsqrt NaN). Both the XLA path and the pallas kernel must clamp."""
    import jax
    key = jax.random.PRNGKey(0)
    x = 5000.0 + 0.1 * jax.random.normal(key, (2, 8, 8, 16))
    scale, bias = jnp.ones(16), jnp.zeros(16)
    y = group_norm(x, scale, bias, groups=4)
    assert np.isfinite(np.asarray(y)).all()
    y2 = group_norm(x, scale, bias, groups=4, backend="pallas_interpret")
    assert np.isfinite(np.asarray(y2)).all()


def test_gn_stats_barrier_is_identity(monkeypatch):
    """IRET_GN_STATS_BARRIER only blocks producer fusion; outputs match."""
    import numpy as np
    from image_restoration_and_enhancement_tpu.ops import groupnorm as gn

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 32))
    s = jax.random.normal(jax.random.PRNGKey(1), (32,)) * 0.1 + 1.0
    b = jax.random.normal(jax.random.PRNGKey(2), (32,)) * 0.1
    ref = gn._reference_group_norm(x, s, b, 8, 1e-5, "silu")
    monkeypatch.setenv("IRET_GN_STATS_BARRIER", "1")
    got = gn._reference_group_norm(x, s, b, 8, 1e-5, "silu")
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
