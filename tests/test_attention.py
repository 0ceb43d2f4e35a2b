"""Pallas fused attention vs the XLA reference path (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_restoration_and_enhancement_tpu.ops import attention as attn


@pytest.mark.parametrize(
    "b,nq,nk,h,d",
    [
        (1, 64, 64, 2, 40),     # self-attention, SD head_dim 40
        (2, 64, 77, 2, 40),     # cross-attention vs 77 text tokens
        (1, 100, 100, 1, 80),   # non-multiple-of-block seq len
        (1, 64, 64, 1, 160),    # widest SD head_dim
    ],
)
def test_pallas_matches_xla(b, nq, nk, h, d):
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, nq, h, d), jnp.float32)
    k = jax.random.normal(kk, (b, nk, h, d), jnp.float32)
    v = jax.random.normal(kv, (b, nk, h, d), jnp.float32)
    ref = attn.xla_attention(q, k, v)
    out = attn.attention(q, k, v, backend="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_attention_softmax_rowsum_property():
    """Output must be a convex combination of V rows: bounded by V extremes."""
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (1, 16, 1, 40))
    k = jax.random.normal(jax.random.fold_in(key, 1), (1, 32, 1, 40))
    v = jnp.ones((1, 32, 1, 40)) * 3.0
    out = attn.attention(q, k, v, backend="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out), 3.0, atol=1e-4)


def test_xla_attention_grads_finite():
    key = jax.random.PRNGKey(2)
    q = jax.random.normal(key, (1, 16, 2, 8))

    def loss(q):
        return jnp.sum(attn.xla_attention(q, q, q) ** 2)

    g = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.parametrize(
    "b,nq,nk,h,d",
    [
        (2, 64, 64, 8, 40),     # SD level-0 shape (packed lane slices at 40)
        (1, 64, 77, 4, 80),     # cross-attention, 77-token KV
        (1, 100, 100, 2, 160),  # non-multiple-of-block seq len, widest head
    ],
)
def test_pallas_packed_matches_xla(b, nq, nk, h, d):
    """Packed layout ([B, N, H*D], in-kernel head split) vs XLA reference."""
    key = jax.random.PRNGKey(2)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, nq, h, d), jnp.float32)
    k = jax.random.normal(kk, (b, nk, h, d), jnp.float32)
    v = jax.random.normal(kv, (b, nk, h, d), jnp.float32)
    ref = attn.xla_attention(q, k, v)
    out = attn.attention(q, k, v, backend="pallas_packed_interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)
