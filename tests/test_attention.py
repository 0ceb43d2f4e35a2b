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
@pytest.mark.parametrize("variant", ["slice", "grid"])
def test_pallas_packed_matches_xla(b, nq, nk, h, d, variant):
    """Packed layout ([B, N, H*D]) vs XLA reference, both head-split
    strategies (in-kernel lane slices / grid+BlockSpec lane blocks)."""
    key = jax.random.PRNGKey(2)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, nq, h, d), jnp.float32)
    k = jax.random.normal(kk, (b, nk, h, d), jnp.float32)
    v = jax.random.normal(kv, (b, nk, h, d), jnp.float32)
    ref = attn.xla_attention(q, k, v)
    out = attn._packed_call(q, k, v, interpret=True, variant=variant)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_pallas_softmax_extreme_values_exact_default():
    """The default (row-max) softmax must stay accurate at large logits."""
    key = jax.random.PRNGKey(5)
    q = jax.random.normal(key, (1, 32, 1, 40), jnp.float32) * 12.0
    k = jax.random.normal(jax.random.fold_in(key, 1), (1, 64, 1, 40), jnp.float32) * 12.0
    v = jax.random.normal(jax.random.fold_in(key, 2), (1, 64, 1, 40), jnp.float32)
    ref = attn.xla_attention(q, k, v)
    out = attn.attention(q, k, v, backend="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-3, rtol=5e-3)


def test_pallas_norm_bound_extreme(monkeypatch):
    """Documents the opt-in norm-bound softmax's failure mode: at large
    logits the sqrt(d)-loose bound underflows exp and zeroes confident
    rows (finite, but wrong) — which is why it is OFF by default."""
    monkeypatch.setenv("IRET_ATTN_NORM_BOUND", "1")
    key = jax.random.PRNGKey(5)
    q = jax.random.normal(key, (1, 32, 1, 40), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (1, 64, 1, 40), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (1, 64, 1, 40), jnp.float32)
    # unit-scale logits: bound shift is exact to normal tolerances
    ref = attn.xla_attention(q, k, v)
    out = attn.attention(q, k, v, backend="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)
    # large logits: stays finite (no 0/0), but rows may zero out
    out2 = attn.attention(q * 12, k * 12, v, backend="pallas_interpret")
    assert np.isfinite(np.asarray(out2)).all()


@pytest.mark.parametrize(
    "b,nq,nk,h,d,bq,bk",
    [
        (1, 256, 256, 2, 40, 64, 128),   # multi-chunk online softmax
        (1, 200, 200, 1, 80, 64, 128),   # ragged seq: padded KV cols masked
        (2, 128, 77, 2, 40, 64, 128),    # cross-attention KV < block_k
        (1, 128, 128, 1, 160, 128, 128), # single chunk degenerate case
    ],
)
def test_flash_matches_xla(b, nq, nk, h, d, bq, bk, monkeypatch):
    monkeypatch.setenv("IRET_FLASH_BLOCK_Q", str(bq))
    monkeypatch.setenv("IRET_FLASH_BLOCK_K", str(bk))
    key = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, nq, h, d), jnp.float32)
    k = jax.random.normal(kk, (b, nk, h, d), jnp.float32)
    v = jax.random.normal(kv, (b, nk, h, d), jnp.float32)
    ref = attn.xla_attention(q, k, v)
    out = attn.attention(q, k, v, backend="flash_interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_extreme_logits_exact(monkeypatch):
    """Online-softmax rescale must stay exact for huge logit magnitudes."""
    monkeypatch.setenv("IRET_FLASH_BLOCK_Q", "64")
    monkeypatch.setenv("IRET_FLASH_BLOCK_K", "128")
    q = jnp.full((1, 128, 1, 40), 8.0, jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(2), (1, 256, 1, 40)) * 8.0
    v = jax.random.normal(jax.random.PRNGKey(3), (1, 256, 1, 40))
    ref = attn.xla_attention(q, k, v)
    out = attn.attention(q, k, v, backend="flash_interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_pallas_scores_bf16_close(monkeypatch):
    monkeypatch.setenv("IRET_ATTN_SCORES_BF16", "1")
    key = jax.random.PRNGKey(4)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, 128, 2, 40), jnp.float32)
    k = jax.random.normal(kk, (1, 128, 2, 40), jnp.float32)
    v = jax.random.normal(kv, (1, 128, 2, 40), jnp.float32)
    ref = attn.xla_attention(q, k, v)
    out = attn.attention(q, k, v, backend="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-2, rtol=5e-2)
    err = float(jnp.abs(out - ref).max())
    assert err < 0.02, err


def test_int8_attention_close():
    """Int8-QK kernel (interpret) and the XLA s8 variant vs full-precision
    reference: quantization noise bounded, and the two int8 formulations
    agree with each other (same quantized operands)."""
    key = jax.random.PRNGKey(5)
    kq, kk, kv = jax.random.split(key, 3)
    for (b, n, h, d, nk) in [(2, 256, 4, 40, 256), (1, 100, 2, 40, 77)]:
        q = jax.random.normal(kq, (b, n, h, d), jnp.float32)
        k = jax.random.normal(kk, (b, nk, h, d), jnp.float32) + 0.3
        v = jax.random.normal(kv, (b, nk, h, d), jnp.float32)
        ref = attn.xla_attention(q, k, v)
        got_pl = attn.attention(q, k, v, backend="int8_interpret")
        got_xla = attn.attention(q, k, v, backend="xla_int8")
        rel = float(jnp.linalg.norm(got_pl - ref) / jnp.linalg.norm(ref))
        assert rel < 0.03, rel
        np.testing.assert_allclose(np.asarray(got_pl), np.asarray(got_xla),
                                   atol=1e-4, rtol=1e-4)


def test_int8_pv_attention_close():
    """Fully-quantized (s8 QK + s8 PV) XLA attention vs full precision:
    the added P/V quantization noise stays bounded, including at larger N
    where per-row P rounding errors accumulate (the quantized-row-sum
    normalization cancels them to first order)."""
    key = jax.random.PRNGKey(8)
    kq, kk, kv = jax.random.split(key, 3)
    for (b, n, h, d, nk) in [(2, 256, 4, 40, 256), (1, 512, 2, 40, 512)]:
        q = jax.random.normal(kq, (b, n, h, d), jnp.float32)
        k = jax.random.normal(kk, (b, nk, h, d), jnp.float32) + 0.3
        v = jax.random.normal(kv, (b, nk, h, d), jnp.float32)
        ref = attn.xla_attention(q, k, v)
        got = attn.attention(q, k, v, backend="xla_int8_pv")
        rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
        assert rel < 0.04, rel


def test_int8_pv_normalization_row_sum():
    """The ones-column row sum must normalize exactly: constant V columns
    pass through unchanged regardless of the attention pattern (numerator
    and denominator share the same quantized p8)."""
    key = jax.random.PRNGKey(9)
    kq, kk = jax.random.split(key, 2)
    q = jax.random.normal(kq, (1, 64, 2, 40), jnp.float32) * 4.0
    k = jax.random.normal(kk, (1, 64, 2, 40), jnp.float32) * 4.0
    v = jnp.full((1, 64, 2, 40), 0.7, jnp.float32)
    got = attn.attention(q, k, v, backend="xla_int8_pv")
    np.testing.assert_allclose(np.asarray(got), 0.7, atol=1e-3)


def test_int8_pv_dispatch_env(monkeypatch):
    """IRET_ATTN_XLA_INT8_MIN routes large self-attention to the quantized
    path but never 77-token cross-attention (nk below threshold)."""
    called = {}
    real = attn._attention_xla_int8_pv

    def spy(q, k, v):
        called["pv"] = True
        return real(q, k, v)

    # attention() resolves the dispatch target from module globals at call
    # time, so patching the wrapper observes the dispatch decision.
    monkeypatch.setattr(attn, "_attention_xla_int8_pv", spy)
    monkeypatch.setattr(attn, "_on_tpu", lambda: True)
    monkeypatch.setenv("IRET_ATTN_XLA_INT8_MIN", "128")
    key = jax.random.PRNGKey(10)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, 256, 2, 40), jnp.float32)
    k = jax.random.normal(kk, (1, 256, 2, 40), jnp.float32)
    v = jax.random.normal(kv, (1, 256, 2, 40), jnp.float32)
    # self-attention at N >= threshold -> quantized path
    attn.attention(q, k, v)
    assert called.get("pv")
    # cross-attention (small KV) must NOT take it
    called.clear()
    kx = jax.random.normal(kk, (1, 77, 2, 40), jnp.float32)
    vx = jax.random.normal(kv, (1, 77, 2, 40), jnp.float32)
    attn.attention(q, kx, vx)
    assert not called.get("pv")


def test_int8_attention_k_smoothing_invariance():
    """K token-mean smoothing must be output-invariant (softmax shift):
    adding a constant vector to every K token changes nothing."""
    key = jax.random.PRNGKey(6)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, 64, 2, 40), jnp.float32)
    k = jax.random.normal(kk, (1, 64, 2, 40), jnp.float32)
    v = jax.random.normal(kv, (1, 64, 2, 40), jnp.float32)
    shift = jnp.full((1, 1, 2, 40), 5.0, jnp.float32)
    a = attn.attention(q, k, v, backend="xla_int8")
    b = attn.attention(q, k + shift, v, backend="xla_int8")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-2)


def test_int8_attention_chunked_matches_single(monkeypatch):
    """In-cell KV chunking with online rescale must not change results."""
    key = jax.random.PRNGKey(7)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, 128, 2, 40), jnp.float32) * 3.0
    k = jax.random.normal(kk, (1, 256, 2, 40), jnp.float32) * 3.0
    v = jax.random.normal(kv, (1, 256, 2, 40), jnp.float32)
    ref = attn.attention(q, k, v, backend="int8_interpret")
    monkeypatch.setenv("IRET_ATTN_INT8_CHUNK", "128")
    got = attn.attention(q, k, v, backend="int8_interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
