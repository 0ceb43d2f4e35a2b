"""Flax CLIP ViT-L/14 text encoder.

First-party replacement for `transformers.CLIPTextModel` as the reference
configures it (reference: outputs/models/denoising/best/text_encoder/
config.json — hidden 768, 12 layers / 12 heads, 77 positions, vocab 49408,
quick_gelu; consumed at scripts/train_denoising.py:600-610 and inside the
diffusers pipelines).

Pre-LayerNorm transformer with a causal mask (CLIP text towers are causal).
Sequence length is fixed at 77 tokens, so attention here is a single fused
XLA einsum — far below the threshold where the Pallas kernel pays off.
Returns last_hidden_state [B, 77, hidden]; that is all SD conditioning uses.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import CLIPTextConfig


def _quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, causal_mask: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        b, n, h = x.shape
        heads = cfg.num_attention_heads
        hd = cfg.hidden_size // heads
        q = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(b, n, heads, hd)
        k = k.reshape(b, n, heads, hd)
        v = v.reshape(b, n, heads, hd)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        s = s / (hd**0.5) + causal_mask
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, n, cfg.hidden_size)
        return nn.Dense(cfg.hidden_size, dtype=self.dtype, name="out_proj")(o)


class CLIPEncoderLayer(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, causal_mask: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="layer_norm1")(x)
        x = x + CLIPAttention(cfg, dtype=self.dtype, name="self_attn")(h, causal_mask)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="layer_norm2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = _quick_gelu(h) if cfg.hidden_act == "quick_gelu" else nn.gelu(h)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    """Token ids [B, 77] (int32) -> last_hidden_state [B, 77, hidden].

    With `return_dict=True` also returns the penultimate hidden states and
    the (optionally projected) EOS-pooled embedding — what SDXL consumes
    from its two text towers (reference SDXL branch,
    train_denoising.py:531-594). Set `with_projection=True` for the
    OpenCLIP-bigG tower's text_projection."""

    config: CLIPTextConfig = CLIPTextConfig()
    dtype: jnp.dtype = jnp.float32
    with_projection: bool = False

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, return_dict: bool = False):
        cfg = self.config
        b, n = input_ids.shape
        tok_emb = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=self.dtype, name="token_embedding"
        )(input_ids)
        pos_emb = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (cfg.max_position_embeddings, cfg.hidden_size),
        )
        x = tok_emb + pos_emb[None, :n].astype(self.dtype)

        causal = jnp.triu(jnp.full((n, n), -1e9, dtype=jnp.float32), k=1)[None, None]
        penultimate = None
        for i in range(cfg.num_hidden_layers):
            x = CLIPEncoderLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(x, causal)
            if i == cfg.num_hidden_layers - 2:
                penultimate = x.astype(jnp.float32)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="final_layer_norm")(x)
        last = x.astype(jnp.float32)
        if not return_dict:
            return last
        # EOS-pooled embedding (first eos position per sequence)
        eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
        pooled = last[jnp.arange(b), eos_pos]
        if self.with_projection:
            pooled = nn.Dense(
                cfg.hidden_size, use_bias=False, dtype=self.dtype, name="text_projection"
            )(pooled.astype(self.dtype)).astype(jnp.float32)
        return {
            "last_hidden_state": last,
            "penultimate_hidden_state": penultimate,
            "pooled": pooled,
        }
