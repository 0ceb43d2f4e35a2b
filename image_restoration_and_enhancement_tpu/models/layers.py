"""Shared Flax building blocks for the UNet and VAE (NHWC, bf16-friendly).

First-party equivalents of the diffusers blocks the reference depends on
(UNet2DConditionModel / AutoencoderKL internals). Parameter layouts are Flax
native (HWIO convs); the checkpoint importer owns the torch->flax mapping.
"""
from __future__ import annotations

import functools
import math
from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import quant, token_merge
from ..ops.attention import attention as fused_attention
from ..ops.groupnorm import group_norm as fused_group_norm
from ..parallel.spatial import constrain as constrain_spatial

# Quant-aware layer constructors: identical params/behavior to nn.Conv /
# nn.Dense (bf16), except that when the int8 serving mode is on at trace
# time (ops/quant.py) the matmul/conv runs s8xs8 on the MXU. Used for every
# FLOP-heavy projection in the UNet blocks; IO convs and the time-embedding
# MLP stay full precision (models/unet.py). The subclasses publish their
# flax module path as the quant "site" so calibration can key per-layer
# static activation scales (ops/quant.py mode "int8_static").


def _module_site(m: nn.Module) -> str:
    try:
        return "/".join(str(p) for p in m.scope.path)
    except Exception:  # pragma: no cover - unbound module
        return m.name or m.__class__.__name__


class _SiteConv(nn.Conv):
    def __call__(self, x):
        with quant.at_site(_module_site(self)):
            return super().__call__(x)


class _SiteDense(nn.Dense):
    def __call__(self, x):
        with quant.at_site(_module_site(self)):
            return super().__call__(x)


QConv = functools.partial(_SiteConv, conv_general_dilated=quant.conv_general_dilated)
QDense = functools.partial(_SiteDense, dot_general=quant.dot_general)


class FusedGroupNorm(nn.Module):
    """GroupNorm with optional fused SiLU, on the Pallas kernel when it
    pays off (TPU, tensor fits VMEM). Parameter names match nn.GroupNorm
    (scale/bias), so checkpoints are interchangeable."""

    groups: int
    eps: float = 1e-5
    act: Optional[str] = None  # None | "silu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return fused_group_norm(
            x.astype(self.dtype), scale, bias, self.groups, self.eps, self.act
        )


class FusedLayerNorm(nn.Module):
    """LayerNorm with reduce-fused fp32 statistics (no materialized fp32
    copy of the input). flax's nn.LayerNorm upcasts the whole tensor to
    float32 before reducing; on the 512px UNet the XLA lowering materializes
    (and relayouts) those converts — measured ~23 GB of copy traffic per
    20-step sampling call. Here the converts ride inside the reduces
    (jnp.mean(..., dtype=f32)) and the normalize is one elementwise pass.
    Parameter names match nn.LayerNorm (scale/bias)."""

    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
        mean_sq = jnp.mean(
            jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True,
            dtype=jnp.float32,
        )
        rstd = jax.lax.rsqrt(jnp.maximum(mean_sq - jnp.square(mean), 0.0) + self.eps)
        w = rstd * scale.astype(jnp.float32)
        b = bias.astype(jnp.float32) - mean * w
        y = x.astype(jnp.float32) * w + b
        return y.astype(self.dtype)


def nearest_upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x nearest-neighbor upsample via broadcast+reshape.

    jax.image.resize(method="nearest") lowers to a gather on TPU (measured
    ~6.7 GB of gather traffic per sampling call across the UNet and VAE
    upsamplers); a broadcast+reshape lowers to a plain layout copy at HBM
    bandwidth."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding, diffusers `get_timestep_embedding`
    semantics. timesteps: [B] -> [B, dim], float32."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """Two-layer MLP lifting the sinusoid to the UNet time channel."""

    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t_emb: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="linear_1")(t_emb)
        x = nn.silu(x)
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="linear_2")(x)


class ResnetBlock2D(nn.Module):
    """GroupNorm -> SiLU -> Conv3x3, time-conditioned, with skip projection."""

    out_channels: int
    groups: int = 32
    eps: float = 1e-5
    use_time_emb: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, t_emb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        residual = x
        h = FusedGroupNorm(self.groups, eps=self.eps, act="silu", dtype=self.dtype,
                           name="norm1")(x)
        h = QConv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        if self.use_time_emb and t_emb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(t_emb)
            )
            h = h + t[:, None, None, :]
        h = FusedGroupNorm(self.groups, eps=self.eps, act="silu", dtype=self.dtype,
                           name="norm2")(h)
        h = QConv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if residual.shape[-1] != self.out_channels:
            residual = QConv(
                self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut"
            )(residual)
        # Trace-time no-op unless spatial (sequence-parallel) serving is on:
        # pins block outputs to the level-gated height sharding so GSPMD
        # never runs a conv on shards thinner than its window
        # (parallel/spatial.py has the measured miscompile geometry).
        return constrain_spatial(residual + h)


class Downsample2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return constrain_spatial(QConv(
            self.out_channels, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype, name="conv"
        )(x))


class Upsample2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nearest_upsample_2x(x)
        return constrain_spatial(
            QConv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)
        )


class CrossAttention(nn.Module):
    """Multi-head attention over flattened tokens. Self-attention when
    `context` is None. Runs on the Pallas fused kernel (TPU) via ops.attention."""

    heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32
    out_bias: bool = True
    qkv_bias: bool = False
    attention_backend: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        ctx = x if context is None else context
        inner = self.heads * self.head_dim
        b, nq, _ = x.shape
        nk = ctx.shape[1]
        q = QDense(inner, use_bias=self.qkv_bias, dtype=self.dtype, name="to_q")(x)
        k = QDense(inner, use_bias=self.qkv_bias, dtype=self.dtype, name="to_k")(ctx)
        v = QDense(inner, use_bias=self.qkv_bias, dtype=self.dtype, name="to_v")(ctx)
        q = q.reshape(b, nq, self.heads, self.head_dim)
        k = k.reshape(b, nk, self.heads, self.head_dim)
        v = v.reshape(b, nk, self.heads, self.head_dim)
        o = fused_attention(q, k, v, backend=self.attention_backend)
        o = o.reshape(b, nq, inner)
        return QDense(inner, use_bias=self.out_bias, dtype=self.dtype, name="to_out")(o)


class GEGLUFeedForward(nn.Module):
    """GEGLU feed-forward: proj to 2*4d, gate with gelu, project back."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner = self.dim * self.mult
        h = QDense(inner * 2, dtype=self.dtype, name="proj_in")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate)
        return QDense(self.dim, dtype=self.dtype, name="proj_out")(h)


class BasicTransformerBlock(nn.Module):
    """LN->self-attn, LN->cross-attn, LN->GEGLU FF, all residual.

    cfg_dedup (call arg): under classifier-free guidance the uncond/cond
    halves of the batch are IDENTICAL until the first cross-attention
    (same latents, same timestep — only the text context differs). When
    True, `x` arrives at half the context batch; self-attention runs on
    the half batch and the tensor is duplicated just before attn2."""

    heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32
    attention_backend: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: jnp.ndarray,
        cfg_dedup: bool = False,
        hw: Optional[Tuple[int, int]] = None,
    ) -> jnp.ndarray:
        attn = lambda name: CrossAttention(
            self.heads, self.head_dim, dtype=self.dtype,
            attention_backend=self.attention_backend, name=name,
        )
        # Opt-in ToMe serving approximation (ops/token_merge.py): merge
        # redundant tokens around self-attention at the big-N sites; the
        # policy is trace-time (like the quant mode) so training and the
        # default serving path are untouched.
        tome_ratio = token_merge.current_ratio()
        n1 = FusedLayerNorm(dtype=self.dtype, name="norm1")(x)
        if (
            tome_ratio > 0.0
            and hw is not None
            and x.shape[1] >= token_merge.min_tokens()
        ):
            r = token_merge.merge_count(hw[0], hw[1], tome_ratio)
            m, u, _ = token_merge.build_merge(x, hw[0], hw[1], r)
            x = x + u(attn("attn1")(m(n1)))
        else:
            x = x + attn("attn1")(n1)
        if cfg_dedup:
            x = jnp.concatenate([x, x], axis=0)
        x = x + attn("attn2")(FusedLayerNorm(dtype=self.dtype, name="norm2")(x), context)
        x = x + GEGLUFeedForward(x.shape[-1], dtype=self.dtype, name="ff")(
            FusedLayerNorm(dtype=self.dtype, name="norm3")(x)
        )
        return x


class Transformer2D(nn.Module):
    """Spatial transformer: GroupNorm, proj in, token-space transformer
    blocks with text cross-attention, proj out, residual.

    use_linear_projection: SD1.5 projects with 1x1 convs; SDXL with Dense
    layers applied after flattening (diffusers parity)."""

    heads: int
    head_dim: int
    depth: int = 1
    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    attention_backend: Optional[str] = None
    use_linear_projection: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, context: jnp.ndarray, cfg_dedup: bool = False
    ) -> jnp.ndarray:
        """cfg_dedup: `x` arrives at half the context batch (the shared
        CFG prefix); block 0 duplicates it after its self-attention and
        everything from there runs at the full batch."""
        b, h, w, c = x.shape
        residual = x
        x = FusedGroupNorm(self.groups, eps=1e-6, dtype=self.dtype, name="norm")(x)
        if self.use_linear_projection:
            x = x.reshape(b, h * w, c)
            x = QDense(c, dtype=self.dtype, name="proj_in")(x)
        else:
            x = QConv(c, (1, 1), dtype=self.dtype, name="proj_in")(x)
            x = x.reshape(b, h * w, c)
        for i in range(self.depth):
            x = BasicTransformerBlock(
                self.heads, self.head_dim, dtype=self.dtype,
                attention_backend=self.attention_backend,
                name=f"transformer_blocks_{i}",
            )(x, context, cfg_dedup=(cfg_dedup and i == 0), hw=(h, w))
        out_b = 2 * b if cfg_dedup else b
        if self.use_linear_projection:
            x = QDense(c, dtype=self.dtype, name="proj_out")(x)
            x = x.reshape(out_b, h, w, c)
        else:
            x = x.reshape(out_b, h, w, c)
            x = QConv(c, (1, 1), dtype=self.dtype, name="proj_out")(x)
        if cfg_dedup:
            residual = jnp.concatenate([residual, residual], axis=0)
        return constrain_spatial(x + residual)


class VAEAttentionBlock(nn.Module):
    """Single-head self-attention over spatial tokens (VAE mid block)."""

    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        residual = x
        y = FusedGroupNorm(self.groups, eps=1e-6, dtype=self.dtype, name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y)
        o = fused_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
        )[:, :, 0, :]
        o = nn.Dense(c, dtype=self.dtype, name="to_out")(o)
        return residual + o.reshape(b, h, w, c)
