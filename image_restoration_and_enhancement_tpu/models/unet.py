"""Flax UNet2DConditionModel — the SD-v1.5 denoising UNet, TPU-native (NHWC).

First-party implementation of the architecture the reference fine-tunes via
diffusers (reference: outputs/models/denoising/best/unet/config.json —
in/out 4ch, block_out (320,640,1280,1280), 3x CrossAttnDown + Down with Up
mirror, cross_attention_dim 768, 8 heads, 859,520,964 params; the 9-channel
inpainting variant per outputs/models/inpainting/best/unet/config.json).

Differences from the torch original are deliberate TPU choices:
- NHWC activations end-to-end (XLA conv-friendly), bf16 compute with fp32
  GroupNorm/LayerNorm statistics.
- Attention runs on the Pallas fused-attention kernel (ops/attention.py).
- The SDXL variant (per-level transformer depth/heads, linear spatial
  projections, "text_time" additive conditioning) is the same module under
  a different UNetConfig — covering the reference trainer's SDXL branch
  (train_denoising.py:531-594).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import UNetConfig
from .layers import (
    Downsample2D,
    FusedGroupNorm,
    ResnetBlock2D,
    TimestepEmbedding,
    Transformer2D,
    Upsample2D,
    timestep_embedding,
)


class CrossAttnDownBlock(nn.Module):
    out_channels: int
    num_layers: int
    heads: int
    groups: int
    eps: float
    has_attn: bool
    add_downsample: bool
    dtype: jnp.dtype
    attention_backend: Optional[str] = None
    tx_depth: int = 1
    use_linear_projection: bool = False

    @nn.compact
    def __call__(self, x, t_emb, context, cfg_dedup: bool = False):
        """cfg_dedup (first block only): `x` arrives at half the context
        batch; the first resnet+self-attention run on the shared CFG
        prefix and the batch is duplicated inside attentions_0 at the
        first cross-attention (see BasicTransformerBlock)."""
        skips = []
        head_dim = self.out_channels // self.heads
        half = x.shape[0]
        for i in range(self.num_layers):
            dedup_here = cfg_dedup and i == 0 and self.has_attn
            x = ResnetBlock2D(
                self.out_channels, groups=self.groups, eps=self.eps,
                dtype=self.dtype, name=f"resnets_{i}",
            )(x, t_emb[:half] if dedup_here else t_emb)
            if self.has_attn:
                x = Transformer2D(
                    self.heads, head_dim, depth=self.tx_depth, groups=self.groups,
                    dtype=self.dtype, attention_backend=self.attention_backend,
                    use_linear_projection=self.use_linear_projection,
                    name=f"attentions_{i}",
                )(x, context, cfg_dedup=dedup_here)
            skips.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, dtype=self.dtype, name="downsamplers_0")(x)
            skips.append(x)
        return x, skips


class UNetMidBlock(nn.Module):
    channels: int
    heads: int
    groups: int
    eps: float
    dtype: jnp.dtype
    attention_backend: Optional[str] = None
    tx_depth: int = 1
    use_linear_projection: bool = False

    @nn.compact
    def __call__(self, x, t_emb, context):
        x = ResnetBlock2D(
            self.channels, groups=self.groups, eps=self.eps, dtype=self.dtype,
            name="resnets_0",
        )(x, t_emb)
        x = Transformer2D(
            self.heads, self.channels // self.heads, depth=self.tx_depth,
            groups=self.groups, dtype=self.dtype,
            attention_backend=self.attention_backend,
            use_linear_projection=self.use_linear_projection,
            name="attentions_0",
        )(x, context)
        x = ResnetBlock2D(
            self.channels, groups=self.groups, eps=self.eps, dtype=self.dtype,
            name="resnets_1",
        )(x, t_emb)
        return x


class CrossAttnUpBlock(nn.Module):
    out_channels: int
    num_layers: int
    heads: int
    groups: int
    eps: float
    has_attn: bool
    add_upsample: bool
    dtype: jnp.dtype
    attention_backend: Optional[str] = None
    tx_depth: int = 1
    use_linear_projection: bool = False

    @nn.compact
    def __call__(self, x, skips: Tuple[jnp.ndarray, ...], t_emb, context):
        """skips: this block's residuals, deepest last (consumed in reverse).
        Passed as an immutable tuple so the block is remat-safe (pytree
        flattening across a remat boundary would disconnect list mutation
        from the caller)."""
        head_dim = self.out_channels // self.heads
        skips = list(skips)
        for i in range(self.num_layers):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResnetBlock2D(
                self.out_channels, groups=self.groups, eps=self.eps,
                dtype=self.dtype, name=f"resnets_{i}",
            )(x, t_emb)
            if self.has_attn:
                x = Transformer2D(
                    self.heads, head_dim, depth=self.tx_depth, groups=self.groups,
                    dtype=self.dtype, attention_backend=self.attention_backend,
                    use_linear_projection=self.use_linear_projection,
                    name=f"attentions_{i}",
                )(x, context)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype, name="upsamplers_0")(x)
        return x


class UNet2DCondition(nn.Module):
    """epsilon-prediction UNet conditioned on timestep + text embeddings.

    __call__(latents [B,H,W,Cin], timesteps [B], context [B,77,768])
      -> eps prediction [B,H,W,Cout]
    """

    config: UNetConfig
    dtype: jnp.dtype = jnp.float32
    attention_backend: Optional[str] = None
    # Rematerialize down/mid/up blocks on the backward pass: trades ~30%
    # more FLOPs for O(depth) less activation memory (the reference's
    # enable_gradient_checkpointing, train_denoising.py:251-253).
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,
        timesteps: jnp.ndarray,
        encoder_hidden_states: jnp.ndarray,
        added_cond: Optional[dict] = None,
        cfg_dedup: bool = False,
    ) -> jnp.ndarray:
        """added_cond (SDXL only): {"text_embeds": [B, pooled_dim],
        "time_ids": [B, 6]} — the additive micro-conditioning the reference
        trainer assembles in its SDXL branch (train_denoising.py:531-594).

        cfg_dedup: classifier-free-guidance prefix dedup. `sample` and
        `timesteps` arrive at HALF the context batch ([B] vs [2B]); the
        uncond/cond halves are bit-identical through conv_in, the first
        level-0 resnet and its self-attention (only the text context
        differs), so that prefix runs once and the batch is duplicated as
        [x; x] at the first cross-attention. Output is [2B, ...]. Not
        valid for SDXL text_time conditioning (the added pooled-text
        embedding feeds the time embedding, which the prefix consumes)."""
        cfg = self.config
        if cfg_dedup:
            assert cfg.addition_embed_type != "text_time", (
                "cfg_dedup is unsupported with SDXL text_time conditioning"
            )
            assert cfg.attn_levels[0], (
                "cfg_dedup needs cross-attention in down level 0"
            )
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        context = encoder_hidden_states.astype(self.dtype)

        t_emb = timestep_embedding(
            timesteps, cfg.block_out_channels[0],
            flip_sin_to_cos=cfg.flip_sin_to_cos, freq_shift=cfg.freq_shift,
        )
        t_emb = TimestepEmbedding(
            cfg.time_embed_dim, dtype=self.dtype, name="time_embedding"
        )(t_emb.astype(self.dtype))

        if cfg.addition_embed_type == "text_time":
            assert added_cond is not None, "SDXL config requires added_cond"
            time_ids = added_cond["time_ids"]  # [B, 6]
            b, n_ids = time_ids.shape
            id_emb = timestep_embedding(
                time_ids.reshape(-1), cfg.addition_time_embed_dim,
                flip_sin_to_cos=cfg.flip_sin_to_cos, freq_shift=cfg.freq_shift,
            ).reshape(b, n_ids * cfg.addition_time_embed_dim)
            add_emb = jnp.concatenate(
                [added_cond["text_embeds"].astype(jnp.float32), id_emb], axis=-1
            )
            aug = TimestepEmbedding(
                cfg.time_embed_dim, dtype=self.dtype, name="add_embedding"
            )(add_emb.astype(self.dtype))
            t_emb = t_emb + aug

        x = sample.astype(self.dtype)
        x = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in"
        )(x)

        DownBlock = CrossAttnDownBlock
        MidBlock = UNetMidBlock
        UpBlock = CrossAttnUpBlock
        if self.remat:
            # static_argnums counts self as 0: cfg_dedup is __call__ arg 4
            # and must stay a Python bool through the remat trace
            DownBlock = nn.remat(CrossAttnDownBlock, static_argnums=(4,))
            MidBlock = nn.remat(UNetMidBlock)
            UpBlock = nn.remat(CrossAttnUpBlock)

        if cfg_dedup:
            # the up path consumes this skip at the full batch; t_emb rows
            # are identical across the CFG halves (same timestep)
            skips = [jnp.concatenate([x, x], axis=0)]
            t_emb = jnp.concatenate([t_emb, t_emb], axis=0)
        else:
            skips = [x]
        n_levels = len(cfg.block_out_channels)
        for i, out_ch in enumerate(cfg.block_out_channels):
            block = DownBlock(
                out_channels=out_ch,
                num_layers=cfg.layers_per_block,
                heads=cfg.heads_at(i),
                groups=cfg.norm_num_groups,
                eps=cfg.norm_eps,
                has_attn=cfg.attn_levels[i],
                add_downsample=i < n_levels - 1,
                dtype=self.dtype,
                attention_backend=self.attention_backend,
                tx_depth=cfg.tx_depth_at(i),
                use_linear_projection=cfg.use_linear_projection,
                name=f"down_blocks_{i}",
            )
            x, new_skips = block(x, t_emb, context, bool(cfg_dedup and i == 0))
            skips.extend(new_skips)

        x = MidBlock(
            cfg.block_out_channels[-1],
            heads=cfg.heads_at(n_levels - 1),
            groups=cfg.norm_num_groups,
            eps=cfg.norm_eps,
            dtype=self.dtype,
            attention_backend=self.attention_backend,
            tx_depth=cfg.tx_depth_at(n_levels - 1),
            use_linear_projection=cfg.use_linear_projection,
            name="mid_block",
        )(x, t_emb, context)

        rev_channels = list(reversed(cfg.block_out_channels))
        rev_attn = list(reversed(cfg.attn_levels))
        n_up = cfg.layers_per_block + 1
        for i, out_ch in enumerate(rev_channels):
            blk_skips = tuple(skips[-n_up:])
            del skips[-n_up:]
            level = n_levels - 1 - i  # mirror of the down level
            x = UpBlock(
                out_channels=out_ch,
                num_layers=cfg.layers_per_block + 1,
                heads=cfg.heads_at(level),
                groups=cfg.norm_num_groups,
                eps=cfg.norm_eps,
                has_attn=rev_attn[i],
                add_upsample=i < n_levels - 1,
                dtype=self.dtype,
                attention_backend=self.attention_backend,
                tx_depth=cfg.tx_depth_at(level),
                use_linear_projection=cfg.use_linear_projection,
                name=f"up_blocks_{i}",
            )(x, blk_skips, t_emb, context)
        assert not skips, "skip connection bookkeeping mismatch"

        x = FusedGroupNorm(
            cfg.norm_num_groups, eps=cfg.norm_eps, act="silu", dtype=self.dtype,
            name="conv_norm_out",
        )(x)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)
        return x.astype(jnp.float32)
