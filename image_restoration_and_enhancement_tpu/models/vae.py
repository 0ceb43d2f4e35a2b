"""Flax AutoencoderKL — the SD VAE, TPU-native (NHWC).

First-party implementation of the VAE the reference freezes and uses for
latent encode/decode (reference: outputs/models/denoising/best/vae/
config.json — 3->4 latent channels, block_out (128,256,512,512),
scaling_factor 0.18215; consumed at scripts/train_denoising.py:626-632 and
through the diffusers pipelines in src/inference.py).

`encode` returns a diagonal Gaussian posterior (the reference samples from
`latent_dist`, train_denoising.py:629); `decode` maps latents back to [-1,1]
images. Scaling by 0.18215 is the caller's job, matching diffusers.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import VAEConfig
from .layers import FusedGroupNorm, ResnetBlock2D, Upsample2D, VAEAttentionBlock


class DiagonalGaussian(NamedTuple):
    mean: jnp.ndarray
    logvar: jnp.ndarray

    def sample(self, key: jax.Array) -> jnp.ndarray:
        std = jnp.exp(0.5 * self.logvar)
        return self.mean + std * jax.random.normal(key, self.mean.shape, self.mean.dtype)

    @property
    def mode(self) -> jnp.ndarray:
        return self.mean


class _DownEncoderBlock(nn.Module):
    out_channels: int
    num_layers: int
    groups: int
    add_downsample: bool
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = ResnetBlock2D(
                self.out_channels, groups=self.groups, eps=1e-6, use_time_emb=False,
                dtype=self.dtype, name=f"resnets_{i}",
            )(x)
        if self.add_downsample:
            x = _VAEDownsample(self.out_channels, dtype=self.dtype,
                               name="downsamplers_0")(x)
        return x


class _VAEDownsample(nn.Module):
    """diffusers VAE downsample: asymmetric (0,1) pad + VALID stride-2 conv
    (named .conv for checkpoint-name parity)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            self.out_channels, (3, 3), strides=(2, 2), padding="VALID",
            dtype=self.dtype, name="conv",
        )(x)


class _UpDecoderBlock(nn.Module):
    out_channels: int
    num_layers: int
    groups: int
    add_upsample: bool
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = ResnetBlock2D(
                self.out_channels, groups=self.groups, eps=1e-6, use_time_emb=False,
                dtype=self.dtype, name=f"resnets_{i}",
            )(x)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype, name="upsamplers_0")(x)
        return x


class _MidBlock(nn.Module):
    channels: int
    groups: int
    add_attention: bool
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        x = ResnetBlock2D(
            self.channels, groups=self.groups, eps=1e-6, use_time_emb=False,
            dtype=self.dtype, name="resnets_0",
        )(x)
        if self.add_attention:
            x = VAEAttentionBlock(groups=self.groups, dtype=self.dtype, name="attentions_0")(x)
        x = ResnetBlock2D(
            self.channels, groups=self.groups, eps=1e-6, use_time_emb=False,
            dtype=self.dtype, name="resnets_1",
        )(x)
        return x


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        x = x.astype(self.dtype)
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        n = len(cfg.block_out_channels)
        for i, ch in enumerate(cfg.block_out_channels):
            x = _DownEncoderBlock(
                ch, cfg.layers_per_block, cfg.norm_num_groups,
                add_downsample=i < n - 1, dtype=self.dtype, name=f"down_blocks_{i}",
            )(x)
        x = _MidBlock(
            cfg.block_out_channels[-1], cfg.norm_num_groups,
            cfg.mid_block_add_attention, dtype=self.dtype, name="mid_block",
        )(x)
        x = FusedGroupNorm(cfg.norm_num_groups, eps=1e-6, act="silu", dtype=self.dtype,
                           name="conv_norm_out")(x)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)


class Decoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        z = z.astype(self.dtype)
        rev = list(reversed(cfg.block_out_channels))
        x = nn.Conv(rev[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        x = _MidBlock(
            rev[0], cfg.norm_num_groups, cfg.mid_block_add_attention,
            dtype=self.dtype, name="mid_block",
        )(x)
        n = len(rev)
        for i, ch in enumerate(rev):
            x = _UpDecoderBlock(
                ch, cfg.layers_per_block + 1, cfg.norm_num_groups,
                add_upsample=i < n - 1, dtype=self.dtype, name=f"up_blocks_{i}",
            )(x)
        x = FusedGroupNorm(cfg.norm_num_groups, eps=1e-6, act="silu", dtype=self.dtype,
                           name="conv_norm_out")(x)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)


class AutoencoderKL(nn.Module):
    """KL VAE with quant convs, diffusers-compatible semantics.

    Methods (via `method=`): encode(images) -> DiagonalGaussian,
    decode(latents) -> images. Default __call__ is a full round-trip
    (encode mode + decode) for initialization convenience.
    """

    config: VAEConfig = VAEConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = Decoder(self.config, dtype=self.dtype)
        self.quant_conv = nn.Conv(
            2 * self.config.latent_channels, (1, 1), dtype=self.dtype, name="quant_conv"
        )
        self.post_quant_conv = nn.Conv(
            self.config.latent_channels, (1, 1), dtype=self.dtype, name="post_quant_conv"
        )

    def encode(self, images: jnp.ndarray) -> DiagonalGaussian:
        moments = self.quant_conv(self.encoder(images))
        mean, logvar = jnp.split(moments.astype(jnp.float32), 2, axis=-1)
        return DiagonalGaussian(mean, jnp.clip(logvar, -30.0, 20.0))

    def decode(self, latents: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(latents.astype(self.dtype))).astype(jnp.float32)

    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        return self.decode(self.encode(images).mode)
