"""AutoencoderKL (SD VAE) in Flax — encoder for training, decoder for the pipeline.

Replaces the reference's L0 dependency on diffusers' AutoencoderKL
(reference: train_relufied_sd.py:640-675 loads it; inference uses pipe.vae).
NHWC layouts; attention in the mid block is single-head over spatial positions.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffusion_models_moe_tpu.config import VAEConfig
from diffusion_models_moe_tpu.models.layers import (ResnetBlock2D, Upsample2D,
                                                    make_conv)


class VAEAttention(nn.Module):
    channels: int
    norm_num_groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6,
                         dtype=jnp.float32, name="group_norm")(x).astype(self.dtype)
        y = y.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y)
        att = jax.nn.dot_product_attention(q[:, :, None, :], k[:, :, None, :],
                                           v[:, :, None, :])[:, :, 0, :]
        y = nn.Dense(c, dtype=self.dtype, name="to_out")(att)
        return x + y.reshape(b, h, w, c)


class VAEMidBlock(nn.Module):
    channels: int
    norm_num_groups: int
    dtype: Any = jnp.float32
    quant: bool = False       # decoder serving modes; encoder leaves defaults
    winograd: bool = False

    @nn.compact
    def __call__(self, x):
        x = ResnetBlock2D(self.channels, self.norm_num_groups, eps=1e-6,
                          use_time_emb=False, dtype=self.dtype,
                          quant=self.quant, winograd=self.winograd,
                          name="res_0")(x)
        x = VAEAttention(self.channels, self.norm_num_groups,
                         dtype=self.dtype, name="attn")(x)
        x = ResnetBlock2D(self.channels, self.norm_num_groups, eps=1e-6,
                          use_time_emb=False, dtype=self.dtype,
                          quant=self.quant, winograd=self.winograd,
                          name="res_1")(x)
        return x


class VAEDecoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, latents: jax.Array) -> jax.Array:
        """latents: (B, h, w, 4) *scaled* latents. Returns images (B, 8h, 8w, 3) in [-1, 1]."""
        cfg = self.cfg
        dt = cfg.dtype
        quant, wino = cfg.quant_int8, cfg.conv_winograd
        z = (latents / cfg.scaling_factor).astype(dt)
        z = make_conv(cfg.latent_channels, (1, 1), padding=0, dtype=dt,
                      quant=quant, name="post_quant_conv")(z)
        rev = list(reversed(cfg.block_out_channels))
        h = make_conv(rev[0], (3, 3), padding=1, dtype=dt, quant=quant,
                      winograd=wino, name="conv_in")(z)
        h = VAEMidBlock(rev[0], cfg.norm_num_groups, dtype=dt,
                        quant=quant, winograd=wino, name="mid")(h)
        for i, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                h = ResnetBlock2D(ch, cfg.norm_num_groups, eps=1e-6,
                                  use_time_emb=False, dtype=dt,
                                  quant=quant, winograd=wino,
                                  name=f"up_{i}_res_{j}")(h)
            if i < len(rev) - 1:
                h = Upsample2D(ch, dtype=dt, quant=quant, winograd=wino,
                               name=f"up_{i}_upsample")(h)
        h = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                         dtype=jnp.float32, name="conv_norm_out")(h)
        h = nn.silu(h).astype(dt)
        h = make_conv(cfg.in_channels, (3, 3), padding=1, dtype=dt,
                      quant=quant, winograd=wino, name="conv_out")(h)
        return h.astype(jnp.float32)


class VAEEncoder(nn.Module):
    """Encoder producing (mean, logvar); used by the training path
    (reference: train_relufied_sd.py:1020 vae.encode)."""
    cfg: VAEConfig

    @nn.compact
    def __call__(self, images: jax.Array) -> tuple[jax.Array, jax.Array]:
        cfg = self.cfg
        dt = cfg.dtype
        chans = list(cfg.block_out_channels)
        h = nn.Conv(chans[0], (3, 3), padding=1, dtype=dt,
                    name="conv_in")(images.astype(dt))
        for i, ch in enumerate(chans):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock2D(ch, cfg.norm_num_groups, eps=1e-6,
                                  use_time_emb=False, dtype=dt,
                                  name=f"down_{i}_res_{j}")(h)
            if i < len(chans) - 1:
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding=((0, 1), (0, 1)),
                            dtype=dt, name=f"down_{i}_downsample")(h)
        h = VAEMidBlock(chans[-1], cfg.norm_num_groups, dtype=dt, name="mid")(h)
        h = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                         dtype=jnp.float32, name="conv_norm_out")(h)
        h = nn.silu(h).astype(dt)
        h = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, dtype=dt,
                    name="conv_out")(h)
        h = nn.Conv(2 * cfg.latent_channels, (1, 1), dtype=dt, name="quant_conv")(h)
        mean, logvar = jnp.split(h.astype(jnp.float32), 2, axis=-1)
        return mean, logvar


def sample_latents(mean, logvar, key, scaling_factor: float):
    """Reparameterized sample, scaled for the diffusion model."""
    std = jnp.exp(0.5 * logvar)
    return (mean + std * jax.random.normal(key, mean.shape)) * scaling_factor
