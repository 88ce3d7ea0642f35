"""PixArt-alpha geometry: DiT transformer with adaLN-single conditioning.

The reference loads PixArt-alpha as a model variant and instruments its non-gated
GELU FF layers with the mean-gate predictivity path and t<=5 removal window
(reference: utils.py:119-127 replace_fn=GELU, neuron_receivers/predictivity.py:55-62,
remove_skilled_neurons.py:45-51). This module provides the TPU-native transformer:

  * patch embedding over latents, sinusoidal timestep -> adaLN-single (6 shift/scale
    /gate vectors shared across blocks with per-block learned offsets)
  * N blocks: self-attention, cross-attention over text, GELU MLP (the tappable FF)
  * final adaLN + linear unpatchify to eps (+ optional learned variance, dropped)

FF layers use the same GEGLUFeedForward in 'gelu' mode, so the entire
tap/intervention surface (mean-gate stats, neuron removal, Wanda masks) works
unchanged.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffusion_models_moe_tpu.models.attention import (Attention,
                                                       GEGLUFeedForward)
from diffusion_models_moe_tpu.models.layers import (TimestepEmbedding,
                                                    timestep_embedding)
from diffusion_models_moe_tpu.taps import Interventions, TapSpec


@dataclasses.dataclass(frozen=True)
class PixArtConfig:
    sample_channels: int = 4
    out_channels: int = 4
    patch_size: int = 2
    hidden_size: int = 1152
    num_layers: int = 28
    num_heads: int = 16
    cross_attention_dim: int = 1152   # projected text width (T5 features in)
    text_in_dim: int = 4096           # raw T5 feature width
    ff_mult: int = 4
    dtype: Any = jnp.float32

    @property
    def n_ff_layers(self) -> int:
        return self.num_layers

    def ff_dims(self) -> list[int]:
        return [self.hidden_size] * self.num_layers


def tiny_pixart_config() -> PixArtConfig:
    return PixArtConfig(hidden_size=32, num_layers=3, num_heads=4,
                        cross_attention_dim=32, text_in_dim=48)


def _modulate(x, shift, scale):
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


class PixArtBlock(nn.Module):
    cfg: PixArtConfig
    ff_index: int

    @nn.compact
    def __call__(self, x, context, cond6, *, step_idx=None, tap=None, ivs=None):
        cfg = self.cfg
        dt = cfg.dtype
        # adaLN-single: shared 6-way conditioning + per-block learned offsets
        table = self.param("scale_shift_table", nn.initializers.normal(0.02),
                           (6, cfg.hidden_size), jnp.float32)
        mods = cond6 + table[None].astype(dt)         # (B, 6, D)
        shift_sa, scale_sa, gate_sa, shift_ff, scale_ff, gate_ff = (
            mods[:, i] for i in range(6))

        h = nn.LayerNorm(use_bias=False, use_scale=False, dtype=jnp.float32,
                         name="norm1")(x).astype(dt)
        h = _modulate(h, shift_sa, scale_sa)
        x = x + gate_sa[:, None, :] * Attention(
            cfg.hidden_size, cfg.num_heads, dtype=dt, qkv_bias=True,
            name="attn1")(h)
        # cross-attention (PixArt: un-modulated; attention_bias=True in diffusers)
        x = x + Attention(cfg.hidden_size, cfg.num_heads,
                          context_dim=cfg.cross_attention_dim, dtype=dt,
                          qkv_bias=True, name="attn2")(x, context)
        h = nn.LayerNorm(use_bias=False, use_scale=False, dtype=jnp.float32,
                         name="norm2")(x).astype(dt)
        h = _modulate(h, shift_ff, scale_ff)
        iv = None
        if ivs is not None and self.ff_index < len(ivs):
            iv = ivs[self.ff_index]
        # non-gated GELU FF: the reference's PixArt tap path (mean-gate stats);
        # tanh-approximate to match diffusers' activation_fn='gelu-approximate'
        h = GEGLUFeedForward(cfg.hidden_size, cfg.ff_mult,
                             activation="gelu-tanh",
                             ff_index=self.ff_index, dtype=dt,
                             name="ff")(h, step_idx=step_idx, tap=tap, iv=iv)
        return x + gate_ff[:, None, :] * h


class PixArtTransformer2D(nn.Module):
    cfg: PixArtConfig

    @nn.compact
    def __call__(self, sample: jax.Array, timestep: jax.Array,
                 encoder_hidden_states: jax.Array, *,
                 step_idx: Optional[jax.Array] = None,
                 tap: Optional[TapSpec] = None,
                 ivs: Optional[Interventions] = None) -> jax.Array:
        cfg = self.cfg
        dt = cfg.dtype
        b, hgt, wid, c = sample.shape
        p = cfg.patch_size
        gh, gw = hgt // p, wid // p

        # patchify
        x = sample.astype(dt).reshape(b, gh, p, gw, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, p * p * c)
        x = nn.Dense(cfg.hidden_size, dtype=dt, name="patch_embed")(x)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (gh * gw, cfg.hidden_size), jnp.float32)
        x = x + pos[None].astype(dt)

        # timestep -> shared adaLN conditioning
        temb = timestep_embedding(
            jnp.broadcast_to(jnp.atleast_1d(timestep), (b,)), 256)
        temb = TimestepEmbedding(cfg.hidden_size, dtype=dt,
                                 name="time_embedding")(temb.astype(dt))
        cond6 = nn.Dense(6 * cfg.hidden_size, dtype=dt,
                         name="adaln_single")(nn.silu(temb))
        cond6 = cond6.reshape(b, 6, cfg.hidden_size)

        # caption projection: 2-layer MLP with tanh-GELU, matching diffusers'
        # PixArtAlphaTextProjection (linear_1 -> gelu_tanh -> linear_2) so real
        # checkpoints port key-for-key
        context = encoder_hidden_states.astype(dt)
        if context.shape[-1] != cfg.cross_attention_dim:
            context = nn.Dense(cfg.cross_attention_dim, dtype=dt,
                               name="caption_linear_1")(context)
            context = jax.nn.gelu(context, approximate=True)
            context = nn.Dense(cfg.cross_attention_dim, dtype=dt,
                               name="caption_linear_2")(context)

        for i in range(cfg.num_layers):
            x = PixArtBlock(cfg, ff_index=i, name=f"blocks_{i}")(
                x, context, cond6, step_idx=step_idx, tap=tap, ivs=ivs)

        # final adaLN + unpatchify. diffusers adds the embedded timestep to the
        # learned table: shift/scale = (scale_shift_table[None]
        # + embedded_timestep[:, None]).chunk(2) — the table alone drops the
        # per-sample conditioning and breaks ported-checkpoint parity
        table = self.param("final_scale_shift", nn.initializers.normal(0.02),
                           (2, cfg.hidden_size), jnp.float32)
        shift = table[None, 0].astype(dt) + temb
        scale = table[None, 1].astype(dt) + temb
        x = nn.LayerNorm(use_bias=False, use_scale=False, dtype=jnp.float32,
                         name="norm_out")(x).astype(dt)
        x = x * (1.0 + scale[:, None, :]) + shift[:, None, :]
        x = nn.Dense(p * p * cfg.out_channels, dtype=dt, name="proj_out")(x)
        x = x.reshape(b, gh, gw, p, p, cfg.out_channels)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hgt, wid, cfg.out_channels)
        return x.astype(jnp.float32)
