"""Basic UNet/VAE building blocks (Flax).

Re-implements the diffusers layer semantics the reference pipeline depends on
(reference L0: HuggingFace diffusers, not in-repo; see SURVEY.md §1) with NHWC layouts,
which XLA maps onto TPU conv units without transposes.
"""
from __future__ import annotations

import math
import os
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def maybe_barrier(x: jax.Array, flag: str, default: str = "0") -> jax.Array:
    """Env-gated `lax.optimization_barrier` for fusion/layout control.

    XLA fuses norm prologues into convs/dots and picks sequence-minor layouts
    for transformer activations (profiled: GEGLU dots at ~36% MXU). A barrier
    materializes the operand and blocks producer fusion so the effect of those
    choices can be measured end-to-end without code forks. Measured on v5e
    (headline bench): GN+SiLU->conv barrier 1.0351 -> 1.0553 img/s (the fused
    conv recomputed the normalize in its halo regions), so that one defaults ON
    on TPU; LN->attention/FF barrier measured 1.0251 (slower), default off."""
    import os
    if os.environ.get(flag, default) == "1":
        return jax.lax.optimization_barrier(x)
    return x


def timestep_embedding(timesteps: jax.Array, dim: int,
                       flip_sin_to_cos: bool = True,
                       downscale_freq_shift: float = 0.0,
                       max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal timestep embedding, matching diffusers `get_timestep_embedding`."""
    timesteps = jnp.atleast_1d(timesteps).astype(jnp.float32)
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = timesteps[:, None] * jnp.exp(exponent)[None, :]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """MLP on top of the sinusoidal embedding: Linear -> SiLU -> Linear."""
    emb_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, emb):
        emb = nn.Dense(self.emb_dim, dtype=self.dtype, name="linear_1")(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(self.emb_dim, dtype=self.dtype, name="linear_2")(emb)
        return emb


class QuantConv(nn.Module):
    """``nn.Conv``-compatible conv (same ``kernel``/``bias`` pytree and init)
    running the int8 W8A8 path (`ops/quant.py`) — the opt-in serving mode."""
    features: int
    kernel_size: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: int = 1                       # symmetric spatial zero padding
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from diffusion_models_moe_tpu.ops.quant import int8_conv
        kh, kw = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        p = self.padding
        y = int8_conv(x.astype(self.dtype), kernel.astype(self.dtype),
                      strides=self.strides, padding=((p, p), (p, p)))
        return y + bias.astype(self.dtype)


class WinoConv(nn.Module):
    """``nn.Conv``-compatible stride-1 SAME 3x3 conv running the Winograd
    F(2x2, 3x3) path (`ops/winograd.py`) — 2.25x fewer MXU flops; opt-in
    serving mode (`UNetConfig.conv_winograd`)."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from diffusion_models_moe_tpu.ops.winograd import winograd_conv3x3
        from diffusion_models_moe_tpu.ops.winograd_fused import (
            fused_profitable, winograd3x3_fused)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        # DMOE_WINO_FUSED=1 (read at trace time, like DMOE_PAD_PROJ): the
        # Pallas fused kernel at the shapes where it measured faster than the
        # direct conv (fused_profitable — 32x32/16x16 UNet levels), DIRECT
        # conv everywhere else. Never the XLA Winograd formulation in this
        # mode: it round-trips its Winograd-domain tensors through HBM and
        # measured 2x slower end-to-end (bench_modes.json dc3 vs dc3_wino;
        # ops/winograd_fused.py docstring).
        if os.environ.get("DMOE_WINO_FUSED", "0") == "1":
            xd = x.astype(self.dtype)
            kd = kernel.astype(self.dtype)
            if (jax.default_backend() == "tpu"
                    and fused_profitable(x.shape[1], x.shape[2], x.shape[-1],
                                         self.features)):
                y = winograd3x3_fused(xd, kd)
            else:
                y = jax.lax.conv_general_dilated(
                    xd, kd, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
            y = winograd_conv3x3(x.astype(self.dtype),
                                 kernel.astype(self.dtype))
        return y + bias.astype(self.dtype)


class GNFold(nn.Module):
    """``nn.GroupNorm``-compatible params (same ``scale``/``bias`` pytree and
    init) returning the folded per-(sample, channel) affine instead of the
    normalized tensor — consumed by ChainConv's fused prologue."""
    num_groups: int = 32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        from diffusion_models_moe_tpu.ops.conv_chain_fused import gn_scale_shift
        c = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return gn_scale_shift(x, gamma, beta, self.num_groups, self.epsilon)


class ChainConv(nn.Module):
    """``nn.Conv``-compatible stride-1 SAME 3x3 conv (same ``kernel``/``bias``
    pytree and init) running the fused GN+SiLU->conv->bias->residual chain
    kernel (`ops/conv_chain_fused.py`) — the subsuming kernel ROOFLINE.md §3a
    calls for. DMOE_CONV_CHAIN=1 serving mode (exact-tier, rounding-scale)."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, scale, shift, extra_bias=None, residual=None):
        from diffusion_models_moe_tpu.ops.conv_chain_fused import conv3x3_chain
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        bt = jnp.broadcast_to(bias[None].astype(self.dtype),
                              (x.shape[0], self.features))
        if extra_bias is not None:
            bt = bt + extra_bias.astype(self.dtype)
        res = None if residual is None else residual.astype(self.dtype)
        return conv3x3_chain(x.astype(self.dtype), kernel.astype(self.dtype),
                             bt, scale, shift, residual=res)


def chain_enabled(h: int, w: int, cin: int, cout: int) -> bool:
    """DMOE_CONV_CHAIN=1 (trace-time, like DMOE_PAD_PROJ) routes resblock
    convs through the fused chain kernel at the shapes where it measured
    faster than the XLA composite on v5e (chain_profitable)."""
    from diffusion_models_moe_tpu.ops.conv_chain_fused import chain_profitable
    return (os.environ.get("DMOE_CONV_CHAIN", "0") == "1"
            and jax.default_backend() == "tpu"
            and chain_profitable(h, w, cin, cout))


def make_conv(features, kernel_size=(3, 3), *, strides=(1, 1), padding=1,
              dtype=jnp.float32, quant=False, winograd=False, name=None):
    """nn.Conv, or its int8 / Winograd twin (identical param tree either way).

    `winograd` applies only to stride-1 3x3 convs (others fall back to the
    direct path). When combined with `quant`, Winograd takes the eligible
    3x3 convs and int8 the rest (1x1 shortcuts, stride-2 downsamples) — the
    combined serving mode; the dots stay int8 either way."""
    if winograd and kernel_size == (3, 3) and strides == (1, 1) \
            and padding == 1:   # ops/winograd.py computes SAME padding
        return WinoConv(features, dtype=dtype, name=name)
    if quant:
        return QuantConv(features, kernel_size, strides=strides,
                         padding=padding, dtype=dtype, name=name)
    return nn.Conv(features, kernel_size, strides=strides, padding=padding,
                   dtype=dtype, name=name)


class ResnetBlock2D(nn.Module):
    """GN -> SiLU -> Conv -> (+time) -> GN -> SiLU -> Conv with skip."""
    out_channels: int
    norm_num_groups: int = 32
    eps: float = 1e-5
    use_time_emb: bool = True
    dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32
    quant: bool = False
    winograd: bool = False

    @nn.compact
    def __call__(self, x, temb: Optional[jax.Array] = None):
        residual = x
        chain = not self.quant and not self.winograd
        chain1 = chain and chain_enabled(x.shape[1], x.shape[2], x.shape[-1],
                                         self.out_channels)
        chain2 = chain and chain_enabled(x.shape[1], x.shape[2],
                                         self.out_channels, self.out_channels)
        t = None
        if self.use_time_emb and temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype,
                         name="time_emb_proj")(nn.silu(temb))
        if chain1:
            s1, f1 = GNFold(self.norm_num_groups, self.eps, name="norm1")(x)
            h = ChainConv(self.out_channels, dtype=self.dtype,
                          name="conv1")(x, s1, f1, extra_bias=t)
        else:
            h = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=self.eps,
                             dtype=self.norm_dtype, name="norm1")(x)
            h = maybe_barrier(
                nn.silu(h).astype(self.dtype), "DMOE_CONV_BARRIER",
                default="1" if jax.default_backend() == "tpu" else "0")
            h = make_conv(self.out_channels, (3, 3), padding=1,
                          dtype=self.dtype, quant=self.quant,
                          winograd=self.winograd, name="conv1")(h)
            if t is not None:
                h = h + t[:, None, None, :]
        if residual.shape[-1] != self.out_channels:
            residual = make_conv(self.out_channels, (1, 1), padding=0,
                                 dtype=self.dtype, quant=self.quant,
                                 name="conv_shortcut")(residual)
        if chain2:
            s2, f2 = GNFold(self.norm_num_groups, self.eps, name="norm2")(h)
            return ChainConv(self.out_channels, dtype=self.dtype,
                             name="conv2")(h, s2, f2, residual=residual)
        h = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=self.eps,
                         dtype=self.norm_dtype, name="norm2")(h)
        h = maybe_barrier(nn.silu(h).astype(self.dtype), "DMOE_CONV_BARRIER",
                          default="1" if jax.default_backend() == "tpu" else "0")
        h = make_conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                      quant=self.quant, winograd=self.winograd,
                      name="conv2")(h)
        return h + residual


class Downsample2D(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        return make_conv(self.out_channels, (3, 3), strides=(2, 2), padding=1,
                         dtype=self.dtype, quant=self.quant, name="conv")(x)


class Upsample2D(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32
    quant: bool = False
    winograd: bool = False

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        # 2x nearest upsample as broadcast+reshape (cheaper than gather-resize)
        x = jnp.broadcast_to(x[:, :, None, :, None, :],
                             (b, h, 2, w, 2, c)).reshape(b, h * 2, w * 2, c)
        return make_conv(self.out_channels, (3, 3), padding=1,
                         dtype=self.dtype, quant=self.quant,
                         winograd=self.winograd, name="conv")(x)
