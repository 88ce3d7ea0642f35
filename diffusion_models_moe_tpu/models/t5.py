"""T5 v1.1 encoder stack for PixArt-alpha text conditioning.

The reference loads the full PixArt-alpha pipeline, whose text encoder is
google/t5-v1_1-xxl (4096-d features; reference: utils.py:119-127). This is the
TPU-native encoder-only stack:

  * token embedding -> N blocks of (RMSNorm -> self-attn + relative position
    bias -> residual; RMSNorm -> gated-GELU FF -> residual) -> final RMSNorm
  * relative position bias is computed ONCE (layer 0 owns the bucket embedding,
    HF layout) and reused by every layer — one (H, S, S) bias add per layer,
    which XLA fuses into the logits
  * no biases anywhere; attention is unscaled (T5 folds the 1/sqrt(d) into the
    initialization); RMSNorm statistics in f32

Everything is static-shape and jit-safe; the bucketing table is built with
numpy at trace time (shapes are static) so no data-dependent control flow
enters the graph.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class T5Config:
    """Defaults are t5-v1_1-xxl, the PixArt-alpha text encoder."""
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_eps: float = 1e-6
    max_length: int = 120           # PixArt caption length
    dtype: Any = jnp.float32


def tiny_t5_config() -> T5Config:
    return T5Config(vocab_size=256, d_model=48, d_kv=8, d_ff=96, num_layers=2,
                    num_heads=4, max_length=16)


def _relative_position_buckets(seq_len: int, num_buckets: int,
                               max_distance: int) -> np.ndarray:
    """Bidirectional T5 bucket table, (S, S) int32, built host-side (static)."""
    ctx = np.arange(seq_len)[:, None]
    mem = np.arange(seq_len)[None, :]
    rel = mem - ctx
    nb = num_buckets // 2
    out = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = max_exact + (
        np.log(np.maximum(rel, 1) / max_exact) / np.log(max_distance / max_exact)
        * (nb - max_exact)).astype(np.int64)
    large = np.minimum(large, nb - 1)
    out += np.where(is_small, rel, large)
    return out.astype(np.int32)


class T5LayerNorm(nn.Module):
    """RMSNorm (no mean subtraction, no bias), stats in f32."""
    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("weight", nn.initializers.ones, (x.shape[-1],),
                           jnp.float32)
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                       keepdims=True)
        y = x.astype(jnp.float32) * jax.lax.rsqrt(var + self.eps)
        return (y * scale).astype(self.dtype)


class T5SelfAttention(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x, position_bias):
        cfg = self.cfg
        inner = cfg.num_heads * cfg.d_kv
        dt = cfg.dtype
        q = nn.Dense(inner, use_bias=False, dtype=dt, name="q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=dt, name="k")(x)
        v = nn.Dense(inner, use_bias=False, dtype=dt, name="v")(x)
        b, s = x.shape[0], x.shape[1]

        def split(t):  # (B, S, H, D) -> (B, H, S, D)
            return t.reshape(b, s, cfg.num_heads, cfg.d_kv).transpose(0, 2, 1, 3)

        # T5: unscaled dot product + additive position bias, softmax in f32
        logits = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k),
                            preferred_element_type=jnp.float32)
        logits = logits + position_bias.astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1).astype(dt)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, split(v))
        out = out.transpose(0, 2, 1, 3).reshape(b, s, inner)
        return nn.Dense(cfg.d_model, use_bias=False, dtype=dt, name="o")(out)


class T5Block(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x, position_bias):
        cfg = self.cfg
        h = T5LayerNorm(cfg.layer_norm_eps, dtype=cfg.dtype,
                        name="attn_norm")(x)
        x = x + T5SelfAttention(cfg, name="attn")(h, position_bias)
        h = T5LayerNorm(cfg.layer_norm_eps, dtype=cfg.dtype, name="ff_norm")(x)
        # T5 v1.1 gated-GELU FF: wo @ (gelu(wi_0(h)) * wi_1(h))
        g = nn.Dense(cfg.d_ff, use_bias=False, dtype=cfg.dtype, name="wi_0")(h)
        u = nn.Dense(cfg.d_ff, use_bias=False, dtype=cfg.dtype, name="wi_1")(h)
        y = jax.nn.gelu(g, approximate=True) * u
        return x + nn.Dense(cfg.d_model, use_bias=False, dtype=cfg.dtype,
                            name="wo")(y)


class T5Encoder(nn.Module):
    """input_ids (B, S) -> features (B, S, d_model).

    `attention_mask` (B, S) of 0/1 masks padded positions out of the softmax
    (PixArt masks pad tokens in the caption)."""
    cfg: T5Config

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        cfg = self.cfg
        emb = self.param("token_embedding", nn.initializers.normal(1.0),
                         (cfg.vocab_size, cfg.d_model), jnp.float32)
        x = emb.astype(cfg.dtype)[input_ids]
        s = input_ids.shape[1]

        buckets = jnp.asarray(_relative_position_buckets(
            s, cfg.relative_attention_num_buckets,
            cfg.relative_attention_max_distance))
        bias_emb = self.param("relative_attention_bias",
                              nn.initializers.normal(1.0),
                              (cfg.relative_attention_num_buckets,
                               cfg.num_heads), jnp.float32)
        # (S, S, H) -> (1, H, S, S), shared by all layers (HF: block 0 owns it)
        position_bias = bias_emb[buckets].transpose(2, 0, 1)[None]
        if attention_mask is not None:
            neg = jnp.asarray(-1e9, jnp.float32)
            position_bias = position_bias + jnp.where(
                attention_mask[:, None, None, :] > 0, 0.0, neg)

        for i in range(cfg.num_layers):
            x = T5Block(cfg, name=f"block_{i}")(x, position_bias)
        return T5LayerNorm(cfg.layer_norm_eps, dtype=cfg.dtype,
                           name="final_norm")(x)
