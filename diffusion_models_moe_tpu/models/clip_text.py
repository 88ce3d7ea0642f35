"""CLIP text encoder (ViT-L/14 text tower geometry) in Flax.

Replaces the reference's L0 dependency on transformers' CLIPTextModel. The MLP layers
carry the same tap/intervention surface as the UNet FF layers, covering the reference's
`hook_module='text'` path that hooks the 12 CLIPMLP modules
(reference: utils.py:135-136, neuron_receivers/base_receiver.py:59-66).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffusion_models_moe_tpu.config import CLIPTextConfig
from diffusion_models_moe_tpu.taps import Interventions, TapSpec


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPMLP(nn.Module):
    """fc1 -> act -> fc2, with Wanda-style taps/masks on the fc1 activations/fc2 kernel
    (reference: neuron_receivers/wanda_receiver.py:62-72,
    neuron_receivers/remove_wanda_neurons_fast.py:85-100)."""
    cfg: CLIPTextConfig
    layer_index: int

    @nn.compact
    def __call__(self, x, *, tap: Optional[TapSpec] = None, iv=None):
        cfg = self.cfg
        h = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype, name="fc1")(x)
        # "gelu" must be the EXACT erf form (HF ACT2FN["gelu"]); jax's default
        # tanh approximation drifts SD2.x/SDXL-bigG towers by ~3%
        h = (quick_gelu(h) if cfg.hidden_act == "quick_gelu"
             else jax.nn.gelu(h, approximate=False))
        if tap is not None and tap.ff_out_colnorm_sq:
            h2 = h.reshape(-1, h.shape[-1]).astype(jnp.float32)
            h2 = h2 / jnp.maximum(jnp.linalg.norm(h2, axis=-1, keepdims=True), 1e-12)
            self.sow("taps", f"text_colnorm_sq_{self.layer_index:02d}",
                     jnp.sum(h2 * h2, axis=0))
        if iv is not None and iv.neuron_mask is not None:
            m = iv.neuron_mask if iv.neuron_mask.ndim == 1 else iv.neuron_mask[0]
            h = jnp.where(m[None, None, :], jnp.asarray(iv.neuron_fill, h.dtype), h)
        kernel = self.param("fc2_kernel", nn.initializers.lecun_normal(),
                            (cfg.intermediate_size, cfg.hidden_size), jnp.float32)
        bias = self.param("fc2_bias", nn.initializers.zeros,
                          (cfg.hidden_size,), jnp.float32)
        kernel = kernel.astype(cfg.dtype)
        if iv is not None and iv.out_weight_mask is not None:
            wm = iv.out_weight_mask
            wm = wm[0] if wm.ndim == 3 else wm
            kernel = kernel * (1.0 - wm.astype(kernel.dtype))
        return h @ kernel + bias.astype(cfg.dtype)


class CLIPEncoderLayer(nn.Module):
    cfg: CLIPTextConfig
    layer_index: int

    @nn.compact
    def __call__(self, x, causal_mask, *, tap=None, iv=None):
        cfg = self.cfg
        residual = x
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="layer_norm1")(x).astype(cfg.dtype)
        h = nn.MultiHeadDotProductAttention(
            num_heads=cfg.num_heads, dtype=cfg.dtype, deterministic=True,
            name="self_attn")(h, mask=causal_mask)
        x = residual + h
        residual = x
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="layer_norm2")(x).astype(cfg.dtype)
        h = CLIPMLP(cfg, self.layer_index, name="mlp")(h, tap=tap, iv=iv)
        return residual + h


class CLIPTextEncoder(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, input_ids: jax.Array, *,
                 tap: Optional[TapSpec] = None,
                 ivs: Optional[Interventions] = None,
                 return_penultimate: bool = False):
        """input_ids: (B, S) int32. Returns the final-LN hidden state (B, S, D);
        with `return_penultimate` also the pre-final-LN state one layer earlier
        (SDXL conditions on hidden_states[-2])."""
        cfg = self.cfg
        b, s = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype,
                       name="token_embedding")(input_ids)
        pos = self.param("position_embedding", nn.initializers.zeros,
                         (cfg.max_length, cfg.hidden_size), jnp.float32)
        x = tok + pos[None, :s, :].astype(cfg.dtype)
        causal = nn.make_causal_mask(input_ids)
        penultimate = None
        for i in range(cfg.num_layers):
            iv = ivs[i] if ivs is not None and i < len(ivs) else None
            if i == cfg.num_layers - 1:
                penultimate = x
            x = CLIPEncoderLayer(cfg, i, name=f"layers_{i}")(
                x, causal, tap=tap, iv=iv)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="final_layer_norm")(x).astype(cfg.dtype)
        if return_penultimate:
            return x, penultimate
        return x
