"""CLIP vision tower (ViT) + projection heads — the framework's quantitative judge.

The reference leans on external CLIP checkpoints for most metrics: CLIP score,
image-image similarity, zero-shot gender/concept classification, CLIP-feature FID
(reference: modularity/clip_score.py:51-140, benchmarks/artist_removal.py:59-70,
benchmarks/ratio-gender.py:10-60, sparsity/eval_coco.py:18-37). Here the vision tower
is native Flax so all metric batches run on TPU; weights port from any HF CLIP
checkpoint via weights/port_clip_vision.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffusion_models_moe_tpu.models.clip_text import quick_gelu

# OpenAI CLIP preprocessing constants
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 24
    num_heads: int = 16
    projection_dim: int = 768
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.float32


def tiny_vision_config() -> CLIPVisionConfig:
    return CLIPVisionConfig(image_size=32, patch_size=8, hidden_size=32,
                            intermediate_size=64, num_layers=2, num_heads=4,
                            projection_dim=16)


class _VisionBlock(nn.Module):
    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="layer_norm1")(x).astype(cfg.dtype)
        x = x + nn.MultiHeadDotProductAttention(
            num_heads=cfg.num_heads, dtype=cfg.dtype, deterministic=True,
            name="self_attn")(h)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="layer_norm2")(x).astype(cfg.dtype)
        h = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype, name="fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="fc2")(h)
        return x + h


class CLIPVisionEncoder(nn.Module):
    """images (B, H, W, 3) in [0, 1] -> projected, L2-normalized embeddings (B, P).

    `feature_layer` (e.g. -2 for LLaVA's penultimate-layer patch features)
    instead returns the (B, 1+P, hidden) hidden states after running
    `num_layers + feature_layer + 1` blocks — HF's
    `hidden_states[feature_layer]` indexing, where -1 is the full stack — with
    no post-layernorm and no projection. CLS stays at token 0 (LLaVA's
    'default' select strategy drops it caller-side)."""
    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, images: jax.Array, normalize: bool = True,
                 feature_layer: int | None = None) -> jax.Array:
        cfg = self.cfg
        x = (images - jnp.asarray(CLIP_IMAGE_MEAN)) / jnp.asarray(CLIP_IMAGE_STD)
        x = x.astype(cfg.dtype)
        patches = nn.Conv(cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
                          strides=(cfg.patch_size, cfg.patch_size),
                          use_bias=False, dtype=cfg.dtype,
                          name="patch_embedding")(x)
        b = patches.shape[0]
        patches = patches.reshape(b, -1, cfg.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.hidden_size,), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(cfg.dtype), (b, 1, cfg.hidden_size)),
             patches], axis=1)
        n_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (n_pos, cfg.hidden_size), jnp.float32)
        x = x + pos[None].astype(cfg.dtype)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="pre_layernorm")(x).astype(cfg.dtype)
        n_blocks = cfg.num_layers
        if feature_layer is not None:
            # HF hidden_states[f]: index 0 is the embeddings, index f>0 the
            # output of block f-1 — so run f blocks for f >= 0
            n_blocks = (feature_layer if feature_layer >= 0
                        else cfg.num_layers + feature_layer + 1)
            if not 0 <= n_blocks <= cfg.num_layers:
                raise ValueError(f"feature_layer {feature_layer} out of range "
                                 f"for {cfg.num_layers} layers")
        for i in range(n_blocks):
            x = _VisionBlock(cfg, name=f"layers_{i}")(x)
        if feature_layer is not None:
            return x
        pooled = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                              name="post_layernorm")(x[:, 0])
        emb = nn.Dense(cfg.projection_dim, use_bias=False, dtype=jnp.float32,
                       name="visual_projection")(pooled)
        if normalize:
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
        return emb


def resize_for_clip(images: jax.Array, image_size: int = 224) -> jax.Array:
    """Bilinear resize (B, H, W, 3) -> CLIP input size."""
    b = images.shape[0]
    return jax.image.resize(images, (b, image_size, image_size, 3), "bilinear")
