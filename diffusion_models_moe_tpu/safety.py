"""NSFW safety checking as an explicit, opt-in pipeline policy.

The reference ships with the diffusers safety checker ON and monkey-patches it
off in ~8 places to study NSFW concepts (reference: base_receiver.py:7-8,20-23,
benchmarks/eval_coco.py:19-23), plus a blur-if-nsfw output policy
(reference: modularity/remove_experts.py:17-22). Here the policy is explicit:

  * `CLIPNSFWChecker` — cosine similarity of CLIP image embeddings against
    unsafe-concept TEXT embeddings (built natively from the framework's own
    CLIP towers; no extra checker weights needed)
  * `apply_safety_policy` — blur (or zero) flagged images
  * `checked_generate` — wraps any pipeline's `generate`, honoring the
    PipelineConfig.safety_check / blur_nsfw flags
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# Unsafe concept phrases (the SLD safety-concept categories, split into
# per-phrase checker anchors; reference: sld pipeline safety concept string)
UNSAFE_CONCEPTS = (
    "nudity", "sexual content", "nsfw, explicit image",
    "violence, blood, gore", "hate symbols", "self-harm",
)


@dataclasses.dataclass
class CLIPNSFWChecker:
    """Flags images whose CLIP embedding is close to any unsafe concept.

    featurize: (B, H, W, 3) floats in [0, 1] -> (B, P) image embeddings
               (e.g. CLIPVisionEncoder.apply with ported weights)
    concept_embs: (C, P) L2-normalized unsafe-concept text embeddings
    threshold: cosine threshold (diffusers' checker uses per-concept learned
               thresholds around 0.2-0.3; a fixed 0.26 is the standard proxy)
    """
    featurize: Callable
    concept_embs: np.ndarray
    threshold: float = 0.26

    def __call__(self, images) -> np.ndarray:
        emb = np.asarray(self.featurize(images), np.float32)
        emb = emb / np.maximum(np.linalg.norm(emb, axis=-1, keepdims=True),
                               1e-12)
        c = np.asarray(self.concept_embs, np.float32)
        c = c / np.maximum(np.linalg.norm(c, axis=-1, keepdims=True), 1e-12)
        sims = emb @ c.T                                # (B, C)
        return (sims > self.threshold).any(axis=1)


def unsafe_concept_embeddings(text_encoder_apply: Callable,
                              tokenize: Callable,
                              concepts: Sequence[str] = UNSAFE_CONCEPTS,
                              text_projection=None) -> np.ndarray:
    """Build (C, P) pooled unsafe-concept embeddings with the framework's own
    text tower: encode each phrase, take the EOS-pooled hidden state (through
    the CLIP text projection when provided — required for comparing against
    vision-tower embeddings; identity otherwise)."""
    from diffusion_models_moe_tpu.benchmarks.clip_metrics import (
        pooled_text_embedding)
    ids = np.asarray(tokenize(list(concepts)))
    hidden = text_encoder_apply(jnp.asarray(ids))
    if text_projection is None:
        text_projection = jnp.eye(hidden.shape[-1], dtype=jnp.float32)
    return np.asarray(pooled_text_embedding(hidden, jnp.asarray(ids),
                                            jnp.asarray(text_projection)))


def apply_safety_policy(images: jax.Array, nsfw_flags: np.ndarray,
                        blur: bool = True, sigma: float = 7.0) -> jax.Array:
    """Blur (reference policy: remove_experts.py:17-22) or black out flagged
    images; unflagged images pass through bit-identical."""
    from diffusion_models_moe_tpu.pipelines.stable_diffusion import blur_images

    flags = jnp.asarray(np.asarray(nsfw_flags, bool))
    if not bool(np.any(np.asarray(nsfw_flags))):
        return images
    replaced = blur_images(images, sigma=sigma) if blur else jnp.zeros_like(
        images)
    return jnp.where(flags[:, None, None, None], replaced, images)


def checked_generate(pipe, params, cond_ids, uncond_ids, key, *,
                     checker: Optional[CLIPNSFWChecker] = None, **kw):
    """`pipe.generate` honoring PipelineConfig.safety_check / blur_nsfw.

    With safety_check=True a checker must be provided (matching the reference,
    where disabling the checker is the explicit deviation, not the default).
    Returns (images, taps, nsfw_flags)."""
    cfg = pipe.config
    images, taps = pipe.generate(params, cond_ids, uncond_ids, key, **kw)
    if not getattr(cfg, "safety_check", False):
        return images, taps, np.zeros((images.shape[0],), bool)
    if checker is None:
        raise ValueError(
            "PipelineConfig.safety_check=True requires a CLIPNSFWChecker "
            "(build one with unsafe_concept_embeddings + a CLIP vision "
            "featurizer)")
    flags = np.asarray(checker(images), bool)
    images = apply_safety_policy(images, flags,
                                 blur=getattr(cfg, "blur_nsfw", True))
    return images, taps, flags
