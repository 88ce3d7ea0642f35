"""Memorization evaluation: similarity of generations to memorized LAION images.

Protocol from the reference (benchmarks/inference_mem.py:46-83,117-168): for 500
memorized prompts, generate with/without erasure and measure (a) SSCD copy-detection
similarity against the LAION ground-truth image and (b) CLIP score against the prompt.

SSCD is an external torchscript judge in the reference; here the embedder is
injected (`embed(images) -> (B, D)` L2-normalized). The native CLIP vision tower is
the default embedder — a copy-detection proxy with the same cosine-similarity
aggregation — and a torchscript SSCD can be dropped in when available.
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np

Embedder = Callable[[np.ndarray], np.ndarray]


def load_sscd(path: str) -> Embedder:
    """Load a torchscript SSCD model (host-side judge) if available."""
    import torch

    model = torch.jit.load(path, map_location="cpu").eval()

    def embed(images: np.ndarray) -> np.ndarray:
        x = torch.from_numpy(np.asarray(images, np.float32)).permute(0, 3, 1, 2)
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        with torch.no_grad():
            emb = model((x - mean) / std).numpy()
        return emb / np.maximum(np.linalg.norm(emb, axis=-1, keepdims=True),
                                1e-12)

    return embed


def make_native_sscd(weights_path: str, batch: int = 32) -> Embedder:
    """NATIVE SSCD judge on TPU: ResNet-50 trunk + GeM(p=3) + projection from a
    torchscript/plain state dict (.pt via torch, or .npz of the same keys) —
    models/backbones.py:sscd_embed replaces the reference's host-side
    torchscript call (benchmarks/inference_mem.py:46-68)."""
    import jax
    import jax.numpy as jnp

    from diffusion_models_moe_tpu.models.backbones import (ResNetConfig,
                                                           preprocess_imagenet,
                                                           sscd_embed)
    from diffusion_models_moe_tpu.weights.port_torchvision import (
        load_state_dict, port_sscd)

    sd = load_state_dict(weights_path)
    cfg = ResNetConfig()
    params = port_sscd(sd, cfg)
    fwd = jax.jit(lambda p, x: sscd_embed(p, preprocess_imagenet(x), cfg))

    def embed(images: np.ndarray) -> np.ndarray:
        images = np.asarray(images, np.float32)
        outs = [np.asarray(jax.device_get(
            fwd(params, jnp.asarray(images[s:s + batch]))))
            for s in range(0, len(images), batch)]
        return np.concatenate(outs)

    return embed


def _l2n(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, np.float64)
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def similarity_matrix(emb_a: np.ndarray, emb_b: np.ndarray) -> np.ndarray:
    """Cosine similarity matrix (embeddings normalized defensively — SSCD
    outputs are unit-norm but injected featurizers may not be)."""
    return _l2n(emb_a) @ _l2n(emb_b).T


def memorization_scores(gen_embs: np.ndarray, gt_embs: np.ndarray) -> dict:
    """Pairwise generation-vs-ground-truth similarity stats
    (reference: benchmarks/inference_mem.py:46-68 measure_SSCD_similarity)."""
    sims = np.sum(_l2n(gen_embs) * _l2n(gt_embs), axis=-1)
    return {
        "mean_similarity": float(sims.mean()),
        "max_similarity": float(sims.max()),
        "frac_above_0.5": float((sims > 0.5).mean()),
        "per_prompt": sims.tolist(),
    }
