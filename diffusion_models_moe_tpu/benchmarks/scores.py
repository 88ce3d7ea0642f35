"""Directory-pair scoring: FID + LPIPS between baseline and removed image sets.

Rebuild of the reference's UCE-protocol scorer (reference:
benchmarks/calculate_scores.py:70-79): given two directories of generated images
(sd_*.png vs removed_*.png from the eval runner), compute FID with the native
CLIP-feature extractor and LPIPS either NATIVELY on TPU (load_native_lpips —
models/backbones.py AlexNet+heads with ported weights) or via an injected
perceptual embedder; CLIP-feature distance is the clearly-labeled fallback.
"""
from __future__ import annotations

import os
from typing import Callable, Optional, Sequence

import numpy as np

from diffusion_models_moe_tpu.benchmarks.fid import (FeatureStats,
                                                     frechet_distance)


def list_image_pairs(a_dir: str, b_dir: str, a_prefix: str = "sd_",
                     b_prefix: str = "removed_") -> list[tuple[str, str]]:
    pairs = []
    for f in sorted(os.listdir(a_dir)):
        if not f.startswith(a_prefix):
            continue
        mate = f.replace(a_prefix, b_prefix, 1)
        if os.path.exists(os.path.join(b_dir, mate)):
            pairs.append((os.path.join(a_dir, f), os.path.join(b_dir, mate)))
    return pairs


def load_images(paths: Sequence[str], size: Optional[int] = 224) -> np.ndarray:
    from PIL import Image
    out = []
    for p in paths:
        img = Image.open(p).convert("RGB")
        if size:
            img = img.resize((size, size))
        out.append(np.asarray(img, np.float32) / 255.0)
    return np.stack(out)


def fid_between_dirs(a_dir: str, b_dir: str, featurize: Callable,
                     batch: int = 32, **pair_kw) -> float:
    """Streaming FID over directory pairs with the given (B,H,W,3)->(B,D)
    featurizer (reference protocol: benchmarks/calculate_scores.py FID)."""
    pairs = list_image_pairs(a_dir, b_dir, **pair_kw)
    sa, sb = FeatureStats(), FeatureStats()
    for start in range(0, len(pairs), batch):
        chunk = pairs[start:start + batch]
        sa.update(np.asarray(featurize(load_images([a for a, _ in chunk]))))
        sb.update(np.asarray(featurize(load_images([b for _, b in chunk]))))
    return frechet_distance(*sa.finalize(), *sb.finalize())


def load_native_lpips(alexnet_path: str, lins_path: str) -> Callable:
    """NATIVE LPIPS on TPU (models/backbones.py:lpips_distance): AlexNet
    features + learned linear heads ported from torch state dicts
    (torchvision alexnet + the lpips package's lin weights) or .npz of the
    same keys. Replaces the host-side lpips package with an on-device metric;
    only the weight files stay external."""
    from diffusion_models_moe_tpu.models.backbones import make_lpips_fn
    from diffusion_models_moe_tpu.weights.port_torchvision import (
        load_state_dict, port_lpips)

    return make_lpips_fn(port_lpips(load_state_dict(alexnet_path),
                                    load_state_dict(lins_path)))


def load_lpips(net: str = "alex") -> Callable:
    """Torch LPIPS judge if the package + weights exist locally."""
    try:
        import lpips  # type: ignore
        import torch
    except ImportError as e:
        raise RuntimeError(
            "LPIPS is not available in this environment. Pass a custom "
            "perceptual distance fn(img_a, img_b) -> (B,) or use "
            "clip_perceptual_distance.") from e
    model = lpips.LPIPS(net=net)

    def dist(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        ta = torch.from_numpy(np.asarray(a, np.float32)).permute(0, 3, 1, 2)
        tb = torch.from_numpy(np.asarray(b, np.float32)).permute(0, 3, 1, 2)
        with torch.no_grad():
            return model(ta * 2 - 1, tb * 2 - 1).numpy().reshape(-1)

    dist.metric_name = f"lpips_{net}"
    return dist


def clip_perceptual_distance(featurize: Callable) -> Callable:
    """Built-in perceptual-distance fallback: 1 - cosine in CLIP feature space."""
    def dist(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        fa = np.asarray(featurize(a), np.float64)
        fb = np.asarray(featurize(b), np.float64)
        fa /= np.maximum(np.linalg.norm(fa, axis=-1, keepdims=True), 1e-12)
        fb /= np.maximum(np.linalg.norm(fb, axis=-1, keepdims=True), 1e-12)
        return 1.0 - np.sum(fa * fb, axis=-1)

    # NOT LPIPS: label the metric so downstream numbers can't be confused
    dist.metric_name = "clip_cosine_distance"
    return dist


def perceptual_between_dirs(a_dir: str, b_dir: str, dist: Callable,
                            batch: int = 16, **pair_kw) -> dict:
    pairs = list_image_pairs(a_dir, b_dir, **pair_kw)
    vals = []
    for start in range(0, len(pairs), batch):
        chunk = pairs[start:start + batch]
        vals.append(dist(load_images([a for a, _ in chunk]),
                         load_images([b for _, b in chunk])))
    vals = np.concatenate(vals) if vals else np.zeros(0)
    return {"metric": getattr(dist, "metric_name", "perceptual_distance"),
            "mean": float(vals.mean()) if vals.size else float("nan"),
            "n": int(vals.size)}
