"""Frechet Inception/CLIP Distance on-device.

The reference computes FID with torchmetrics (InceptionV3 features;
benchmarks/eval_coco.py:16,25-29) and a CLIP-feature variant for the sparsity path
(reference: sparsity/eval_coco.py:18-37,41-70). Here FID is a pure function over
feature batches; the default feature extractor is the native CLIP vision tower, so the
whole generate->featurize->FID loop stays on TPU. Gaussian statistics accumulate
streamingly, so 30k-image protocols never hold features in host memory.
"""
from __future__ import annotations

import dataclasses
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg


@dataclasses.dataclass
class FeatureStats:
    """Streaming mean/covariance accumulator for one image distribution."""
    n: int = 0
    sum: np.ndarray | None = None
    outer: np.ndarray | None = None

    def update(self, feats: np.ndarray) -> None:
        feats = np.asarray(feats, np.float64)
        if self.sum is None:
            d = feats.shape[-1]
            self.sum = np.zeros(d)
            self.outer = np.zeros((d, d))
        self.n += feats.shape[0]
        self.sum += feats.sum(0)
        self.outer += feats.T @ feats

    def finalize(self) -> tuple[np.ndarray, np.ndarray]:
        mu = self.sum / self.n
        cov = (self.outer - self.n * np.outer(mu, mu)) / max(self.n - 1, 1)
        return mu, cov


def frechet_distance(mu1, cov1, mu2, cov2, eps: float = 1e-6) -> float:
    """FD = |mu1-mu2|^2 + tr(C1 + C2 - 2 sqrt(C1 C2))."""
    diff = mu1 - mu2
    with warnings.catch_warnings():
        # scipy warns (LinAlgWarning) on singular products before we get a
        # chance to apply the standard eps-offset retry below; silence only
        # that category — anything else should still surface
        warnings.simplefilter("ignore", scipy.linalg.LinAlgWarning)
        covmean = scipy.linalg.sqrtm(cov1 @ cov2)
    if not np.isfinite(covmean).all():
        offset = np.eye(cov1.shape[0]) * eps
        covmean = scipy.linalg.sqrtm((cov1 + offset) @ (cov2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(cov1) + np.trace(cov2)
                 - 2.0 * np.trace(covmean))


def fid_from_features(real: np.ndarray, fake: np.ndarray) -> float:
    a, b = FeatureStats(), FeatureStats()
    a.update(real)
    b.update(fake)
    return frechet_distance(*a.finalize(), *b.finalize())


def make_inception_featurizer(params, cfg=None):
    """Jitted (B, H, W, 3) [0,1] -> (B, 2048) pool features with the NATIVE
    FID InceptionV3 (models/inception.py) — the reference's actual FID
    feature space (torchmetrics InceptionV3, benchmarks/eval_coco.py:16,25-29).
    `params` from weights/port_torchvision.py:port_inception."""
    from diffusion_models_moe_tpu.models.inception import (InceptionConfig,
                                                           inception_pool_features,
                                                           preprocess_fid)
    cfg = cfg or InceptionConfig()

    @jax.jit
    def featurize(images):
        return inception_pool_features(params, preprocess_fid(images), cfg)

    return featurize


def load_inception_featurizer(weights_path: str):
    """make_inception_featurizer from a torchvision/torch-fidelity state dict
    on disk (.pt/.pth via torch, or .npz of the same keys)."""
    from diffusion_models_moe_tpu.weights.port_torchvision import (
        load_state_dict, port_inception)
    return make_inception_featurizer(port_inception(
        load_state_dict(weights_path)))


def make_clip_text_featurizer(text_encoder, text_params, tokenize,
                              text_projection=None):
    """prompts -> (N, D) CLIP text embeddings in the joint space of the
    matching `make_clip_featurizer` vision tower (used by the artist-removal
    accuracy: cos(text, orig) > cos(text, removed); reference:
    benchmarks/artist_removal.py:180-199). `text_projection` is the full CLIP
    model's text_projection matrix (port_clip_text_projection); without it the
    pooled hidden state is returned, which is only meaningful against a vision
    tower in the same (unprojected) space."""
    from diffusion_models_moe_tpu.benchmarks.clip_metrics import (
        pooled_text_embedding)

    def featurize(prompts):
        ids = jnp.asarray(np.asarray(tokenize(list(prompts))))
        hidden = text_encoder.apply({"params": text_params}, ids)
        if isinstance(hidden, tuple):
            hidden = hidden[0]
        proj = (jnp.asarray(text_projection) if text_projection is not None
                else jnp.eye(hidden.shape[-1], dtype=hidden.dtype))
        return np.asarray(jax.device_get(
            pooled_text_embedding(hidden.astype(jnp.float32), ids, proj)))

    return featurize


def make_clip_featurizer(vision_encoder, vision_params):
    """Jitted (B, H, W, 3)->features fn using the native CLIP tower
    (the CLIP-feature FID variant, reference: sparsity/eval_coco.py:18-37)."""
    from diffusion_models_moe_tpu.models.clip_vision import resize_for_clip

    @jax.jit
    def featurize(images):
        images = resize_for_clip(images, vision_encoder.cfg.image_size)
        return vision_encoder.apply({"params": vision_params}, images,
                                    normalize=False)

    return featurize
