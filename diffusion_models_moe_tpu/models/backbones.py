"""Native judge backbones: ResNet-50 classifier, AlexNet features, LPIPS.

The reference delegates three judge roles to torch libraries: ResNet-50 top-k
classification of erased-object images (reference: benchmarks/object_erase.py:77-100,
benchmarks/save_union_over_time.py:264-276), SSCD copy-detection embeddings — a
ResNet-50 trunk with GeM pooling + projection (reference: benchmarks/inference_mem.py:46-68),
and LPIPS perceptual distance — AlexNet features + learned linear heads (reference:
benchmarks/calculate_scores.py:10,70-79). Here all three run natively on TPU as
functional JAX models; weights port from torchvision/LPIPS state dicts via
weights/port_torchvision.py, so the only host-side dependency left is the weight file.

Models are inference-only (frozen judges): batch norm applies running statistics,
there is no dropout, and params are plain nested dicts (porter output), not Flax
modules — judge weights are never trained here.

Layouts are TPU-native NHWC; porters transpose torch's OIHW/NCHW at load time.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Sequence

import jax
import jax.numpy as jnp

# torchvision ImageNet preprocessing (object_erase / SSCD protocols)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _conv(params: dict, x: jax.Array, stride: int = 1,
          padding: Any = "SAME") -> jax.Array:
    """NHWC conv with HWIO kernel (porter transposes torch's OIHW)."""
    out = jax.lax.conv_general_dilated(
        x, params["kernel"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "bias" in params:
        out = out + params["bias"].astype(x.dtype)
    return out


def _bn(params: dict, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Inference-mode batch norm with ported running statistics."""
    inv = jax.lax.rsqrt(params["var"].astype(jnp.float32) + eps)
    scale = (params["scale"].astype(jnp.float32) * inv).astype(x.dtype)
    bias = (params["bias"].astype(jnp.float32)
            - params["mean"].astype(jnp.float32)
            * params["scale"].astype(jnp.float32) * inv).astype(x.dtype)
    return x * scale + bias


def _max_pool(x: jax.Array, window: int, stride: int,
              padding: Any) -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1),
        (1, stride, stride, 1), padding)


# --------------------------------------------------------------------- ResNet
@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    """Bottleneck ResNet geometry (torchvision layout). resnet50 is the
    reference's judge; tiny configs keep parity tests cheap."""
    stage_blocks: Sequence[int] = (3, 4, 6, 3)
    stem_width: int = 64
    num_classes: int = 1000
    expansion: int = 4


def resnet50_config(num_classes: int = 1000) -> ResNetConfig:
    return ResNetConfig(num_classes=num_classes)


def tiny_resnet_config(num_classes: int = 7) -> ResNetConfig:
    return ResNetConfig(stage_blocks=(1, 1, 1, 1), stem_width=8,
                        num_classes=num_classes)


def _bottleneck(params: dict, x: jax.Array, stride: int) -> jax.Array:
    out = jax.nn.relu(_bn(params["bn1"], _conv(params["conv1"], x)))
    # conv2 is 3x3 pad 1: explicit pads — XLA's SAME pads (0,1) at stride 2,
    # torchvision pads (1,1); alignment must match the ported weights
    out = jax.nn.relu(_bn(params["bn2"],
                          _conv(params["conv2"], out, stride=stride,
                                padding=((1, 1), (1, 1)))))
    out = _bn(params["bn3"], _conv(params["conv3"], out))
    if "downsample" in params:
        x = _bn(params["downsample"]["bn"],
                _conv(params["downsample"]["conv"], x, stride=stride))
    return jax.nn.relu(out + x)


def resnet_features(params: dict, images: jax.Array,
                    cfg: ResNetConfig) -> jax.Array:
    """Trunk forward: (B, H, W, 3) normalized images -> (B, h, w, C) features
    before pooling (the SSCD trunk output; GeM pooling attaches here)."""
    x = _conv(params["conv1"], images, stride=2,
              padding=((3, 3), (3, 3)))
    x = jax.nn.relu(_bn(params["bn1"], x))
    x = _max_pool(x, 3, 2, ((0, 0), (1, 1), (1, 1), (0, 0)))
    for si, n_blocks in enumerate(cfg.stage_blocks):
        for bi in range(n_blocks):
            stride = 2 if (si > 0 and bi == 0) else 1
            x = _bottleneck(params[f"layer{si + 1}_{bi}"], x, stride)
    return x


def resnet_logits(params: dict, images: jax.Array,
                  cfg: ResNetConfig) -> jax.Array:
    """Classifier forward: global average pool + fc (torchvision semantics)."""
    feats = resnet_features(params, images, cfg)
    pooled = jnp.mean(feats, axis=(1, 2))
    return pooled @ params["fc"]["kernel"].astype(pooled.dtype) \
        + params["fc"]["bias"].astype(pooled.dtype)


def preprocess_imagenet(images: jax.Array) -> jax.Array:
    """(B, H, W, 3) in [0, 1] -> ImageNet-normalized."""
    mean = jnp.asarray(IMAGENET_MEAN, images.dtype)
    std = jnp.asarray(IMAGENET_STD, images.dtype)
    return (images - mean) / std


def gem_pool(feats: jax.Array, p: float = 3.0, eps: float = 1e-6) -> jax.Array:
    """Generalized-mean pooling (SSCD's head): (B,h,w,C) -> (B,C)."""
    x = jnp.clip(feats.astype(jnp.float32), eps, None) ** p
    return jnp.mean(x, axis=(1, 2)) ** (1.0 / p)


def sscd_embed(params: dict, images: jax.Array, cfg: ResNetConfig,
               p: float = 3.0) -> jax.Array:
    """SSCD copy-detection embedding: ResNet trunk -> GeM(p=3) -> linear
    projection -> L2 normalize (reference judge: benchmarks/inference_mem.py:46-68;
    SSCD = Descriptor from "A Self-Supervised Descriptor for Image Copy Detection").
    `params` needs the trunk keys plus `embeddings` {kernel[, bias]}."""
    pooled = gem_pool(resnet_features(params, images, cfg), p=p)
    emb = pooled @ params["embeddings"]["kernel"].astype(pooled.dtype)
    if "bias" in params["embeddings"]:
        emb = emb + params["embeddings"]["bias"].astype(pooled.dtype)
    return emb / jnp.maximum(
        jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)


# -------------------------------------------------------------------- AlexNet
@dataclasses.dataclass(frozen=True)
class AlexNetConfig:
    """torchvision AlexNet feature-extractor geometry (LPIPS 'alex' backbone).
    channels/kernels/strides/pads per conv stage; pools follow stages 0, 1, 4."""
    channels: Sequence[int] = (64, 192, 384, 256, 256)
    kernels: Sequence[int] = (11, 5, 3, 3, 3)
    strides: Sequence[int] = (4, 1, 1, 1, 1)
    pads: Sequence[int] = (2, 2, 1, 1, 1)


def tiny_alexnet_config() -> AlexNetConfig:
    return AlexNetConfig(channels=(4, 6, 8, 8, 8))


_ALEX_POOL_AFTER = (0, 1, 4)


def alexnet_features(params: dict, images: jax.Array,
                     cfg: AlexNetConfig = AlexNetConfig()) -> list[jax.Array]:
    """Returns the 5 post-ReLU stage outputs (LPIPS feature taps)."""
    x = images
    taps = []
    for i in range(len(cfg.channels)):
        pad = cfg.pads[i]
        x = jax.nn.relu(_conv(params[f"conv{i}"], x, stride=cfg.strides[i],
                              padding=((pad, pad), (pad, pad))))
        taps.append(x)
        if i in _ALEX_POOL_AFTER:
            x = _max_pool(x, 3, 2, "VALID")
    return taps


# ---------------------------------------------------------------------- LPIPS
# LPIPS input scaling layer constants (Zhang et al. 2018 reference impl).
LPIPS_SHIFT = (-0.030, -0.088, -0.188)
LPIPS_SCALE = (0.458, 0.448, 0.450)


def _unit_normalize(x: jax.Array, eps: float = 1e-10) -> jax.Array:
    norm = jnp.sqrt(jnp.sum(x.astype(jnp.float32) ** 2, axis=-1,
                            keepdims=True))
    return (x / jnp.maximum(norm, eps).astype(x.dtype))


def lpips_distance(params: dict, img_a: jax.Array, img_b: jax.Array,
                   cfg: AlexNetConfig = AlexNetConfig()) -> jax.Array:
    """LPIPS(a, b) for (B, H, W, 3) images in [-1, 1].

    Per tap: channel-unit-normalize both activations, squared difference,
    weight by the learned per-channel head (`lins[i]`, shape (C,)), spatial
    mean, sum over taps. `params` = {"net": alexnet params, "lins": [(C,)...]}."""
    shift = jnp.asarray(LPIPS_SHIFT, img_a.dtype)
    scale = jnp.asarray(LPIPS_SCALE, img_a.dtype)
    fa = alexnet_features(params["net"], (img_a - shift) / scale, cfg)
    fb = alexnet_features(params["net"], (img_b - shift) / scale, cfg)
    total = jnp.zeros(img_a.shape[0], jnp.float32)
    for i, (a, b) in enumerate(zip(fa, fb)):
        diff = (_unit_normalize(a) - _unit_normalize(b)).astype(jnp.float32) ** 2
        w = params["lins"][i].astype(jnp.float32)
        total = total + jnp.mean(jnp.sum(diff * w, axis=-1), axis=(1, 2))
    return total


@functools.partial(jax.jit, static_argnames=("cfg",))
def _lpips_jit(params, a, b, cfg):
    return lpips_distance(params, a, b, cfg)


def make_lpips_fn(params: dict, cfg: AlexNetConfig = AlexNetConfig()):
    """(B,H,W,3) float [0,1] numpy pairs -> (B,) LPIPS, jitted on device.
    Plugs into benchmarks.scores.perceptual_between_dirs."""
    import numpy as np

    def dist(a, b):
        a = jnp.asarray(np.asarray(a, np.float32)) * 2.0 - 1.0
        b = jnp.asarray(np.asarray(b, np.float32)) * 2.0 - 1.0
        return np.asarray(jax.device_get(_lpips_jit(params, a, b, cfg)))

    dist.metric_name = "lpips_alex_native"
    return dist
