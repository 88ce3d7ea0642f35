"""Port HF CLIP vision towers + projections into the native metric models."""
from __future__ import annotations

import os

import numpy as np

from diffusion_models_moe_tpu.models.clip_vision import CLIPVisionConfig
from diffusion_models_moe_tpu.weights.port import (_linear, _load_safetensors,
                                                   _norm)


def port_clip_vision(snapshot_dir: str, cfg: CLIPVisionConfig) -> dict:
    """CLIPVisionModelWithProjection (or full CLIPModel) safetensors ->
    CLIPVisionEncoder params."""
    path = os.path.join(snapshot_dir, "model.safetensors")
    sd = _load_safetensors(path)
    pre = "vision_model."
    if not any(k.startswith(pre) for k in sd):
        pre = "clip.vision_model." if any(
            k.startswith("clip.vision_model.") for k in sd) else pre
    heads, hd = cfg.num_heads, cfg.hidden_size // cfg.num_heads

    def mha(p):
        out = {}
        for name, key in (("query", "q"), ("key", "k"), ("value", "v")):
            lin = _linear(sd, f"{p}.{key}_proj")
            out[name] = {"kernel": lin["kernel"].reshape(-1, heads, hd),
                         "bias": lin["bias"].reshape(heads, hd)}
        lin = _linear(sd, f"{p}.out_proj")
        out["out"] = {"kernel": lin["kernel"].reshape(heads, hd, -1),
                      "bias": lin["bias"]}
        return out

    patch_w = sd[f"{pre}embeddings.patch_embedding.weight"]  # (D, 3, p, p)
    params = {
        "patch_embedding": {
            "kernel": np.ascontiguousarray(
                np.transpose(patch_w, (2, 3, 1, 0)))},
        "class_embedding": sd[f"{pre}embeddings.class_embedding"],
        "position_embedding":
            sd[f"{pre}embeddings.position_embedding.weight"],
        "pre_layernorm": _norm(sd, f"{pre}pre_layrnorm"
                               if f"{pre}pre_layrnorm.weight" in sd
                               else f"{pre}pre_layernorm"),
        "post_layernorm": _norm(sd, f"{pre}post_layernorm"),
        "visual_projection": {
            "kernel": np.ascontiguousarray(sd["visual_projection.weight"].T)},
    }
    for i in range(cfg.num_layers):
        lp = f"{pre}encoder.layers.{i}"
        params[f"layers_{i}"] = {
            "layer_norm1": _norm(sd, f"{lp}.layer_norm1"),
            "layer_norm2": _norm(sd, f"{lp}.layer_norm2"),
            "self_attn": mha(f"{lp}.self_attn"),
            "fc1": _linear(sd, f"{lp}.mlp.fc1"),
            "fc2": _linear(sd, f"{lp}.mlp.fc2"),
        }
    return params


def clip_b32_text_config():
    """Text-tower geometry of openai/clip-vit-base-patch32 (the reference's
    metric CLIP — benchmarks/artist_removal.py:176): 512-dim, 8 heads."""
    from diffusion_models_moe_tpu.config import CLIPTextConfig
    return CLIPTextConfig(hidden_size=512, intermediate_size=2048,
                          num_heads=8)


def port_clip_text_projection(snapshot_dir: str):
    """text_projection matrix of a full CLIPModel snapshot ((hidden, joint),
    ready for `pooled_text_embedding`), or None when the snapshot has only a
    vision tower."""
    sd = _load_safetensors(os.path.join(snapshot_dir, "model.safetensors"))
    for key in ("text_projection.weight", "clip.text_projection.weight"):
        if key in sd:
            return np.ascontiguousarray(sd[key].T)
    return None
