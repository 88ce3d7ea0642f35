"""Port HF LLaVA-1.5 / Llama checkpoints into the native judge models.

Covers three layouts:
  * `port_llama(sd, cfg, prefix)` — any LlamaForCausalLM state dict
    ("model.layers.N...." + "lm_head.weight")
  * `port_llava_state(sd, cfg)` — LlavaForConditionalGeneration
    ("language_model.model...", "vision_tower.vision_model...",
    "multi_modal_projector.linear_{1,2}")
  * `port_llava(snapshot_dir, cfg)` — sharded-safetensors snapshot front door
    (reads model.safetensors or the model.safetensors.index.json shards)

All Dense kernels transpose from torch (out, in) to JAX (in, out); attention
projections reshape to the flax MHA head layout used by clip_vision.
Reference: the LLAVAScorer judge loads this checkpoint through transformers
(modularity/llava_score.py:15-41).
"""
from __future__ import annotations

import json
import os

import numpy as np

from diffusion_models_moe_tpu.models.clip_vision import CLIPVisionConfig
from diffusion_models_moe_tpu.models.llama import LlamaConfig
from diffusion_models_moe_tpu.models.llava import LlavaConfig
from diffusion_models_moe_tpu.weights.port import _load_safetensors


def load_snapshot_state(snapshot_dir: str) -> dict[str, np.ndarray]:
    """model.safetensors, or every shard named by
    model.safetensors.index.json, merged into one state dict."""
    single = os.path.join(snapshot_dir, "model.safetensors")
    if os.path.exists(single):
        return _load_safetensors(single)
    index = os.path.join(snapshot_dir, "model.safetensors.index.json")
    if not os.path.exists(index):
        raise FileNotFoundError(f"no model.safetensors[.index.json] under "
                                f"{snapshot_dir}")
    with open(index) as f:
        shards = sorted(set(json.load(f)["weight_map"].values()))
    sd: dict[str, np.ndarray] = {}
    for shard in shards:
        sd.update(_load_safetensors(os.path.join(snapshot_dir, shard)))
    return sd


def _t(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w, np.float32).T)


def port_llama(sd: dict, cfg: LlamaConfig, prefix: str = "") -> dict:
    """State dict -> params for models/llama.py (incl. 'embed_tokens')."""
    p = prefix
    params: dict = {"embed_tokens":
                    np.asarray(sd[f"{p}model.embed_tokens.weight"],
                               np.float32),
                    "norm": {"weight": np.asarray(
                        sd[f"{p}model.norm.weight"], np.float32)}}
    lm_key = f"{p}lm_head.weight"
    if lm_key not in sd and "lm_head.weight" in sd:
        lm_key = "lm_head.weight"  # llava-hf keeps lm_head outside the prefix
    if lm_key in sd:
        params["lm_head"] = {"kernel": _t(sd[lm_key])}
    else:  # tied embeddings (e.g. Qwen2-VL-2B)
        params["lm_head"] = {"kernel": np.ascontiguousarray(
            params["embed_tokens"].T)}
    for i in range(cfg.num_layers):
        lp = f"{p}model.layers.{i}"

        def attn(name):
            out = {"kernel": _t(sd[f"{lp}.self_attn.{name}.weight"])}
            bias = f"{lp}.self_attn.{name}.bias"
            if bias in sd:  # Qwen2 puts biases on q/k/v
                out["bias"] = np.asarray(sd[bias], np.float32)
            return out

        params[f"layers_{i}"] = {
            "input_layernorm": {"weight": np.asarray(
                sd[f"{lp}.input_layernorm.weight"], np.float32)},
            "post_attention_layernorm": {"weight": np.asarray(
                sd[f"{lp}.post_attention_layernorm.weight"], np.float32)},
            "self_attn": {name: attn(name) for name in
                          ("q_proj", "k_proj", "v_proj", "o_proj")},
            "gate_proj": {"kernel": _t(sd[f"{lp}.mlp.gate_proj.weight"])},
            "up_proj": {"kernel": _t(sd[f"{lp}.mlp.up_proj.weight"])},
            "down_proj": {"kernel": _t(sd[f"{lp}.mlp.down_proj.weight"])},
        }
    return params


def port_vision_tower(sd: dict, cfg: CLIPVisionConfig,
                      prefix: str = "vision_tower.") -> dict:
    """CLIPVisionModel keys (no projection head — LLaVA takes hidden states)
    -> CLIPVisionEncoder params. `visual_projection` is absent; the encoder
    only reaches it when called without `feature_layer`, which then fails
    loudly on the missing param rather than silently projecting garbage."""
    pre = f"{prefix}vision_model."
    heads, hd = cfg.num_heads, cfg.hidden_size // cfg.num_heads

    def lin(p):
        return {"kernel": _t(sd[f"{p}.weight"]),
                "bias": np.asarray(sd[f"{p}.bias"], np.float32)}

    def norm(p):
        return {"scale": np.asarray(sd[f"{p}.weight"], np.float32),
                "bias": np.asarray(sd[f"{p}.bias"], np.float32)}

    def mha(p):
        out = {}
        for name, key in (("query", "q"), ("key", "k"), ("value", "v")):
            l = lin(f"{p}.{key}_proj")
            out[name] = {"kernel": l["kernel"].reshape(-1, heads, hd),
                         "bias": l["bias"].reshape(heads, hd)}
        l = lin(f"{p}.out_proj")
        out["out"] = {"kernel": l["kernel"].reshape(heads, hd, -1),
                      "bias": l["bias"]}
        return out

    patch_w = np.asarray(sd[f"{pre}embeddings.patch_embedding.weight"],
                         np.float32)
    params = {
        "patch_embedding": {"kernel": np.ascontiguousarray(
            np.transpose(patch_w, (2, 3, 1, 0)))},
        "class_embedding": np.asarray(
            sd[f"{pre}embeddings.class_embedding"], np.float32),
        "position_embedding": np.asarray(
            sd[f"{pre}embeddings.position_embedding.weight"], np.float32),
        "pre_layernorm": norm(f"{pre}pre_layrnorm"
                              if f"{pre}pre_layrnorm.weight" in sd
                              else f"{pre}pre_layernorm"),
    }
    for i in range(cfg.num_layers):
        lp = f"{pre}encoder.layers.{i}"
        if f"{lp}.layer_norm1.weight" not in sd:
            break  # llava-hf snapshots may drop the unused last layer
        params[f"layers_{i}"] = {
            "layer_norm1": norm(f"{lp}.layer_norm1"),
            "layer_norm2": norm(f"{lp}.layer_norm2"),
            "self_attn": mha(f"{lp}.self_attn"),
            "fc1": lin(f"{lp}.mlp.fc1"),
            "fc2": lin(f"{lp}.mlp.fc2"),
        }
    if f"{pre}post_layernorm.weight" in sd:
        params["post_layernorm"] = norm(f"{pre}post_layernorm")
    return params


def _normalize_llava_keys(sd: dict) -> dict:
    """transformers >= 4.52 nests everything under `model.` (state dicts say
    `model.language_model.layers...`); published llava-hf snapshots use the
    original `language_model.model.layers...` layout. Normalize to the
    published layout."""
    if not any(k.startswith("model.language_model.") for k in sd):
        return sd
    out = {}
    for k, v in sd.items():
        if k.startswith("model.language_model."):
            k = "language_model.model." + k[len("model.language_model."):]
        elif k.startswith("model.vision_tower."):
            k = k[len("model."):]
        elif k.startswith("model.multi_modal_projector."):
            k = k[len("model."):]
        out[k] = v
    return out


def port_llava_state(sd: dict, cfg: LlavaConfig) -> dict:
    """LlavaForConditionalGeneration state dict (either transformers layout)
    -> {vision, projector, language} param trees for models/llava.py."""
    sd = _normalize_llava_keys(sd)
    lm_prefix = ("language_model."
                 if any(k.startswith("language_model.") for k in sd) else "")
    proj = {}
    for i in (1, 2):
        proj[f"linear_{i}"] = {
            "kernel": _t(sd[f"multi_modal_projector.linear_{i}.weight"]),
            "bias": np.asarray(sd[f"multi_modal_projector.linear_{i}.bias"],
                               np.float32)}
    return {"vision": port_vision_tower(sd, cfg.vision),
            "projector": proj,
            "language": port_llama(sd, cfg.text, prefix=lm_prefix)}


def port_llava(snapshot_dir: str, cfg: LlavaConfig | None = None) -> dict:
    cfg = cfg or LlavaConfig()
    return port_llava_state(load_snapshot_state(snapshot_dir), cfg)


def llava_7b_config() -> LlavaConfig:
    """llava-hf/llava-1.5-7b-hf geometry."""
    return LlavaConfig(
        vision=CLIPVisionConfig(image_size=336, patch_size=14,
                                hidden_size=1024, intermediate_size=4096,
                                num_layers=24, num_heads=16),
        text=LlamaConfig())


def llava_13b_config() -> LlavaConfig:
    """llava-hf/llava-1.5-13b-hf geometry (the reference's judge)."""
    return LlavaConfig(
        vision=CLIPVisionConfig(image_size=336, patch_size=14,
                                hidden_size=1024, intermediate_size=4096,
                                num_layers=24, num_heads=16),
        text=LlamaConfig(hidden_size=5120, intermediate_size=13824,
                         num_layers=40, num_heads=40, num_kv_heads=40))
