"""Port HF Qwen2-VL checkpoints into the native judge models.

Handles both transformers state-dict layouts (published snapshots:
`visual.* / model.* / lm_head`; transformers >= 4.52 saves:
`model.visual.* / model.language_model.* / lm_head`) and sharded
safetensors via weights/port_llava.load_snapshot_state. The LM reuses
port_llama (Qwen2 = Llama + q/k/v biases; tied embeddings handled there).
Reference: the Qwen judge path, modularity/qwen_score.py:15-45.
"""
from __future__ import annotations

import numpy as np

from diffusion_models_moe_tpu.models.qwen2vl import (Qwen2VLConfig,
                                                     Qwen2VisionConfig)
from diffusion_models_moe_tpu.weights.port_llava import (_t,
                                                         load_snapshot_state,
                                                         port_llama)


def _normalize_keys(sd: dict) -> dict:
    """New nested layout -> published layout."""
    if not any(k.startswith("model.visual.") for k in sd):
        return sd
    out = {}
    for k, v in sd.items():
        if k.startswith("model.visual."):
            k = k[len("model."):]
        elif k.startswith("model.language_model."):
            k = "model." + k[len("model.language_model."):]
        out[k] = v
    return out


def port_qwen2_vision(sd: dict, cfg: Qwen2VisionConfig,
                      prefix: str = "visual.") -> dict:
    def lin(p):
        return {"kernel": _t(sd[f"{p}.weight"]),
                "bias": np.asarray(sd[f"{p}.bias"], np.float32)}

    def norm(p):
        return {"scale": np.asarray(sd[f"{p}.weight"], np.float32),
                "bias": np.asarray(sd[f"{p}.bias"], np.float32)}

    patch_w = np.asarray(sd[f"{prefix}patch_embed.proj.weight"], np.float32)
    params = {"patch_embed": {"kernel": np.ascontiguousarray(
        patch_w.reshape(patch_w.shape[0], -1).T)}}
    for i in range(cfg.depth):
        bp = f"{prefix}blocks.{i}"
        params[f"blocks_{i}"] = {
            "norm1": norm(f"{bp}.norm1"),
            "norm2": norm(f"{bp}.norm2"),
            "qkv": lin(f"{bp}.attn.qkv"),
            "proj": lin(f"{bp}.attn.proj"),
            "fc1": lin(f"{bp}.mlp.fc1"),
            "fc2": lin(f"{bp}.mlp.fc2"),
        }
    params["ln_q"] = norm(f"{prefix}merger.ln_q")
    params["mlp_0"] = lin(f"{prefix}merger.mlp.0")
    params["mlp_2"] = lin(f"{prefix}merger.mlp.2")
    return params


def port_qwen2vl_state(sd: dict, cfg: Qwen2VLConfig) -> dict:
    sd = _normalize_keys(sd)
    return {"vision": port_qwen2_vision(sd, cfg.vision),
            "language": port_llama(sd, cfg.text)}


def port_qwen2vl(snapshot_dir: str, cfg: Qwen2VLConfig | None = None) -> dict:
    cfg = cfg or Qwen2VLConfig()
    return port_qwen2vl_state(load_snapshot_state(snapshot_dir), cfg)


def qwen2vl_2b_config() -> Qwen2VLConfig:
    """Qwen/Qwen2-VL-2B-Instruct geometry (tied embeddings)."""
    from diffusion_models_moe_tpu.models.llama import LlamaConfig
    return Qwen2VLConfig(
        vision=Qwen2VisionConfig(hidden_size=1536),
        text=LlamaConfig(vocab_size=151936, hidden_size=1536,
                         intermediate_size=8960, num_layers=28, num_heads=12,
                         num_kv_heads=2, rope_theta=1e6, rms_eps=1e-6,
                         attention_bias=True, mrope_section=(16, 24, 24)))


def qwen2vl_7b_config() -> Qwen2VLConfig:
    """Qwen/Qwen2-VL-7B-Instruct geometry."""
    return Qwen2VLConfig()
