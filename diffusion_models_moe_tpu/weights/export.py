"""Export framework param trees to diffusers-layout safetensors.

This is how baked (erased/pruned) checkpoints leave the framework in a form the
reference's ecosystem consumes — the analogue of the reference saving edited
`unet.state_dict()` checkpoints (reference: benchmarks/save_union_over_time.py:243-246).
Also the roundtrip partner of weights/port.py for structural tests.
"""
from __future__ import annotations

import numpy as np

from diffusion_models_moe_tpu.config import UNetConfig


def _linear(params, use_bias=True):
    out = {"weight": np.ascontiguousarray(np.asarray(params["kernel"]).T)}
    if use_bias and "bias" in params:
        out["bias"] = np.asarray(params["bias"])
    return out


def _conv(params):
    k = np.asarray(params["kernel"])     # (kh, kw, I, O)
    return {"weight": np.ascontiguousarray(np.transpose(k, (3, 2, 0, 1))),
            "bias": np.asarray(params["bias"])}


def _norm(params):
    return {"weight": np.asarray(params["scale"]),
            "bias": np.asarray(params["bias"])}


def _emit(sd, prefix, tensors):
    for name, v in tensors.items():
        sd[f"{prefix}.{name}"] = v


def _resnet(sd, p, params):
    _emit(sd, f"{p}.norm1", _norm(params["norm1"]))
    _emit(sd, f"{p}.conv1", _conv(params["conv1"]))
    _emit(sd, f"{p}.norm2", _norm(params["norm2"]))
    _emit(sd, f"{p}.conv2", _conv(params["conv2"]))
    if "time_emb_proj" in params:
        _emit(sd, f"{p}.time_emb_proj", _linear(params["time_emb_proj"]))
    if "conv_shortcut" in params:
        _emit(sd, f"{p}.conv_shortcut", _conv(params["conv_shortcut"]))


def _transformer2d(sd, p, params):
    _emit(sd, f"{p}.norm", _norm(params["norm"]))
    _emit(sd, f"{p}.proj_in", _linear(params["proj_in"]))
    _emit(sd, f"{p}.proj_out", _linear(params["proj_out"]))
    depth = sum(1 for k in params if k.startswith("transformer_blocks_"))
    for d in range(depth):
        b = f"{p}.transformer_blocks.{d}"
        blk = params[f"transformer_blocks_{d}"]
        for n in ("norm1", "norm2", "norm3"):
            _emit(sd, f"{b}.{n}", _norm(blk[n]))
        for attn in ("attn1", "attn2"):
            a = blk[attn]
            for proj in ("to_q", "to_k", "to_v"):
                _emit(sd, f"{b}.{attn}.{proj}", _linear(a[proj], use_bias=False))
            _emit(sd, f"{b}.{attn}.to_out.0", _linear(a["to_out"]))
        ff = blk["ff"]
        _emit(sd, f"{b}.ff.net.0.proj", _linear(ff["proj"]))
        sd[f"{b}.ff.net.2.weight"] = np.ascontiguousarray(
            np.asarray(ff["out_proj_kernel"]).T)
        sd[f"{b}.ff.net.2.bias"] = np.asarray(ff["out_proj_bias"])


def export_unet(params: dict, cfg: UNetConfig) -> dict[str, np.ndarray]:
    """UNet2DCondition params -> diffusers-named state dict (numpy)."""
    sd: dict[str, np.ndarray] = {}
    _emit(sd, "conv_in", _conv(params["conv_in"]))
    _emit(sd, "conv_out", _conv(params["conv_out"]))
    _emit(sd, "conv_norm_out", _norm(params["conv_norm_out"]))
    _emit(sd, "time_embedding.linear_1",
          _linear(params["time_embedding"]["linear_1"]))
    _emit(sd, "time_embedding.linear_2",
          _linear(params["time_embedding"]["linear_2"]))
    if "add_embedding" in params:
        _emit(sd, "add_embedding.linear_1",
              _linear(params["add_embedding"]["linear_1"]))
        _emit(sd, "add_embedding.linear_2",
              _linear(params["add_embedding"]["linear_2"]))
    if "time_cond_proj" in params:
        _emit(sd, "time_embedding.cond_proj",
              _linear(params["time_cond_proj"], use_bias=False))
    for i, kind in enumerate(cfg.down_block_types):
        for j in range(cfg.layers_per_block):
            _resnet(sd, f"down_blocks.{i}.resnets.{j}",
                    params[f"down_{i}_res_{j}"])
            if kind == "cross":
                _transformer2d(sd, f"down_blocks.{i}.attentions.{j}",
                               params[f"down_{i}_attn_{j}"])
        if i < len(cfg.down_block_types) - 1:
            _emit(sd, f"down_blocks.{i}.downsamplers.0.conv",
                  _conv(params[f"down_{i}_downsample"]["conv"]))
    _resnet(sd, "mid_block.resnets.0", params["mid_res_0"])
    _resnet(sd, "mid_block.resnets.1", params["mid_res_1"])
    _transformer2d(sd, "mid_block.attentions.0", params["mid_attn_0"])
    for i, kind in enumerate(cfg.up_block_types):
        for j in range(cfg.layers_per_block + 1):
            _resnet(sd, f"up_blocks.{i}.resnets.{j}", params[f"up_{i}_res_{j}"])
            if kind == "cross":
                _transformer2d(sd, f"up_blocks.{i}.attentions.{j}",
                               params[f"up_{i}_attn_{j}"])
        if i < len(cfg.up_block_types) - 1:
            _emit(sd, f"up_blocks.{i}.upsamplers.0.conv",
                  _conv(params[f"up_{i}_upsample"]["conv"]))
    return sd


def export_vae_decoder(params: dict, cfg) -> dict[str, np.ndarray]:
    """VAEDecoder params -> diffusers AutoencoderKL decoder-side state dict
    (the inverse of weights/port.py:port_vae_decoder; modern to_q/to_k/to_v
    attention naming). Lets full pipelines round-trip to diffusers layout, and
    anchors the torch-mirror golden test (tests/test_vae_torch_parity.py)."""
    sd: dict[str, np.ndarray] = {}
    _emit(sd, "post_quant_conv", _conv(params["post_quant_conv"]))
    _emit(sd, "decoder.conv_in", _conv(params["conv_in"]))
    _emit(sd, "decoder.conv_out", _conv(params["conv_out"]))
    _emit(sd, "decoder.conv_norm_out", _norm(params["conv_norm_out"]))
    _resnet(sd, "decoder.mid_block.resnets.0", params["mid"]["res_0"])
    _resnet(sd, "decoder.mid_block.resnets.1", params["mid"]["res_1"])
    a = params["mid"]["attn"]
    _emit(sd, "decoder.mid_block.attentions.0.group_norm",
          _norm(a["group_norm"]))
    for proj in ("to_q", "to_k", "to_v"):
        _emit(sd, f"decoder.mid_block.attentions.0.{proj}", _linear(a[proj]))
    _emit(sd, "decoder.mid_block.attentions.0.to_out.0", _linear(a["to_out"]))
    n_blocks = len(cfg.block_out_channels)
    for i in range(n_blocks):
        for j in range(cfg.layers_per_block + 1):
            _resnet(sd, f"decoder.up_blocks.{i}.resnets.{j}",
                    params[f"up_{i}_res_{j}"])
        if i < n_blocks - 1:
            _emit(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv",
                  _conv(params[f"up_{i}_upsample"]["conv"]))
    return sd


def export_vae_encoder(params: dict, cfg) -> dict[str, np.ndarray]:
    """VAEEncoder params -> diffusers AutoencoderKL encoder-side state dict
    (inverse of weights/port.py:port_vae_encoder)."""
    sd: dict[str, np.ndarray] = {}
    _emit(sd, "quant_conv", _conv(params["quant_conv"]))
    _emit(sd, "encoder.conv_in", _conv(params["conv_in"]))
    _emit(sd, "encoder.conv_out", _conv(params["conv_out"]))
    _emit(sd, "encoder.conv_norm_out", _norm(params["conv_norm_out"]))
    _resnet(sd, "encoder.mid_block.resnets.0", params["mid"]["res_0"])
    _resnet(sd, "encoder.mid_block.resnets.1", params["mid"]["res_1"])
    a = params["mid"]["attn"]
    _emit(sd, "encoder.mid_block.attentions.0.group_norm",
          _norm(a["group_norm"]))
    for proj in ("to_q", "to_k", "to_v"):
        _emit(sd, f"encoder.mid_block.attentions.0.{proj}", _linear(a[proj]))
    _emit(sd, "encoder.mid_block.attentions.0.to_out.0", _linear(a["to_out"]))
    n_blocks = len(cfg.block_out_channels)
    for i in range(n_blocks):
        for j in range(cfg.layers_per_block):
            _resnet(sd, f"encoder.down_blocks.{i}.resnets.{j}",
                    params[f"down_{i}_res_{j}"])
        if i < n_blocks - 1:
            _emit(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv",
                  _conv(params[f"down_{i}_downsample"]))
    return sd


def save_safetensors(sd: dict[str, np.ndarray], path: str) -> None:
    import os
    from safetensors.numpy import save_file
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, path)
