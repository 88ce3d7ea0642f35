"""Port HuggingFace SD1.x safetensors checkpoints into this framework's param trees.

The reference downloads pipelines from the Hub at runtime (reference: utils.py:64-138
`get_sd_model`); this environment has no network, so porting is offline: point these
converters at a local `diffusers`-layout snapshot directory
(unet/diffusion_pytorch_model.safetensors etc.) and get flax param pytrees.

Layout conversions: torch Linear (out, in) -> flax (in, out); torch Conv
(O, I, kh, kw) -> flax (kh, kw, I, O); NCHW -> NHWC handled by the models themselves.
"""
from __future__ import annotations

import os

import numpy as np

from diffusion_models_moe_tpu.config import (CLIPTextConfig, UNetConfig,
                                             VAEConfig)


def _load_safetensors(path: str) -> dict[str, np.ndarray]:
    from safetensors import safe_open
    out = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            out[k] = f.get_tensor(k)
    return out


def _linear(sd, prefix, use_bias=True):
    p = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if use_bias and f"{prefix}.bias" in sd:
        p["bias"] = sd[f"{prefix}.bias"]
    return p


def _conv(sd, prefix):
    w = sd[f"{prefix}.weight"]           # (O, I, kh, kw)
    return {"kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0))),
            "bias": sd[f"{prefix}.bias"]}


def _norm(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _resnet(sd, p):
    out = {"norm1": _norm(sd, f"{p}.norm1"), "conv1": _conv(sd, f"{p}.conv1"),
           "norm2": _norm(sd, f"{p}.norm2"), "conv2": _conv(sd, f"{p}.conv2")}
    if f"{p}.time_emb_proj.weight" in sd:
        out["time_emb_proj"] = _linear(sd, f"{p}.time_emb_proj")
    if f"{p}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, f"{p}.conv_shortcut")
    return out


def _attention(sd, p):
    out = {"to_q": _linear(sd, f"{p}.to_q", use_bias=False),
           "to_k": _linear(sd, f"{p}.to_k", use_bias=False),
           "to_v": _linear(sd, f"{p}.to_v", use_bias=False),
           "to_out": _linear(sd, f"{p}.to_out.0")}
    return out


def _transformer2d(sd, p, depth: int = 1):
    out = {
        "norm": _norm(sd, f"{p}.norm"),
        "proj_in": _linear(sd, f"{p}.proj_in"),
        "proj_out": _linear(sd, f"{p}.proj_out"),
    }
    for d in range(depth):
        b = f"{p}.transformer_blocks.{d}"
        out[f"transformer_blocks_{d}"] = {
            "norm1": _norm(sd, f"{b}.norm1"),
            "norm2": _norm(sd, f"{b}.norm2"),
            "norm3": _norm(sd, f"{b}.norm3"),
            "attn1": _attention(sd, f"{b}.attn1"),
            "attn2": _attention(sd, f"{b}.attn2"),
            "ff": {
                "proj": _linear(sd, f"{b}.ff.net.0.proj"),
                "out_proj_kernel": np.ascontiguousarray(
                    sd[f"{b}.ff.net.2.weight"].T),
                "out_proj_bias": sd[f"{b}.ff.net.2.bias"],
            },
        }
    return out


def port_unet(snapshot_dir: str, cfg: UNetConfig,
              overlay: dict | None = None) -> dict:
    """diffusers UNet2DConditionModel safetensors -> UNet2DCondition params.

    Requires 1x1 proj_in/out (SD1.x uses Linear there in modern diffusers; older
    conv1x1 checkpoints are squeezed). `overlay` patches individual torch-layout
    tensors over the snapshot before conversion — the Concept-Ablation
    delta.bin publishing format is a partial UNet state dict applied over the
    stock SD1.4 checkpoint (reference: benchmarks/i2p_eval.py:142-152)."""
    path = os.path.join(snapshot_dir, "diffusion_pytorch_model.safetensors")
    sd = _load_safetensors(path)
    if overlay:
        sd.update(overlay)
    return port_unet_state_dict(sd, cfg)


def port_unet_state_dict(sd: dict, cfg: UNetConfig) -> dict:
    """Flat torch-layout UNet state dict (diffusers key names) ->
    UNet2DCondition params. The entry point for edited-UNet baseline
    checkpoints — UCE/ESD publish whole-UNet state dicts loaded via
    `unet.load_state_dict(torch.load(path))` (reference:
    benchmarks/eval_coco.py:70-101, i2p_eval.py:134-168)."""
    sd = _squeeze_proj(sd)
    params: dict = {
        "conv_in": _conv(sd, "conv_in"),
        "conv_out": _conv(sd, "conv_out"),
        "conv_norm_out": _norm(sd, "conv_norm_out"),
        "time_embedding": {
            "linear_1": _linear(sd, "time_embedding.linear_1"),
            "linear_2": _linear(sd, "time_embedding.linear_2"),
        },
    }
    if "add_embedding.linear_1.weight" in sd:        # SDXL micro-conditioning
        params["add_embedding"] = {
            "linear_1": _linear(sd, "add_embedding.linear_1"),
            "linear_2": _linear(sd, "add_embedding.linear_2"),
        }
    if "time_embedding.cond_proj.weight" in sd:      # LCM guidance conditioning
        params["time_cond_proj"] = _linear(
            sd, "time_embedding.cond_proj", use_bias=False)
    n_blocks = len(cfg.block_out_channels)
    for i, kind in enumerate(cfg.down_block_types):
        for j in range(cfg.layers_per_block):
            params[f"down_{i}_res_{j}"] = _resnet(sd, f"down_blocks.{i}.resnets.{j}")
            if kind == "cross":
                params[f"down_{i}_attn_{j}"] = _transformer2d(
                    sd, f"down_blocks.{i}.attentions.{j}",
                    cfg.depth_for_block(i))
        if i < len(cfg.down_block_types) - 1:
            params[f"down_{i}_downsample"] = {
                "conv": _conv(sd, f"down_blocks.{i}.downsamplers.0.conv")}
    params["mid_res_0"] = _resnet(sd, "mid_block.resnets.0")
    params["mid_res_1"] = _resnet(sd, "mid_block.resnets.1")
    params["mid_attn_0"] = _transformer2d(sd, "mid_block.attentions.0",
                                          cfg.depth_for_block(n_blocks - 1))
    for i, kind in enumerate(cfg.up_block_types):
        for j in range(cfg.layers_per_block + 1):
            params[f"up_{i}_res_{j}"] = _resnet(sd, f"up_blocks.{i}.resnets.{j}")
            if kind == "cross":
                params[f"up_{i}_attn_{j}"] = _transformer2d(
                    sd, f"up_blocks.{i}.attentions.{j}",
                    cfg.depth_for_block(n_blocks - 1 - i))
        if i < len(cfg.up_block_types) - 1:
            params[f"up_{i}_upsample"] = {
                "conv": _conv(sd, f"up_blocks.{i}.upsamplers.0.conv")}
    return params


def _squeeze_proj(sd: dict) -> dict:
    """Old-layout checkpoints store Transformer2D proj_in/out as 1x1 convs;
    squeeze them to linears."""
    out = {}
    for k, v in sd.items():
        if (("proj_in.weight" in k or "proj_out.weight" in k)
                and v.ndim == 4):
            v = v[:, :, 0, 0]
        out[k] = v
    return out


def load_edited_unet_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load a published edited-UNet checkpoint file into a flat numpy state
    dict. Accepts the two formats the baselines publish in — torch-pickled
    `.pt`/`.bin` (UCE: 'erased-...-method_replace.pt', ESD:
    'diffusers-nudity-ESDu1-UNET.pt'; reference: benchmarks/eval_coco.py:70-81,
    i2p_eval.py:163-168) and `.safetensors`. fp16 tensors widen to fp32 (the
    models cast to their configured dtype at apply time); a uniform 'unet.'
    key prefix (some re-exports wrap the state dict) is stripped."""
    if path.endswith(".safetensors"):
        sd = _load_safetensors(path)
    else:
        import torch
        obj = torch.load(path, map_location="cpu", weights_only=True)
        if hasattr(obj, "state_dict"):
            obj = obj.state_dict()
        if not isinstance(obj, dict):
            raise ValueError(f"{path}: expected a state dict, got "
                             f"{type(obj).__name__}")
        # {'state_dict': {...}} wrappers (lightning-style exports)
        if "state_dict" in obj and isinstance(obj["state_dict"], dict):
            obj = obj["state_dict"]
        sd = {k: np.asarray(v.detach().to(torch.float32).cpu().numpy()
                            if hasattr(v, "detach") else v)
              for k, v in obj.items()}
    sd = {k: (v.astype(np.float32) if v.dtype == np.float16 else v)
          for k, v in sd.items()}
    if sd and all(k.startswith("unet.") for k in sd):
        sd = {k[len("unet."):]: v for k, v in sd.items()}
    return sd


def port_edited_unet(path: str, cfg: UNetConfig) -> dict:
    """Edited-UNet checkpoint file (UCE/ESD publishing format) ->
    UNet2DCondition params."""
    return port_unet_state_dict(load_edited_unet_state_dict(path), cfg)


def load_delta_bin(path: str) -> dict[str, dict[str, np.ndarray]]:
    """Load a Concept-Ablation delta.bin: {'unet': PARTIAL torch-layout UNet
    state dict, optional 'text_encoder': full CLIPTextModel state dict}
    (reference: benchmarks/i2p_eval.py:142-152 copies delta['unet'] entries
    over named_parameters and load_state_dict's delta['text_encoder'])."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=True)
    if not isinstance(obj, dict) or not ({"unet", "text_encoder"} & set(obj)):
        raise ValueError(f"{path}: expected a delta bundle with 'unet' "
                         "and/or 'text_encoder' sub-dicts")

    def to_np(d):
        return {k: np.asarray(v.detach().to(torch.float32).cpu().numpy()
                              if hasattr(v, "detach") else v, np.float32)
                for k, v in d.items()}
    return {k: to_np(v) for k, v in obj.items()
            if k in ("unet", "text_encoder")}


def validate_edited_unet(path: str, cfg: UNetConfig,
                         expected_keys: set[str] | None = None) -> dict:
    """Census an edited-UNet checkpoint BEFORE a long eval run: exact key diff
    against the expected diffusers UNet topology plus the same sentinel shape
    checks the snapshot doctor runs (cross_attention_dim / sample_channels
    disambiguate sd15 vs sd21 vs sdxl, whose key NAMES are identical).
    Returns a report dict; raises nothing — doctors report."""
    report: dict = {"path": path, "present": os.path.exists(path)}
    if not report["present"]:
        return report
    try:
        sd = load_edited_unet_state_dict(path)
    except Exception as e:  # noqa: BLE001 — doctor reports, not raises
        report["load_ok"] = False
        report["load_error"] = f"{type(e).__name__}: {str(e)[:200]}"
        return report
    report["load_ok"] = True
    report["n_tensors"] = len(sd)
    if expected_keys is not None:
        got = set(sd)
        report["missing_keys"] = sorted(expected_keys - got)
        report["unexpected_keys"] = sorted(got - expected_keys)
        report["keys_ok"] = not report["missing_keys"]
    checks = {}
    k = "down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.weight"
    if k in sd:
        checks["cross_attention_dim"] = {
            "got": int(sd[k].shape[1]), "expected": cfg.cross_attention_dim}
    if "conv_in.weight" in sd:
        checks["sample_channels"] = {
            "got": int(sd["conv_in.weight"].shape[1]),
            "expected": cfg.sample_channels}
        checks["block_out_channels[0]"] = {
            "got": int(sd["conv_in.weight"].shape[0]),
            "expected": cfg.block_out_channels[0]}
    report["shape_checks"] = checks
    report["shapes_ok"] = all(c["got"] == c["expected"]
                              for c in checks.values())
    return report


def port_clip_text(snapshot_dir: str, cfg: CLIPTextConfig) -> dict:
    """transformers CLIPTextModel safetensors -> CLIPTextEncoder params."""
    path = os.path.join(snapshot_dir, "model.safetensors")
    return port_clip_text_state_dict(_load_safetensors(path), cfg)


def port_clip_text_state_dict(sd: dict, cfg: CLIPTextConfig) -> dict:
    """Flat torch-layout CLIPTextModel state dict -> CLIPTextEncoder params
    (the Concept-Ablation delta.bin carries a whole text_encoder state dict —
    reference: benchmarks/i2p_eval.py:147-149)."""
    pre = "text_model."
    if not any(k.startswith(pre) for k in sd):
        pre = ""
    params = {
        "token_embedding": {
            "embedding": sd[f"{pre}embeddings.token_embedding.weight"]},
        "position_embedding":
            sd[f"{pre}embeddings.position_embedding.weight"],
        "final_layer_norm": _norm(sd, f"{pre}final_layer_norm"),
    }
    heads, hd = cfg.num_heads, cfg.hidden_size // cfg.num_heads

    def mha(p):
        def split_heads(w):   # (in, out) -> (in, heads, head_dim)
            return w.reshape(w.shape[0], heads, hd)

        out = {}
        for name in ("q", "k", "v"):
            lin = _linear(sd, f"{p}.{name}_proj")
            out[f"{name}uery" if name == "q" else
                "key" if name == "k" else "value"] = {
                "kernel": split_heads(lin["kernel"]),
                "bias": lin["bias"].reshape(heads, hd)}
        lin = _linear(sd, f"{p}.out_proj")
        out["out"] = {"kernel": lin["kernel"].reshape(heads, hd, -1),
                      "bias": lin["bias"]}
        return out

    for i in range(cfg.num_layers):
        lp = f"{pre}encoder.layers.{i}"
        fc2 = _linear(sd, f"{lp}.mlp.fc2")
        params[f"layers_{i}"] = {
            "layer_norm1": _norm(sd, f"{lp}.layer_norm1"),
            "layer_norm2": _norm(sd, f"{lp}.layer_norm2"),
            "self_attn": mha(f"{lp}.self_attn"),
            "mlp": {"fc1": _linear(sd, f"{lp}.mlp.fc1"),
                    "fc2_kernel": fc2["kernel"],
                    "fc2_bias": fc2["bias"]},
        }
    return params


def _vae_attention(sd, p):
    """Mid-block single-head attention; modern diffusers uses
    to_q/to_k/to_v/to_out.0, old checkpoints query/key/value/proj_attn
    (sometimes as 1x1 convs — squeezed here)."""
    if f"{p}.to_q.weight" in sd:
        names = ("to_q", "to_k", "to_v", "to_out.0")
    else:
        names = ("query", "key", "value", "proj_attn")

    def sq(prefix):
        w = sd[f"{prefix}.weight"]
        if w.ndim == 4:
            w = w[:, :, 0, 0]
        return {"kernel": np.ascontiguousarray(w.T),
                "bias": sd[f"{prefix}.bias"]}

    return {"group_norm": _norm(sd, f"{p}.group_norm"),
            "to_q": sq(f"{p}.{names[0]}"), "to_k": sq(f"{p}.{names[1]}"),
            "to_v": sq(f"{p}.{names[2]}"), "to_out": sq(f"{p}.{names[3]}")}


def _load_vae_sd(snapshot_dir: str) -> dict[str, np.ndarray]:
    return _load_safetensors(os.path.join(
        snapshot_dir, "diffusion_pytorch_model.safetensors"))


def port_vae_decoder(snapshot_dir: str, cfg: VAEConfig, *,
                     _sd: dict | None = None) -> dict:
    """diffusers AutoencoderKL safetensors -> VAEDecoder params."""
    sd = _load_vae_sd(snapshot_dir) if _sd is None else _sd
    attn = lambda p: _vae_attention(sd, p)  # noqa: E731

    dec = "decoder."
    params = {
        "post_quant_conv": _conv(sd, "post_quant_conv"),
        "conv_in": _conv(sd, f"{dec}conv_in"),
        "conv_out": _conv(sd, f"{dec}conv_out"),
        "conv_norm_out": _norm(sd, f"{dec}conv_norm_out"),
        "mid": {
            "res_0": _resnet(sd, f"{dec}mid_block.resnets.0"),
            "res_1": _resnet(sd, f"{dec}mid_block.resnets.1"),
            "attn": attn(f"{dec}mid_block.attentions.0"),
        },
    }
    n_blocks = len(cfg.block_out_channels)
    for i in range(n_blocks):
        for j in range(cfg.layers_per_block + 1):
            params[f"up_{i}_res_{j}"] = _resnet(
                sd, f"{dec}up_blocks.{i}.resnets.{j}")
        if i < n_blocks - 1:
            params[f"up_{i}_upsample"] = {
                "conv": _conv(sd, f"{dec}up_blocks.{i}.upsamplers.0.conv")}
    return params


def port_vae_encoder(snapshot_dir: str, cfg: VAEConfig, *,
                     _sd: dict | None = None) -> dict:
    """diffusers AutoencoderKL safetensors -> VAEEncoder params (the training
    path's vae.encode side; reference loads the full AutoencoderKL for
    fine-tuning, train_relufied_sd.py:640-675)."""
    sd = _load_vae_sd(snapshot_dir) if _sd is None else _sd
    enc = "encoder."
    params = {
        "quant_conv": _conv(sd, "quant_conv"),
        "conv_in": _conv(sd, f"{enc}conv_in"),
        "conv_out": _conv(sd, f"{enc}conv_out"),
        "conv_norm_out": _norm(sd, f"{enc}conv_norm_out"),
        "mid": {
            "res_0": _resnet(sd, f"{enc}mid_block.resnets.0"),
            "res_1": _resnet(sd, f"{enc}mid_block.resnets.1"),
            "attn": _vae_attention(sd, f"{enc}mid_block.attentions.0"),
        },
    }
    n_blocks = len(cfg.block_out_channels)
    for i in range(n_blocks):
        for j in range(cfg.layers_per_block):
            params[f"down_{i}_res_{j}"] = _resnet(
                sd, f"{enc}down_blocks.{i}.resnets.{j}")
        if i < n_blocks - 1:
            params[f"down_{i}_downsample"] = _conv(
                sd, f"{enc}down_blocks.{i}.downsamplers.0.conv")
    return params


def port_pipeline(snapshot_root: str, config,
                  include_vae_encoder: bool = False) -> dict:
    """Port a full SD snapshot: {root}/unet, {root}/text_encoder, {root}/vae.

    `include_vae_encoder=True` adds the 'vae_encoder' tree the training loop
    consumes (trainer.train_relufied raw-image batches)."""
    vae_dir = os.path.join(snapshot_root, "vae")
    vae_sd = _load_vae_sd(vae_dir)      # one read serves decoder and encoder
    out = {
        "unet": port_unet(os.path.join(snapshot_root, "unet"), config.unet),
        "text_encoder": port_clip_text(
            os.path.join(snapshot_root, "text_encoder"), config.text_encoder),
        "vae": port_vae_decoder(vae_dir, config.vae, _sd=vae_sd),
    }
    if include_vae_encoder:
        out["vae_encoder"] = port_vae_encoder(vae_dir, config.vae, _sd=vae_sd)
    return out


def port_sdxl_pipeline(snapshot_root: str, config,
                       text_configs: tuple) -> dict:
    """Port an SDXL snapshot for pipelines/sdxl.py:SDXLPipeline: dual text
    towers ({root}/text_encoder, {root}/text_encoder_2 — the second is a
    CLIPTextModelWithProjection whose text_projection feeds the pooled added
    conditioning), depth-stacked UNet, VAE."""
    tc1, tc2 = text_configs
    te2_dir = os.path.join(snapshot_root, "text_encoder_2")
    sd2 = _load_safetensors(os.path.join(te2_dir, "model.safetensors"))
    proj = sd2["text_projection.weight"]          # (proj_dim, hidden) torch
    return {
        "unet": port_unet(os.path.join(snapshot_root, "unet"), config.unet),
        "text_encoder": port_clip_text(
            os.path.join(snapshot_root, "text_encoder"), tc1),
        "text_encoder_2": port_clip_text(te2_dir, tc2),
        "text_projection_2": np.ascontiguousarray(proj.T),
        "vae": port_vae_decoder(os.path.join(snapshot_root, "vae"),
                                config.vae),
    }
