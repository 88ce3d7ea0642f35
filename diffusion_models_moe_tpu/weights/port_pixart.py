"""Port PixArt-alpha checkpoints (diffusers layout) into this framework.

The reference loads `PixArtAlphaPipeline.from_pretrained(...)` from the Hub
(reference: utils.py:119-127); this environment has no network, so porting is
offline from a local snapshot:

  snapshot/
    transformer/diffusion_pytorch_model.safetensors   (PixArtTransformer2DModel)
    text_encoder/model*.safetensors                   (T5EncoderModel, t5-v1_1-xxl)
    vae/diffusion_pytorch_model.safetensors           (reuse weights/port.py VAE)

Layout notes:
  * torch Linear (out, in) -> flax kernel (in, out)
  * the patch embed is a p-stride conv in diffusers; here a Dense over the
    (p, p, C)-flattened patch — the conv kernel reshapes exactly
  * diffusers' PixArt pos_embed is a FIXED 2D sincos buffer (not in the
    state dict); `sincos_pos_embed` regenerates it for our learned param slot
  * T5: block 0 owns relative_attention_bias; every block reuses it (same as
    models/t5.py, which hoists the bias to the encoder top level)
"""
from __future__ import annotations

import os

import numpy as np

from diffusion_models_moe_tpu.models.pixart import PixArtConfig
from diffusion_models_moe_tpu.models.t5 import T5Config
from diffusion_models_moe_tpu.weights.port import (_linear, _load_safetensors,
                                                   _norm)


def _load_sharded(dirpath: str, filename_prefix: str) -> dict[str, np.ndarray]:
    """Load one .safetensors file or all shards matching the prefix."""
    files = sorted(f for f in os.listdir(dirpath)
                   if f.startswith(filename_prefix)
                   and f.endswith(".safetensors"))
    out: dict[str, np.ndarray] = {}
    for f in files:
        out.update(_load_safetensors(os.path.join(dirpath, f)))
    if not out:
        raise FileNotFoundError(
            f"no {filename_prefix}*.safetensors under {dirpath}")
    return out


# ----------------------------------------------------------------------- T5
def port_t5_encoder(snapshot_dir: str, cfg: T5Config) -> dict:
    """text_encoder/ snapshot -> T5Encoder param tree."""
    sd = _load_sharded(os.path.join(snapshot_dir, "text_encoder"), "model")
    # transformers may prefix encoder-only exports with nothing or "encoder."
    emb_key = "shared.weight"
    if emb_key not in sd and "encoder.embed_tokens.weight" in sd:
        emb_key = "encoder.embed_tokens.weight"
    params: dict = {
        "token_embedding": sd[emb_key],
        "relative_attention_bias": sd[
            "encoder.block.0.layer.0.SelfAttention"
            ".relative_attention_bias.weight"],
        "final_norm": {"weight": sd["encoder.final_layer_norm.weight"]},
    }
    for i in range(cfg.num_layers):
        p = f"encoder.block.{i}"
        sa = f"{p}.layer.0.SelfAttention"
        ff = f"{p}.layer.1.DenseReluDense"
        params[f"block_{i}"] = {
            "attn_norm": {"weight": sd[f"{p}.layer.0.layer_norm.weight"]},
            "attn": {
                "q": _linear(sd, f"{sa}.q", use_bias=False),
                "k": _linear(sd, f"{sa}.k", use_bias=False),
                "v": _linear(sd, f"{sa}.v", use_bias=False),
                "o": _linear(sd, f"{sa}.o", use_bias=False),
            },
            "ff_norm": {"weight": sd[f"{p}.layer.1.layer_norm.weight"]},
            "wi_0": _linear(sd, f"{ff}.wi_0", use_bias=False),
            "wi_1": _linear(sd, f"{ff}.wi_1", use_bias=False),
            "wo": _linear(sd, f"{ff}.wo", use_bias=False),
        }
    return params


# --------------------------------------------------------------------- DiT
def sincos_pos_embed(dim: int, grid_h: int, grid_w: int,
                     base_size: int = 0) -> np.ndarray:
    """diffusers get_2d_sincos_pos_embed (interpolation_scale=1): (S, dim)."""
    def one_dim(d, pos):
        omega = 1.0 / 10000 ** (np.arange(d // 2, dtype=np.float64) / (d / 2))
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    gh = np.arange(grid_h, dtype=np.float64)
    gw = np.arange(grid_w, dtype=np.float64)
    if base_size:
        gh = gh / (grid_h / base_size)
        gw = gw / (grid_w / base_size)
    grid = np.meshgrid(gw, gh)  # w goes first (diffusers convention)
    emb_h = one_dim(dim // 2, np.stack(grid)[1])
    emb_w = one_dim(dim // 2, np.stack(grid)[0])
    return np.concatenate([emb_h, emb_w], axis=1).astype(np.float32)


def port_pixart_transformer(snapshot_dir: str, cfg: PixArtConfig,
                            sample_size: int = 64) -> dict:
    """transformer/ snapshot -> PixArtTransformer2D param tree."""
    sd = _load_sharded(os.path.join(snapshot_dir, "transformer"),
                       "diffusion_pytorch_model")
    p = cfg.patch_size
    # patchify conv (D, C, p, p) -> dense ((p, p, C) flat, D)
    w = sd["pos_embed.proj.weight"]
    patch_kernel = np.transpose(w, (2, 3, 1, 0)).reshape(-1, cfg.hidden_size)
    grid = sample_size // p
    params: dict = {
        "patch_embed": {"kernel": np.ascontiguousarray(patch_kernel),
                        "bias": sd["pos_embed.proj.bias"]},
        "pos_embed": sincos_pos_embed(cfg.hidden_size, grid, grid,
                                      base_size=grid),
        "time_embedding": {
            "linear_1": _linear(sd, "adaln_single.emb.timestep_embedder"
                                    ".linear_1"),
            "linear_2": _linear(sd, "adaln_single.emb.timestep_embedder"
                                    ".linear_2"),
        },
        "adaln_single": _linear(sd, "adaln_single.linear"),
        "caption_linear_1": _linear(sd, "caption_projection.linear_1"),
        "caption_linear_2": _linear(sd, "caption_projection.linear_2"),
        "final_scale_shift": sd["scale_shift_table"],
        "proj_out": _linear(sd, "proj_out"),
    }
    for i in range(cfg.num_layers):
        b = f"transformer_blocks.{i}"

        def attn(prefix):
            out = {
                "to_q": _linear(sd, f"{prefix}.to_q"),
                "to_k": _linear(sd, f"{prefix}.to_k"),
                "to_v": _linear(sd, f"{prefix}.to_v"),
                "to_out": _linear(sd, f"{prefix}.to_out.0"),
            }
            return out

        params[f"blocks_{i}"] = {
            "scale_shift_table": sd[f"{b}.scale_shift_table"],
            "attn1": attn(f"{b}.attn1"),
            "attn2": attn(f"{b}.attn2"),
            "ff": {
                "proj": _linear(sd, f"{b}.ff.net.0.proj"),
                "out_proj_kernel": np.ascontiguousarray(
                    sd[f"{b}.ff.net.2.weight"].T),
                "out_proj_bias": sd[f"{b}.ff.net.2.bias"],
            },
        }
    return params


def port_pixart_pipeline(snapshot_root: str, config) -> dict:
    """Full PixArt snapshot -> {"transformer", "text_encoder", "vae"}."""
    from diffusion_models_moe_tpu.weights.port import port_vae_decoder
    return {
        "transformer": port_pixart_transformer(
            snapshot_root, config.transformer, config.sample_size),
        "text_encoder": port_t5_encoder(snapshot_root, config.text_encoder),
        # port_vae_decoder expects the vae/ subdirectory (it joins the
        # safetensors filename itself), mirroring the SD snapshot layout
        "vae": port_vae_decoder(os.path.join(snapshot_root, "vae"),
                                config.vae),
    }
