"""Typed model/pipeline configuration.

Replaces the reference's YAML+attr `Config` (reference: utils.py:153-227) with frozen
dataclasses. Presets mirror the models the reference's factory loads
(reference: utils.py:64-138): SD v1.x UNet/CLIP/VAE shapes, plus a tiny config for tests.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """SD-style UNet2DCondition configuration.

    `down_block_types` / `up_block_types` entries are "cross" (resnets + transformer
    blocks) or "plain" (resnets only), mirroring diffusers' CrossAttnDownBlock2D /
    DownBlock2D split for SD1.x.
    """
    sample_channels: int = 4
    out_channels: int = 4
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    down_block_types: Sequence[str] = ("cross", "cross", "cross", "plain")
    up_block_types: Sequence[str] = ("plain", "cross", "cross", "cross")
    layers_per_block: int = 2
    # transformer blocks per attention layer: int or per-block tuple
    # (SD1.x: 1; SDXL: (0, 2, 10) with 0 = plain block)
    transformer_layers_per_block: Any = 1
    cross_attention_dim: int = 768
    # Number of attention heads: one int for all blocks (SD1.x: 8) or a
    # per-block tuple (SD2.x: (5, 10, 20, 20) -> 64-dim heads).
    attention_head_dim: Any = 8
    norm_num_groups: int = 32
    ff_mult: int = 4
    ff_activation: str = "geglu"         # "geglu" | "geglu-relu" (ReLUfied) | "gelu"
    # Pallas routing kernel (ops/routing_kernel.py). Exact-parity verified on TPU,
    # but measured ~30% slower than XLA's fused top_k routing at SD shapes (the
    # O(E^2) rank-count dominates); default off until the full-FFN fusion lands.
    use_fused_routing: bool = False
    # Pallas flash attention for long self-attention (TPU only; exact math within
    # bf16 tolerance). Profiling the full UNet showed XLA materializes the f32
    # (B, heads, S, S) score tensor in HBM (2.1GB at b16/s4096) making attention
    # 67% of the step and HBM-bound; the flash kernel keeps scores in VMEM.
    # (A standalone XLA-attention microbenchmark is misleading: 9.7ms in
    # isolation vs 34.7ms in-graph.)
    flash_attention: bool = True
    # LCM guidance-scale conditioning width (0 = disabled; LCM models use 256)
    time_cond_proj_dim: int = 0
    # rematerialize blocks in backward (training memory for FLOPs); ignored on
    # tapped/intervened forwards
    remat: bool = False
    # normalization statistics in compute dtype instead of f32 (throughput A/B;
    # keep False for fidelity-critical runs)
    fast_norm: bool = False
    # int8 W8A8 quantized serving (ops/quant.py): UNet convs (except
    # conv_in/conv_out), attention projections, and GEGLU FF dots run on the
    # MXU's 2x int8 path. OPT-IN — outputs differ from bf16; the reference has
    # no quantized path (SURVEY.md §0). Param tree is unchanged (dynamic
    # quantization; weight quantize is hoisted out of the denoise scan by XLA).
    quant_int8: bool = False
    # Winograd F(2x2, 3x3) for the UNet's stride-1 3x3 convs (ops/winograd.py):
    # 2.25x fewer MXU flops on the conv path (55% of the denoise step,
    # docs/profiling.md). OPT-IN serving mode — outputs differ from the direct
    # conv at bf16 rounding scale. Param tree unchanged (filter transform is
    # loop-invariant; XLA hoists it out of the scan). Combined with
    # quant_int8, Winograd takes the stride-1 3x3 convs and int8 the rest of
    # the convs plus all dots.
    conv_winograd: bool = False
    # SDXL additional conditioning: pooled text embedding width (0 = disabled)
    addition_embed_dim: int = 0
    # SDXL micro-conditioning time_ids count (6 for SDXL)
    addition_time_embed_dim: int = 0
    flip_sin_to_cos: bool = True
    freq_shift: int = 0
    dtype: Any = jnp.float32             # compute dtype

    def depth_for_block(self, block_idx: int) -> int:
        d = self.transformer_layers_per_block
        return d if isinstance(d, int) else d[block_idx]

    @property
    def n_ff_layers(self) -> int:
        """Number of GEGLU FF layers (16 for SD1.x; reference: moefication/helper.py:6-19)."""
        n = 0
        for i, kind in enumerate(self.down_block_types):
            if kind == "cross":
                n += self.layers_per_block * self.depth_for_block(i)
        n += self.depth_for_block(len(self.block_out_channels) - 1)  # mid
        rev = list(range(len(self.block_out_channels)))[::-1]
        for i, kind in enumerate(self.up_block_types):
            if kind == "cross":
                n += (self.layers_per_block + 1) * self.depth_for_block(rev[i])
        return n

    def heads_for_block(self, block_idx: int) -> int:
        h = self.attention_head_dim
        return h if isinstance(h, int) else h[block_idx]

    def ff_dims(self) -> list[int]:
        """Model dim of each GEGLU FF layer in canonical (execution) order.

        Canonical order = down blocks outer→inner, mid, up blocks inner→outer.
        The reference orders layers by alphabetical module name
        (reference: moefication/helper.py:76-77) which for SD1.x yields the same
        down(0-5), mid(6), up(7-15) order.
        """
        dims = []
        for i, kind in enumerate(self.down_block_types):
            if kind == "cross":
                dims += ([self.block_out_channels[i]]
                         * self.layers_per_block * self.depth_for_block(i))
        n_blocks = len(self.block_out_channels)
        dims += [self.block_out_channels[-1]] * self.depth_for_block(n_blocks - 1)
        rev_ch = list(reversed(self.block_out_channels))
        rev_idx = list(range(n_blocks))[::-1]
        for i, kind in enumerate(self.up_block_types):
            if kind == "cross":
                dims += ([rev_ch[i]] * (self.layers_per_block + 1)
                         * self.depth_for_block(rev_idx[i]))
        return dims


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_length: int = 77
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"
    dtype: Any = jnp.float32


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215
    dtype: Any = jnp.float32
    # Opt-in serving modes for the DECODER convs (the encoder is a training
    # path and stays exact): int8 W8A8 (ops/quant.py) and/or Winograd 3x3
    # (ops/winograd.py). Same policy as the UNet twins — outputs differ from
    # the direct path at rounding scale, never the parity headline. The VAE
    # decode is the dominant cost of few-step (LCM) serving.
    quant_int8: bool = False
    conv_winograd: bool = False


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    unet: UNetConfig = UNetConfig()
    text_encoder: CLIPTextConfig = CLIPTextConfig()
    vae: VAEConfig = VAEConfig()
    sample_size: int = 64                # latent spatial size (64 → 512px images)
    guidance_scale: float = 7.5
    num_inference_steps: int = 50
    scheduler: str = "pndm"              # "ddim" | "pndm" | "euler" | "dpm" | "lcm"
    prediction_type: str = "epsilon"     # "epsilon" | "v_prediction" (SD2.1-768)
    # NSFW handling: the reference monkey-patches the safety checker off by default
    # (reference: neuron_receivers/base_receiver.py:7-8,20-23). Here safety filtering is
    # an explicit opt-in flag; `blur_nsfw` reproduces the blur-if-nsfw output policy
    # (reference: modularity/remove_experts.py:17-22).
    safety_check: bool = False
    blur_nsfw: bool = False
    # DeepCache serving mode (models/unet.py deep_feature docstring): 0 = off
    # (exact, the default/headline); N >= 2 = full UNet forward every N-th
    # denoise step, shallow (cached-deep-feature) forward otherwise. Like
    # int8/Winograd this is an opt-in approximation, never the headline.
    # N == 1 runs the full branch every step (outputs equal the exact path;
    # useful only for testing the cond plumbing).
    deep_cache_interval: int = 0


def sd15_config(dtype=jnp.bfloat16, relufied: bool = False) -> PipelineConfig:
    """Stable Diffusion v1.4/1.5 geometry (reference: utils.py:64-138)."""
    return PipelineConfig(
        unet=UNetConfig(dtype=dtype,
                        ff_activation="geglu-relu" if relufied else "geglu"),
        text_encoder=CLIPTextConfig(dtype=dtype),
        vae=VAEConfig(dtype=dtype),
    )


def sd21_config(dtype=jnp.bfloat16, v_prediction: bool = True) -> PipelineConfig:
    """Stable Diffusion 2.1 geometry: 1024-dim OpenCLIP text conditioning,
    64-dim attention heads, v-prediction at 768px (reference loads SD2/2.1 as
    comparison baselines: utils.py:64-138, benchmarks/i2p_eval.py:134-194)."""
    return PipelineConfig(
        unet=UNetConfig(cross_attention_dim=1024,
                        attention_head_dim=(5, 10, 20, 20), dtype=dtype),
        text_encoder=CLIPTextConfig(hidden_size=1024, intermediate_size=4096,
                                    num_layers=23, num_heads=16,
                                    hidden_act="gelu", dtype=dtype),
        vae=VAEConfig(dtype=dtype),
        sample_size=96 if v_prediction else 64,
        scheduler="ddim",
        prediction_type="v_prediction" if v_prediction else "epsilon",
    )


def sdxl_config(dtype=jnp.bfloat16, lcm: bool = False) -> PipelineConfig:
    """SDXL-base UNet geometry (reference loads SDXL and LCM-SDXL variants:
    utils.py:64-138, experiments/mod_config.yaml:27). The dual-text-encoder
    pipeline (CLIP-L + bigG penultimate concat, pooled bigG projection,
    time_ids micro-conditioning) is `pipelines/sdxl.py:SDXLPipeline`; the raw
    UNet also accepts precomputed 2048-dim context directly."""
    return PipelineConfig(
        unet=UNetConfig(
            block_out_channels=(320, 640, 1280),
            down_block_types=("plain", "cross", "cross"),
            up_block_types=("cross", "cross", "plain"),
            transformer_layers_per_block=(0, 2, 10),
            attention_head_dim=(5, 10, 20),
            cross_attention_dim=2048,
            addition_embed_dim=1280,
            addition_time_embed_dim=256,
            time_cond_proj_dim=256 if lcm else 0,
            dtype=dtype),
        # VAE follows the pipeline dtype like sd15_config — the decode is the
        # dominant cost of few-step (LCM) serving, so an f32 VAE would halve
        # the MXU rate of exactly the stage that matters at this preset.
        vae=VAEConfig(dtype=dtype),
        sample_size=128,
        scheduler="lcm" if lcm else "euler",
        num_inference_steps=4 if lcm else 50,
    )


def tiny_config(dtype=jnp.float32) -> PipelineConfig:
    """Tiny model for unit tests: same topology (16 FF layers), small dims."""
    return PipelineConfig(
        unet=UNetConfig(
            block_out_channels=(32, 64, 128, 128),
            cross_attention_dim=32,
            attention_head_dim=4,
            norm_num_groups=8,
            dtype=dtype,
        ),
        text_encoder=CLIPTextConfig(
            vocab_size=1000, hidden_size=32, intermediate_size=64,
            num_layers=2, num_heads=4, max_length=16, dtype=dtype,
        ),
        vae=VAEConfig(block_out_channels=(32, 32, 64, 64), norm_num_groups=8,
                      layers_per_block=1, dtype=dtype),
        sample_size=8,
        num_inference_steps=4,
    )
