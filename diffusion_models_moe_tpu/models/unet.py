"""UNet2DCondition (SD1.x geometry) in Flax, with tappable GEGLU FF layers.

Replaces the reference's L0 dependency on diffusers' UNet2DConditionModel
(reference: utils.py:64-138 loads it; SURVEY.md §1). Layouts are NHWC. The 16 GEGLU
FF layers are numbered in execution order down(0-5), mid(6), up(7-15), which matches
the reference's alphabetical module-name ordering for SD1.x
(reference: moefication/helper.py:76-77).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffusion_models_moe_tpu.config import UNetConfig
from diffusion_models_moe_tpu.models.attention import Transformer2D
from diffusion_models_moe_tpu.models.layers import (Downsample2D, ResnetBlock2D,
                                                    TimestepEmbedding,
                                                    Upsample2D,
                                                    timestep_embedding)
from diffusion_models_moe_tpu.taps import Interventions, TapSpec


class UNet2DCondition(nn.Module):
    cfg: UNetConfig

    @nn.compact
    def __call__(self, sample: jax.Array, timestep: jax.Array,
                 encoder_hidden_states: jax.Array, *,
                 timestep_cond: Optional[jax.Array] = None,
                 added_text_embeds: Optional[jax.Array] = None,
                 added_time_ids: Optional[jax.Array] = None,
                 step_idx: Optional[jax.Array] = None,
                 tap: Optional[TapSpec] = None,
                 ivs: Optional[Interventions] = None,
                 deep_feature: Optional[jax.Array] = None,
                 return_deep: bool = False) -> jax.Array:
        """sample: (B, H, W, C) latents; timestep: scalar or (B,);
        encoder_hidden_states: (B, S, D_text). Returns predicted noise (B, H, W, C).

        DeepCache serving mode (Ma et al. 2023, arXiv:2312.00858 — a step-level
        cache the reference has no analogue of; PAPERS.md's A-SDM/TEAM land on
        the same redundancy): the feature entering the LAST up block changes
        slowly across adjacent denoise steps, so shallow steps can splice a
        cached copy and recompute only the outermost blocks.
          return_deep=True  -> full forward, returns (eps, deep) where `deep`
                               is the feature entering the last up block.
          deep_feature=...  -> SHALLOW forward: conv_in + down block 0 (skip
                               connections for the last up block), splice
                               `deep_feature`, run only the last up block +
                               conv_out. Skips every other block — including
                               the mid/deep transformers — entirely.
        Mutually exclusive. FF-layer numbering (ff_index) is preserved in the
        shallow trace, so routing interventions address the executed layers
        correctly; tap collection on shallow steps is rejected at the pipeline
        level (skipped layers would change the tap pytree structure).
        """
        shallow = deep_feature is not None
        if shallow and return_deep:
            raise ValueError("deep_feature and return_deep are exclusive")
        if (shallow or return_deep) and len(self.cfg.up_block_types) < 2:
            raise ValueError("deep cache needs >= 2 up blocks")
        cfg = self.cfg
        dt = cfg.dtype
        ndt = dt if cfg.fast_norm else jnp.float32
        channels = list(cfg.block_out_channels)

        # --- time embedding ---------------------------------------------------
        temb = timestep_embedding(
            jnp.broadcast_to(jnp.atleast_1d(timestep), (sample.shape[0],)),
            channels[0], cfg.flip_sin_to_cos, cfg.freq_shift).astype(dt)
        if timestep_cond is not None:
            # LCM guidance-scale conditioning (diffusers time_cond_proj)
            temb = temb + nn.Dense(channels[0], use_bias=False, dtype=dt,
                                   name="time_cond_proj")(
                                       timestep_cond.astype(dt))
        temb = TimestepEmbedding(channels[0] * 4, dtype=dt,
                                 name="time_embedding")(temb)
        if cfg.addition_embed_dim > 0 and added_text_embeds is not None:
            # SDXL micro-conditioning: pooled text + sinusoidal time_ids
            # -> MLP added to the time embedding
            parts = [added_text_embeds.astype(dt)]
            if added_time_ids is not None and cfg.addition_time_embed_dim > 0:
                b, n_ids = added_time_ids.shape
                id_emb = timestep_embedding(
                    added_time_ids.reshape(-1), cfg.addition_time_embed_dim,
                    cfg.flip_sin_to_cos, cfg.freq_shift)
                parts.append(id_emb.reshape(b, -1).astype(dt))
            add_emb = jnp.concatenate(parts, axis=-1)
            temb = temb + TimestepEmbedding(channels[0] * 4, dtype=dt,
                                            name="add_embedding")(add_emb)

        context = encoder_hidden_states.astype(dt)
        sample = sample.astype(dt)

        # remat only on the plain forward (training): tapped/intervened calls
        # carry static kwargs remat can't thread
        do_remat = cfg.remat and tap is None and ivs is None
        resnet_cls = nn.remat(ResnetBlock2D) if do_remat else ResnetBlock2D
        transformer_cls = nn.remat(Transformer2D) if do_remat else Transformer2D

        def make_transformer(dim, ff_index, name, block_idx):
            return transformer_cls(
                dim=dim, heads=cfg.heads_for_block(block_idx),
                context_dim=cfg.cross_attention_dim,
                ff_index=ff_index, depth=cfg.depth_for_block(block_idx),
                norm_num_groups=cfg.norm_num_groups,
                ff_mult=cfg.ff_mult, ff_activation=cfg.ff_activation,
                dtype=dt, use_fused_routing=cfg.use_fused_routing,
                flash_attention=cfg.flash_attention, norm_dtype=ndt,
                quant=cfg.quant_int8, name=name)

        tkw = {} if do_remat else dict(step_idx=step_idx, tap=tap, ivs=ivs)
        ff_index = 0

        # --- down path ----------------------------------------------------------
        # In the shallow (deep-cache) trace only block 0 executes — exactly the
        # producers of the skip connections the last up block consumes. The
        # ff_index bookkeeping runs unconditionally so executed layers keep
        # their full-forward numbering.
        h = nn.Conv(channels[0], (3, 3), padding=1, dtype=dt, name="conv_in")(sample)
        res_stack = [h]
        for i, kind in enumerate(cfg.down_block_types):
            out_ch = channels[i]
            for j in range(cfg.layers_per_block):
                if not shallow or i == 0:
                    h = resnet_cls(out_ch, cfg.norm_num_groups, dtype=dt,
                                   norm_dtype=ndt, quant=cfg.quant_int8,
                                   winograd=cfg.conv_winograd,
                                   name=f"down_{i}_res_{j}")(h, temb)
                    if kind == "cross":
                        h = make_transformer(out_ch, ff_index,
                                             f"down_{i}_attn_{j}",
                                             i)(h, context, **tkw)
                    res_stack.append(h)
                if kind == "cross":
                    ff_index += cfg.depth_for_block(i)
            if i < len(cfg.down_block_types) - 1 and not shallow:
                h = Downsample2D(out_ch, dtype=dt, quant=cfg.quant_int8,
                                 name=f"down_{i}_downsample")(h)
                res_stack.append(h)

        # --- mid ------------------------------------------------------------------
        mid_ch = channels[-1]
        if not shallow:
            h = resnet_cls(mid_ch, cfg.norm_num_groups, dtype=dt, norm_dtype=ndt,
                           quant=cfg.quant_int8, winograd=cfg.conv_winograd,
                           name="mid_res_0")(h, temb)
            h = make_transformer(mid_ch, ff_index, "mid_attn_0",
                                 len(channels) - 1)(h, context, **tkw)
            h = resnet_cls(mid_ch, cfg.norm_num_groups, dtype=dt, norm_dtype=ndt,
                           quant=cfg.quant_int8, winograd=cfg.conv_winograd,
                           name="mid_res_1")(h, temb)
        ff_index += cfg.depth_for_block(len(channels) - 1)

        # --- up path ----------------------------------------------------------------
        rev_channels = list(reversed(channels))
        n_up = len(cfg.up_block_types)
        deep = None
        for i, kind in enumerate(cfg.up_block_types):
            out_ch = rev_channels[i]
            last = i == n_up - 1
            if last and return_deep:
                deep = h  # the feature entering the last up block
            if last and shallow:
                h = deep_feature.astype(dt)
            for j in range(cfg.layers_per_block + 1):
                if not shallow or last:
                    res = res_stack.pop()
                    h = jnp.concatenate([h, res], axis=-1)
                    h = resnet_cls(out_ch, cfg.norm_num_groups, dtype=dt,
                                   norm_dtype=ndt, quant=cfg.quant_int8,
                                   winograd=cfg.conv_winograd,
                                   name=f"up_{i}_res_{j}")(h, temb)
                    if kind == "cross":
                        h = make_transformer(
                            out_ch, ff_index, f"up_{i}_attn_{j}",
                            len(channels) - 1 - i)(h, context, **tkw)
                if kind == "cross":
                    ff_index += cfg.depth_for_block(len(channels) - 1 - i)
            if i < n_up - 1 and not shallow:
                h = Upsample2D(out_ch, dtype=dt, quant=cfg.quant_int8,
                               winograd=cfg.conv_winograd,
                               name=f"up_{i}_upsample")(h)

        # --- out -----------------------------------------------------------------
        h = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-5,
                         dtype=ndt, name="conv_norm_out")(h)
        h = nn.silu(h).astype(dt)
        h = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=dt,
                    name="conv_out")(h)
        if return_deep:
            return h.astype(jnp.float32), deep
        return h.astype(jnp.float32)
