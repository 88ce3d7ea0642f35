"""SDXL text-to-image pipeline: dual text encoders + micro-conditioning.

Completes the SDXL variant the reference's factory loads (reference:
utils.py:64-138 SDXL / LCM-SDXL rows): conditioning is the concatenation of the
penultimate hidden states of CLIP-L (768) and OpenCLIP-bigG (1280) -> 2048, plus the
bigG pooled embedding and size/crop time_ids as added conditioning. The denoise loop
is the same scanned structure as the SD pipeline; taps/interventions pass straight
through to the SDXL UNet's 70 GEGLU FF layers.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from diffusion_models_moe_tpu.config import CLIPTextConfig, PipelineConfig
from diffusion_models_moe_tpu.models.clip_text import CLIPTextEncoder
from diffusion_models_moe_tpu.models.unet import UNet2DCondition
from diffusion_models_moe_tpu.models.vae import VAEDecoder
from diffusion_models_moe_tpu.pipelines.stable_diffusion import (SCHEDULERS,
                                                                 flatten_taps)
from diffusion_models_moe_tpu.schedulers.lcm import LCMScheduler


def sdxl_text_configs(dtype=jnp.bfloat16) -> tuple[CLIPTextConfig, CLIPTextConfig]:
    """CLIP-L/14 and OpenCLIP bigG/14 text tower geometries."""
    clip_l = CLIPTextConfig(dtype=dtype)  # 768-dim, 12 layers, quick_gelu
    big_g = CLIPTextConfig(hidden_size=1280, intermediate_size=5120,
                           num_layers=32, num_heads=20, hidden_act="gelu",
                           dtype=dtype)
    return clip_l, big_g


class SDXLPipeline:
    """SDXL UNet + dual text encoders + VAE decoder; one traced scan per generate."""

    def __init__(self, config: PipelineConfig,
                 text_configs: Optional[tuple] = None):
        if config.scheduler == "lcm" and config.unet.time_cond_proj_dim <= 0:
            # see StableDiffusionPipeline.__init__: LCM without the guidance
            # embedding would silently ignore guidance_scale
            raise ValueError("scheduler='lcm' needs unet.time_cond_proj_dim "
                             "> 0 (the distilled guidance embedding)")
        self.config = config
        self.unet = UNet2DCondition(config.unet)
        tc1, tc2 = text_configs or sdxl_text_configs(config.unet.dtype)
        self.text_encoder = CLIPTextEncoder(tc1)
        self.text_encoder_2 = CLIPTextEncoder(tc2)
        self.vae_decoder = VAEDecoder(config.vae)
        self.scheduler = SCHEDULERS[config.scheduler].create()
        self._tc1, self._tc2 = tc1, tc2
        self._jit_cache: dict = {}

    def init_params(self, key: jax.Array) -> dict:
        cfg = self.config

        @jax.jit
        def init_all(key):
            k1, k2, k3, k4 = jax.random.split(key, 4)
            s = cfg.sample_size
            lat = jnp.zeros((1, s, s, cfg.unet.sample_channels), jnp.float32)
            ctx = jnp.zeros((1, self._tc1.max_length,
                             cfg.unet.cross_attention_dim), jnp.float32)
            tc = None
            if cfg.unet.time_cond_proj_dim > 0:
                tc = jnp.zeros((1, cfg.unet.time_cond_proj_dim), jnp.float32)
            params = {
                "unet": self.unet.init(
                    k1, lat, jnp.zeros((1,), jnp.int32), ctx,
                    added_text_embeds=jnp.zeros(
                        (1, cfg.unet.addition_embed_dim), jnp.float32),
                    added_time_ids=jnp.zeros((1, 6), jnp.float32),
                    timestep_cond=tc)["params"],
                "text_encoder": self.text_encoder.init(
                    k2, jnp.zeros((1, self._tc1.max_length), jnp.int32)
                )["params"],
                "text_encoder_2": self.text_encoder_2.init(
                    k3, jnp.zeros((1, self._tc2.max_length), jnp.int32)
                )["params"],
                "vae": self.vae_decoder.init(k4, lat)["params"],
                # bigG pooled projection (text_projection of the with-projection model)
                "text_projection_2": jax.random.normal(
                    key, (self._tc2.hidden_size, self._tc2.hidden_size),
                    jnp.float32) * 0.02,
            }
            return params

        return init_all(key)

    def encode_prompts(self, params, ids_1, ids_2):
        """(context (B, S, 2048), pooled bigG (B, 1280)). SDXL conditions on the
        penultimate hidden states of both towers."""
        _, pen1 = self.text_encoder.apply(
            {"params": params["text_encoder"]}, ids_1, return_penultimate=True)
        final2, pen2 = self.text_encoder_2.apply(
            {"params": params["text_encoder_2"]}, ids_2,
            return_penultimate=True)
        context = jnp.concatenate([pen1, pen2], axis=-1)
        eot = jnp.argmax(ids_2, axis=-1)
        pooled = final2[jnp.arange(ids_2.shape[0]), eot]
        pooled = pooled @ params["text_projection_2"].astype(pooled.dtype)
        return context, pooled

    def generate(self, params, cond_ids, uncond_ids, key, *,
                 num_steps: Optional[int] = None,
                 guidance_scale: Optional[float] = None,
                 size: Optional[tuple] = None,
                 tap=None, ivs=None, decode: bool = True, mesh=None,
                 seeds=None, cond_ids_2=None, uncond_ids_2=None):
        """`seeds` (B,) derives each sample's initial (and LCM per-step) noise
        from its own seed — the serving engine's per-request determinism
        contract, same semantics as StableDiffusionPipeline.generate.
        `cond_ids_2`/`uncond_ids_2` are the bigG tower's token ids (SDXL's
        tokenizer_2 pads with 0, not CLIP-L's eos — `load_sdxl_tokenizers`);
        they default to the CLIP-L ids for convenience."""
        cfg = self.config
        num_steps = num_steps or cfg.num_inference_steps
        g = cfg.guidance_scale if guidance_scale is None else guidance_scale
        px = (size or (cfg.sample_size * 8, cfg.sample_size * 8))
        if seeds is not None:
            seeds = jnp.asarray(seeds, jnp.uint32)
        cond_ids_2 = cond_ids if cond_ids_2 is None else cond_ids_2
        uncond_ids_2 = uncond_ids if uncond_ids_2 is None else uncond_ids_2
        if mesh is not None:
            # same dp/tp placement as StableDiffusionPipeline.generate — SDXL
            # is where tp matters most (2.6B UNet; 70 depth-stacked FFs shard
            # on the same rules)
            from diffusion_models_moe_tpu.parallel.mesh import (batch_sharding,
                                                                param_shardings,
                                                                replicated)
            cond_ids = jax.device_put(jnp.asarray(cond_ids),
                                      batch_sharding(mesh, cond_ids.ndim))
            uncond_ids = jax.device_put(jnp.asarray(uncond_ids),
                                        batch_sharding(mesh, uncond_ids.ndim))
            cond_ids_2 = jax.device_put(jnp.asarray(cond_ids_2),
                                        batch_sharding(mesh, cond_ids_2.ndim))
            uncond_ids_2 = jax.device_put(
                jnp.asarray(uncond_ids_2),
                batch_sharding(mesh, uncond_ids_2.ndim))
            if seeds is not None:
                seeds = jax.device_put(seeds, batch_sharding(mesh, 1))
            rep = replicated(mesh)
            if "tp" in mesh.axis_names and mesh.shape["tp"] > 1:
                params = jax.device_put(params, param_shardings(params, mesh))
            else:
                params = jax.device_put(params, rep)
            key = jax.device_put(key, rep)
            if ivs is not None:
                ivs = jax.device_put(ivs, rep)
        fn = self._jitted(num_steps, g, px, tap, decode, ivs is not None,
                          seeds is not None)
        return fn(params, cond_ids, uncond_ids, cond_ids_2, uncond_ids_2,
                  key, ivs, seeds)

    def _jitted(self, num_steps, guidance_scale, px, tap, decode, has_ivs,
                has_seeds=False):
        # per-instance cache (class-level lru_cache would pin self; see
        # StableDiffusionPipeline._jitted_generate)
        cache_key = (num_steps, guidance_scale, px, tap, decode, has_ivs,
                     has_seeds)
        cached = self._jit_cache.get(cache_key)
        if cached is not None:
            return cached
        cfg = self.config
        is_lcm = isinstance(self.scheduler, LCMScheduler)
        do_cfg = guidance_scale > 1.0 and not is_lcm
        collect = tap is not None and any(
            getattr(tap, f.name) for f in tap.__dataclass_fields__.values())

        def run(params, cond_ids, uncond_ids, cond_ids_2, uncond_ids_2, key,
                ivs, seeds):
            b = cond_ids.shape[0]
            ctx_c, pool_c = self.encode_prompts(params, cond_ids, cond_ids_2)
            if do_cfg:
                ctx_u, pool_u = self.encode_prompts(params, uncond_ids,
                                                    uncond_ids_2)
                context = jnp.concatenate([ctx_u, ctx_c], axis=0)
                pooled = jnp.concatenate([pool_u, pool_c], axis=0)
            else:
                context, pooled = ctx_c, pool_c
            # micro-conditioning: (orig_h, orig_w, crop_top, crop_left, h, w)
            time_ids = jnp.asarray([[px[0], px[1], 0, 0, px[0], px[1]]],
                                   jnp.float32)
            time_ids = jnp.broadcast_to(time_ids, (context.shape[0], 6))

            timestep_cond = None
            if is_lcm and cfg.unet.time_cond_proj_dim > 0:
                from diffusion_models_moe_tpu.models.layers import (
                    timestep_embedding)
                w = jnp.full((b,), (guidance_scale - 1.0) * 1000.0)
                timestep_cond = timestep_embedding(
                    w, cfg.unet.time_cond_proj_dim, flip_sin_to_cos=False,
                    downscale_freq_shift=1.0)

            s = cfg.sample_size
            if seeds is not None:
                # per-request noise: sample i depends only on seeds[i]
                lat = jax.vmap(
                    lambda sd: jax.random.normal(
                        jax.random.PRNGKey(sd),
                        (s, s, cfg.unet.sample_channels), jnp.float32))(seeds)
            else:
                lat = jax.random.normal(
                    key, (b, s, s, cfg.unet.sample_channels), jnp.float32)
            ins = getattr(self.scheduler, "init_noise_sigma_for", None)
            lat = lat * (ins(num_steps) if ins is not None
                         else self.scheduler.init_noise_sigma)
            out = self.scheduler.set_timesteps(num_steps)
            timesteps, coeffs, state = out
            if state is None:
                if is_lcm:
                    if seeds is not None:
                        key_lcm = jax.vmap(
                            lambda sd: jax.random.fold_in(
                                jax.random.PRNGKey(sd), 1))(seeds)
                    else:
                        key_lcm = jax.random.fold_in(key, 1)
                    state = self.scheduler.init_state(lat.shape, key=key_lcm)
                else:
                    state = self.scheduler.init_state(lat.shape)

            # DeepCache serving mode — same cond-in-scan plumbing as
            # StableDiffusionPipeline.denoise (see there for the policy)
            dc = cfg.deep_cache_interval
            if dc > 0 and tap is not None:
                raise ValueError(
                    "deep_cache_interval > 0 does not support taps (shallow "
                    "steps skip the deep layers)")

            def body(carry, i):
                x, sched_state, deep = carry
                x_in = jnp.concatenate([x, x], axis=0) if do_cfg else x
                x_in = self.scheduler.scale_model_input(coeffs, i, x_in)
                kwargs = dict(added_text_embeds=pooled,
                              added_time_ids=time_ids,
                              timestep_cond=timestep_cond,
                              step_idx=i, ivs=ivs)
                if collect:
                    eps, tree = self.unet.apply(
                        {"params": params["unet"]}, x_in, timesteps[i],
                        context, tap=tap, mutable=["taps"], **kwargs)
                    ys = flatten_taps(tree.get("taps", {}))
                elif dc > 0:
                    def full_step(args):
                        x_in, _deep = args
                        return self.unet.apply(
                            {"params": params["unet"]}, x_in, timesteps[i],
                            context, return_deep=True, **kwargs)

                    def shallow_step(args):
                        x_in, deep = args
                        eps = self.unet.apply(
                            {"params": params["unet"]}, x_in, timesteps[i],
                            context, deep_feature=deep, **kwargs)
                        return eps, deep

                    eps, deep = jax.lax.cond(i % dc == 0, full_step,
                                             shallow_step, (x_in, deep))
                    ys = 0
                else:
                    eps = self.unet.apply({"params": params["unet"]}, x_in,
                                          timesteps[i], context, **kwargs)
                    ys = 0
                if do_cfg:
                    eps_u, eps_c = jnp.split(eps, 2, axis=0)
                    eps = eps_u + guidance_scale * (eps_c - eps_u)
                sched_state, x = self.scheduler.step(sched_state, coeffs, eps,
                                                     i, x)
                return (x, sched_state, deep), ys

            if dc > 0:
                deep0 = jnp.zeros(
                    (context.shape[0], lat.shape[1], lat.shape[2],
                     cfg.unet.block_out_channels[1]), cfg.unet.dtype)
            else:
                deep0 = jnp.zeros((), jnp.float32)  # unused carry slot
            (lat, _, _), taps = jax.lax.scan(body, (lat, state, deep0),
                                             jnp.arange(timesteps.shape[0]))
            taps = taps if collect else None
            if not decode:
                return lat, taps
            images = self.vae_decoder.apply({"params": params["vae"]}, lat)
            return jnp.clip(images / 2.0 + 0.5, 0.0, 1.0), taps

        fn = jax.jit(run)
        if len(self._jit_cache) >= 8:
            self._jit_cache.pop(next(iter(self._jit_cache)))
        self._jit_cache[cache_key] = fn
        return fn
