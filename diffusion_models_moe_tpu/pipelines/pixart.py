"""PixArt-alpha text-to-image pipeline: T5 encode -> DiT denoise -> VAE decode.

The reference loads the full PixArt-alpha pipeline as its GELU model variant and
instruments the DiT's non-gated GELU FFs with mean-gate predictivity and the
t<=5 removal window (reference: utils.py:119-127, experiments/mod_config.yaml:47
`timesteps: 20`, neuron_receivers/predictivity.py:55-62). Same architecture
inversion as the SD pipeline: one scanned denoise loop, taps out as (T, ...)
arrays, interventions in as scan-indexed arrays.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from diffusion_models_moe_tpu.config import VAEConfig
from diffusion_models_moe_tpu.models.pixart import (PixArtConfig,
                                                    PixArtTransformer2D,
                                                    tiny_pixart_config)
from diffusion_models_moe_tpu.models.t5 import (T5Config, T5Encoder,
                                                tiny_t5_config)
from diffusion_models_moe_tpu.models.vae import VAEDecoder
from diffusion_models_moe_tpu.pipelines.stable_diffusion import flatten_taps
from diffusion_models_moe_tpu.schedulers.ddim import DDIMScheduler
from diffusion_models_moe_tpu.schedulers.dpm import DPMSolverScheduler
from diffusion_models_moe_tpu.taps import Interventions, TapSpec


@dataclasses.dataclass(frozen=True)
class PixArtPipelineConfig:
    transformer: PixArtConfig = PixArtConfig()
    text_encoder: T5Config = T5Config()
    vae: VAEConfig = VAEConfig()
    sample_size: int = 64                # latents; 64 -> 512px (PixArt-XL-2-512)
    guidance_scale: float = 4.5
    num_inference_steps: int = 20        # reference: mod_config.yaml:47
    scheduler: str = "dpm"               # "dpm" | "ddim"


def pixart_512_config(dtype=jnp.bfloat16) -> PixArtPipelineConfig:
    """PixArt-XL-2-512 geometry (reference: utils.py:119-127)."""
    return PixArtPipelineConfig(
        transformer=PixArtConfig(dtype=dtype),
        text_encoder=T5Config(dtype=dtype),
        vae=VAEConfig(dtype=dtype))


def tiny_pixart_pipeline_config(dtype=jnp.float32) -> PixArtPipelineConfig:
    t5 = tiny_t5_config()
    dit = tiny_pixart_config()
    dit = dataclasses.replace(dit, text_in_dim=t5.d_model, dtype=dtype)
    return PixArtPipelineConfig(
        transformer=dit,
        text_encoder=dataclasses.replace(t5, dtype=dtype),
        vae=VAEConfig(block_out_channels=(32, 32, 64, 64), norm_num_groups=8,
                      layers_per_block=1, dtype=dtype),
        sample_size=8, num_inference_steps=2)


class PixArtPipeline:
    """Bundles T5 encoder + DiT + VAE decoder; all compute paths are pure."""

    def __init__(self, config: PixArtPipelineConfig):
        self.config = config
        self.transformer = PixArtTransformer2D(config.transformer)
        self.text_encoder = T5Encoder(config.text_encoder)
        self.vae_decoder = VAEDecoder(config.vae)
        sched = {"dpm": DPMSolverScheduler, "ddim": DDIMScheduler}
        self.scheduler = sched[config.scheduler].create()
        self._jit_cache: dict = {}

    def init_params(self, key: jax.Array) -> dict:
        cfg = self.config

        @jax.jit
        def init_all(key):
            k1, k2, k3 = jax.random.split(key, 3)
            s = cfg.sample_size
            lat = jnp.zeros((1, s, s, cfg.transformer.sample_channels),
                            jnp.float32)
            ids = jnp.zeros((1, cfg.text_encoder.max_length), jnp.int32)
            ctx = jnp.zeros((1, cfg.text_encoder.max_length,
                             cfg.transformer.text_in_dim), jnp.float32)
            return {
                "transformer": self.transformer.init(
                    k1, lat, jnp.zeros((1,), jnp.int32), ctx)["params"],
                "text_encoder": self.text_encoder.init(k2, ids)["params"],
                "vae": self.vae_decoder.init(k3, lat)["params"],
            }

        return init_all(key)

    def encode_text(self, params, input_ids, attention_mask=None):
        return self.text_encoder.apply({"params": params["text_encoder"]},
                                       input_ids, attention_mask)

    def generate(self, params, cond_ids, uncond_ids, key, *,
                 cond_mask=None, uncond_mask=None,
                 num_steps: Optional[int] = None,
                 guidance_scale: Optional[float] = None,
                 tap: Optional[TapSpec] = None,
                 ivs: Optional[Interventions] = None,
                 decode: bool = True, mesh=None, seeds=None):
        cfg = self.config
        num_steps = num_steps or cfg.num_inference_steps
        g = cfg.guidance_scale if guidance_scale is None else guidance_scale
        if seeds is not None:
            # per-request noise: sample i depends only on seeds[i] (the
            # serving engine's determinism contract, as in the SD pipeline)
            seeds = jnp.asarray(seeds, jnp.uint32)
        if mesh is not None:
            # dp/tp placement as in StableDiffusionPipeline.generate (the T5
            # MLPs and DiT attention/FF shard on the same path rules)
            from diffusion_models_moe_tpu.parallel.mesh import (batch_sharding,
                                                                param_shardings,
                                                                replicated)
            bs = batch_sharding(mesh, 2)
            cond_ids = jax.device_put(jnp.asarray(cond_ids), bs)
            uncond_ids = jax.device_put(jnp.asarray(uncond_ids), bs)
            if cond_mask is not None:
                cond_mask = jax.device_put(jnp.asarray(cond_mask), bs)
            if uncond_mask is not None:
                uncond_mask = jax.device_put(jnp.asarray(uncond_mask), bs)
            rep = replicated(mesh)
            if "tp" in mesh.axis_names and mesh.shape["tp"] > 1:
                params = jax.device_put(params, param_shardings(params, mesh))
            else:
                params = jax.device_put(params, rep)
            key = jax.device_put(key, rep)
            if seeds is not None:
                seeds = jax.device_put(seeds, batch_sharding(mesh, 1))
            if ivs is not None:
                ivs = jax.device_put(ivs, rep)
        fn = self._jitted_generate(num_steps, g, tap, decode,
                                   ivs is not None,
                                   cond_mask is not None,
                                   seeds is not None)
        return fn(params, cond_ids, uncond_ids, cond_mask, uncond_mask, key,
                  ivs, seeds)

    def _jitted_generate(self, num_steps, guidance_scale, tap, decode,
                         has_ivs, has_mask, has_seeds=False):
        # per-instance cache (class-level lru_cache would pin self; see
        # StableDiffusionPipeline._jitted_generate)
        cache_key = (num_steps, guidance_scale, tap, decode, has_ivs,
                     has_mask, has_seeds)
        cached = self._jit_cache.get(cache_key)
        if cached is not None:
            return cached
        def run(params, cond_ids, uncond_ids, cond_mask, uncond_mask, key,
                ivs, seeds):
            cfg = self.config
            b = cond_ids.shape[0]
            cond_emb = self.encode_text(params, cond_ids, cond_mask)
            uncond_emb = self.encode_text(params, uncond_ids, uncond_mask)
            context = jnp.concatenate([uncond_emb, cond_emb], axis=0)
            do_cfg = guidance_scale > 1.0
            s = cfg.sample_size
            if seeds is not None:
                latents = jax.vmap(
                    lambda sd: jax.random.normal(
                        jax.random.PRNGKey(sd),
                        (s, s, cfg.transformer.sample_channels),
                        jnp.float32))(seeds)
            else:
                latents = jax.random.normal(
                    key, (b, s, s, cfg.transformer.sample_channels),
                    jnp.float32)
            latents = latents * self.scheduler.init_noise_sigma
            timesteps, coeffs, state = self.scheduler.set_timesteps(num_steps)
            if state is None:
                state = self.scheduler.init_state(latents.shape)
            collect = tap is not None and any(
                getattr(tap, f.name)
                for f in tap.__dataclass_fields__.values())

            def body(carry, i):
                lat, sched_state = carry
                lat_in = (jnp.concatenate([lat, lat], axis=0)
                          if do_cfg else lat)
                lat_in = self.scheduler.scale_model_input(coeffs, i, lat_in)
                t = timesteps[i]
                ctx = context if do_cfg else context[b:]
                if collect:
                    eps, tap_tree = self.transformer.apply(
                        {"params": params["transformer"]}, lat_in, t, ctx,
                        step_idx=i, tap=tap, ivs=ivs, mutable=["taps"])
                    ys = flatten_taps(tap_tree.get("taps", {}))
                else:
                    eps = self.transformer.apply(
                        {"params": params["transformer"]}, lat_in, t, ctx,
                        step_idx=i, ivs=ivs)
                    ys = 0
                if do_cfg:
                    eps_u, eps_c = jnp.split(eps, 2, axis=0)
                    eps = eps_u + guidance_scale * (eps_c - eps_u)
                if tap is not None and tap.save_eps:
                    ys = ys if isinstance(ys, dict) else {}
                    ys["eps"] = {0: eps}
                sched_state, lat = self.scheduler.step(sched_state, coeffs,
                                                       eps, i, lat)
                return (lat, sched_state), ys

            (latents, _), taps = jax.lax.scan(
                body, (latents, state), jnp.arange(timesteps.shape[0]))
            taps = taps if collect else None
            if not decode:
                return latents, taps
            images = self.vae_decoder.apply({"params": params["vae"]}, latents)
            return jnp.clip(images / 2.0 + 0.5, 0.0, 1.0), taps

        fn = jax.jit(run)
        if len(self._jit_cache) >= 16:
            self._jit_cache.pop(next(iter(self._jit_cache)))
        self._jit_cache[cache_key] = fn
        return fn
