"""Safe Latent Diffusion (SLD) guidance.

The reference loads an external `sld` package pipeline as its "SD1.4-safe" baseline
(reference: utils.py:15,64-138 'stabilityai/stable-diffusion-v1-4-safe',
benchmarks/i2p_eval.py SLD rows). Here SLD is native: a third (safety-concept)
conditioning joins the CFG batch, and the per-step safety guidance with momentum is
part of the same scanned loop.

Math follows the SLD formulation: per element,
  scale    = clip(|eps_c - eps_s| * s_g, 0, 1)
  mask     = where((eps_c - eps_s) >= threshold, 0, scale)
  gamma_t  = mask * (eps_s - eps_u) + momentum term (EMA, applied after warmup)
  eps_hat  = eps_u + g * ((eps_c - eps_u) - gamma_t)
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

# Default safety concept text from the SLD paper / safe-SD config.
SAFETY_CONCEPT = (
    "an image showing hate, harassment, violence, suffering, humiliation, harm, "
    "suicide, sexual, nudity, bodily fluids, blood, obscene gestures, illegal "
    "activity, drug use, theft, vandalism, weapons, child abuse, brutality, "
    "cruelty")


@dataclasses.dataclass(frozen=True)
class SLDConfig:
    """Hyp-Medium defaults — the safe-SD pipeline's default operating point
    (diffusers StableDiffusionPipelineSafe: sld_guidance_scale=1000,
    sld_threshold=0.01, sld_momentum_scale=0.3, sld_mom_beta=0.4,
    sld_warmup_steps=10). The other paper presets are classmethods."""
    guidance_scale: float = 1000.0
    threshold: float = 0.01
    momentum_scale: float = 0.3
    momentum_beta: float = 0.4
    warmup_steps: int = 10

    @classmethod
    def weak(cls) -> "SLDConfig":
        return cls(guidance_scale=200.0, threshold=0.0, momentum_scale=0.0,
                   momentum_beta=0.0, warmup_steps=15)

    @classmethod
    def medium(cls) -> "SLDConfig":
        return cls()

    @classmethod
    def strong(cls) -> "SLDConfig":
        return cls(guidance_scale=2000.0, threshold=0.025,
                   momentum_scale=0.5, momentum_beta=0.7, warmup_steps=7)

    @classmethod
    def max(cls) -> "SLDConfig":
        return cls(guidance_scale=5000.0, threshold=1.0, momentum_scale=0.5,
                   momentum_beta=0.7, warmup_steps=0)


def sld_combine(eps_u, eps_c, eps_s, momentum, i, sld: SLDConfig, g: float):
    """One step of SLD guidance combination (paper eqs. 3-8, matching the
    safe-SD pipeline's ordering): returns (eps_hat, momentum_new).

    Ordering subtlety: the momentum term is ADDED to the safety guidance
    (eq. 7) BEFORE the EMA update consumes it (eq. 8) — updating the EMA from
    the pre-momentum guidance (a natural-looking refactor) diverges from the
    published algorithm."""
    guidance = eps_c - eps_u
    scale = jnp.clip(jnp.abs(eps_c - eps_s) * sld.guidance_scale, 0.0, 1.0)
    mask = jnp.where((eps_c - eps_s) >= sld.threshold, 0.0, scale)
    safety_guidance = mask * (eps_s - eps_u)
    safety_guidance = safety_guidance + sld.momentum_scale * momentum
    momentum_new = (sld.momentum_beta * momentum
                    + (1 - sld.momentum_beta) * safety_guidance)
    # apply safety only after warmup (momentum still accumulates)
    apply = jnp.asarray(i >= sld.warmup_steps, eps_u.dtype)
    eps_hat = eps_u + g * (guidance - apply * safety_guidance)
    return eps_hat, momentum_new


def sld_generate(pipe, params, cond_ids, uncond_ids, safety_ids, key, *,
                 num_steps: Optional[int] = None,
                 guidance_scale: Optional[float] = None,
                 sld: SLDConfig = SLDConfig(), decode: bool = True):
    """Safety-guided generation on a StableDiffusionPipeline."""
    cfg = pipe.config
    num_steps = num_steps or cfg.num_inference_steps
    g = cfg.guidance_scale if guidance_scale is None else guidance_scale

    @jax.jit
    def run(params, cond_ids, uncond_ids, safety_ids, key):
        b = cond_ids.shape[0]
        cond_emb, _ = pipe.encode_text(params, cond_ids)
        uncond_emb, _ = pipe.encode_text(params, uncond_ids)
        safety_emb, _ = pipe.encode_text(params, safety_ids)
        context = jnp.concatenate([uncond_emb, cond_emb, safety_emb], axis=0)
        s = cfg.sample_size
        lat = jax.random.normal(key, (b, s, s, cfg.unet.sample_channels),
                                jnp.float32) * pipe.scheduler.init_noise_sigma
        timesteps, coeffs, state = pipe._setup_scheduler(num_steps, lat.shape)

        def body(carry, i):
            x, sched_state, momentum = carry
            lat_in = jnp.concatenate([x, x, x], axis=0)
            lat_in = pipe.scheduler.scale_model_input(coeffs, i, lat_in)
            eps = pipe.unet.apply({"params": params["unet"]}, lat_in,
                                  timesteps[i], context, step_idx=i)
            eps_u, eps_c, eps_s = jnp.split(eps, 3, axis=0)
            eps_hat, momentum_new = sld_combine(eps_u, eps_c, eps_s,
                                                momentum, i, sld, g)
            sched_state, x = pipe.scheduler.step(sched_state, coeffs, eps_hat,
                                                 i, x)
            return (x, sched_state, momentum_new), None

        momentum0 = jnp.zeros_like(lat)
        (lat, _, _), _ = jax.lax.scan(
            body, (lat, state, momentum0), jnp.arange(timesteps.shape[0]))
        if not decode:
            return lat
        images = pipe.vae_decoder.apply({"params": params["vae"]}, lat)
        return jnp.clip(images / 2.0 + 0.5, 0.0, 1.0)

    return run(params, cond_ids, uncond_ids, safety_ids, key)
