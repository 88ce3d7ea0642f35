"""Euler discrete scheduler (karras-style sigma space, no churn)."""
from __future__ import annotations

import dataclasses

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from diffusion_models_moe_tpu.schedulers.common import NoiseTables, spaced_timesteps


@flax.struct.dataclass
class EulerState:
    pass


@dataclasses.dataclass(frozen=True)
class EulerDiscreteScheduler:
    tables: NoiseTables
    steps_offset: int = 1

    @staticmethod
    def create(num_train_timesteps: int = 1000, **kw) -> "EulerDiscreteScheduler":
        return EulerDiscreteScheduler(NoiseTables.create(num_train_timesteps), **kw)

    @property
    def init_noise_sigma(self) -> float:
        """Full-training-table fallback (diffusers' value BEFORE set_timesteps).
        Pipelines should prefer `init_noise_sigma_for(num_steps)`: diffusers
        calls set_timesteps first, so its pipelines scale initial latents by
        the INFERENCE schedule's max sigma (~13.2 at 50 steps), not this ~14.6
        — the difference hands the UNet a first input with std ~1.11."""
        acp = self.tables.alphas_cumprod
        max_sigma = float(np.sqrt((1 - acp).max() / acp.min()))
        return float(np.sqrt(max_sigma ** 2 + 1))

    def init_noise_sigma_for(self, num_inference_steps: int) -> float:
        """sqrt(first_schedule_sigma^2 + 1) — the scale diffusers applies to
        initial latents for a run of this many steps ('leading' spacing)."""
        n_train = self.tables.num_train_timesteps
        ts = spaced_timesteps(n_train, num_inference_steps, self.steps_offset)
        acp = self.tables.alphas_cumprod
        sigmas_full = np.sqrt((1 - acp) / acp)
        s0 = float(np.interp(float(np.max(ts)), np.arange(n_train),
                             sigmas_full))
        return float(np.sqrt(s0 ** 2 + 1.0))

    def set_timesteps(self, num_inference_steps: int):
        n_train = self.tables.num_train_timesteps
        ts = spaced_timesteps(n_train, num_inference_steps, self.steps_offset)
        acp = self.tables.alphas_cumprod
        sigmas_full = np.sqrt((1 - acp) / acp)
        sigmas = np.interp(ts.astype(np.float64), np.arange(n_train), sigmas_full)
        sigmas = np.concatenate([sigmas, [0.0]])
        coeffs = {"sigmas": jnp.asarray(sigmas, jnp.float32)}
        return jnp.asarray(ts), coeffs, EulerState()

    def scale_model_input(self, coeffs, i, sample):
        sigma = coeffs["sigmas"][i]
        return sample / jnp.sqrt(sigma ** 2 + 1.0)

    def step(self, state: EulerState, coeffs, eps: jax.Array, i: jax.Array,
             sample: jax.Array):
        sigma, sigma_next = coeffs["sigmas"][i], coeffs["sigmas"][i + 1]
        # epsilon prediction: derivative is eps itself in sigma space
        prev = sample + eps * (sigma_next - sigma)
        return state, prev
