"""Shared noise-schedule tables.

Replaces the reference's L0 dependency on diffusers schedulers (PNDM is the SD1.x
pipeline default the reference runs under its hooks; DDIM/Euler/DPM are used by other
model variants in the factory, reference: utils.py:64-138). All schedulers here are
(tables + pure step function) pairs: `set_timesteps` precomputes per-step coefficient
arrays on the host, and `step(state, eps, i, sample)` is pure and indexable by a traced
scan counter, so the whole denoise loop compiles to one `lax.scan`.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


def make_betas(num_train_timesteps: int = 1000, beta_start: float = 0.00085,
               beta_end: float = 0.012, beta_schedule: str = "scaled_linear"
               ) -> np.ndarray:
    if beta_schedule == "scaled_linear":
        return np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                           num_train_timesteps, dtype=np.float64) ** 2
    if beta_schedule == "linear":
        return np.linspace(beta_start, beta_end, num_train_timesteps,
                           dtype=np.float64)
    raise ValueError(f"unknown beta schedule {beta_schedule}")


@dataclasses.dataclass(frozen=True)
class NoiseTables:
    """Cumulative-product alpha tables shared by all schedulers."""
    num_train_timesteps: int
    alphas_cumprod: np.ndarray   # (num_train_timesteps,) float64

    @staticmethod
    def create(num_train_timesteps: int = 1000, beta_start: float = 0.00085,
               beta_end: float = 0.012,
               beta_schedule: str = "scaled_linear") -> "NoiseTables":
        betas = make_betas(num_train_timesteps, beta_start, beta_end, beta_schedule)
        return NoiseTables(num_train_timesteps, np.cumprod(1.0 - betas))

    def add_noise(self, sample, noise, timesteps):
        """q(x_t | x_0): used by the training loop
        (reference: train_relufied_sd.py:1030 noise_scheduler.add_noise)."""
        acp = jnp.asarray(self.alphas_cumprod, jnp.float32)[timesteps]
        while acp.ndim < sample.ndim:
            acp = acp[..., None]
        return jnp.sqrt(acp) * sample + jnp.sqrt(1.0 - acp) * noise

    def snr(self, timesteps):
        """Signal-to-noise ratio per timestep, for SNR-gamma loss weighting
        (reference: train_relufied_sd.py:1060-1075)."""
        acp = jnp.asarray(self.alphas_cumprod, jnp.float32)[timesteps]
        return acp / (1.0 - acp)


def spaced_timesteps(num_train_timesteps: int, num_inference_steps: int,
                     steps_offset: int = 1) -> np.ndarray:
    """Descending inference timesteps (diffusers 'leading' spacing)."""
    ratio = num_train_timesteps // num_inference_steps
    ts = (np.arange(0, num_inference_steps) * ratio).round()[::-1]
    return ts.astype(np.int32) + steps_offset
