"""DDIM scheduler (eta=0) as precomputed tables + pure step."""
from __future__ import annotations

import dataclasses

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from diffusion_models_moe_tpu.schedulers.common import NoiseTables, spaced_timesteps


@flax.struct.dataclass
class DDIMState:
    pass  # DDIM is stateless


@dataclasses.dataclass(frozen=True)
class DDIMScheduler:
    tables: NoiseTables
    steps_offset: int = 1
    set_alpha_to_one: bool = False

    init_noise_sigma: float = 1.0

    @staticmethod
    def create(num_train_timesteps: int = 1000, **kw) -> "DDIMScheduler":
        return DDIMScheduler(NoiseTables.create(num_train_timesteps), **{
            k: v for k, v in kw.items() if k in ("steps_offset", "set_alpha_to_one")})

    def set_timesteps(self, num_inference_steps: int):
        """Returns (timesteps (T,), per-step coeff dict, initial state)."""
        n_train = self.tables.num_train_timesteps
        ts = spaced_timesteps(n_train, num_inference_steps, self.steps_offset)
        prev_ts = ts - n_train // num_inference_steps
        acp = self.tables.alphas_cumprod
        final_acp = 1.0 if self.set_alpha_to_one else acp[0]
        a_t = acp[ts]
        a_prev = np.where(prev_ts >= 0, acp[np.clip(prev_ts, 0, None)], final_acp)
        coeffs = {
            "sqrt_a_t": jnp.asarray(np.sqrt(a_t), jnp.float32),
            "sqrt_1m_a_t": jnp.asarray(np.sqrt(1 - a_t), jnp.float32),
            "sqrt_a_prev": jnp.asarray(np.sqrt(a_prev), jnp.float32),
            "sqrt_1m_a_prev": jnp.asarray(np.sqrt(1 - a_prev), jnp.float32),
        }
        return jnp.asarray(ts), coeffs, DDIMState()

    def scale_model_input(self, coeffs, i, sample):
        return sample

    def step(self, state: DDIMState, coeffs, eps: jax.Array, i: jax.Array,
             sample: jax.Array):
        """x_{t-1} = sqrt(a_prev) * x0_pred + sqrt(1-a_prev) * eps (eta = 0)."""
        x0 = (sample - coeffs["sqrt_1m_a_t"][i] * eps) / coeffs["sqrt_a_t"][i]
        prev = coeffs["sqrt_a_prev"][i] * x0 + coeffs["sqrt_1m_a_prev"][i] * eps
        return state, prev
