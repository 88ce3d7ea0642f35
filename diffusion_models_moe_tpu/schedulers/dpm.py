"""DPM-Solver++ (2M, epsilon-prediction) — fast low-step sampler.

Multistep state (previous x0 prediction) is a scan carry like PNDM's; all
lambda/sigma/alpha coefficients precompute to per-step arrays.
"""
from __future__ import annotations

import dataclasses

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from diffusion_models_moe_tpu.schedulers.common import NoiseTables, spaced_timesteps


@flax.struct.dataclass
class DPMState:
    prev_x0: jax.Array   # previous denoised prediction


@dataclasses.dataclass(frozen=True)
class DPMSolverScheduler:
    tables: NoiseTables
    steps_offset: int = 1

    init_noise_sigma: float = 1.0

    @staticmethod
    def create(num_train_timesteps: int = 1000, **kw) -> "DPMSolverScheduler":
        return DPMSolverScheduler(NoiseTables.create(num_train_timesteps), **kw)

    def set_timesteps(self, num_inference_steps: int):
        n_train = self.tables.num_train_timesteps
        ts = spaced_timesteps(n_train, num_inference_steps, self.steps_offset)
        acp = self.tables.alphas_cumprod
        # boundary points: current timesteps plus final t=0
        bounds = np.concatenate([ts, [0]])
        a = np.sqrt(acp[np.clip(bounds, 0, n_train - 1)])
        s = np.sqrt(1.0 - acp[np.clip(bounds, 0, n_train - 1)])
        lam = np.log(a) - np.log(s)
        # per step i: from bounds[i] to bounds[i+1]
        h = lam[1:] - lam[:-1]                    # (T,)
        h_prev = np.concatenate([[np.nan], h[:-1]])
        r = np.where(np.isnan(h_prev), 1.0, h_prev / np.maximum(h, 1e-12))
        # diffusers lower_order_final (default True): a first-order update on
        # the FINAL step when the run has < 15 steps — the 2M correction's
        # extrapolation is unstable at the last (large-h) step of short runs
        first_order = np.zeros(len(ts), bool)
        if len(ts) < 15:
            first_order[-1] = True
        coeffs = {
            "sigma_ratio": jnp.asarray(s[1:] / s[:-1], jnp.float32),
            "alpha_next": jnp.asarray(a[1:], jnp.float32),
            "sigma_cur": jnp.asarray(s[:-1], jnp.float32),
            "alpha_cur": jnp.asarray(a[:-1], jnp.float32),
            "em1": jnp.asarray(np.expm1(-h), jnp.float32),   # exp(-h) - 1
            "r": jnp.asarray(np.nan_to_num(r, nan=1.0), jnp.float32),
            "first_order": jnp.asarray(first_order),
        }
        return jnp.asarray(ts), coeffs, None

    def init_state(self, sample_shape, dtype=jnp.float32) -> DPMState:
        return DPMState(prev_x0=jnp.zeros(sample_shape, dtype))

    def scale_model_input(self, coeffs, i, sample):
        return sample

    def step(self, state: DPMState, coeffs, eps: jax.Array, i: jax.Array,
             sample: jax.Array):
        x0 = (sample - coeffs["sigma_cur"][i] * eps) / coeffs["alpha_cur"][i]
        r = coeffs["r"][i]
        # 2M correction from the second step on; first-order again on the
        # final step of short (<15-step) runs (diffusers lower_order_final)
        d = jnp.where(jnp.logical_or(i == 0, coeffs["first_order"][i]), x0,
                      (1.0 + 1.0 / (2.0 * r)) * x0
                      - (1.0 / (2.0 * r)) * state.prev_x0)
        prev = (coeffs["sigma_ratio"][i] * sample
                - coeffs["alpha_next"][i] * coeffs["em1"][i] * d)
        return DPMState(prev_x0=x0), prev
