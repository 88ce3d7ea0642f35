"""Latent Consistency Model scheduler (few-step distilled sampling).

The reference's factory loads LCM-SDXL for 4-step inference
(reference: utils.py:64-138, experiments/mod_config.yaml:27 `timesteps: 4+1`).
Consistency boundary scalings (sigma_data = 0.5, timestep_scaling = 10) map the
x0 prediction to the consistency function output; between steps fresh noise is
injected, so the scan state carries a PRNG key.
"""
from __future__ import annotations

import dataclasses

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from diffusion_models_moe_tpu.schedulers.common import NoiseTables


@flax.struct.dataclass
class LCMState:
    key: jax.Array


@dataclasses.dataclass(frozen=True)
class LCMScheduler:
    tables: NoiseTables
    original_inference_steps: int = 50
    sigma_data: float = 0.5
    timestep_scaling: float = 10.0

    init_noise_sigma: float = 1.0

    @staticmethod
    def create(num_train_timesteps: int = 1000, **kw) -> "LCMScheduler":
        return LCMScheduler(NoiseTables.create(num_train_timesteps), **kw)

    def set_timesteps(self, num_inference_steps: int):
        n_train = self.tables.num_train_timesteps
        k = n_train // self.original_inference_steps
        origin = np.arange(1, self.original_inference_steps + 1) * k - 1
        skip = max(len(origin) // num_inference_steps, 1)
        ts = origin[::-1][::skip][:num_inference_steps].astype(np.int64)

        acp = self.tables.alphas_cumprod
        a_t = acp[ts]
        prev_ts = np.concatenate([ts[1:], [0]])
        # the final boundary denoises fully: alpha_prev = 1 (pure x0)
        a_prev = np.where(np.arange(len(ts)) < len(ts) - 1,
                          acp[np.clip(prev_ts, 0, None)], 1.0)
        # boundary scalings use the SCALED timestep s = t * timestep_scaling
        # (multiplied, not divided — at t=19, c_skip must be ~6.9e-6, i.e. the
        # consistency output is almost pure c_out*x0 near t=0)
        s = ts.astype(np.float64) * self.timestep_scaling
        sd2 = self.sigma_data ** 2
        coeffs = {
            "sqrt_a_t": jnp.asarray(np.sqrt(a_t), jnp.float32),
            "sqrt_1m_a_t": jnp.asarray(np.sqrt(1 - a_t), jnp.float32),
            "sqrt_a_prev": jnp.asarray(np.sqrt(a_prev), jnp.float32),
            "sqrt_1m_a_prev": jnp.asarray(np.sqrt(1 - a_prev), jnp.float32),
            "c_skip": jnp.asarray(sd2 / (s ** 2 + sd2), jnp.float32),
            "c_out": jnp.asarray(s / np.sqrt(s ** 2 + sd2), jnp.float32),
            "is_last": jnp.asarray(
                np.arange(len(ts)) == len(ts) - 1, jnp.float32),
        }
        return jnp.asarray(ts.astype(np.int32)), coeffs, None

    def init_state(self, sample_shape, key=None) -> LCMState:
        """Carries one PRNG key PER SAMPLE so injected noise depends only on
        that sample's key, never on its batch slot (the serving engine's
        per-request determinism contract). A single (2,)-shaped key is
        broadcast by fold_in over the batch axis; a (B, 2) array (e.g. derived
        from per-request seeds) is used as-is."""
        if key is None:
            key = jax.random.PRNGKey(0)
        if key.ndim == 1:
            b = sample_shape[0]
            key = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(b))
        return LCMState(key=key)

    def scale_model_input(self, coeffs, i, sample):
        return sample

    def step(self, state: LCMState, coeffs, eps: jax.Array, i: jax.Array,
             sample: jax.Array):
        x0 = (sample - coeffs["sqrt_1m_a_t"][i] * eps) / coeffs["sqrt_a_t"][i]
        denoised = coeffs["c_out"][i] * x0 + coeffs["c_skip"][i] * sample
        split = jax.vmap(jax.random.split)(state.key)       # (B, 2, 2)
        key, subs = split[:, 0], split[:, 1]
        noise = jax.vmap(
            lambda kk: jax.random.normal(kk, sample.shape[1:],
                                         sample.dtype))(subs)
        noisy = (coeffs["sqrt_a_prev"][i] * denoised
                 + coeffs["sqrt_1m_a_prev"][i] * noise)
        prev = jnp.where(coeffs["is_last"][i] > 0, denoised, noisy)
        return LCMState(key=key), prev
