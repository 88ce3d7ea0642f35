"""PNDM scheduler (PLMS path, skip_prk_steps=True) — the SD1.x pipeline default.

This is the scheduler the reference runs its hooks under, and the reason the
reference sees T = num_steps + 1 per-layer hook firings (51 for 50 steps): PLMS
duplicates the second-highest timestep for its warm-up half-step
(reference observation: SURVEY.md §2.3; experiments/mod_config.yaml:38 `timesteps: 51`).

The Adams-Bashforth multistep state (the `ets` history and the stashed warm-up
sample) lives in a flax.struct state carried through `lax.scan`; the branch on
step count is a `lax.switch`, keeping the whole loop traced.
"""
from __future__ import annotations

import dataclasses

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from diffusion_models_moe_tpu.schedulers.common import NoiseTables


@flax.struct.dataclass
class PNDMState:
    ets: jax.Array          # (4, *sample_shape), index 0 = most recent eps
    cur_sample: jax.Array   # stashed x_t from the warm-up step


@dataclasses.dataclass(frozen=True)
class PNDMScheduler:
    tables: NoiseTables
    steps_offset: int = 1

    init_noise_sigma: float = 1.0

    @staticmethod
    def create(num_train_timesteps: int = 1000, **kw) -> "PNDMScheduler":
        return PNDMScheduler(NoiseTables.create(num_train_timesteps), **kw)

    def set_timesteps(self, num_inference_steps: int, sample_shape=None):
        """Returns (timesteps (T,), coeffs, init state maker); T = steps + 1."""
        n_train = self.tables.num_train_timesteps
        ratio = n_train // num_inference_steps
        base = (np.arange(0, num_inference_steps) * ratio).round().astype(np.int64) \
            + self.steps_offset
        # [t_{n-1}, t_{n-2}, t_{n-2}, t_{n-3}, ..., t_0]
        plms = np.concatenate([base[:-1], base[-2:-1], base[-1:]])[::-1].copy()

        # Effective (t, t_prev) pairs per scan index, after the PLMS warm-up
        # re-labeling: step 1 re-uses (t_{n-1} -> t_{n-2}).
        t_eff = plms.copy()
        t_prev = plms - ratio
        if len(plms) > 1:
            t_eff[1] = plms[1] + ratio
            t_prev[1] = plms[1]

        acp = self.tables.alphas_cumprod
        a_t = acp[np.clip(t_eff, 0, n_train - 1)]
        a_prev = np.where(t_prev >= 0, acp[np.clip(t_prev, 0, None)], acp[0])
        # x_prev = c_sample * x_t - c_eps * eps'   (diffusers _get_prev_sample)
        denom = a_t * np.sqrt(1 - a_prev) + np.sqrt(a_t * (1 - a_t) * a_prev)
        coeffs = {
            "c_sample": jnp.asarray(np.sqrt(a_prev / a_t), jnp.float32),
            "c_eps": jnp.asarray((a_prev - a_t) / denom, jnp.float32),
        }
        return jnp.asarray(plms.astype(np.int32)), coeffs, None

    def init_state(self, sample_shape, dtype=jnp.float32) -> PNDMState:
        return PNDMState(ets=jnp.zeros((4,) + tuple(sample_shape), dtype),
                         cur_sample=jnp.zeros(sample_shape, dtype))

    def scale_model_input(self, coeffs, i, sample):
        return sample

    def step(self, state: PNDMState, coeffs, eps: jax.Array, i: jax.Array,
             sample: jax.Array):
        # Append eps to history except on warm-up step 1.
        new_ets = jnp.concatenate([eps[None], state.ets[:3]], axis=0)
        ets = jnp.where(i == 1, state.ets, new_ets)
        cur_sample = jnp.where(i == 0, sample, state.cur_sample)

        def b0(_):
            return eps
        def b1(_):
            return (eps + ets[0]) / 2.0
        def b2(_):
            return (3.0 * ets[0] - ets[1]) / 2.0
        def b3(_):
            return (23.0 * ets[0] - 16.0 * ets[1] + 5.0 * ets[2]) / 12.0
        def b4(_):
            return (55.0 * ets[0] - 59.0 * ets[1] + 37.0 * ets[2]
                    - 9.0 * ets[3]) / 24.0

        eps_prime = jax.lax.switch(jnp.minimum(i, 4), [b0, b1, b2, b3, b4], None)
        x = jnp.where(i == 1, cur_sample, sample)
        prev = coeffs["c_sample"][i] * x - coeffs["c_eps"][i] * eps_prime
        return PNDMState(ets=ets, cur_sample=cur_sample), prev
