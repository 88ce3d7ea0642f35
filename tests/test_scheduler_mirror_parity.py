"""Trajectory parity: each scheduler vs an independent float64 numpy mirror of
the diffusers update equations.

The framework's schedulers are (precomputed coefficient tables + pure scanned
step); the mirrors below recompute every coefficient per step straight from
alphas_cumprod, following the diffusers step algorithms (DDIMScheduler.step
eta=0, PNDMScheduler.step_plms with counter/ets state, EulerDiscreteScheduler
linear-interp sigma space, DPMSolverMultistepScheduler 2M midpoint,
LCMScheduler boundary scalings). Both sides consume the SAME fixed
model-output sequence, so any divergence is scheduler math (table indexing,
boundary handling, warm-up relabeling), not model noise. This is the test
class that catches the round-1 LCM c_skip bug (ADVICE.md) by construction.

Timestep spacing is the SD-config 'leading' spacing with steps_offset=1 in
both implementations (the convention the reference's pipelines run under);
the mirrors anchor the update math and boundary cases, recomputed
independently of the tables under test.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusion_models_moe_tpu.schedulers.common import NoiseTables
from diffusion_models_moe_tpu.schedulers.ddim import DDIMScheduler
from diffusion_models_moe_tpu.schedulers.dpm import DPMSolverScheduler
from diffusion_models_moe_tpu.schedulers.euler import EulerDiscreteScheduler
from diffusion_models_moe_tpu.schedulers.lcm import LCMScheduler
from diffusion_models_moe_tpu.schedulers.pndm import PNDMScheduler

N_TRAIN = 1000


def _acp():
    betas = np.linspace(0.00085 ** 0.5, 0.012 ** 0.5, N_TRAIN,
                        dtype=np.float64) ** 2
    return np.cumprod(1.0 - betas)


def _leading_ts(n, offset=1):
    ratio = N_TRAIN // n
    return ((np.arange(n) * ratio).round()[::-1]).astype(np.int64) + offset


def _eps_seq(n_steps, shape, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randn(*shape) for _ in range(n_steps)]


# ------------------------------------------------------------------ mirrors
class MirrorDDIM:
    """diffusers DDIMScheduler.step, eta=0, set_alpha_to_one=False."""

    def __init__(self, n):
        self.acp = _acp()
        self.ratio = N_TRAIN // n
        self.timesteps = _leading_ts(n)

    def step(self, eps, t, sample):
        prev_t = t - self.ratio
        a_t = self.acp[t]
        a_prev = self.acp[prev_t] if prev_t >= 0 else self.acp[0]
        x0 = (sample - (1 - a_t) ** 0.5 * eps) / a_t ** 0.5
        return a_prev ** 0.5 * x0 + (1 - a_prev) ** 0.5 * eps


class MirrorPNDM:
    """diffusers PNDMScheduler.step_plms (skip_prk_steps=True): stateful
    counter / ets history / warm-up timestep relabeling."""

    def __init__(self, n):
        self.acp = _acp()
        self.ratio = N_TRAIN // n
        base = _leading_ts(n)[::-1]                     # ascending
        self.timesteps = np.concatenate(
            [base[:-1], base[-2:-1], base[-1:]])[::-1]  # descending + dup
        self.counter = 0
        self.ets = []
        self.cur_sample = None

    def _prev_sample(self, sample, t, prev_t, mo):
        a_t, a_prev = self.acp[t], (self.acp[prev_t] if prev_t >= 0
                                    else self.acp[0])
        sample_coeff = (a_prev / a_t) ** 0.5
        denom = a_t * (1 - a_prev) ** 0.5 + (a_t * (1 - a_t) * a_prev) ** 0.5
        return sample_coeff * sample - (a_prev - a_t) * mo / denom

    def step(self, model_output, t, sample):
        prev_t = t - self.ratio
        if self.counter == 1:
            prev_t = t
            t = t + self.ratio
        else:
            self.ets.append(model_output)

        if len(self.ets) == 1 and self.counter == 0:
            mo = model_output
            self.cur_sample = sample
        elif len(self.ets) == 1 and self.counter == 1:
            mo = (model_output + self.ets[-1]) / 2.0
            sample = self.cur_sample
        elif len(self.ets) == 2:
            mo = (3.0 * self.ets[-1] - self.ets[-2]) / 2.0
        elif len(self.ets) == 3:
            mo = (23.0 * self.ets[-1] - 16.0 * self.ets[-2]
                  + 5.0 * self.ets[-3]) / 12.0
        else:
            mo = (55.0 * self.ets[-1] - 59.0 * self.ets[-2]
                  + 37.0 * self.ets[-3] - 9.0 * self.ets[-4]) / 24.0
        self.counter += 1
        return self._prev_sample(sample, t, prev_t, mo)


class MirrorEuler:
    """diffusers EulerDiscreteScheduler, interpolation_type='linear',
    epsilon prediction, no churn."""

    def __init__(self, n):
        acp = _acp()
        self.timesteps = _leading_ts(n)
        full = ((1 - acp) / acp) ** 0.5
        sig = np.interp(self.timesteps.astype(np.float64),
                        np.arange(N_TRAIN), full)
        self.sigmas = np.concatenate([sig, [0.0]])

    def scale_model_input(self, i, sample):
        return sample / (self.sigmas[i] ** 2 + 1) ** 0.5

    def step(self, eps, i, sample):
        # pred_x0 = sample - sigma*eps; derivative = (sample - x0)/sigma = eps
        return sample + eps * (self.sigmas[i + 1] - self.sigmas[i])


class MirrorDPM2M:
    """diffusers DPMSolverMultistepScheduler, algorithm 'dpmsolver++',
    solver_order=2, solver_type 'midpoint', final boundary at t=0,
    lower_order_final=True (first-order on the last step of <15-step runs)."""

    def __init__(self, n):
        self.acp = _acp()
        self.timesteps = _leading_ts(n)
        self.bounds = np.concatenate([self.timesteps, [0]])
        self.m = []                      # x0 predictions, most recent last

    def _coef(self, t):
        a = self.acp[t] ** 0.5
        s = (1 - self.acp[t]) ** 0.5
        return a, s, np.log(a) - np.log(s)

    def step(self, eps, i, sample):
        t, t_next = self.bounds[i], self.bounds[i + 1]
        a_s, s_s, lam_s = self._coef(t)
        a_t, s_t, lam_t = self._coef(t_next)
        x0 = (sample - s_s * eps) / a_s
        self.m.append(x0)
        h = lam_t - lam_s
        lower_order_final = (i == len(self.timesteps) - 1
                             and len(self.timesteps) < 15)
        if len(self.m) == 1 or lower_order_final:
            d = x0
        else:
            _, _, lam_s1 = self._coef(self.bounds[i - 1])
            h_0 = lam_s - lam_s1
            r0 = h_0 / h
            d0, d1 = self.m[-1], (self.m[-1] - self.m[-2]) / r0
            d = d0 + 0.5 * d1            # midpoint
        return (s_t / s_s) * sample - a_t * np.expm1(-h) * d


# -------------------------------------------------------------------- tests
SHAPE = (2, 5)


@pytest.mark.parametrize("n_steps", [50, 10])
def test_ddim_matches_mirror(n_steps):
    sched = DDIMScheduler.create()
    ts, coeffs, state = sched.set_timesteps(n_steps)
    mirror = MirrorDDIM(n_steps)
    np.testing.assert_array_equal(np.asarray(ts), mirror.timesteps)

    eps_seq = _eps_seq(n_steps, SHAPE)
    x = x_m = np.random.RandomState(1).randn(*SHAPE)
    for i, eps in enumerate(eps_seq):
        state, x = sched.step(state, coeffs, jnp.asarray(eps, jnp.float32),
                              jnp.asarray(i), jnp.asarray(x, jnp.float32))
        x = np.asarray(x, np.float64)
        x_m = mirror.step(eps, int(mirror.timesteps[i]), x_m)
        np.testing.assert_allclose(x, x_m, atol=5e-4, rtol=1e-4)


def test_pndm_matches_mirror():
    n_steps = 50
    sched = PNDMScheduler.create()
    ts, coeffs, _ = sched.set_timesteps(n_steps)
    mirror = MirrorPNDM(n_steps)
    np.testing.assert_array_equal(np.asarray(ts), mirror.timesteps)
    assert len(mirror.timesteps) == n_steps + 1    # the duplicated warm-up t

    state = sched.init_state(SHAPE)
    eps_seq = _eps_seq(len(mirror.timesteps), SHAPE, seed=2)
    x = x_m = np.random.RandomState(3).randn(*SHAPE)
    for i, eps in enumerate(eps_seq):
        state, x = sched.step(state, coeffs, jnp.asarray(eps, jnp.float32),
                              jnp.asarray(i), jnp.asarray(x, jnp.float32))
        x = np.asarray(x, np.float64)
        x_m = mirror.step(eps, int(mirror.timesteps[i]), x_m)
        np.testing.assert_allclose(x, x_m, atol=5e-4, rtol=1e-4,
                                   err_msg=f"step {i}")


def test_euler_matches_mirror():
    n_steps = 30
    sched = EulerDiscreteScheduler.create()
    ts, coeffs, state = sched.set_timesteps(n_steps)
    mirror = MirrorEuler(n_steps)
    np.testing.assert_array_equal(np.asarray(ts), mirror.timesteps)
    np.testing.assert_allclose(np.asarray(coeffs["sigmas"], np.float64),
                               mirror.sigmas, rtol=1e-6)
    # init sigma comes from the INFERENCE schedule (ADVICE.md round-1 fix)
    assert sched.init_noise_sigma_for(n_steps) == pytest.approx(
        (mirror.sigmas[0] ** 2 + 1) ** 0.5, rel=1e-6)

    eps_seq = _eps_seq(n_steps, SHAPE, seed=4)
    x = x_m = np.random.RandomState(5).randn(*SHAPE) * float(mirror.sigmas[0])
    for i, eps in enumerate(eps_seq):
        scaled = sched.scale_model_input(coeffs, jnp.asarray(i),
                                         jnp.asarray(x, jnp.float32))
        scaled_m = mirror.scale_model_input(i, x_m)
        np.testing.assert_allclose(np.asarray(scaled, np.float64), scaled_m,
                                   atol=1e-4, rtol=1e-4)
        state, x = sched.step(state, coeffs, jnp.asarray(eps, jnp.float32),
                              jnp.asarray(i), jnp.asarray(x, jnp.float32))
        x = np.asarray(x, np.float64)
        x_m = mirror.step(eps, i, x_m)
        np.testing.assert_allclose(x, x_m, atol=5e-3, rtol=1e-4)


@pytest.mark.parametrize("n_steps", [20, 7])
def test_dpm_2m_matches_mirror(n_steps):
    sched = DPMSolverScheduler.create()
    ts, coeffs, _ = sched.set_timesteps(n_steps)
    mirror = MirrorDPM2M(n_steps)
    np.testing.assert_array_equal(np.asarray(ts), mirror.timesteps)

    state = sched.init_state(SHAPE)
    eps_seq = _eps_seq(n_steps, SHAPE, seed=6)
    x = x_m = np.random.RandomState(7).randn(*SHAPE)
    for i, eps in enumerate(eps_seq):
        state, x = sched.step(state, coeffs, jnp.asarray(eps, jnp.float32),
                              jnp.asarray(i), jnp.asarray(x, jnp.float32))
        x = np.asarray(x, np.float64)
        x_m = mirror.step(eps, i, x_m)
        np.testing.assert_allclose(x, x_m, atol=5e-4, rtol=1e-4,
                                   err_msg=f"step {i}")


def test_lcm_single_step_matches_mirror():
    """1-step LCM has no injected noise (is_last -> pure consistency output);
    mirror: x0 from eps, then c_out*x0 + c_skip*sample with the SCALED
    timestep s = t*10 (diffusers get_scalings_for_boundary_condition)."""
    sched = LCMScheduler.create()
    ts, coeffs, _ = sched.set_timesteps(1)
    state = sched.init_state(SHAPE, key=jax.random.PRNGKey(0))
    acp = _acp()
    t = int(np.asarray(ts)[0])
    # diffusers LCM timestep for 1 step from a 50-step origin schedule
    assert t == (N_TRAIN // 50) * 50 - 1               # 999

    eps = np.random.RandomState(8).randn(*SHAPE)
    x = np.random.RandomState(9).randn(*SHAPE)
    _, out = sched.step(state, coeffs, jnp.asarray(eps, jnp.float32),
                        jnp.asarray(0), jnp.asarray(x, jnp.float32))
    a_t = acp[t]
    x0 = (x - (1 - a_t) ** 0.5 * eps) / a_t ** 0.5
    s = t * 10.0
    c_skip = 0.25 / (s ** 2 + 0.25)
    c_out = s / (s ** 2 + 0.25) ** 0.5
    np.testing.assert_allclose(np.asarray(out, np.float64),
                               c_out * x0 + c_skip * x, atol=5e-4, rtol=1e-4)
