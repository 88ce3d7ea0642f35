"""Scheduler correctness + model-variant (SD2.1 v-pred, LCM, DPM) smoke tests."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_moe_tpu import StableDiffusionPipeline, tiny_config
from diffusion_models_moe_tpu.schedulers.common import NoiseTables
from diffusion_models_moe_tpu.schedulers.ddim import DDIMScheduler
from diffusion_models_moe_tpu.schedulers.dpm import DPMSolverScheduler
from diffusion_models_moe_tpu.schedulers.euler import EulerDiscreteScheduler
from diffusion_models_moe_tpu.schedulers.lcm import LCMScheduler
from diffusion_models_moe_tpu.schedulers.pndm import PNDMScheduler


def _denoise_pure_noise(scheduler, n_steps, shape=(1, 4, 4, 2), key=0):
    """Run a scheduler against a fake 'perfect' model on a known signal:
    x0 = 0 everywhere, so eps prediction == x_t / sqrt(1 - a_t). A correct
    scheduler must drive the sample toward 0."""
    out = scheduler.set_timesteps(n_steps)
    timesteps, coeffs, state = out
    if state is None:
        if isinstance(scheduler, LCMScheduler):
            state = scheduler.init_state(shape, key=jax.random.PRNGKey(key))
        else:
            state = scheduler.init_state(shape)
    acp = np.asarray(scheduler.tables.alphas_cumprod)
    x = jax.random.normal(jax.random.PRNGKey(key), shape) \
        * scheduler.init_noise_sigma
    for i in range(timesteps.shape[0]):
        t = int(timesteps[i])
        x_in = scheduler.scale_model_input(coeffs, i, x)
        if isinstance(scheduler, EulerDiscreteScheduler):
            sigma = float(coeffs["sigmas"][i])
            eps = x / np.sqrt(sigma ** 2 + 1) * 0 + x_in / 1.0  # x = sigma*eps
            eps = x / sigma
        else:
            eps = x / np.sqrt(max(1 - acp[min(t, 999)], 1e-8))
        state, x = scheduler.step(state, coeffs, jnp.asarray(eps), i, x)
    return np.asarray(x)


@pytest.mark.parametrize("sched_cls,steps", [
    (DDIMScheduler, 10), (PNDMScheduler, 10), (DPMSolverScheduler, 10),
    (EulerDiscreteScheduler, 10),
])
def test_scheduler_converges_to_x0(sched_cls, steps):
    sched = sched_cls.create()
    final = _denoise_pure_noise(sched, steps)
    assert np.all(np.isfinite(final))
    assert np.abs(final).max() < 0.2, f"{sched_cls.__name__}: {np.abs(final).max()}"


def test_lcm_converges_to_x0():
    final = _denoise_pure_noise(LCMScheduler.create(), 4)
    assert np.all(np.isfinite(final))
    assert np.abs(final).max() < 0.2


def test_pndm_timesteps_duplicate():
    ts, _, _ = PNDMScheduler.create().set_timesteps(50)
    ts = np.asarray(ts)
    assert ts.shape[0] == 51
    assert ts[1] == ts[2]  # PLMS warm-up duplicates the 2nd-highest timestep


def test_lcm_timesteps_subset_of_origin():
    sched = LCMScheduler.create()
    ts, _, _ = sched.set_timesteps(4)
    origin = (np.arange(1, 51) * 20 - 1)
    assert set(np.asarray(ts).tolist()) <= set(origin.tolist())


def test_add_noise_and_snr():
    tables = NoiseTables.create()
    x = jnp.ones((2, 4, 4, 1))
    noise = jnp.zeros_like(x)
    t = jnp.asarray([0, 999])
    noisy = tables.add_noise(x, noise, t)
    acp = np.asarray(tables.alphas_cumprod)
    np.testing.assert_allclose(np.asarray(noisy)[0, 0, 0, 0],
                               np.sqrt(acp[0]), rtol=1e-5)
    snr = np.asarray(tables.snr(t))
    assert snr[0] > snr[1]


def test_v_prediction_pipeline_runs():
    cfg = tiny_config()
    cfg = dataclasses.replace(cfg, scheduler="ddim",
                              prediction_type="v_prediction")
    pipe = StableDiffusionPipeline(cfg)
    params = pipe.init_params(jax.random.PRNGKey(0))
    tc = cfg.text_encoder
    cond = jax.random.randint(jax.random.PRNGKey(1), (1, tc.max_length), 0,
                              tc.vocab_size)
    img, _ = pipe.generate(params, cond, jnp.zeros_like(cond),
                           jax.random.PRNGKey(2), num_steps=2)
    assert np.all(np.isfinite(np.asarray(img)))


def test_lcm_pipeline_with_guidance_embedding():
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, scheduler="lcm",
        unet=dataclasses.replace(cfg.unet, time_cond_proj_dim=32))
    pipe = StableDiffusionPipeline(cfg)
    params = pipe.init_params(jax.random.PRNGKey(0))
    assert "time_cond_proj" in params["unet"]
    tc = cfg.text_encoder
    cond = jax.random.randint(jax.random.PRNGKey(1), (1, tc.max_length), 0,
                              tc.vocab_size)
    img, _ = pipe.generate(params, cond, jnp.zeros_like(cond),
                           jax.random.PRNGKey(2), num_steps=2,
                           guidance_scale=8.0)
    assert np.all(np.isfinite(np.asarray(img)))


def test_sd21_config_geometry():
    from diffusion_models_moe_tpu import sd21_config
    cfg = sd21_config()
    assert cfg.unet.heads_for_block(0) == 5
    assert cfg.unet.heads_for_block(3) == 20
    assert cfg.prediction_type == "v_prediction"
    assert cfg.unet.n_ff_layers == 16


def test_sld_generation_differs_from_plain():
    """SLD safety guidance must alter generations once past warmup
    (native rebuild of the reference's SD1.4-safe baseline)."""
    from diffusion_models_moe_tpu.pipelines.sld import SLDConfig, sld_generate
    cfg = tiny_config()
    pipe = StableDiffusionPipeline(cfg)
    params = pipe.init_params(jax.random.PRNGKey(0))
    tc = cfg.text_encoder
    cond = jax.random.randint(jax.random.PRNGKey(1), (1, tc.max_length), 0,
                              tc.vocab_size)
    uncond = jnp.zeros_like(cond)
    safety = jax.random.randint(jax.random.PRNGKey(2), (1, tc.max_length), 0,
                                tc.vocab_size)
    sld_cfg = SLDConfig(warmup_steps=0, guidance_scale=5000.0)
    img_sld = sld_generate(pipe, params, cond, uncond, safety,
                           jax.random.PRNGKey(3), num_steps=2, sld=sld_cfg,
                           decode=False)
    img_plain, _ = pipe.generate(params, cond, uncond, jax.random.PRNGKey(3),
                                 num_steps=2, decode=False)
    assert np.all(np.isfinite(np.asarray(img_sld)))
    assert not np.allclose(np.asarray(img_sld), np.asarray(img_plain))
    # with warmup beyond the step count and zero momentum, SLD degenerates to CFG
    sld_off = SLDConfig(warmup_steps=99, momentum_scale=0.0)
    img_off = sld_generate(pipe, params, cond, uncond, safety,
                           jax.random.PRNGKey(3), num_steps=2, sld=sld_off,
                           decode=False)
    np.testing.assert_allclose(np.asarray(img_off), np.asarray(img_plain),
                               atol=2e-3)


def test_sdxl_unet_geometry():
    """SDXL-shaped UNet (at tiny dims): depth-stacked transformers + addition
    embeddings produce the right FF census and a finite forward."""
    from diffusion_models_moe_tpu.config import UNetConfig
    from diffusion_models_moe_tpu.models.unet import UNet2DCondition
    cfg = UNetConfig(
        block_out_channels=(16, 32, 64),
        down_block_types=("plain", "cross", "cross"),
        up_block_types=("cross", "cross", "plain"),
        transformer_layers_per_block=(0, 2, 3),
        attention_head_dim=(2, 4, 8),
        cross_attention_dim=32,
        norm_num_groups=8,
        addition_embed_dim=24,
        addition_time_embed_dim=8,
    )
    # down: block1 cross 2 layers x depth2 = 4, block2 2 x depth3 = 6;
    # mid: depth3; up: block0(ch64) 3 x 3 = 9, block1(ch32) 3 x 2 = 6 -> 28
    assert cfg.n_ff_layers == 4 + 6 + 3 + 9 + 6
    assert len(cfg.ff_dims()) == cfg.n_ff_layers
    unet = UNet2DCondition(cfg)
    lat = jnp.zeros((1, 16, 16, 4))
    ctx = jnp.zeros((1, 8, 32))
    params = unet.init(jax.random.PRNGKey(0), lat, jnp.zeros((1,), jnp.int32),
                       ctx, added_text_embeds=jnp.zeros((1, 24)),
                       added_time_ids=jnp.zeros((1, 6)))["params"]
    assert "add_embedding" in params
    out = unet.apply({"params": params}, lat, jnp.asarray([3]), ctx,
                     added_text_embeds=jnp.ones((1, 24)),
                     added_time_ids=jnp.ones((1, 6)))
    assert np.all(np.isfinite(np.asarray(out)))
    # addition conditioning must change the output
    out2 = unet.apply({"params": params}, lat, jnp.asarray([3]), ctx,
                      added_text_embeds=jnp.zeros((1, 24)),
                      added_time_ids=jnp.ones((1, 6)))
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_sdxl_config_preset():
    from diffusion_models_moe_tpu.config import sdxl_config
    cfg = sdxl_config()
    # SDXL: down 2x2 + 2x10 = 24; mid 10; up 3x10 + 3x2 = 36 -> 70 GEGLU FFs
    assert cfg.unet.n_ff_layers == 70
    assert cfg.unet.heads_for_block(2) == 20
    # VAE follows the pipeline dtype (the decode dominates few-step LCM
    # serving; an f32 VAE would distort exactly that benchmark)
    assert cfg.vae.dtype == cfg.unet.dtype
    import jax.numpy as jnp
    assert sdxl_config(dtype=jnp.float32).vae.dtype == jnp.float32


def test_lcm_boundary_scalings_match_diffusers():
    """c_skip/c_out use the SCALED timestep s = t * timestep_scaling (diffusers
    LCMScheduler.get_scalings_for_boundary_condition_discrete); round-1 bug
    divided instead of multiplying (ADVICE.md high)."""
    sched = LCMScheduler.create()
    ts, coeffs, _ = sched.set_timesteps(4)
    s = np.asarray(ts, np.float64) * 10.0
    np.testing.assert_allclose(np.asarray(coeffs["c_skip"]),
                               0.25 / (s ** 2 + 0.25), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(coeffs["c_out"]),
                               s / np.sqrt(s ** 2 + 0.25), rtol=1e-5)
    # near t=0 the consistency output must be almost pure x0
    assert float(coeffs["c_skip"][-1]) < 1e-4


def test_guidance_off_generates():
    """guidance_scale <= 1.0 (CFG off) must run batch-B end-to-end — the
    context used to be built (2B,...) unconditionally and crashed."""
    pipe = StableDiffusionPipeline(tiny_config())
    params = pipe.init_params(jax.random.PRNGKey(0))
    tc = pipe.config.text_encoder
    cond = jax.random.randint(jax.random.PRNGKey(1), (1, tc.max_length), 0,
                              tc.vocab_size)
    img, _ = pipe.generate(params, cond, jnp.zeros_like(cond),
                           jax.random.PRNGKey(2), num_steps=2,
                           guidance_scale=1.0)
    assert np.all(np.isfinite(np.asarray(img)))


def test_euler_init_noise_sigma_uses_inference_schedule():
    """diffusers scales initial latents by the INFERENCE schedule's max sigma
    (set_timesteps runs first); the full-table value over-scales ~11%."""
    from diffusion_models_moe_tpu.schedulers.euler import EulerDiscreteScheduler
    s = EulerDiscreteScheduler.create()
    s50 = s.init_noise_sigma_for(50)
    assert s50 < s.init_noise_sigma
    ts, coeffs, _ = s.set_timesteps(50)
    expect = float(np.sqrt(np.asarray(coeffs["sigmas"])[0] ** 2 + 1.0))
    assert abs(s50 - expect) < 1e-4
    # the schedule-max converges to the table-max as steps -> train steps
    assert abs(s.init_noise_sigma_for(1000) - s.init_noise_sigma) < 0.2


def test_invalid_scheduler_pairings_raise():
    """v_prediction+pndm (multistep conversion diverges) and lcm without the
    guidance embedding (silently unguided) must fail fast."""
    with pytest.raises(ValueError):
        StableDiffusionPipeline(dataclasses.replace(
            tiny_config(), scheduler="pndm", prediction_type="v_prediction"))
    with pytest.raises(ValueError):
        StableDiffusionPipeline(dataclasses.replace(
            tiny_config(), scheduler="lcm"))
