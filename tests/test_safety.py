"""Safety subsystem: NSFW checker, blur policy, pipeline flag wiring
(reference: base_receiver.py:7-23 safety-checker monkey-patch,
modularity/remove_experts.py:17-22 blur-if-nsfw)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_moe_tpu import StableDiffusionPipeline, tiny_config
from diffusion_models_moe_tpu.safety import (CLIPNSFWChecker,
                                             apply_safety_policy,
                                             checked_generate,
                                             unsafe_concept_embeddings)


def test_nsfw_checker_thresholds():
    concepts = np.eye(2, 4, dtype=np.float32)        # 2 unsafe anchors

    def featurize(images):
        # image 0 aligned with concept 0; image 1 orthogonal
        return np.array([[1.0, 0, 0, 0], [0, 0, 0, 1.0]], np.float32)

    checker = CLIPNSFWChecker(featurize, concepts, threshold=0.5)
    flags = checker(np.zeros((2, 8, 8, 3)))
    np.testing.assert_array_equal(flags, [True, False])


def test_apply_safety_policy_blurs_only_flagged():
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    out = apply_safety_policy(imgs, np.array([True, False]), blur=True)
    out = np.asarray(out)
    assert not np.allclose(out[0], np.asarray(imgs)[0])   # blurred
    np.testing.assert_array_equal(out[1], np.asarray(imgs)[1])  # untouched
    out0 = apply_safety_policy(imgs, np.array([False, False]))
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(imgs))
    outz = np.asarray(apply_safety_policy(imgs, np.array([True, False]),
                                          blur=False))
    assert (outz[0] == 0).all()


@pytest.fixture(scope="module")
def sd_pipe():
    pipe = StableDiffusionPipeline(tiny_config())
    params = pipe.init_params(jax.random.PRNGKey(0))
    tc = pipe.config.text_encoder
    cond = jax.random.randint(jax.random.PRNGKey(3), (2, tc.max_length), 0,
                              tc.vocab_size)
    return pipe, params, cond


def test_checked_generate_flags_and_blurs(sd_pipe):
    pipe, params, cond = sd_pipe
    cfg = dataclasses.replace(pipe.config, safety_check=True, blur_nsfw=True)
    pipe_sc = StableDiffusionPipeline(cfg)
    uncond = jnp.zeros_like(cond)
    # checker that always flags image 0
    checker = CLIPNSFWChecker(
        featurize=lambda imgs: np.array([[1.0, 0], [0.0, 0]], np.float32),
        concept_embs=np.array([[1.0, 0]], np.float32), threshold=0.5)
    img_plain, _, flags0 = checked_generate(
        StableDiffusionPipeline(pipe.config), params, cond, uncond,
        jax.random.PRNGKey(0), num_steps=2)
    assert not flags0.any()                       # safety_check off: no-op
    img, _, flags = checked_generate(pipe_sc, params, cond, uncond,
                                     jax.random.PRNGKey(0), num_steps=2,
                                     checker=checker)
    np.testing.assert_array_equal(flags, [True, False])
    assert not np.allclose(np.asarray(img)[0], np.asarray(img_plain)[0])
    np.testing.assert_allclose(np.asarray(img)[1], np.asarray(img_plain)[1])
    # safety_check on without a checker is an error, not a silent skip
    with pytest.raises(ValueError):
        checked_generate(pipe_sc, params, cond, uncond, jax.random.PRNGKey(0),
                         num_steps=2)


def test_unsafe_concept_embeddings_native(sd_pipe):
    pipe, params, _ = sd_pipe
    tc = pipe.config.text_encoder

    def tokenize(texts):
        rng = np.random.RandomState(sum(len(t) for t in texts))
        ids = rng.randint(1, tc.vocab_size, (len(texts), tc.max_length))
        ids[:, -1] = 2                             # fake EOS position
        return ids.astype(np.int32)

    embs = unsafe_concept_embeddings(
        lambda ids: pipe.text_encoder.apply(
            {"params": params["text_encoder"]}, ids),
        tokenize)
    assert embs.shape == (6, tc.hidden_size)
    assert np.all(np.isfinite(embs))


def test_sld_combine_matches_safe_pipeline_equations():
    """sld_combine vs an independent numpy mirror of the safe-SD pipeline's
    eq. 3-8 ordering. Regression: the EMA (eq. 8) must consume the
    momentum-AUGMENTED safety guidance (eq. 7), and warmup must gate the
    application while momentum still accumulates."""
    import numpy as np
    from diffusion_models_moe_tpu.pipelines.sld import SLDConfig, sld_combine

    cfg = SLDConfig.strong()
    g = 7.5
    rng = np.random.RandomState(0)
    shape = (2, 4, 4, 3)
    momentum = np.zeros(shape)
    momentum_j = momentum.copy()
    for i in range(12):                       # crosses warmup_steps=7
        eps_u, eps_c, eps_s = (rng.randn(*shape) * 0.05 for _ in range(3))
        # --- numpy mirror (diffusers pipeline_stable_diffusion_safe) ------
        scale = np.clip(np.abs(eps_c - eps_s) * cfg.guidance_scale, None, 1.0)
        sg = np.where((eps_c - eps_s) >= cfg.threshold, 0.0, scale) \
            * (eps_s - eps_u)
        sg = sg + cfg.momentum_scale * momentum
        momentum = cfg.momentum_beta * momentum \
            + (1 - cfg.momentum_beta) * sg
        ng = eps_c - eps_u
        if i >= cfg.warmup_steps:
            ng = ng - sg
        want = eps_u + g * ng
        # --- framework ----------------------------------------------------
        got, momentum_j = sld_combine(
            jnp.asarray(eps_u), jnp.asarray(eps_c), jnp.asarray(eps_s),
            jnp.asarray(momentum_j), i, cfg, g)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5,
                                   err_msg=f"step {i}")
        np.testing.assert_allclose(np.asarray(momentum_j), momentum,
                                   atol=1e-5)
    # defaults are the safe-SD pipeline's Hyp-Medium operating point
    assert SLDConfig() == SLDConfig.medium()
    assert SLDConfig().guidance_scale == 1000.0
    assert SLDConfig.max().warmup_steps == 0
