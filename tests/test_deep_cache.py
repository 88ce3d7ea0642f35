"""DeepCache serving mode (config.deep_cache_interval, models/unet.py
deep_feature/return_deep): same-step splice parity, exact equivalence at
interval 1, determinism + divergence at interval 2, tap rejection, MoE
intervention compatibility, SDXL plumbing."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_moe_tpu import StableDiffusionPipeline, TapSpec, tiny_config
from diffusion_models_moe_tpu.models.unet import UNet2DCondition


def _dc_config(interval: int):
    cfg = tiny_config()
    return dataclasses.replace(cfg, deep_cache_interval=interval)


def _unet_inputs(cfg, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    x = jax.random.normal(ks[0], (2, cfg.sample_size, cfg.sample_size,
                                  cfg.unet.sample_channels))
    ctx = jax.random.normal(ks[1], (2, cfg.text_encoder.max_length,
                                    cfg.unet.cross_attention_dim))
    return x, jnp.asarray([7], jnp.int32), ctx


def test_same_step_splice_matches_full_forward():
    """Shallow forward fed the SAME step's deep feature recomputes exactly the
    layers the full forward ran on the same inputs -> identical eps."""
    cfg = tiny_config()
    unet = UNet2DCondition(cfg.unet)
    x, t, ctx = _unet_inputs(cfg)
    params = unet.init(jax.random.PRNGKey(0), x, t, ctx)["params"]
    eps_full, deep = unet.apply({"params": params}, x, t, ctx,
                                return_deep=True)
    assert deep.shape == (2, cfg.sample_size, cfg.sample_size,
                          cfg.unet.block_out_channels[1])
    eps_shallow = unet.apply({"params": params}, x, t, ctx, deep_feature=deep)
    np.testing.assert_allclose(np.asarray(eps_shallow), np.asarray(eps_full),
                               atol=1e-5, rtol=1e-5)


def test_shallow_differs_with_stale_feature():
    cfg = tiny_config()
    unet = UNet2DCondition(cfg.unet)
    x, t, ctx = _unet_inputs(cfg)
    params = unet.init(jax.random.PRNGKey(0), x, t, ctx)["params"]
    _, deep = unet.apply({"params": params}, x, t, ctx, return_deep=True)
    eps_full_later, _ = unet.apply({"params": params}, 0.5 * x, t, ctx,
                                   return_deep=True)
    eps_stale = unet.apply({"params": params}, 0.5 * x, t, ctx,
                           deep_feature=deep)
    assert float(np.abs(np.asarray(eps_stale)
                        - np.asarray(eps_full_later)).max()) > 1e-6


def test_interval_one_equals_exact_pipeline():
    """interval=1 takes the full branch every step -> bitwise-equal images
    to the uncached path (pins the cond plumbing as overhead-only)."""
    key = jax.random.PRNGKey(5)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 16), 0, 1000)
    un = jnp.zeros_like(ids)
    exact = StableDiffusionPipeline(_dc_config(0))
    params = exact.init_params(jax.random.PRNGKey(0))
    img0, _ = exact.generate(params, ids, un, key, num_steps=3)
    cached = StableDiffusionPipeline(_dc_config(1))
    img1, _ = cached.generate(params, ids, un, key, num_steps=3)
    # same math, different executable (the cond boundary can change fusion
    # choices) -> allclose, not bitwise
    np.testing.assert_allclose(np.asarray(img0), np.asarray(img1),
                               atol=1e-5, rtol=1e-5)


def test_interval_two_is_deterministic_and_approximate():
    key = jax.random.PRNGKey(5)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 16), 0, 1000)
    un = jnp.zeros_like(ids)
    exact = StableDiffusionPipeline(_dc_config(0))
    params = exact.init_params(jax.random.PRNGKey(0))
    img0, _ = exact.generate(params, ids, un, key, num_steps=4)
    cached = StableDiffusionPipeline(_dc_config(2))
    img2a, _ = cached.generate(params, ids, un, key, num_steps=4)
    img2b, _ = cached.generate(params, ids, un, key, num_steps=4)
    np.testing.assert_array_equal(np.asarray(img2a), np.asarray(img2b))
    a, b = np.asarray(img0), np.asarray(img2a)
    assert np.all(np.isfinite(b))
    assert float(np.abs(a - b).max()) > 0.0      # approximation, not identity
    # ...but a sane one: the two trajectories stay correlated
    assert float(np.abs(a - b).mean()) < 0.5


def test_deep_cache_rejects_taps():
    pipe = StableDiffusionPipeline(_dc_config(2))
    params = pipe.init_params(jax.random.PRNGKey(0))
    ids = jnp.zeros((1, 16), jnp.int32)
    with pytest.raises(ValueError, match="deep_cache"):
        pipe.generate(params, ids, ids, jax.random.PRNGKey(0), num_steps=2,
                      tap=TapSpec(gate_sparsity=True))


def test_deep_cache_with_moe_interventions():
    """Routing interventions address executed layers by their full-forward
    ff_index (the shallow trace preserves numbering)."""
    from diffusion_models_moe_tpu.moefication.moefy import (
        build_moe_interventions)
    from diffusion_models_moe_tpu.taps import layer_name

    pipe = StableDiffusionPipeline(_dc_config(2))
    params = pipe.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    labels = {layer_name(i): rng.permutation(np.arange(4 * d) % 4)
              for i, d in enumerate(pipe.config.unet.ff_dims())}
    ivs = build_moe_interventions(labels, topk_ratio=0.5)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 16), 0, 1000)
    img, _ = pipe.generate(params, ids, jnp.zeros_like(ids),
                           jax.random.PRNGKey(3), num_steps=4, ivs=ivs)
    assert np.all(np.isfinite(np.asarray(img)))


def test_sdxl_deep_cache_runs():
    from tests.test_sdxl_pipeline import _tiny_sdxl

    pipe = _tiny_sdxl()
    pipe.config = dataclasses.replace(pipe.config, deep_cache_interval=2)
    params = pipe.init_params(jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, 100)
    img, _ = pipe.generate(params, ids, jnp.zeros_like(ids),
                           jax.random.PRNGKey(2), num_steps=4)
    assert np.all(np.isfinite(np.asarray(img)))
