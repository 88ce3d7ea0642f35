"""End-to-end pipeline tests on the tiny config (CPU).

Mirrors the reference's embedded test conventions as real unit tests (SURVEY.md §4):
determinism via fixed PRNG keys, shape/finiteness invariants, tap plumbing.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_moe_tpu import (StableDiffusionPipeline, TapSpec,
                                      tiny_config)


@pytest.fixture(scope="module")
def pipe_and_params():
    pipe = StableDiffusionPipeline(tiny_config())
    params = pipe.init_params(jax.random.PRNGKey(0))
    return pipe, params


def _ids(pipe, b=1, seed=0):
    cfg = pipe.config.text_encoder
    key = jax.random.PRNGKey(seed)
    cond = jax.random.randint(key, (b, cfg.max_length), 0, cfg.vocab_size)
    uncond = jnp.zeros_like(cond)
    return cond, uncond


def test_generate_shapes_and_determinism(pipe_and_params):
    pipe, params = pipe_and_params
    cond, uncond = _ids(pipe)
    img1, taps = pipe.generate(params, cond, uncond, jax.random.PRNGKey(7),
                               num_steps=3)
    img2, _ = pipe.generate(params, cond, uncond, jax.random.PRNGKey(7),
                            num_steps=3)
    s = pipe.config.sample_size * 8
    assert img1.shape == (1, s, s, 3)
    assert np.all(np.isfinite(np.asarray(img1)))
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))
    assert taps is None


def test_different_seed_different_image(pipe_and_params):
    pipe, params = pipe_and_params
    cond, uncond = _ids(pipe)
    img1, _ = pipe.generate(params, cond, uncond, jax.random.PRNGKey(1),
                            num_steps=2)
    img2, _ = pipe.generate(params, cond, uncond, jax.random.PRNGKey(2),
                            num_steps=2)
    assert not np.allclose(np.asarray(img1), np.asarray(img2))


def test_max_gate_taps(pipe_and_params):
    """Predictivity tap: (T, H_l) max-gate stats for all 16 FF layers
    (reference semantics: neuron_receivers/predictivity.py:42-62)."""
    pipe, params = pipe_and_params
    n_layers = pipe.config.unet.n_ff_layers
    assert n_layers == 16
    cond, uncond = _ids(pipe)
    steps = 3
    _, taps = pipe.generate(params, cond, uncond, jax.random.PRNGKey(0),
                            num_steps=steps, tap=TapSpec(max_gate=True),
                            decode=False)
    assert set(taps.keys()) == {"max_gate"}
    assert sorted(taps["max_gate"].keys()) == list(range(n_layers))
    dims = pipe.config.unet.ff_dims()
    t_expected = steps + 1 if pipe.config.scheduler == "pndm" else steps
    for l, dim in enumerate(dims):
        arr = np.asarray(taps["max_gate"][l])
        assert arr.shape == (t_expected, dim * 4), (l, arr.shape)
        assert np.all(np.isfinite(arr))


def test_gate_sparsity_tap_relufied():
    """ReLUfied tiny model: sparsity tap must report nonzero exact-zero fraction
    (reference: sparsity/check_sparsity.py:9-50)."""
    from diffusion_models_moe_tpu.config import tiny_config
    import dataclasses
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, unet=dataclasses.replace(cfg.unet, ff_activation="geglu-relu"))
    pipe = StableDiffusionPipeline(cfg)
    params = pipe.init_params(jax.random.PRNGKey(0))
    cond, uncond = _ids(pipe)
    _, taps = pipe.generate(params, cond, uncond, jax.random.PRNGKey(0),
                            num_steps=2, tap=TapSpec(gate_sparsity=True,
                                                     max_gate=True),
                            decode=False)
    for l in range(16):
        sp = np.asarray(taps["gate_sparsity"][l])
        assert np.all(sp > 0.0), "ReLU gates should have exact zeros"
        mg = np.asarray(taps["max_gate"][l])
        assert np.all(mg >= 0.0), "ReLUfied max activations must be >= 0"


def test_pndm_t_plus_one_firings(pipe_and_params):
    """PNDM duplicates one step: T tap firings == steps + 1, matching the
    reference's timesteps: 51 for 50 steps (experiments/mod_config.yaml:38)."""
    pipe, params = pipe_and_params
    assert pipe.config.scheduler == "pndm"
    cond, uncond = _ids(pipe)
    _, taps = pipe.generate(params, cond, uncond, jax.random.PRNGKey(0),
                            num_steps=4, tap=TapSpec(max_gate=True),
                            decode=False)
    assert np.asarray(taps["max_gate"][0]).shape[0] == 5

