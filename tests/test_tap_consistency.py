"""Cross-tap consistency: derived stats must agree with full gate dumps, and
interventions must act exactly as specified (the reference's self-test
conventions as real assertions; SURVEY.md §4)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_moe_tpu import (StableDiffusionPipeline, TapSpec,
                                      tiny_config)
from diffusion_models_moe_tpu.taps import (GEGLU_REMOVAL_FILL,
                                           LayerIntervention)


@pytest.fixture(scope="module")
def setup():
    pipe = StableDiffusionPipeline(tiny_config())
    params = pipe.init_params(jax.random.PRNGKey(0))
    tc = pipe.config.text_encoder
    cond = jax.random.randint(jax.random.PRNGKey(3), (1, tc.max_length), 0,
                              tc.vocab_size)
    return pipe, params, cond


def test_max_gate_matches_full_dump(setup):
    pipe, params, cond = setup
    uncond = jnp.zeros_like(cond)
    _, taps = pipe.generate(params, cond, uncond, jax.random.PRNGKey(0),
                            num_steps=2,
                            tap=TapSpec(max_gate=True, save_gate=True,
                                        gate_sparsity=True),
                            decode=False)
    for l in (0, 6, 15):
        full = np.asarray(taps["save_gate"][l])     # (T, 2B, S, H)
        mg = np.asarray(taps["max_gate"][l])        # (T, H)
        t, b, s, h = full.shape
        np.testing.assert_allclose(
            mg, full.reshape(t, b * s, h).max(axis=1), rtol=1e-5, atol=1e-5)
        sp = np.asarray(taps["gate_sparsity"][l])
        np.testing.assert_allclose(
            sp, (full.reshape(t, -1) == 0).mean(axis=1), atol=1e-6)


def test_neuron_fill_reaches_ff_output():
    """Direct unit test that the RemoveNeurons fill value reaches the FF output
    y = hidden * fill (reference invariant: remove_skilled_neurons.py:36-41).
    Taps observe the PRE-intervention gate by design, so this is checked on
    GEGLUFeedForward itself, not via save_gate."""
    from diffusion_models_moe_tpu.models.attention import GEGLUFeedForward
    dim, mult = 8, 4
    h = dim * mult
    ff = GEGLUFeedForward(dim, mult)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, dim))
    params = ff.init(jax.random.PRNGKey(1), x)["params"]
    mask = jnp.ones((1, h), bool)  # pin every gate neuron at step 0

    # fill = 0: y = hidden * 0 -> output is exactly the out-proj bias
    out0 = ff.apply({"params": params}, x, step_idx=0,
                    iv=LayerIntervention(neuron_mask=mask, neuron_fill=0.0))
    np.testing.assert_allclose(
        np.asarray(out0),
        np.broadcast_to(np.asarray(params["out_proj_bias"]), out0.shape),
        atol=1e-6)

    # fill = -0.17: output must equal (hidden * fill) @ W2 + b computed directly
    hg = x @ params["proj"]["kernel"] + params["proj"]["bias"]
    hidden = hg[..., :h]
    expected = ((hidden * GEGLU_REMOVAL_FILL) @ params["out_proj_kernel"]
                + params["out_proj_bias"])
    out1 = ff.apply({"params": params}, x, step_idx=0,
                    iv=LayerIntervention(neuron_mask=mask))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


def test_neuron_removal_changes_pipeline_output(setup):
    """End-to-end: a partial neuron mask on layer 0 must change the final
    latents (the intervention actually flows through the scanned loop)."""
    pipe, params, cond = setup
    uncond = jnp.zeros_like(cond)
    dims = pipe.config.unet.ff_dims()
    h0 = 4 * dims[0]
    mask = np.zeros((3, h0), bool)   # T=3 for 2 PNDM steps (2+1)
    mask[:, :5] = True
    ivs = tuple([LayerIntervention(neuron_mask=jnp.asarray(mask))]
                + [None] * 15)
    img_base, _ = pipe.generate(params, cond, uncond, jax.random.PRNGKey(0),
                                num_steps=2, decode=False)
    img_rm, _ = pipe.generate(params, cond, uncond, jax.random.PRNGKey(0),
                              num_steps=2, ivs=ivs, decode=False)
    assert not np.allclose(np.asarray(img_base), np.asarray(img_rm))


def test_expert_removal_blocks_selection(setup):
    """With experts removed, the removed experts must never be selected
    (reference: remove_skilled_experts.py semantics)."""
    from diffusion_models_moe_tpu.taps import patterns_from_labels
    pipe, params, cond = setup
    uncond = jnp.zeros_like(cond)
    dims = pipe.config.unet.ff_dims()
    h0 = 4 * dims[0]
    e = 8
    labels = np.arange(h0) % e
    rm = np.zeros((3, e), bool)
    rm[:, :3] = True  # remove experts 0-2 at every step
    ivs = tuple([LayerIntervention(patterns=patterns_from_labels(labels, e),
                                   k=4, expert_remove=jnp.asarray(rm, jnp.float32))]
                + [None] * 15)
    _, taps = pipe.generate(params, cond, uncond, jax.random.PRNGKey(0),
                            num_steps=2, tap=TapSpec(expert_sel=True),
                            ivs=ivs, decode=False)
    sel = np.asarray(taps["expert_sel"][0])   # (T, E) token counts
    assert np.all(sel[:, :3] == 0), sel
    assert np.all(sel[:, 3:].sum(axis=1) > 0)


def test_expert_freq_normalization(setup):
    """Frequency counts sum to k per token-step (1/seq_len weighting,
    reference: frequency_measure.py:53-60)."""
    from diffusion_models_moe_tpu.taps import patterns_from_labels
    pipe, params, cond = setup
    uncond = jnp.zeros_like(cond)
    dims = pipe.config.unet.ff_dims()
    ivs = []
    for d in dims:
        h = 4 * d
        e = 8
        ivs.append(LayerIntervention(
            patterns=patterns_from_labels(np.arange(h) % e, e), k=3))
    _, taps = pipe.generate(params, cond, uncond, jax.random.PRNGKey(0),
                            num_steps=2, tap=TapSpec(expert_freq=True),
                            ivs=tuple(ivs), decode=False)
    for l in (0, 6, 15):
        freq = np.asarray(taps["expert_freq"][l])
        np.testing.assert_allclose(freq.sum(axis=1), 3.0, rtol=1e-4)


def test_split_proj_bitwise_matches_fused(monkeypatch):
    """The dim<=640 split-projection fast path (two H-wide dots, see
    _GEGLUProj) must be bitwise identical to the fused 2H-wide dot and keep
    the nn.Dense-compatible proj/{kernel,bias} param tree."""
    from diffusion_models_moe_tpu.models.attention import GEGLUFeedForward
    ff = GEGLUFeedForward(16, 4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 16))
    params = ff.init(jax.random.PRNGKey(1), x)["params"]
    assert set(params["proj"].keys()) == {"kernel", "bias"}
    monkeypatch.setenv("DMOE_SPLIT_PROJ", "0")
    fused = ff.apply({"params": params}, x)
    monkeypatch.setenv("DMOE_SPLIT_PROJ", "1")
    split = ff.apply({"params": params}, x)
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(split))


def test_hook_sim_is_observation_only(monkeypatch):
    """DMOE_HOOK_SIM (bench-only reference-semantics mode: the FF projection
    is recomputed behind an optimization barrier, like the reference's forward
    hooks re-derive proj->chunk->gelu on every call) must not change the FF
    output, and must sow a per-layer hook_sim scalar."""
    from diffusion_models_moe_tpu.models.attention import GEGLUFeedForward
    ff = GEGLUFeedForward(16, 4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 16))
    params = ff.init(jax.random.PRNGKey(1), x)["params"]
    monkeypatch.delenv("DMOE_HOOK_SIM", raising=False)
    y0 = ff.apply({"params": params}, x)
    monkeypatch.setenv("DMOE_HOOK_SIM", "1")
    y1, taps = ff.apply({"params": params}, x, mutable=["taps"])
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    assert "hook_sim_00" in taps["taps"]


def test_ff_2d_flatten_bitwise_matches_3d(monkeypatch):
    """DMOE_FF_2D (FF dots on (B*S, C)-flattened activations — a layout
    experiment) is bitwise identical to the 3D path, including under routing
    and neuron-mask interventions (the (H,) mask broadcasts over any rank)."""
    from diffusion_models_moe_tpu.models.attention import GEGLUFeedForward
    from diffusion_models_moe_tpu.taps import (LayerIntervention,
                                               patterns_from_labels)
    ff = GEGLUFeedForward(16, 4, use_fused_routing=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 16))
    params = ff.init(jax.random.PRNGKey(1), x)["params"]
    h = 64
    nm = np.zeros((1, h), bool)
    nm[0, ::7] = True
    iv = LayerIntervention(
        patterns=patterns_from_labels(np.arange(h) % 8, 8), k=3,
        neuron_mask=jnp.asarray(nm), neuron_fill=-0.17)
    for given_iv in (None, iv):
        monkeypatch.setenv("DMOE_FF_2D", "0")
        y3 = ff.apply({"params": params}, x, step_idx=0, iv=given_iv)
        monkeypatch.setenv("DMOE_FF_2D", "1")
        y2 = ff.apply({"params": params}, x, step_idx=0, iv=given_iv)
        assert y2.shape == x.shape
        np.testing.assert_array_equal(np.asarray(y3), np.asarray(y2))


def test_hook_sim_requires_mutable_taps(monkeypatch):
    """DMOE_HOOK_SIM=1 without a mutable 'taps' collection must raise: the
    sow would be a no-op and XLA would DCE the barriered recompute, silently
    measuring the native path under a hook-sim label."""
    import pytest
    from diffusion_models_moe_tpu.models.attention import GEGLUFeedForward
    monkeypatch.setenv("DMOE_HOOK_SIM", "1")
    ff = GEGLUFeedForward(8, 2)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8))
    params = ff.init(jax.random.PRNGKey(1), x, mutable=["params", "taps"])
    with pytest.raises(ValueError, match="DMOE_HOOK_SIM"):
        ff.apply({"params": params["params"]}, x)
    # with taps mutable it runs and sows the recompute checksum
    out, aux = ff.apply({"params": params["params"]}, x, mutable=["taps"])
    assert any(k.startswith("hook_sim_") for k in aux["taps"])
