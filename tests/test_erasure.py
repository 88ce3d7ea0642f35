"""Erasure tests: mask algebra, baking, and end-to-end removal effect."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_moe_tpu import StableDiffusionPipeline, tiny_config
from diffusion_models_moe_tpu.erasure.masks import (bake_gate_masks,
                                                    bake_wanda_masks,
                                                    expert_removal_interventions,
                                                    load_masks, mask_iou,
                                                    neuron_removal_interventions,
                                                    save_masks, union_masks,
                                                    union_over_timesteps,
                                                    wanda_removal_interventions)
from diffusion_models_moe_tpu.taps import GEGLU_REMOVAL_FILL, layer_name


def test_mask_algebra(tmp_path):
    a = {0: np.array([[True, False], [False, False]])}
    b = {0: np.array([[False, True], [False, False]]),
         1: np.array([[True, True]])}
    u = union_masks([a, b])
    np.testing.assert_array_equal(u[0], [[True, True], [False, False]])
    assert 1 in u
    # union over timesteps: present in > ratio*T steps
    m = {0: np.array([[True, True, False], [True, False, False]])}  # (T=2, H=3)
    static = union_over_timesteps(m, select_ratio=0.5)
    np.testing.assert_array_equal(static[0], [True, False, False])
    assert mask_iou(a, a) == 1.0
    assert mask_iou(a, b) == 0.0          # disjoint masks
    assert 0.0 < mask_iou(a, u) < 1.0     # a is a subset of the union
    save_masks(str(tmp_path / "m.npz"), u)
    r = load_masks(str(tmp_path / "m.npz"))
    np.testing.assert_array_equal(r[0], u[0])


def test_intervention_builders():
    ivs = neuron_removal_interventions({0: np.ones(8, bool)}, n_layers=3)
    assert ivs[0].neuron_mask.shape == (1, 8)
    assert ivs[0].neuron_fill == GEGLU_REMOVAL_FILL
    assert ivs[1] is None and ivs[2] is None
    # expert removal respects the t<20 window (remove_skilled_experts.py:32-33)
    labels = {"ff_00": np.arange(8) % 2}
    em = {0: np.ones((30, 2), bool)}
    ivs = expert_removal_interventions(em, labels, topk_ratio=0.5, n_layers=1,
                                       max_timestep=20)
    assert ivs[0].expert_remove[:20].all() and not ivs[0].expert_remove[20:].any()
    wiv = wanda_removal_interventions({0: np.ones((4, 8), bool)}, n_layers=1)
    assert wiv[0].out_weight_mask.shape == (8, 4)  # flax (H, D)


@pytest.fixture(scope="module")
def pipe_params():
    pipe = StableDiffusionPipeline(tiny_config())
    params = pipe.init_params(jax.random.PRNGKey(0))
    return pipe, params


def test_neuron_removal_changes_output_and_baking_matches_dynamic(pipe_params):
    """Baked Wanda checkpoint == dynamic out_weight_mask intervention, and both
    differ from baseline (the reference's bake-then-check protocol,
    save_union_over_time.py:243-276)."""
    pipe, params = pipe_params
    cfg = pipe.config
    dims = cfg.unet.ff_dims()
    rng = np.random.RandomState(0)
    # static (D, H) masks on two layers
    masks_dh = {l: rng.rand(dims[l], 4 * dims[l]) < 0.2 for l in (0, 15)}
    ivs = wanda_removal_interventions(masks_dh, n_layers=16)

    tcfg = cfg.text_encoder
    cond = jax.random.randint(jax.random.PRNGKey(5), (1, tcfg.max_length), 0,
                              tcfg.vocab_size)
    uncond = jnp.zeros_like(cond)
    key = jax.random.PRNGKey(9)
    base, _ = pipe.generate(params, cond, uncond, key, num_steps=2,
                            decode=False)
    dyn, _ = pipe.generate(params, cond, uncond, key, num_steps=2, ivs=ivs,
                           decode=False)
    assert not np.allclose(np.asarray(base), np.asarray(dyn))

    baked = dict(params, unet=bake_wanda_masks(params["unet"], cfg.unet,
                                               masks_dh))
    stat, _ = pipe.generate(baked, cond, uncond, key, num_steps=2,
                            decode=False)
    np.testing.assert_allclose(np.asarray(stat), np.asarray(dyn), atol=1e-5)
    # original params untouched
    orig = params["unet"]["down_0_attn_0"]["transformer_blocks_0"]["ff"][
        "out_proj_kernel"]
    assert np.any(np.asarray(orig) != np.asarray(
        baked["unet"]["down_0_attn_0"]["transformer_blocks_0"]["ff"][
            "out_proj_kernel"]))


def test_gate_mask_baking(pipe_params):
    pipe, params = pipe_params
    cfg = pipe.config
    h0 = 4 * cfg.unet.ff_dims()[0]
    baked = bake_gate_masks(params["unet"], cfg.unet,
                            {0: np.ones(h0, bool)})
    kern = np.asarray(
        baked["down_0_attn_0"]["transformer_blocks_0"]["ff"]["proj"]["kernel"])
    assert np.all(kern[:, h0:] == 0)          # gate half zeroed
    assert np.any(kern[:, :h0] != 0)          # hidden half intact


def test_static_mask_window_clamps_to_false():
    """A static (H,) mask under a removal window expands so the traced scan
    index (which JAX clamps at the last row) lands on an all-False row for
    t >= max_timestep — regression for the silent no-op where the window
    did nothing and removal applied at every step."""
    m = np.zeros(8, bool)
    m[2] = True
    ivs = neuron_removal_interventions({0: m}, max_timestep=5)
    nm = ivs[0].neuron_mask
    assert nm.shape == (6, 8)               # rows 0..4 active, row 5 False
    assert nm[:5].all(axis=0)[2] and not nm[5].any()
    # clamped indexing: any t >= 5 hits the False row
    assert not nm[min(30, nm.shape[0] - 1)].any()


def test_expert_window_default_static_mask():
    """(E,) static expert masks honor the default t<20 window through the
    same expansion (reference: remove_skilled_experts.py:32-33)."""
    labels = {layer_name(0): np.arange(8) % 2}
    rm = np.asarray([True, False])
    ivs = expert_removal_interventions({0: rm}, labels, topk_ratio=0.5)
    er = ivs[0].expert_remove
    assert er.shape == (21, 2)
    assert er[0, 0] == 1.0 and er[20].sum() == 0.0


def test_n_layers_derived_from_mask_keys():
    """Masks for layers >= 16 (SDXL's 70 FFs) are not silently dropped."""
    masks = {40: np.ones((2, 8), bool)}
    ivs = neuron_removal_interventions(masks)
    assert len(ivs) == 41 and ivs[40] is not None
    wiv = wanda_removal_interventions({33: np.ones((4, 8), bool)})
    assert len(wiv) == 34 and wiv[33] is not None
