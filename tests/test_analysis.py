"""Unit tests for stats accumulators and skill selectors (pure numpy/scipy)."""
import numpy as np

from diffusion_models_moe_tpu.analysis.selectors import (
    greater_skilled_experts, intersect_over_seeds,
    moefy_compare_skilled_experts, prediction_accuracy_skilled,
    random_masks_like, skilled_neurons_to_experts, t_test_skilled,
    wanda_mask_to_flax, wanda_skilled)
from diffusion_models_moe_tpu.analysis.stats import (ColumnNormAccumulator,
                                                     PairedDiffStd,
                                                     TapAccumulator,
                                                     WelfordArray)


def test_welford_matches_numpy():
    rng = np.random.RandomState(0)
    xs = rng.randn(50, 3, 7)
    w = WelfordArray()
    for x in xs:
        w.update(x)
    np.testing.assert_allclose(w.mean, xs.mean(0), atol=1e-12)
    np.testing.assert_allclose(w.std(), xs.std(0, ddof=1), atol=1e-12)


def test_column_norm_accumulator_matches_direct():
    """Incremental column norms == direct norm of the stacked matrix — the
    invariant the reference self-tests (neuron_receivers/wanda_receiver.py:75-123)."""
    rng = np.random.RandomState(1)
    chunks = [rng.randn(5, 2, 8) for _ in range(4)]  # per-prompt (T=2, H=8) sq-sums
    acc = ColumnNormAccumulator()
    full = []
    for rows in chunks:
        # simulate the tap output: sum of squared normalized rows
        normed = rows / np.linalg.norm(rows, axis=-1, keepdims=True)
        acc.update({0: np.sum(normed ** 2, axis=0)})
        full.append(normed)
    direct = np.sqrt(np.sum(np.concatenate(full, 0) ** 2, axis=0))
    np.testing.assert_allclose(acc.norms()[0], direct, atol=1e-10)


def test_tap_accumulator_save(tmp_path):
    acc = TapAccumulator()
    rng = np.random.RandomState(2)
    for _ in range(3):
        acc.update({0: rng.randn(2, 4), 1: rng.randn(2, 6)})
    acc.save(str(tmp_path / "predictivity_base.json"))
    import json
    data = json.load(open(tmp_path / "predictivity_base.json"))
    assert set(data["time_steps"]) == {"0", "1"}
    assert len(data["time_steps"]["0"]["0"]["avg"]) == 4


def test_t_test_selector_detects_shift():
    rng = np.random.RandomState(3)
    n, t, h = 30, 2, 16
    base = rng.randn(n, t, h)
    adj = base.copy()
    adj[:, :, :4] += 3.0  # neurons 0-3 respond strongly to the concept
    bacc, aacc, dstd = TapAccumulator(), TapAccumulator(), PairedDiffStd()
    for i in range(n):
        bacc.update({0: base[i]})
        aacc.update({0: adj[i]})
        dstd.update({0: base[i]}, {0: adj[i]})
    skilled = t_test_skilled(bacc.mean()[0], aacc.mean()[0], dstd.std()[0],
                             n, conf=0.01)
    assert skilled[:, :4].all() and not skilled[:, 4:].any()
    rs, ru = random_masks_like(skilled, seed=0)
    assert rs.sum() == skilled.sum()
    assert not (ru & skilled).any()


def test_prediction_accuracy_selector():
    rng = np.random.RandomState(4)
    n, t, h = 40, 2, 20
    labels = rng.randint(0, 2, n)
    base = rng.randn(n, t, h)
    adj = base + 0.1 * rng.randn(n, t, h)
    adj[:, :, 0] = base[:, :, 0] + (labels * 2 - 1)[:, None]  # neuron 0 predicts
    skilled = prediction_accuracy_skilled(base, adj, labels, ratio=0.05)
    assert skilled[:, 0].all()
    assert skilled.sum(-1).max() == 1  # top 5% of 20 = exactly 1 per (t,)


def test_wanda_selector():
    rng = np.random.RandomState(5)
    t, d, h = 3, 6, 10
    w2 = np.ones((d, h))
    base_n = np.abs(rng.randn(t, h))
    adj_n = base_n.copy()
    adj_n[:, 0] = base_n[:, 0] * 100.0 + 10.0
    skilled = wanda_skilled(w2, base_n, adj_n, skill_ratio=0.1)  # top-1 per row
    assert skilled.shape == (t, d, h)
    assert skilled[..., 0].all()
    assert skilled.sum() == t * d
    fl = wanda_mask_to_flax(skilled)
    assert fl.shape == (t, h, d)


def test_expert_selectors():
    labels = np.array([0, 0, 1, 1, 2, 2])
    skilled = np.array([[1, 1, 1, 0, 0, 0]], bool)
    exp = skilled_neurons_to_experts(skilled, labels, skill_ratio=0.6)
    np.testing.assert_array_equal(exp, [[True, False, False]])
    base_m = np.zeros((1, 6)); adj_m = np.zeros((1, 6)); std = np.ones((1, 6))
    adj_m[0, 2:4] = 5.0
    g = greater_skilled_experts(base_m, adj_m, std, labels, skill_ratio=0.5)
    np.testing.assert_array_equal(g, [[False, True, False]])
    sel_b = np.array([[1, 0, 2]]); sel_a = np.array([[1, 3, 0]])
    np.testing.assert_array_equal(
        moefy_compare_skilled_experts(sel_b, sel_a), [[False, True, False]])
    m = intersect_over_seeds([np.array([True, True]), np.array([True, False])])
    np.testing.assert_array_equal(m, [True, False])


def test_moefy_compare_per_prompt_reference_rule():
    """Per-prompt set-difference counting with the int(skill_ratio * P)
    threshold (reference: moefy_skilled_experts.py:94-121) — differs from the
    aggregate any/never variant when base occasionally selects an expert."""
    from diffusion_models_moe_tpu.analysis.selectors import (
        moefy_compare_skilled_experts,
        moefy_compare_skilled_experts_per_prompt)

    # P=4 prompts, T=1, E=2. Expert 0: adj always, base in ONE prompt ->
    # per-prompt diff fires 3/4 times. Expert 1: never differs.
    base = np.zeros((4, 1, 2), bool); adj = np.zeros((4, 1, 2), bool)
    adj[:, 0, 0] = True
    base[0, 0, 0] = True
    base[:, 0, 1] = adj[:, 0, 1] = True
    out = moefy_compare_skilled_experts_per_prompt(base, adj, skill_ratio=0.7)
    np.testing.assert_array_equal(out, [[True, False]])   # 3 >= int(0.7*4)=2
    # the aggregate variant misses expert 0 (base selected it once)
    agg = moefy_compare_skilled_experts(base.sum(0), adj.sum(0))
    np.testing.assert_array_equal(agg, [[False, False]])
    # symmetric difference counts base-only selections too: make base (and
    # not adj) select expert 1 in two prompts
    base2 = base.copy(); adj2 = adj.copy()
    base2[:2, 0, 1] = True; adj2[:, 0, 1] = False; base2[2:, 0, 1] = False
    asym = moefy_compare_skilled_experts_per_prompt(base2, adj2, 0.5)
    np.testing.assert_array_equal(asym, [[True, False]])   # adj-minus-base only
    sym = moefy_compare_skilled_experts_per_prompt(base2, adj2, 0.5, symm=True)
    np.testing.assert_array_equal(sym, [[True, True]])     # 2 >= int(0.5*4)=2
    # a floor-zero threshold still needs one occurrence: the reference
    # thresholds Counter entries, which only exist for experts in >= 1 diff
    allpass = moefy_compare_skilled_experts_per_prompt(base, adj, 0.1)
    np.testing.assert_array_equal(allpass, [[True, False]])
    # threshold is floor + >=: skill_ratio=1.0 -> needs all 4, only 3 fire
    strict = moefy_compare_skilled_experts_per_prompt(base, adj, 1.0)
    np.testing.assert_array_equal(strict, [[False, False]])
    import pytest as _pytest
    with _pytest.raises(ValueError):
        moefy_compare_skilled_experts_per_prompt(base[0], adj[0], 0.5)


def test_image_grid(tmp_path):
    """Row-major grid stitch with black padding (reference
    notebooks/make_mem_grid.py)."""
    import numpy as np
    from PIL import Image
    from diffusion_models_moe_tpu.analysis.plots import image_grid

    imgs = [np.full((4, 4, 3), i / 10.0) for i in range(5)]
    out = tmp_path / "grid.png"
    image_grid(imgs, str(out), n_cols=3)
    arr = np.asarray(Image.open(out))
    assert arr.shape == (8, 12, 3)         # 2 rows x 3 cols of 4px
    assert (arr[4:, 8:] == 0).all()        # padded slot is black


def test_plot_metric_vs_confidence(tmp_path):
    """Conf-sweep multi-panel plot (reference notebooks/plot_fid_conf.py)."""
    from diffusion_models_moe_tpu.analysis.plots import plot_metric_vs_confidence

    out = tmp_path / "conf.png"
    plot_metric_vs_confidence(
        {"naked": [(0.2, 1.0), (0.01, 2.0)],
         "Van Gogh": [(0.2, 3.0), (0.01, 4.0)]},
        str(out), ylabel="FID", title="t")
    assert out.exists() and out.stat().st_size > 0


def test_average_results_clamp_quirk():
    """calc_average.py's clamp: values <= 0.45 count as 1 before the mean."""
    from diffusion_models_moe_tpu.analysis.plots import average_results

    rows = [{"acc": 0.9, "sim": 0.4}, {"acc": 0.5, "sim": 0.8}]
    out = average_results(rows)
    assert out["acc"] == (0.9 + 0.5) / 2
    assert out["sim"] == (1.0 + 0.8) / 2          # 0.4 clamped to 1
    assert average_results([]) == {}


def test_image_grid_mixed_inputs(tmp_path):
    """Mixed sizes pad into the slot; grayscale/RGBA normalize; empty raises."""
    import numpy as np
    import pytest as _pytest
    from PIL import Image
    from diffusion_models_moe_tpu.analysis.plots import image_grid

    imgs = [np.ones((4, 4, 3)), np.ones((2, 3)),          # small grayscale
            np.ones((4, 4, 4))]                           # RGBA
    out = tmp_path / "g.png"
    image_grid(imgs, str(out), n_cols=3)
    arr = np.asarray(Image.open(out))
    assert arr.shape == (4, 12, 3)
    assert (arr[:2, 4:7] == 255).all()       # grayscale content placed
    assert (arr[2:, 4:8] == 0).all()         # padded region black
    with _pytest.raises(ValueError):
        image_grid([], str(out))
