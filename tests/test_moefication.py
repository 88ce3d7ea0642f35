"""MoEfication tests: balanced clustering invariants + routing parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_moe_tpu import tiny_config
from diffusion_models_moe_tpu.moefication.cluster import (balanced_kmeans,
                                                          cluster_cost,
                                                          random_split_labels)
from diffusion_models_moe_tpu.moefication.moefy import (build_moe_interventions,
                                                        ff_param_paths,
                                                        gate_weights,
                                                        load_labels, moefy_unet)
from diffusion_models_moe_tpu.taps import patterns_from_labels, routing_mask


@pytest.mark.parametrize("method", ["sinkhorn", "greedy"])
def test_balanced_kmeans_exact_sizes(method):
    rng = np.random.RandomState(0)
    x = rng.randn(120, 8)
    labels = balanced_kmeans(x, 6, method=method)
    counts = np.bincount(labels, minlength=6)
    np.testing.assert_array_equal(counts, np.full(6, 20))


@pytest.mark.parametrize("method", ["sinkhorn", "greedy"])
def test_balanced_kmeans_beats_random_split(method):
    """Clustering must find structure: cost below the random-split control
    (the reference keeps RandomSplit as exactly this control,
    moefication/moe_utils.py:80-89)."""
    rng = np.random.RandomState(1)
    centers = rng.randn(6, 8) * 4
    x = np.concatenate([centers[i] + 0.1 * rng.randn(20, 8) for i in range(6)])
    perm = rng.permutation(120)
    x = x[perm]
    labels = balanced_kmeans(x, 6, method=method)
    rand = random_split_labels(120, 20)
    assert cluster_cost(x, labels) < 0.5 * cluster_cost(x, rand)
    # well-separated clusters should be recovered exactly
    true = np.repeat(np.arange(6), 20)[perm]
    for c in range(6):
        assert len(np.unique(labels[true == c])) == 1


def test_balanced_kmeans_deterministic():
    x = np.random.RandomState(2).randn(60, 4)
    l1 = balanced_kmeans(x, 3, seed=5)
    l2 = balanced_kmeans(x, 3, seed=5)
    np.testing.assert_array_equal(l1, l2)


def test_routing_mask_matches_naive():
    """Pallas/XLA routing vs a naive per-token reference implementation
    (semantics of neuron_receivers/moefy.py:15-26)."""
    rng = np.random.RandomState(0)
    h, e, k, n = 64, 8, 3, 17
    labels = rng.permutation(np.arange(h) % e)
    patterns = np.asarray(patterns_from_labels(labels, e))
    gate = rng.randn(n, h).astype(np.float32)
    mask, sel = routing_mask(jnp.asarray(gate), jnp.asarray(patterns), k)
    mask = np.asarray(mask)
    for i in range(n):
        score = patterns @ gate[i]
        top = np.argsort(-score)[:k]
        exp_mask = patterns[top].sum(0)
        np.testing.assert_allclose(mask[i], exp_mask, atol=1e-6)
    # mask zeroes exactly the neurons of unselected experts
    assert mask.min() == 0.0 and mask.max() == 1.0


def test_routing_exact_k_matches_threshold_without_ties():
    rng = np.random.RandomState(3)
    h, e, k, n = 32, 4, 2, 9
    patterns = jnp.asarray(patterns_from_labels(np.arange(h) % e, e))
    gate = jnp.asarray(rng.randn(n, h), jnp.float32)
    m1, _ = routing_mask(gate, patterns, k, exact_k=False)
    m2, _ = routing_mask(gate, patterns, k, exact_k=True)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


def test_moefy_unet_and_interventions(tmp_path):
    from diffusion_models_moe_tpu import StableDiffusionPipeline
    pipe = StableDiffusionPipeline(tiny_config())
    params = pipe.init_params(jax.random.PRNGKey(0))
    cfg = pipe.config.unet
    assert len(ff_param_paths(cfg)) == 16
    gws = gate_weights(params["unet"], cfg)
    dims = cfg.ff_dims()
    for w, d in zip(gws, dims):
        assert w.shape[0] == 4 * d
    labels = moefy_unet(params["unet"], cfg, expert_size=16, method="greedy",
                        save_path=str(tmp_path / "param_split.npz"))
    reloaded = load_labels(str(tmp_path / "param_split.npz"))
    assert set(reloaded) == set(labels)
    ivs = build_moe_interventions(labels, topk_ratio=0.5)
    assert len(ivs) == 16
    for iv, d in zip(ivs, dims):
        e = (4 * d) // 16
        assert iv.patterns.shape == (e, 4 * d)
        assert iv.k == max(int(e * 0.5), 1)
        np.testing.assert_allclose(np.asarray(iv.patterns).sum(0), 1.0)


def test_centroid_and_mlp_router():
    """Routers recover the dominant expert on separable synthetic data
    (reference: moe_utils.py ParamCenter/MLPCenter)."""
    from diffusion_models_moe_tpu.moefication.routers import (
        centroid_router, expert_activation_targets, router_topk_accuracy,
        train_mlp_router)
    rng = np.random.RandomState(0)
    d, e, per = 16, 4, 8
    h = e * per
    # gate rows clustered around e distinct directions
    dirs = rng.randn(e, d) * 3
    labels = np.repeat(np.arange(e), per)
    w = dirs[labels] + 0.1 * rng.randn(h, d)
    cents = centroid_router(w, labels)
    assert cents.shape == (e, d)
    # inputs aligned with direction j must route to expert j
    scores = (dirs / np.linalg.norm(dirs, axis=1, keepdims=True)) @ cents.T
    assert (np.argmax(scores, axis=1) == np.arange(e)).all()

    # MLP router trained on synthetic activations
    n = 512
    x = rng.randn(n, d).astype(np.float32)
    acts = np.maximum(x @ w.T, 0)            # (N, H)
    targets = expert_activation_targets(acts, labels)
    router = train_mlp_router(x, targets, hidden=32, steps=300, seed=1)
    pred = np.asarray(router.scores(x))
    acc = router_topk_accuracy(pred, targets, k=1)
    assert acc > 0.8, acc


def test_build_add_experts_boost_changes_routing():
    """AddExperts boost construction (reference:
    add_skilled_experts.py:56) and its effect through routing_mask."""
    import jax.numpy as jnp

    from diffusion_models_moe_tpu.moefication.moefy import (
        build_add_experts_boost)
    from diffusion_models_moe_tpu.taps import (patterns_from_labels,
                                               routing_mask)

    T, E, H = 3, 4, 8
    avg = np.full((T, E), 2.0, np.float32)
    boost = build_add_experts_boost(avg, np.array([False, False, False, True]))
    assert boost.shape == (T, E)
    assert boost[0, 3] == 10.0 and boost[0, :3].max() == 0.0   # 5.0 * avg
    # (T, E) skilled mask variant
    sk2 = np.zeros((T, E), bool); sk2[1, 2] = True
    b2 = build_add_experts_boost(avg, sk2, scale=3.0)
    assert b2[1, 2] == 6.0 and b2.sum() == 6.0

    # the boosted expert wins routing it would otherwise lose
    labels = np.arange(E).repeat(H // E)              # 2 neurons/expert
    patterns = patterns_from_labels(labels, E)
    gate = jnp.asarray(np.linspace(1.0, 2.0, H, dtype=np.float32)[None, :])
    _, sel = routing_mask(gate, jnp.asarray(patterns), k=1)
    assert 3 in np.flatnonzero(np.asarray(sel))       # expert 3 wins unboosted
    _, sel_b = routing_mask(gate, jnp.asarray(patterns), k=1,
                            expert_boost=jnp.asarray(100.0 * np.eye(E)[0]))
    assert 0 in np.flatnonzero(np.asarray(sel_b))     # boost flips it
