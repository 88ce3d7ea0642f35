"""Native min-cost-flow balanced assignment: optimality + integration."""
import numpy as np
import pytest

from diffusion_models_moe_tpu.moefication.cluster import (balanced_kmeans,
                                                          cluster_cost)
from diffusion_models_moe_tpu.moefication.native import (exact_balanced_assign,
                                                         native_available)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="g++ toolchain unavailable")


def _brute_force_optimum(cost, capacity):
    """Exhaustive check for tiny instances."""
    import itertools
    n, k = cost.shape
    best, best_val = None, np.inf
    for labels in itertools.product(range(k), repeat=n):
        if any(labels.count(j) > capacity for j in range(k)):
            continue
        val = sum(cost[i, labels[i]] for i in range(n))
        if val < best_val:
            best, best_val = labels, val
    return best_val


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_exact_matches_brute_force(seed):
    rng = np.random.RandomState(seed)
    n, k, cap = 6, 3, 2
    cost = rng.rand(n, k)
    labels = exact_balanced_assign(cost, cap)
    counts = np.bincount(labels, minlength=k)
    assert (counts <= cap).all() and counts.sum() == n
    achieved = cost[np.arange(n), labels].sum()
    assert achieved == pytest.approx(_brute_force_optimum(cost, cap), abs=1e-9)


def test_exact_vs_scipy_lap():
    """capacity=1 reduces to the linear assignment problem."""
    from scipy.optimize import linear_sum_assignment
    rng = np.random.RandomState(7)
    cost = rng.rand(20, 20)
    labels = exact_balanced_assign(cost, 1)
    rows, cols = linear_sum_assignment(cost)
    assert cost[np.arange(20), labels].sum() == pytest.approx(
        cost[rows, cols].sum(), abs=1e-9)


def test_exact_assignment_no_worse_than_greedy_step():
    """For a fixed cost matrix the exact solver must beat (or tie) the greedy
    capacity assignment — the per-iteration guarantee Lloyd relies on."""
    from diffusion_models_moe_tpu.moefication.cluster import (
        _greedy_balanced_assign)
    rng = np.random.RandomState(1)
    cost = rng.rand(120, 6)
    exact = exact_balanced_assign(cost, 20)
    greedy = _greedy_balanced_assign(cost, 20)
    np.testing.assert_array_equal(np.bincount(exact, minlength=6),
                                  np.full(6, 20))
    assert (cost[np.arange(120), exact].sum()
            <= cost[np.arange(120), greedy].sum() + 1e-12)


def test_exact_kmeans_integration():
    rng = np.random.RandomState(1)
    x = rng.randn(120, 8)
    exact = balanced_kmeans(x, 6, method="exact")
    np.testing.assert_array_equal(np.bincount(exact, minlength=6),
                                  np.full(6, 20))
    assert np.isfinite(cluster_cost(x, exact))


def test_exact_medium_instance_fast():
    import time
    rng = np.random.RandomState(2)
    cost = rng.rand(1280, 64)
    t0 = time.perf_counter()
    labels = exact_balanced_assign(cost, 20)
    dt = time.perf_counter() - t0
    counts = np.bincount(labels, minlength=64)
    assert (counts == 20).all()
    assert dt < 30.0, f"too slow: {dt:.1f}s"
