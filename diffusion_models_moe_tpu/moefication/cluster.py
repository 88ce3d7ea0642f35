"""Balanced (equal-size) k-means for expert construction.

The reference clusters the L2-normalized rows of each GEGLU gate matrix into experts
of exactly `expert_size` neurons using `k_means_constrained` (min-cost-flow
assignment per Lloyd iteration; reference: moefication/moe_utils.py:91-107,
experiments/moefy_config.yaml:3). That library is CPU/Cython; here the balanced
assignment is solved with entropic OT (Sinkhorn) in pure JAX — all matmuls, so the
one-time clustering can itself run on TPU — with a numpy greedy-capacity fallback and
exact rounding. Cluster sizes are exactly equal in all methods.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _normalize_rows(x: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(x, axis=1, keepdims=True)
    return x / np.maximum(n, 1e-12)


def _greedy_balanced_assign(dist: np.ndarray, size: int) -> np.ndarray:
    """Capacity-constrained assignment: visit points by how much they lose if
    denied their best cluster (best-vs-second margin), assign to the nearest
    cluster with remaining capacity."""
    n, k = dist.shape
    part = np.partition(dist, 1, axis=1)
    order = np.argsort(part[:, 0] - part[:, 1])    # most to lose first
    capacity = np.full(k, size, np.int64)
    labels = np.full(n, -1, np.int64)
    ranked = np.argsort(dist, axis=1)
    for i in order:
        for c in ranked[i]:
            if capacity[c] > 0:
                labels[i] = c
                capacity[c] -= 1
                break
    return labels


@functools.partial(jax.jit, static_argnames=("n_iter",))
def _sinkhorn_plan(cost: jax.Array, eps: jax.Array, n_iter: int = 50) -> jax.Array:
    """Entropic OT plan with uniform marginals: rows sum to 1/N, cols to size/N."""
    n, k = cost.shape
    log_mu = jnp.full((n, 1), -jnp.log(n))
    log_nu = jnp.full((1, k), -jnp.log(k))
    log_k = -cost / eps

    def body(carry, _):
        f, g = carry
        f = log_mu - jax.nn.logsumexp(log_k + g, axis=1, keepdims=True)
        g = log_nu - jax.nn.logsumexp(log_k + f, axis=0, keepdims=True)
        return (f, g), None

    (f, g), _ = jax.lax.scan(body, (jnp.zeros((n, 1)), jnp.zeros((1, k))),
                             None, length=n_iter)
    return jnp.exp(log_k + f + g)


def balanced_kmeans(x: np.ndarray, n_clusters: int, *, n_iter: int = 25,
                    seed: int = 0, method: str = "sinkhorn",
                    normalize: bool = True) -> np.ndarray:
    """Cluster rows of `x` into `n_clusters` equal-size clusters.

    Returns int labels (N,). N must be divisible by n_clusters
    (reference asserts the same: moefication/moe_utils.py:78).
    """
    x = np.asarray(x, np.float64)
    n = x.shape[0]
    assert n % n_clusters == 0, (n, n_clusters)
    size = n // n_clusters
    if normalize:
        x = _normalize_rows(x)

    # k-means++ style init on a deterministic RNG
    rng = np.random.RandomState(seed)
    centers = _kmeanspp_init(x, n_clusters, rng)

    labels = None
    for it in range(n_iter):
        # squared euclidean distances via gram expansion
        dist = (np.sum(x * x, axis=1, keepdims=True)
                - 2.0 * x @ centers.T
                + np.sum(centers * centers, axis=1)[None, :])
        dist = np.maximum(dist, 0.0)
        if method == "sinkhorn":
            plan = np.asarray(_sinkhorn_plan(
                jnp.asarray(dist), jnp.asarray(0.05 * (0.85 ** it))))
            # exact rounding of the soft plan: greedy on -log(plan); sanitize
            # (NaNs appear when the annealed eps underflows every logit) and
            # clamp BEFORE the log so no divide-by-zero/invalid warnings fire
            plan = np.nan_to_num(plan, nan=0.0, posinf=0.0, neginf=0.0)
            # float64: in float32 the 1e-300 floor underflows to 0 and the
            # log(0) warning this clamp exists to prevent fires anyway
            plan = plan.astype(np.float64)
            new_labels = _greedy_balanced_assign(
                -np.log(np.clip(plan, 1e-300, None)), size)
        elif method == "greedy":
            new_labels = _greedy_balanced_assign(dist, size)
        elif method == "exact":
            # native min-cost-flow solver: optimal assignment each iteration,
            # matching the reference's k_means_constrained behavior
            from diffusion_models_moe_tpu.moefication.native import (
                exact_balanced_assign)
            new_labels = exact_balanced_assign(dist, size)
        else:
            raise ValueError(method)
        if labels is not None and np.array_equal(new_labels, labels):
            break
        labels = new_labels
        for c in range(n_clusters):
            centers[c] = x[labels == c].mean(axis=0)
    return labels.astype(np.int64)


def _kmeanspp_init(x: np.ndarray, k: int, rng) -> np.ndarray:
    n = x.shape[0]
    centers = np.empty((k, x.shape[1]), x.dtype)
    centers[0] = x[rng.randint(n)]
    closest = np.full(n, np.inf)
    for c in range(1, k):
        d = np.sum((x - centers[c - 1]) ** 2, axis=1)
        closest = np.minimum(closest, d)
        probs = closest / closest.sum()
        centers[c] = x[rng.choice(n, p=probs)]
    return centers


def random_split_labels(n_neurons: int, expert_size: int) -> np.ndarray:
    """Contiguous random-split control (reference: moefication/moe_utils.py:80-89)."""
    return (np.arange(n_neurons) // expert_size).astype(np.int64)


def cluster_cost(x: np.ndarray, labels: np.ndarray,
                 normalize: bool = True) -> float:
    """Mean within-cluster squared distance (for quality tests)."""
    x = np.asarray(x, np.float64)
    if normalize:
        x = _normalize_rows(x)
    total = 0.0
    for c in np.unique(labels):
        pts = x[labels == c]
        total += np.sum((pts - pts.mean(axis=0)) ** 2)
    return total / x.shape[0]
