"""Learned expert routers: centroid and MLP variants.

Rebuild of the MoEfication-paper router construction the reference carries
(reference: moefication/moe_utils.py:109-318 BlockCenter/ParamCenter/MLPCenter,
ported there from thunlp/MoEfication and unused by the main flows, which route by
activation score at runtime). Here both variants are native:

  * ParamCenter -> `centroid_router`: expert embedding = mean of its neurons'
    gate-weight rows; route by input @ centroid^T.
  * MLPCenter   -> `train_mlp_router`: a 2-layer MLP trained with BCE against the
    per-expert positive-activation mass of reference activations
    (reference objective: moe_utils.py:207-318).

Routers produce per-token expert scores compatible with `routing_mask`'s top-k
selection, so a trained router can replace activation routing in the FF layer by
precomputing `expert_boost` or a custom score path.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


def centroid_router(gate_weights: np.ndarray, labels: np.ndarray,
                    normalize: bool = True) -> np.ndarray:
    """(H, D) gate rows + (H,) labels -> (E, D) expert centroids
    (reference: moe_utils.py:156-200 ParamCenter.cal_center)."""
    w = np.asarray(gate_weights, np.float64)
    if normalize:
        w = w / np.maximum(np.linalg.norm(w, axis=1, keepdims=True), 1e-12)
    labels = np.asarray(labels)
    n_experts = int(labels.max()) + 1
    return np.stack([w[labels == e].mean(axis=0) for e in range(n_experts)])


def expert_activation_targets(acts: np.ndarray, labels: np.ndarray,
                              relu: bool = True) -> np.ndarray:
    """(N, H) activations -> (N, E) normalized per-expert positive mass, the BCE
    target of the MLP router (reference: moe_utils.py:240-270)."""
    a = np.asarray(acts, np.float64)
    if relu:
        a = np.maximum(a, 0.0)
    labels = np.asarray(labels)
    n_experts = int(labels.max()) + 1
    onehot = (labels[None, :] == np.arange(n_experts)[:, None])  # (E, H)
    mass = a @ onehot.T                                          # (N, E)
    denom = np.maximum(mass.max(axis=1, keepdims=True), 1e-12)
    return mass / denom


@dataclasses.dataclass
class MLPRouter:
    params: dict
    hidden: int

    def scores(self, x: jax.Array) -> jax.Array:
        h = jax.nn.tanh(x @ self.params["w1"] + self.params["b1"])
        return h @ self.params["w2"] + self.params["b2"]


def train_mlp_router(inputs: np.ndarray, targets: np.ndarray,
                     hidden: int = 64, lr: float = 1e-2, steps: int = 500,
                     batch: int = 256, seed: int = 0) -> MLPRouter:
    """Train input -> expert-mass router with sigmoid BCE
    (reference: moe_utils.py:207-318 MLPCenter.cal_center)."""
    x = jnp.asarray(inputs, jnp.float32)
    y = jnp.asarray(targets, jnp.float32)
    d, e = x.shape[1], y.shape[1]
    k0, k1 = jax.random.split(jax.random.PRNGKey(seed))
    params = {
        "w1": jax.random.normal(k0, (d, hidden)) * (1.0 / np.sqrt(d)),
        "b1": jnp.zeros(hidden),
        "w2": jax.random.normal(k1, (hidden, e)) * (1.0 / np.sqrt(hidden)),
        "b2": jnp.zeros(e),
    }
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    def loss_fn(p, xb, yb):
        h = jax.nn.tanh(xb @ p["w1"] + p["b1"])
        logits = h @ p["w2"] + p["b2"]
        return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, yb))

    @jax.jit
    def step(p, opt_state, xb, yb):
        loss, grads = jax.value_and_grad(loss_fn)(p, xb, yb)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(p, updates), opt_state, loss

    n = x.shape[0]
    rng = np.random.RandomState(seed)
    for i in range(steps):
        idx = rng.randint(0, n, min(batch, n))
        params, opt_state, _ = step(params, opt_state, x[idx], y[idx])
    return MLPRouter(params=jax.device_get(params), hidden=hidden)


def router_topk_accuracy(scores: np.ndarray, targets: np.ndarray,
                         k: int) -> float:
    """Fraction of true top-k experts recovered by the router (the acc metric the
    reference saves next to each center, moe_utils.py:126-129)."""
    s_top = np.argsort(-np.asarray(scores), axis=1)[:, :k]
    t_top = np.argsort(-np.asarray(targets), axis=1)[:, :k]
    hits = [len(set(a) & set(b)) / k for a, b in zip(s_top, t_top)]
    return float(np.mean(hits))
