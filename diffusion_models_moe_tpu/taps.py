"""Functional taps and interventions for GEGLU FF layers.

This module replaces the reference's PyTorch forward-hook "neuron receiver" hierarchy
(reference: neuron_receivers/base_receiver.py:10-82 and subclasses) with jit-safe,
purely functional equivalents:

* **TapSpec** — a static description of which per-layer statistics to emit. The model
  `sow`s them into a flax collection; the pipeline stacks them over denoise steps, so a
  single traced scan returns `(T, ...)` stat arrays instead of 51x16 host-synced hook
  callbacks (reference: neuron_receivers/predictivity.py:25-39 implicit counters).
* **LayerIntervention / Interventions** — per-layer arrays describing how to mutate the
  gate / routing / output projection, indexed by the traced step counter. These subsume
  MOEFy, RemoveExperts, AddExperts, RemoveNeurons, WandaRemoveNeuronsFast and
  MultiConceptRemoverWanda (reference: neuron_receivers/*.py).

Timestep/layer bookkeeping is explicit: layer index is a static module attribute and
the step index is a traced scan counter, eliminating the reference's fragile
hook-order counters (reference: neuron_receivers/predictivity.py:25-30).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp

# Fill value for removed GEGLU gate neurons: ~min of GELU
# (reference: neuron_receivers/remove_skilled_neurons.py:39).
GEGLU_REMOVAL_FILL = -0.17


@dataclasses.dataclass(frozen=True)
class TapSpec:
    """Static spec of per-layer statistics to collect (all off by default).

    Each flag corresponds to a reference receiver:
      max_gate        -> NeuronPredictivity (max over tokens of post-act gate;
                         reference: neuron_receivers/predictivity.py:42-62)
      mean_gate       -> GELU/PixArt predictivity path (mean over tokens)
      gate_sparsity   -> SparsityMeasure (% exact zeros;
                         reference: neuron_receivers/sparsity_measure.py:6-45)
      save_gate       -> SaveStates (full post-act gate tensors;
                         reference: neuron_receivers/save_states.py:20-33)
      ff_out_colnorm_sq -> Wanda receiver: sum over tokens of squared entries of the
                         row-normalized FF inner output (input to W2). Accumulating the
                         *squared* norms makes cross-step/prompt accumulation a plain
                         add; sqrt at the end reproduces ColumnNormCalculator
                         (reference: utils.py:316-334, neuron_receivers/wanda_receiver.py:37-60)
      expert_scores_max -> ExpertPredictivity (max expert routing score;
                         reference: neuron_receivers/expert_activation.py:46-63)
      expert_freq     -> FrequencyMeasure (per-expert selection count weighted 1/seq_len,
                         batch element 0 only; reference: neuron_receivers/frequency_measure.py:42-64)
      expert_sel      -> GetExperts (per-expert "selected by any token" counts over the
                         full batch; reference: neuron_receivers/get_experts.py:50-83)
      save_eps        -> BaseUNetReceiver (per-step CFG-combined noise prediction,
                         for the noise-difference HPO objective;
                         reference: neuron_receivers/base_unet_receiver.py:25-45)
    """
    max_gate: bool = False
    mean_gate: bool = False
    gate_sparsity: bool = False
    save_gate: bool = False
    ff_out_colnorm_sq: bool = False
    expert_scores_max: bool = False
    expert_freq: bool = False
    expert_sel: bool = False
    save_eps: bool = False

    def any_gate_stat(self) -> bool:
        return (self.max_gate or self.mean_gate or self.gate_sparsity
                or self.save_gate or self.ff_out_colnorm_sq)

    def any_expert_stat(self) -> bool:
        return self.expert_scores_max or self.expert_freq or self.expert_sel


@flax.struct.dataclass
class LayerIntervention:
    """Arrays mutating one FF layer's forward pass. All fields optional.

    Shapes use H = gate width (4*dim), D = model dim, E = number of experts,
    T = number of intervention steps (indexed by the traced scan step).

    patterns:     (E, H) 0/1 expert membership; row e marks the neurons of expert e
                  (reference: moefication/helper.py:48-62). Presence + k>0 enables
                  top-k routing (MOEFy; reference: neuron_receivers/moefy.py:10-27).
    k:            static top-k expert count (int(E * topk_ratio)). k > 0 routes
                  (masks the gate); k < 0 only OBSERVES top-|k| selection for
                  expert taps without touching the gate; k == 0 observes top-1.
    expert_remove:(T, E) bool — zero these experts' pattern rows at step t before
                  routing (RemoveExperts; reference:
                  neuron_receivers/remove_skilled_experts.py:24-55).
    expert_boost: (T, E) float added to routing scores (AddExperts boosts skilled
                  experts by 5*std; reference: neuron_receivers/add_skilled_experts.py:35-60).
    neuron_mask:  (T, H) bool — replace these gate values with `neuron_fill`
                  (RemoveNeurons; reference: neuron_receivers/remove_skilled_neurons.py:26-57).
    neuron_fill:  static fill value (GEGLU: -0.17; GELU path: 0.0).
    out_weight_mask: (H, D) or (T, H, D) bool — zero these entries of the output
                  projection kernel (WandaRemoveNeuronsFast's masked F.linear;
                  reference: neuron_receivers/remove_wanda_neurons_fast.py:69-83).
                  Note: stored in flax kernel layout (in, out) = W2^T.
    token_mask:   (S,) bool — restrict tap statistics to these token positions
                  (bounding-box variants; reference: neuron_receivers/neuron_predictivity_bb.py:43-63).
    """
    patterns: Optional[jax.Array] = None
    k: int = flax.struct.field(pytree_node=False, default=0)
    expert_remove: Optional[jax.Array] = None
    expert_boost: Optional[jax.Array] = None
    neuron_mask: Optional[jax.Array] = None
    neuron_fill: float = flax.struct.field(pytree_node=False, default=GEGLU_REMOVAL_FILL)
    out_weight_mask: Optional[jax.Array] = None
    token_mask: Optional[jax.Array] = None


# Per-layer tuple, length n_ff_layers; entries may be None.
Interventions = Tuple[Optional[LayerIntervention], ...]


def no_interventions(n_layers: int) -> Interventions:
    return tuple([None] * n_layers)


def layer_name(idx: int) -> str:
    """Canonical FF layer key used in tap dicts and artifacts."""
    return f"ff_{idx:02d}"


def routing_mask(gate2d: jax.Array, patterns: jax.Array, k: int,
                 expert_boost: Optional[jax.Array] = None,
                 exact_k: bool = False) -> tuple[jax.Array, jax.Array]:
    """Top-k expert routing: returns (neuron mask (N,H), selected experts (N,E)).

    score[n,e] = sum of post-act gate over expert e's neurons; the k highest-scoring
    experts per token are kept and the union of their neuron sets forms the mask
    (reference: neuron_receivers/moefy.py:15-26).

    By default selection is `score >= kth_largest` (threshold semantics): on exact
    score ties more than k experts may be kept. `exact_k=True` reproduces torch.topk's
    exact-k tie-breaking via scatter (slower; used in parity tests).
    """
    n, _ = gate2d.shape
    e = patterns.shape[0]
    score = jax.lax.dot_general(
        gate2d, patterns,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (N, E)
    if expert_boost is not None:
        score = score + expert_boost.astype(score.dtype)
    if exact_k:
        _, idx = jax.lax.top_k(score, k)             # (N, k)
        sel = jnp.zeros((n, e), jnp.float32).at[
            jnp.arange(n)[:, None], idx].set(1.0)
    else:
        kth = jax.lax.top_k(score, k)[0][:, -1:]     # (N, 1)
        sel = (score >= kth).astype(jnp.float32)     # (N, E)
    mask = jax.lax.dot_general(
        sel, patterns.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (N, H) in {0,1}
    return mask.astype(gate2d.dtype), sel


def patterns_from_labels(labels, n_experts: int) -> jnp.ndarray:
    """(H,) cluster labels -> (E, H) 0/1 membership matrix
    (reference: moefication/helper.py:48-62)."""
    labels = jnp.asarray(labels, jnp.int32)
    return (labels[None, :] == jnp.arange(n_experts, dtype=jnp.int32)[:, None]
            ).astype(jnp.float32)
