"""Concept-erasure mask construction, union baking, and multi-concept composition.

Covers the reference's L5 intervention layer (SURVEY.md §2.5):
  * dynamic removal interventions (RemoveNeurons / RemoveExperts / Wanda masks)
  * union-over-timesteps static mask baking into pruned weights
    (reference: benchmarks/save_union_over_time.py:189-246, save_union_over_ap.py:90+)
  * multi-concept unions (reference: benchmarks/multi_concept_union.py:57-100,
    neuron_receivers/multi_concept_remover.py:13-99)

Masks live as dense boolean numpy arrays keyed by FF layer index; the "sparse pickle"
storage migration of the reference (benchmarks/efficient_storage.py:50-88) is
unnecessary — npz compresses boolean masks natively.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from diffusion_models_moe_tpu.taps import (GEGLU_REMOVAL_FILL, Interventions,
                                           LayerIntervention, layer_name,
                                           patterns_from_labels)

MaskDict = dict[int, np.ndarray]   # layer index -> (T, ...) bool


# --------------------------------------------------------------------- storage
def save_masks(path: str, masks: MaskDict) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **{str(l): np.asarray(m, bool)
                                 for l, m in masks.items()})


def load_masks(path: str) -> MaskDict:
    with np.load(path) as z:
        return {int(k): z[k] for k in z.files}


def union_masks(mask_sets: Sequence[MaskDict]) -> MaskDict:
    """OR masks across concepts (reference: benchmarks/multi_concept_union.py:57-100;
    runtime equivalent of MultiConceptRemoverWanda's on-the-fly OR,
    neuron_receivers/multi_concept_remover.py:55-99)."""
    out: MaskDict = {}
    for masks in mask_sets:
        for l, m in masks.items():
            out[l] = (out[l] | np.asarray(m, bool)) if l in out else np.asarray(m, bool)
    return out


def union_over_timesteps(masks: MaskDict, select_ratio: float) -> MaskDict:
    """Collapse per-timestep masks to one static mask per layer: keep entries present
    in more than `select_ratio * T` timesteps
    (reference: benchmarks/save_union_over_time.py:192-211).
    Input (T, ...) bool per layer; output (...) bool per layer."""
    out = {}
    for l, m in masks.items():
        m = np.asarray(m, bool)
        t = m.shape[0]
        out[l] = m.sum(axis=0) > (select_ratio * t)
    return out


def mask_iou(a: MaskDict, b: MaskDict) -> float:
    """IoU of two mask sets (reference: iou_masks.py:8-60)."""
    inter = union = 0
    for l in set(a) | set(b):
        ma = np.asarray(a.get(l, 0), bool)
        mb = np.asarray(b.get(l, 0), bool)
        inter += int(np.sum(ma & mb))
        union += int(np.sum(ma | mb))
    return inter / union if union else 0.0


# -------------------------------------------------------- dynamic interventions
def _n_layers_for(masks: MaskDict, n_layers: Optional[int]) -> int:
    """Cover every masked layer. A fixed default of 16 (SD1.x) would silently
    drop layers >= 16 on SDXL's 70 depth-stacked FFs."""
    if n_layers is not None:
        return n_layers
    return max(1 + max((int(l) for l in masks), default=15), 16)


def _windowed(m: np.ndarray, max_timestep: Optional[int]) -> np.ndarray:
    """Apply the exclusive removal window t < max_timestep to a (T, ...) or
    static (...) mask. The runtime indexes mask[t] with a traced scan step that
    JAX CLAMPS at the last row, so a static mask under a window is expanded to
    (max_timestep + 1, ...) with an all-False final row: steps past the window
    clamp onto that False row instead of silently re-applying the mask."""
    if max_timestep is None:
        return m
    if m.ndim >= 2 and m.shape[0] > 1:
        m = m.copy()
        m[max_timestep:] = False
        return m
    static = m[0] if m.ndim >= 2 else m
    rows = np.repeat(static[None], max_timestep, axis=0)
    return np.concatenate([rows, np.zeros_like(static[None])], axis=0)


def neuron_removal_interventions(
        masks: MaskDict, n_layers: Optional[int] = None,
        fill: float = GEGLU_REMOVAL_FILL,
        max_timestep: Optional[int] = None) -> Interventions:
    """(T, H) or (H,) skilled-neuron masks -> RemoveNeurons interventions.

    `fill` = -0.17 for GEGLU, 0.0 for the GELU path. `max_timestep` is the
    EXCLUSIVE window bound (removal active for t < max_timestep): the
    reference's GELU-path 't <= 5' window is max_timestep=6
    (reference: neuron_receivers/remove_skilled_neurons.py:39-51)."""
    ivs = []
    for l in range(_n_layers_for(masks, n_layers)):
        if l not in masks:
            ivs.append(None)
            continue
        m = np.asarray(masks[l], bool)
        m = _windowed(m, max_timestep)
        if m.ndim == 1:
            m = m[None, :]
        ivs.append(LayerIntervention(neuron_mask=m, neuron_fill=fill))
    return tuple(ivs)


def expert_removal_interventions(
        expert_masks: MaskDict, labels: dict[str, np.ndarray], topk_ratio: float,
        n_layers: Optional[int] = None,
        max_timestep: Optional[int] = 20) -> Interventions:
    """(T, E) or (E,) skilled-expert masks + cluster labels -> RemoveExperts
    interventions. The reference zeroes expert pattern rows only for
    timestep < 20 — `max_timestep` is that exclusive bound
    (reference: neuron_receivers/remove_skilled_experts.py:32-33)."""
    from diffusion_models_moe_tpu.moefication.moefy import \
        build_moe_interventions

    remove = {}
    for l, m in expert_masks.items():
        rm = _windowed(np.asarray(m, bool), max_timestep)
        if rm.ndim == 1:
            rm = rm[None, :]
        remove[layer_name(l)] = rm.astype(np.float32)
    if n_layers is None:
        n_layers = max(_n_layers_for(expert_masks, None),
                       1 + max((int(k.rsplit("_", 1)[1]) for k in labels),
                               default=15))
    return build_moe_interventions(labels, topk_ratio, n_layers=n_layers,
                                   expert_remove=remove)


def wanda_removal_interventions(masks_dh: MaskDict,
                                n_layers: Optional[int] = None
                                ) -> Interventions:
    """Wanda (D, H)/(T, D, H) reference-orientation masks (the orientation
    `wanda_pipeline` emits and the CLI stores) -> out_weight_mask interventions
    in flax (H, D) orientation
    (reference: neuron_receivers/remove_wanda_neurons_fast.py:69-83)."""
    ivs = []
    for l in range(_n_layers_for(masks_dh, n_layers)):
        if l not in masks_dh:
            ivs.append(None)
            continue
        m = np.swapaxes(np.asarray(masks_dh[l], bool), -1, -2)
        ivs.append(LayerIntervention(out_weight_mask=m))
    return tuple(ivs)


# ------------------------------------------------------------------ mask baking
def bake_wanda_masks(unet_params: dict, cfg, masks_dh: MaskDict) -> dict:
    """Statically prune the FF output projections: W2 *= (1 - mask). This is the
    shippable erased checkpoint (reference: benchmarks/save_union_over_time.py:219-246,
    loaded by eval at benchmarks/eval_coco.py:224-235). Masks in reference (D, H)
    orientation, static (no T axis). Returns a new param tree."""
    import jax
    from diffusion_models_moe_tpu.moefication.moefy import ff_param_paths

    params = jax.tree_util.tree_map(lambda x: x, unet_params)  # shallow-ish copy
    paths = ff_param_paths(cfg)
    for l, mask in masks_dh.items():
        node = params
        for k in paths[l]:
            node = node[k]
        kern = np.asarray(node["out_proj_kernel"])             # (H, D)
        keep = 1.0 - np.swapaxes(np.asarray(mask, np.float32), -1, -2)
        node["out_proj_kernel"] = (kern * keep).astype(kern.dtype)
    return params


def bake_gate_masks(unet_params: dict, cfg, masks_h: MaskDict) -> dict:
    """Statically prune gate-half columns of the FF up-projection (the AP/union-AP
    variant pruning ff.net.0.proj's gate half;
    reference: benchmarks/save_union_over_ap.py:90+). masks: (H,) bool per layer.

    Deliberate deviation: the gate BIAS entries are zeroed along with the
    kernel columns. The reference edits only the weight, which leaves a pruned
    neuron emitting gelu(bias)*hidden on every token — the concept pathway
    leaks through the bias. Zeroing both makes the neuron truly silent."""
    import jax
    from diffusion_models_moe_tpu.moefication.moefy import ff_param_paths

    params = jax.tree_util.tree_map(lambda x: x, unet_params)
    paths = ff_param_paths(cfg)
    for l, mask in masks_h.items():
        node = params
        for k in paths[l]:
            node = node[k]
        kern = np.asarray(node["proj"]["kernel"])              # (D, 2H)
        h = kern.shape[1] // 2
        keep = np.ones(kern.shape[1], np.float32)
        keep[h:] = 1.0 - np.asarray(mask, np.float32)
        node["proj"]["kernel"] = (kern * keep[None, :]).astype(kern.dtype)
        # the gate pre-activation also carries a bias: leaving it would make a
        # "pruned" neuron still emit gelu(bias) * hidden on every token
        bias = np.asarray(node["proj"]["bias"])                # (2H,)
        node["proj"]["bias"] = (bias * keep).astype(bias.dtype)
    return params
