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
def neuron_removal_interventions(
        masks: MaskDict, n_layers: int = 16, fill: float = GEGLU_REMOVAL_FILL,
        max_timestep: Optional[int] = None) -> Interventions:
    """(T, H) or (H,) skilled-neuron masks -> RemoveNeurons interventions.

    `fill` = -0.17 for GEGLU, 0.0 for the GELU path; `max_timestep` reproduces the
    reference's removal windows (GELU: t<=5;
    reference: neuron_receivers/remove_skilled_neurons.py:39-51)."""
    ivs = []
    for l in range(n_layers):
        if l not in masks:
            ivs.append(None)
            continue
        m = np.asarray(masks[l], bool)
        if m.ndim == 1:
            m = m[None, :]
        if max_timestep is not None:
            m = m.copy()
            m[max_timestep:] = False
        ivs.append(LayerIntervention(neuron_mask=m, neuron_fill=fill))
    return tuple(ivs)


def expert_removal_interventions(
        expert_masks: MaskDict, labels: dict[str, np.ndarray], topk_ratio: float,
        n_layers: int = 16, max_timestep: Optional[int] = 20) -> Interventions:
    """(T, E) skilled-expert masks + cluster labels -> RemoveExperts interventions.
    The reference zeroes expert pattern rows only for timestep < 20
    (reference: neuron_receivers/remove_skilled_experts.py:32-33)."""
    ivs = []
    for l in range(n_layers):
        name = layer_name(l)
        if name not in labels:
            ivs.append(None)
            continue
        lab = np.asarray(labels[name])
        n_experts = int(lab.max()) + 1
        k = max(int(n_experts * topk_ratio), 1)
        rm = None
        if l in expert_masks:
            rm = np.asarray(expert_masks[l], bool)
            if rm.ndim == 1:
                rm = rm[None, :]
            if max_timestep is not None:
                rm = rm.copy()
                rm[max_timestep:] = False
        ivs.append(LayerIntervention(
            patterns=patterns_from_labels(lab, n_experts), k=k,
            expert_remove=None if rm is None else rm.astype(np.float32)))
    return tuple(ivs)


def wanda_removal_interventions(masks_dh: MaskDict,
                                n_layers: int = 16) -> Interventions:
    """Wanda (D, H)/(T, D, H) reference-orientation masks -> out_weight_mask
    interventions in flax (H, D) orientation
    (reference: neuron_receivers/remove_wanda_neurons_fast.py:69-83)."""
    ivs = []
    for l in range(n_layers):
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
    reference: benchmarks/save_union_over_ap.py:90+). masks: (H,) bool per layer."""
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
    return params
