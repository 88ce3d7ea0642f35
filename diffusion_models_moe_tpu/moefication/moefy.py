"""MoEfication driver: cluster every GEGLU FF gate matrix into experts and build
routing interventions.

Mirrors the reference flow `moefy_sd_model.py` -> `param_split/<ffn_name>` artifacts ->
`modify_ffn_to_experts` (reference: moefication/moefy_sd_model.py:19-43,
moefication/helper.py:65-78), with labels stored as one `.npz` and the runtime
`patterns` built on the fly from labels.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from diffusion_models_moe_tpu.config import UNetConfig
from diffusion_models_moe_tpu.moefication.cluster import (balanced_kmeans,
                                                          random_split_labels)
from diffusion_models_moe_tpu.taps import (LayerIntervention, Interventions,
                                           layer_name, patterns_from_labels)

def ff_param_paths(cfg: UNetConfig) -> list[tuple[str, ...]]:
    """Param-tree paths of each FF's parent module, canonical order.

    List index == global ff_index for ALL geometries: depth-stacked inner
    blocks (SDXL's transformer_layers_per_block=(0,2,10) -> 70 FFs) expand to
    consecutive indices, matching Transformer2D's ff_index assignment
    (models/attention.py Transformer2D.__call__). SD1.x stays the 16-layer
    order of the reference (moefication/helper.py:6-19)."""
    paths: list[tuple[str, ...]] = []

    def add(prefix: str, block_idx: int):
        for d in range(cfg.depth_for_block(block_idx)):
            paths.append((prefix, f"transformer_blocks_{d}", "ff"))

    for i, kind in enumerate(cfg.down_block_types):
        if kind == "cross":
            for j in range(cfg.layers_per_block):
                add(f"down_{i}_attn_{j}", i)
    add("mid_attn_0", len(cfg.block_out_channels) - 1)
    rev = list(range(len(cfg.block_out_channels)))[::-1]
    for i, kind in enumerate(cfg.up_block_types):
        if kind == "cross":
            for j in range(cfg.layers_per_block + 1):
                add(f"up_{i}_attn_{j}", rev[i])
    assert len(paths) == cfg.n_ff_layers, (len(paths), cfg.n_ff_layers)
    return paths


def gate_weights(unet_params: dict, cfg: UNetConfig) -> list[np.ndarray]:
    """Per-layer gate halves of the FF up-projection, rows = neurons.

    The reference clusters rows [H:2H] of diffusers' `proj.weight` (out, in) layout
    (reference: moefication/moe_utils.py:66-78). Flax kernels are (in, out), so the
    gate half is columns [H:2H], transposed to (H, in).
    """
    out = []
    for path in ff_param_paths(cfg):
        node = unet_params
        for k in path:
            node = node[k]
        kernel = np.asarray(node["proj"]["kernel"])   # (D, 2H)
        h = kernel.shape[1] // 2
        out.append(kernel[:, h:].T.copy())            # (H, D)
    return out


def moefy_unet(unet_params: dict, cfg: UNetConfig, expert_size: int = 20,
               method: str = "sinkhorn", seed: int = 0,
               save_path: Optional[str] = None,
               random_split: bool = False) -> dict[str, np.ndarray]:
    """Cluster all FF layers; returns {layer_name: labels (H,)} and optionally saves
    one `param_split.npz` artifact (reference artifact: param_split/<ffn_name>)."""
    labels = {}
    for idx, w in enumerate(gate_weights(unet_params, cfg)):
        h = w.shape[0]
        n_experts = h // expert_size
        if random_split:
            lab = random_split_labels(h, expert_size)
        else:
            lab = balanced_kmeans(w, n_experts, seed=seed, method=method)
        labels[layer_name(idx)] = lab
    if save_path is not None:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        np.savez(save_path, **{k: v for k, v in labels.items()})
    return labels


def load_labels(path: str) -> dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def build_add_experts_boost(avg_scores: np.ndarray, skilled: np.ndarray,
                            scale: float = 5.0) -> np.ndarray:
    """AddExperts boost array: (T, E) average expert scores + skilled-expert
    selection -> the (T, E) additive routing boost the reference applies
    (reference: neuron_receivers/add_skilled_experts.py:56 —
    `score[:, idx] += 5.0 * avg_activation[t][l][idx]`; avg scores come from
    the ExpertPredictivity stats, TapSpec.expert_scores_max means).

    `skilled` is (E,) or (T, E) bool. NOTE the reference also shrinks the
    routed expert count to k' = int(0.8 * k) while boosting
    (add_skilled_experts.py:58) — reproduce that by passing
    `topk_ratio * 0.8` to `build_moe_interventions` alongside this boost."""
    av = np.asarray(avg_scores, np.float32)
    sk = np.asarray(skilled, bool)
    if sk.ndim == 1:
        sk = np.broadcast_to(sk[None, :], av.shape)
    return np.where(sk, scale * av, 0.0).astype(np.float32)


def build_moe_interventions(labels: dict[str, np.ndarray], topk_ratio: float,
                            n_layers: Optional[int] = None,
                            expert_remove: Optional[dict] = None,
                            expert_boost: Optional[dict] = None
                            ) -> Interventions:
    """labels -> per-layer routing interventions with k = int(E * topk_ratio)
    (reference: moefication/helper.py:48-62 attaches `patterns` and `k`).
    n_layers defaults to covering every labeled layer (16 for SD1.x labels,
    70 for SDXL)."""
    if n_layers is None:
        n_layers = 1 + max(
            (int(k.rsplit("_", 1)[1]) for k in labels), default=15)
    ivs = []
    for idx in range(n_layers):
        name = layer_name(idx)
        if name not in labels:
            ivs.append(None)
            continue
        lab = np.asarray(labels[name])
        n_experts = int(lab.max()) + 1
        k = max(int(n_experts * topk_ratio), 1)
        ivs.append(LayerIntervention(
            patterns=patterns_from_labels(lab, n_experts), k=k,
            expert_remove=None if expert_remove is None else expert_remove.get(name),
            expert_boost=None if expert_boost is None else expert_boost.get(name)))
    return tuple(ivs)
