"""Skill-attribution collection drivers: run (base, concept) prompt sets with taps
and produce skilled-neuron/expert masks.

This is the reference's L4 analysis layer as three composable steps
(reference call stack: SURVEY.md §3.3):
  1. collect_predictivity  <- modularity/modularity_analysis.py:29-110
  2. collect_wanda_norms   <- modularity/wanda.py:19-111
  3. select_*              <- paired_t_test.py / skilled_neuron_ap.py / wanda.py:140-173

Each prompt's full generation returns stacked (T, H) stats from one traced scan;
accumulation across prompts is Welford on the host (cheap; stats are small).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Callable, Optional, Sequence

import jax
import numpy as np

from diffusion_models_moe_tpu.analysis.selectors import (t_test_skilled,
                                                         wanda_mask_to_flax,
                                                         wanda_skilled)
from diffusion_models_moe_tpu.analysis.stats import (ColumnNormAccumulator,
                                                     PairedDiffStd,
                                                     TapAccumulator)
from diffusion_models_moe_tpu.moefication.moefy import ff_param_paths
from diffusion_models_moe_tpu.taps import TapSpec


@dataclasses.dataclass
class PredictivityResult:
    base: TapAccumulator
    adj: TapAccumulator
    diff_std: PairedDiffStd
    n_prompts: int

    def save(self, out_dir: str) -> None:
        """Artifacts shaped like the reference's predictivity_{base,adj}.json +
        diff_std (reference: modularity_analysis.py:106-110)."""
        os.makedirs(out_dir, exist_ok=True)
        self.base.save(os.path.join(out_dir, "predictivity_base.json"))
        self.adj.save(os.path.join(out_dir, "predictivity_adj.json"))
        np.savez(os.path.join(out_dir, "diff_std.npz"),
                 **{str(l): v for l, v in self.diff_std.std().items()})


def _run_tapped(pipe, params, tokenize, prompt: str, seed: int, tap: TapSpec,
                num_steps: Optional[int], ivs=None):
    cond = tokenize([prompt])
    uncond = np.zeros_like(cond)
    _, taps = pipe.generate(params, cond, uncond, jax.random.PRNGKey(seed),
                            num_steps=num_steps, tap=tap, ivs=ivs,
                            decode=False)
    return taps


def collect_predictivity(pipe, params, tokenize,
                         base_prompts: Sequence[str],
                         adj_prompts: Sequence[str],
                         seed: int = 0, num_steps: Optional[int] = None,
                         mean_gate: bool = False,
                         ivs=None) -> PredictivityResult:
    """Max-gate (or mean-gate for GELU models) predictivity over prompt pairs.
    The same fixed seed per pair makes base/adj generations comparable
    (reference: base_receiver.py:69-71 determinism convention)."""
    if len(base_prompts) != len(adj_prompts):
        # zip() would silently truncate while n_prompts below reported the
        # full length, corrupting the t-test's n and degrees of freedom
        raise ValueError(f"paired prompt lists differ in length: "
                         f"{len(base_prompts)} base vs {len(adj_prompts)} adj")
    tap = TapSpec(max_gate=not mean_gate, mean_gate=mean_gate)
    stat = "mean_gate" if mean_gate else "max_gate"
    base_acc, adj_acc, dstd = TapAccumulator(), TapAccumulator(), PairedDiffStd()
    for i, (bp, ap) in enumerate(zip(base_prompts, adj_prompts)):
        tb = _run_tapped(pipe, params, tokenize, bp, seed, tap, num_steps, ivs)
        ta = _run_tapped(pipe, params, tokenize, ap, seed, tap, num_steps, ivs)
        b = {l: np.asarray(v) for l, v in tb[stat].items()}
        a = {l: np.asarray(v) for l, v in ta[stat].items()}
        base_acc.update(b)
        adj_acc.update(a)
        dstd.update(b, a)
    return PredictivityResult(base_acc, adj_acc, dstd, len(base_prompts))


def collect_wanda_norms(pipe, params, tokenize, prompts: Sequence[str],
                        seed: int = 0, num_steps: Optional[int] = None
                        ) -> dict[int, np.ndarray]:
    """Per-(t, l) column norms of the row-normalized FF inner output over a prompt
    set (reference: wanda.py:78-111). Returns {layer: (T, H)} norms."""
    tap = TapSpec(ff_out_colnorm_sq=True)
    acc = ColumnNormAccumulator()
    for prompt in prompts:
        taps = _run_tapped(pipe, params, tokenize, prompt, seed, tap, num_steps)
        acc.update({l: np.asarray(v)                     # (T, H) per layer
                    for l, v in taps["ff_out_colnorm_sq"].items()})
    return acc.norms()


def w2_abs_weights(unet_params: dict, cfg) -> dict[int, np.ndarray]:
    """|W2| per FF layer in reference (out, in) orientation
    (reference: wanda.py:50-57 collects ff.net.2 weights)."""
    out = {}
    for l, path in enumerate(ff_param_paths(cfg)):
        node = unet_params
        for k in path:
            node = node[k]
        out[l] = np.abs(np.asarray(node["out_proj_kernel"])).T   # (D, H)
    return out


def wanda_pipeline(pipe, params, tokenize, base_prompts, adj_prompts,
                   skill_ratio: float, seed: int = 0,
                   num_steps: Optional[int] = None,
                   cache_dir: Optional[str] = None) -> dict[int, np.ndarray]:
    """Full Wanda flow -> {layer: (T, D, H) REFERENCE-oriented skilled masks}
    (reference flow: SURVEY.md §3.3 step (1)) — the orientation
    `wanda_removal_interventions` and `bake_wanda_masks` expect, so CLI-saved
    npz masks feed both without re-transposition. Caches norms like the
    reference's cache-or-compute (wanda.py:74,126-129)."""
    base_file = cache_dir and os.path.join(cache_dir, "base_norms.npz")
    adj_file = cache_dir and os.path.join(cache_dir, "adj_norms.npz")
    if base_file and os.path.exists(base_file) and os.path.exists(adj_file):
        from diffusion_models_moe_tpu.analysis.stats import load_colnorms
        base_norms, adj_norms = load_colnorms(base_file), load_colnorms(adj_file)
    else:
        base_norms = collect_wanda_norms(pipe, params, tokenize, base_prompts,
                                         seed, num_steps)
        adj_norms = collect_wanda_norms(pipe, params, tokenize, adj_prompts,
                                        seed, num_steps)
        if cache_dir:
            os.makedirs(cache_dir, exist_ok=True)
            np.savez(base_file, **{str(l): v for l, v in base_norms.items()})
            np.savez(adj_file, **{str(l): v for l, v in adj_norms.items()})
    w2 = w2_abs_weights(params["unet"], pipe.config.unet)
    masks = {}
    for l in base_norms:
        # (T, D, H) reference orientation, as wanda_skilled returns it
        masks[l] = wanda_skilled(w2[l], base_norms[l], adj_norms[l],
                                 skill_ratio)
    return masks


def t_test_pipeline(pred: PredictivityResult, conf: float = 0.05
                    ) -> dict[int, np.ndarray]:
    """Predictivity stats -> {layer: (T, H) skilled masks}
    (reference: paired_t_test.py:39-120)."""
    base_mean, adj_mean = pred.base.mean(), pred.adj.mean()
    dstd = pred.diff_std.std()
    return {l: t_test_skilled(base_mean[l], adj_mean[l], dstd[l],
                              pred.n_prompts, conf)
            for l in base_mean}
