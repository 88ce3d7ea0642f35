"""Gender debiasing evaluation: per-profession generation sweeps + CLIP gender ratio.

Rebuild of the reference's debias flow (reference: benchmarks/debias.py:27-80 removal
across seeds 31-250, benchmarks/ratio-gender.py:10-60 CLIP man/woman classification
over 100 seeds, benchmarks/gender_dataset.py:19-45 baseline ratios): generate
`a headshot of a {profession}` across seeds with and without the debias intervention
and compare gender ratios + flip success rates.
"""
from __future__ import annotations

import json
import os
from typing import Callable, Optional, Sequence

import jax
import numpy as np

from diffusion_models_moe_tpu.benchmarks.clip_metrics import (
    debias_success_rates, zero_shot_classify)
from diffusion_models_moe_tpu.data.prompts import PROFESSIONS


def generate_profession_sweep(pipe, params, tokenize, profession: str,
                              seeds: Sequence[int], ivs=None,
                              num_steps: int = 50,
                              out_dir: Optional[str] = None) -> list:
    """Seeded generations for one profession (reference seeds 31-250 for removal,
    0-100 for ratios)."""
    from diffusion_models_moe_tpu.pipelines.stable_diffusion import to_pil
    prompt = f"a headshot of a {profession}"
    cond = tokenize([prompt])
    uncond = tokenize([""])
    images = []
    for seed in seeds:
        img, _ = pipe.generate(params, cond, uncond, jax.random.PRNGKey(seed),
                               num_steps=num_steps, ivs=ivs)
        images.append(np.asarray(img[0]))
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            to_pil(img)[0].save(os.path.join(
                out_dir, f"{profession}_{seed}.png"))
    return images


def debias_eval(pipe, params, tokenize, image_encode: Callable,
                man_emb: np.ndarray, woman_emb: np.ndarray,
                ivs, seeds: Sequence[int],
                professions: Sequence[str] = tuple(PROFESSIONS),
                num_steps: int = 50,
                out_path: Optional[str] = None) -> dict:
    """Full protocol: per profession, gender predictions before/after debias
    intervention -> ratios + m2f/f2m success rates."""
    classes = np.stack([np.asarray(man_emb), np.asarray(woman_emb)])
    results = {}
    for prof in professions:
        before_imgs = generate_profession_sweep(
            pipe, params, tokenize, prof, seeds, ivs=None,
            num_steps=num_steps)
        after_imgs = generate_profession_sweep(
            pipe, params, tokenize, prof, seeds, ivs=ivs,
            num_steps=num_steps)
        pred_b = np.asarray(zero_shot_classify(
            np.asarray(image_encode(np.stack(before_imgs))), classes))
        pred_a = np.asarray(zero_shot_classify(
            np.asarray(image_encode(np.stack(after_imgs))), classes))
        results[prof] = {
            "before_woman_frac": float((pred_b == 1).mean()),
            "after_woman_frac": float((pred_a == 1).mean()),
            **debias_success_rates(pred_b, pred_a),
        }
    summary = {
        "per_profession": results,
        "mean_abs_bias_before": float(np.mean(
            [abs(r["before_woman_frac"] - 0.5) for r in results.values()])),
        "mean_abs_bias_after": float(np.mean(
            [abs(r["after_woman_frac"] - 0.5) for r in results.values()])),
    }
    if out_path:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(summary, f, indent=1)
    return summary
