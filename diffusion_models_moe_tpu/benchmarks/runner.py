"""Batched benchmark generation driver with crash-restartable resume.

Rebuilds the reference's eval loops (benchmarks/eval_coco.py:152-287,
i2p_eval.py:105-258, artist_removal.py:93-215): iterate a prompt dataset in batches,
generate baseline and intervened images, save pairs, skip batches whose outputs
already exist (resume-by-skip; reference: eval_coco.py:252-254). Batches run as one
jitted call; pass `mesh=` (any Mesh with a 'dp' axis) to shard each batch over
devices instead of the reference's batch<=4 single GPU — batch_size should then be
a multiple of the 'dp' axis size.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class EvalRunConfig:
    out_dir: str
    batch_size: int = 4
    num_steps: int = 50
    guidance_scale: float = 7.5
    seed: int = 0
    per_prompt_seeds: Optional[Sequence[int]] = None  # artist_removal protocol
    save_baseline: bool = True


def _pad_batch(ids: np.ndarray, batch: int) -> tuple[np.ndarray, int]:
    n = ids.shape[0]
    if n == batch:
        return ids, n
    pad = np.repeat(ids[-1:], batch - n, axis=0)
    return np.concatenate([ids, pad], 0), n


def run_eval(pipe, params, tokenize: Callable[[Sequence[str]], np.ndarray],
             prompts: Sequence[str], cfg: EvalRunConfig,
             ivs=None, name_fn: Optional[Callable[[int], str]] = None,
             mesh=None, generate_fn: Optional[Callable] = None) -> dict:
    """Generate images for `prompts`, optionally twice (baseline + intervened),
    saving `{out_dir}/sd_{i}.png` and `{out_dir}/removed_{i}.png` pairs (the
    reference's file naming, benchmarks/eval_coco.py:259-281).

    `generate_fn` overrides `pipe.generate` with the same keyword contract —
    the hook that runs protocols over alternative samplers (SLD baseline via
    `baselines.make_protocol_generate`; reference: i2p_eval.py:134-194 SLD
    rows)."""
    from diffusion_models_moe_tpu.pipelines.stable_diffusion import to_pil

    os.makedirs(cfg.out_dir, exist_ok=True)
    uncond = tokenize([""])
    b = cfg.batch_size
    name_fn = name_fn or (lambda i: str(i))
    done = skipped = 0

    for start in range(0, len(prompts), b):
        chunk = list(prompts[start:start + b])
        idxs = list(range(start, start + len(chunk)))
        outs = [os.path.join(cfg.out_dir, f"removed_{name_fn(i)}.png")
                for i in idxs]
        if cfg.save_baseline:
            # resume-by-skip must also backfill baselines: a rerun with
            # save_baseline on after a --no-baseline run would otherwise skip
            # every batch and never produce a single sd_*.png
            outs += [os.path.join(cfg.out_dir, f"sd_{name_fn(i)}.png")
                     for i in idxs]
        if all(os.path.exists(p) for p in outs):
            skipped += len(chunk)
            continue
        cond_ids, n_real = _pad_batch(np.asarray(tokenize(chunk)), b)
        uncond_ids = np.repeat(uncond, b, axis=0)
        key = jax.random.PRNGKey(cfg.seed)
        seeds = None
        if cfg.per_prompt_seeds is not None:
            # one seed PER PROMPT (the reference's evaluation_seed column,
            # benchmarks/artist_removal.py:59-70) via the pipeline's
            # per-sample noise path; padded slots repeat the last real seed
            chunk_seeds = [int(s) for s in
                           cfg.per_prompt_seeds[start:start + len(chunk)]]
            seeds = np.asarray(chunk_seeds + [chunk_seeds[-1]] * (b - n_real),
                               np.uint32)

        gen = generate_fn or pipe.generate
        if cfg.save_baseline:
            imgs, _ = gen(params, jnp.asarray(cond_ids),
                          jnp.asarray(uncond_ids), key,
                          num_steps=cfg.num_steps,
                          guidance_scale=cfg.guidance_scale,
                          mesh=mesh, seeds=seeds)
            for img, i in zip(to_pil(imgs[:n_real]), idxs):
                img.save(os.path.join(cfg.out_dir, f"sd_{name_fn(i)}.png"))
        imgs, _ = gen(params, jnp.asarray(cond_ids),
                      jnp.asarray(uncond_ids), key,
                      num_steps=cfg.num_steps,
                      guidance_scale=cfg.guidance_scale, ivs=ivs,
                      mesh=mesh, seeds=seeds)
        for img, i in zip(to_pil(imgs[:n_real]), idxs):
            img.save(os.path.join(cfg.out_dir, f"removed_{name_fn(i)}.png"))
        done += len(chunk)

    summary = {"n_prompts": len(prompts), "generated": done, "skipped": skipped,
               "out_dir": cfg.out_dir}
    with open(os.path.join(cfg.out_dir, "run_summary.json"), "w") as f:
        json.dump(summary, f)
    return summary
