"""Unified editing: per-prompt concept routing -> multi-concept erasure.

Rebuild of the reference's router benchmark (reference:
benchmarks/unified_editing.py:64-136 + neuron_receivers/multi_concept_remover.py:13-99):
CLIP-text concept checkers decide which concepts each prompt triggers; the matching
per-concept Wanda masks are OR-ed and applied for that generation. Because masks are
plain arrays here, the union is a host-side OR + one jitted generate per routing
combination (combinations are few and cached by mask shape).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence

import jax
import numpy as np

from diffusion_models_moe_tpu.benchmarks.clip_metrics import (
    MemorizedPromptChecker)
from diffusion_models_moe_tpu.erasure.masks import (MaskDict, union_masks,
                                                    wanda_removal_interventions)


@dataclasses.dataclass
class ConceptBank:
    """Per-concept checkers + masks in the REFERENCE wanda orientation
    ((T|1, D, H) or (D, H) — what `wanda_pipeline` emits and the CLI stores;
    `wanda_removal_interventions` transposes to the flax kernel layout)."""
    checkers: dict[str, object]           # name -> callable(prompt_embs)->bool[]
    masks: dict[str, MaskDict]

    def route(self, prompt_embs: np.ndarray,
              prompts: Optional[Sequence[str]] = None) -> list[tuple[str, ...]]:
        """Which concepts fire per prompt (reference:
        benchmarks/unified_editing.py routing loop)."""
        fired = []
        per_concept = {}
        for name, checker in self.checkers.items():
            if isinstance(checker, MemorizedPromptChecker):
                if prompts is None:
                    # a silent [] here would zero-length the routing table and
                    # drop every prompt from the benchmark
                    raise ValueError(
                        f"checker {name!r} needs the raw prompts — pass "
                        f"route(prompt_embs, prompts=...)")
                per_concept[name] = checker(prompts)
            else:
                per_concept[name] = checker(prompt_embs)
        n = len(next(iter(per_concept.values())))
        for i in range(n):
            fired.append(tuple(sorted(
                name for name, hits in per_concept.items() if hits[i])))
        return fired


def unified_editing_eval(pipe, params, tokenize, prompts: Sequence[str],
                         prompt_embs: np.ndarray, bank: ConceptBank,
                         out_dir: str, num_steps: int = 50,
                         seed: int = 0) -> dict:
    """Route every prompt, apply the union of fired concepts' masks, generate.

    Returns routing decisions + generation summary. Images land in
    {out_dir}/{i}_{concepts}.png; prompts with no fired concept generate clean.
    """
    from diffusion_models_moe_tpu.pipelines.stable_diffusion import to_pil

    os.makedirs(out_dir, exist_ok=True)
    routes = bank.route(prompt_embs, prompts)
    iv_cache: dict[tuple, object] = {}
    results = []
    for i, (prompt, fired) in enumerate(zip(prompts, routes)):
        if fired not in iv_cache:
            if fired:
                union = union_masks([bank.masks[c] for c in fired])
                iv_cache[fired] = wanda_removal_interventions(union)
            else:
                iv_cache[fired] = None
        ivs = iv_cache[fired]
        cond = tokenize([prompt])
        uncond = tokenize([""])
        img, _ = pipe.generate(params, cond, uncond,
                               jax.random.PRNGKey(seed + i),
                               num_steps=num_steps, ivs=ivs)
        tag = "_".join(fired) if fired else "none"
        to_pil(img)[0].save(os.path.join(out_dir, f"{i}_{tag}.png"))
        results.append({"prompt": prompt, "concepts": list(fired)})
    n_routed = sum(1 for r in results if r["concepts"])
    return {"results": results, "n_prompts": len(prompts),
            "n_routed": n_routed}
