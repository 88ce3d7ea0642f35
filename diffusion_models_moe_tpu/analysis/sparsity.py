"""Gate sparsity measurement for ReLUfied models.

Rebuild of the reference's sparsity path (reference: sparsity/check_sparsity.py:9-50):
per-(timestep, layer) fraction of exact-zero post-activation gate entries over a
prompt set, written as one JSON. ReLUfication itself is the
`ff_activation='geglu-relu'` config flag (reference: sparsity/relufy_model.py:28-40).
"""
from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import jax
import numpy as np

from diffusion_models_moe_tpu.analysis.stats import TapAccumulator
from diffusion_models_moe_tpu.taps import TapSpec


def measure_sparsity(pipe, params, tokenize, prompts: Sequence[str],
                     seed: int = 0, num_steps: Optional[int] = None,
                     out_path: Optional[str] = None) -> dict[int, np.ndarray]:
    """Returns {layer: (T,) mean zero-fraction}; optionally writes sparsity.json."""
    acc = TapAccumulator()
    tap = TapSpec(gate_sparsity=True)
    uncond = np.asarray(tokenize([""]))   # real empty-prompt encoding (BOS/EOS),
    for prompt in prompts:                # not all-zero ids ('!!!…') that would
        cond = tokenize([prompt])         # skew the CFG pass and the stats
        _, taps = pipe.generate(params, cond, uncond, jax.random.PRNGKey(seed),
                                num_steps=num_steps, tap=tap, decode=False)
        acc.update({l: np.asarray(v) for l, v in taps["gate_sparsity"].items()})
    means = acc.mean()
    if out_path:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        with open(out_path, "w") as f:
            json.dump({str(l): np.asarray(v).tolist()
                       for l, v in means.items()}, f)
    return means
