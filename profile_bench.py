"""Profile the bench workload on TPU under a given serving mode.

Produces the per-op breakdown that guides the exact-leg optimization work
(VERDICT r2 item 2: 320-channel convs measured 43% MFU at the 1.07 headline —
this re-profiles at the current best exact leg). Heavy TPU job: takes the
host-wide bench lock. Usage:

  DMOE_PAD_PROJ=1 python profile_bench.py /tmp/prof_pad 30
"""
from __future__ import annotations

import os
import sys


def main(argv: list[str]) -> int:
    log_dir = argv[0] if argv else "/tmp/dmoe_prof"
    top_n = int(argv[1]) if len(argv) > 1 else 30

    import bench
    bench._acquire_tpu_lock()
    bench._init_watchdog()
    bench._probe_with_retries()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusion_models_moe_tpu import StableDiffusionPipeline, sd15_config
    from diffusion_models_moe_tpu.moefication.moefy import (
        build_moe_interventions)
    from diffusion_models_moe_tpu.profiling import (profile_generate,
                                                    step_time_report, top_ops)
    from diffusion_models_moe_tpu.taps import layer_name

    os.environ.setdefault("DMOE_FLASH_BLOCKS", "1024,1024")
    cfg = sd15_config(dtype=jnp.bfloat16)
    unet = cfg.unet
    if os.environ.get("DMOE_QUANT", "0") == "1":
        unet = dataclasses.replace(unet, quant_int8=True)
    if os.environ.get("DMOE_WINOGRAD", "0") == "1":
        unet = dataclasses.replace(unet, conv_winograd=True)
    cfg = dataclasses.replace(cfg, unet=unet)
    dc = int(os.environ.get("DMOE_DEEP_CACHE", "0"))
    if dc:
        cfg = dataclasses.replace(cfg, deep_cache_interval=dc)
    pipe = StableDiffusionPipeline(cfg)
    params = pipe.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    labels = {layer_name(i): rng.permutation(np.arange(4 * d) % ((4 * d) // 20))
              for i, d in enumerate(cfg.unet.ff_dims())}
    ivs = build_moe_interventions(labels, topk_ratio=0.3)
    tcfg = cfg.text_encoder
    cond = jax.random.randint(jax.random.PRNGKey(1), (8, tcfg.max_length),
                              0, tcfg.vocab_size)
    print(profile_generate(pipe, params, cond, jnp.zeros_like(cond), log_dir,
                           num_steps=50, ivs=ivs), flush=True)
    # grouped view: fusion names bucketed by op family
    rows = top_ops(log_dir)
    buckets: dict[str, float] = {}
    for r in rows:
        n = r["name"].lower()
        if "flash" in n or "splash" in n:
            b = "flash-attention"
        elif "conv" in n:
            b = "conv"
        elif "dot" in n or "gemm" in n:
            b = "dots"
        elif "sort" in n or "top-k" in n or "topk" in n:
            b = "routing-sort"
        elif "copy" in n or "transpose" in n or "bitcast" in n:
            b = "layout/copies"
        elif "fusion" in n:
            b = "other-fusions"
        else:
            b = "other"
        buckets[b] = buckets.get(b, 0.0) + r["total_us"]
    total = sum(buckets.values()) or 1.0
    print("\n# bucketed")
    for k, v in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"{k:<18} {v/1000.0:>10.1f} ms  {100.0*v/total:>5.1f}%")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
