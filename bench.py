"""Headline benchmark: moefied SD1.5 images/sec/chip at 50 denoise steps.

This is the reference's hot path — MoE top-k routed GEGLU inference under
instrumentation (reference: moefication/eval_moefied_sd.py:19-74, hooks recompute the
FFN up-projection and copy gates to host every call, neuron_receivers/moefy.py:10-27).
Here the whole 50-step loop + routing + VAE decode is one jit; no host syncs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` compares against an estimated 0.25 img/s for the reference's hooked
single-GPU loop (no published numbers exist — BASELINE.md; estimate from SD1.5
fp16 ~0.4 img/s at 50 steps on a datacenter GPU, halved by the hook overhead of
double FFN compute + per-call host copies).
"""
from __future__ import annotations

import json
import sys
import time

import os

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))

REFERENCE_HOOKED_IMGS_PER_SEC = 0.25


def main(batch: int = 8, steps: int = 50, runs: int = 3):
    from diffusion_models_moe_tpu import StableDiffusionPipeline, sd15_config
    from diffusion_models_moe_tpu.moefication.moefy import build_moe_interventions
    from diffusion_models_moe_tpu.taps import layer_name

    import dataclasses
    cfg = sd15_config(dtype=jnp.bfloat16)
    if os.environ.get("DMOE_FUSED", "1") == "0":
        cfg = dataclasses.replace(
            cfg, unet=dataclasses.replace(cfg.unet, use_fused_routing=False))
    if os.environ.get("DMOE_FAST_NORM", "0") == "1":
        cfg = dataclasses.replace(
            cfg, unet=dataclasses.replace(cfg.unet, fast_norm=True))
    pipe = StableDiffusionPipeline(cfg)
    t_p = time.perf_counter()
    params = jax.block_until_ready(pipe.init_params(jax.random.PRNGKey(0)))
    print(f"# init_params {time.perf_counter()-t_p:.1f}s", file=sys.stderr)

    rng = np.random.RandomState(0)
    labels = {layer_name(i): rng.permutation(np.arange(4 * d) % ((4 * d) // 20))
              for i, d in enumerate(cfg.unet.ff_dims())}
    ivs = build_moe_interventions(labels, topk_ratio=0.3)
    if os.environ.get("DMOE_NO_MOE", "0") == "1":
        ivs = None   # plain SD baseline, for measuring routing overhead
    print("# interventions built", file=sys.stderr)

    tcfg = cfg.text_encoder
    cond = jax.random.randint(jax.random.PRNGKey(1), (batch, tcfg.max_length),
                              0, tcfg.vocab_size)
    uncond = jnp.zeros_like(cond)

    def run(key):
        img, _ = pipe.generate(params, cond, uncond, key, num_steps=steps,
                               ivs=ivs)
        # force a real host fetch: through remote-device tunnels
        # block_until_ready can return before execution finishes
        return np.asarray(jax.device_get(img))

    # warmup/compile
    t_c = time.perf_counter()
    run(jax.random.PRNGKey(2))
    print(f"# warmup (compile) {time.perf_counter()-t_c:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    for i in range(runs):
        run(jax.random.PRNGKey(3 + i))
    dt = time.perf_counter() - t0

    imgs_per_sec = batch * runs / dt
    print(json.dumps({
        "metric": f"moefied SD1.5 images/sec/chip @ {steps} steps (batch {batch})",
        "value": round(imgs_per_sec, 4),
        "unit": "images/sec",
        "vs_baseline": round(imgs_per_sec / REFERENCE_HOOKED_IMGS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    kwargs = {}
    if len(sys.argv) > 1:
        kwargs["batch"] = int(sys.argv[1])
    if len(sys.argv) > 2:
        kwargs["steps"] = int(sys.argv[2])
    main(**kwargs)
