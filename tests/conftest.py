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
