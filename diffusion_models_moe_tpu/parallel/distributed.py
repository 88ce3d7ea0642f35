"""Multi-host initialization for pod-scale runs.

The reference's only multi-process support is Accelerate-launched DDP on one
node (SURVEY.md §5.8); the TPU-native equivalent is JAX's multi-controller
runtime: every host runs the same program, `jax.distributed.initialize` wires
the hosts into one global device mesh, and the existing `create_mesh` /
`state_shardings` code works unchanged — collectives ride ICI within a slice
and DCN across slices, chosen by XLA from the sharding layout.

Usage (same script on every host):

    from diffusion_models_moe_tpu.parallel.distributed import init_multihost
    init_multihost()                      # no-op on single host / CPU tests
    mesh = create_mesh()                  # now spans all hosts' devices

On Cloud TPU the coordinator/process ids come from the TPU metadata and
`initialize()` needs no arguments; for manual clusters pass them explicitly.
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> dict:
    """Initialize the JAX distributed runtime when running multi-host.

    Safe to call unconditionally:
      * single-process (num_processes in {None on non-TPU, 1}) -> no-op
      * already initialized -> no-op
    Returns {"process_index", "process_count", "local_devices",
    "global_devices"} for logging.
    """
    explicit = coordinator_address is not None or num_processes is not None
    want = explicit or os.environ.get("JAX_COORDINATOR_ADDRESS") \
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    if want:
        # Do NOT probe jax.process_count() first: it initializes the local
        # backend, after which initialize() always fails and every host would
        # silently proceed single-host. Call initialize() directly; the only
        # benign failure is "already initialized" (launcher-side init).
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id)
        except RuntimeError as e:
            if "already initialized" not in str(e).lower():
                raise  # e.g. backend already created — a real misuse
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def is_coordinator() -> bool:
    """True on the host that should write checkpoints/logs (process 0)."""
    return jax.process_index() == 0
