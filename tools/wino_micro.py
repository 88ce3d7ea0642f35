"""Micro-bench: fused Pallas Winograd vs direct conv vs XLA Winograd on TPU,
at the SD1.5 UNet's stride-1 3x3 conv shapes (CFG batch 16). Takes the host
TPU lock (one heavy job at a time). Iterations are CHAINED (y feeds the next
call) so the tunnel/runtime cannot elide identical executions — the naive
same-input loop measured an impossible 4800 TF/s for the 64x64x320 shape."""
import sys
import time

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402  (lock helper)

bench._acquire_tpu_lock()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

from diffusion_models_moe_tpu.ops.winograd import winograd_conv3x3  # noqa
from diffusion_models_moe_tpu.ops.winograd_fused import (  # noqa
    fused_ok, winograd3x3_fused)

print("backend:", jax.default_backend(), flush=True)

SHAPES = [  # (B, H, W, Cin, Cout) — SD1.5 stride-1 3x3 conv population
    (16, 64, 64, 320, 320),
    (16, 32, 32, 640, 640),
    (16, 16, 16, 1280, 1280),
    (16, 64, 64, 640, 320),   # up-path concat convs (cin != cout)
    (16, 32, 32, 1280, 640),
]
ITERS = 20


def timeit_chained(fn, x, k, cin, cout):
    """Square convs: y -> next x (defeats elision). Non-square: renormalized
    slice of y widened back to cin via tile."""
    def step(a):
        y = fn(a, k)
        if cout != cin:   # rect conv: rebuild a cin-wide input from y
            reps = (cin + cout - 1) // cout
            y = jnp.tile(y, (1, 1, 1, reps))[..., :cin]
        return y * (0.1 / (jnp.abs(y).mean() + 1e-3))
    step_j = jax.jit(step)
    a = step_j(x)
    a.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        a = step_j(a)
    a.block_until_ready()
    return (time.perf_counter() - t0) / ITERS


direct = lambda x, k: lax.conv_general_dilated(  # noqa: E731
    x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

rng = np.random.RandomState(0)
for (b, h, w, cin, cout) in SHAPES:
    x = jnp.asarray(rng.randn(b, h, w, cin), jnp.bfloat16)
    k = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, jnp.bfloat16)
    ok = fused_ok(h, w, cin, cout)
    td = timeit_chained(direct, x, k, cin, cout)
    tw = timeit_chained(winograd_conv3x3, x, k, cin, cout)
    tf = timeit_chained(winograd3x3_fused, x, k, cin, cout) \
        if ok else float("nan")
    if ok:
        ref = np.asarray(jax.jit(direct)(x, k), np.float32)
        got = np.asarray(jax.jit(winograd3x3_fused)(x, k), np.float32)
        err = float(np.max(np.abs(ref - got)) / (np.max(np.abs(ref)) + 1e-9))
    else:
        err = float("nan")
    flops = 2.0 * b * h * w * 9 * cin * cout
    print(f"{h}x{w}x{cin}->{cout:<5} direct {td*1e3:7.3f}ms "
          f"({flops/td/1e12:5.1f}TF/s) xla-wino {tw*1e3:7.3f}ms "
          f"fused {tf*1e3:7.3f}ms "
          f"({flops/tf/1e12 if ok else float('nan'):5.1f}TF/s eff) "
          f"maxrel {err:.2e}", flush=True)
