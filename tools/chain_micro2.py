"""Micro-bench round 2: tap9 vs im2col3 fused-chain variants vs the XLA
composite, at the shapes tap9 LOST (ROOFLINE.md §4b) plus the 16x16 winner
as a control. Same harness as chain_micro.py."""
import sys
import time

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402

bench._acquire_tpu_lock()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

from diffusion_models_moe_tpu.ops.conv_chain_fused import (  # noqa: E402
    conv3x3_chain, gn_scale_shift)

print("backend:", jax.default_backend(), flush=True)

SHAPES = [
    (16, 64, 64, 320, 320, 32),
    (16, 64, 64, 640, 320, 32),
    (16, 64, 64, 960, 320, 32),
    (16, 32, 32, 1280, 640, 32),
    (16, 16, 16, 2560, 1280, 32),
    (16, 16, 16, 1280, 1280, 32),   # tap9 wins 1.657x — control
]
ITERS = 20


def timeit_chained(fn, x, cin, cout):
    def step(a):
        y = fn(a)
        if cout != cin:
            reps = (cin + cout - 1) // cout
            y = jnp.tile(y, (1, 1, 1, reps))[..., :cin]
        return (y * (0.1 / (jnp.abs(y).mean() + 1e-3))).astype(a.dtype)
    step_j = jax.jit(step)
    a = step_j(x)
    a.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        a = step_j(a)
    a.block_until_ready()
    return (time.perf_counter() - t0) / ITERS


rng = np.random.RandomState(0)
for (b, h, w, cin, cout, groups) in SHAPES:
    x = jnp.asarray(rng.randn(b, h, w, cin), jnp.bfloat16)
    k = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, jnp.bfloat16)
    gamma = jnp.asarray(1.0 + 0.1 * rng.randn(cin), jnp.float32)
    beta = jnp.asarray(0.1 * rng.randn(cin), jnp.float32)
    bias = jnp.asarray(0.1 * rng.randn(cout), jnp.bfloat16)
    res = jnp.asarray(rng.randn(b, h, w, cout), jnp.bfloat16)

    def xla_composite(a):
        n_, hh, ww, c = a.shape
        xf = a.astype(jnp.float32).reshape(n_, hh * ww, groups, c // groups)
        mean = xf.mean(axis=(1, 3), keepdims=True)
        var = xf.var(axis=(1, 3), keepdims=True)
        xn = ((xf - mean) * lax.rsqrt(var + 1e-5)).reshape(a.shape)
        xn = xn * gamma + beta
        act = lax.optimization_barrier(jax.nn.silu(xn).astype(jnp.bfloat16))
        y = lax.conv_general_dilated(
            act, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias + res

    def mk_chain(variant):
        def chain(a):
            scale, shift = gn_scale_shift(a, gamma, beta, groups, 1e-5)
            bt = jnp.broadcast_to(bias[None], (a.shape[0], cout))
            return conv3x3_chain(a, k, bt, scale, shift, residual=res,
                                 variant=variant)
        return chain

    t_x = timeit_chained(xla_composite, x, cin, cout)
    t_9 = timeit_chained(mk_chain("tap9"), x, cin, cout)
    t_i = timeit_chained(mk_chain("im2col3"), x, cin, cout)
    ref = np.asarray(jax.jit(xla_composite)(x), np.float32)
    got = np.asarray(jax.jit(mk_chain("im2col3"))(x), np.float32)
    err = float(np.max(np.abs(ref - got)) / (np.max(np.abs(ref)) + 1e-9))
    best = min(t_9, t_i)
    print(f"{h}x{w}x{cin}->{cout}: xla {t_x*1e3:7.3f}ms tap9 {t_9*1e3:7.3f}ms "
          f"im2col3 {t_i*1e3:7.3f}ms "
          f"{'WIN' if best < t_x else 'lose'} {t_x/best:5.3f}x "
          f"(im2 err {err:.2e})", flush=True)
