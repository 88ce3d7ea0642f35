"""Micro-bench: fused GEGLU-FF Pallas kernel vs the XLA module math on TPU,
at the SD1.5 UNet's FF shapes (CFG batch 16, MoE top-k 0.3). Takes the host
TPU lock. Chained iterations (y feeds the next x) defeat execution elision
(same methodology as tools/wino_micro.py)."""
import sys
import time

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402

bench._acquire_tpu_lock()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from diffusion_models_moe_tpu.ops.geglu_ff_fused import (  # noqa: E402
    geglu_ff_fused)
from diffusion_models_moe_tpu.taps import routing_mask  # noqa: E402

print("backend:", jax.default_backend(), flush=True)

# (S, C, E): SD1.5 FF population (5 layers each at 64/32/16 px, 1 at 8 px)
SHAPES = [(4096, 320, 64), (1024, 640, 128), (256, 1280, 256),
          (64, 1280, 256)]
B, TOPK, ITERS = 16, 0.3, 20
DT = jnp.bfloat16


def xla_ff(x, w1, b1, w2, b2, pat, k):
    hdim = w1.shape[1] // 2
    h = x @ w1[:, :hdim] + b1[:hdim]
    g = x @ w1[:, hdim:] + b1[hdim:]
    ga = jax.nn.gelu(g, approximate=False)
    m, _ = routing_mask(ga.reshape(-1, hdim), pat.astype(x.dtype), k)
    return (h * ga * m.reshape(ga.shape)) @ w2 + b2


def timeit_chained(fn, x, args):
    def step(a):
        y = fn(a, *args)
        return y * (0.1 / (jnp.abs(y).mean() + 1e-3))
    step_j = jax.jit(step)
    a = step_j(x)
    a.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        a = step_j(a)
    np.asarray(jax.device_get(a))
    return (time.perf_counter() - t0) / ITERS


rng = np.random.RandomState(0)
for (s, c, e) in SHAPES:
    n, hdim, k = B * s, 4 * c, max(1, int(e * TOPK))
    x = jnp.asarray(rng.randn(n, c) * 0.5, DT)
    w1 = jnp.asarray(rng.randn(c, 2 * hdim) * 0.03, DT)
    b1 = jnp.asarray(rng.randn(2 * hdim) * 0.1, DT)
    w2 = jnp.asarray(rng.randn(hdim, c) * 0.03, DT)
    b2 = jnp.asarray(rng.randn(c) * 0.1, DT)
    labels = rng.permutation(np.arange(hdim) % e)
    pat = jnp.asarray((labels[None] == np.arange(e)[:, None]), jnp.float32)

    tx = timeit_chained(xla_ff, x, (w1, b1, w2, b2, pat, k))
    tf = timeit_chained(
        lambda a, *w: geglu_ff_fused(a, *w[:4], patterns=w[4], k=k), x,
        (w1, b1, w2, b2, pat))
    ref = np.asarray(jax.jit(xla_ff)(x, w1, b1, w2, b2, pat, k), np.float32)
    got = np.asarray(jax.jit(
        lambda a, *w: geglu_ff_fused(a, *w[:4], patterns=w[4], k=k))(
            x, w1, b1, w2, b2, pat), np.float32)
    err = float(np.max(np.abs(ref - got)) / (np.max(np.abs(ref)) + 1e-9))
    flops = 2.0 * n * (c * 2 * hdim + hdim * c + hdim * e + e * hdim)
    print(f"S={s:<5} C={c:<5} E={e:<4} xla {tx*1e3:7.3f}ms "
          f"({flops/tx/1e12:5.1f}TF/s) fused {tf*1e3:7.3f}ms "
          f"({flops/tf/1e12:5.1f}TF/s) maxrel {err:.2e}", flush=True)
