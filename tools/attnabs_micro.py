"""Micro-bench: absorbed attention sub-block (ops/attn_absorb_fused.py) vs
the XLA pad_proj formulation on TPU, at the SD1.5 self-attention shapes
(CFG batch 16). Both paths call the SAME stock flash kernel, so the delta
isolates the boundary work the absorb removes (transposes, head-dim pad
materialization, S-minor projection dots). Takes the host TPU lock; chained
iterations defeat execution elision (methodology of tools/ff_micro.py)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402

bench._acquire_tpu_lock()
os.environ.setdefault("DMOE_FLASH_BLOCKS", "1024,1024")  # headline config

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from diffusion_models_moe_tpu.ops.attn_absorb_fused import (  # noqa: E402
    attn_out_residual_fused, ln_apply, ln_qkv_fused)
from diffusion_models_moe_tpu.ops.flash import (  # noqa: E402
    flash_bhsd, flash_self_attention)

print("backend:", jax.default_backend(), "blocks:",
      os.environ["DMOE_FLASH_BLOCKS"], flush=True)

# (S, C, heads): SD1.5 self-attention population (per step: 5 blocks at
# S=4096, 5 at 1024, 5 at 256; the S=64 mid-block doesn't use flash)
SHAPES = [(4096, 320, 8), (1024, 640, 8), (256, 1280, 8)]
B, ITERS = 16, 20
DT = jnp.bfloat16


def xla_sub(x, wqp, wkp, wvp, wo3, bo, g, b, heads, d, d_pad, sm):
    """The current pad_proj sub-block: LN -> _PadHeadProj dots (B,S,H,dp)
    -> flash (transposes inside) -> _DGOutProj dot + bias -> +residual."""
    bsz, s, c = x.shape
    xn = ln_apply(x, g, b).astype(x.dtype)
    q = (xn @ wqp).reshape(bsz, s, heads, d_pad)
    k = (xn @ wkp).reshape(bsz, s, heads, d_pad)
    v = (xn @ wvp).reshape(bsz, s, heads, d_pad)
    out4 = flash_self_attention(q, k, v, sm)          # (B, S, H, d_pad)
    y = jax.lax.dot_general(out4, wo3, (((2, 3), (0, 1)), ((), ())))
    return x + (y + bo).astype(x.dtype)


def abs_sub(x, wqp, wkp, wvp, wo2, bo, g, b, heads, sm):
    q, k, v = ln_qkv_fused(x, wqp, wkp, wvp, heads=heads, ln_scale=g,
                           ln_bias=b)
    o = flash_bhsd(q, k, v, sm)                       # (B, H, S, d_pad)
    return attn_out_residual_fused(o.astype(x.dtype), wo2, bo, x)


def timeit_chained(fn, x, args):
    def step(a):
        y = fn(a, *args)
        return y * (0.1 / (jnp.abs(y).mean() + 1e-3))
    step_j = jax.jit(step)
    t0 = time.perf_counter()
    a = step_j(x)
    np.asarray(jax.device_get(a))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(ITERS):
        a = step_j(a)
    np.asarray(jax.device_get(a))
    return (time.perf_counter() - t0) / ITERS, compile_s


rng = np.random.RandomState(0)
for (s, c, heads) in SHAPES:
    d = c // heads
    d_pad = max(128, -(-d // 128) * 128)
    sm = 1.0 / (d ** 0.5)
    x = jnp.asarray(rng.randn(B, s, c) * 0.5, DT)
    g = jnp.asarray(1.0 + 0.1 * rng.randn(c), jnp.float32)
    b = jnp.asarray(0.1 * rng.randn(c), jnp.float32)

    def padw(w):
        return jnp.asarray(np.pad(w.reshape(c, heads, d),
                                  ((0, 0), (0, 0), (0, d_pad - d))
                                  ).reshape(c, heads * d_pad), DT)
    wq, wk, wv = (rng.randn(c, c) * 0.05 for _ in range(3))
    wqp, wkp, wvp = padw(wq), padw(wk), padw(wv)
    wo = rng.randn(c, c) * 0.05
    bo = jnp.asarray(0.1 * rng.randn(c), jnp.float32)
    wo3 = jnp.asarray(np.pad(wo.reshape(heads, d, c),
                             ((0, 0), (0, d_pad - d), (0, 0))), DT)
    wo2 = wo3.reshape(heads * d_pad, c)

    tx, cx = timeit_chained(
        lambda a, *w: xla_sub(a, *w, heads, d, d_pad, sm), x,
        (wqp, wkp, wvp, wo3, bo, g, b))
    ta, ca = timeit_chained(
        lambda a, *w: abs_sub(a, *w, heads, sm), x,
        (wqp, wkp, wvp, wo2, bo, g, b))
    ref = np.asarray(jax.jit(lambda a: xla_sub(
        a, wqp, wkp, wvp, wo3, bo, g, b, heads, d, d_pad, sm))(x),
        np.float32)
    got = np.asarray(jax.jit(lambda a: abs_sub(
        a, wqp, wkp, wvp, wo2, bo, g, b, heads, sm))(x), np.float32)
    err = float(np.max(np.abs(ref - got)) / (np.max(np.abs(ref)) + 1e-9))
    print(f"S={s:<5} C={c:<5} xla {tx*1e3:7.3f}ms (c{cx:5.1f}s) "
          f"abs {ta*1e3:7.3f}ms (c{ca:5.1f}s) "
          f"speedup {tx/ta:5.3f}x maxrel {err:.2e}", flush=True)
