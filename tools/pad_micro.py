"""Micro-bench: channel-padding the lane-misaligned SD1.5 convs (320 spans
2.5 lane tiles of 128; 960 spans 7.5) up to the next 128 multiple, with
zero-padded weights — BIT-exact (zero in-channels contribute exactly zero;
zero out-channels are sliced away) like the DMOE_PAD_PROJ head-dim fold.

ROOFLINE.md §2 attributes the largest exact-leg loss to the 320-channel
64x64 convs (~43% MFU vs ~95% at 1280 channels). This measures whether XLA's
conv is faster on a physically 384/1024-channel problem than on the
misaligned logical one, despite the 1.2-1.44x extra MACs.

Variants per shape:
  direct    lax.conv at the logical channels (baseline)
  pad_io    pad x lanes in-graph -> conv at padded channels -> slice Cout
            (the realistic per-conv cost, pads/slices included)
  pre_pad   input already padded, output left padded (steady-state bound if a
            whole UNet level lives in the padded domain)

Takes the host TPU lock; chained iterations (wino_micro.py pattern) so the
tunnel cannot elide repeated executions."""
import sys
import time

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402  (lock helper)

bench._acquire_tpu_lock()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

print("backend:", jax.default_backend(), flush=True)


def rup(c, m=128):
    return ((c + m - 1) // m) * m


SHAPES = [  # (B, H, W, Cin, Cout) — the misaligned-channel conv population
    (16, 64, 64, 320, 320),    # down0 / up3 resblock convs
    (16, 64, 64, 640, 320),    # up3 concat conv (Cout misaligned only)
    (16, 64, 64, 960, 320),    # up3 concat conv (both misaligned)
    (16, 32, 32, 960, 640),    # up2 concat conv (Cin misaligned only)
]
ITERS = 20


def timeit_chained(fn, x, cin, cout):
    """fn: x -> y (both logical-width). y is widened back to cin via tile if
    rect, renormalized, and fed back — defeats result-cache elision."""
    def step(a):
        y = fn(a)
        if cout != cin:
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


def conv(x, k):
    return lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


rng = np.random.RandomState(0)
for (b, h, w, cin, cout) in SHAPES:
    cin_p, cout_p = rup(cin), rup(cout)
    x = jnp.asarray(rng.randn(b, h, w, cin), jnp.bfloat16)
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cin_p - cin)))
    k = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, jnp.bfloat16)
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, cin_p - cin), (0, cout_p - cout)))

    t_direct = timeit_chained(lambda a: conv(a, k), x, cin, cout)

    def pad_io(a):
        ap = jnp.pad(a, ((0, 0), (0, 0), (0, 0), (0, cin_p - a.shape[-1])))
        return conv(ap, kp)[..., :cout]
    t_padio = timeit_chained(pad_io, x, cin, cout)

    # steady-state: stay in the padded domain end to end
    t_prepad = timeit_chained(lambda a: conv(a, kp), xp, cin_p, cout_p)

    # exactness check (pad_io vs direct must be bit-identical)
    ref = np.asarray(jax.jit(lambda a: conv(a, k))(x), np.float32)
    got = np.asarray(jax.jit(pad_io)(x), np.float32)
    bitex = bool(np.array_equal(ref, got))

    flops = 2.0 * b * h * w * 9 * cin * cout          # logical
    flops_p = 2.0 * b * h * w * 9 * cin_p * cout_p    # padded-domain
    print(f"{h}x{w}x{cin}->{cout}: direct {t_direct*1e3:7.3f}ms "
          f"({flops/t_direct/1e12:5.1f}TF/s) "
          f"pad_io {t_padio*1e3:7.3f}ms ({flops/t_padio/1e12:5.1f}TF/s "
          f"logical) pre_pad {t_prepad*1e3:7.3f}ms "
          f"({flops_p/t_prepad/1e12:5.1f}TF/s phys) bit_exact={bitex}",
          flush=True)
