"""Fused Pallas resblock-conv chain: GN(affine)+SiLU prologue -> direct 3x3
conv -> bias/time epilogue -> residual add, in one kernel.

Why this kernel exists (ROOFLINE.md §3a): the per-shape fused-Winograd wins
die at the pallas_call boundary — each kernel conv materializes its input
(losing the GN+SiLU prologue fusion) and un-fuses its bias/residual epilogue,
so "a profitable fused conv here must subsume the whole
GN->SiLU->conv->bias->residual chain, not just the conv". This kernel is that
chain. It also attacks the other named exact-leg loss: the lane-misaligned
320/960-channel convs (~43% MFU measured for XLA's direct conv at
64x64x320->320 — 320 spans 2.5 lane tiles of 128). Inside the kernel every
dot runs on Mosaic's 128-lane-padded operands (320->384, 960->1024), i.e. the
channel-pad is implicit and the tap dots are clean (N, Cin)x(Cin, Cout) MXU
shapes.

The reference's resblocks are torch Conv2d modules under hooks (reference
L0: diffusers ResnetBlock2D; SURVEY.md §1) — no fused equivalent exists
there; this is TPU-native performance work on the same math.

Dataflow per (cout-block, row-band) grid step:
  x band   (1, rb+2, wd+2, Cin) bf16   overlapping row bands, stacked OUTSIDE
                                       the kernel (one XLA gather, the
                                       winograd_fused.py pattern; (rb+2)/rb
                                       read amplification is the only HBM
                                       overhead this path pays)
  scale/shift (1, 1, Cin) f32          per-sample GN affine fold:
                                       scale=rstd*gamma, shift=beta-mean*scale
                                       (stats are a cheap XLA reduction
                                       outside; see gn_scale_shift)
  w        (9, Cin, coutb) bf16        HWIO reshaped, resident across bands
  bt       (1, 1, coutb)   bf16        bias (+ per-sample time embedding)
  res      (1, rb, wd, coutb) bf16     optional residual (no halo, no restack)
  body: xn = silu(x*scale+shift) once per band (VPU, f32) -> 9 shifted
        unit-offset sublane windows -> 9 (n, Cin)x(Cin, coutb) MXU dots into
        one f32 accumulator -> cast, + bt, + res, store.

Numerics: prologue in f32 (matches nn.GroupNorm(dtype=f32) + silu-then-cast),
conv taps accumulate f32, epilogue adds in bf16 in model order. Output
differs from the XLA path only at rounding scale (fold order of the GN
affine, tap summation order, exp-based sigmoid) — the same exact-tier
(rounding-scale) class as winograd_fused; quality_modes.py's chain rows
quantify it against the fp32_reference floor.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def gn_scale_shift(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                   groups: int, eps: float) -> tuple[jax.Array, jax.Array]:
    """Fold GroupNorm stats+affine into per-(sample, channel) scale/shift.

    (x - mean) * rstd * gamma + beta == x * scale + shift with
    scale = rstd * gamma, shift = beta - mean * scale. Stats in f32 over
    (H, W, C/G) like nn.GroupNorm(dtype=float32). Returns (N, C) f32 pairs.
    """
    n, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(n, h * w, groups, c // groups)
    mean = xf.mean(axis=(1, 3))                          # (N, G)
    var = xf.var(axis=(1, 3))
    rstd = jax.lax.rsqrt(var + eps)
    reps = c // groups
    mean_c = jnp.repeat(mean, reps, axis=-1)             # (N, C)
    rstd_c = jnp.repeat(rstd, reps, axis=-1)
    scale = rstd_c * gamma[None].astype(jnp.float32)
    shift = beta[None].astype(jnp.float32) - mean_c * scale
    return scale, shift


def _kernel(x_ref, s_ref, t_ref, w_ref, bt_ref, *rest, rb: int, wd: int,
            nb: int, prologue: bool, has_res: bool, im2: bool = False):
    """One (cout-block) x (row-band) tile of the fused chain."""
    im2_ref = None
    if im2:
        *rest, im2_ref = rest
    if has_res:
        r_ref, y_ref = rest
    else:
        (y_ref,) = rest
    cin = x_ref.shape[-1]
    coutb = y_ref.shape[-1]
    n = rb * wd

    x = x_ref[0].astype(jnp.float32)                     # (rb+2, wd+2, Cin)
    if prologue:
        xn = x * s_ref[0] + t_ref[0]                     # GN affine fold
        # exp-based sigmoid: Mosaic has exp; jax.nn.sigmoid's logistic
        # primitive is not guaranteed (cf. the in-kernel erf in
        # geglu_ff_fused.py — same reason)
        xn = xn * (1.0 / (1.0 + jnp.exp(-xn)))           # SiLU
        # SAME padding must contribute zeros of the NORMALIZED tensor —
        # silu(0*scale+shift) = silu(shift) != 0, so zero the band's border
        # positions (global rows 0/H+1 in the spatially padded frame, columns
        # 0/W+1 in every band)
        band = pl.program_id(1) % nb
        # 3D iotas: adding a minor dim to an i1 mask is not a Mosaic no-op
        # ("Insertion of minor dim ... only supported for 32-bit types"), so
        # build the mask at broadcastable rank directly
        rows = (jax.lax.broadcasted_iota(jnp.int32, (rb + 2, wd + 2, 1), 0)
                + rb * band)
        cols = jax.lax.broadcasted_iota(jnp.int32, (rb + 2, wd + 2, 1), 1)
        h_total = nb * rb
        interior = ((rows >= 1) & (rows <= h_total)
                    & (cols >= 1) & (cols <= wd))
        xn = jnp.where(interior, xn, 0.0)
    else:
        xn = x
    xn = xn.astype(x_ref.dtype)

    acc = None
    if im2:
        # width-im2col: stage the 3 dx-shifted windows side-by-side in a VMEM
        # scratch (the stores normalize each slice's sublane offset — a
        # direct lane-dim concat of differently-offset windows is a Mosaic
        # "offset mismatch on non-concat dimension" compile error), then 3
        # (n, 3Cin)x(3Cin, coutb) dots — 3 staged copies + 3 dots instead of
        # tap9's 9 window copies + 9 dots; same padded MACs (Cin pre-padded
        # to a 128 multiple outside, so the scratch offsets are lane-aligned)
        for dx in range(3):
            im2_ref[:, :, dx * cin:(dx + 1) * cin] = xn[:, dx:dx + wd]
        xn3 = im2_ref[...]                               # (rb+2, wd, 3Cin)
        for dy in range(3):
            v = xn3[dy:dy + rb].reshape(n, 3 * cin)
            p = jax.lax.dot_general(
                v, w_ref[dy], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (n, coutb)
            acc = p if acc is None else acc + p
    else:
        for dy in range(3):
            for dx in range(3):
                # row slice on the untiled band dim (free); column slice is a
                # unit-offset sublane window (winograd_fused.py pattern); the
                # reshape merges (rb, wd) with wd a sublane-tile multiple
                v = xn[dy:dy + rb, dx:dx + wd].reshape(n, cin)
                p = jax.lax.dot_general(
                    v, w_ref[3 * dy + dx], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (n, coutb)
                acc = p if acc is None else acc + p

    y = acc.astype(y_ref.dtype) + bt_ref[0]              # bias(+time), bf16
    if has_res:
        y = y + r_ref[0].reshape(n, coutb)
    y_ref[0] = y.reshape(rb, wd, coutb)


def _plan_rb(h: int, wd: int) -> int:
    """Band rows: n = rb*wd ~ 512 MXU rows, rb divides H, halo (rb+2)/rb
    amortized."""
    rb = max(1, min(h, 512 // wd))
    while h % rb:
        rb -= 1
    return rb


def _plan_coutb(cin: int, cout: int) -> int:
    """Largest 128-multiple divisor of cout keeping the (9, Cin, coutb)
    weight block <= ~20MB (double-buffered under the 100MB VMEM budget);
    falls back to the full dim (always a legal block)."""
    if 9 * cin * cout * 2 <= 20 * 2 ** 20:
        return cout
    for c in range(cout - 128, 0, -128):
        if cout % c == 0 and 9 * cin * c * 2 <= 20 * 2 ** 20:
            return c
    return cout


def chain_ok(h: int, w: int, cin: int, cout: int) -> bool:
    # sublane-merge in the tap reshape needs wd a multiple of the bf16
    # sublane tile (16); spatial >= 16 keeps the MXU fed
    return h >= 16 and w >= 16 and w % 16 == 0 and cin >= 16 and cout >= 128


def chain_profitable(h: int, w: int, cin: int, cout: int) -> bool:
    """Shapes where the fused chain measured FASTER than the XLA composite
    (GN stats -> normalize+SiLU -> barrier -> direct conv -> bias ->
    residual) on v5e, tools/chain_micro.py 2026-08-20 (ROOFLINE.md §4b):

      16x16x1280->1280  3.213 -> 1.939 ms  (1.657x)  <- the big one: XLA's
                        composite is elementwise-bound at 16x16 (37.6 TF/s)
      32x32x 640-> 640  2.046 -> 1.992 ms  (1.027x)
      32x32x 960-> 640  2.805 -> 2.728 ms  (1.028x)

    Losers stay on the XLA path: all 64x64 shapes (0.84-0.96x — at wd=64 the
    9 per-tap sublane-window copies outrun the dots), 32x32x1280->640
    (0.867x) and 16x16x2560->1280 (0.977x) (XLA's conv already runs at
    77-89 TF/s there).

    DMOE_CHAIN_SHAPES restricts dispatch further (end-to-end bisection:
    chain_pad measured -4.3% despite these micro wins — ROOFLINE.md §3d —
    so which call sites carry the boundary tax?): "16" = only the 1.657x
    16x16x1280->1280 sites; default "16,32" = all micro winners."""
    if not chain_ok(h, w, cin, cout):
        return False
    # strict parse (ADVICE r4): a typo'd bisection leg must not silently
    # measure the XLA path while labeled as a chain mode
    raw = os.environ.get("DMOE_CHAIN_SHAPES", "16,32")
    allowed = [t.strip() for t in raw.split(",") if t.strip()]
    bad = [t for t in allowed if t not in ("16", "32")]
    if bad:
        raise ValueError(
            f"DMOE_CHAIN_SHAPES={raw!r}: unknown tokens {bad} "
            "(valid: '16', '32')")
    if h == 16 and w == 16 and "16" in allowed:
        return cin == 1280 and cout == 1280
    if h == 32 and w == 32 and "32" in allowed:
        return cout == 640 and cin in (640, 960)
    return False


@functools.partial(
    jax.jit, static_argnames=("prologue", "variant", "interpret"))
def conv3x3_chain(x: jax.Array, w: jax.Array, bt: jax.Array,
                  scale: jax.Array | None = None,
                  shift: jax.Array | None = None,
                  residual: jax.Array | None = None,
                  prologue: bool = True,
                  variant: str = "tap9",
                  interpret: bool = False) -> jax.Array:
    """Fused [GN-affine+SiLU ->] 3x3 SAME conv [-> +bias/time -> +residual].

    x (B, H, W, Cin) bf16; w HWIO (3, 3, Cin, Cout); bt (B, Cout) per-sample
    bias (conv bias + optional time-embedding projection, model dtype);
    scale/shift (B, Cin) f32 from gn_scale_shift (required when prologue);
    residual (B, H, W, Cout) optional. variant: "tap9" (9 per-tap dots) or
    "im2col3" (in-kernel width-im2col, 3 dots of K=3*Cin — fewer
    sublane-window copies per band; Cin is lane-padded outside so the concat
    is tile-aligned and the padded MAC count is identical).
    """
    b, h, wd, cin = x.shape
    cout = w.shape[-1]
    assert chain_ok(h, wd, cin, cout), (x.shape, w.shape)
    assert variant in ("tap9", "im2col3"), variant
    im2 = variant == "im2col3"
    if im2 and cin % 128:
        cp = ((cin + 127) // 128) * 128
        # zero lane-pad: zero scale/shift keep the padded channels at
        # silu(0)=0 through the prologue; zero weight rows contribute zero
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cp - cin)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, cp - cin), (0, 0)))
        if scale is not None:
            scale = jnp.pad(scale, ((0, 0), (0, cp - cin)))
            shift = jnp.pad(shift, ((0, 0), (0, cp - cin)))
        cin = cp
    rb = _plan_rb(h, wd)
    nb = h // rb
    coutb = _plan_coutb(cin, cout)
    has_res = residual is not None

    if im2:
        # (3, 3*Cin, Cout): rows dx*Cin + c of plane dy hold w[dy, dx, c]
        w9 = w.reshape(3, 3 * cin, cout).astype(x.dtype)
    else:
        w9 = w.reshape(9, cin, cout).astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    if nb > 1:
        xb = jnp.stack([xp[:, rb * i: rb * i + rb + 2] for i in range(nb)],
                       axis=1).reshape(b * nb, rb + 2, wd + 2, cin)
    else:
        xb = xp
    if prologue:
        assert scale is not None and shift is not None
        s3 = scale.reshape(b, 1, cin)
        t3 = shift.reshape(b, 1, cin)
    else:  # dummies keep one pallas_call signature; the kernel ignores them
        s3 = jnp.zeros((b, 1, cin), jnp.float32)
        t3 = s3
    bt3 = bt.reshape(b, 1, cout).astype(x.dtype)

    kernel = functools.partial(_kernel, rb=rb, wd=wd, nb=nb,
                               prologue=prologue, has_res=has_res, im2=im2)
    wspec = ((3, 3 * cin, coutb) if im2 else (9, cin, coutb))
    in_specs = [
        pl.BlockSpec((1, rb + 2, wd + 2, cin), lambda co, i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, cin), lambda co, i: (i // nb, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, cin), lambda co, i: (i // nb, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(wspec, lambda co, i: (0, 0, co),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, coutb), lambda co, i: (i // nb, 0, co),
                     memory_space=pltpu.VMEM),
    ]
    args = [xb, s3, t3, w9, bt3]
    if has_res:
        in_specs.append(
            pl.BlockSpec((1, rb, wd, coutb),
                         lambda co, i: (i // nb, i % nb, 0, co),
                         memory_space=pltpu.VMEM))
        args.append(residual.astype(x.dtype))
    out = pl.pallas_call(
        kernel,
        grid=(cout // coutb, b * nb),    # cout outer: w loads once per block
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 2 ** 20),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, rb, wd, coutb),
                               lambda co, i: (i // nb, i % nb, 0, co),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, cout), x.dtype),
        scratch_shapes=([pltpu.VMEM((rb + 2, wd, 3 * cin), x.dtype)]
                        if im2 else []),
        interpret=interpret,
    )(*args)
    return out
