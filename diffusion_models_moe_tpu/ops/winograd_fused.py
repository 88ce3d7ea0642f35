"""Fused Pallas Winograd F(2x2, 3x3) convolution: transforms + MXU products
in VMEM, one HBM read of x and one write of y.

Why this kernel exists: the XLA formulation (ops/winograd.py) materializes the
Winograd-domain tensors in HBM — the 4x tile stack, the transformed V, and the
f32 product tensor all round-trip — so its 2.25x MXU-flop win drowns in ~10x
HBM traffic. Measured end-to-end it HALVES throughput (bench_modes.json:
dc3 1.4265 -> dc3_wino 0.7445 img/s; the round-2 dc3_serve collapse).
Convolutions are 50% of the denoise step's logical flops (roofline.py:
conv3x3 6.4 of 12.85 TFLOPs), so a fused Winograd that keeps the transforms
on-chip is the main lever toward the exact-leg speed of light (1.88 img/s
direct conv, 2.38 Winograd — ROOFLINE.md).

Kernel layout:
  grid = (Cout/coutb, B*row_bands)            # cout outer: u loads once/block
  in:   xe, xo (1, 2*rb+3, tw+2, Cin) bf16    # even/odd W columns of the
                                              # pre-padded band — the W
                                              # de-interleave happens OUTSIDE
                                              # the kernel as one XLA stride-2
                                              # slice, so every in-kernel
                                              # slice is unit-stride (a
                                              # reshape placing a size-2 dim
                                              # in the sublane slot retiles
                                              # the whole array; measured 6x
                                              # tile-time blowup in v1)
        u      (16, Cin, coutb)      bf16     # transformed filter (hoisted)
  out:  y      (4, rb, tw, coutb) planes      # plane p=2a+b holds pixel
                                              # (2i+a, 2j+b); de-interleaved
                                              # by one XLA transpose outside
  body: row transforms on the untiled band dim (VPU, f32, +/-1 entries of
        B^T) for the even and odd column planes -> column combos from
        unit-offset sublane windows -> 16 (N, Cin)x(Cin, coutb) MXU dots with
        the inverse transform folded into 4 f32 accumulators -> 4 contiguous
        plane stores.

Numerics match ops/winograd.py F(2x2): transform matrices are 0/±1/0.5
(binary-exact), transforms run in f32, only the dot runs in the model dtype
with f32 accumulation — output differs from the direct conv at bf16 rounding
scale (quality_modes.json quantifies it against the fp32_reference floor).

Scope: stride-1 SAME 3x3, even H/W >= 16, Cin >= 16, Cout >= 128 (tiny
spatial/channel shapes are MXU-starved — callers fall back to direct conv;
models/layers.py WinoConv gates on this via `fused_ok`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# F(2x2, 3x3) transforms (Lavin & Gray 2015) — shared with ops/winograd.py.
_BT = np.array([[1, 0, -1, 0],
                [0, 1, 1, 0],
                [0, -1, 1, 0],
                [0, 1, 0, -1]], np.float32)
_AT = np.array([[1, 1, 1, 0],
                [0, 1, -1, -1]], np.float32)


def _combo(terms, coefs):
    """Signed sum of value arrays with 0/±1/0.5 coefficients (VPU adds)."""
    acc = None
    for t, c in zip(terms, coefs):
        c = float(c)
        if c == 0.0:
            continue
        t = t if c == 1.0 else (-t if c == -1.0 else t * c)
        acc = t if acc is None else acc + t
    return acc


def _kernel(xe_ref, xo_ref, u_ref, y_ref, *, rb: int, tw: int):
    """One (row-band) x (Cout-block) tile of the convolution."""
    cin = xe_ref.shape[-1]
    n = rb * tw

    # Row transform per column-parity plane. rows_r = plane[r::2] — a select
    # on the UNTILED band dim (rank-4 (rb, 2, tw+2, cin) keeps the tiled last
    # two dims intact, so this is free of retiling).
    def rows(ref):
        x = ref[0].astype(jnp.float32)             # (2rb+3, tw+2, Cin)
        rs = [x[r:r + 2 * rb].reshape(rb, 2, tw + 2, cin)[:, 0]
              for r in range(4)]                   # 4 x (rb, tw+2, Cin)
        return [_combo(rs, _BT[xi]) for xi in range(4)]

    ee = rows(xe_ref)                              # even input columns 2j
    eo = rows(xo_ref)                              # odd input columns 2j+1

    # Position loop: column combo -> MXU dot -> folded inverse transform.
    # Input column s of tile j lives at even/odd plane column j + s//2:
    # cols[s] = (ee if s%2==0 else eo)[xi][:, s//2 : s//2+tw] — unit-stride
    # sublane windows only.
    yacc = [None] * 4                              # planes (2a+b)
    for xi in range(4):
        cols = [(ee if s % 2 == 0 else eo)[xi][:, s // 2: s // 2 + tw]
                for s in range(4)]                 # 4 x (rb, tw, Cin)
        for yi in range(4):
            v = _combo(cols, _BT[yi]).reshape(n, cin).astype(xe_ref.dtype)
            prod = jax.lax.dot_general(
                v, u_ref[4 * xi + yi], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (n, coutb)
            for a in range(2):
                for bb_ in range(2):
                    c = float(_AT[a, xi] * _AT[bb_, yi])
                    if c == 0.0:
                        continue
                    t = prod if c == 1.0 else (-prod if c == -1.0
                                               else prod * c)
                    p = 2 * a + bb_
                    yacc[p] = t if yacc[p] is None else yacc[p] + t

    coutb = y_ref.shape[-1]
    for p in range(4):
        y_ref[p] = yacc[p].reshape(rb, tw, coutb).astype(y_ref.dtype)


def _plan(th: int, tw: int, cin: int, cout: int) -> tuple[int, int]:
    """(rb, coutb): band rows so N=rb*tw ~ 256 and the f32 row-transform
    scratch stays ~<=6MB; coutb so the u block stays ~<=6MB, preferring
    128-lane multiples."""
    # N=rb*tw ~ 256 and a ~6MB u block measured best on v5e; larger N (512)
    # and a whole-filter-resident u block (16MB budget) were both tried and
    # measured 3-10% SLOWER at the 32x32/16x16 shapes (tunnel-noise bounded).
    rb = th
    while rb > 1 and (rb * tw > 256
                      or 16 * rb * (2 * tw + 2) * cin > 6 * 2 ** 20):
        rb //= 2
    if 16 * cin * cout * 2 <= 4 * 2 ** 20:
        coutb = cout
    elif cout % 128 == 0:
        # Mosaic block rule: the last dim must be 128-divisible or the full
        # array dim — pick the largest 128-multiple divisor under the budget
        coutb = 128
        for cand in range(cout, 127, -128):
            if cout % cand == 0 and 16 * cin * cand * 2 <= 6 * 2 ** 20:
                coutb = cand
                break
    else:
        coutb = cout        # block == full dim is always legal
    return rb, coutb


def fused_ok(h: int, w: int, cin: int, cout: int) -> bool:
    return (h % 2 == 0 and w % 2 == 0 and h >= 16 and w >= 16
            and cin >= 16 and cout >= 128)


def fused_profitable(h: int, w: int, cin: int, cout: int) -> bool:
    """Shapes where the fused kernel measured FASTER than XLA's direct conv
    on v5e (ROOFLINE.md §4): the 32x32 and 16x16 UNet levels win (69.3/70.3/
    92.1 vs 68.1/67.2/88.9 TF/s eff); the 64x64 levels LOSE (41.6 vs 54.4,
    57.3 vs 66.1) — at tw=32 the per-tile VPU transform cost is amortized
    over Cin<=640-wide dots that the MXU finishes faster than the VPU feeds.
    Callers fall back to the direct conv there, never the HBM-bound XLA
    Winograd formulation."""
    return fused_ok(h, w, cin, cout) and h <= 32 and w <= 32


@functools.partial(jax.jit, static_argnames=("interpret",))
def winograd3x3_fused(x: jax.Array, w: jax.Array,
                      interpret: bool = False) -> jax.Array:
    """NHWC stride-1 SAME 3x3 conv via fused Winograd F(2x2, 3x3).

    x (B, H, W, Cin) with fused_ok(H, W, Cin, Cout); w HWIO (3, 3, Cin, Cout).
    """
    from diffusion_models_moe_tpu.ops.winograd import transform_filter

    b, h, wd, cin = x.shape
    cout = w.shape[-1]
    assert fused_ok(h, wd, cin, cout), (x.shape, w.shape)
    th, tw = h // 2, wd // 2
    rb, coutb = _plan(th, tw, cin, cout)
    nb = th // rb

    u = transform_filter(w, 2).astype(x.dtype)          # (16, Cin, Cout)
    # SAME halo is 1 px; +1 extra bottom row so the r=3 shifted reads (tile
    # row i touches input rows 2i..2i+3) stay in static bounds; +3 right so
    # the padded width is even AND the odd plane has a j+1 column for the
    # last tile (s=3 reads odd-plane column tw+1).
    xp = jnp.pad(x, ((0, 0), (1, 2), (1, 3), (0, 0)))
    # W de-interleave OUTSIDE the kernel (one XLA stride-2 slice each):
    # tile j's four input columns 2j..2j+3 become unit-offset windows
    # j, j+1 of the even/odd planes.
    xe, xo = xp[:, :, 0::2], xp[:, :, 1::2]             # (b, H+3, tw+2, Cin)
    # Band-stack: overlapping row bands as one XLA gather (a ~1.2x read of x
    # at rb=8 — the only HBM amplification this path pays).
    if nb > 1:
        def stack(p):
            bands = jnp.stack([p[:, 2 * rb * i: 2 * rb * i + 2 * rb + 3]
                               for i in range(nb)], axis=1)
            return bands.reshape(b * nb, 2 * rb + 3, tw + 2, cin)
        xe, xo = stack(xe), stack(xo)
    g = b * nb

    kernel = functools.partial(_kernel, rb=rb, tw=tw)
    band_spec = pl.BlockSpec((1, 2 * rb + 3, tw + 2, cin),
                             lambda j, i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(cout // coutb, g),                 # cout outer: u cached per j
        # the default 16MB scoped-vmem budget rejects the 640-channel bands
        # (measured: "16.59M and limit 16.00M" at 32x32x640->640); the f32
        # transform scratch + double-buffered blocks fit comfortably in v5e's
        # 128MB VMEM with _plan keeping the working set ~<=32MB
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 2 ** 20),
        in_specs=[
            band_spec,
            band_spec,
            pl.BlockSpec((16, cin, coutb), lambda j, i: (0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, rb, tw, coutb),
                               lambda j, i: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4 * g, rb, tw, cout), x.dtype),
        interpret=interpret,
    )(xe, xo, u)
    # de-interleave planes: (g, 2, 2, rb, tw, c) -> (b, nb*rb*2, tw*2, c)
    out = (out.reshape(b, nb, 2, 2, rb, tw, cout)
           .transpose(0, 1, 4, 2, 5, 3, 6)
           .reshape(b, h, wd, cout))
    return out
