"""Winograd F(2x2, 3x3) convolution for the UNet's stride-1 3x3 convs.

Convolutions are 55% of the SD1.5 denoise step on v5e (docs/profiling.md);
Winograd's minimal-filtering algorithm computes each 2x2 output tile with 16
multiplies instead of 36 — a 2.25x reduction in MXU flops — by transforming
4x4 input tiles and the 3x3 filters into an element-wise product space:

    Y = A^T [ (G g G^T) .* (B^T d B) ] A        (Lavin & Gray, 2015)

Mapped to TPU: the 16 per-position products become a batched matmul
`(16, B*tiles, Cin) @ (16, Cin, Cout)` (MXU), and the input/output transforms
are +/- / x0.5 combinations (VPU adds, fused by XLA into the surrounding
elementwise work). The filter transform is loop-invariant in the denoise scan,
so XLA hoists it (same argument as the int8 weight quantize, ops/quant.py).

Numerics: the transform matrices contain only 0, +/-1, 0.5 (exact in binary);
transforms run in f32 and only the batched matmul runs in the model dtype
(bf16 on TPU, f32 accumulation on the MXU). Outputs still differ from the
direct convolution at bf16 rounding scale, so — like int8 — this is an
OPT-IN serving mode (`UNetConfig.conv_winograd`), never the parity headline.
The reference has no such path (pure torch convs — SURVEY.md §0).

Scope: stride-1 SAME 3x3 convs only (the ResnetBlock2D/Upsample2D bodies);
stride-2 downsampling and 1x1 shortcut convs stay direct.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# F(2x2, 3x3) transform matrices (Lavin & Gray 2015, eq. 10-11).
_BT2 = np.array([[1, 0, -1, 0],
                 [0, 1, 1, 0],
                 [0, -1, 1, 0],
                 [0, 1, 0, -1]], np.float32)
_G2 = np.array([[1, 0, 0],
                [0.5, 0.5, 0.5],
                [0.5, -0.5, 0.5],
                [0, 0, 1]], np.float32)
_AT2 = np.array([[1, 1, 1, 0],
                 [0, 1, -1, -1]], np.float32)

# F(4x4, 3x3) (Lavin & Gray 2015 §4.1): 6x6 tiles, stride 4 — 36 multiplies
# per 16 outputs = 4x fewer than direct. G has 1/6, 1/12, 1/24 entries (not
# binary-exact), so bf16 error is slightly larger than F(2x2); still at
# rounding scale for SD weight magnitudes.
_BT4 = np.array([[4, 0, -5, 0, 1, 0],
                 [0, -4, -4, 1, 1, 0],
                 [0, 4, -4, -1, 1, 0],
                 [0, -2, -1, 2, 1, 0],
                 [0, 2, -1, -2, 1, 0],
                 [0, 4, 0, -5, 0, 1]], np.float32)
_G4 = np.array([[1 / 4, 0, 0],
                [-1 / 6, -1 / 6, -1 / 6],
                [-1 / 6, 1 / 6, -1 / 6],
                [1 / 24, 1 / 12, 1 / 6],
                [1 / 24, -1 / 12, 1 / 6],
                [0, 0, 1]], np.float32)
_AT4 = np.array([[1, 1, 1, 1, 1, 0],
                 [0, 1, -1, 2, -2, 0],
                 [0, 1, 1, 4, 4, 0],
                 [0, 1, -1, 8, -8, 1]], np.float32)

_MATS = {2: (_BT2, _G2, _AT2), 4: (_BT4, _G4, _AT4)}


def _tile() -> int:
    """Output tile size m in F(mxm, 3x3): 2 (default) or 4 via DMOE_WINO_TILE
    (env knob, same style as the other measured perf toggles)."""
    import os
    t = int(os.environ.get("DMOE_WINO_TILE", "2"))
    if t not in _MATS:
        raise ValueError(f"DMOE_WINO_TILE must be one of {sorted(_MATS)}")
    return t


def transform_filter(w: jax.Array, tile: int = 2) -> jax.Array:
    """HWIO (3, 3, Cin, Cout) -> ((m+2)^2, Cin, Cout) Winograd filter U.

    U[xi, nu] = (G w G^T)[xi, nu]; computed in f32."""
    kh, kw = w.shape[:2]
    if (kh, kw) != (3, 3):
        raise ValueError(f"winograd filter must be 3x3, got {(kh, kw)}")
    g = _MATS[tile][1]
    u = jnp.einsum("xr,ys,rsio->xyio", g, g, w.astype(jnp.float32))
    return u.reshape((tile + 2) ** 2, *w.shape[2:])


def _stack_budget_bytes() -> int:
    """Peak-memory budget for the Winograd-domain tensors, in bytes.

    DMOE_WINO_STACK_MB (default 512) bounds the f32 V/product tensors per
    band; the band matmuls stay MXU-sized well below this (N >= B*tw per
    band row). Without banding the a^2-way tile stack scales with
    a^2*B*th*tw*C — multi-GB at VAE-decode resolutions (512^2 x C>=128)."""
    import os
    return int(float(os.environ.get("DMOE_WINO_STACK_MB", "512")) * 2**20)


def _winograd_band(xp: jax.Array, u: jax.Array, bt, at, m: int, th: int,
                   tw: int, dtype) -> jax.Array:
    """One tile-row band: padded input rows (B, m*th+2, m*tw+2, Cin) ->
    output (B, m*th, m*tw, Cout). Same math whether the image comes in as a
    single band or many (per-tile independence => identical results)."""
    a = m + 2
    b, cin = xp.shape[0], xp.shape[-1]
    cout = u.shape[-1]
    # axa tile extraction as a^2 strided slices (stride m in each direction):
    # d[r, s][:, i, j] = xp[:, m*i + r, m*j + s] — overlapping tiles, no gather.
    rows = [xp[:, r:r + m * th:m] for r in range(a)]
    d = jnp.stack([jnp.stack([rr[:, :, s:s + m * tw:m] for s in range(a)], 0)
                   for rr in rows], 0)                   # (a, a, B, th, tw, C)

    # Input transform V = B^T d B (small-constant combinations; fused by XLA).
    v = jnp.einsum("xr,ys,rsbijc->xybijc", bt, bt, d)
    v = v.reshape(a * a, b * th * tw, cin).astype(dtype)

    # The a^2 Winograd-domain products as one batched MXU matmul.
    prod = lax.dot_general(v, u, (((2,), (1,)), ((0,), (0,))),
                           preferred_element_type=jnp.float32)  # (a^2, N, Cout)

    # Output transform Y = A^T prod A, then tile reassembly.
    prod = prod.reshape(a, a, b, th, tw, cout)
    y = jnp.einsum("px,qy,xybijc->bipjqc", at, at, prod)  # (B, th, m, tw, m, C)
    return y.reshape(b, m * th, m * tw, cout)


def winograd_conv3x3(x: jax.Array, w: jax.Array, out_dtype=None,
                     tile: int | None = None) -> jax.Array:
    """NHWC stride-1 SAME 3x3 convolution via Winograd F(mxm, 3x3).

    `x` (B, H, W, Cin), `w` HWIO (3, 3, Cin, Cout). The (m+2)^2 per-position
    products run as one batched MXU matmul in x.dtype (f32 accumulation);
    transforms in f32. The image is processed in tile-row bands sized by
    DMOE_WINO_STACK_MB so the Winograd-domain intermediates stay bounded at
    any resolution (the VAE decoder's 512^2 convs would otherwise build
    multi-GB stacks); tiles are independent, so banding matches single-shot
    to float rounding (XLA may reassociate the transform sums per band
    shape). Returns (B, H, W, Cout)."""
    out_dtype = out_dtype or x.dtype
    m = tile if tile is not None else _tile()
    bt, _, at = _MATS[m]
    a = m + 2                                   # input tile size
    b, h, wd, cin = x.shape
    cout = w.shape[-1]
    th, tw = math.ceil(h / m), math.ceil(wd / m)
    # Output tile (mi, mj) reads padded-input rows mi..mi+a-1; SAME padding puts
    # one zero row/col on top/left and enough on bottom/right for the last tile.
    pad = ((0, 0), (1, m * th + 1 - h), (1, m * tw + 1 - wd), (0, 0))
    # Pad/tile in the input dtype: the a^2-way tile stack is the largest
    # intermediate (a^2/m^2 = 4x/2.25x the input elements); the transform
    # einsum in _winograd_band promotes to f32 anyway (f32 bt), so upcasting
    # here would only double its memory.
    xp = jnp.pad(x, pad)
    u = transform_filter(w, m).astype(x.dtype)           # (a^2, Cin, Cout)

    # f32 V bytes per tile row (the product tensor is the same size with Cout).
    band_bytes = a * a * b * tw * max(cin, cout) * 4
    rows = max(1, min(th, _stack_budget_bytes() // band_bytes))
    bands = []
    for i0 in range(0, th, rows):
        n = min(rows, th - i0)
        xb = lax.slice_in_dim(xp, m * i0, m * (i0 + n) + (a - m), axis=1)
        bands.append(_winograd_band(xb, u, bt, at, m, n, tw, x.dtype))
    y = bands[0] if len(bands) == 1 else jnp.concatenate(bands, axis=1)
    return y[:, :h, :wd].astype(out_dtype)
