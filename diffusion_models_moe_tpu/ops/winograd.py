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
_BT = np.array([[1, 0, -1, 0],
                [0, 1, 1, 0],
                [0, -1, 1, 0],
                [0, 1, 0, -1]], np.float32)
_G = np.array([[1, 0, 0],
               [0.5, 0.5, 0.5],
               [0.5, -0.5, 0.5],
               [0, 0, 1]], np.float32)
_AT = np.array([[1, 1, 1, 0],
                [0, 1, -1, -1]], np.float32)


def transform_filter(w: jax.Array) -> jax.Array:
    """HWIO (3, 3, Cin, Cout) -> (16, Cin, Cout) Winograd-domain filter U.

    U[xi, nu] = (G w G^T)[xi, nu]; computed in f32 (exact: G is 0/0.5/1)."""
    kh, kw = w.shape[:2]
    if (kh, kw) != (3, 3):
        raise ValueError(f"winograd filter must be 3x3, got {(kh, kw)}")
    u = jnp.einsum("xr,ys,rsio->xyio", _G, _G, w.astype(jnp.float32))
    return u.reshape(16, *w.shape[2:])


def winograd_conv3x3(x: jax.Array, w: jax.Array, out_dtype=None) -> jax.Array:
    """NHWC stride-1 SAME 3x3 convolution via Winograd F(2x2, 3x3).

    `x` (B, H, W, Cin), `w` HWIO (3, 3, Cin, Cout). Matmul runs in x.dtype
    (f32 MXU accumulation); transforms in f32. Returns (B, H, W, Cout)."""
    out_dtype = out_dtype or x.dtype
    b, h, wd, cin = x.shape
    cout = w.shape[-1]
    th, tw = math.ceil(h / 2), math.ceil(wd / 2)
    # Output tile (2i, 2j) reads padded-input rows 2i..2i+3; SAME padding puts
    # one zero row/col on top/left and enough on bottom/right for the last tile.
    pad = ((0, 0), (1, 2 * th + 1 - h), (1, 2 * tw + 1 - wd), (0, 0))
    xp = jnp.pad(x.astype(jnp.float32), pad)

    # 4x4 tile extraction as 16 strided slices (stride 2 in each direction):
    # d[r, s][:, i, j] = xp[:, 2i + r, 2j + s] — overlapping tiles, no gather.
    rows = [xp[:, r:r + 2 * th:2] for r in range(4)]
    d = jnp.stack([jnp.stack([rr[:, :, s:s + 2 * tw:2] for s in range(4)], 0)
                   for rr in rows], 0)                      # (4, 4, B, th, tw, C)

    # Input transform V = B^T d B (adds/subs only; fused by XLA).
    v = jnp.einsum("xr,ys,rsbijc->xybijc", _BT, _BT, d)
    v = v.reshape(16, b * th * tw, cin).astype(x.dtype)

    # The 16 Winograd-domain products as one batched MXU matmul.
    u = transform_filter(w).astype(x.dtype)                 # (16, Cin, Cout)
    m = lax.dot_general(v, u, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)  # (16, N, Cout)

    # Output transform Y = A^T m A, then tile reassembly + crop.
    m = m.reshape(4, 4, b, th, tw, cout)
    y = jnp.einsum("px,qy,xybijc->bipjqc", _AT, _AT, m)      # (B, th, 2, tw, 2, C)
    y = y.reshape(b, 2 * th, 2 * tw, cout)[:, :h, :wd]
    return y.astype(out_dtype)
