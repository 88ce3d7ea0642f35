"""Absorbed attention sub-block: fused LN+qkv prologue and out-proj+residual
epilogue kernels around the (unmodified) stock Pallas flash attention call.

Why (ROOFLINE.md §2, VERDICT r4 item 3): the last un-attacked exact-leg
residual is the attention projections (~1.685 TFLOPs, ~10% of the SD1.5
step) which XLA runs at ~36-60% MXU — it picks S-minor layouts for the
q/k/v/out dots to feed the flash custom-call's (B, H, S, d) operands, and
materializes the (B, S, H, d) <-> (B, H, S, d) transposes plus the head-dim
pad on both sides of the call. Same pathology the fused-FF absorb flipped
positive for the FF dots (ops/geglu_ff_fused.py, bench fff_pad 1.1308).

The fix mirrors that winner: subsume the boundaries instead of translating
them. Kernel A (`ln_qkv_fused`) reads x (B, S, C) once per row block,
applies the absorbed LayerNorm in f32, runs the three projection dots at the
kernel's own (row-major, lane-padded) layout, and writes q/k/v DIRECTLY in
the (B, H, S, d_pad) layout flash wants — no transpose, no pad pass, no
S-minor dots. Kernel B (`attn_out_residual_fused`) consumes flash's
(B, H, S, d_pad) output directly: per-head gather to (rows, H*d_pad), one
output dot, + bias + residual, one write of (B, S, C).

Numerics: exact-tier (rounding scale). Dots run in the model dtype with f32
accumulation (same contraction dtype as the XLA path); LN uses the flax
fast-variance formula and op order (matches geglu_ff_fused's absorbed LN);
the head-dim pad is zero columns/rows folded into the weights outside the
kernel (exact — models/attention.py:_PadHeadProj argument). Differences vs
the XLA path are only in summation/rounding points.

Reference behavior being fused (for parity audit): the self-attention
sub-block of diffusers' BasicTransformerBlock as rebuilt by
models/attention.py:Attention/_PadHeadProj/_DGOutProj (reference:
attention hooks in /root/reference/neuron_receivers/base_receiver.py — the
reference observes FF neurons, not attention internals, so no tap crosses
this kernel).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rows_per_block(s: int, c: int) -> int:
    """Row-block plan (mirrors geglu_ff_fused._plan): big enough to amortize
    per-block overhead, small enough that the f32 intermediates stay well
    inside VMEM at C=1280."""
    nb = 512 if c <= 640 else 256
    while nb > 8 and s % nb:
        nb //= 2
    return nb


def attn_absorb_ok(s: int, c: int, heads: int, d_pad: int) -> bool:
    """Shapes the kernels accept: lane-aligned padded head dim, whole-row
    blocks, and the flash-eligible sequence lengths (use_flash gate)."""
    return (d_pad % 128 == 0 and s % 8 == 0 and s >= 256
            and c == (c // heads) * heads)


def ln_apply(x: jax.Array, g: jax.Array, b: jax.Array,
             eps: float = 1e-5) -> jax.Array:
    """The absorbed-LN math on plain arrays (f32 out) — used by the
    models/attention.py fallback when the kernel path conditions fail, so
    absorb-on and absorb-off agree wherever both run."""
    f32 = jnp.float32
    xr = x.astype(f32)
    mu = jnp.mean(xr, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xr * xr, axis=-1, keepdims=True) - mu * mu,
                      0.0)
    return (xr - mu) * (jax.lax.rsqrt(var + eps) * g.astype(f32)) \
        + b.astype(f32)


def _ln(xd, g_ref, b_ref, eps: float):
    """Absorbed LayerNorm prologue in f32 — fast-variance formula + flax op
    order, matching geglu_ff_fused._kernel's absorbed LN exactly."""
    f32 = jnp.float32
    xr = xd.astype(f32)
    mu = jnp.mean(xr, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xr * xr, axis=-1, keepdims=True) - mu * mu,
                      0.0)
    mul = jax.lax.rsqrt(var + eps) * g_ref[0]
    return ((xr - mu) * mul + b_ref[0]).astype(xd.dtype)


def _qkv_kernel(x_ref, w_ref, g_ref, b_ref,
                q_ref, k_ref, v_ref, *, heads: int, d_pad: int, eps: float,
                has_ln: bool):
    xd = x_ref[0]                                    # (nb, C) model dtype
    if has_ln:
        xd = _ln(xd, g_ref, b_ref, eps)
    # ONE (nb, C) @ (C, 3*heads*d_pad) MXU call (wq|wk|wv concatenated by
    # the wrapper): longer N pipelines better than three separate dots,
    # identical per-column math (f32 accumulation per output column)
    y = jax.lax.dot_general(xd, w_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32
                            ).astype(xd.dtype)
    for t, o_ref in enumerate((q_ref, k_ref, v_ref)):
        base = t * heads * d_pad
        for h in range(heads):                       # lane-aligned slices
            o_ref[0, h] = y[:, base + h * d_pad:base + (h + 1) * d_pad]


@functools.partial(jax.jit, static_argnames=("heads", "eps", "interpret"))
def ln_qkv_fused(x: jax.Array, wq: jax.Array, wk: jax.Array, wv: jax.Array,
                 heads: int,
                 ln_scale: jax.Array | None = None,
                 ln_bias: jax.Array | None = None,
                 eps: float = 1e-5, interpret: bool = False):
    """x (B, S, C); wq/wk/wv (C, heads*d_pad) with the head-dim pad already
    folded in as zero columns (model dtype). Returns (q, k, v) each
    (B, heads, S, d_pad) — the stock flash kernel's operand layout. With
    ln_scale/ln_bias (C,) f32, applies the absorbed LayerNorm first."""
    b, s, c = x.shape
    d_pad = wq.shape[1] // heads
    assert attn_absorb_ok(s, c, heads, d_pad), (x.shape, wq.shape, heads)
    nb = _rows_per_block(s, c)
    has_ln = ln_scale is not None
    assert (ln_scale is None) == (ln_bias is None)
    wqkv = jnp.concatenate([wq, wk, wv], axis=1)     # (C, 3*heads*d_pad);
    # loop-invariant, so XLA hoists the concat out of the denoise scan
    const = lambda b_, i: (0, 0)                     # noqa: E731
    in_specs = [
        pl.BlockSpec((1, nb, c), lambda b_, i: (b_, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(wqkv.shape, const, memory_space=pltpu.VMEM),
    ]
    args = [x, wqkv]
    if has_ln:
        for a in (ln_scale, ln_bias):
            a2 = a.astype(jnp.float32).reshape(1, -1)
            in_specs.append(pl.BlockSpec(a2.shape, const,
                                         memory_space=pltpu.VMEM))
            args.append(a2)
    kernel = functools.partial(_qkv_dispatch, heads=heads, d_pad=d_pad,
                               eps=eps, has_ln=has_ln)
    out_spec = pl.BlockSpec((1, heads, nb, d_pad), lambda b_, i: (b_, 0, i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, heads, s, d_pad), x.dtype)
    return pl.pallas_call(
        kernel,
        grid=(b, s // nb),
        in_specs=in_specs,
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(out_shape, out_shape, out_shape),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(*args)


def _qkv_dispatch(x_ref, w_ref, *rest, heads: int,
                  d_pad: int, eps: float, has_ln: bool):
    """Unpack optional LN refs (pallas passes refs positionally)."""
    rest = list(rest)
    g_ref = rest.pop(0) if has_ln else None
    b_ref = rest.pop(0) if has_ln else None
    q_ref, k_ref, v_ref = rest
    _qkv_kernel(x_ref, w_ref, g_ref, b_ref,
                q_ref, k_ref, v_ref, heads=heads, d_pad=d_pad, eps=eps,
                has_ln=has_ln)


def _out_kernel(o_ref, w_ref, b_ref, r_ref, y_ref, *, heads: int,
                d_pad: int):
    f32 = jnp.float32
    rows = [o_ref[0, h] for h in range(heads)]       # each (nb, d_pad)
    o2 = jnp.concatenate(rows, axis=-1)              # (nb, heads*d_pad)
    y = jax.lax.dot_general(o2, w_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=f32)
    y = y + b_ref[0].astype(f32)
    y = y.astype(y_ref.dtype)
    y_ref[0] = r_ref[0] + y                          # residual, model order


def absorbed_self_attention(x: jax.Array, wq: jax.Array, wk: jax.Array,
                            wv: jax.Array, wo: jax.Array, bo: jax.Array,
                            heads: int, sm_scale: float,
                            ln: tuple, interpret: bool = False) -> jax.Array:
    """The absorbed self-attention sub-block — returns
    ``x + to_out(flash(qkv(LN(x))))``. Dispatch on DMOE_ATTN_ABSORB
    (models/attention.py wires '!= 0'; the mode split lives HERE so kernel
    iterations touch only this leg-gated file):

      1     both kernels (prologue + epilogue)
      qkv   ln_qkv_fused prologue only; XLA out-proj epilogue (the
            _DGOutProj math on flash's transposed-back output)
      out   XLA LN + projection dots + transpose prologue;
            attn_out_residual_fused epilogue only

    The qkv/out legs bisect the r5 profile finding: the full absorb adds
    550 ms/gen of kernel time against ~541 ms of removed XLA boundary work
    (convolution_bitcast_fusion 382 + LN convert_reduce 159) — which half
    carries the loss? wq/wk/wv (C, heads*d_pad) pad-folded; wo
    (heads*d_pad, C) pad rows; bo (C,) f32."""
    import os

    from diffusion_models_moe_tpu.ops.flash import flash_bhsd
    mode = os.environ.get("DMOE_ATTN_ABSORB", "0")
    g, b, eps = ln
    bsz, s, c = x.shape
    d_pad = wq.shape[1] // heads
    xd = x.astype(wq.dtype)
    if mode in ("1", "qkv"):
        q, k, v = ln_qkv_fused(xd, wq, wk, wv, heads=heads, ln_scale=g,
                               ln_bias=b, eps=eps, interpret=interpret)
    else:
        xn = ln_apply(xd, g, b, eps).astype(wq.dtype)

        def proj(w):
            return (xn @ w).reshape(bsz, s, heads,
                                    d_pad).transpose(0, 2, 1, 3)
        q, k, v = proj(wq), proj(wk), proj(wv)
    o = flash_bhsd(q, k, v, sm_scale)
    if mode in ("1", "out"):
        return attn_out_residual_fused(o.astype(wq.dtype), wo, bo, xd,
                                       interpret=interpret)
    # XLA epilogue: the pad_proj path's _DGOutProj math + residual add
    o4 = o.transpose(0, 2, 1, 3).astype(wq.dtype)      # (B, S, H, d_pad)
    w3 = wo.reshape(heads, d_pad, c)
    y = jax.lax.dot_general(o4, w3, (((2, 3), (0, 1)), ((), ())))
    return xd + (y + bo.astype(wq.dtype))


@functools.partial(jax.jit, static_argnames=("interpret",))
def attn_out_residual_fused(o: jax.Array, w: jax.Array, bias: jax.Array,
                            residual: jax.Array,
                            interpret: bool = False) -> jax.Array:
    """o (B, heads, S, d_pad) — flash output, consumed in its own layout;
    w (heads*d_pad, C) with pad rows zero (model dtype); bias (C,) f32;
    residual (B, S, C). Returns residual + o @ w + bias, (B, S, C)."""
    b, heads, s, d_pad = o.shape
    c = residual.shape[-1]
    nb = _rows_per_block(s, c)
    bias2 = bias.astype(jnp.float32).reshape(1, -1)
    const = lambda b_, i: (0, 0)                     # noqa: E731
    kernel = functools.partial(_out_kernel, heads=heads, d_pad=d_pad)
    return pl.pallas_call(
        kernel,
        grid=(b, s // nb),
        in_specs=[
            pl.BlockSpec((1, heads, nb, d_pad), lambda b_, i: (b_, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(bias2.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb, c), lambda b_, i: (b_, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nb, c), lambda b_, i: (b_, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, c), residual.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(o, w, bias2, residual)
