"""Fused GEGLU feed-forward Pallas kernel: proj dots + exact GELU + top-k
expert routing + masked product + output projection, one HBM round-trip.

Why: the profiled exact-leg residual (README ceiling study, ROOFLINE.md §2)
is the FF/projection dots at ~36-60% MXU — XLA materializes the (B, S, 2H)
hidden/gate activations in HBM between the proj dot and the gelu*hidden
product (the split-proj epilogue fusion halves this, commit history in
_GEGLUProj's docstring), and the routing mask adds two more passes over
(B, S, H). This kernel keeps everything per row-block in VMEM: the only HBM
traffic is one read of x, one write of y, and the weights (resident across
the whole grid — constant index_map blocks are loaded once).

Routing semantics match `taps.routing_mask` default (threshold, ties kept):
score[n, e] = sum of post-GELU gate over expert e's neurons; keep experts
with score >= kth-largest. The kth value is found per row by float bisection
on the score range (BISECT_ITERS halvings), then snapped to the smallest
actual score above the bisected threshold — exact threshold semantics as
long as the kth/(k+1)th scores are separated by > range * 2^-BISECT_ITERS
(f32 scores that differ at all are separated by >= 2^-24 relative; ties are
kept by construction, matching `score >= kth`).

Numerics: dots run in the model dtype with f32 accumulation (MXU), GELU/bias
/mask arithmetic in f32 (VPU) — same contraction dtype as the XLA path, so
outputs agree at dtype-rounding scale (exact-GELU erf included; bf16 end to
end differs from the XLA path only in elementwise rounding points). The f32
mode matches the XLA path to ~1e-6 (tests/test_geglu_ff_fused.py).

Reference behavior being fused (for parity audit): the GEGLU routing math of
neuron_receivers/moefy.py:10-27 as implemented by
models/attention.py:GEGLUFeedForward + taps.routing_mask.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BISECT_ITERS = 40


def _erf(x):
    """erf from exp-only primitives (Abramowitz & Stegun 7.1.26, max abs err
    1.5e-7): Mosaic's Pallas TPU lowering has no `erf` primitive (observed:
    'Unimplemented primitive in Pallas TPU lowering for KernelType.TC: erf'
    on v5e), so the exact-GELU path builds it from exp/mul/add. The 1.5e-7
    erf error bounds the GELU error by 0.75e-7*|x| — far inside the kernel's
    1e-5 parity tolerance and invisible at bf16 output rounding."""
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    e = 1.0 - poly * jnp.exp(-a * a)
    return jnp.where(x < 0.0, -e, e)


def _gelu_exact(x):
    """Exact (erf) GELU in f32 — matches jax.nn.gelu(approximate=False) to
    ~1e-7 (see _erf)."""
    return x * 0.5 * (1.0 + _erf(x * (2.0 ** -0.5)))


def _kth_largest(s, k: int):
    """Per-row kth-largest of s (n, e) f32 by bisection, snapped to an actual
    score value. Returns (n, 1). Threshold semantics: mask = s >= kth keeps
    >= k experts (ties included), matching taps.routing_mask default."""
    lo = jnp.min(s, axis=-1, keepdims=True)
    hi = jnp.max(s, axis=-1, keepdims=True)
    # invariant: count(s >= lo) >= k  (lo = rowmin counts all e >= k >= 1)
    #            count(s >= hi) <= k  (hi = rowmax counts >= 1; k >= 1)
    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum((s >= mid).astype(jnp.float32), axis=-1, keepdims=True)
        take = cnt >= k
        return jnp.where(take, mid, lo), jnp.where(take, hi, mid)
    lo, hi = jax.lax.fori_loop(0, BISECT_ITERS, body, (lo, hi))
    # snap to the smallest actual score >= lo (the kth value itself)
    big = jnp.asarray(jnp.finfo(jnp.float32).max, jnp.float32)
    return jnp.min(jnp.where(s >= lo, s, big), axis=-1, keepdims=True)


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, pat_ref, y_ref, *,
            hdim: int, k: int, relu: bool, g_ref=None, bb_ref=None,
            eps: float = 1e-5):
    f32 = jnp.float32
    xd = x_ref[...]                                     # (nb, C) model dtype
    ln_resid = g_ref is not None
    if ln_resid:
        # absorbed LayerNorm prologue (VERDICT r3 #7): per-row stats are
        # local to the row block, so the whole  x + ff(ln(x))  transformer
        # sub-block fuses — no LN write, no ff-input read, no residual pass.
        # Fast-variance formula + f32, matching nn.LayerNorm defaults.
        xr = xd.astype(f32)
        mu = jnp.mean(xr, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(xr * xr, axis=-1, keepdims=True) - mu * mu, 0.0)
        # flax op order: fold rsqrt into scale first, then one fma
        mul = jax.lax.rsqrt(var + eps) * g_ref[0]
        xn = (xr - mu) * mul + bb_ref[0]
        xd = xn.astype(x_ref.dtype)

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    h = dot(xd, w1_ref[:, :hdim]) + b1_ref[0, :hdim].astype(f32)
    g = dot(xd, w1_ref[:, hdim:]) + b1_ref[0, hdim:].astype(f32)
    ga = jnp.maximum(g, 0.0) if relu else _gelu_exact(g)

    if pat_ref is not None:
        # score in f32 on the MXU: gate cast to model dtype like routing_mask
        s = dot(ga.astype(xd.dtype), pat_ref[...].astype(xd.dtype).T)
        kth = _kth_largest(s, k)
        sel = (s >= kth).astype(xd.dtype)               # (nb, E)
        m = dot(sel, pat_ref[...].astype(xd.dtype))     # (nb, H) in {0,1}
        ga = ga * m

    prod = (h * ga).astype(xd.dtype)
    y = dot(prod, w2_ref[...]) + b2_ref[0].astype(f32)
    y = y.astype(y_ref.dtype)
    if ln_resid:
        y = x_ref[...] + y          # residual in model dtype, model order
    y_ref[...] = y


def _plan(n: int, c: int) -> int:
    """Rows per block: big enough to amortize per-block overhead, small
    enough that the (nb, 2H) f32 scratch stays ~<=12MB (H = 4C)."""
    nb = 512 if c <= 640 else 256
    while nb > 8 and n % nb:
        nb //= 2
    return nb


def fused_ff_ok(n: int, c: int, hdim: int, n_experts: int = 0) -> bool:
    """Shapes the kernel accepts: H a lane multiple, whole-row blocks.
    n_experts == 0 means no routing (un-moefied FF)."""
    return (hdim % 128 == 0 and hdim == 4 * c and n % 8 == 0
            and n >= 256 and (n_experts == 0 or n_experts >= 8))


@functools.partial(jax.jit, static_argnames=("k", "relu", "eps", "interpret"))
def geglu_ff_fused(x2d: jax.Array, w1: jax.Array, b1: jax.Array,
                   w2: jax.Array, b2: jax.Array,
                   patterns: jax.Array | None = None, k: int = 0,
                   relu: bool = False,
                   ln_scale: jax.Array | None = None,
                   ln_bias: jax.Array | None = None,
                   eps: float = 1e-5,
                   interpret: bool = False) -> jax.Array:
    """x2d (N, C) @ w1 (C, 2H) -> GEGLU(+route top-k over `patterns` (E, H))
    -> @ w2 (H, C) + b2. Returns (N, C) in x2d.dtype.

    With ln_scale/ln_bias (C,) f32 the kernel absorbs the transformer
    sub-block around the FF:  returns x2d + ff(layernorm(x2d))  — LN
    prologue and residual epilogue fused (VERDICT r3 #7)."""
    n, c = x2d.shape
    hdim = w1.shape[1] // 2
    assert fused_ff_ok(n, c, hdim, 0 if patterns is None
                       else patterns.shape[0]), (x2d.shape, w1.shape)
    assert (ln_scale is None) == (ln_bias is None)
    nb = _plan(n, c)
    b1 = b1.reshape(1, -1)
    b2 = b2.reshape(1, -1)

    const = lambda i: (0, 0)                  # noqa: E731 — resident blocks
    in_specs = [
        pl.BlockSpec((nb, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(w1.shape, const, memory_space=pltpu.VMEM),
        pl.BlockSpec(b1.shape, const, memory_space=pltpu.VMEM),
        pl.BlockSpec(w2.shape, const, memory_space=pltpu.VMEM),
        pl.BlockSpec(b2.shape, const, memory_space=pltpu.VMEM),
    ]
    args = [x2d, w1, b1, w2, b2]
    has_pat = patterns is not None
    has_ln = ln_scale is not None
    if has_pat:
        in_specs.append(pl.BlockSpec(patterns.shape, const,
                                     memory_space=pltpu.VMEM))
        args.append(patterns)
    if has_ln:
        ln2 = (ln_scale.astype(jnp.float32).reshape(1, -1),
               ln_bias.astype(jnp.float32).reshape(1, -1))
        for a in ln2:
            in_specs.append(pl.BlockSpec(a.shape, const,
                                         memory_space=pltpu.VMEM))
            args.append(a)
    kernel = functools.partial(_dispatch, hdim=hdim, k=k, relu=relu,
                               has_pat=has_pat, has_ln=has_ln, eps=eps)

    return pl.pallas_call(
        kernel,
        grid=(n // nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((nb, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c), x2d.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(*args)


def _dispatch(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, *rest, hdim: int,
              k: int, relu: bool, has_pat: bool, has_ln: bool, eps: float):
    """Unpack the optional pattern/LN refs (pallas passes refs positionally)
    and run the kernel body."""
    rest = list(rest)
    pat_ref = rest.pop(0) if has_pat else None
    g_ref = rest.pop(0) if has_ln else None
    bb_ref = rest.pop(0) if has_ln else None
    (y_ref,) = rest
    _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, pat_ref, y_ref,
            hdim=hdim, k=k, relu=relu, g_ref=g_ref, bb_ref=bb_ref, eps=eps)
