"""SD-shaped attention kernels: flash self-attention with NATIVE small head
dims, and a one-shot fused cross-attention for tiny text kv.

Why not jax's stock flash kernel (ops/flash.py): SD1.x head dims are 40/80/160
and the stock kernel requires the head dim padded to the 128-lane minimum,
forcing host-graph pad copies (profiled at 6.8ms/step) plus 3.2x padded HBM
traffic on q/k/v/o. These kernels:

  * keep the head dim NATIVE (block last dim == D, which Pallas allows when it
    equals the full array dim) — no pad copies, no padded HBM traffic; only
    the (B,S,H,D)->(B,H,S,D) transpose remains (Pallas tiling requires the
    last two block dims (8,128)-aligned or full, so H can't sit on sublanes);
  * cross-attention (kv = 77 text tokens) does softmax(qk^T)v in ONE pass —
    the whole kv block lives in VMEM, nothing S x S ever touches HBM (XLA
    materializes f32 (B,H,4096,pad) scores: profiled 11ms/step).

MXU note: the score matmul's contraction (D=40) still occupies a full 128-deep
MXU pass, so FLOP time does not shrink — the win here is purely memory traffic
and fusions, which is what the round-1 profile showed dominating.

Both kernels are inference-forward; a custom_vjp recomputes gradients through
the plain XLA attention (exact same math) so training paths stay correct.

MEASURED on v5e (headline bench, batch 8, 50 steps — see ops/flash.py
attention_dispatch for the env switch):
    jax stock flash (default)      0.888 img/s
    custom self + custom cross     0.644 img/s
    stock self + custom cross      0.584 img/s
The hand-rolled kernels LOSE: the (B,S,H,D)->(B,H,S,D) transposes around the
pallas_call are un-fusable HBM copies, the per-(b,h,q-tile) cross grid pays
~1k kernel launches/layer for tiny compute, and the stock kernel's pipelining
is better tuned. Kept in-tree with exact-parity tests as the documented
baseline for future kernel work; defaults stay on the stock path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ------------------------------------------------------------- self-attention
def _self_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                 sm_scale: float, n_kv: int):
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0, :, :]                                  # (bq, D)
    k = k_ref[0, 0, :, :]                                  # (bk, D)
    v = v_ref[0, 0, :, :]                                  # (bk, D)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * sm_scale                                       # (bq, bk) f32

    # m/l scratch is (bq, 128) lanes-broadcast (a (bq, 1) block would violate
    # the (8, 128) tile rule); column 0 carries the value
    m_prev = m_scr[:, :1]                                  # (bq, 1)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)                                 # (bq, bk)
    alpha = jnp.exp(m_prev - m_new)                        # (bq, 1)
    l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)
    pv = jax.lax.dot_general(p.astype(v.dtype), v,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when(ki == n_kv - 1)
    def _finalize():
        o_ref[0, 0, :, :] = (acc_scr[:] / l_scr[:, :1]).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def sd_self_attention(q, k, v, sm_scale: float):
    """q, k, v: (B, S, H, D) -> (B, S, H, D). Non-causal flash; D unpadded."""
    return _sd_self_fwd_impl(q, k, v, sm_scale)


def _sd_self_fwd_impl(q, k, v, sm_scale, *, block_q: int = 512,
                      block_k: int = 512, interpret: bool = False):
    b, s, h, d = q.shape
    # (B, H, S, D): Pallas needs the last two block dims (8,128)-aligned or
    # full-sized; D stays native (== full dim), S tiles.
    qt, kt, vt = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
    bq, bk = min(block_q, s), min(block_k, s)
    n_q, n_kv = pl.cdiv(s, bq), pl.cdiv(s, bk)
    kernel = functools.partial(_self_kernel, sm_scale=sm_scale, n_kv=n_kv)
    out = pl.pallas_call(
        kernel,
        grid=(b, h, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda b_, h_, qi, ki: (b_, h_, qi, 0)),
            pl.BlockSpec((1, 1, bk, d), lambda b_, h_, qi, ki: (b_, h_, ki, 0)),
            pl.BlockSpec((1, 1, bk, d), lambda b_, h_, qi, ki: (b_, h_, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d),
                               lambda b_, h_, qi, ki: (b_, h_, qi, 0)),
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),   # running max (lane-bcast)
            pltpu.VMEM((bq, 128), jnp.float32),   # running denom (lane-bcast)
            pltpu.VMEM((bq, d), jnp.float32),     # output accumulator
        ],
        interpret=interpret,
    )(qt, kt, vt)
    return out.transpose(0, 2, 1, 3)


def _xla_attention(q, k, v, sm_scale):
    """Reference math for gradients/parity: plain softmax attention."""
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * sm_scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p,
                      v.astype(jnp.float32)).astype(q.dtype)


def _sd_self_fwd(q, k, v, sm_scale):
    return _sd_self_fwd_impl(q, k, v, sm_scale), (q, k, v)


def _sd_self_bwd(sm_scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_attention(q_, k_, v_, sm_scale),
                     q, k, v)
    return vjp(g)


sd_self_attention.defvjp(_sd_self_fwd, _sd_self_bwd)


# ------------------------------------------------------------ cross-attention
def _cross_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale: float,
                  kv_valid: int):
    q = q_ref[0, 0, :, :]                                  # (bq, D)
    k = k_ref[0, 0, :, :]                                  # (kv_pad, D)
    v = v_ref[0, 0, :, :]                                  # (kv_pad, D)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * sm_scale
    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(cols < kv_valid, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    o_ref[0, 0, :, :] = (pv / l).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def sd_cross_attention(q, k, v, sm_scale: float, kv_valid: int):
    """q: (B, S_q, H, D); k, v: (B, S_kv, H, D) with S_kv small (text tokens).
    The kv block is padded to a sublane multiple and masked via kv_valid; the
    whole attention for a q tile is ONE fused pass (no S_q x S_kv HBM scores).
    """
    return _sd_cross_fwd_impl(q, k, v, sm_scale, kv_valid)


def _sd_cross_fwd_impl(q, k, v, sm_scale, kv_valid, *, block_q: int = 512,
                       interpret: bool = False):
    b, s_q, h, d = q.shape
    kv = k.shape[1]
    kv_pad = ((kv + 7) // 8) * 8                  # sublane multiple
    if kv_pad != kv:
        pad = ((0, 0), (0, kv_pad - kv), (0, 0), (0, 0))
        k, v = jnp.pad(k, pad), jnp.pad(v, pad)   # tiny (B, 77->80, H, D)
    bq = min(block_q, s_q)
    qt = q.transpose(0, 2, 1, 3)                  # (B, H, S_q, D)
    kt = k.transpose(0, 2, 1, 3)                  # (B, H, kv_pad, D)
    vt = v.transpose(0, 2, 1, 3)
    kernel = functools.partial(_cross_kernel, sm_scale=sm_scale,
                               kv_valid=min(kv_valid, kv))
    out = pl.pallas_call(
        kernel,
        grid=(b, h, pl.cdiv(s_q, bq)),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda b_, h_, qi: (b_, h_, qi, 0)),
            pl.BlockSpec((1, 1, kv_pad, d), lambda b_, h_, qi: (b_, h_, 0, 0)),
            pl.BlockSpec((1, 1, kv_pad, d), lambda b_, h_, qi: (b_, h_, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d),
                               lambda b_, h_, qi: (b_, h_, qi, 0)),
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        interpret=interpret,
    )(qt, kt, vt)
    return out.transpose(0, 2, 1, 3)


def _sd_cross_fwd(q, k, v, sm_scale, kv_valid):
    return _sd_cross_fwd_impl(q, k, v, sm_scale, kv_valid), (q, k, v)


def _sd_cross_bwd(sm_scale, kv_valid, res, g):
    q, k, v = res
    kv = k.shape[1]

    def ref(q_, k_, v_):
        s = jnp.einsum("bqhd,bkhd->bhqk", q_.astype(jnp.float32),
                       k_.astype(jnp.float32)) * sm_scale
        mask = jnp.arange(kv)[None, None, None, :] < kv_valid
        s = jnp.where(mask, s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", p,
                          v_.astype(jnp.float32)).astype(q_.dtype)

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


sd_cross_attention.defvjp(_sd_cross_fwd, _sd_cross_bwd)
