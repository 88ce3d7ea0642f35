"""TPU flash attention wrapper for UNet self-attention.

The 4096-token self-attention layers dominate HBM traffic if the (S, S) score
matrix materializes; the Pallas flash kernel keeps it in VMEM. SD head dims
(40/80/160) are zero-padded to the 128-lane minimum — padded K columns contribute
zero logits and padded V columns are sliced off, so the math is exact. sm_scale
carries the real head dim.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np


def _pad_head_dim(x: jax.Array, target: int) -> jax.Array:
    d = x.shape[-1]
    if d == target:
        return x
    return jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, target - d),))


def _pallas_pad_last(x: jax.Array, target: int) -> jax.Array:
    """Zero-pad the minor dim with a Pallas kernel (experiment, DMOE_PALLAS_PAD).

    XLA's pad_bitcast_fusion for the 40->128 head-dim pad at the flash
    boundary profiled at ~110 GB/s (vs ~800 peak); rows of the (.., 40) input
    are contiguous, so a blocked kernel should move them at near-bandwidth.
    Requires x's trailing dims to flatten contiguously (call AFTER the
    (B,h,S,d) transpose so the reshape below is a bitcast).

    Measured on the headline bench: 1.0607 vs 1.0748 img/s — SLOWER, the same
    pattern as the routing kernel (ops/routing_kernel.py): a pallas_call
    boundary breaks XLA's surrounding fusions/layout choices by more than the
    kernel saves. Kept as a documented negative result; default off."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = x.shape[-1]
    if d == target:
        return x
    lead = x.shape[:-1]
    n = int(np.prod(lead))
    x2 = x.reshape(n, d)
    bs = 512
    pad_rows = (-n) % bs
    if pad_rows:
        x2 = jnp.pad(x2, ((0, pad_rows), (0, 0)))

    def kernel(x_ref, o_ref):
        blk = x_ref[:]
        o_ref[:] = jnp.concatenate(
            [blk, jnp.zeros((blk.shape[0], target - d), blk.dtype)], axis=-1)

    out = pl.pallas_call(
        kernel,
        grid=((n + pad_rows) // bs,),
        in_specs=[pl.BlockSpec((bs, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bs, target), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n + pad_rows, target), x.dtype),
    )(x2)
    return out[:n].reshape(*lead, target)


def _env_blocks() -> tuple[int, int]:
    """Block sizes are a tunable, not a hardcode. A v5e sweep showed 1024/1024
    ~6% faster than 512/512, but the only driver-conditions bench at 1024
    crashed the TPU worker (BENCH_r01.json kernel fault) — default stays at the
    last verified-green 512/512; opt into larger via DMOE_FLASH_BLOCKS=bq,bk."""
    spec = os.environ.get("DMOE_FLASH_BLOCKS", "512,512")
    try:
        bq_s, bk_s = spec.split(",")
        return int(bq_s), int(bk_s)
    except ValueError:
        return 512, 512


def _block_sizes(q_seq: int, kv_seq: int):
    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes
    bq_env, bk_env = _env_blocks()
    bq = min(bq_env, q_seq)
    bk = min(bk_env, kv_seq)
    return BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk,
        block_k_dkv=bk, block_q_dkv=bq,
        block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
    )


def round_up_lanes(d: int) -> int:
    """Round a (head/kv) dim up to the TPU lane width, minimum one full
    128-lane tile — the single source of the flash kernels' pad rule (also
    consumed by models/attention.py's DMOE_PAD_PROJ weight-folding, which
    must agree with the kernel's pad exactly)."""
    return max(128, ((d + 127) // 128) * 128)


@functools.partial(jax.jit, static_argnames=("sm_scale",))
def flash_self_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                         sm_scale: float) -> jax.Array:
    """q, k, v: (B, S, H, D) -> (B, S, H, D). Self-attention, no mask."""
    from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention
    b, s, h, d = q.shape
    d_pad = round_up_lanes(d)

    if os.environ.get("DMOE_PALLAS_PAD", "0") == "1":
        def to_bhsd(x):
            # transpose FIRST so the kernel's flatten is a bitcast against the
            # producer's (B,h,S,d) memory order — no relayout at the boundary
            return _pallas_pad_last(x.transpose(0, 2, 1, 3), d_pad)
    else:
        def to_bhsd(x):
            return _pad_head_dim(x, d_pad).transpose(0, 2, 1, 3)

    out = flash_attention(to_bhsd(q), to_bhsd(k), to_bhsd(v),
                          causal=False, sm_scale=sm_scale,
                          block_sizes=_block_sizes(s, s))
    return out.transpose(0, 2, 1, 3)[..., :d]


def flash_bhsd(qb: jax.Array, kb: jax.Array, vb: jax.Array,
               sm_scale: float) -> jax.Array:
    """Stock flash on operands ALREADY in the kernel's (B, H, S, d_pad)
    layout — the absorbed-attention path (ops/attn_absorb_fused.py) produces
    q/k/v directly in this layout so no transpose/pad materializes at the
    boundary. Returns (B, H, S, d_pad). Off-TPU falls back to XLA SDPA with
    the same layout contract (tests / CPU smoke)."""
    s = qb.shape[2]
    if jax.default_backend() != "tpu":
        out = jax.nn.dot_product_attention(
            qb.transpose(0, 2, 1, 3), kb.transpose(0, 2, 1, 3),
            vb.transpose(0, 2, 1, 3), scale=sm_scale)
        return out.transpose(0, 2, 1, 3)
    from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention
    return flash_attention(qb, kb, vb, causal=False, sm_scale=sm_scale,
                           block_sizes=_block_sizes(s, s))


@functools.partial(jax.jit, static_argnames=("sm_scale", "kv_valid"))
def flash_cross_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                          sm_scale: float, kv_valid: int) -> jax.Array:
    """Cross-attention with kv padded up to a lane multiple and masked out via
    segment ids (text kv is 77 tokens; XLA otherwise materializes the f32
    (B, H, S_q, kv_pad) score tensor in HBM)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (SegmentIds,
                                                                 flash_attention)
    b, s_q, h, d = q.shape
    kv_seq = k.shape[1]
    d_pad = round_up_lanes(d)
    kv_pad = round_up_lanes(kv_seq)

    def pad_kv(x):
        x = _pad_head_dim(x, d_pad)
        return jnp.pad(x, ((0, 0), (0, kv_pad - kv_seq), (0, 0), (0, 0)))

    qb = _pad_head_dim(q, d_pad).transpose(0, 2, 1, 3)
    kb = pad_kv(k).transpose(0, 2, 1, 3)
    vb = pad_kv(v).transpose(0, 2, 1, 3)
    kv_ids = (jax.lax.broadcasted_iota(jnp.int32, (b, kv_pad), 1)
              < kv_valid).astype(jnp.int32)
    seg = SegmentIds(q=jnp.ones((b, s_q), jnp.int32), kv=kv_ids)
    out = flash_attention(qb, kb, vb, segment_ids=seg, causal=False,
                          sm_scale=sm_scale,
                          block_sizes=_block_sizes(s_q, kv_pad))
    return out.transpose(0, 2, 1, 3)[..., :d]


@functools.lru_cache(maxsize=16)
def _splash_kernel(s: int, h: int):
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk, splash_attention_mask as sm)
    mask = sm.MultiHeadMask([sm.FullMask((s, s))] * h)
    # The factory materializes mask-info with jnp.array; the kernel is cached
    # across jit traces, so those arrays must be concrete, not trace-local
    # constants (otherwise the second trace hits an UnexpectedTracerError).
    with jax.ensure_compile_time_eval():
        return sk.make_splash_mha_single_device(mask=mask)


def splash_self_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                          sm_scale: float) -> jax.Array:
    """jax's splash-attention kernel: handles SD's 40/80/160 head dims
    NATIVELY (no 128-lane padding). q, k, v: (B, S, H, D); splash wants
    (B, H, S, D) with q pre-scaled and returns f32."""
    b, s, h, d = q.shape
    kernel = _splash_kernel(s, h)
    qt = (q * sm_scale).transpose(0, 2, 1, 3)
    out = jax.vmap(kernel)(qt, k.transpose(0, 2, 1, 3),
                           v.transpose(0, 2, 1, 3))
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


def attention_dispatch(q, k, v, *, is_self: bool, sm_scale: float,
                       kv_valid: int, enabled: bool):
    """Pick the attention implementation for (B, S, H, D) tensors.

    DMOE_FLASH_IMPL picks the implementation mix (ops/sd_flash.py kernels have
    native small head dims / fused small-kv cross-attention):
      jax          stock flash for long self-attention, XLA SDPA elsewhere
                   (default; measured 0.888 img/s on the headline bench)
      custom       SD kernels for both self and cross (measured 0.644 — the
                   hand-rolled self-attention loses to the stock kernel)
      custom-cross stock flash self + fused custom cross (measured 0.584)
      custom-self  custom self + XLA cross
      splash       splash-attention for self (native head dims, no pad;
                   measured 0.304 img/s with default blocks — the vmapped
                   per-batch launches + f32 output lose far more than the
                   head-dim padding costs; kept for reference)"""
    impl = os.environ.get("DMOE_FLASH_IMPL", "jax")
    s_q, s_kv = q.shape[1], k.shape[1]
    long_q = enabled and s_q >= 256 and s_q % 128 == 0 \
        and jax.default_backend() == "tpu"
    if long_q:
        from diffusion_models_moe_tpu.ops.sd_flash import (sd_cross_attention,
                                                           sd_self_attention)
        if is_self and s_q == s_kv:
            if impl in ("custom", "custom-self"):
                return sd_self_attention(q, k, v, sm_scale)
            if impl == "splash":
                return splash_self_attention(q, k, v, sm_scale)
            return flash_self_attention(q, k, v, sm_scale)
        if not is_self and impl in ("custom", "custom-cross"):
            return sd_cross_attention(q, k, v, sm_scale, kv_valid)
    # explicit scale: with DMOE_PAD_PROJ the head dim is padded, so the
    # default 1/sqrt(q.shape[-1]) would be wrong
    return jax.nn.dot_product_attention(q, k, v, scale=sm_scale)


def use_flash(q_seq: int, kv_seq: int, enabled: bool) -> bool:
    """Flash for long self-attention only. Cross-attention (kv = 77 text tokens)
    measured FASTER on XLA (bench 0.897 vs 0.859 img/s with
    flash_cross_attention): its padded score tensor is small (67MB) while the
    flash path pays kv padding to 128 + segment masking + launch overhead."""
    return (enabled and q_seq == kv_seq and q_seq >= 256
            and q_seq % 128 == 0 and jax.default_backend() == "tpu")
