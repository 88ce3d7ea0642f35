"""TPU flash attention wrapper for UNet self-attention.

The 4096-token self-attention layers dominate HBM traffic if the (S, S) score
matrix materializes; the Pallas flash kernel keeps it in VMEM. SD head dims
(40/80/160) are zero-padded to the 128-lane minimum — padded K columns contribute
zero logits and padded V columns are sliced off, so the math is exact. sm_scale
carries the real head dim.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _pad_head_dim(x: jax.Array, target: int) -> jax.Array:
    d = x.shape[-1]
    if d == target:
        return x
    return jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, target - d),))


@functools.partial(jax.jit, static_argnames=("sm_scale",))
def flash_self_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                         sm_scale: float) -> jax.Array:
    """q, k, v: (B, S, H, D) -> (B, S, H, D). Self-attention, no mask."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (BlockSizes,
                                                                 flash_attention)
    b, s, h, d = q.shape
    d_pad = max(128, ((d + 127) // 128) * 128)

    def to_bhsd(x):
        return _pad_head_dim(x, d_pad).transpose(0, 2, 1, 3)

    blk = min(512, s)
    block_sizes = BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk,
        block_k_dkv=blk, block_q_dkv=blk,
        block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk,
    )
    out = flash_attention(to_bhsd(q), to_bhsd(k), to_bhsd(v),
                          causal=False, sm_scale=sm_scale,
                          block_sizes=block_sizes)
    return out.transpose(0, 2, 1, 3)[..., :d]


def use_flash(q_seq: int, kv_seq: int, enabled: bool) -> bool:
    """Flash pays off on long self-attention; cross-attention (kv=77) and tiny
    grids stay on XLA."""
    return (enabled and q_seq == kv_seq and q_seq >= 256
            and q_seq % 128 == 0 and jax.default_backend() == "tpu")
