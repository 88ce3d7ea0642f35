"""Fused MoE routing Pallas kernel: score -> top-k select -> mask -> gate multiply.

The reference's hook recomputes the FFN up-projection and runs
matmul/topk/embedding-sum as separate torch ops with a host copy per call
(reference: neuron_receivers/moefy.py:10-27; the doubled FFN cost is noted in
SURVEY.md §3.2). Here the routing tail is one Pallas kernel per token tile:

    score  = gate @ patterns^T                       (MXU, fp32 accum)
    sel_e  = |{e' : score_e' > score_e}| < k         (exact top-k, sort-free)
    mask   = sel @ patterns                          (MXU)
    out    = hidden * gate * mask                    (VPU)

hidden/gate tiles stay in VMEM end-to-end — no HBM round-trips between the four
steps. Top-k selection uses strict-rank counting, which is exact and branch-free:
expert e is selected iff fewer than k experts strictly beat its score, reproducing
`score >= kth_largest` (ties included, identical to the XLA fallback in
taps.routing_mask).

Constraint: patterns must partition neurons (each neuron in exactly one expert),
which MoEfication clustering guarantees (reference: moefication/helper.py:48-62).

Measured reality check (v5e headline bench, batch 8): the XLA fallback routing
(score matmul + lax.top_k sort + mask) reads 1.0705 img/s vs 0.9758 with this
kernel — XLA's version fuses into the surrounding S-minor activation layouts
while the pallas_call forces (N, H) default-layout relayouts at its boundary.
`UNetConfig.use_fused_routing` therefore defaults to False; the kernel stays as
a parity-tested alternative (and the right starting point if routing ever
dominates, e.g. much larger expert counts).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffusion_models_moe_tpu.taps import routing_mask


_L_CHUNK = 32  # expert chunk for the rank-count broadcast (bounds VMEM)


def _routing_kernel(hidden_ref, gate_ref, patterns_ref, out_ref, *, k: int):
    gate = gate_ref[:]                                   # (TN, H)
    patterns = patterns_ref[:]                           # (E, H)
    score = jax.lax.dot_general(
        gate, patterns,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (TN, E), f32 accum
    # Exact top-k selection by strict-rank counting (sort/top_k don't lower in
    # Mosaic): beats[j] = #experts with strictly greater score; selected iff
    # beats < k. The (TN, Lc, E) compare is chunked over the outer expert axis
    # so the broadcast stays within VMEM and the last dim stays lane-aligned.
    e = score.shape[1]
    beats = jnp.zeros_like(score)
    for c in range(0, e, _L_CHUNK):
        blk = score[:, c:c + _L_CHUNK]                   # (TN, Lc)
        beats = beats + jnp.sum(
            (blk[:, :, None] > score[:, None, :]).astype(jnp.float32), axis=1)
    sel = (beats < float(k)).astype(patterns.dtype)
    mask = jax.lax.dot_general(
        sel, patterns,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (TN, H)
    out_ref[:] = (hidden_ref[:] * gate * mask.astype(gate.dtype)).astype(
        out_ref.dtype)


def _pick_token_tile(n: int, h: int, e: int, itemsize: int,
                     budget: int = 12 * 2 ** 20) -> int:
    """Largest token tile (multiple of 8, <=512) fitting the VMEM budget:
    double-buffered hidden/gate/out tiles, resident patterns, score/beats/sel,
    the chunked rank-count broadcast, and the mask."""
    for tn in (512, 256, 128, 64, 32, 16, 8):
        est = (2 * 3 * tn * h * itemsize       # pipelined in/out blocks
               + e * h * itemsize              # patterns (resident)
               + 3 * tn * e * 4                # score + beats + sel
               + tn * _L_CHUNK * e * 4         # rank-count broadcast chunk
               + tn * h * 4)                   # mask (f32 accum)
        if est <= budget:
            return tn
    return 8


@functools.partial(jax.jit, static_argnames=("k", "token_tile", "interpret"))
def fused_route_multiply(hidden: jax.Array, gate: jax.Array,
                         patterns: jax.Array, k: int,
                         token_tile: int | None = None,
                         interpret: bool = False) -> jax.Array:
    """hidden, gate: (N, H) (gate already activated); patterns: (E, H) 0/1.
    Returns hidden * gate * topk_mask, equal to `hidden * gate * routing_mask(...)`.
    """
    n, h = gate.shape
    e = patterns.shape[0]
    if token_tile is None:
        token_tile = _pick_token_tile(n, h, e, gate.dtype.itemsize)
    tn = min(token_tile, max(8, n))
    pad = (-n) % tn
    if pad:
        hidden = jnp.pad(hidden, ((0, pad), (0, 0)))
        gate = jnp.pad(gate, ((0, pad), (0, 0)))
    n_padded = n + pad

    out = pl.pallas_call(
        functools.partial(_routing_kernel, k=k),
        grid=(n_padded // tn,),
        in_specs=[
            pl.BlockSpec((tn, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            # patterns: constant across the grid -> loaded to VMEM once
            pl.BlockSpec((e, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn, h), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_padded, h), hidden.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_padded * h * e * 2 + n_padded * e * e,
            bytes_accessed=(2 * n_padded * h + e * h + n_padded * h) * 2,
            transcendentals=0),
        interpret=interpret,
    )(hidden, gate, patterns)
    return out[:n] if pad else out


def route_multiply_reference(hidden, gate, patterns, k):
    """XLA fallback with identical semantics (used on CPU and in parity tests)."""
    mask, _ = routing_mask(gate.reshape(-1, gate.shape[-1]), patterns, k)
    return hidden * gate * mask.reshape(gate.shape)
