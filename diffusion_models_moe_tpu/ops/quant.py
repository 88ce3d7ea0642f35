"""int8 quantized serving primitives (W8A8, symmetric, dynamic).

The v5e MXU runs int8 at 2x the bf16 rate; measured through this stack
(microbench, batch-16 SD shapes):

    conv 64x64x320  : 1.17x    dot 65536x320x1280 : 1.68x
    conv 32x32x640  : 1.49x    dot 16384x640x2560 : 1.73x
    conv 16x16x1280 : 1.97x    dot 4096x1280x5120 : 1.08x

Scheme: dynamic activation scales (per-token for dots, per-sample for convs —
no reduction ever crosses a batch row, so co-batched requests cannot couple)
+ per-output-channel weight scales, symmetric (zero-point 0, so zero padding
stays exact), int32 accumulation, dequant in f32. Weight quantization is loop-invariant in the
denoise scan, so XLA hoists it out of the 50-step loop (verified via profile).

This is an OPT-IN serving mode (`UNetConfig.quant_int8`): outputs differ from
the bf16 path (relative L2 error ~1e-2 per layer). The headline bench stays
bf16; the quantized number is reported separately. The reference has no
quantized path at all (pure fp16/fp32 torch — SURVEY.md §0); this is a
TPU-native extension for production serving.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_EPS = 1e-8


def _quantize(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Symmetric round-to-nearest onto [-127, 127]."""
    return jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                    -127.0, 127.0).astype(jnp.int8)


def _act_scale(x: jax.Array) -> jax.Array:
    """Per-tensor dynamic scale for activations."""
    return jnp.maximum(jnp.max(jnp.abs(x)).astype(jnp.float32), _EPS) / 127.0


def int8_dot(x: jax.Array, w: jax.Array, out_dtype=None,
             per_token: bool = True) -> jax.Array:
    """x (..., K) @ w (K, N) with W8A8 int8 MXU math.

    Weight scales are per output column (axis 0 absmax); activation scales are
    per-token (absmax over K per row — standard W8A8 practice, e.g.
    SmoothQuant's dynamic per-token variant; `per_token=False` falls back to
    one per-tensor scale). The rowwise reduce + outer-product dequant fuse
    into the surrounding elementwise work. Returns x.dtype (or `out_dtype`)."""
    out_dtype = out_dtype or x.dtype
    if per_token:
        sx = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True)
                         .astype(jnp.float32), _EPS) / 127.0   # (..., 1)
    else:
        sx = _act_scale(x)
    sw = jnp.maximum(jnp.max(jnp.abs(w), axis=0).astype(jnp.float32),
                     _EPS) / 127.0                       # (N,)
    y = lax.dot_general(_quantize(x, sx), _quantize(w, sw[None, :]),
                        (((x.ndim - 1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (sx * sw)).astype(out_dtype)


def int8_conv(x: jax.Array, w: jax.Array, strides=(1, 1), padding="SAME",
              out_dtype=None, per_sample: bool = True) -> jax.Array:
    """NHWC x (B,H,W,Cin) * HWIO w (kh,kw,Cin,Cout) int8 convolution.

    Per-output-channel weight scales (absmax over kh,kw,Cin); zero padding is
    exact under the symmetric scheme. Activation scales are per-SAMPLE (absmax
    over H,W,Cin per batch row — a conv never mixes batch elements, so with
    per-token dot scales this makes the whole int8 UNet free of co-batching
    coupling: each request's output depends only on its own data, restoring
    the serving determinism contract for quantized serving too).
    `per_sample=False` falls back to one per-tensor scale."""
    out_dtype = out_dtype or x.dtype
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    if per_sample:
        sx = jnp.maximum(
            jnp.max(jnp.abs(x), axis=(1, 2, 3), keepdims=True)
            .astype(jnp.float32), _EPS) / 127.0          # (B, 1, 1, 1)
    else:
        sx = _act_scale(x)
    sw = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)).astype(jnp.float32),
                     _EPS) / 127.0                       # (Cout,)
    y = lax.conv_general_dilated(
        _quantize(x, sx), _quantize(w, sw[None, None, None, :]),
        window_strides=strides, padding=padding, dimension_numbers=dn,
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (sx * sw)).astype(out_dtype)
