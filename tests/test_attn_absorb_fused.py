"""Absorbed attention sub-block kernels (ops/attn_absorb_fused.py):
interpret-mode parity of the LN+qkv prologue and out-proj+residual epilogue
against the XLA formulation, plus the end-to-end wired sub-block."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_moe_tpu.ops.attn_absorb_fused import (
    attn_absorb_ok, attn_out_residual_fused, ln_qkv_fused)


def _ref_ln(x, g, b, eps=1e-5):
    xr = x.astype(jnp.float32)
    mu = xr.mean(-1, keepdims=True)
    var = jnp.maximum((xr * xr).mean(-1, keepdims=True) - mu * mu, 0.0)
    return ((xr - mu) * (jax.lax.rsqrt(var + eps) * g) + b).astype(x.dtype)


def _mk(b, s, c, heads, d_pad, dtype, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 8)
    d = c // heads
    x = jax.random.normal(ks[0], (b, s, c), jnp.float32).astype(dtype)
    wq = jax.random.normal(ks[1], (c, c), jnp.float32) * 0.05
    wk = jax.random.normal(ks[2], (c, c), jnp.float32) * 0.05
    wv = jax.random.normal(ks[3], (c, c), jnp.float32) * 0.05
    g = 1.0 + 0.1 * jax.random.normal(ks[4], (c,), jnp.float32)
    bb = 0.1 * jax.random.normal(ks[5], (c,), jnp.float32)

    def padw(w):
        return jnp.pad(w.reshape(c, heads, d),
                       ((0, 0), (0, 0), (0, d_pad - d))
                       ).reshape(c, heads * d_pad).astype(dtype)
    return x, (wq, wk, wv), (padw(wq), padw(wk), padw(wv)), g, bb


QKV = functools.partial(ln_qkv_fused, interpret=True)
OUT = functools.partial(attn_out_residual_fused, interpret=True)


@pytest.mark.parametrize("shape", [
    (2, 256, 320, 8),     # SD1.5 level-0 head geometry (d=40 -> pad 128)
    (1, 512, 640, 8),     # d=80 -> pad 128, multi-block rows
])
def test_ln_qkv_fused_matches_xla_f32(shape):
    b, s, c, heads = shape
    d, d_pad = c // heads, 128
    x, ws, wps, g, bb = _mk(b, s, c, heads, d_pad, jnp.float32)
    assert attn_absorb_ok(s, c, heads, d_pad)
    q, k, v = QKV(x, *wps, heads=heads, ln_scale=g, ln_bias=bb)
    xn = _ref_ln(x, g, bb)
    for got, w in zip((q, k, v), ws):
        ref = (xn @ w.astype(x.dtype)).reshape(b, s, heads, d)
        ref = jnp.pad(ref, ((0, 0), (0, 0), (0, 0), (0, d_pad - d))
                      ).transpose(0, 2, 1, 3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)


def test_ln_qkv_fused_no_ln():
    b, s, c, heads, d_pad = 1, 256, 320, 8, 128
    x, ws, wps, _, _ = _mk(b, s, c, heads, d_pad, jnp.float32)
    q, _, _ = QKV(x, *wps, heads=heads)
    ref = (x @ ws[0].astype(x.dtype)).reshape(b, s, heads, c // heads)
    ref = jnp.pad(ref, ((0, 0), (0, 0), (0, 0), (0, d_pad - c // heads))
                  ).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(q), np.asarray(ref), atol=2e-5,
                               rtol=1e-5)


def test_out_residual_matches_xla_f32():
    b, s, c, heads, d_pad = 2, 256, 320, 8, 128
    d = c // heads
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    o = jax.random.normal(ks[0], (b, heads, s, d_pad), jnp.float32)
    # flash's padded output has zero pad columns; emulate
    o = o.at[..., d:].set(0.0)
    w = jax.random.normal(ks[1], (heads * d, c), jnp.float32) * 0.05
    bias = 0.1 * jax.random.normal(ks[2], (c,), jnp.float32)
    resid = jax.random.normal(ks[3], (b, s, c), jnp.float32)
    wpad = jnp.pad(w.reshape(heads, d, c), ((0, 0), (0, d_pad - d), (0, 0))
                   ).reshape(heads * d_pad, c)
    got = OUT(o, wpad, bias, resid)
    ref = resid + (jnp.einsum("bhsd,hdc->bsc",
                              o[..., :d].transpose(0, 1, 2, 3),
                              w.reshape(heads, d, c)) + bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5,
                               rtol=1e-5)


def _mk_block(dtype):
    from diffusion_models_moe_tpu.models.attention import (
        BasicTransformerBlock)
    x = jax.random.normal(jax.random.PRNGKey(11), (1, 256, 320),
                          jnp.float32).astype(dtype)
    ctx = jax.random.normal(jax.random.PRNGKey(12), (1, 77, 768),
                            jnp.float32).astype(dtype)
    blk = BasicTransformerBlock(dim=320, heads=8, context_dim=768,
                                ff_index=0, dtype=dtype)
    return blk, x, ctx


@pytest.mark.parametrize("mode", ["1", "qkv", "out"])
def test_attn_absorb_block_matches_plain(monkeypatch, mode):
    """DMOE_ATTN_ABSORB (full/qkv-only/out-only bisection modes) wired
    through BasicTransformerBlock (kernels in interpret mode, flash gate
    forced open) must match the plain block on the same params at f32, and
    preserve the param pytree."""
    import diffusion_models_moe_tpu.ops.flash as F
    blk, x, ctx = _mk_block(jnp.float32)
    params = blk.init(jax.random.PRNGKey(0), x, ctx)
    ref = np.asarray(blk.apply(params, x, ctx), np.float32)
    monkeypatch.setenv("DMOE_ATTN_ABSORB", mode)
    monkeypatch.setenv("DMOE_ATTN_ABSORB_INTERPRET", "1")
    monkeypatch.setattr(F, "use_flash", lambda q, kv, e: bool(e))
    p2 = blk.init(jax.random.PRNGKey(0), x, ctx)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p2))
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p2)):
        assert a.shape == b.shape and a.dtype == b.dtype
    got = np.asarray(blk.apply(params, x, ctx), np.float32)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 2e-5, rel
    # the kernel genuinely ran (different reduction order than XLA)
    assert not np.array_equal(got, ref)


def test_attn_absorb_fallback_matches_plain(monkeypatch):
    """When the kernel conditions fail (flash gate closed: CPU), the
    delegated-LN fallback must reproduce the plain block exactly (same LN
    math, residual added at the end)."""
    blk, x, ctx = _mk_block(jnp.float32)
    params = blk.init(jax.random.PRNGKey(0), x, ctx)
    ref = np.asarray(blk.apply(params, x, ctx), np.float32)
    monkeypatch.setenv("DMOE_ATTN_ABSORB", "1")
    got = np.asarray(blk.apply(params, x, ctx), np.float32)
    rel = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-12)
    assert rel < 2e-6, rel


def test_absorbed_subblock_bf16_rounding_scale():
    """Full absorbed sub-block (qkv -> sdpa -> out+residual) vs the XLA
    composite at bf16: rounding-scale differences only."""
    b, s, c, heads, d_pad = 1, 256, 320, 8, 128
    d = c // heads
    x, ws, wps, g, bb = _mk(b, s, c, heads, d_pad, jnp.bfloat16)
    ks = jax.random.split(jax.random.PRNGKey(2), 2)
    wo = jax.random.normal(ks[0], (c, c), jnp.float32) * 0.05
    bo = 0.1 * jax.random.normal(ks[1], (c,), jnp.float32)
    sm = 1.0 / (d ** 0.5)

    # absorbed path (XLA sdpa stands in for flash — same operand layout)
    q, k, v = QKV(x, *wps, heads=heads, ln_scale=g, ln_bias=bb)
    o = jax.nn.dot_product_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), scale=sm).transpose(0, 2, 1, 3)
    wo_pad = jnp.pad(wo.reshape(heads, d, c),
                     ((0, 0), (0, d_pad - d), (0, 0))
                     ).reshape(heads * d_pad, c).astype(x.dtype)
    got = np.asarray(OUT(o, wo_pad, bo, x), np.float32)

    # XLA reference
    xn = _ref_ln(x, g, bb)
    qr = (xn @ ws[0].astype(x.dtype)).reshape(b, s, heads, d)
    kr = (xn @ ws[1].astype(x.dtype)).reshape(b, s, heads, d)
    vr = (xn @ ws[2].astype(x.dtype)).reshape(b, s, heads, d)
    orf = jax.nn.dot_product_attention(qr, kr, vr, scale=sm)
    ref = np.asarray(
        x + (orf.reshape(b, s, c) @ wo.astype(x.dtype)
             + bo.astype(x.dtype)), np.float32)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.03, rel
