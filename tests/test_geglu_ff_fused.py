"""Fused GEGLU-FF Pallas kernel (ops/geglu_ff_fused.py) parity vs the XLA
module path (models/attention.py:GEGLUFeedForward + taps.routing_mask)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_moe_tpu.ops.geglu_ff_fused import (fused_ff_ok,
                                                         geglu_ff_fused)
from diffusion_models_moe_tpu.taps import routing_mask


def _xla_reference(x2d, w1, b1, w2, b2, patterns=None, k=0, relu=False):
    """The exact math of GEGLUFeedForward's XLA path in f32."""
    hdim = w1.shape[1] // 2
    h = x2d @ w1[:, :hdim] + b1[:hdim]
    g = x2d @ w1[:, hdim:] + b1[hdim:]
    ga = jax.nn.relu(g) if relu else jax.nn.gelu(g, approximate=False)
    if patterns is not None:
        mask, _ = routing_mask(ga, patterns, k)
        ga = ga * mask
    return (h * ga) @ w2 + b2


def _rand(shape, rng, scale=1.0):
    return jnp.asarray(rng.randn(*shape) * scale, jnp.float32)


@pytest.mark.parametrize("routed", [False, True])
@pytest.mark.parametrize("relu", [False, True])
def test_fused_ff_matches_xla_f32(routed, relu):
    rng = np.random.RandomState(0)
    n, c = 256, 64
    hdim, e, k = 4 * c, 16, 5
    x = _rand((n, c), rng)
    w1 = _rand((c, 2 * hdim), rng, 0.05)
    b1 = _rand((2 * hdim,), rng, 0.1)
    w2 = _rand((hdim, c), rng, 0.05)
    b2 = _rand((c,), rng, 0.1)
    labels = rng.permutation(np.arange(hdim) % e)
    patterns = jnp.asarray(
        (labels[None, :] == np.arange(e)[:, None]).astype(np.float32))
    pat = patterns if routed else None
    assert fused_ff_ok(n, c, hdim, e)
    ref = _xla_reference(x, w1, b1, w2, b2, pat, k, relu)
    got = geglu_ff_fused(x, w1, b1, w2, b2, pat, k, relu, interpret=True)
    err = float(jnp.max(jnp.abs(ref - got)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    assert err < 1e-5, err


def test_fused_ff_routing_threshold_semantics():
    """Ties at the kth score keep ALL tied experts (threshold semantics,
    matching taps.routing_mask default) — forced by duplicating gate rows so
    two experts tie exactly."""
    rng = np.random.RandomState(1)
    n, c = 256, 64
    hdim, e, k = 4 * c, 8, 3
    x = _rand((n, c), rng)
    w1 = _rand((c, 2 * hdim), rng, 0.05)
    # duplicate the gate-half columns of experts 0 and 1 so their scores tie
    labels = np.arange(hdim) % e
    per = hdim // e
    w1 = np.array(w1)
    gate_half = w1[:, hdim:]
    gate_half[:, labels == 1] = gate_half[:, labels == 0][:, :per]
    w1 = jnp.asarray(w1)
    b1 = jnp.zeros((2 * hdim,), jnp.float32)
    w2 = _rand((hdim, c), rng, 0.05)
    b2 = jnp.zeros((c,), jnp.float32)
    patterns = jnp.asarray(
        (labels[None, :] == np.arange(e)[:, None]).astype(np.float32))
    ref = _xla_reference(x, w1, b1, w2, b2, patterns, k)
    got = geglu_ff_fused(x, w1, b1, w2, b2, patterns, k, interpret=True)
    err = float(jnp.max(jnp.abs(ref - got)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    assert err < 1e-5, err


def test_fused_ff_scope_gate():
    assert fused_ff_ok(4096, 320, 1280, 64)
    assert fused_ff_ok(1024, 1280, 5120, 256)
    assert not fused_ff_ok(4096, 320, 1281, 64)   # H not lane-aligned
    assert not fused_ff_ok(100, 320, 1280, 64)    # ragged rows
    assert not fused_ff_ok(128, 320, 1280, 64)    # too few rows
    assert not fused_ff_ok(4096, 320, 1536, 64)   # H != 4C (not GEGLU mult=4)


@pytest.mark.parametrize("routed", [False, True])
def test_fused_ff_absorbed_ln_residual_matches_xla(routed):
    """ln_scale/ln_bias absorb the transformer sub-block:
    fused(x) == x + ff(layernorm(x)) (VERDICT r3 #7)."""
    import flax.linen as nn
    rng = np.random.RandomState(3)
    n, c = 256, 64
    hdim, e, k = 4 * c, 16, 5
    x = _rand((n, c), rng)
    w1 = _rand((c, 2 * hdim), rng, 0.05)
    b1 = _rand((2 * hdim,), rng, 0.1)
    w2 = _rand((hdim, c), rng, 0.05)
    b2 = _rand((c,), rng, 0.1)
    g = jnp.asarray(1.0 + 0.1 * rng.randn(c), jnp.float32)
    bb = jnp.asarray(0.1 * rng.randn(c), jnp.float32)
    labels = rng.permutation(np.arange(hdim) % e)
    patterns = jnp.asarray(
        (labels[None, :] == np.arange(e)[:, None]).astype(np.float32))
    pat = patterns if routed else None
    ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
    xn = ln.apply({"params": {"scale": g, "bias": bb}}, x)
    ref = x + _xla_reference(xn, w1, b1, w2, b2, pat, k)
    got = geglu_ff_fused(x, w1, b1, w2, b2, pat, k, ln_scale=g, ln_bias=bb,
                         interpret=True)
    err = float(jnp.max(jnp.abs(ref - got)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    assert err < 1e-5, err


def test_transformer_block_absorbed_ff_matches_default():
    """BasicTransformerBlock with DMOE_FF_FUSED=1 (LN+residual delegated to
    the FF) keeps the param pytree and matches the default path — both via
    the fused kernel (interpret) and the XLA fallback (taps collecting)."""
    import os

    from diffusion_models_moe_tpu.models.attention import BasicTransformerBlock

    rng = np.random.RandomState(4)
    dim = 64
    x = jnp.asarray(rng.randn(2, 128, dim), jnp.float32)
    ctx = jnp.asarray(rng.randn(2, 16, 96), jnp.float32)
    blk = BasicTransformerBlock(dim, 4, 96, ff_index=0, dtype=jnp.float32,
                                flash_attention=False)
    params = blk.init(jax.random.PRNGKey(0), x, ctx)
    y0 = blk.apply(params, x, ctx)
    os.environ["DMOE_FF_FUSED"] = "1"
    os.environ["DMOE_FF_FUSED_INTERPRET"] = "1"
    try:
        params1 = blk.init(jax.random.PRNGKey(0), x, ctx)
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(params1))
        y1 = blk.apply(params, x, ctx)                # fused kernel branch
        from diffusion_models_moe_tpu.taps import TapSpec
        y2, _ = blk.apply(params, x, ctx, tap=TapSpec(gate_sparsity=True),
                          mutable=["taps"])           # XLA fallback branch
    finally:
        os.environ.pop("DMOE_FF_FUSED", None)
        os.environ.pop("DMOE_FF_FUSED_INTERPRET", None)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y2),
                               atol=2e-5, rtol=2e-5)


def test_fused_ff_module_dispatch_matches_default():
    """GEGLUFeedForward with DMOE_FF_FUSED=1 (interpret fallback on CPU is the
    XLA path; here we call the kernel directly through the module's fused
    branch via the test hook) produces the same params tree and outputs."""
    import os

    from diffusion_models_moe_tpu.models.attention import GEGLUFeedForward
    from diffusion_models_moe_tpu.taps import LayerIntervention

    rng = np.random.RandomState(2)
    dim, mult, e, k = 64, 4, 8, 3
    x = jnp.asarray(rng.randn(2, 128, dim), jnp.float32)
    labels = rng.permutation(np.arange(dim * mult) % e)
    patterns = jnp.asarray(
        (labels[None, :] == np.arange(e)[:, None]).astype(np.float32))
    iv = LayerIntervention(patterns=patterns, k=k)
    ff = GEGLUFeedForward(dim, mult, dtype=jnp.float32)
    params = ff.init(jax.random.PRNGKey(0), x, iv=iv)
    y0 = ff.apply(params, x, iv=iv)
    os.environ["DMOE_FF_FUSED"] = "1"
    os.environ["DMOE_FF_FUSED_INTERPRET"] = "1"   # CPU: run kernel in interpret
    try:
        params1 = ff.init(jax.random.PRNGKey(0), x, iv=iv)
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(params1))
        y1 = ff.apply(params, x, iv=iv)
    finally:
        os.environ.pop("DMOE_FF_FUSED", None)
        os.environ.pop("DMOE_FF_FUSED_INTERPRET", None)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=2e-5, rtol=2e-5)
