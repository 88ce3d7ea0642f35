"""Fused resblock-conv chain kernel (ops/conv_chain_fused.py) — the
subsuming GN+SiLU->conv->bias->residual kernel (ROOFLINE.md §3a).

Interpret-mode parity against the XLA composite at f32 (tight) and bf16
(rounding scale); the gn_scale_shift fold against nn.GroupNorm; and the
DMOE_CONV_CHAIN flag must not change the resblock param pytree."""
import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_moe_tpu.ops.conv_chain_fused import (
    chain_ok, conv3x3_chain, gn_scale_shift)


def _ref_chain(x, w, bt, gamma, beta, groups, eps, residual=None,
               prologue=True):
    """XLA reference: GroupNorm -> SiLU -> SAME conv -> +bias -> +residual."""
    h = x
    if prologue:
        n, hh, ww, c = x.shape
        xf = x.astype(jnp.float32).reshape(n, hh * ww, groups, c // groups)
        mean = xf.mean(axis=(1, 3), keepdims=True)
        var = xf.var(axis=(1, 3), keepdims=True)
        xn = (xf - mean) * jax.lax.rsqrt(var + eps)
        xn = xn.reshape(x.shape) * gamma + beta
        h = jax.nn.silu(xn).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        h, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + bt[:, None, None, :].astype(x.dtype)
    if residual is not None:
        y = y + residual.astype(x.dtype)
    return y


def _mk(shape, dtype, key=0, res=True):
    b, h, w, ci, co = shape
    ks = jax.random.split(jax.random.PRNGKey(key), 6)
    x = jax.random.normal(ks[0], (b, h, w, ci), jnp.float32).astype(dtype)
    k = (jax.random.normal(ks[1], (3, 3, ci, co), jnp.float32) * 0.1)
    bt = jax.random.normal(ks[2], (b, co), jnp.float32).astype(dtype)
    gamma = 1.0 + 0.1 * jax.random.normal(ks[3], (ci,), jnp.float32)
    beta = 0.1 * jax.random.normal(ks[4], (ci,), jnp.float32)
    r = (jax.random.normal(ks[5], (b, h, w, co), jnp.float32).astype(dtype)
         if res else None)
    return x, k.astype(dtype), bt, gamma, beta, r


CHAIN = functools.partial(conv3x3_chain, interpret=True)


@pytest.mark.parametrize("shape", [
    (2, 16, 16, 32, 128),    # min geometry the kernel accepts
    (1, 32, 32, 48, 160),    # multi-band (rb < h), non-tile channels
])
@pytest.mark.parametrize("res", [True, False])
@pytest.mark.parametrize("variant", ["tap9", "im2col3"])
def test_chain_matches_xla_composite_f32(shape, res, variant):
    groups, eps = 8, 1e-5
    x, k, bt, gamma, beta, r = _mk(shape, jnp.float32, res=res)
    assert chain_ok(*shape[1:])
    scale, shift = gn_scale_shift(x, gamma, beta, groups, eps)
    got = np.asarray(CHAIN(x, k, bt, scale, shift, residual=r,
                           variant=variant))
    ref = np.asarray(_ref_chain(x, k, bt, gamma, beta, groups, eps,
                                residual=r))
    scale_ = np.abs(ref).max() + 1e-9
    np.testing.assert_allclose(got / scale_, ref / scale_, atol=5e-6)


def test_chain_bf16_error_at_rounding_scale():
    shape = (2, 16, 16, 32, 128)
    groups, eps = 8, 1e-5
    x, k, bt, gamma, beta, r = _mk(shape, jnp.bfloat16)
    scale, shift = gn_scale_shift(x, gamma, beta, groups, eps)
    got = np.asarray(CHAIN(x, k, bt, scale, shift, residual=r), np.float32)
    ref = np.asarray(_ref_chain(x, k, bt, gamma, beta, groups, eps,
                                residual=r), np.float32)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.03, rel


def test_chain_no_prologue_is_plain_conv_epilogue():
    shape = (1, 16, 16, 32, 128)
    x, k, bt, _, _, r = _mk(shape, jnp.float32)
    got = np.asarray(CHAIN(x, k, bt, residual=r, prologue=False))
    ref = np.asarray(_ref_chain(x, k, bt, None, None, 1, 0.0, residual=r,
                                prologue=False))
    scale_ = np.abs(ref).max() + 1e-9
    np.testing.assert_allclose(got / scale_, ref / scale_, atol=5e-6)


def test_gn_fold_matches_groupnorm():
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 32), jnp.float32)
    gamma = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(4), (32,))
    beta = 0.1 * jax.random.normal(jax.random.PRNGKey(5), (32,))
    scale, shift = gn_scale_shift(x, gamma, beta, 8, 1e-5)
    got = x * scale[:, None, None, :] + shift[:, None, None, :]
    gn = nn.GroupNorm(num_groups=8, epsilon=1e-5, dtype=jnp.float32)
    ref = gn.apply({"params": {"scale": gamma, "bias": beta}}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5,
                               rtol=1e-5)


def test_chain_flag_preserves_param_pytree(monkeypatch):
    """DMOE_CONV_CHAIN=1 must not change the resblock param tree (GNFold and
    ChainConv mirror nn.GroupNorm / nn.Conv pytrees exactly)."""
    from diffusion_models_moe_tpu.models.layers import ResnetBlock2D
    x = jnp.ones((1, 16, 16, 32), jnp.float32)
    temb = jnp.ones((1, 64), jnp.float32)
    blk = ResnetBlock2D(out_channels=128, norm_num_groups=8)
    p0 = blk.init(jax.random.PRNGKey(0), x, temb)["params"]
    monkeypatch.setenv("DMOE_CONV_CHAIN", "1")
    # force the chain branch on CPU by patching the backend gate
    import diffusion_models_moe_tpu.models.layers as L
    monkeypatch.setattr(L.jax, "default_backend", lambda: "tpu")
    import diffusion_models_moe_tpu.ops.conv_chain_fused as C
    monkeypatch.setattr(
        C, "conv3x3_chain",
        functools.partial(conv3x3_chain, interpret=True))
    # test shapes are below the measured-profitable set, so open the
    # profitability gate too — otherwise both inits take the plain path and
    # the ChainConv/GNFold pytree compat is never exercised (ADVICE r4)
    monkeypatch.setattr(C, "chain_profitable", C.chain_ok)
    p1 = blk.init(jax.random.PRNGKey(0), x, temb)["params"]
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        assert a.shape == b.shape and a.dtype == b.dtype


def test_chain_resblock_matches_plain_resblock(monkeypatch):
    """The chain-mode resblock output must match the plain path at bf16
    rounding scale (same params)."""
    from diffusion_models_moe_tpu.models.layers import ResnetBlock2D
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 16, 16, 32),
                          jnp.float32).astype(jnp.bfloat16)
    temb = jax.random.normal(jax.random.PRNGKey(8), (2, 64),
                             jnp.float32).astype(jnp.bfloat16)
    blk = ResnetBlock2D(out_channels=128, norm_num_groups=8,
                        dtype=jnp.bfloat16)
    params = blk.init(jax.random.PRNGKey(0), x, temb)
    ref = np.asarray(blk.apply(params, x, temb), np.float32)
    monkeypatch.setenv("DMOE_CONV_CHAIN", "1")
    import diffusion_models_moe_tpu.models.layers as L
    monkeypatch.setattr(L.jax, "default_backend", lambda: "tpu")
    import diffusion_models_moe_tpu.ops.conv_chain_fused as C
    monkeypatch.setattr(
        C, "conv3x3_chain",
        functools.partial(conv3x3_chain, interpret=True))
    # open the profitability gate so the chain branch actually runs at the
    # small test shapes (ADVICE r4: the un-patched gate rejects them and the
    # test silently compared the plain path to itself)
    monkeypatch.setattr(C, "chain_profitable", C.chain_ok)
    got = np.asarray(blk.apply(params, x, temb), np.float32)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.03, rel
    # the kernel path genuinely ran: its bf16 output cannot be bit-identical
    # to the XLA composite (different reduction order)
    assert not np.array_equal(got, ref)


def test_chain_shapes_env_gates_dispatch(monkeypatch):
    """DMOE_CHAIN_SHAPES bisection gate (bench_modes chain16 legs): '16'
    keeps only the 16x16x1280->1280 sites; strict parse rejects typos
    (ADVICE r4: a mis-set leg must not silently measure the XLA path)."""
    from diffusion_models_moe_tpu.ops.conv_chain_fused import chain_profitable
    monkeypatch.delenv("DMOE_CHAIN_SHAPES", raising=False)
    assert chain_profitable(16, 16, 1280, 1280)
    assert chain_profitable(32, 32, 640, 640)
    monkeypatch.setenv("DMOE_CHAIN_SHAPES", "16")
    assert chain_profitable(16, 16, 1280, 1280)
    assert not chain_profitable(32, 32, 640, 640)
    monkeypatch.setenv("DMOE_CHAIN_SHAPES", "32")
    assert not chain_profitable(16, 16, 1280, 1280)
    assert chain_profitable(32, 32, 960, 640)
    # whitespace tolerated; unknown tokens raise
    monkeypatch.setenv("DMOE_CHAIN_SHAPES", " 16, 32 ")
    assert chain_profitable(32, 32, 640, 640)
    monkeypatch.setenv("DMOE_CHAIN_SHAPES", "16;32")
    with pytest.raises(ValueError):
        chain_profitable(16, 16, 1280, 1280)
    monkeypatch.setenv("DMOE_CHAIN_SHAPES", "64")
    with pytest.raises(ValueError):
        chain_profitable(16, 16, 1280, 1280)
