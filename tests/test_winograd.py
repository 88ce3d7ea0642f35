"""Winograd F(2x2, 3x3) serving mode (ops/winograd.py + conv_winograd flag).

The transform matrices are 0/±1/0.5 (exact in binary) and transforms run in
f32, so at f32 the Winograd conv must match the direct convolution to float
rounding; the flag must not change the param pytree; and the tiny pipeline
must track the direct path closely."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_moe_tpu.ops.winograd import winograd_conv3x3


def _direct(x, w):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x, w, (1, 1), ((1, 1), (1, 1)),
                                        dimension_numbers=dn)


@pytest.mark.parametrize("tile", [2, 4])
@pytest.mark.parametrize("shape", [
    (2, 8, 8, 5, 7),      # even spatial
    (1, 7, 9, 3, 4),      # odd spatial (tile crop path)
    (1, 1, 1, 2, 3),      # degenerate 1x1 image
    (2, 16, 16, 8, 8),    # SD-like tile grid
])
def test_winograd_matches_direct_conv_f32(shape, tile):
    b, h, w, ci, co = shape
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (b, h, w, ci), jnp.float32)
    k = jax.random.normal(kw, (3, 3, ci, co), jnp.float32) * 0.1
    ref = np.asarray(_direct(x, k))
    got = np.asarray(winograd_conv3x3(x, k, tile=tile))
    scale = np.abs(ref).max() + 1e-9
    np.testing.assert_allclose(got / scale, ref / scale,
                               atol=2e-6 if tile == 2 else 2e-5)


@pytest.mark.parametrize("tile", [2, 4])
def test_winograd_bf16_error_at_rounding_scale(tile):
    kx, kw = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, (2, 16, 16, 32), jnp.bfloat16)
    k = (jax.random.normal(kw, (3, 3, 32, 32), jnp.float32) * 0.1
         ).astype(jnp.bfloat16)
    ref = np.asarray(_direct(x, k), np.float32)
    got = np.asarray(winograd_conv3x3(x, k, tile=tile), np.float32)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.03, rel   # bf16 rounding scale, not divergence


@pytest.mark.parametrize("tile", [2, 4])
def test_winograd_banding_is_exact(tile, monkeypatch):
    """DMOE_WINO_STACK_MB bounds the Winograd-domain intermediates by
    processing tile-row bands; tiles are independent, so a tiny budget
    (every tile row its own band) must reproduce the single-shot result to
    float rounding (XLA may reassociate the transform sums differently per
    band shape; measured max drift ~5e-7 at f32) — this is what keeps the
    VAE decoder's 512^2 convs from building multi-GB stacks without changing
    serving outputs."""
    kx, kw = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(kx, (2, 21, 13, 6), jnp.float32)
    k = jax.random.normal(kw, (3, 3, 6, 9), jnp.float32) * 0.1
    monkeypatch.setenv("DMOE_WINO_STACK_MB", "1e9")
    single = np.asarray(winograd_conv3x3(x, k, tile=tile))
    monkeypatch.setenv("DMOE_WINO_STACK_MB", "1e-6")
    banded = np.asarray(winograd_conv3x3(x, k, tile=tile))
    scale0 = np.abs(single).max() + 1e-9
    np.testing.assert_allclose(banded / scale0, single / scale0, atol=2e-6)
    # and both still match the direct convolution
    ref = np.asarray(_direct(x, k))
    scale = np.abs(ref).max() + 1e-9
    np.testing.assert_allclose(banded / scale, ref / scale,
                               atol=2e-6 if tile == 2 else 2e-5)


def test_winograd_param_tree_unchanged_and_pipeline_tracks_direct():
    from diffusion_models_moe_tpu import StableDiffusionPipeline, tiny_config
    cfg = tiny_config()
    wcfg = dataclasses.replace(
        cfg, unet=dataclasses.replace(cfg.unet, conv_winograd=True))
    pipe, wpipe = StableDiffusionPipeline(cfg), StableDiffusionPipeline(wcfg)
    params = pipe.init_params(jax.random.PRNGKey(0))
    wparams = wpipe.init_params(jax.random.PRNGKey(0))
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(wparams))

    tcfg = cfg.text_encoder
    cond = jax.random.randint(jax.random.PRNGKey(3), (1, tcfg.max_length),
                              0, tcfg.vocab_size)
    uncond = jnp.zeros_like(cond)
    img, _ = pipe.generate(params, cond, uncond, jax.random.PRNGKey(7),
                           num_steps=2, decode=False)
    wimg, _ = wpipe.generate(params, cond, uncond, jax.random.PRNGKey(7),
                             num_steps=2, decode=False)
    a, b = np.asarray(img, np.float64), np.asarray(wimg, np.float64)
    assert np.isfinite(b).all()
    rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-9)
    assert rel < 1e-4, rel   # f32 tiny config: float-rounding drift only


def test_vae_decoder_serving_modes_track_direct():
    """VAEConfig.conv_winograd / quant_int8 route the DECODER convs through
    the serving-mode twins (models/vae.py) with an unchanged param pytree —
    the dominant cost of few-step (LCM) serving is the VAE decode."""
    from diffusion_models_moe_tpu.config import VAEConfig
    from diffusion_models_moe_tpu.models.vae import VAEDecoder
    cfg = VAEConfig(block_out_channels=(32, 32, 64, 64), norm_num_groups=8)
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4), jnp.float32)
    dec = VAEDecoder(cfg)
    params = dec.init(jax.random.PRNGKey(1), z)
    ref = np.asarray(dec.apply(params, z), np.float64)

    wdec = VAEDecoder(dataclasses.replace(cfg, conv_winograd=True))
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(wdec.init(jax.random.PRNGKey(1), z)))
    got = np.asarray(wdec.apply(params, z), np.float64)
    rel = np.linalg.norm(got - ref) / max(np.linalg.norm(ref), 1e-9)
    assert rel < 1e-4, rel   # f32: float-rounding drift only

    cdec = VAEDecoder(dataclasses.replace(cfg, conv_winograd=True,
                                          quant_int8=True))
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(cdec.init(jax.random.PRNGKey(1), z)))
    got = np.asarray(cdec.apply(params, z), np.float64)
    assert np.isfinite(got).all()
    rel = np.linalg.norm(got - ref) / max(np.linalg.norm(ref), 1e-9)
    assert rel < 0.35, rel   # int8-quantization-scale drift, not divergence


def test_winograd_int8_combined_mode_runs():
    """conv_winograd + quant_int8 together = the combined serving mode
    (Winograd 3x3 convs, int8 everything else); same param tree, sane
    outputs near the float path."""
    from diffusion_models_moe_tpu import StableDiffusionPipeline, tiny_config
    cfg = tiny_config()
    ccfg = dataclasses.replace(
        cfg, unet=dataclasses.replace(cfg.unet, conv_winograd=True,
                                      quant_int8=True))
    pipe, cpipe = StableDiffusionPipeline(cfg), StableDiffusionPipeline(ccfg)
    params = pipe.init_params(jax.random.PRNGKey(0))
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(
                cpipe.init_params(jax.random.PRNGKey(0))))
    tcfg = cfg.text_encoder
    cond = jax.random.randint(jax.random.PRNGKey(3), (1, tcfg.max_length),
                              0, tcfg.vocab_size)
    uncond = jnp.zeros_like(cond)
    img, _ = pipe.generate(params, cond, uncond, jax.random.PRNGKey(7),
                           num_steps=2, decode=False)
    cimg, _ = cpipe.generate(params, cond, uncond, jax.random.PRNGKey(7),
                             num_steps=2, decode=False)
    a, b = np.asarray(img, np.float64), np.asarray(cimg, np.float64)
    assert np.isfinite(b).all()
    rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-9)
    assert rel < 0.35, rel   # int8-quantization-scale drift, not divergence


def test_winograd_fused_pallas_matches_direct_conv():
    """Fused Pallas Winograd (interpret mode on CPU) == direct conv at f32
    tolerance, across the UNet's band/Cout tiling plans (ops/winograd_fused.py
    — the VMEM-resident variant of the HBM-bound XLA formulation)."""
    from jax import lax

    from diffusion_models_moe_tpu.ops.winograd_fused import (fused_ok,
                                                             winograd3x3_fused)

    rng = np.random.RandomState(0)
    # (B, H, W, Cin, Cout): multi-band 64x64, single-band 32x32 with Cout
    # blocking, 16x16 small-N, non-128-multiple Cout
    for shape in [(2, 64, 64, 20, 128), (1, 32, 32, 48, 256),
                  (2, 16, 16, 32, 128), (1, 16, 16, 32, 160)]:
        b, h, w, cin, cout = shape
        assert fused_ok(h, w, cin, cout)
        x = jnp.asarray(rng.randn(b, h, w, cin), jnp.float32)
        k = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, jnp.float32)
        ref = lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = winograd3x3_fused(x, k, interpret=True)
        err = float(jnp.max(jnp.abs(ref - got))
                    / (jnp.max(jnp.abs(ref)) + 1e-9))
        assert err < 1e-5, (shape, err)
    # scope gate: odd/small shapes are refused
    assert not fused_ok(15, 16, 32, 128)
    assert not fused_ok(8, 8, 1280, 1280)
    assert not fused_ok(16, 16, 4, 128)
    assert not fused_ok(16, 16, 32, 64)


def test_winograd_fused_profitability_gate():
    """Measured-profitability gate (ROOFLINE.md §4): 32x32/16x16 UNet conv
    levels route to the fused kernel; 64x64 levels (where fused measured
    slower than direct conv) and sub-16 levels do not."""
    from diffusion_models_moe_tpu.ops.winograd_fused import fused_profitable

    assert fused_profitable(32, 32, 640, 640)
    assert fused_profitable(16, 16, 1280, 1280)
    assert fused_profitable(32, 32, 1280, 640)
    assert not fused_profitable(64, 64, 320, 320)   # loses: 41.6 vs 54.4 TF/s
    assert not fused_profitable(64, 64, 640, 320)
    assert not fused_profitable(8, 8, 1280, 1280)   # below fused_ok scope
