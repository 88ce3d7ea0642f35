"""int8 W8A8 serving mode (ops/quant.py + quant_int8 flag).

The scheme is symmetric round-to-nearest with per-token (dots) / per-sample
(convs) activation scales and per-output-channel weight scales — so no int8
reduction couples batch rows and co-batched serving stays sample-exact. On
grid-exact inputs the int8 path must equal the float path bit-for-bit (proves
geometry/padding parity with the bf16 layers), and on random inputs the error
must stay at quantization scale."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_moe_tpu.ops.quant import int8_conv, int8_dot


def _grid(key, shape, scale):
    """Values exactly representable as int8 * (scale/127), with absmax pinned
    to `scale` so the dynamic scale reproduces the grid exactly."""
    ints = jax.random.randint(key, shape, -127, 128).astype(jnp.float32)
    flat = ints.reshape(-1).at[0].set(127.0)
    return flat.reshape(shape) * (scale / 127.0)


def test_int8_dot_exact_on_grid():
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = _grid(kx, (7, 33), 3.0)
    # per-token scales: pin each ROW's absmax to the grid scale
    x = x.at[:, 0].set(3.0)
    # per-column grids: column j uses scale (j+1)/4
    cols = [np.asarray(_grid(jax.random.fold_in(kw, j), (33, 1), (j + 1) / 4.0))
            for j in range(5)]
    w = jnp.asarray(np.concatenate(cols, axis=1))
    for per_token in (True, False):
        got = int8_dot(x, w, per_token=per_token)
        np.testing.assert_allclose(np.asarray(got), np.asarray(x @ w),
                                   rtol=1e-5, atol=1e-5)


def test_int8_dot_error_bound_random():
    kx, kw = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, (64, 128))
    # heterogeneous row magnitudes: per-token scaling must beat per-tensor
    x = x * (10.0 ** jnp.linspace(-2, 0, 64))[:, None]
    w = jax.random.normal(kw, (128, 96))
    ref = np.asarray(x @ w)

    def rel(per_token):
        got = np.asarray(int8_dot(x, w, per_token=per_token))
        return np.linalg.norm(got - ref) / np.linalg.norm(ref)

    r_tok, r_tensor = rel(True), rel(False)
    assert r_tok < 0.02, r_tok
    assert r_tok < r_tensor, (r_tok, r_tensor)


def test_int8_conv_exact_on_grid_matches_padded_float_conv():
    """Grid-exact inputs: the int8 conv must equal the float conv with the
    same explicit ((1,1),(1,1)) padding — catches any SAME-vs-explicit
    padding drift (stride 2 SAME pads (0,1), diffusers pads (1,1))."""
    kx, kw = jax.random.split(jax.random.PRNGKey(2))
    x = _grid(kx, (2, 8, 8, 6), 2.0)
    x = x.at[:, 0, 0, 0].set(2.0)  # pin absmax per SAMPLE (per-sample scales)
    w = _grid(kw, (3, 3, 6, 4), 1.0)
    w = w.at[0, 0, 0, :].set(1.0)  # pin absmax per output channel
    for strides in [(1, 1), (2, 2)]:
        for per_sample in (True, False):
            got = int8_conv(x, w, strides=strides, padding=((1, 1), (1, 1)),
                            per_sample=per_sample)
            dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                                ("NHWC", "HWIO", "NHWC"))
            ref = jax.lax.conv_general_dilated(x, w, strides, ((1, 1), (1, 1)),
                                               dimension_numbers=dn)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-4, atol=1e-4)


def test_int8_no_cobatching_coupling():
    """Per-token dot scales and per-sample conv scales: a request's int8
    output is identical whatever it is co-batched with (the serving
    determinism contract, serving.py)."""
    k = jax.random.PRNGKey(5)
    ka, kb, kc, kw = jax.random.split(k, 4)
    w = jax.random.normal(kw, (16, 8))
    a = jax.random.normal(ka, (1, 16))
    b = jax.random.normal(kb, (1, 16)) * 100.0   # would shift a shared scale
    c = jax.random.normal(kc, (1, 16)) * 0.01
    y_ab = np.asarray(int8_dot(jnp.concatenate([a, b]), w))[0]
    y_ac = np.asarray(int8_dot(jnp.concatenate([a, c]), w))[0]
    np.testing.assert_array_equal(y_ab, y_ac)

    wc = jax.random.normal(kw, (3, 3, 4, 4))
    a = jax.random.normal(ka, (1, 6, 6, 4))
    b = jax.random.normal(kb, (1, 6, 6, 4)) * 100.0
    c = jax.random.normal(kc, (1, 6, 6, 4)) * 0.01
    y_ab = np.asarray(int8_conv(jnp.concatenate([a, b]), wc))[0]
    y_ac = np.asarray(int8_conv(jnp.concatenate([a, c]), wc))[0]
    np.testing.assert_array_equal(y_ab, y_ac)


def test_quant_param_tree_unchanged_and_pipeline_runs():
    """quant_int8=True must not change the param pytree (porters/erasure
    machinery untouched) and the tiny pipeline must generate sane images
    close to the bf16 path."""
    from diffusion_models_moe_tpu import StableDiffusionPipeline, tiny_config
    cfg = tiny_config()
    qcfg = dataclasses.replace(
        cfg, unet=dataclasses.replace(cfg.unet, quant_int8=True))
    pipe, qpipe = StableDiffusionPipeline(cfg), StableDiffusionPipeline(qcfg)
    params = pipe.init_params(jax.random.PRNGKey(0))
    qparams = qpipe.init_params(jax.random.PRNGKey(0))
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(qparams))

    tcfg = cfg.text_encoder
    cond = jax.random.randint(jax.random.PRNGKey(3), (1, tcfg.max_length),
                              0, tcfg.vocab_size)
    uncond = jnp.zeros_like(cond)
    img, _ = pipe.generate(params, cond, uncond, jax.random.PRNGKey(7),
                           num_steps=2, decode=False)
    qimg, _ = qpipe.generate(params, cond, uncond, jax.random.PRNGKey(7),
                             num_steps=2, decode=False)
    a, b = np.asarray(img, np.float64), np.asarray(qimg, np.float64)
    assert np.isfinite(b).all()
    rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-9)
    assert rel < 0.35, rel   # quantization-scale drift, not divergence
