"""PixArt-alpha DiT geometry: forward shapes, GELU tap path, removal window."""
import jax
import jax.numpy as jnp
import numpy as np

from diffusion_models_moe_tpu.models.pixart import (PixArtTransformer2D,
                                                    tiny_pixart_config)
from diffusion_models_moe_tpu.pipelines.stable_diffusion import flatten_taps
from diffusion_models_moe_tpu.taps import LayerIntervention, TapSpec


def _setup():
    cfg = tiny_pixart_config()
    model = PixArtTransformer2D(cfg)
    lat = jnp.zeros((2, 8, 8, 4))
    ctx = jnp.zeros((2, 6, cfg.text_in_dim))
    params = model.init(jax.random.PRNGKey(0), lat, jnp.zeros((2,), jnp.int32),
                        ctx)["params"]
    return cfg, model, params, lat, ctx


def test_pixart_forward_and_conditioning():
    cfg, model, params, lat, ctx = _setup()
    out = model.apply({"params": params}, lat, jnp.asarray([10, 500]), ctx)
    assert out.shape == (2, 8, 8, 4)
    assert np.all(np.isfinite(np.asarray(out)))
    out2 = model.apply({"params": params}, lat, jnp.asarray([900, 900]), ctx)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_pixart_mean_gate_tap():
    """PixArt uses the GELU path: mean-over-tokens stats
    (reference: neuron_receivers/predictivity.py:55-62)."""
    cfg, model, params, lat, ctx = _setup()
    out, taps = model.apply({"params": params}, lat, jnp.zeros((2,), jnp.int32),
                            ctx, tap=TapSpec(mean_gate=True, save_gate=True),
                            mutable=["taps"])
    flat = flatten_taps(taps["taps"])
    assert sorted(flat["mean_gate"].keys()) == list(range(cfg.num_layers))
    mg = np.asarray(flat["mean_gate"][0])
    full = np.asarray(flat["save_gate"][0])   # (B, S, H)
    np.testing.assert_allclose(
        mg, full.reshape(-1, full.shape[-1]).mean(0), rtol=1e-5, atol=1e-5)


def test_pixart_neuron_removal_gelu_semantics():
    """GELU-path removal zeroes (fill 0.0) and changes the output."""
    cfg, model, params, lat, ctx = _setup()
    h = cfg.hidden_size * cfg.ff_mult
    mask = np.zeros((1, h), bool)
    mask[:, :h // 2] = True
    ivs = tuple([LayerIntervention(neuron_mask=jnp.asarray(mask),
                                   neuron_fill=0.0)]
                + [None] * (cfg.num_layers - 1))
    base = model.apply({"params": params}, lat, jnp.zeros((2,), jnp.int32), ctx)
    removed = model.apply({"params": params}, lat, jnp.zeros((2,), jnp.int32),
                          ctx, ivs=ivs)
    assert not np.allclose(np.asarray(base), np.asarray(removed))
