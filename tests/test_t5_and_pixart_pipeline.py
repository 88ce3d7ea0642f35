"""T5 encoder parity vs transformers (golden test), PixArt pipeline e2e, and
the PixArt/T5 weight porter.

The parity tests construct tiny RANDOM-weight torch models with the transformers
library (baked into the env; no network), export their state dicts in the HF
snapshot layout, port them with weights/port_pixart.py, and compare outputs —
validating both the model math and the porter key mapping against the real
upstream implementation (VERDICT round-1 Missing #7)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_moe_tpu.models.t5 import (T5Config, T5Encoder,
                                                tiny_t5_config)
from diffusion_models_moe_tpu.pipelines.pixart import (
    PixArtPipeline, tiny_pixart_pipeline_config)
from diffusion_models_moe_tpu.taps import TapSpec
from diffusion_models_moe_tpu.weights.port_pixart import (
    port_pixart_transformer, port_t5_encoder, sincos_pos_embed)


def _save_safetensors(sd: dict, path: str) -> None:
    from safetensors.numpy import save_file
    os.makedirs(os.path.dirname(path), exist_ok=True)
    save_file({k: np.asarray(v) for k, v in sd.items()}, path)


# ------------------------------------------------------------------ T5 parity
def test_t5_encoder_matches_transformers(tmp_path):
    """Port a random torch T5EncoderModel and match its outputs exactly."""
    torch = pytest.importorskip("torch")
    from transformers import T5Config as HFT5Config
    from transformers import T5EncoderModel

    cfg = T5Config(vocab_size=256, d_model=48, d_kv=8, d_ff=96, num_layers=2,
                   num_heads=4, relative_attention_num_buckets=8,
                   relative_attention_max_distance=16, max_length=12)
    hf_cfg = HFT5Config(
        vocab_size=cfg.vocab_size, d_model=cfg.d_model, d_kv=cfg.d_kv,
        d_ff=cfg.d_ff, num_layers=cfg.num_layers, num_heads=cfg.num_heads,
        relative_attention_num_buckets=cfg.relative_attention_num_buckets,
        relative_attention_max_distance=cfg.relative_attention_max_distance,
        feed_forward_proj="gated-gelu", use_cache=False, dropout_rate=0.0)
    torch.manual_seed(0)
    model = T5EncoderModel(hf_cfg).eval()

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    _save_safetensors(sd, str(tmp_path / "text_encoder" /
                              "model.safetensors"))
    params = port_t5_encoder(str(tmp_path), cfg)

    rng = np.random.RandomState(0)
    ids = rng.randint(0, cfg.vocab_size, (2, cfg.max_length))
    mask = np.ones_like(ids)
    mask[0, 8:] = 0                         # padded caption
    with torch.no_grad():
        ref = model(input_ids=torch.from_numpy(ids),
                    attention_mask=torch.from_numpy(mask)
                    ).last_hidden_state.numpy()
    out = np.asarray(T5Encoder(cfg).apply({"params": params},
                                          jnp.asarray(ids),
                                          jnp.asarray(mask)))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_t5_mask_blocks_padded_tokens():
    cfg = tiny_t5_config()
    enc = T5Encoder(cfg)
    ids = jnp.asarray(np.random.RandomState(0).randint(
        0, cfg.vocab_size, (1, cfg.max_length)))
    params = enc.init(jax.random.PRNGKey(0), ids)["params"]
    mask = np.ones((1, cfg.max_length), np.int32)
    mask[:, 8:] = 0
    out_m = enc.apply({"params": params}, ids, jnp.asarray(mask))
    # changing a masked-out token must not affect unmasked positions
    ids2 = np.asarray(ids).copy()
    ids2[0, -1] = (ids2[0, -1] + 1) % cfg.vocab_size
    out_m2 = enc.apply({"params": params}, jnp.asarray(ids2),
                       jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out_m)[:, :8],
                               np.asarray(out_m2)[:, :8], atol=1e-6)


# ------------------------------------------------------------- PixArt e2e
@pytest.fixture(scope="module")
def pixart_pipe():
    cfg = tiny_pixart_pipeline_config()
    pipe = PixArtPipeline(cfg)
    params = pipe.init_params(jax.random.PRNGKey(0))
    return pipe, params


def test_pixart_pipeline_generates(pixart_pipe):
    pipe, params = pixart_pipe
    tc = pipe.config.text_encoder
    cond = jax.random.randint(jax.random.PRNGKey(1), (1, tc.max_length), 0,
                              tc.vocab_size)
    uncond = jnp.zeros_like(cond)
    img, taps = pipe.generate(params, cond, uncond, jax.random.PRNGKey(2))
    assert img.shape == (1, 64, 64, 3)
    assert np.all(np.isfinite(np.asarray(img)))
    assert taps is None
    # T5 conditioning flows: different prompt -> different image
    cond2 = jax.random.randint(jax.random.PRNGKey(9), (1, tc.max_length), 0,
                               tc.vocab_size)
    img2, _ = pipe.generate(params, cond2, uncond, jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(img), np.asarray(img2))


def test_pixart_dp_tp_generate_parity(pixart_pipe):
    """PixArt mesh-sharded generate (dp=2 x tp=4): T5 q/k/v/o + wi/wo and DiT
    attention/FF shard over 'tp' (parallel/mesh.py rules) — output must equal
    single-device."""
    from diffusion_models_moe_tpu.parallel.mesh import create_mesh

    pipe, params = pixart_pipe
    tc = pipe.config.text_encoder
    cond = jax.random.randint(jax.random.PRNGKey(1), (4, tc.max_length), 0,
                              tc.vocab_size)
    uncond = jnp.zeros_like(cond)
    key = jax.random.PRNGKey(2)
    img0, _ = pipe.generate(params, cond, uncond, key, num_steps=2)
    mesh = create_mesh(8, dp=2, tp=4)
    img1, _ = pipe.generate(params, cond, uncond, key, num_steps=2, mesh=mesh)
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img0),
                               atol=2e-5, rtol=1e-5)


def test_pixart_pipeline_mean_gate_attribution(pixart_pipe):
    """Mean-gate attribution runs through the scanned PixArt loop
    (reference GELU path: neuron_receivers/predictivity.py:55-62)."""
    pipe, params = pixart_pipe
    tc = pipe.config.text_encoder
    cond = jax.random.randint(jax.random.PRNGKey(1), (1, tc.max_length), 0,
                              tc.vocab_size)
    lat, taps = pipe.generate(params, cond, jnp.zeros_like(cond),
                              jax.random.PRNGKey(2),
                              tap=TapSpec(mean_gate=True), decode=False)
    n_layers = pipe.config.transformer.num_layers
    assert sorted(taps["mean_gate"].keys()) == list(range(n_layers))
    mg = np.asarray(taps["mean_gate"][0])     # (T, H)
    assert mg.shape == (2, pipe.config.transformer.hidden_size
                        * pipe.config.transformer.ff_mult)
    assert np.all(np.isfinite(mg))


# ------------------------------------------------------------- DiT porter
def test_pixart_transformer_porter_roundtrip(tmp_path, pixart_pipe):
    """Fake diffusers-layout DiT state dict ports key-for-key and runs."""
    pipe, params = pixart_pipe
    cfg = pipe.config.transformer
    rng = np.random.RandomState(0)
    d, p, c = cfg.hidden_size, cfg.patch_size, cfg.sample_channels
    dff = d * cfg.ff_mult

    def lin(out_d, in_d):
        return rng.randn(out_d, in_d).astype(np.float32) * 0.02

    sd = {
        "pos_embed.proj.weight": rng.randn(d, c, p, p).astype(np.float32),
        "pos_embed.proj.bias": np.zeros(d, np.float32),
        "adaln_single.emb.timestep_embedder.linear_1.weight": lin(d, 256),
        "adaln_single.emb.timestep_embedder.linear_1.bias": np.zeros(
            d, np.float32),
        "adaln_single.emb.timestep_embedder.linear_2.weight": lin(d, d),
        "adaln_single.emb.timestep_embedder.linear_2.bias": np.zeros(
            d, np.float32),
        "adaln_single.linear.weight": lin(6 * d, d),
        "adaln_single.linear.bias": np.zeros(6 * d, np.float32),
        "caption_projection.linear_1.weight": lin(d, cfg.text_in_dim),
        "caption_projection.linear_1.bias": np.zeros(d, np.float32),
        "caption_projection.linear_2.weight": lin(d, d),
        "caption_projection.linear_2.bias": np.zeros(d, np.float32),
        "scale_shift_table": rng.randn(2, d).astype(np.float32) * 0.02,
        "proj_out.weight": lin(p * p * cfg.out_channels, d),
        "proj_out.bias": np.zeros(p * p * cfg.out_channels, np.float32),
    }
    for i in range(cfg.num_layers):
        b = f"transformer_blocks.{i}"
        sd[f"{b}.scale_shift_table"] = (rng.randn(6, d).astype(np.float32)
                                        * 0.02)
        for a, kv_dim in (("attn1", d), ("attn2", cfg.cross_attention_dim)):
            for nme, in_d in (("to_q", d), ("to_k", kv_dim), ("to_v", kv_dim)):
                sd[f"{b}.{a}.{nme}.weight"] = lin(d, in_d)
                sd[f"{b}.{a}.{nme}.bias"] = np.zeros(d, np.float32)
            sd[f"{b}.{a}.to_out.0.weight"] = lin(d, d)
            sd[f"{b}.{a}.to_out.0.bias"] = np.zeros(d, np.float32)
        sd[f"{b}.ff.net.0.proj.weight"] = lin(dff, d)
        sd[f"{b}.ff.net.0.proj.bias"] = np.zeros(dff, np.float32)
        sd[f"{b}.ff.net.2.weight"] = lin(d, dff)
        sd[f"{b}.ff.net.2.bias"] = np.zeros(d, np.float32)

    _save_safetensors(sd, str(tmp_path / "transformer" /
                              "diffusion_pytorch_model.safetensors"))
    ported = port_pixart_transformer(str(tmp_path), cfg,
                                     sample_size=pipe.config.sample_size)

    # identical tree structure as a live init (so flax .apply accepts it)
    ref_tree = jax.tree_util.tree_structure(params["transformer"])
    assert jax.tree_util.tree_structure(
        jax.tree_util.tree_map(np.asarray, ported)) == ref_tree

    s = pipe.config.sample_size
    lat = jnp.zeros((1, s, s, c))
    ctx = jnp.ones((1, 4, cfg.text_in_dim))
    out = pipe.transformer.apply({"params": ported}, lat,
                                 jnp.zeros((1,), jnp.int32), ctx)
    assert out.shape == (1, s, s, cfg.out_channels)
    assert np.all(np.isfinite(np.asarray(out)))


def test_sincos_pos_embed_properties():
    e = sincos_pos_embed(32, 4, 4, base_size=4)
    assert e.shape == (16, 32)
    # first row: position (0,0) -> sin parts 0, cos parts 1
    np.testing.assert_allclose(e[0, :8], 0.0, atol=1e-12)
    np.testing.assert_allclose(e[0, 8:16], 1.0, atol=1e-12)


def test_pixart_per_sample_seeds(pixart_pipe):
    """seeds= slot-independence for the PixArt pipeline (serving contract)."""
    pipe, params = pixart_pipe
    tc = pipe.config.text_encoder
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, tc.max_length), 0,
                             tc.vocab_size)
    un = jnp.zeros_like(ids)
    lat1, _ = pipe.generate(params, ids, un, jax.random.PRNGKey(0),
                            num_steps=2, decode=False,
                            seeds=np.asarray([7, 3]))
    lat2, _ = pipe.generate(params, ids, un, jax.random.PRNGKey(99),
                            num_steps=2, decode=False,
                            seeds=np.asarray([7, 1000]))
    np.testing.assert_array_equal(np.asarray(lat1[0]), np.asarray(lat2[0]))
    assert np.abs(np.asarray(lat1[1]) - np.asarray(lat2[1])).max() > 1e-4


def test_load_t5_tokenizer(tmp_path):
    """T5 tokenizer loader: fast tokenizer.json -> (ids, mask) with EOS/pad
    semantics (the PixArt text front door)."""
    import numpy as np
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    from diffusion_models_moe_tpu.data.tokenizer import load_t5_tokenizer

    vocab = {"<pad>": 0, "</s>": 1, "a": 2, "photo": 3, "of": 4, "dog": 5,
             "cat": 6}
    tok = Tokenizer(WordLevel(vocab, unk_token="<pad>"))
    tok.pre_tokenizer = Whitespace()
    tok.save(str(tmp_path / "tokenizer.json"))

    tokenize = load_t5_tokenizer(str(tmp_path), max_length=6)
    ids, mask = tokenize(["a photo of dog", "cat"])
    assert ids.shape == mask.shape == (2, 6)
    np.testing.assert_array_equal(ids[0], [2, 3, 4, 5, 1, 0])  # EOS appended
    np.testing.assert_array_equal(mask[0], [1, 1, 1, 1, 1, 0])
    np.testing.assert_array_equal(ids[1], [6, 1, 0, 0, 0, 0])
    # truncation keeps a trailing EOS
    ids2, _ = tokenize(["a photo of dog cat a photo of dog"])
    assert ids2[0, -1] == 1
    with __import__("pytest").raises(FileNotFoundError):
        load_t5_tokenizer(str(tmp_path / "missing"))
