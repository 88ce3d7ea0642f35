"""Dbg-size smoke tests of the flagship protocols end-to-end on shipped data
(VERDICT round-1 Next #3: protocols runnable at reference operating points)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_moe_tpu import StableDiffusionPipeline, tiny_config
from diffusion_models_moe_tpu.benchmarks.nudity import HARMFUL_LABELS
from diffusion_models_moe_tpu.benchmarks.protocols import (
    artist_removal_protocol, i2p_protocol, memorization_protocol)


@pytest.fixture(scope="module")
def setup():
    pipe = StableDiffusionPipeline(tiny_config())
    params = pipe.init_params(jax.random.PRNGKey(0))
    tc = pipe.config.text_encoder

    def tokenize(texts):
        import hashlib
        out = []
        for t in texts:
            d = hashlib.md5(t.encode()).digest()
            rng = np.random.RandomState(int.from_bytes(d[:4], "little")
                                        % (2 ** 31))
            out.append(rng.randint(0, tc.vocab_size, tc.max_length))
        return np.asarray(out, np.int32)

    return pipe, params, tokenize


def test_i2p_protocol_smoke(setup, tmp_path):
    pipe, params, tokenize = setup
    calls = []

    def fake_detector(images):
        calls.append(len(images))
        return [[(HARMFUL_LABELS[0], 0.9)] if i == 0 else []
                for i in range(len(images))]

    r = i2p_protocol(pipe, params, tokenize, str(tmp_path), fake_detector,
                     limit=2, num_steps=2, batch_size=2)
    assert r["n_prompts"] == 2 and calls == [2]
    assert r["prompts_with_nudity"] == 1
    assert (tmp_path / "i2p_results.json").exists()


def test_memorization_protocol_smoke(setup, tmp_path):
    pipe, params, tokenize = setup

    def fake_embed(images):
        return images.reshape(images.shape[0], -1)[:, :8]

    r = memorization_protocol(pipe, params, tokenize, str(tmp_path),
                              fake_embed, split=0, limit=2, num_steps=2,
                              batch_size=2)
    assert r["n_prompts"] == 2
    assert np.isfinite(r["mean_similarity"])


def test_artist_removal_protocol_smoke(setup, tmp_path):
    pipe, params, tokenize = setup

    def fake_featurize(images):
        return images.reshape(images.shape[0], -1)[:, :16]

    def fake_text_featurize(prompts):
        # deterministic per-prompt embedding in the same 16-dim fake space
        rs = np.random.RandomState(len(prompts))
        return rs.randn(len(prompts), 16)

    r = artist_removal_protocol(pipe, params, tokenize, str(tmp_path),
                                fake_featurize, n_artists=100, part=1,
                                limit=2, num_steps=2, batch_size=2,
                                text_featurize=fake_text_featurize)
    assert r["n_artists"] == 2
    # reference accuracy semantics: mean(cos(text, orig) > cos(text, removed))
    assert 0.0 <= r["removal_accuracy"] <= 1.0
    # without text embeddings the accuracy is honestly absent, not vacuous
    r2 = artist_removal_protocol(pipe, params, tokenize, str(tmp_path),
                                 fake_featurize, n_artists=100, part=1,
                                 limit=2, num_steps=2, batch_size=2)
    assert r2["removal_accuracy"] is None
