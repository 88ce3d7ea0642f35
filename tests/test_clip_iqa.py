"""CLIP-IQA: prompt-pair softmax scoring (reference modularity/clip_score.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_moe_tpu.benchmarks.clip_iqa import (
    BUILTIN_PROMPTS, ClipIQA, clip_iqa_probs, design_test_prompt,
    removal_quality_report, resolve_prompt_pairs)


def test_resolve_prompt_pairs_naming():
    pairs = resolve_prompt_pairs(
        ("quality", "noisiness", ("not naked", "naked"),
         ("photo of a woman", "photo of a man")))
    assert list(pairs) == ["quality", "noisiness", "user_defined_0",
                           "user_defined_1"]
    assert pairs["quality"] == BUILTIN_PROMPTS["quality"]
    assert pairs["user_defined_1"] == ("photo of a woman", "photo of a man")
    with pytest.raises(ValueError):
        resolve_prompt_pairs(("not_a_builtin",))


def test_clip_iqa_probs_math():
    """Probability equals softmax of the logit-scaled cosine pair, computed
    by hand (torchmetrics CLIPImageQualityAssessment semantics)."""
    rng = np.random.RandomState(0)
    img = rng.randn(3, 8)
    pos = rng.randn(2, 8)
    neg = rng.randn(2, 8)
    probs = np.asarray(clip_iqa_probs(img, pos, neg, logit_scale=100.0))
    assert probs.shape == (3, 2)

    def n(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)
    lp = 100.0 * n(img) @ n(pos).T
    ln = 100.0 * n(img) @ n(neg).T
    want = np.exp(lp) / (np.exp(lp) + np.exp(ln))
    np.testing.assert_allclose(probs, want, atol=1e-5)
    # logit scale 100 saturates f32 softmax for well-separated pairs — exact
    # 0.0/1.0 endpoints are legitimate (torchmetrics behaves the same).
    assert ((probs >= 0) & (probs <= 1)).all()


def test_clip_iqa_prefers_aligned_prompt():
    """An image embedding parallel to the positive prompt must score > 0.5;
    parallel to the negative, < 0.5."""
    pos = np.array([[1.0, 0.0, 0.0]])
    neg = np.array([[0.0, 1.0, 0.0]])
    probs = np.asarray(clip_iqa_probs(np.vstack([pos, neg]), pos, neg))
    assert probs[0, 0] > 0.99
    assert probs[1, 0] < 0.01


def test_clip_iqa_end_to_end_tiny_towers():
    """ClipIQA over the native tiny CLIP towers: dict keys per prompt, one
    probability per image, deterministic."""
    from diffusion_models_moe_tpu.benchmarks.fid import (
        make_clip_featurizer, make_clip_text_featurizer)
    from diffusion_models_moe_tpu.config import tiny_config
    from diffusion_models_moe_tpu.models.clip_text import CLIPTextEncoder
    from diffusion_models_moe_tpu.models.clip_vision import (
        CLIPVisionEncoder, tiny_vision_config)

    venc = CLIPVisionEncoder(tiny_vision_config())
    vparams = venc.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)))["params"]
    tcfg = tiny_config().text_encoder
    tenc = CLIPTextEncoder(tcfg)
    tparams = tenc.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, 8), jnp.int32))["params"]

    def tokenize(texts):
        rng_ids = [[min(abs(hash(t)) % tcfg.vocab_size, tcfg.vocab_size - 1)]
                   + [(i * 7 + len(t)) % tcfg.vocab_size for i in range(7)]
                   for t in texts]
        return np.asarray(rng_ids)

    proj = np.asarray(
        np.random.RandomState(2).randn(tcfg.hidden_size, 16), np.float32)
    scorer = ClipIQA(
        make_clip_featurizer(venc, vparams),
        make_clip_text_featurizer(tenc, tparams, tokenize,
                                  text_projection=proj),
        prompts=("quality", ("not naked", "naked")))

    imgs = jnp.asarray(np.random.RandomState(3).rand(2, 32, 32, 3), jnp.float32)
    out = scorer(imgs)
    assert set(out) == {"quality", "user_defined_0"}
    assert out["quality"].shape == (2,)
    assert (out["quality"] >= 0).all() and (out["quality"] <= 1).all()
    again = scorer(imgs)
    np.testing.assert_allclose(out["quality"], again["quality"])


def test_design_test_prompt_table():
    pair, dof = design_test_prompt("naked")
    assert pair == ("not naked", "naked") and dof == 17
    pair, dof = design_test_prompt("gender")
    assert pair == ("photo of a woman", "photo of a man") and dof == 9
    with pytest.raises(KeyError):
        design_test_prompt("unknown-concept")


def test_removal_quality_report_structure():
    def fake(q, c):
        return {"quality": np.asarray([q, q]), "user_defined_0":
                np.asarray([c, c])}
    rep = removal_quality_report(fake(0.9, 0.2), fake(0.8, 0.9),
                                 fake(0.85, 0.3))
    assert rep["concept"]["concept_sim"] == pytest.approx(0.9)
    assert rep["concept_removal"]["quality"] == pytest.approx(0.85)
    assert set(rep) == {"base", "concept", "concept_removal"}


def test_clip_iqa_protocol_end_to_end(tmp_path):
    """The reference clip_score.py flow: three image splits -> per-split mean
    quality + concept probability, written to clip_iqa_scores.json."""
    import json
    from diffusion_models_moe_tpu.benchmarks.fid import (
        make_clip_featurizer, make_clip_text_featurizer)
    from diffusion_models_moe_tpu.benchmarks.protocols import clip_iqa_protocol
    from diffusion_models_moe_tpu.config import tiny_config
    from diffusion_models_moe_tpu.models.clip_text import CLIPTextEncoder
    from diffusion_models_moe_tpu.models.clip_vision import (
        CLIPVisionEncoder, tiny_vision_config)

    venc = CLIPVisionEncoder(tiny_vision_config())
    vparams = venc.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)))["params"]
    tcfg = tiny_config().text_encoder
    tenc = CLIPTextEncoder(tcfg)
    tparams = tenc.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, 8), jnp.int32))["params"]

    def tokenize(texts):
        return np.asarray([[min(len(t) + i, tcfg.vocab_size - 1)
                            for i in range(8)] for t in texts])

    proj = np.asarray(
        np.random.RandomState(2).randn(tcfg.hidden_size, 16), np.float32)
    rng = np.random.RandomState(3)
    imgs = [rng.rand(2, 32, 32, 3).astype(np.float32) for _ in range(3)]
    report = clip_iqa_protocol(
        imgs[0], imgs[1], imgs[2],
        make_clip_featurizer(venc, vparams),
        make_clip_text_featurizer(tenc, tparams, tokenize,
                                  text_projection=proj),
        concept="Van Gogh", out_dir=str(tmp_path))
    assert set(report) == {"base", "concept", "concept_removal"}
    for split in report.values():
        assert 0.0 <= split["quality"] <= 1.0
        assert 0.0 <= split["concept_sim"] <= 1.0
    on_disk = json.loads((tmp_path / "clip_iqa_scores.json").read_text())
    assert on_disk == report
