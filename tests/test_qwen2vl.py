"""Golden parity for the native Qwen2-VL judge vs transformers at tiny dims.

Anchors models/qwen2vl.py + weights/port_qwen2vl.py against random-weight
torch Qwen2VLForConditionalGeneration: vision features over a real grid,
3D rope indices, M-RoPE text logits, and multimodal greedy generate.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from diffusion_models_moe_tpu.models.llama import (LlamaModel, embed_tokens,
                                                   greedy_decode)
from diffusion_models_moe_tpu.models.qwen2vl import (Qwen2VisionTower,
                                                     build_vqa, generate,
                                                     preprocess_image,
                                                     prompt_ids, rope_index,
                                                     smart_resize,
                                                     tiny_qwen2vl_config)
from diffusion_models_moe_tpu.weights.port_qwen2vl import port_qwen2vl_state

VOCAB = 128


def _hf_model():
    from transformers import Qwen2VLConfig as HFConfig
    from transformers import Qwen2VLForConditionalGeneration
    torch.manual_seed(11)
    vc = dict(depth=2, embed_dim=32, hidden_size=48, mlp_ratio=2,
              num_heads=4, in_channels=3, patch_size=4, spatial_merge_size=2,
              temporal_patch_size=2)
    cfg = HFConfig(vocab_size=VOCAB, hidden_size=48, intermediate_size=96,
                   num_hidden_layers=2, num_attention_heads=4,
                   num_key_value_heads=2, max_position_embeddings=128,
                   rope_theta=10000, rms_norm_eps=1e-6,
                   tie_word_embeddings=False, vision_config=vc,
                   image_token_id=120, vision_start_token_id=121,
                   vision_end_token_id=122,
                   rope_scaling={"type": "mrope", "mrope_section": [2, 2, 2]})
    return Qwen2VLForConditionalGeneration(cfg).eval()


@pytest.fixture(scope="module")
def pair():
    hf = _hf_model()
    cfg = tiny_qwen2vl_config()
    params = port_qwen2vl_state(
        {k: v.numpy() for k, v in hf.state_dict().items()}, cfg)
    return hf, cfg, params


def _patches(cfg, h=16, w=24, seed=12):
    rng = np.random.default_rng(seed)
    img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    return preprocess_image(img, cfg.vision, min_pixels=1,
                            max_pixels=10 ** 9)


def test_vision_features_parity(pair):
    hf, cfg, params = pair
    patches, grid = _patches(cfg)
    with torch.no_grad():
        ref = hf.model.visual(torch.from_numpy(patches),
                              grid_thw=torch.tensor([list(grid)])).numpy()
    ours = Qwen2VisionTower(cfg.vision, grid).apply(
        {"params": params["vision"]}, jnp.asarray(patches))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-5, rtol=1e-4)


def test_rope_index_parity(pair):
    hf, cfg, params = pair
    patches, grid = _patches(cfg)
    n_img = patches.shape[0] // 4
    ids = np.concatenate([[5, 7], [121], [120] * n_img, [122], [9, 11, 13]])
    ref_pos, ref_delta = hf.model.get_rope_index(
        torch.from_numpy(ids[None]), torch.tensor([list(grid)]), None, None)
    pos, delta = rope_index(cfg, ids, grid)
    np.testing.assert_array_equal(pos, ref_pos.numpy())
    assert delta == int(ref_delta[0, 0])


def test_text_logits_parity(pair):
    """M-RoPE with equal t/h/w positions + qkv biases (text-only path)."""
    hf, cfg, params = pair
    rng = np.random.default_rng(13)
    ids = rng.integers(0, 100, size=(1, 9))
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids)).logits.numpy()
    model = LlamaModel(cfg.text)
    lp = {k: v for k, v in params["language"].items() if k != "embed_tokens"}
    embeds = embed_tokens(params["language"], jnp.asarray(ids))
    logits, _ = model.apply({"params": lp}, embeds, jnp.arange(9)[None],
                            jnp.ones((1, 9), bool))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=3e-4, rtol=1e-3)


def test_multimodal_generate_parity(pair):
    hf, cfg, params = pair
    patches, grid = _patches(cfg, h=16, w=16, seed=14)
    n_img = patches.shape[0] // 4
    ids = np.concatenate([[5, 7], [121], [120] * n_img, [122], [9, 11]])
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.from_numpy(ids[None]),
            pixel_values=torch.from_numpy(patches),
            image_grid_thw=torch.tensor([list(grid)]),
            max_new_tokens=6, do_sample=False, eos_token_id=None,
            pad_token_id=0).numpy()[0, len(ids):]
    toks = generate(params, cfg, ids, patches, grid, max_new_tokens=6)[0]
    np.testing.assert_array_equal(toks, ref)


def test_generate_pad_to_invariance(pair):
    _, cfg, params = pair
    patches, grid = _patches(cfg, h=16, w=16, seed=15)
    n_img = patches.shape[0] // 4
    ids = np.concatenate([[5], [121], [120] * n_img, [122], [9]])
    base = generate(params, cfg, ids, patches, grid, max_new_tokens=4)
    padded = generate(params, cfg, ids, patches, grid, max_new_tokens=4,
                      pad_to=len(ids) + 13)
    np.testing.assert_array_equal(base, padded)


def test_smart_resize_matches_hf():
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
        smart_resize as hf_smart_resize)
    for h, w in ((224, 224), (480, 640), (37, 1000), (1333, 57), (28, 28)):
        assert smart_resize(h, w, 28, 56 * 56, 28 * 28 * 1280) == \
            hf_smart_resize(h, w, 28, 56 * 56, 28 * 28 * 1280)


def test_preprocess_matches_hf_processor(pair):
    """Patch flattening + normalization vs Qwen2VLImageProcessor."""
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
        Qwen2VLImageProcessor)
    _, cfg, _ = pair
    rng = np.random.default_rng(16)
    img = (rng.random((40, 56, 3)) * 255).astype(np.uint8)
    proc = Qwen2VLImageProcessor(
        min_pixels=1, max_pixels=10 ** 9, patch_size=4, temporal_patch_size=2,
        merge_size=2)
    out = proc(images=[img], return_tensors="np")
    patches, grid = preprocess_image(img, cfg.vision, min_pixels=1,
                                     max_pixels=10 ** 9)
    np.testing.assert_array_equal(out["image_grid_thw"][0], list(grid))
    np.testing.assert_allclose(patches, out["pixel_values"], atol=2e-3)


def test_build_vqa_end_to_end(pair):
    _, cfg, params = pair

    def tokenize(text):
        return np.asarray([3 + (abs(hash(t)) % 100)
                           for t in text.split()], np.int64)

    detok = lambda ids: " ".join(f"t{t}" for t in ids)
    vqa = build_vqa(params, cfg, tokenize, detok, max_new_tokens=3,
                    pad_multiple=16, max_pixels=16 * 16)
    img = (np.random.default_rng(17).random((33, 49, 3)) * 255).astype(
        np.uint8)
    out = vqa(img, "Is there a cat?")
    assert isinstance(out, str) and len(out.split()) <= 3


def test_generate_pads_with_vocab_pad_id(pair):
    """Post-EOS slots carry cfg.pad_id (151643-analogue), not token 0 — the
    review-caught leak where '!' (id 0) survived build_vqa's filter."""
    import dataclasses

    _, cfg, params = pair
    patches, grid = _patches(cfg, h=16, w=16, seed=18)
    n_img = patches.shape[0] // 4
    ids = np.concatenate([[5], [121], [120] * n_img, [122], [9]])
    free = generate(params, cfg, ids, patches, grid, max_new_tokens=4)[0]
    eos_forced = dataclasses.replace(cfg, eos_id=int(free[1]), pad_id=99)
    toks = generate(params, eos_forced, ids, patches, grid,
                    max_new_tokens=4)[0]
    assert toks[1] == eos_forced.eos_id
    assert all(t == 99 for t in toks[2:])


def test_rope_index_image_first(pair):
    """Sequence opening directly with the image span (no text prefix)."""
    _, cfg, _ = pair
    grid = (1, 4, 4)
    ids = np.concatenate([[120] * 4, [9, 11]])
    pos, delta = rope_index(cfg, ids, grid)
    assert pos.shape == (3, 1, 6)
    # image block at origin: t/h/w grids start at 0; text continues from max+1
    np.testing.assert_array_equal(pos[:, 0, 0], [0, 0, 0])
    assert pos[:, 0, 4].max() == 2  # max grid pos 1 -> text starts at 2
    np.testing.assert_array_equal(pos[:, 0, 4], [2, 2, 2])
    assert delta == int(pos.max()) + 1 - 6


def test_qwen_chat_threads_history(pair):
    """Turn 2's tail text carries turn 1's Q/A in the chat-template format."""
    _, cfg, params = pair
    texts = []

    def tokenize(text):
        texts.append(text)
        return np.asarray([3 + (abs(hash(t)) % 100)
                           for t in text.split()], np.int64)

    detok = lambda ids: "ans" + str(len(ids))
    vqa = build_vqa(params, cfg, tokenize, detok, max_new_tokens=2,
                    pad_multiple=16, max_pixels=16 * 16)
    img = (np.random.default_rng(26).random((20, 20, 3)) * 255).astype(
        np.uint8)
    a1, a2 = vqa.chat(img, ["what is this?", "Is this a painting? yes or no"])
    tails = [t for t in texts if not t.startswith("<|im_start|>system")]
    assert tails[0].startswith("what is this?<|im_end|>")
    assert (f"what is this?<|im_end|>\n<|im_start|>assistant\n{a1}<|im_end|>"
            in tails[1])
    assert tails[1].endswith("<|im_start|>assistant\n")


def test_qwen_batch_matches_per_image(pair):
    """vqa.batch answers must equal per-image vqa answers exactly — across
    two smart-resize grid groups and a ragged final chunk padded with blank
    patch stacks — and return in input order."""
    _, cfg, params = pair

    def tokenize(text):
        return np.asarray([3 + (abs(hash(t)) % 100)
                           for t in text.split()], np.int64)

    detok = lambda ids: " ".join(f"t{t}" for t in ids)
    vqa = build_vqa(params, cfg, tokenize, detok, max_new_tokens=3,
                    pad_multiple=16, max_pixels=16 * 16)
    rng = np.random.default_rng(31)
    # three share one grid after smart-resize; the 41x23 lands on another
    sizes = [(33, 49), (32, 48), (41, 23), (33, 49)]
    images = [(rng.random((h, w, 3)) * 255).astype(np.uint8)
              for h, w in sizes]
    solo = [vqa(img, "Is there a cat?") for img in images]
    batched = vqa.batch(images, "Is there a cat?", batch_size=2)
    assert batched == solo


def test_qwen_generate_batch_matches_single(pair):
    """generate() on stacked (B, n, pd) patches equals per-sample calls."""
    _, cfg, params = pair
    p1 = _patches(cfg, 16, 24, seed=41)[0]
    p2 = _patches(cfg, 16, 24, seed=42)[0]
    grid = _patches(cfg, 16, 24, seed=41)[1]
    n_img = p1.shape[0] // cfg.vision.spatial_merge_size ** 2
    ids = np.concatenate([[5, 7], [120] * n_img, [9, 11, 13]])
    one = [generate(params, cfg, ids, p, grid, max_new_tokens=3, pad_to=16)
           for p in (p1, p2)]
    both = generate(params, cfg, ids, np.stack([p1, p2]), grid,
                    max_new_tokens=3, pad_to=16)
    np.testing.assert_array_equal(both, np.concatenate(one, axis=0))
