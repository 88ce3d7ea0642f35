"""Golden parity for the native LLaVA judge vs transformers at tiny dims.

Anchors models/llama.py + models/llava.py + weights/port_llava.py against
random-weight torch LlamaForCausalLM / LlavaForConditionalGeneration: logits,
KV-cache greedy decode, image-feature splice, and the end-to-end VQA callable.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
from transformers import LlamaConfig as HFLlamaConfig  # noqa: E402
from transformers import LlamaForCausalLM  # noqa: E402

from diffusion_models_moe_tpu.models.llama import (LlamaModel, embed_tokens,
                                                   greedy_decode,
                                                   tiny_llama_config)
from diffusion_models_moe_tpu.models.llava import (build_vqa, generate,
                                                   image_features,
                                                   prompt_template,
                                                   splice_image,
                                                   tiny_llava_config)
from diffusion_models_moe_tpu.weights.port_llava import (port_llama,
                                                         port_llava_state)

VOCAB = 128


def _hf_llama():
    torch.manual_seed(0)
    hf_cfg = HFLlamaConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False,
        attention_bias=False, mlp_bias=False, rms_norm_eps=1e-5)
    model = LlamaForCausalLM(hf_cfg).eval()
    return model


@pytest.fixture(scope="module")
def llama_pair():
    hf = _hf_llama()
    cfg = tiny_llama_config(vocab_size=VOCAB)
    params = port_llama({k: v.numpy() for k, v in hf.state_dict().items()},
                        cfg)
    return hf, cfg, params


def test_llama_logits_parity(llama_pair):
    hf, cfg, params = llama_pair
    rng = np.random.default_rng(1)
    ids = rng.integers(0, VOCAB, size=(2, 9))
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).logits.numpy()
    model = LlamaModel(cfg)
    lp = {k: v for k, v in params.items() if k != "embed_tokens"}
    embeds = embed_tokens(params, jnp.asarray(ids))
    b, s = ids.shape
    pos = jnp.broadcast_to(jnp.arange(s), (b, s))
    logits, _ = model.apply({"params": lp}, embeds, pos,
                            jnp.ones((b, s), bool))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-4, rtol=1e-3)


def test_llama_greedy_decode_matches_hf_generate(llama_pair):
    hf, cfg, params = llama_pair
    rng = np.random.default_rng(2)
    ids = rng.integers(3, VOCAB, size=(1, 7))
    with torch.no_grad():
        ref = hf.generate(torch.from_numpy(ids), max_new_tokens=8,
                          do_sample=False, eos_token_id=None,
                          pad_token_id=0).numpy()[0, 7:]
    model = LlamaModel(cfg)
    embeds = embed_tokens(params, jnp.asarray(ids))
    toks = greedy_decode(model, params, embeds, jnp.asarray([7]),
                         max_new_tokens=8, eos_id=-1)
    np.testing.assert_array_equal(np.asarray(toks)[0], ref)


def test_llama_right_padded_batch_matches_solo(llama_pair):
    """Co-batched right-padded samples decode exactly as they do alone."""
    _, cfg, params = llama_pair
    rng = np.random.default_rng(3)
    a = rng.integers(3, VOCAB, size=5)
    b = rng.integers(3, VOCAB, size=8)
    model = LlamaModel(cfg)

    def solo(ids):
        embeds = embed_tokens(params, jnp.asarray(ids)[None])
        return np.asarray(greedy_decode(model, params, embeds,
                                        jnp.asarray([len(ids)]),
                                        max_new_tokens=6, eos_id=-1))[0]

    padded = np.zeros((2, 8), np.int64)
    padded[0, :5] = a
    padded[1] = b
    embeds = embed_tokens(params, jnp.asarray(padded))
    both = np.asarray(greedy_decode(model, params, embeds,
                                    jnp.asarray([5, 8]),
                                    max_new_tokens=6, eos_id=-1))
    np.testing.assert_array_equal(both[0], solo(a))
    np.testing.assert_array_equal(both[1], solo(b))


def test_llama_eos_emits_pad_after(llama_pair):
    """Whatever the model's first greedy token is, forcing it as EOS pads the
    rest of the emitted sequence."""
    _, cfg, params = llama_pair
    rng = np.random.default_rng(4)
    ids = rng.integers(3, VOCAB, size=(1, 6))
    model = LlamaModel(cfg)
    embeds = embed_tokens(params, jnp.asarray(ids))
    free = np.asarray(greedy_decode(model, params, embeds, jnp.asarray([6]),
                                    max_new_tokens=5, eos_id=-1))[0]
    eos = int(free[1])
    toks = np.asarray(greedy_decode(model, params, embeds, jnp.asarray([6]),
                                    max_new_tokens=5, eos_id=eos))[0]
    assert toks[1] == eos
    assert all(t == 0 for t in toks[2:])


# --------------------------------------------------------------------- LLaVA

def _hf_llava():
    from transformers import CLIPVisionConfig as HFVisionConfig
    from transformers import LlavaConfig as HFLlavaConfig
    from transformers import LlavaForConditionalGeneration
    torch.manual_seed(5)
    vc = HFVisionConfig(image_size=32, patch_size=8, hidden_size=32,
                        intermediate_size=64, num_hidden_layers=2,
                        num_attention_heads=4, projection_dim=16)
    tc = HFLlamaConfig(vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
                       num_hidden_layers=2, num_attention_heads=4,
                       num_key_value_heads=2, max_position_embeddings=128,
                       tie_word_embeddings=False, attention_bias=False,
                       rms_norm_eps=1e-5)
    cfg = HFLlavaConfig(vision_config=vc, text_config=tc,
                        image_token_index=120, vision_feature_layer=-2,
                        vision_feature_select_strategy="default")
    return LlavaForConditionalGeneration(cfg).eval()


@pytest.fixture(scope="module")
def llava_pair():
    hf = _hf_llava()
    cfg = tiny_llava_config()
    params = port_llava_state(
        {k: v.numpy() for k, v in hf.state_dict().items()}, cfg)
    return hf, cfg, params


def test_llava_image_features_parity(llava_pair):
    hf, cfg, params = llava_pair
    rng = np.random.default_rng(6)
    img = rng.random((1, 32, 32, 3), np.float32)
    ours = np.asarray(image_features(params, cfg, jnp.asarray(img)))
    # torch wants normalized CHW; our tower normalizes inside, so mirror it
    from diffusion_models_moe_tpu.models.clip_vision import (CLIP_IMAGE_MEAN,
                                                             CLIP_IMAGE_STD)
    chw = (img - np.asarray(CLIP_IMAGE_MEAN)) / np.asarray(CLIP_IMAGE_STD)
    chw = torch.from_numpy(chw.transpose(0, 3, 1, 2)).float()
    with torch.no_grad():
        ref = hf.get_image_features(pixel_values=chw)
        if isinstance(ref, (list, tuple)):  # transformers >= 4.49 list API
            ref = ref[0]
        ref = ref.numpy()
    np.testing.assert_allclose(ours, ref.reshape(ours.shape), atol=2e-4,
                               rtol=1e-3)


def test_llava_generate_parity(llava_pair):
    hf, cfg, params = llava_pair
    rng = np.random.default_rng(7)
    img = rng.random((1, 32, 32, 3), np.float32)
    n_img = cfg.num_image_tokens
    # HF expects the image token pre-expanded to num_patches copies
    pre = [1, 3, 7]
    post = [9, 11]
    hf_ids = np.asarray([pre + [120] * n_img + post])
    from diffusion_models_moe_tpu.models.clip_vision import (CLIP_IMAGE_MEAN,
                                                             CLIP_IMAGE_STD)
    chw = (img - np.asarray(CLIP_IMAGE_MEAN)) / np.asarray(CLIP_IMAGE_STD)
    chw = torch.from_numpy(chw.transpose(0, 3, 1, 2)).float()
    with torch.no_grad():
        ref = hf.generate(input_ids=torch.from_numpy(hf_ids),
                          pixel_values=chw, max_new_tokens=6,
                          do_sample=False, eos_token_id=None,
                          pad_token_id=0).numpy()[0, hf_ids.shape[1]:]
    ours_ids = np.asarray(pre + [120] + post)
    toks = generate(params, cfg, ours_ids, jnp.asarray(img),
                    max_new_tokens=6)[0]
    np.testing.assert_array_equal(toks, ref)


def test_llava_generate_pad_to_invariance(llava_pair):
    """Bucketed prompt padding must not change the generation."""
    _, cfg, params = llava_pair
    rng = np.random.default_rng(8)
    img = rng.random((1, 32, 32, 3), np.float32)
    ids = np.asarray([1, 3, 120, 9])
    base = generate(params, cfg, ids, jnp.asarray(img), max_new_tokens=5)
    padded = generate(params, cfg, ids, jnp.asarray(img), max_new_tokens=5,
                      pad_to=48)
    np.testing.assert_array_equal(base, padded)


def test_splice_image_shape(llava_pair):
    _, cfg, params = llava_pair
    feats = jnp.zeros((1, cfg.num_image_tokens, cfg.text.hidden_size))
    embeds, length = splice_image(params, cfg, np.asarray([1, 120, 5]), feats)
    assert length == 2 + cfg.num_image_tokens
    assert embeds.shape == (1, length, cfg.text.hidden_size)
    with pytest.raises(ValueError):
        splice_image(params, cfg, np.asarray([1, 5]), feats)


def test_build_vqa_end_to_end(llava_pair):
    """The judge callable runs tokenize -> splice -> decode -> detokenize."""
    _, cfg, params = llava_pair
    words = {}

    def tokenize(text):
        assert "<image>" in text  # prompt_template applied
        ids = [1]
        for tok in text.replace("<image>", " \x00 ").split():
            ids.append(120 if tok == "\x00"
                       else 3 + (hash(tok) % (VOCAB - 10)))
        return np.asarray(ids)

    def detokenize(ids):
        return " ".join(f"t{t}" for t in ids)

    vqa = build_vqa(params, cfg, tokenize, detokenize, max_new_tokens=4,
                    pad_multiple=16)
    img = (np.random.default_rng(9).random((24, 40, 3)) * 255).astype(
        np.uint8)
    out = vqa(img, "Is there a dog? Answer yes or no.")
    assert isinstance(out, str) and len(out.split()) <= 4


def test_prompt_template():
    assert prompt_template("Q?") == "USER: <image>\nQ? ASSISTANT:"


def test_llama_tp_sharded_decode_parity(llama_pair):
    """Megatron-style tp sharding of the judge LM produces the exact same
    greedy tokens as the unsharded run (8-virtual-device CPU mesh)."""
    from diffusion_models_moe_tpu.parallel.mesh import (create_mesh,
                                                        llama_param_shardings,
                                                        replicated)
    _, cfg, params = llama_pair
    mesh = create_mesh(8, dp=4, tp=2)  # kv_heads=2 -> tp=2
    rng = np.random.default_rng(21)
    ids = rng.integers(3, VOCAB, size=(1, 7))
    model = LlamaModel(cfg)
    embeds = embed_tokens(params, jnp.asarray(ids))
    base = np.asarray(greedy_decode(model, params, embeds, jnp.asarray([7]),
                                    max_new_tokens=6, eos_id=-1))

    sharded_params = jax.device_put(params,
                                    llama_param_shardings(params, mesh))
    fn = jax.jit(lambda p, e, l: greedy_decode(model, p, e, l,
                                               max_new_tokens=6, eos_id=-1))
    with mesh:
        toks = fn(sharded_params,
                  jax.device_put(embeds, replicated(mesh)),
                  jax.device_put(jnp.asarray([7]), replicated(mesh)))
    np.testing.assert_array_equal(np.asarray(toks), base)


def test_llama_int8_decode_smoke(llama_pair):
    """quant_int8 judge LM decodes deterministically with the same params
    pytree (W8A8 on projections; outputs may differ from fp32)."""
    import dataclasses

    _, cfg, params = llama_pair
    qcfg = dataclasses.replace(cfg, quant_int8=True)
    rng = np.random.default_rng(22)
    ids = rng.integers(3, VOCAB, size=(1, 7))
    model = LlamaModel(qcfg)
    embeds = embed_tokens(params, jnp.asarray(ids))
    a = np.asarray(greedy_decode(model, params, embeds, jnp.asarray([7]),
                                 max_new_tokens=5, eos_id=-1))
    b = np.asarray(greedy_decode(model, params, embeds, jnp.asarray([7]),
                                 max_new_tokens=5, eos_id=-1))
    np.testing.assert_array_equal(a, b)
    assert a.shape == (1, 5) and (a >= 0).all() and (a < VOCAB).all()


def test_lm_head_sharding_rule_matches_top_level_path():
    """Review-caught: 'lm_head/kernel' is a TOP-level path in the LM tree;
    the tp rule must match it (it silently replicated 2.2GB before)."""
    from jax.sharding import PartitionSpec as P

    from diffusion_models_moe_tpu.parallel.mesh import (create_mesh,
                                                        llama_param_shardings)
    mesh = create_mesh(8, dp=4, tp=2)
    tree = {"lm_head": {"kernel": np.zeros((4, 8), np.float32)},
            "embed_tokens": np.zeros((8, 4), np.float32)}
    sh = llama_param_shardings(tree, mesh)
    assert sh["lm_head"]["kernel"].spec == P(None, "tp")
    assert sh["embed_tokens"].spec == P()


def test_vision_feature_layer_nonneg_matches_hf_hidden_states(llava_pair):
    """feature_layer=k (k>=0) must equal HF hidden_states[k] (k blocks run)."""
    from diffusion_models_moe_tpu.models.clip_vision import (
        CLIP_IMAGE_MEAN, CLIP_IMAGE_STD, CLIPVisionEncoder)
    hf, cfg, params = llava_pair
    rng = np.random.default_rng(23)
    img = rng.random((1, 32, 32, 3), np.float32)
    chw = (img - np.asarray(CLIP_IMAGE_MEAN)) / np.asarray(CLIP_IMAGE_STD)
    chw = torch.from_numpy(chw.transpose(0, 3, 1, 2)).float()
    tower = hf.model.vision_tower if hasattr(hf.model, "vision_tower") \
        else hf.vision_tower
    with torch.no_grad():
        hs = tower(chw, output_hidden_states=True).hidden_states
    enc = CLIPVisionEncoder(cfg.vision)
    for k in (0, 1, 2):
        ours = enc.apply({"params": params["vision"]}, jnp.asarray(img),
                         feature_layer=k)
        np.testing.assert_allclose(np.asarray(ours), hs[k].numpy(),
                                   atol=2e-4, rtol=1e-3,
                                   err_msg=f"feature_layer={k}")


def test_preprocess_nonsquare_matches_hf_clip_processor():
    """Review-caught: long-side rounding must int-truncate like HF."""
    from transformers import CLIPImageProcessor

    from diffusion_models_moe_tpu.models.llava import preprocess_image
    proc = CLIPImageProcessor(size={"shortest_edge": 32},
                              crop_size={"height": 32, "width": 32},
                              do_normalize=False, do_convert_rgb=True)
    rng = np.random.default_rng(24)
    for shape in ((33, 50), (50, 33), (41, 37)):
        img = (rng.random(shape + (3,)) * 255).astype(np.uint8)
        ref = proc(images=[img], return_tensors="np")["pixel_values"][0]
        ours = preprocess_image(img, 32).transpose(2, 0, 1)
        np.testing.assert_allclose(ours, ref, atol=2e-2,
                                   err_msg=str(shape))


def test_llava_chat_threads_history(llava_pair):
    """Multi-turn chat: turn 2's prompt carries turn 1's Q and A in the
    vicuna format, image only in the first user turn."""
    _, cfg, params = llava_pair
    prompts = []

    def tokenize(text):
        prompts.append(text)
        ids = [1]
        for tok in text.replace("<image>", " \x00 ").split():
            ids.append(120 if tok == "\x00" else 3 + (abs(hash(tok)) % 118))
        return np.asarray(ids)

    detok = lambda ids: "ans" + str(len(ids))
    vqa = build_vqa(params, cfg, tokenize, detok, max_new_tokens=2,
                    pad_multiple=16)
    img = (np.random.default_rng(25).random((24, 24, 3)) * 255).astype(
        np.uint8)
    a1, a2 = vqa.chat(img, ["what is this?", "Frame the location of the cat"])
    assert prompts[0] == "USER: <image>\nwhat is this? ASSISTANT:"
    assert prompts[1] == (f"USER: <image>\nwhat is this? ASSISTANT: {a1}</s>"
                          "USER: Frame the location of the cat ASSISTANT:")
    assert prompts[1].count("<image>") == 1
    assert isinstance(a2, str)


def test_make_chat_grounder_uses_second_turn():
    from diffusion_models_moe_tpu.analysis.bounding_boxes import (
        make_chat_grounder, parse_box)
    calls = []

    def fake_vqa(image, question):
        raise AssertionError("single-turn path should not run")

    def fake_chat(image, questions):
        calls.append(list(questions))
        return ["it is a dog", "(100,200),(300,400)"]

    fake_vqa.chat = fake_chat
    ground = make_chat_grounder(fake_vqa)
    reply = ground("img", "Frame the location of the dog")
    assert parse_box(reply) == (50, 100, 150, 200)
    assert calls == [["what is this?", "Frame the location of the dog"]]


def test_llava_batch_matches_per_image(llava_pair):
    """vqa.batch answers (incl. a ragged final chunk padded with blank
    images) must equal per-image vqa answers exactly."""
    _, cfg, params = llava_pair

    def tokenize(text):
        ids = [1]
        for tok in text.replace("<image>", " \x00 ").split():
            ids.append(120 if tok == "\x00" else 3 + (abs(hash(tok)) % 118))
        return np.asarray(ids)

    detok = lambda ids: " ".join(f"t{t}" for t in ids)
    vqa = build_vqa(params, cfg, tokenize, detok, max_new_tokens=3,
                    pad_multiple=16)
    rng = np.random.default_rng(27)
    images = [(rng.random((20 + 3 * i, 24, 3)) * 255).astype(np.uint8)
              for i in range(3)]
    solo = [vqa(img, "Is there a dog?") for img in images]
    batched = vqa.batch(images, "Is there a dog?", batch_size=2)
    assert batched == solo


def test_vqa_presence_score_uses_batch(llava_pair):
    from diffusion_models_moe_tpu.benchmarks.vqa import vqa_presence_score
    calls = {"batch": 0, "single": 0}

    def single(img, q):
        calls["single"] += 1
        return "yes"

    def fake_batch(images, q, **kw):
        calls["batch"] += 1
        return ["yes", "no", "maybe"]

    single.batch = fake_batch
    out = vqa_presence_score(single, [1, 2, 3], "q?")
    assert calls == {"batch": 1, "single": 0}
    assert out == {"yes_frac": 0.5, "n": 2, "unparsed": 1}
