"""Tests: unified editing routing, dir scoring, object erasure protocol."""
import os

import numpy as np
import pytest

from diffusion_models_moe_tpu.benchmarks.clip_metrics import (
    ConceptChecker, MemorizedPromptChecker)
from diffusion_models_moe_tpu.benchmarks.object_erase import (
    erase_keep_prompts, make_clip_zero_shot_classifier,
    object_erasure_scores, topk_accuracy)
from diffusion_models_moe_tpu.benchmarks.scores import (
    clip_perceptual_distance, fid_between_dirs, list_image_pairs,
    perceptual_between_dirs)
from diffusion_models_moe_tpu.benchmarks.unified_editing import ConceptBank


def test_concept_bank_routing():
    bank = ConceptBank(
        checkers={
            "vangogh": ConceptChecker("vangogh", np.array([1.0, 0.0]),
                                      np.array([0.0, 1.0]), margin=0.1),
            "mem": MemorizedPromptChecker(["secret caption"]),
        },
        masks={"vangogh": {0: np.ones((2, 3), bool)},
               "mem": {1: np.ones((2, 3), bool)}},
    )
    embs = np.array([[0.9, 0.1], [0.1, 0.9], [0.95, 0.0]])
    prompts = ["starry night", "secret caption", "sunflowers"]
    routes = bank.route(embs, prompts)
    assert routes[0] == ("vangogh",)
    assert routes[1] == ("mem",)
    assert routes[2] == ("vangogh",)


def test_dir_scoring(tmp_path):
    from PIL import Image
    rng = np.random.RandomState(0)
    a = tmp_path / "a"; a.mkdir()
    for i in range(4):
        img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(a / f"sd_{i}.png")
        Image.fromarray(255 - img).save(a / f"removed_{i}.png")
    pairs = list_image_pairs(str(a), str(a))
    assert len(pairs) == 4

    def fake_featurize(images):
        x = np.asarray(images).reshape(len(images), -1)
        return x[:, :8]

    fid = fid_between_dirs(str(a), str(a), fake_featurize, batch=2)
    assert fid > 0  # inverted images differ
    dist = clip_perceptual_distance(fake_featurize)
    res = perceptual_between_dirs(str(a), str(a), dist, batch=2)
    assert res["n"] == 4 and np.isfinite(res["mean"])


def test_object_erasure_protocol():
    erase, keep, keep_labels = erase_keep_prompts("church", per_class=2)
    assert len(erase) == 2 and len(keep) == 18
    assert all("church" not in p for p in keep)

    # fake CLIP: image embedding == one-hot of its true class
    class_embs = np.eye(10)

    def image_encode(images):
        return np.asarray(images)  # tests pass one-hot "images" directly

    clf = make_clip_zero_shot_classifier(image_encode, class_embs)
    erased_imgs = np.eye(10)[[1] * 4]     # erased model now makes class 1
    keep_imgs = np.eye(10)[[2, 3, 4]]
    scores = object_erasure_scores(clf, erased_imgs, keep_imgs,
                                   target_idx=4, keep_labels=[2, 3, 4])
    assert scores["erase_top1"] == 0.0        # target class gone
    assert scores["keep_top1"] == 1.0
    assert topk_accuracy(np.eye(3), [0, 1, 2], 1) == 1.0


def test_word_match_accuracy_reference_semantics():
    """The reference's word-overlap top-5 metric, quirks included
    (reference: benchmarks/object_erase.py:248-295)."""
    from diffusion_models_moe_tpu.benchmarks.object_erase import (
        erasure_word_match_protocol, word_match_accuracy)

    cats = ["French horn", "tench", "golf ball", "pickup truck", "abacus"]

    def logits_for(order):
        # logits ranking exactly `order` first
        out = np.zeros((1, len(cats)))
        for rank, idx in enumerate(order):
            out[0, idx] = len(cats) - rank
        return out

    # multi-word label matches on the shared word despite case mismatch:
    # pred "French horn" vs label "french horn" — "French" misses (case) but
    # "horn" hits.
    assert word_match_accuracy(logits_for([0]), cats, ["french horn"], k=1) == 1.0
    # case-sensitive prediction words: pred "French horn" vs label "french"
    # has no matching word ("French" != "french", "horn" not in ["french"]).
    assert word_match_accuracy(logits_for([0]), cats, ["french"], k=1) == 0.0
    # any of the top-k predictions may match
    assert word_match_accuracy(logits_for([1, 2]), cats, ["golf ball"], k=2) == 1.0
    assert word_match_accuracy(logits_for([1, 2]), cats, ["golf ball"], k=1) == 0.0
    # partial word containment does NOT count (whole-word membership)
    assert word_match_accuracy(logits_for([4]), cats, ["abacuses"], k=1) == 0.0
    # mean over images
    acc = word_match_accuracy(np.concatenate([logits_for([2]),
                                              logits_for([3])]),
                              cats, ["golf ball", "tench"], k=1)
    assert acc == 0.5
    res = erasure_word_match_protocol(lambda im: logits_for([2]),
                                      np.zeros((1, 2, 2, 3)),
                                      ["golf ball"], cats, k=1)
    assert res == {"acc": 1.0}


def test_eval_runner_resume_by_skip(tmp_path):
    """Batched eval generation with crash-restartable resume
    (reference: benchmarks/eval_coco.py:252-254)."""
    import jax
    from diffusion_models_moe_tpu import StableDiffusionPipeline, tiny_config
    from diffusion_models_moe_tpu.benchmarks.runner import (EvalRunConfig,
                                                            run_eval)
    pipe = StableDiffusionPipeline(tiny_config())
    params = pipe.init_params(jax.random.PRNGKey(0))
    tc = pipe.config.text_encoder

    def tokenize(texts):
        rng = np.random.RandomState(abs(hash(tuple(texts))) % (2 ** 31))
        return rng.randint(0, tc.vocab_size,
                           (len(texts), tc.max_length)).astype(np.int32)

    cfg = EvalRunConfig(out_dir=str(tmp_path), batch_size=2, num_steps=2)
    prompts = ["a cat", "a dog", "a bird"]   # 3 prompts, batch 2 -> padding path
    s1 = run_eval(pipe, params, tokenize, prompts, cfg)
    assert s1["generated"] == 3 and s1["skipped"] == 0
    import os
    files = sorted(os.listdir(tmp_path))
    assert "sd_0.png" in files and "removed_2.png" in files
    # second run skips everything
    s2 = run_eval(pipe, params, tokenize, prompts, cfg)
    assert s2["skipped"] == 3 and s2["generated"] == 0


def test_text_metrics():
    from diffusion_models_moe_tpu.benchmarks.text_metrics import (
        corpus_scores, rouge_l, sentence_bleu)
    assert sentence_bleu("a cat on a mat", "a cat on a mat") == pytest.approx(1.0)
    assert sentence_bleu("a cat on a mat", "dog") == 0.0
    partial = sentence_bleu("a cat sat on the mat", "a cat sat on a rug")
    assert 0.0 < partial < 1.0
    assert rouge_l("the cat sat", "the cat sat") == pytest.approx(1.0)
    assert rouge_l("the cat sat", "sat cat the") < 1.0
    s = corpus_scores(["a b c", "x y"], ["a b c", "x z"])
    assert s["n"] == 2 and 0 < s["rouge_l"] <= 1


def test_vqa_multiple_choice_protocol():
    """Scripted fake judge reproduces the reference LLAVAScorer scoring
    (reference: mod_utils.py:195-290 — multiple-choice object identification +
    numeric style question, 'answer the number only')."""
    from diffusion_models_moe_tpu.benchmarks.vqa import (
        MultipleChoiceScorer, concept_style_question,
        multiple_choice_object_question, parse_choice_index)

    objects = ["cat", "dog", "church"]
    q = multiple_choice_object_question(objects)
    assert "(1)cat (2)dog (3)church" in q and "number only" in q
    sq = concept_style_question("Van Gogh")
    assert "(1)photo (2)Van Gogh" in sq
    assert "<object>" in concept_style_question("under a tree")
    assert parse_choice_index("2", 3) == 1
    assert parse_choice_index(" The answer is 3.", 3) == 2
    assert parse_choice_index("7", 3) is None
    assert parse_choice_index("maybe", 3) is None

    # scripted judge: before removal answers correctly + says "in style";
    # after removal picks option 1 ("photo") and misidentifies objects
    def judge(image, question):
        before = image["before"]
        if "main object" in question:
            return str(objects.index(image["gt"]) + 1) if before else "1"
        return "2" if before else "1"

    sc = MultipleChoiceScorer(judge, objects, "Van Gogh")
    for i, o in enumerate(objects):
        sc.object_score({"before": True, "gt": o}, i, before=True)
        sc.style_score({"before": True, "gt": o}, i, label=2, before=True)
        sc.object_score({"before": False, "gt": o}, i, before=False)
        sc.style_score({"before": False, "gt": o}, i, label=2, before=False)
    r = sc.get_results()
    assert r["before_removal"]["object_score"] == 1.0
    assert r["before_removal"]["style_score"] == 1.0
    # after removal only 'cat' (option 1) is re-identified correctly
    assert r["after_removal"]["object_score"] == 1.0 / 3
    assert r["after_removal"]["style_score"] == 0.0
    assert r["after_removal"]["style_failures"] == [
        ("cat", 1), ("dog", 1), ("church", 1)]


def test_vqa_unparseable_answers_counted():
    from diffusion_models_moe_tpu.benchmarks.vqa import MultipleChoiceScorer
    sc = MultipleChoiceScorer(lambda img, q: "no idea", ["cat"], "gender")
    assert sc.object_score(None, 0) == 0
    assert sc.style_score(None, 0, label=2) == 0
    r = sc.get_results()
    assert r["before_removal"]["unparsed"] == 2


def test_baseline_registry_and_dispatch():
    """Baseline registry covers the reference's comparison set; SLD dispatch
    requires safety ids; generate dispatch runs on the tiny model
    (reference: eval_coco.py:70-101, i2p_eval.py:134-194)."""
    import jax
    import jax.numpy as jnp
    import pytest

    from diffusion_models_moe_tpu import StableDiffusionPipeline, tiny_config
    from diffusion_models_moe_tpu.benchmarks.baselines import (
        BASELINES, baseline_generate)

    for name in ("uce", "esd", "concept-ablation", "forget-me-not",
                 "selective-amnesia", "sld", "sd2", "sd2.1",
                 "union-timesteps"):
        assert name in BASELINES
    assert BASELINES["sd2.1"].v_prediction
    # the reference's SD2 comparison model is the 768 v-prediction pipeline
    # (utils.py:91-95); the epsilon 512 variant is the separate sd2-base row
    assert BASELINES["sd2"].v_prediction
    assert not BASELINES["sd2-base"].v_prediction

    pipe = StableDiffusionPipeline(tiny_config())
    params = pipe.init_params(jax.random.PRNGKey(0))
    tc = pipe.config.text_encoder
    cond = jax.random.randint(jax.random.PRNGKey(1), (1, tc.max_length), 0,
                              tc.vocab_size)
    uncond = jnp.zeros_like(cond)
    img, _ = baseline_generate(pipe, params, cond, uncond,
                               jax.random.PRNGKey(2), {}, num_steps=2,
                               decode=False)
    assert np.all(np.isfinite(np.asarray(img)))
    with pytest.raises(ValueError):
        baseline_generate(pipe, params, cond, uncond, jax.random.PRNGKey(2),
                          {"use_sld": True}, num_steps=2)
    img2, _ = baseline_generate(pipe, params, cond, uncond,
                                jax.random.PRNGKey(2), {"use_sld": True},
                                safety_ids=cond, num_steps=2, decode=False)
    assert np.all(np.isfinite(np.asarray(img2)))


def test_run_eval_per_prompt_seeds(tmp_path):
    """Each prompt gets ITS OWN evaluation seed inside a batch (the reference
    CSV's evaluation_seed column) — regression for the bug where only the
    batch's first seed was used. Prompt 1's image with seeds [7, 3] must equal
    prompt 0's image from a run where 3 is the first seed."""
    import jax
    from PIL import Image
    from diffusion_models_moe_tpu import StableDiffusionPipeline, tiny_config
    from diffusion_models_moe_tpu.benchmarks.runner import (EvalRunConfig,
                                                            run_eval)
    pipe = StableDiffusionPipeline(tiny_config())
    params = pipe.init_params(jax.random.PRNGKey(0))
    tc = pipe.config.text_encoder

    def tokenize(texts):
        # constant prompt encoding: images then differ only through the seed
        return np.full((len(texts), tc.max_length), 5, np.int32)

    a = tmp_path / "a"
    run_eval(pipe, params, tokenize, ["p", "q"],
             EvalRunConfig(out_dir=str(a), batch_size=2, num_steps=2,
                           save_baseline=False, per_prompt_seeds=[7, 3]))
    b = tmp_path / "b"
    run_eval(pipe, params, tokenize, ["p", "q"],
             EvalRunConfig(out_dir=str(b), batch_size=2, num_steps=2,
                           save_baseline=False, per_prompt_seeds=[3, 11]))
    img_a1 = np.asarray(Image.open(a / "removed_1.png"))
    img_b0 = np.asarray(Image.open(b / "removed_0.png"))
    img_a0 = np.asarray(Image.open(a / "removed_0.png"))
    np.testing.assert_array_equal(img_a1, img_b0)   # seed 3 == seed 3
    assert (img_a0 != img_a1).any()                 # seed 7 != seed 3


def test_run_eval_backfills_baselines(tmp_path):
    """A rerun with save_baseline=True after a no-baseline run must generate
    the missing sd_*.png instead of skipping every batch."""
    import jax
    from diffusion_models_moe_tpu import StableDiffusionPipeline, tiny_config
    from diffusion_models_moe_tpu.benchmarks.runner import (EvalRunConfig,
                                                            run_eval)
    pipe = StableDiffusionPipeline(tiny_config())
    params = pipe.init_params(jax.random.PRNGKey(0))
    tc = pipe.config.text_encoder

    def tokenize(texts):
        return np.full((len(texts), tc.max_length), 5, np.int32)

    cfg0 = EvalRunConfig(out_dir=str(tmp_path), batch_size=2, num_steps=2,
                         save_baseline=False)
    run_eval(pipe, params, tokenize, ["p", "q"], cfg0)
    assert not any(f.startswith("sd_") for f in os.listdir(tmp_path))
    cfg1 = EvalRunConfig(out_dir=str(tmp_path), batch_size=2, num_steps=2,
                         save_baseline=True)
    s = run_eval(pipe, params, tokenize, ["p", "q"], cfg1)
    assert s["generated"] == 2
    assert any(f.startswith("sd_") for f in os.listdir(tmp_path))


def test_run_eval_with_sld_baseline_generate_fn(tmp_path):
    """run_eval's generate_fn hook: the SLD-baseline adapter drives the full
    eval loop (reference: i2p_eval.py SLD rows through the same driver)."""
    import jax
    import numpy as np

    from diffusion_models_moe_tpu import StableDiffusionPipeline, tiny_config
    from diffusion_models_moe_tpu.benchmarks.baselines import (
        make_protocol_generate)
    from diffusion_models_moe_tpu.benchmarks.runner import (EvalRunConfig,
                                                            run_eval)

    pipe = StableDiffusionPipeline(tiny_config())
    params = pipe.init_params(jax.random.PRNGKey(0))
    vocab = pipe.config.text_encoder.vocab_size
    maxlen = pipe.config.text_encoder.max_length

    def tokenize(texts):
        return np.asarray([[min(len(t) + j, vocab - 1)
                            for j in range(maxlen)] for t in texts], np.int32)

    gen = make_protocol_generate(pipe, {"use_sld": True}, tokenize)
    assert gen is not None
    assert make_protocol_generate(pipe, {}, tokenize) is None

    cfg = EvalRunConfig(out_dir=str(tmp_path), batch_size=2, num_steps=2,
                        save_baseline=False)
    out = run_eval(pipe, params, tokenize, ["a dog", "a cat"], cfg,
                   generate_fn=gen)
    assert out["generated"] == 2
    import os
    assert os.path.exists(tmp_path / "removed_0.png")

    # the adapter refuses modes SLD can't honor instead of ignoring them
    import pytest as _pytest
    with _pytest.raises(ValueError):
        gen(params, tokenize(["x"]), tokenize([""]), jax.random.PRNGKey(0),
            ivs=object())


def test_vqa_score_images_batch_matches_per_image():
    """score_images with a .batch judge gives the same results dict as the
    per-image loop (style questions grouped by text; 'under a tree'
    substitutes <object> per prompt so each image gets its own group)."""
    from diffusion_models_moe_tpu.benchmarks.vqa import MultipleChoiceScorer

    objects = ["cat", "dog", "church"]

    def answer(image, question):
        if "main object" in question:
            return str(objects.index(image["gt"]) + 1)
        # 'under a tree' numeric question: image says whether it is
        return "2" if image["tree"] else "1"

    def solo_judge(image, question):
        return answer(image, question)

    calls = {"batch": 0, "single": 0}

    def batch_judge(image, question):
        calls["single"] += 1
        return answer(image, question)

    def batch_fn(images, question, **kw):
        calls["batch"] += 1
        return [answer(img, question) for img in images]

    batch_judge.batch = batch_fn

    images = [{"gt": "cat", "tree": True}, {"gt": "dog", "tree": False},
              {"gt": "church", "tree": True}]
    ref = MultipleChoiceScorer(solo_judge, objects, "under a tree")
    for i, img in enumerate(images):
        ref.object_score(img, i, before=True)
        ref.style_score(img, i, label=2, before=True)

    sc = MultipleChoiceScorer(batch_judge, objects, "under a tree")
    sc.score_images(images, label=2, before=True)
    # 1 object pass + 3 distinct style questions, zero per-image calls
    assert calls == {"batch": 4, "single": 0}
    a = ref.get_results()["before_removal"]
    b = sc.get_results()["before_removal"]
    assert a["object_score"] == b["object_score"] == 1.0
    assert a["style_score"] == b["style_score"] == 2.0 / 3
    assert a["unparsed"] == b["unparsed"] == 0
    assert sorted(map(tuple, a["object_failures"])) == \
        sorted(map(tuple, b["object_failures"]))
    assert sorted(map(tuple, a["style_failures"])) == \
        sorted(map(tuple, b["style_failures"]))


def test_vqa_score_images_plain_judge_loops():
    """Without .batch, score_images falls back to the per-image methods."""
    from diffusion_models_moe_tpu.benchmarks.vqa import MultipleChoiceScorer
    seen = []

    def judge(image, question):
        seen.append((image, question.split()[0]))
        return "1"

    sc = MultipleChoiceScorer(judge, ["cat", "dog"], "gender")
    sc.score_images(["a", "b"], label=1, before=False)
    assert len(seen) == 4  # 2 object + 2 style calls
    r = sc.get_results()["after_removal"]
    assert r["object_score"] == 0.5  # 'cat' re-identified, 'dog' not
    assert r["style_score"] == 1.0   # label 1 expected, judge says 1


def _tiny_snapshot(root):
    """Complete diffusers-layout snapshot at tiny_config dims (unet + vae +
    transformers-layout text_encoder) — the fixture every baseline loader
    path runs against in CI."""
    import jax
    import jax.numpy as jnp
    import torch
    from safetensors.numpy import save_file
    from transformers import CLIPTextConfig as HFCLIPConfig
    from transformers import CLIPTextModel

    from diffusion_models_moe_tpu import tiny_config
    from diffusion_models_moe_tpu.models.unet import UNet2DCondition
    from diffusion_models_moe_tpu.models.vae import VAEDecoder, VAEEncoder
    from diffusion_models_moe_tpu.weights.export import (export_unet,
                                                         export_vae_decoder,
                                                         export_vae_encoder)

    cfg = tiny_config()
    for sub in ("unet", "vae", "text_encoder", "tokenizer"):
        (root / sub).mkdir(parents=True)
    uparams = UNet2DCondition(cfg.unet).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 8, cfg.unet.cross_attention_dim)))["params"]
    unet_sd = export_unet(uparams, cfg.unet)
    save_file(unet_sd,
              str(root / "unet" / "diffusion_pytorch_model.safetensors"))
    vdec = VAEDecoder(cfg.vae).init(jax.random.PRNGKey(1),
                                    jnp.zeros((1, 4, 4, 4)))["params"]
    venc = VAEEncoder(cfg.vae).init(jax.random.PRNGKey(2),
                                    jnp.zeros((1, 32, 32, 3)))["params"]
    save_file({**export_vae_decoder(vdec, cfg.vae),
               **export_vae_encoder(venc, cfg.vae)},
              str(root / "vae" / "diffusion_pytorch_model.safetensors"))
    tc = cfg.text_encoder
    torch.manual_seed(0)
    model = CLIPTextModel(HFCLIPConfig(
        vocab_size=tc.vocab_size, hidden_size=tc.hidden_size,
        intermediate_size=tc.intermediate_size, num_hidden_layers=tc.num_layers,
        num_attention_heads=tc.num_heads, max_position_embeddings=tc.max_length,
        hidden_act="quick_gelu", attention_dropout=0.0)).eval()
    save_file({k: v.detach().numpy() for k, v in model.state_dict().items()},
              str(root / "text_encoder" / "model.safetensors"))
    (root / "tokenizer" / "vocab.json").write_text("{}")
    return cfg, unet_sd


def test_load_baseline_edited_unet_and_delta(tmp_path):
    """load_baseline with an edited-UNet file must swap in the file's weights
    (UCE/ESD format, reference eval_coco.py:96-101); a delta.bin must overlay
    only its keys (Concept-Ablation, i2p_eval.py:142-152)."""
    import jax
    import numpy as np
    import pytest
    import torch

    from diffusion_models_moe_tpu.benchmarks.baselines import load_baseline

    cfg, unet_sd = _tiny_snapshot(tmp_path)

    # edited UNet: every tensor shifted by +1 so the swap is observable
    edited = {k: np.asarray(v) + 1.0 for k, v in unet_sd.items()}
    pt = tmp_path / "erased-van gogh-method_replace.pt"
    torch.save({k: torch.from_numpy(v.copy()) for k, v in edited.items()},
               str(pt))
    pipe, params, kw = load_baseline("uce", str(tmp_path),
                                     edited_unet=str(pt), config=cfg)
    assert kw == {}
    got = np.asarray(params["unet"]["conv_in"]["bias"])
    np.testing.assert_array_equal(got, np.asarray(unet_sd["conv_in.bias"]) + 1)

    # delta.bin: only the edited key changes
    k_edit = "conv_out.bias"
    torch.save({"unet": {k_edit: torch.from_numpy(
        np.asarray(unet_sd[k_edit]).copy() + 5.0)}},
        str(tmp_path / "delta.bin"))
    _, params_d, _ = load_baseline("concept-ablation", str(tmp_path),
                                   delta=str(tmp_path / "delta.bin"),
                                   config=cfg)
    np.testing.assert_array_equal(
        np.asarray(params_d["unet"]["conv_out"]["bias"]),
        np.asarray(unet_sd[k_edit]) + 5)
    np.testing.assert_array_equal(            # un-edited key from snapshot
        np.asarray(params_d["unet"]["conv_in"]["bias"]),
        np.asarray(unet_sd["conv_in.bias"]))

    # guard rails
    with pytest.raises(ValueError):
        load_baseline("uce", str(tmp_path), edited_unet=str(pt),
                      delta=str(tmp_path / "delta.bin"), config=cfg)
    with pytest.raises(ValueError):
        load_baseline("sld", str(tmp_path), edited_unet=str(pt), config=cfg)

    # the loaded baseline actually generates (the delta-overlaid params — a
    # +1-on-every-tensor edit is numerically degenerate by construction)
    import jax.numpy as jnp
    tcfg = cfg.text_encoder
    cond = jax.random.randint(jax.random.PRNGKey(1), (1, tcfg.max_length), 0,
                              tcfg.vocab_size)
    img, _ = pipe.generate(params_d, cond, jnp.zeros_like(cond),
                           jax.random.PRNGKey(2), num_steps=2, decode=False)
    assert np.all(np.isfinite(np.asarray(img)))
