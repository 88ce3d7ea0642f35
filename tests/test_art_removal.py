"""Style-classifier art-removal protocol + the conf-interval CLIP sweep
(reference: benchmarks/art_removal.py, modularity/clip_sim_score.py) —
scripted fake judges pin the reference scoring semantics."""
import json
import os

import numpy as np
from PIL import Image

from diffusion_models_moe_tpu.benchmarks.art_removal import (
    ART_STYLE_LABELS, ART_STYLE_TOPK, art_removal_score_protocol,
    art_style_scores, make_zero_shot_style_ranker, style_label)
from diffusion_models_moe_tpu.benchmarks.protocols import (
    clip_sim_confidence_sweep)


def _mean_featurize(images):
    # distinct, deterministic per-image embedding: per-channel means + const
    x = np.asarray(images, np.float64).reshape(len(images), -1, 3).mean(1)
    return np.concatenate([x, np.ones((len(images), 1))], -1)


def test_art_style_scores_reference_semantics():
    pre = np.zeros((3, 8, 8, 3), np.float32)
    post = np.stack([np.zeros((8, 8, 3), np.float32),
                     np.ones((8, 8, 3), np.float32) * 0.5,
                     np.ones((8, 8, 3), np.float32)])
    label = ART_STYLE_LABELS["Salvador Dali"]     # top_k = 1

    def ranker(images):
        # pre call: image 2's top-10 misses the label (invalid pair);
        # post call: label ranked #1, #2, #11 -> with k=1 acc = [1, 0, 0]
        if float(np.asarray(images).sum()) == 0.0:           # the pre stack
            return [[label] + ["x"] * 12, ["x"] * 5 + [label] + ["y"] * 7,
                    ["x"] * 12]
        return [[label, "a"], ["a", label], ["b"] * 10 + [label]]

    res = art_style_scores(ranker, _mean_featurize, pre, post,
                           "Salvador Dali")
    assert res["acc"] == [1, 0, 0]
    # the reference counts invalid pre-pairs but still scores them (its
    # validity gate is commented out) — acc has all three entries
    assert res["num_invalid"] == 1
    assert res["mean_acc"] == 1.0 / 3.0
    # identical pre/post pair -> cosine 1; sim stays ordered with difference
    assert res["sim"][0] > res["sim"][2]


def test_art_removal_protocol_walks_folders(tmp_path):
    for concept, fill in (("Van Gogh", 0.2), ("Rembrandt", 0.8)):
        d = tmp_path / concept
        d.mkdir()
        for i in range(2):
            Image.fromarray(np.full((8, 8, 3), int(fill * 255),
                                    np.uint8)).save(d / f"sd_{i}.png")
            Image.fromarray(np.full((8, 8, 3), 255 - int(fill * 255),
                                    np.uint8)).save(d / f"removed_{i}.png")

    def ranker(images):
        return [["vincent-van-gogh", "rembrandt", "x"]] * len(images)

    res = art_removal_score_protocol(str(tmp_path), ranker, _mean_featurize)
    # both labels inside top-3 window (both concepts use k=3) -> acc 1.0
    assert res["all_acc_mean"] == 1.0
    assert set(res["concepts"]) == {"Van Gogh", "Rembrandt"}
    assert os.path.exists(tmp_path / "results.json")
    assert json.load(open(tmp_path / "Van Gogh" / "results.json"))[
        "mean_acc"] == 1.0


def test_style_label_table_and_slug():
    assert style_label("Monet") == "claude-monet"
    assert style_label("Frida Kahlo") == "frida-kahlo"   # slug fallback
    assert set(ART_STYLE_TOPK.values()) == {1, 3}


def test_zero_shot_style_ranker_orders_by_similarity():
    embs = np.eye(3)
    labels = ["a-style", "b-style", "c-style"]
    rank = make_zero_shot_style_ranker(
        lambda imgs: np.asarray(imgs).reshape(len(imgs), -1)[:, :3],
        embs, labels)
    imgs = np.zeros((1, 1, 1, 3), np.float32)
    imgs[0, 0, 0] = [0.1, 0.9, 0.2]
    assert rank(imgs)[0] == ["b-style", "c-style", "a-style"]


def test_clip_sim_confidence_sweep(tmp_path):
    prompts = ["a cat", "a dog"]
    conf_int = (0.2, 0.05)
    for conf in conf_int:
        d = tmp_path / f"dof_1_conf_{conf}"
        d.mkdir()
        for i in range(2):
            v = int(255 * (0.25 if conf == 0.2 else 0.75))
            Image.fromarray(np.full((8, 8, 3), v, np.uint8)).save(
                d / f"img_{i}_adj.jpg")

    def text_featurize(texts):
        # channel-aligned embeddings so similarity grows with brightness
        # monotonically even after l2 normalization
        return np.asarray([[1.0, 1.0, 1.0, 0.0] if "style" in t
                           else [2.0, 1.0, 1.0, 0.0] for t in texts])

    out = tmp_path / "sweep.json"
    res = clip_sim_confidence_sweep(
        str(tmp_path) + "/%s", prompts, _mean_featurize, text_featurize,
        adjective="van gogh", conf_int=conf_int, out_path=str(out))
    assert set(res["mean"]) == set(conf_int)
    # brighter images (conf 0.05 dirs) have larger channel means -> larger
    # dot with every positive text embedding
    assert res["mean"][0.05] > res["mean"][0.2]
    assert res["mean_adj"][0.05] > res["mean_adj"][0.2]
    assert res["per_prompt"][0][0.2] != res["per_prompt"][0][0.05]
    saved = json.load(open(out))
    assert "0.2" in saved["mean"] and "0" in saved["per_prompt"]
