"""Tests: bounding-box projection, VQA scoring protocol, HPO studies, trainer utils."""
import json

import numpy as np

from diffusion_models_moe_tpu.analysis.bounding_boxes import (
    boxes_to_interventions, layer_token_mask, parse_box, unet_layer_seq_lens)
from diffusion_models_moe_tpu.analysis.hpo import Study, noise_diff_objective
from diffusion_models_moe_tpu.benchmarks.vqa import (object_question,
                                                     parse_yes_no,
                                                     removal_score,
                                                     vqa_presence_score)


def test_parse_box():
    assert parse_box("sure <box>(100,200),(300,400)</box> ok") == (50, 100,
                                                                   150, 200)
    assert parse_box("no box here") is None


def test_layer_token_mask_projection():
    # box covering the top-left quadrant of a 512px image
    box = (0, 0, 256, 256)
    m = layer_token_mask(box, 64, image_size=512)   # 8x8 grid
    grid = m.reshape(8, 8)
    assert grid[:4, :4].all() and not grid[4:, 4:].any()
    # tiny box still yields at least one token
    m = layer_token_mask((10, 10, 12, 12), 4096)
    assert m.sum() >= 1


def test_seq_lens_sd15():
    lens = unet_layer_seq_lens(64)
    assert lens == [4096, 4096, 1024, 1024, 256, 256, 64,
                    256, 256, 256, 1024, 1024, 1024, 4096, 4096, 4096]
    ivs = boxes_to_interventions((0, 0, 256, 256), lens)
    assert len(ivs) == 16
    assert ivs[6].token_mask.shape == (64,)


def test_vqa_protocol():
    def fake_vqa(img, question):
        return "Yes, clearly." if img["has"] else "no"

    imgs_with = [{"has": True}] * 3
    imgs_without = [{"has": False}] * 3
    q = object_question("church")
    assert "church" in q
    s = vqa_presence_score(fake_vqa, imgs_with, q)
    assert s["yes_frac"] == 1.0
    r = removal_score(fake_vqa, imgs_with, imgs_without, q)
    assert r["removal_gain"] == 1.0
    assert parse_yes_no("  YES!") is True
    assert parse_yes_no("maybe") is None


def test_study_grid_and_random(tmp_path):
    study = Study("s", direction="minimize", storage_dir=str(tmp_path))
    best = study.optimize_grid(lambda p: (p["x"] - 2) ** 2,
                               {"x": [0, 1, 2, 3]})
    assert best.params["x"] == 2 and best.value == 0
    logged = json.load(open(tmp_path / "s.json"))
    assert len(logged) == 4
    study2 = Study("r", direction="maximize")
    best2 = study2.optimize_random(lambda p: p["x"], {"x": (0.0, 1.0)},
                                   n_trials=5, seed=1)
    assert 0.0 <= best2.value <= 1.0
    assert best2.value == max(t.value for t in study2.trials)


def test_param_count_report():
    import jax
    from diffusion_models_moe_tpu.training.trainer import param_count_report
    params = {"a": np.zeros((2, 3)), "b": {"c": np.zeros(4)}}
    rep = param_count_report(params)
    assert rep["total"] == 10 and rep["share"] == 1.0
    mask = {"a": True, "b": {"c": False}}
    rep = param_count_report(params, mask)
    assert rep["trainable"] == 6
