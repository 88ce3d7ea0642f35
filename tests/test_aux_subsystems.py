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
    # Qwen2-VL reply after the decoder strips the box marker special tokens
    assert parse_box("the dog(100, 200),(300,400)") == (50, 100, 150, 200)
    assert parse_box("lone pair (1,2) only") is None


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


def test_study_tpe_beats_random_on_quadratic():
    """TPE (the reference's Optuna default sampler) concentrates around the
    optimum: with the same budget/seed it must beat plain random search on a
    smooth 2-d quadratic, and respect box bounds."""
    def obj(p):
        return (p["x"] - 0.31) ** 2 + (p["y"] - 0.72) ** 2

    space = {"x": (0.0, 1.0), "y": (0.0, 1.0)}
    tpe = Study("tpe").optimize_tpe(obj, space, n_trials=40, seed=0)
    rnd = Study("rnd").optimize_random(obj, space, n_trials=40, seed=0)
    assert tpe.value < rnd.value
    assert tpe.value < 0.005
    assert 0.0 <= tpe.params["x"] <= 1.0 and 0.0 <= tpe.params["y"] <= 1.0

    # maximize direction flips the good/bad split
    best = Study("m", direction="maximize").optimize_tpe(
        lambda p: -((p["x"] - 0.5) ** 2), {"x": (0.0, 1.0)},
        n_trials=25, seed=2)
    assert abs(best.params["x"] - 0.5) < 0.15


def test_param_count_report():
    import jax
    from diffusion_models_moe_tpu.training.trainer import param_count_report
    params = {"a": np.zeros((2, 3)), "b": {"c": np.zeros(4)}}
    rep = param_count_report(params)
    assert rep["total"] == 10 and rep["share"] == 1.0
    mask = {"a": True, "b": {"c": False}}
    rep = param_count_report(params, mask)
    assert rep["trainable"] == 6


def test_noise_diff_objective_and_eps_tap():
    """save_eps tap returns the (T,B,h,w,c) eps trajectory; the HPO noise
    objective is 0 for a no-op intervention and > 0 for a real one."""
    import jax
    import jax.numpy as jnp
    from diffusion_models_moe_tpu import (StableDiffusionPipeline, TapSpec,
                                          tiny_config)
    from diffusion_models_moe_tpu.analysis.hpo import noise_diff_objective
    from diffusion_models_moe_tpu.erasure.masks import (
        neuron_removal_interventions)

    pipe = StableDiffusionPipeline(tiny_config())
    params = pipe.init_params(jax.random.PRNGKey(0))
    tc = pipe.config.text_encoder

    def tokenize(texts):
        rng = np.random.RandomState(abs(hash(tuple(texts))) % (2 ** 31))
        return rng.randint(0, tc.vocab_size,
                           (len(texts), tc.max_length)).astype(np.int32)

    cond = jnp.asarray(tokenize(["x"]))
    _, taps = pipe.generate(params, cond, jnp.zeros_like(cond),
                            jax.random.PRNGKey(0), num_steps=2,
                            tap=TapSpec(save_eps=True), decode=False)
    eps = np.asarray(taps["eps"][0])
    assert eps.shape[0] == 3 and eps.ndim == 5  # (T=2+1, B, h, w, c)

    h0 = 4 * pipe.config.unet.ff_dims()[0]

    def make_ivs(p):
        if p["ratio"] == 0.0:
            return None
        mask = np.zeros(h0, bool)
        mask[: int(p["ratio"] * h0)] = True
        return neuron_removal_interventions({0: mask})

    obj = noise_diff_objective(pipe, params, tokenize, ["a cat"], make_ivs,
                               num_steps=2)
    assert obj({"ratio": 0.0}) == 0.0
    assert obj({"ratio": 0.5}) > 0.0


def test_profiling_trace_and_top_ops(tmp_path):
    """The in-repo profiling helper produces a parseable perfetto trace and a
    top-ops report on CPU (SURVEY.md §5.1 — the reference has none)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from diffusion_models_moe_tpu.profiling import (step_time_report, top_ops,
                                                    trace)

    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((128, 128))
    float(f(x))                                   # compile outside trace
    with trace(str(tmp_path)):
        np.asarray(jax.device_get(f(x)))
    rows = top_ops(str(tmp_path))
    assert rows and all({"name", "total_us", "count", "pct"} <= set(r)
                        for r in rows)
    report = step_time_report(str(tmp_path))
    assert "total_ms" in report and len(report.splitlines()) > 1
