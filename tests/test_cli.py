"""CLI smoke tests on the tiny random-init path (the reference's L7
orchestration surface, one binary instead of 14 argparse scripts)."""
import json
import os

import numpy as np
import pytest

from diffusion_models_moe_tpu.cli import main


def test_cli_moefy_generate_roundtrip(tmp_path):
    labels = tmp_path / "labels.npz"
    main(["moefy", "--cpu", "--method", "greedy", "--expert-size", "16",
          "--out", str(labels)])
    assert labels.exists()
    with np.load(labels) as z:
        assert len(z.files) == 16            # all SD-topology FF layers
    img = tmp_path / "out.png"
    main(["generate", "--cpu", "--prompt", "a cat", "--labels", str(labels),
          "--topk", "0.3", "--steps", "2", "--out", str(img)])
    assert img.exists() and img.stat().st_size > 0


def test_cli_protocol_memorize(tmp_path):
    out_dir = tmp_path / "mem"
    main(["protocol", "memorize", "--cpu", "--limit", "2", "--steps", "2",
          "--batch", "2", "--split", "0", "--out-dir", str(out_dir)])
    res = json.load(open(out_dir / "memorization_results.json"))
    assert res["n_prompts"] == 2
    assert np.isfinite(res["mean_similarity"])


def test_cli_protocol_objects(tmp_path):
    out_dir = tmp_path / "obj"
    main(["protocol", "objects", "--cpu", "--limit", "2", "--steps", "2",
          "--batch", "2", "--concept", "parachute", "--out-dir",
          str(out_dir)])
    res = json.load(open(out_dir / "object_erasure_results.json"))
    assert res["target"] == "parachute"
    for k in ("erase_top1", "erase_top5", "keep_top1", "keep_top5"):
        assert 0.0 <= res[k] <= 1.0


def test_cli_protocol_debias(tmp_path):
    out_dir = tmp_path / "deb"
    main(["protocol", "debias", "--cpu", "--limit", "2", "--steps", "2",
          "--seed", "3", "--out-dir", str(out_dir)])
    res = json.load(open(out_dir / "debias_results.json"))
    assert len(res["per_profession"]) == 2
    assert 0.0 <= res["mean_abs_bias_after"] <= 0.5


def test_cli_serve(tmp_path, monkeypatch, capsys):
    import io
    out_dir = tmp_path / "served"
    monkeypatch.setattr("sys.stdin", io.StringIO("5\ta cat\na dog\n"))
    main(["serve", "--cpu", "--batch", "2", "--steps", "2",
          "--max-wait-ms", "200", "--out-dir", str(out_dir)])
    assert len(list(out_dir.glob("img_*.png"))) == 2
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["served"] == 2


def test_cli_wanda_remove_bake_roundtrip(tmp_path):
    """The default erasure flow end-to-end: wanda mask collection -> dynamic
    removal eval -> static union baking. Regression for the mask-orientation
    bug where cli-saved masks were double-transposed by
    wanda_removal_interventions and crashed `remove --mode wanda`."""
    masks_p = tmp_path / "masks.npz"
    main(["wanda", "--cpu", "--concept", "Van Gogh", "--limit", "1",
          "--steps", "2", "--skill-ratio", "0.05", "--out", str(masks_p)])
    assert masks_p.exists()
    out_dir = tmp_path / "removed"
    main(["remove", "--cpu", "--concept", "Van Gogh", "--limit", "1",
          "--steps", "2", "--batch", "1", "--masks", str(masks_p),
          "--out-dir", str(out_dir)])
    assert any(f.endswith(".png") for f in os.listdir(out_dir))
    baked = tmp_path / "baked.safetensors"
    main(["bake-union", "--cpu", "--masks", str(masks_p), "--ratio", "0.3",
          "--out", str(baked)])
    assert baked.exists() and baked.stat().st_size > 0


def test_cli_train_smoke(tmp_path, capsys):
    """cli train: imagefolder -> 2 relufied fine-tune steps -> ckpt + log
    (the reference's train_relufied_sd.py front door)."""
    import csv
    import json as _json

    import numpy as np
    from PIL import Image

    from diffusion_models_moe_tpu.cli import main

    data = tmp_path / "data"
    data.mkdir()
    rng = np.random.RandomState(0)
    rows = []
    for i in range(4):
        Image.fromarray(rng.randint(0, 255, (70, 70, 3), np.uint8)).save(
            str(data / f"i{i}.png"))
        rows.append({"file_name": f"i{i}.png", "text": f"a photo {i}"})
    with open(data / "metadata.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["file_name", "text"])
        w.writeheader()
        w.writerows(rows)

    main(["train", "--cpu", "--data-dir", str(data),
          "--out-dir", str(tmp_path / "run"), "--batch", "2",
          "--max-steps", "2", "--log-every", "1", "--checkpoint-every", "10"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["steps"] == 2
    logs = [_json.loads(l)
            for l in open(tmp_path / "run" / "train_log.jsonl")]
    assert logs and np.isfinite(logs[-1]["loss"])
    assert (tmp_path / "run" / "checkpoints").is_dir()


def test_cli_train_ft_method_choices_match_registry():
    """The hardcoded --ft-method choices (kept static so --help stays
    jax-free) must track training.train.FT_METHODS."""
    from diffusion_models_moe_tpu.cli import build_parser
    from diffusion_models_moe_tpu.training.train import FT_METHODS

    parser = build_parser()
    sub = next(a for a in parser._subparsers._group_actions)
    train_parser = sub.choices["train"]
    ft = next(a for a in train_parser._actions if a.dest == "ft_method")
    assert set(ft.choices) == set(FT_METHODS)


def test_cli_check_snapshot(tmp_path, capsys):
    """Snapshot doctor: exact UNet key census + presence + deep porter run."""
    import json as _json

    import jax
    import jax.numpy as jnp
    import numpy as np
    from safetensors.numpy import save_file

    from diffusion_models_moe_tpu import tiny_config
    from diffusion_models_moe_tpu.cli import main
    from diffusion_models_moe_tpu.models.unet import UNet2DCondition
    from diffusion_models_moe_tpu.models.vae import VAEDecoder, VAEEncoder
    from diffusion_models_moe_tpu.weights.export import (export_unet,
                                                         export_vae_decoder,
                                                         export_vae_encoder)

    cfg = tiny_config()
    root = tmp_path / "snap"
    for sub in ("unet", "vae", "text_encoder", "tokenizer"):
        (root / sub).mkdir(parents=True)
    uparams = UNet2DCondition(cfg.unet).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 8, cfg.unet.cross_attention_dim)))["params"]
    unet_sd = export_unet(uparams, cfg.unet)
    # sentinel tensors at REAL SD1.5 shapes: the doctor's shape checks read
    # only these from the header (everything else stays tiny)
    unet_sd["conv_in.weight"] = np.zeros((320, 4, 3, 3), np.float32)
    unet_sd["down_blocks.0.attentions.0.transformer_blocks.0"
            ".attn2.to_k.weight"] = np.zeros((8, 768), np.float32)
    save_file(unet_sd,
              str(root / "unet" / "diffusion_pytorch_model.safetensors"))
    # VAE files must carry SD1.5 TOPOLOGY (2 resnets/block) for the deep
    # porters, which run at the declared kind's geometry; tiny dims are fine
    import dataclasses
    from diffusion_models_moe_tpu.config import VAEConfig
    vae_cfg = VAEConfig(block_out_channels=(8, 16, 32, 32),
                        layers_per_block=2, norm_num_groups=4)
    vdec = VAEDecoder(vae_cfg).init(jax.random.PRNGKey(1),
                                    jnp.zeros((1, 4, 4, 4)))["params"]
    venc = VAEEncoder(vae_cfg).init(jax.random.PRNGKey(2),
                                    jnp.zeros((1, 32, 32, 3)))["params"]
    vae_sd = {**export_vae_decoder(vdec, vae_cfg),
              **export_vae_encoder(venc, vae_cfg)}
    save_file(vae_sd,
              str(root / "vae" / "diffusion_pytorch_model.safetensors"))
    save_file({"dummy": np.zeros((1,), np.float32)},
              str(root / "text_encoder" / "model.safetensors"))
    (root / "tokenizer" / "vocab.json").write_text("{}")

    main(["check-snapshot", "--cpu", "--snapshot", str(root)])
    rep = _json.loads(capsys.readouterr().out)
    assert rep["components"]["unet"]["keys_ok"]
    assert rep["components"]["unet"]["shapes_ok"]
    assert rep["ok"]

    # wrong --kind detection: same snapshot declared as sd21 fails the
    # cross-attention-dim sentinel (768 vs expected 1024) despite identical
    # key names
    main(["check-snapshot", "--cpu", "--snapshot", str(root),
          "--kind", "sd21"])
    rep21 = _json.loads(capsys.readouterr().out)
    assert rep21["components"]["unet"]["keys_ok"]
    assert rep21["components"]["unet"]["shapes_ok"] is False
    chk = rep21["components"]["unet"]["shape_checks"]["cross_attention_dim"]
    assert chk == {"got": 768, "expected": 1024}
    assert rep21["ok"] is False

    # deep mode: unet + both vae porters succeed, text encoder reports error
    main(["check-snapshot", "--cpu", "--snapshot", str(root), "--deep"])
    rep = _json.loads(capsys.readouterr().out)
    assert rep["components"]["unet"]["port_ok"]
    assert rep["components"]["vae"]["port_ok"]
    assert rep["components"]["vae_encoder"]["port_ok"]
    assert rep["components"]["text_encoder"]["port_ok"] is False
    assert "port_error" in rep["components"]["text_encoder"]
    assert rep["ok"] is False

    # a missing tensor shows up in the census diff
    import safetensors.numpy as stn
    sd = stn.load_file(
        str(root / "unet" / "diffusion_pytorch_model.safetensors"))
    sd.pop("conv_out.bias")
    save_file(sd, str(root / "unet" / "diffusion_pytorch_model.safetensors"))
    main(["check-snapshot", "--cpu", "--snapshot", str(root)])
    rep = _json.loads(capsys.readouterr().out)
    assert rep["components"]["unet"]["missing_keys"] == ["conv_out.bias"]
    assert rep["ok"] is False


def test_cli_iqa(tmp_path, capsys):
    """cli iqa: three image dirs -> CLIP-IQA report JSON (tiny towers)."""
    import json as _json

    import numpy as np
    from PIL import Image

    from diffusion_models_moe_tpu.cli import main

    rng = np.random.RandomState(0)
    for name in ("base", "concept", "removed"):
        d = tmp_path / name
        d.mkdir()
        for i in range(2):
            Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(
                str(d / f"img_{i}.png"))
    main(["iqa", "--cpu", "--base-dir", str(tmp_path / "base"),
          "--concept-dir", str(tmp_path / "concept"),
          "--removed-dir", str(tmp_path / "removed"),
          "--concept", "Van Gogh", "--out-dir", str(tmp_path)])
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(rep) == {"base", "concept", "concept_removal"}
    assert 0.0 <= rep["base"]["quality"] <= 1.0
    assert (tmp_path / "clip_iqa_scores.json").exists()


def test_cli_protocol_unified(tmp_path, capsys):
    """cli protocol unified: per-prompt concept routing over mask files."""
    import json as _json

    import numpy as np

    from diffusion_models_moe_tpu.cli import main
    from diffusion_models_moe_tpu.erasure.masks import save_masks

    # tiny-config wanda-orientation masks for two concepts (16 FF layers of
    # the tiny config; (D, H) static masks)
    dims = [(32, 128)] * 2
    rng = np.random.RandomState(0)
    for name in ("vg", "nk"):
        masks = {i: rng.rand(d, h) < 0.05 for i, (d, h) in enumerate(dims)}
        save_masks(str(tmp_path / f"{name}.npz"), masks)

    main(["protocol", "unified", "--cpu", "--steps", "2", "--limit", "2",
          "--masks", f"vg={tmp_path}/vg.npz,nk={tmp_path}/nk.npz",
          "--out-dir", str(tmp_path / "out")])
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_prompts"] == 2
    assert len(rep["results"]) == 2
    import os
    assert len([f for f in os.listdir(tmp_path / "out")
                if f.endswith(".png")]) == 2


def test_cli_vqa(tmp_path, monkeypatch, capsys):
    """cli vqa: before/after dirs -> multiple-choice scores with a scripted
    judge standing in for the native LLaVA loader."""
    import json as _json

    from PIL import Image

    rng = np.random.RandomState(1)
    for name in ("before", "after"):
        d = tmp_path / name
        d.mkdir()
        for i in range(2):
            Image.fromarray(rng.randint(0, 255, (24, 24, 3), np.uint8)).save(
                str(d / f"img_{i}.png"))

    calls = []

    def fake_judge(image, question):
        calls.append(question)
        return "1"  # always option 1: cat / photo

    monkeypatch.setattr(
        "diffusion_models_moe_tpu.benchmarks.vqa.load_llava_native",
        lambda path, **kw: fake_judge)
    out = tmp_path / "res.json"
    main(["vqa", "--cpu", "--judge", "unused", "--before-dir",
          str(tmp_path / "before"), "--after-dir", str(tmp_path / "after"),
          "--objects", "cat,dog", "--concept", "Van Gogh",
          "--out", str(out)])
    res = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # object: gt cat scores 1, gt dog scores 0; style '1'=photo, so
    # before (expects 2) scores 0 and after (expects 1) scores 1
    assert res["before_removal"]["object_score"] == 0.5
    assert res["before_removal"]["style_score"] == 0.0
    assert res["after_removal"]["style_score"] == 1.0
    assert _json.load(open(out)) == res
    assert any("(1)cat (2)dog" in q for q in calls)


def test_cli_ttest_remove_roundtrip(tmp_path, capsys):
    """The t-test attribution flow end-to-end: predictivity collection ->
    paired t-test masks -> neuron-removal eval (reference:
    modularity_analysis.py -> paired_t_test.py -> remove_experts.py)."""
    import json as _json

    masks_p = tmp_path / "ttest_masks.npz"
    pred_p = tmp_path / "pred.npz"
    main(["ttest", "--cpu", "--concept", "Van Gogh", "--limit", "2",
          "--steps", "2", "--conf", "0.2", "--out", str(masks_p),
          "--save-predictivity", str(pred_p)])
    assert masks_p.exists() and pred_p.exists()
    summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["skilled_neurons"] >= 0
    out_dir = tmp_path / "removed"
    main(["remove", "--cpu", "--concept", "Van Gogh", "--limit", "1",
          "--steps", "2", "--batch", "1", "--mode", "neurons",
          "--masks", str(masks_p), "--out-dir", str(out_dir)])
    assert any(f.startswith("removed_") for f in os.listdir(out_dir))


def test_cli_analysis_and_eval_commands(tmp_path, capsys):
    """sparsity, expert-freq, eval-gen, and score-dirs front doors on the
    tiny config (reference: check_sparsity.py, freq_expert_select.py,
    eval_coco.py, calculate_scores.py)."""
    import json as _json

    main(["sparsity", "--cpu", "--concept", "Van Gogh", "--limit", "1",
          "--steps", "2"])
    sp = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert sp and all(0.0 <= v <= 1.0 for v in sp.values())

    labels = tmp_path / "labels.npz"
    main(["moefy", "--cpu", "--method", "greedy", "--expert-size", "16",
          "--out", str(labels)])
    freq_p = tmp_path / "freq.json"
    main(["expert-freq", "--cpu", "--concept", "Van Gogh", "--limit", "1",
          "--steps", "2", "--labels", str(labels), "--out", str(freq_p)])
    freq = _json.load(open(freq_p))
    # T = scheduler firings (PNDM warmup makes it steps+1, like the
    # reference's T=51 for 50 steps); rows are normalized frequencies
    assert freq and all(np.asarray(v).shape[0] >= 2 for v in freq.values())
    assert all(np.asarray(v).min() >= 0 for v in freq.values())
    capsys.readouterr()

    out_dir = tmp_path / "eval"
    main(["eval-gen", "--cpu", "--concept", "Van Gogh", "--limit", "2",
          "--steps", "2", "--batch", "2", "--out-dir", str(out_dir)])
    res = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["generated"] >= 2 or res.get("skipped", 0) >= 0
    names = os.listdir(out_dir)
    assert any(n.startswith("sd_") for n in names)
    assert any(n.startswith("removed_") for n in names)

    main(["score-dirs", "--a-dir", str(out_dir), "--b-dir", str(out_dir)])
    sc = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(sc["fid"])


def test_stitch_side_by_side():
    """Before/after stitching (reference: remove_experts.py:47-69)."""
    from diffusion_models_moe_tpu.pipelines.stable_diffusion import (
        stitch_side_by_side)

    a = np.zeros((2, 8, 6, 3), np.float32)
    b = np.ones((2, 8, 6, 3), np.float32)
    out = stitch_side_by_side(a, b)
    assert len(out) == 2 and out[0].size == (12, 8)
    arr = np.asarray(out[0])
    assert arr[:, :6].max() == 0 and arr[:, 6:].min() == 255


def test_mimic_cxr_dataset(tmp_path):
    """CSV-driven image/report batches, center-crop + [-1,1] scaling
    (reference: get_dataset_mimic_cxr.py)."""
    import csv as _csv

    from PIL import Image

    from diffusion_models_moe_tpu.data.mimic_cxr import MimicCXRDataset

    root = tmp_path / "imgs"
    root.mkdir()
    rng = np.random.RandomState(0)
    rows = []
    for i in range(3):
        Image.fromarray(rng.randint(0, 255, (40, 30, 3), np.uint8)).save(
            str(root / f"x{i}.png"))
        rows.append({"path": f"x{i}.png", "report": f"report {i}"})
    csv_p = tmp_path / "meta.csv"
    with open(csv_p, "w", newline="") as f:
        w = _csv.DictWriter(f, fieldnames=["path", "report"])
        w.writeheader()
        w.writerows(rows)

    ds = MimicCXRDataset(str(csv_p), str(root), resolution=16)
    assert len(ds) == 3
    tok_calls = []

    def tokenize(texts):
        tok_calls.append(list(texts))
        return np.zeros((len(texts), 4), np.int32)

    batches = list(ds.batches(2, tokenize, seed=0, epochs=2))
    assert len(batches) == 2                       # drop-last, 2 epochs
    img = batches[0]["images"]
    assert img.shape == (2, 16, 16, 3)
    assert img.min() >= -1.0 and img.max() <= 1.0
    assert batches[0]["input_ids"].shape == (2, 4)
    with pytest.raises(ValueError):
        next(ds.batches(5, tokenize))


def test_cli_check_snapshot_baseline_unet(tmp_path, capsys):
    """--baseline-unet validates a UCE-style edited-UNet state-dict file
    (reference: benchmarks/eval_coco.py:70-101) against the --kind topology —
    with or without a base snapshot present."""
    import json as _json

    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    from diffusion_models_moe_tpu import tiny_config
    from diffusion_models_moe_tpu.cli import main
    from diffusion_models_moe_tpu.models.unet import UNet2DCondition
    from diffusion_models_moe_tpu.weights.export import export_unet

    cfg = tiny_config()
    uparams = UNet2DCondition(cfg.unet).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 8, cfg.unet.cross_attention_dim)))["params"]
    sd = export_unet(uparams, cfg.unet)
    # sentinel tensors at REAL SD1.5 shapes (the validator's shape checks)
    sd["conv_in.weight"] = np.zeros((320, 4, 3, 3), np.float32)
    sd["down_blocks.0.attentions.0.transformer_blocks.0"
       ".attn2.to_k.weight"] = np.zeros((8, 768), np.float32)
    pt = tmp_path / "erased-van gogh-method_replace.pt"
    torch.save({k: torch.from_numpy(np.asarray(v).copy()).half()
                for k, v in sd.items()}, str(pt))

    # no snapshot dir at all: the edited file still gets a full census
    main(["check-snapshot", "--cpu", "--snapshot", str(tmp_path / "absent"),
          "--baseline-unet", str(pt)])
    rep = _json.loads(capsys.readouterr().out)
    entry = rep["components"]["baseline_unet"]
    assert entry["load_ok"] and entry["keys_ok"] and entry["shapes_ok"]
    assert entry["n_tensors"] == len(sd)

    # wrong --kind: the sd21 sentinel (1024) rejects the 768 file
    main(["check-snapshot", "--cpu", "--snapshot", str(tmp_path / "absent"),
          "--kind", "sd21", "--baseline-unet", str(pt)])
    rep21 = _json.loads(capsys.readouterr().out)
    e21 = rep21["components"]["baseline_unet"]
    assert e21["keys_ok"] and e21["shapes_ok"] is False
    assert (e21["shape_checks"]["cross_attention_dim"]
            == {"got": 768, "expected": 1024})
    assert rep21["ok"] is False


def test_cli_parity_run_dbg(tmp_path, capsys):
    """parity-run in dbg mode (tiny random-init): the full
    moefy->wanda->remove->bake->score chain completes, the bake==dynamic
    machinery parity holds, and PARITY_RUN.md + parity_run.json land with
    provenance (VERDICT r2 item 5 — the snapshot-gated acceptance run)."""
    import json as _json

    from diffusion_models_moe_tpu.cli import main

    out = tmp_path / "parity"
    main(["parity-run", "--cpu", "--out-dir", str(out),
          "--concept", "Van Gogh", "--limit", "2", "--steps", "2",
          "--batch", "2", "--mode", "dc3_pad"])
    acc = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert acc["pipeline_complete"]
    assert acc["bake_parity_ok"]
    assert acc["real_weights_run"] is False

    rep = _json.loads((out / "parity_run.json").read_text())
    assert rep["concept"] == "Van Gogh"
    assert rep["wanda"]["skilled_entries"] > 0
    assert rep["bake"]["bake_vs_dynamic_max_abs"] < 1e-4
    assert (out / "wanda_masks.npz").exists()
    assert (out / "baked_unet.safetensors").exists()
    assert (out / "labels.npz").exists()
    # image pairs from the removal eval
    imgs = sorted(p.name for p in (out / "images").iterdir())
    assert any(n.startswith("sd_") for n in imgs)
    assert any(n.startswith("removed_") for n in imgs)
    # serving-mode A/B (VERDICT r3 #6): the dbg run covers one approximate
    # leg end-to-end — dc3_pad latents diverge from exact (DeepCache skips
    # deep blocks) but by a bounded amount on 2 steps
    sm = rep["serving_mode"]
    assert sm["mode"] == "dc3_pad" and sm["deep_cache"] == 3
    assert 0.0 < sm["latent_rel_err_vs_exact"] < 1.0
    # tier assertion (VERDICT r4 item 7): the leg's measured delta must sit
    # inside its advertised tier bound
    assert sm["tier_bound"] == 0.5 and sm["tier_ok"] is True
    md = (out / "PARITY_RUN.md").read_text()
    assert "dbg (tiny random-init" in md and "parity_ok=True" in md
    assert "dc3_pad" in md
    assert rep["commit"]    # provenance present
    # scores computed (dbg featurizer — values not meaningful, but finite)
    assert np.isfinite(rep["scores"]["clip_fid_base_vs_removed"])


def test_cli_parity_run_attnabs_mode(tmp_path, capsys):
    """parity-run --mode attnabs_pad (VERDICT r4 item 7: the acceptance flow
    must cover promoted kernel legs). On CPU the absorb kernel gate is
    closed, so the delegated-LN fallback path runs — it must stay inside the
    exact-tier bound (it reproduces the plain block up to LN op-order)."""
    import json as _json

    from diffusion_models_moe_tpu.cli import main

    out = tmp_path / "parity_abs"
    main(["parity-run", "--cpu", "--out-dir", str(out),
          "--concept", "Van Gogh", "--limit", "2", "--steps", "2",
          "--batch", "2", "--mode", "attnabs_pad"])
    rep = _json.loads((out / "parity_run.json").read_text())
    sm = rep["serving_mode"]
    assert sm["mode"] == "attnabs_pad" and sm["deep_cache"] == 0
    assert sm["knobs"]["DMOE_ATTN_ABSORB"] == "1"
    assert sm["latent_rel_err_vs_exact"] < sm["tier_bound"] == 0.02
    assert sm["tier_ok"] is True


def test_cli_create_datasets(tmp_path, capsys):
    # reference: benchmarks/create_datasets.py:1-18 — artist->concept rename,
    # I2P rows appended with concept='naked' and sequential case_numbers
    import csv
    art = tmp_path / "artwork_prompts.csv"
    with open(art, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["case_number", "prompt",
                                          "evaluation_seed", "artist"])
        w.writeheader()
        w.writerow({"case_number": "0", "prompt": "art by Van Gogh",
                    "evaluation_seed": "7", "artist": "Van Gogh"})
        w.writerow({"case_number": "1", "prompt": "art by Monet",
                    "evaluation_seed": "9", "artist": "Monet"})
    i2p = tmp_path / "i2p.txt"
    i2p.write_text("a harmful prompt\n\nanother one\n")
    out = tmp_path / "combined_prompts.csv"
    main(["create-datasets", "--artwork-csv", str(art),
          "--i2p-file", str(i2p), "--out", str(out)])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["rows"] == 4
    with open(out, newline="") as f:
        rows = list(csv.DictReader(f))
    assert [r["concept"] for r in rows] == ["Van Gogh", "Monet",
                                            "naked", "naked"]
    assert rows[2]["case_number"] == "2" and rows[3]["case_number"] == "3"
    assert rows[2]["evaluation_seed"] == "0"
    assert "artist" not in rows[0]
