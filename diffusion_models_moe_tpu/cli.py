"""Command-line orchestration: the framework's L7 layer.

Replaces the reference's bash sweep scripts + per-script argparse CLIs
(reference: scripts/*.sh, SURVEY.md §1 L7) with one typed CLI:

    python -m diffusion_models_moe_tpu.cli moefy      --snapshot <dir> --out <npz>
    python -m diffusion_models_moe_tpu.cli generate   --snapshot <dir> --prompt "..."
    python -m diffusion_models_moe_tpu.cli wanda      --snapshot <dir> --concept "Van Gogh" ...
    python -m diffusion_models_moe_tpu.cli ttest      --snapshot <dir> --concept ...
    python -m diffusion_models_moe_tpu.cli remove     --snapshot <dir> --masks <npz> ...
    python -m diffusion_models_moe_tpu.cli bake-union --masks <npz> --ratio 0.3 ...
    python -m diffusion_models_moe_tpu.cli sparsity   --snapshot <dir> ...
    python -m diffusion_models_moe_tpu.cli expert-freq --snapshot <dir> --labels <npz>

`--snapshot` points at a local diffusers-layout SD checkpoint; omit it to run the
random-init tiny config (useful for smoke tests without weights).
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def _maybe_force_cpu(args):
    if getattr(args, "cpu", False):
        import jax
        jax.config.update("jax_platforms", "cpu")


def _hash_tokenize(vocab: int, maxlen: int):
    """Deterministic fake tokenizer for snapshot-less (tiny/random-init) runs:
    md5-seeded ids, stable across processes (python's hash() varies with
    PYTHONHASHSEED, which would break resume-by-skip on restart)."""
    def tokenize(texts):
        import hashlib
        digest = hashlib.md5("\x00".join(texts).encode()).digest()
        rng = np.random.RandomState(
            int.from_bytes(digest[:4], "little") % (2 ** 31))
        return rng.randint(0, vocab, (len(texts), maxlen)).astype(np.int32)
    return tokenize


def _load_pipe(args):
    import jax
    _maybe_force_cpu(args)
    from diffusion_models_moe_tpu import (StableDiffusionPipeline, sd15_config,
                                          tiny_config)
    def _serving_modes(cfg):
        # opt-in serving modes (outputs differ from bf16 — ops/quant.py,
        # ops/winograd.py); exposed on the `serve` subcommand
        int8 = getattr(args, "int8", False)
        wino = getattr(args, "winograd", False)
        dc = getattr(args, "deep_cache", 0) or 0
        if int8 or wino or dc:
            import dataclasses
            cfg = dataclasses.replace(
                cfg,
                unet=dataclasses.replace(cfg.unet, quant_int8=int8,
                                         conv_winograd=wino),
                # VAE decoder convs join the serving mode (encoder stays exact)
                vae=dataclasses.replace(cfg.vae, quant_int8=int8,
                                        conv_winograd=wino),
                deep_cache_interval=dc)
        return cfg

    if args.snapshot:
        import jax.numpy as jnp
        from diffusion_models_moe_tpu.data.tokenizer import load_tokenizer
        from diffusion_models_moe_tpu.weights.port import port_pipeline
        cfg = _serving_modes(sd15_config(dtype=jnp.bfloat16,
                                         relufied=getattr(args, "relufied",
                                                          False)))
        pipe = StableDiffusionPipeline(cfg)
        params = port_pipeline(args.snapshot, cfg)
        tokenize = load_tokenizer(os.path.join(args.snapshot, "tokenizer"))
    else:
        pipe = StableDiffusionPipeline(_serving_modes(tiny_config()))
        params = pipe.init_params(jax.random.PRNGKey(0))
        tokenize = _hash_tokenize(pipe.config.text_encoder.vocab_size,
                                  pipe.config.text_encoder.max_length)

    return pipe, params, tokenize


def _prompt_pairs(args):
    from diffusion_models_moe_tpu.data.prompts import concept_prompts
    subjects = None
    if getattr(args, "subjects_file", None):
        from diffusion_models_moe_tpu.data.prompts import load_subjects
        subjects = load_subjects(args.subjects_file)
    pairs = concept_prompts(args.concept, subjects=subjects)
    if getattr(args, "limit", 0):
        return pairs.base[:args.limit], pairs.concept[:args.limit]
    return pairs.base, pairs.concept


def cmd_moefy(args):
    pipe, params, _ = _load_pipe(args)
    from diffusion_models_moe_tpu.moefication.moefy import moefy_unet
    labels = moefy_unet(params["unet"], pipe.config.unet,
                        expert_size=args.expert_size, method=args.method,
                        seed=args.seed, save_path=args.out)
    print(json.dumps({k: int(v.max()) + 1 for k, v in labels.items()}))


def cmd_generate(args):
    import jax
    pipe, params, tokenize = _load_pipe(args)
    from diffusion_models_moe_tpu.pipelines.stable_diffusion import to_pil
    ivs = None
    if args.labels:
        from diffusion_models_moe_tpu.moefication.moefy import (
            build_moe_interventions, load_labels)
        ivs = build_moe_interventions(load_labels(args.labels), args.topk)
    cond = tokenize([args.prompt])
    uncond = tokenize([""]) if args.snapshot else np.zeros_like(cond)
    img, _ = pipe.generate(params, cond, uncond,
                           jax.random.PRNGKey(args.seed),
                           num_steps=args.steps, ivs=ivs)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    to_pil(img)[0].save(args.out)
    print(args.out)


def cmd_wanda(args):
    pipe, params, tokenize = _load_pipe(args)
    from diffusion_models_moe_tpu.analysis.collect import wanda_pipeline
    from diffusion_models_moe_tpu.data.operating_points import wanda_skill_ratio
    from diffusion_models_moe_tpu.erasure.masks import save_masks
    base, adj = _prompt_pairs(args)
    if args.skill_ratio is None:
        # the reference's known-good per-concept ratio (operating_points.py,
        # <- save_union_over_time.py:9-69); 0.05 when the concept has none
        args.skill_ratio = wanda_skill_ratio(args.concept, default=0.05)
    masks = wanda_pipeline(pipe, params, tokenize, base, adj,
                           skill_ratio=args.skill_ratio, seed=args.seed,
                           num_steps=args.steps, cache_dir=args.cache_dir)
    save_masks(args.out, masks)
    total = sum(int(m.sum()) for m in masks.values())
    print(json.dumps({"out": args.out, "skilled_entries": total,
                      "skill_ratio": args.skill_ratio}))


def cmd_ttest(args):
    pipe, params, tokenize = _load_pipe(args)
    from diffusion_models_moe_tpu.analysis.collect import (collect_predictivity,
                                                           t_test_pipeline)
    from diffusion_models_moe_tpu.erasure.masks import save_masks
    base, adj = _prompt_pairs(args)
    pred = collect_predictivity(pipe, params, tokenize, base, adj,
                                seed=args.seed, num_steps=args.steps)
    if args.save_predictivity:
        pred.save(args.save_predictivity)
    masks = t_test_pipeline(pred, conf=args.conf)
    save_masks(args.out, masks)
    total = sum(int(m.sum()) for m in masks.values())
    print(json.dumps({"out": args.out, "skilled_neurons": total}))


def cmd_remove(args):
    import jax
    pipe, params, tokenize = _load_pipe(args)
    from diffusion_models_moe_tpu.benchmarks.runner import (EvalRunConfig,
                                                            run_eval)
    from diffusion_models_moe_tpu.erasure.masks import (
        load_masks, neuron_removal_interventions, wanda_removal_interventions)
    masks = load_masks(args.masks)
    if args.mode == "wanda":
        ivs = wanda_removal_interventions(masks)
    else:
        ivs = neuron_removal_interventions(masks)
    base, adj = _prompt_pairs(args)
    cfg = EvalRunConfig(out_dir=args.out_dir, batch_size=args.batch,
                        num_steps=args.steps, seed=args.seed)
    print(json.dumps(run_eval(pipe, params, tokenize, adj, cfg, ivs=ivs)))


def cmd_bake_union(args):
    pipe, params, _ = _load_pipe(args)
    from diffusion_models_moe_tpu.erasure.masks import (bake_wanda_masks,
                                                        load_masks,
                                                        union_over_timesteps)
    from diffusion_models_moe_tpu.weights.export import (export_unet,
                                                         save_safetensors)
    # masks are stored in reference (T, D, H) orientation (wanda_pipeline)
    masks_dh = load_masks(args.masks)
    static = union_over_timesteps(masks_dh, args.ratio)
    baked = bake_wanda_masks(params["unet"], pipe.config.unet, static)
    save_safetensors(export_unet(baked, pipe.config.unet), args.out)
    print(json.dumps({"out": args.out,
                      "pruned": {str(l): int(m.sum())
                                 for l, m in static.items()}}))


def cmd_sparsity(args):
    pipe, params, tokenize = _load_pipe(args)
    from diffusion_models_moe_tpu.analysis.sparsity import measure_sparsity
    base, adj = _prompt_pairs(args) if args.concept else (
        ["a photo of a cat"], None)
    res = measure_sparsity(pipe, params, tokenize, base, seed=args.seed,
                           num_steps=args.steps, out_path=args.out)
    print(json.dumps({str(l): float(np.mean(v)) for l, v in res.items()}))


def cmd_expert_freq(args):
    import jax
    pipe, params, tokenize = _load_pipe(args)
    from diffusion_models_moe_tpu.moefication.moefy import (
        build_moe_interventions, load_labels)
    from diffusion_models_moe_tpu.taps import TapSpec
    ivs = build_moe_interventions(load_labels(args.labels), args.topk)
    base, adj = _prompt_pairs(args) if args.concept else (
        ["a photo of a cat"], None)
    counts = None
    for prompt in base:
        cond = tokenize([prompt])
        _, taps = pipe.generate(params, cond, np.zeros_like(cond),
                                jax.random.PRNGKey(args.seed),
                                num_steps=args.steps,
                                tap=TapSpec(expert_freq=True), ivs=ivs,
                                decode=False)
        freq = {l: np.asarray(v) for l, v in taps["expert_freq"].items()}
        counts = freq if counts is None else {
            l: counts[l] + freq[l] for l in counts}
    out = {str(l): (v / len(base)).tolist() for l, v in counts.items()}
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(args.out)


def cmd_eval_gen(args):
    """Batched eval generation with resume-by-skip (eval_coco/i2p/artist shape)."""
    pipe, params, tokenize = _load_pipe(args)
    from diffusion_models_moe_tpu.benchmarks.runner import (EvalRunConfig,
                                                            run_eval)
    ivs = None
    if args.masks:
        from diffusion_models_moe_tpu.erasure.masks import (
            load_masks, neuron_removal_interventions,
            wanda_removal_interventions)
        masks = load_masks(args.masks)
        ivs = (wanda_removal_interventions(masks) if args.mode == "wanda"
               else neuron_removal_interventions(masks))
    if args.prompts_csv:
        from diffusion_models_moe_tpu.data.coco import load_prompt_csv
        prompts, seeds = load_prompt_csv(args.prompts_csv)
    elif args.coco_root:
        from diffusion_models_moe_tpu.data.coco import coco_dataset
        prompts, _ = coco_dataset(args.coco_root, args.n_samples,
                                  seed=args.seed)
        seeds = None
    else:
        base, adj = _prompt_pairs(args)
        prompts, seeds = adj, None
    cfg = EvalRunConfig(out_dir=args.out_dir, batch_size=args.batch,
                        num_steps=args.steps or 50, seed=args.seed,
                        per_prompt_seeds=seeds,
                        save_baseline=not args.no_baseline)
    print(json.dumps(run_eval(pipe, params, tokenize, prompts, cfg, ivs=ivs)))


def cmd_score_dirs(args):
    """FID + perceptual distance between sd_/removed_ directories."""
    import jax
    from diffusion_models_moe_tpu.benchmarks.scores import (
        clip_perceptual_distance, fid_between_dirs, perceptual_between_dirs)
    if args.clip_snapshot:
        from diffusion_models_moe_tpu.benchmarks.fid import make_clip_featurizer
        from diffusion_models_moe_tpu.models.clip_vision import (
            CLIPVisionConfig, CLIPVisionEncoder)
        from diffusion_models_moe_tpu.weights.port_vision import (
            port_clip_vision)
        cfg = CLIPVisionConfig()
        enc = CLIPVisionEncoder(cfg)
        vp = port_clip_vision(args.clip_snapshot, cfg)
        featurize = make_clip_featurizer(enc, vp)
    else:
        from diffusion_models_moe_tpu.models.clip_vision import (
            CLIPVisionEncoder, tiny_vision_config)
        from diffusion_models_moe_tpu.benchmarks.fid import make_clip_featurizer
        cfg = tiny_vision_config()
        enc = CLIPVisionEncoder(cfg)
        vp = enc.init(jax.random.PRNGKey(0),
                      jax.numpy.zeros((1, cfg.image_size, cfg.image_size, 3))
                      )["params"]
        featurize = make_clip_featurizer(enc, vp)
    fid = fid_between_dirs(args.a_dir, args.b_dir, featurize)
    if bool(args.lpips_alexnet) != bool(args.lpips_lins):
        # one flag alone would silently fall back to the CLIP-distance metric
        # the user did not ask for
        raise SystemExit("LPIPS needs BOTH --lpips-alexnet and --lpips-lins")
    if args.lpips_alexnet and args.lpips_lins:
        from diffusion_models_moe_tpu.benchmarks.scores import load_native_lpips
        dist = load_native_lpips(args.lpips_alexnet, args.lpips_lins)
    else:
        dist = clip_perceptual_distance(featurize)
    perc = perceptual_between_dirs(args.a_dir, args.b_dir, dist)
    print(json.dumps({"fid": fid, "perceptual": perc}))


def cmd_protocol(args):
    """Flagship protocols end-to-end on the shipped dataset assets
    (benchmarks/protocols.py; reference: i2p_eval / inference_mem /
    artist_removal CLIs)."""
    import jax
    from diffusion_models_moe_tpu.benchmarks import protocols as proto

    generate_fn = None
    if args.baseline:
        # comparison-model mode (reference: eval_baselines.py + the baseline
        # rows of i2p_eval/eval_coco): the protocol runs over a registered
        # baseline checkpoint instead of the default SD1.5 + interventions
        if not args.snapshot:
            raise SystemExit("--baseline needs --snapshot (the baseline's "
                             "diffusers-layout checkpoint)")
        _maybe_force_cpu(args)
        from diffusion_models_moe_tpu.benchmarks.baselines import (
            load_baseline, make_protocol_generate)
        from diffusion_models_moe_tpu.data.tokenizer import load_tokenizer
        pipe, params, gkw = load_baseline(args.baseline, args.snapshot)
        tokenize = load_tokenizer(os.path.join(args.snapshot, "tokenizer"))
        generate_fn = make_protocol_generate(pipe, gkw, tokenize)
    else:
        pipe, params, tokenize = _load_pipe(args)
    ivs = None
    if args.masks and args.name != "unified":
        # 'unified' parses --masks itself ("name=path,..." per-concept bank)
        from diffusion_models_moe_tpu.erasure.masks import (
            load_masks, wanda_removal_interventions)
        ivs = wanda_removal_interventions(load_masks(args.masks))
    mesh = None
    if args.dp and len(jax.devices()) > 1:
        from diffusion_models_moe_tpu.parallel.mesh import create_mesh
        mesh = create_mesh(dp=len(jax.devices()), tp=1)
    common = dict(ivs=ivs, limit=args.limit or None,
                  num_steps=args.steps or 50, batch_size=args.batch,
                  mesh=mesh, generate_fn=generate_fn)

    def clip_featurize():
        from diffusion_models_moe_tpu.benchmarks.fid import (
            make_clip_featurizer)
        from diffusion_models_moe_tpu.models.clip_vision import (
            CLIPVisionConfig, CLIPVisionEncoder, tiny_vision_config)
        if args.clip_snapshot:
            from diffusion_models_moe_tpu.weights.port_vision import (
                port_clip_vision)
            cfg = CLIPVisionConfig()
            enc = CLIPVisionEncoder(cfg)
            return make_clip_featurizer(enc, port_clip_vision(
                args.clip_snapshot, cfg))
        cfg = tiny_vision_config()
        enc = CLIPVisionEncoder(cfg)
        vp = enc.init(jax.random.PRNGKey(0), jax.numpy.zeros(
            (1, cfg.image_size, cfg.image_size, 3)))["params"]
        return make_clip_featurizer(enc, vp)

    if args.name == "i2p":
        from diffusion_models_moe_tpu.benchmarks.nudity import (
            load_nudenet, load_nudenet_native)
        if args.judge == "none":
            raise SystemExit("i2p needs a NudeNet judge (--judge PATH)")
        if args.judge.endswith(".onnx"):
            # TPU-native path: YOLOv8 forward + in-repo ONNX porter
            detector = load_nudenet_native(args.judge)
        else:
            detector = load_nudenet(args.judge)
        out = proto.i2p_protocol(pipe, params, tokenize, args.out_dir,
                                 detector, variant=args.variant, **common)
    elif args.name == "memorize":
        feat = clip_featurize()
        out = proto.memorization_protocol(
            pipe, params, tokenize, args.out_dir, feat,
            split=args.split if args.split != "" else "", **common)
    elif args.name == "artists":
        text_feat = None
        if args.clip_snapshot:
            # full CLIPModel snapshot: build the text tower + projection so
            # removal accuracy uses the reference's cos(text, image) protocol
            from diffusion_models_moe_tpu.benchmarks.fid import (
                make_clip_text_featurizer)
            from diffusion_models_moe_tpu.models.clip_text import (
                CLIPTextEncoder)
            from diffusion_models_moe_tpu.weights.port import port_clip_text
            from diffusion_models_moe_tpu.weights.port_vision import (
                clip_b32_text_config, port_clip_text_projection)
            tcfg = clip_b32_text_config()
            tparams = port_clip_text(args.clip_snapshot, tcfg)
            tproj = port_clip_text_projection(args.clip_snapshot)
            text_feat = make_clip_text_featurizer(
                CLIPTextEncoder(tcfg), tparams, tokenize, tproj)
        out = proto.artist_removal_protocol(
            pipe, params, tokenize, args.out_dir, clip_featurize(),
            n_artists=args.n_artists, part=args.part, seed=args.seed,
            text_featurize=text_feat, **common)
    elif args.name == "objects":
        classify = _protocol_classifier(args, pipe, params, tokenize,
                                        clip_featurize)
        out = proto.object_erasure_protocol(
            pipe, params, tokenize, args.out_dir, classify,
            target=args.concept or "parachute", **common)
    elif args.name == "debias":
        from diffusion_models_moe_tpu.benchmarks.debias import debias_eval
        from diffusion_models_moe_tpu.data.prompts import professions
        feat = clip_featurize()
        man, woman = _class_embeddings(args, pipe, params, tokenize, feat,
                                       ["a photo of a man",
                                        "a photo of a woman"])
        profs = professions()
        if args.limit:
            profs = profs[:args.limit]
        out = debias_eval(
            pipe, params, tokenize, feat, man, woman, ivs,
            seeds=range(args.seed, args.seed + (args.limit or 4)),
            professions=profs, num_steps=args.steps or 50,
            out_path=os.path.join(args.out_dir, "debias_results.json"))
    elif args.name == "unified":
        # router benchmark (reference: benchmarks/unified_editing.py):
        # per-prompt CLIP concept checkers -> union of fired concepts' masks
        from diffusion_models_moe_tpu.benchmarks.clip_metrics import (
            ConceptChecker, pooled_text_embedding)
        from diffusion_models_moe_tpu.benchmarks.unified_editing import (
            ConceptBank, unified_editing_eval)
        from diffusion_models_moe_tpu.erasure.masks import load_masks
        if not args.masks or "=" not in args.masks:
            raise SystemExit(
                'protocol unified needs --masks "name=path.npz,name2=..."')
        bank_masks = {}
        for pair in args.masks.split(","):
            name, path = pair.split("=", 1)
            bank_masks[name.strip()] = load_masks(path.strip())

        import jax.numpy as jnp

        def text_embed(texts):
            ids = jnp.asarray(np.asarray(tokenize(list(texts))))
            hidden = pipe.text_encoder.apply(
                {"params": params["text_encoder"]}, ids)
            if isinstance(hidden, tuple):
                hidden = hidden[0]
            proj = jnp.eye(hidden.shape[-1], dtype=jnp.float32)
            return np.asarray(jax.device_get(pooled_text_embedding(
                hidden.astype(jnp.float32), ids, proj)))

        anchor = text_embed([args.anchor])[0]
        checkers = {name: ConceptChecker(name, text_embed([name])[0], anchor,
                                         margin=args.margin)
                    for name in bank_masks}
        bank = ConceptBank(checkers=checkers, masks=bank_masks)
        if args.prompts_file:
            from diffusion_models_moe_tpu.data.coco import load_prompt_csv
            prompts, _ = load_prompt_csv(args.prompts_file)
        else:
            prompts = [f"a painting in the style of {n}"
                       for n in bank_masks] + ["a photo of a dog"]
        if args.limit:
            prompts = prompts[:args.limit]
        out = unified_editing_eval(pipe, params, tokenize, prompts,
                                   text_embed(prompts), bank, args.out_dir,
                                   num_steps=args.steps or 50, seed=args.seed)
    else:
        raise SystemExit(f"unknown protocol {args.name}")
    print(json.dumps(out))


def _class_embeddings(args, pipe, params, tokenize, featurize, texts):
    """Class embeddings for zero-shot judging, in the image featurizer's space:
    from --class-embs .npz (real CLIP text embeddings matching a real CLIP
    vision tower), or a clearly-degraded fallback — featurize one baseline
    generation per class prompt as its anchor (dimensionally consistent in any
    config; smoke path, NOT the CLIP joint space)."""
    import jax
    import numpy as np
    if getattr(args, "class_embs", None):
        data = np.load(args.class_embs)
        return [data[k] for k in data.files]
    out = []
    uncond = tokenize([""])
    for i, t in enumerate(texts):
        img, _ = pipe.generate(params, tokenize([t]), uncond,
                               jax.random.PRNGKey(10_000 + i),
                               num_steps=min(args.steps or 50, 8))
        out.append(np.asarray(featurize(np.asarray(img)))[0])
    return out


def _protocol_classifier(args, pipe, params, tokenize, clip_featurize):
    """images -> logits judge for the objects protocol: native ResNet-50 when
    --judge points at a torchvision state dict, else zero-shot CLIP over the
    class list."""
    import numpy as np
    if args.judge and args.judge != "none":
        from diffusion_models_moe_tpu.benchmarks.object_erase import (
            make_resnet_classifier)
        return make_resnet_classifier(args.judge)
    from diffusion_models_moe_tpu.benchmarks.object_erase import (
        make_clip_zero_shot_classifier)
    from diffusion_models_moe_tpu.data.prompts import erasing_objects
    feat = clip_featurize()
    embs = _class_embeddings(args, pipe, params, tokenize, feat,
                             [f"a photo of a {c}" for c in erasing_objects()])
    return make_clip_zero_shot_classifier(feat, np.stack(embs))


def cmd_train(args):
    """ReLUfication fine-tune from an imagefolder — the CLI front door to the
    reference's `accelerate launch train_relufied_sd.py` (its 1,201-line
    training script; SURVEY.md §2.8). Data: --data-dir with
    metadata.{csv,jsonl} (HF imagefolder layout, data/ingest.py); model: a
    diffusers snapshot (--snapshot, VAE encoder included) or the tiny
    random-init config for smoke runs."""
    import jax
    import jax.numpy as jnp
    _maybe_force_cpu(args)
    from diffusion_models_moe_tpu import sd15_config, tiny_config
    from diffusion_models_moe_tpu.data.ingest import imagefolder_batches
    from diffusion_models_moe_tpu.training.train import TrainConfig
    from diffusion_models_moe_tpu.training.trainer import (RunConfig,
                                                           train_relufied)

    vae_decoder_params = None        # only needed for validation-image logging
    if args.snapshot:
        from diffusion_models_moe_tpu.data.tokenizer import load_tokenizer
        from diffusion_models_moe_tpu.weights.port import port_pipeline
        cfg = sd15_config(dtype=jnp.float32, relufied=True)
        ported = port_pipeline(args.snapshot, cfg, include_vae_encoder=True)
        params = {"unet": ported["unet"],
                  "text_encoder": ported["text_encoder"],
                  "vae_encoder": ported["vae_encoder"]}
        vae_decoder_params = ported["vae"]
        tokenize = load_tokenizer(os.path.join(args.snapshot, "tokenizer"))
    else:
        import dataclasses
        from diffusion_models_moe_tpu.models.clip_text import CLIPTextEncoder
        from diffusion_models_moe_tpu.models.unet import UNet2DCondition
        from diffusion_models_moe_tpu.models.vae import VAEEncoder
        cfg = tiny_config()
        cfg = dataclasses.replace(cfg, unet=dataclasses.replace(
            cfg.unet, ff_activation="geglu-relu"))
        lat = 8
        params = {
            "unet": UNet2DCondition(cfg.unet).init(
                jax.random.PRNGKey(0), jnp.zeros((1, lat, lat, 4)),
                jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, cfg.text_encoder.max_length,
                           cfg.unet.cross_attention_dim)))["params"],
            "text_encoder": CLIPTextEncoder(cfg.text_encoder).init(
                jax.random.PRNGKey(1),
                jnp.zeros((1, cfg.text_encoder.max_length),
                          jnp.int32))["params"],
        }
        tokenize = _hash_tokenize(cfg.text_encoder.vocab_size,
                                  cfg.text_encoder.max_length)

    downsample = 2 ** (len(cfg.vae.block_out_channels) - 1)
    resolution = args.resolution or (512 if args.snapshot else 8 * downsample)
    if "vae_encoder" not in params:
        from diffusion_models_moe_tpu.models.vae import VAEEncoder
        params["vae_encoder"] = VAEEncoder(cfg.vae).init(
            jax.random.PRNGKey(2),
            jnp.zeros((1, resolution, resolution, 3)))["params"]

    batches = imagefolder_batches(
        args.data_dir, tokenize, batch_size=args.batch,
        caption_col=args.caption_col, resolution=resolution, seed=args.seed,
        center_crop=args.center_crop)
    tcfg = TrainConfig(
        learning_rate=args.lr, use_ema=args.ema, ft_method=args.ft_method,
        snr_gamma=args.snr_gamma, lr_schedule=args.lr_schedule,
        lr_warmup_steps=args.warmup_steps, max_train_steps=args.max_steps,
        grad_accum_steps=args.grad_accum, optimizer=args.optimizer,
        noise_offset=args.noise_offset,
        input_perturbation=args.input_perturbation,
        prediction_type=args.prediction_type)
    rcfg = RunConfig(out_dir=args.out_dir, max_steps=args.max_steps,
                     checkpoint_every=args.checkpoint_every,
                     log_every=args.log_every, resume=not args.no_resume,
                     validation_every=args.validation_every)
    validation_fn = None
    if args.validation_every > 0:
        from diffusion_models_moe_tpu import StableDiffusionPipeline
        from diffusion_models_moe_tpu.training.trainer import (
            make_validation_logger)
        if vae_decoder_params is None:       # tiny path: random-init decoder
            from diffusion_models_moe_tpu.models.vae import VAEDecoder
            lat = resolution // downsample
            vae_decoder_params = VAEDecoder(cfg.vae).init(
                jax.random.PRNGKey(3), jnp.zeros((1, lat, lat, 4)))["params"]
        pipe = StableDiffusionPipeline(cfg)
        full = {"text_encoder": params["text_encoder"],
                "vae": vae_decoder_params, "unet": params["unet"]}
        validation_fn = make_validation_logger(
            pipe, full, tokenize, [args.validation_prompt],
            os.path.join(args.out_dir, "validation"))
    state = train_relufied(cfg, tcfg, rcfg, batches, params,
                           validation_fn=validation_fn)
    print(json.dumps({"steps": int(state.step), "out_dir": args.out_dir}))


def cmd_vqa(args):
    """Multiple-choice VLM scoring over before/after removal image
    directories — the reference's LLAVAScorer loop (mod_utils.py:195-290).
    `--judge` is an HF llava-1.5 snapshot run NATIVELY on TPU
    (benchmarks/vqa.py:load_llava_native), or any transformers
    image-text-to-text checkpoint with `--judge-kind transformers`."""
    _maybe_force_cpu(args)
    from PIL import Image

    from diffusion_models_moe_tpu.benchmarks.vqa import (
        MultipleChoiceScorer, load_llava_native, load_qwen2vl_native,
        load_transformers_vqa)

    if args.judge_kind == "transformers":
        vqa = load_transformers_vqa(args.judge)
    else:
        loader = (load_qwen2vl_native if args.judge_kind == "qwen"
                  else load_llava_native)
        mesh = None
        if args.tp > 1:
            from diffusion_models_moe_tpu.parallel.mesh import create_mesh
            mesh = create_mesh(tp=args.tp)
        vqa = loader(args.judge, mesh=mesh, quant_int8=args.int8)
    objects = [o.strip() for o in args.objects.split(",")]

    def load_dir(d):
        names = sorted(f for f in os.listdir(d)
                       if f.lower().endswith((".png", ".jpg", ".jpeg")))
        if len(names) != len(objects):
            raise SystemExit(f"{d}: {len(names)} images for "
                             f"{len(objects)} objects")
        return [np.asarray(Image.open(os.path.join(d, f)).convert("RGB"))
                for f in names]

    scorer = MultipleChoiceScorer(vqa, objects, args.concept)
    for before, d, label in ((True, args.before_dir, args.label_before),
                             (False, args.after_dir, args.label_after)):
        if d is None:
            continue
        # batched decode when the judge supports it (native LLaVA/Qwen)
        scorer.score_images(load_dir(d), label, before=before)
    results = scorer.get_results()
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    print(json.dumps(results))


def cmd_iqa(args):
    """CLIP-IQA quality/concept report over three image directories (base /
    concept / after-removal) — the reference's clip_score.py scorer
    (modularity/clip_score.py:85-140), natively on the CLIP towers."""
    import jax
    import jax.numpy as jnp
    _maybe_force_cpu(args)
    from diffusion_models_moe_tpu.benchmarks.fid import (
        make_clip_featurizer, make_clip_text_featurizer)
    from diffusion_models_moe_tpu.benchmarks.protocols import clip_iqa_protocol
    from diffusion_models_moe_tpu.models.clip_text import CLIPTextEncoder
    from diffusion_models_moe_tpu.models.clip_vision import (
        CLIPVisionConfig, CLIPVisionEncoder, tiny_vision_config)

    def load_dir(d):
        from PIL import Image
        names = sorted(f for f in os.listdir(d)
                       if f.lower().endswith((".png", ".jpg", ".jpeg")))
        if not names:
            raise SystemExit(f"no images in {d}")
        out = []
        for f in names:
            img = Image.open(os.path.join(d, f)).convert("RGB")
            # uniform size so mixed-size dirs stack; the CLIP featurizer
            # resizes to its input size anyway
            if img.size != (224, 224):
                img = img.resize((224, 224), Image.BILINEAR)
            out.append(np.asarray(img, np.float32) / 255.0)
        return out

    if args.clip_snapshot:
        from diffusion_models_moe_tpu.config import CLIPTextConfig
        from diffusion_models_moe_tpu.data.tokenizer import load_tokenizer
        from diffusion_models_moe_tpu.weights.port import port_clip_text
        from diffusion_models_moe_tpu.weights.port_vision import (
            port_clip_text_projection, port_clip_vision)
        vcfg = CLIPVisionConfig()
        venc = CLIPVisionEncoder(vcfg)
        image_f = make_clip_featurizer(
            venc, port_clip_vision(args.clip_snapshot, vcfg))
        tcfg = CLIPTextConfig()
        tenc = CLIPTextEncoder(tcfg)
        tparams = port_clip_text(args.clip_snapshot, tcfg)
        # full-CLIPModel snapshots (the layout port_clip_vision reads) keep
        # vocab.json/merges.txt at the snapshot ROOT, not a tokenizer/ subdir
        tokenize = load_tokenizer(args.clip_snapshot)
        proj = port_clip_text_projection(args.clip_snapshot)
        text_f = make_clip_text_featurizer(tenc, tparams, tokenize,
                                           text_projection=proj)
    else:
        # random-init tiny towers: structure smoke test, not a real judge
        vcfg = tiny_vision_config()
        venc = CLIPVisionEncoder(vcfg)
        vparams = venc.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, vcfg.image_size, vcfg.image_size,
                                       3)))["params"]
        image_f = make_clip_featurizer(venc, vparams)
        from diffusion_models_moe_tpu import tiny_config
        tcfg = tiny_config().text_encoder
        tenc = CLIPTextEncoder(tcfg)
        tparams = tenc.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, tcfg.max_length),
                                      jnp.int32))["params"]
        proj = np.asarray(np.random.RandomState(2).randn(
            tcfg.hidden_size, vcfg.projection_dim), np.float32)
        text_f = make_clip_text_featurizer(
            tenc, tparams, _hash_tokenize(tcfg.vocab_size, tcfg.max_length),
            text_projection=proj)

    report = clip_iqa_protocol(load_dir(args.base_dir),
                               load_dir(args.concept_dir),
                               load_dir(args.removed_dir),
                               image_f, text_f, concept=args.concept,
                               out_dir=args.out_dir)
    print(json.dumps(report))


def cmd_check_snapshot(args):
    """Snapshot doctor: validate a local diffusers-layout checkpoint BEFORE a
    long port/eval run. Porting fidelity is the framework's #1 hard part
    (SURVEY.md §7); this surfaces missing files, key drift (exact UNet
    state-dict key diff against the expected topology), and — with --deep —
    runs the real porters component by component."""
    import dataclasses
    _maybe_force_cpu(args)
    import jax
    import jax.numpy as jnp
    from diffusion_models_moe_tpu import sd15_config, sd21_config
    from diffusion_models_moe_tpu.config import sdxl_config

    cfg = {"sd15": sd15_config, "sd21": sd21_config,
           "sdxl": sdxl_config}[args.kind]()
    report = {"snapshot": args.snapshot, "kind": args.kind, "components": {}}

    def tensor_keys(path):
        from safetensors import safe_open
        with safe_open(path, framework="np") as f:
            return list(f.keys())

    # --- file presence + tensor counts -----------------------------------
    expected_files = {
        "unet": "unet/diffusion_pytorch_model.safetensors",
        "vae": "vae/diffusion_pytorch_model.safetensors",
        "text_encoder": "text_encoder/model.safetensors",
        "tokenizer": "tokenizer/vocab.json",
    }
    if args.kind == "sdxl":
        expected_files["text_encoder_2"] = "text_encoder_2/model.safetensors"
        expected_files["tokenizer_2"] = "tokenizer_2/vocab.json"
    for name, rel in expected_files.items():
        p = os.path.join(args.snapshot, rel)
        entry = {"path": rel, "present": os.path.exists(p)}
        if entry["present"] and rel.endswith(".safetensors"):
            entry["n_tensors"] = len(tensor_keys(p))
        report["components"][name] = entry

    # --- exact UNet key census -------------------------------------------
    def expected_unet_keys(u):
        """Diffusers-layout key set for this topology, via a tiny-dim init +
        export roundtrip: shrink dims, PRESERVE topology (incl. channel-
        equality structure, which decides conv_shortcut key presence) — key
        names are dim-independent."""
        from diffusion_models_moe_tpu.models.unet import UNet2DCondition
        from diffusion_models_moe_tpu.weights.export import export_unet
        scale = u.block_out_channels[0] // 8
        tiny = dataclasses.replace(
            u, block_out_channels=tuple(c // scale
                                        for c in u.block_out_channels),
            attention_head_dim=4, cross_attention_dim=16,
            norm_num_groups=4, dtype=jnp.float32, flash_attention=False,
            addition_embed_dim=16 if u.addition_embed_dim else 0,
            addition_time_embed_dim=8 if u.addition_time_embed_dim else 0,
            time_cond_proj_dim=8 if u.time_cond_proj_dim else 0)
        kw = {}
        if tiny.addition_embed_dim:
            kw = {"added_text_embeds": jnp.zeros((1, 16)),
                  "added_time_ids": jnp.zeros((1, 6), jnp.int32)}
        params = UNet2DCondition(tiny).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, u.sample_channels)),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1, 8, 16)), **kw)["params"]
        return set(export_unet(params, tiny))

    unet_entry = report["components"]["unet"]
    expected = None
    if unet_entry["present"] or getattr(args, "baseline_unet", None):
        expected = expected_unet_keys(cfg.unet)
    if unet_entry["present"]:
        u = cfg.unet
        got = set(tensor_keys(os.path.join(args.snapshot,
                                           expected_files["unet"])))
        unet_entry["missing_keys"] = sorted(expected - got)
        unet_entry["unexpected_keys"] = sorted(got - expected)
        unet_entry["keys_ok"] = not unet_entry["missing_keys"]

        # sentinel SHAPES: key names are identical between sd15 and sd21
        # (same topology), so a wrong --kind passes the census; the
        # cross-attention K projection's in-dim and conv_in's channel counts
        # disambiguate (sd15: 768, sd21: 1024, sdxl: 2048). safetensors
        # exposes shapes from the header without loading tensors.
        from safetensors import safe_open
        with safe_open(os.path.join(args.snapshot, expected_files["unet"]),
                       framework="np") as f:
            def shape_of(key):
                return (tuple(f.get_slice(key).get_shape())
                        if key in got else None)
            checks = {}
            k = ("down_blocks.0.attentions.0.transformer_blocks.0"
                 ".attn2.to_k.weight")
            s = shape_of(k)
            if s is not None:
                checks["cross_attention_dim"] = {
                    "got": s[1], "expected": u.cross_attention_dim}
            s = shape_of("conv_in.weight")
            if s is not None:
                checks["sample_channels"] = {
                    "got": s[1], "expected": u.sample_channels}
                checks["block_out_channels[0]"] = {
                    "got": s[0], "expected": u.block_out_channels[0]}
        unet_entry["shape_checks"] = checks
        unet_entry["shapes_ok"] = all(c["got"] == c["expected"]
                                      for c in checks.values())

    # --- deep: run the real porters --------------------------------------
    if args.deep:
        from diffusion_models_moe_tpu.weights.port import (_load_vae_sd,
                                                           port_clip_text,
                                                           port_unet,
                                                           port_vae_decoder,
                                                           port_vae_encoder)
        vae_dir = os.path.join(args.snapshot, "vae")
        vae_sd = {}   # one read serves both VAE porters

        def vae_state():
            if not vae_sd:
                vae_sd["sd"] = _load_vae_sd(vae_dir)
            return vae_sd["sd"]

        porters = {
            "unet": lambda: port_unet(os.path.join(args.snapshot, "unet"),
                                      cfg.unet),
            "text_encoder": lambda: port_clip_text(
                os.path.join(args.snapshot, "text_encoder"),
                cfg.text_encoder),
            "vae": lambda: port_vae_decoder(vae_dir, cfg.vae,
                                            _sd=vae_state()),
            "vae_encoder": lambda: port_vae_encoder(vae_dir, cfg.vae,
                                                    _sd=vae_state()),
        }
        if args.kind == "sdxl":
            from diffusion_models_moe_tpu.pipelines.sdxl import (
                sdxl_text_configs)
            _, tc2 = sdxl_text_configs()
            porters["text_encoder_2"] = lambda: port_clip_text(
                os.path.join(args.snapshot, "text_encoder_2"), tc2)
        for name, fn in porters.items():
            entry = report["components"].setdefault(name, {})
            try:
                tree = fn()
                entry["ported_params"] = int(sum(
                    np.asarray(x).size
                    for x in jax.tree_util.tree_leaves(tree)))
                entry["port_ok"] = True
            except Exception as e:  # noqa: BLE001 — doctor reports, not raises
                entry["port_ok"] = False
                entry["port_error"] = f"{type(e).__name__}: {str(e)[:200]}"

    # --- baseline edited-UNet file (UCE/ESD publishing format) ------------
    if getattr(args, "baseline_unet", None):
        from diffusion_models_moe_tpu.weights.port import (
            port_edited_unet, validate_edited_unet)
        entry = validate_edited_unet(args.baseline_unet, cfg.unet,
                                     expected_keys=expected)
        if args.deep and entry.get("keys_ok", entry.get("load_ok")):
            try:
                tree = port_edited_unet(args.baseline_unet, cfg.unet)
                entry["ported_params"] = int(sum(
                    np.asarray(x).size
                    for x in jax.tree_util.tree_leaves(tree)))
                entry["port_ok"] = True
            except Exception as e:  # noqa: BLE001 — doctor reports
                entry["port_ok"] = False
                entry["port_error"] = f"{type(e).__name__}: {str(e)[:200]}"
        report["components"]["baseline_unet"] = entry

    report["ok"] = all(c.get("present", True) and c.get("keys_ok", True)
                       and c.get("shapes_ok", True) and c.get("port_ok", True)
                       and c.get("load_ok", True)
                       for c in report["components"].values())
    print(json.dumps(report, indent=2))
    return report


def cmd_create_datasets(args):
    """The reference's benchmarks/create_datasets.py:1-18 as a subcommand:
    artwork CSV (artist -> concept) + I2P prompts (concept='naked') ->
    combined_prompts.csv."""
    from diffusion_models_moe_tpu.data.prompts import combine_prompt_datasets
    n = combine_prompt_datasets(args.artwork_csv, args.i2p_file, args.out)
    print(json.dumps({"rows": n, "out": args.out}))
    return 0


def cmd_parity_run(args):
    """The snapshot-gated acceptance run (BASELINE.json criterion: 'CLIP/FID
    parity after expert removal'). ONE command executes the reference's
    product flow end to end — moefy -> wanda skilled neurons at the concept's
    operating point -> removal eval -> union-over-timesteps bake -> scores —
    and writes {out_dir}/PARITY_RUN.md + parity_run.json with provenance.

    Runs today against the tiny random-init model (omit --snapshot; machinery
    checks only, images are noise); runs the real acceptance the day a local
    SD1.5 snapshot exists (reference real-weights flow: utils.py:64-138;
    operating points: benchmarks/artist_removal.py best_ckpt_dict /
    eval_coco.py:40-60)."""
    import time

    import jax
    import jax.numpy as jnp

    pipe, params, tokenize = _load_pipe(args)
    real = bool(args.snapshot)
    concept = args.concept or "Van Gogh"
    steps = args.steps or (50 if real else 4)
    out = args.out_dir
    os.makedirs(out, exist_ok=True)
    report: dict = {
        "concept": concept, "real_weights": real, "num_steps": steps,
        "snapshot": args.snapshot, "ts_unix": int(time.time()),
        "commit": _git_rev(), "seed": args.seed,
    }

    # ---- 1. moefy: cluster FFNs into experts --------------------------------
    from diffusion_models_moe_tpu.moefication.moefy import (
        build_moe_interventions, moefy_unet)
    labels_path = os.path.join(out, "labels.npz")
    # default expert size: the reference's 20 at SD dims; 16 divides every
    # tiny-config FF width (128..512) for the dbg run
    expert_size = (args.expert_size if args.expert_size is not None
                   else (20 if real else 16))
    labels = moefy_unet(params["unet"], pipe.config.unet,
                        expert_size=expert_size, seed=args.seed,
                        save_path=labels_path)
    report["moefy"] = {"labels": labels_path,
                      "experts_per_layer": {str(k): int(v.max()) + 1
                                            for k, v in labels.items()}}

    # routing smoke: expert_freq tap under MoE interventions
    from diffusion_models_moe_tpu.taps import TapSpec
    cond0 = tokenize([f"a painting in the style of {concept}"])
    _, taps = pipe.generate(params, cond0, np.zeros_like(cond0),
                            jax.random.PRNGKey(args.seed), num_steps=steps,
                            ivs=build_moe_interventions(labels, 0.3),
                            tap=TapSpec(expert_freq=True), decode=False)
    freq0 = np.asarray(next(iter(taps["expert_freq"].values())))
    report["moefy"]["routing_active_experts_l0"] = int((freq0 > 0).sum())

    # ---- 2. wanda skilled neurons at the operating point --------------------
    from diffusion_models_moe_tpu.analysis.collect import wanda_pipeline
    from diffusion_models_moe_tpu.data.operating_points import (
        union_select_ratio, wanda_skill_ratio)
    base, adj = _prompt_pairs(args)
    skill_ratio = (args.skill_ratio if args.skill_ratio is not None
                   else wanda_skill_ratio(concept, default=0.05))
    masks = wanda_pipeline(pipe, params, tokenize, base, adj,
                           skill_ratio=skill_ratio, seed=args.seed,
                           num_steps=steps,
                           cache_dir=os.path.join(out, "norm_cache"))
    from diffusion_models_moe_tpu.erasure.masks import (
        bake_wanda_masks, save_masks, union_over_timesteps,
        wanda_removal_interventions)
    masks_path = os.path.join(out, "wanda_masks.npz")
    save_masks(masks_path, masks)
    report["wanda"] = {
        "masks": masks_path, "skill_ratio": skill_ratio,
        "skilled_entries": int(sum(int(m.sum()) for m in masks.values())),
        "prompts": len(base)}

    # ---- 3. removal eval: baseline + removed image pairs --------------------
    from diffusion_models_moe_tpu.benchmarks.runner import (EvalRunConfig,
                                                            run_eval)
    img_dir = os.path.join(out, "images")
    ivs = wanda_removal_interventions(masks)
    stats = run_eval(pipe, params, tokenize, adj,
                     EvalRunConfig(out_dir=img_dir, batch_size=args.batch,
                                   num_steps=steps, seed=args.seed), ivs=ivs)
    report["eval"] = stats

    # ---- 4. union-over-timesteps bake + bake==dynamic parity ----------------
    union_ratio = (args.union_ratio if args.union_ratio is not None
                   else union_select_ratio(concept, default=0.3))
    static = union_over_timesteps(masks, union_ratio)
    baked_unet = bake_wanda_masks(params["unet"], pipe.config.unet, static)
    from diffusion_models_moe_tpu.weights.export import (export_unet,
                                                         save_safetensors)
    baked_path = os.path.join(out, "baked_unet.safetensors")
    save_safetensors(export_unet(baked_unet, pipe.config.unet), baked_path)
    # machinery parity: the baked checkpoint must reproduce the dynamic
    # static-union intervention bit-for-bit-ish on a fixed seed (the
    # reference's bake-then-check, save_union_over_time.py:243-276)
    ivs_static = wanda_removal_interventions(static)
    key = jax.random.PRNGKey(args.seed + 1)
    lat_dyn, _ = pipe.generate(params, cond0, np.zeros_like(cond0), key,
                               num_steps=steps, ivs=ivs_static, decode=False)
    lat_baked, _ = pipe.generate(dict(params, unet=baked_unet), cond0,
                                 np.zeros_like(cond0), key, num_steps=steps,
                                 decode=False)
    bake_max_abs = float(np.max(np.abs(np.asarray(lat_dyn, np.float32)
                                       - np.asarray(lat_baked, np.float32))))
    # bf16 real runs accumulate rounding over 50 steps; fp32 tiny is ~1e-5
    bake_tol = 1e-4 if pipe.config.unet.dtype == jnp.float32 else 0.1
    report["bake"] = {"baked_unet": baked_path, "union_ratio": union_ratio,
                      "pruned": {str(l): int(m.sum())
                                 for l, m in static.items()},
                      "bake_vs_dynamic_max_abs": bake_max_abs,
                      "parity_ok": bake_max_abs < bake_tol}

    # ---- 5. scores: CLIP-feature FID + perceptual distance ------------------
    from diffusion_models_moe_tpu.benchmarks.fid import make_clip_featurizer
    from diffusion_models_moe_tpu.benchmarks.scores import (
        clip_perceptual_distance, fid_between_dirs, perceptual_between_dirs)
    clip_snap = getattr(args, "clip_snapshot", None)
    if clip_snap:
        from diffusion_models_moe_tpu.models.clip_vision import (
            CLIPVisionConfig, CLIPVisionEncoder)
        from diffusion_models_moe_tpu.weights.port_vision import (
            port_clip_vision)
        vcfg = CLIPVisionConfig()
        venc = CLIPVisionEncoder(vcfg)
        featurize = make_clip_featurizer(venc, port_clip_vision(clip_snap,
                                                                vcfg))
    else:
        from diffusion_models_moe_tpu.models.clip_vision import (
            CLIPVisionEncoder, tiny_vision_config)
        vcfg = tiny_vision_config()
        venc = CLIPVisionEncoder(vcfg)
        featurize = make_clip_featurizer(
            venc, venc.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, vcfg.image_size, vcfg.image_size,
                                       3)))["params"])
    fid = fid_between_dirs(img_dir, img_dir, featurize)
    perc = perceptual_between_dirs(img_dir, img_dir,
                                   clip_perceptual_distance(featurize))
    report["scores"] = {"clip_fid_base_vs_removed": fid,
                        "clip_perceptual_base_vs_removed": perc,
                        "clip_featurizer": ("ported" if clip_snap
                                            else "tiny-random (dbg)")}

    # ---- 6. serving-mode A/B (VERDICT r3 #6): the acceptance run must also
    # cover the approximate serving leg it will be judged under — fixed-seed
    # quality deltas of --mode vs the exact path, same intervention/key -----
    mode = getattr(args, "mode", None)
    if mode:
        import dataclasses
        # mode -> (env knobs, DeepCache interval, tier rel-err bound):
        # exact modes must be bit-identical (1e-6); exact-tier kernel modes
        # sit at dtype-rounding scale (0.02 covers bf16 end-to-end; the
        # full-geometry numbers live in quality_modes.json); DeepCache modes
        # approximate but must stay far under the ~1.4 decorrelated floor.
        # Covers every promoted/bench-advertised leg (VERDICT r4 item 7).
        MODE_KNOBS: dict = {
            "pad_proj": ({"DMOE_PAD_PROJ": "1"}, 0, 1e-6),
            "dc3": ({"DMOE_PAD_PROJ": "0"}, 3, 0.5),
            "dc3_pad": ({"DMOE_PAD_PROJ": "1"}, 3, 0.5),
            "fff_pad": ({"DMOE_PAD_PROJ": "1", "DMOE_FF_FUSED": "1"}, 0,
                        0.02),
            "chain_pad": ({"DMOE_PAD_PROJ": "1", "DMOE_CONV_CHAIN": "1"}, 0,
                          0.02),
            "chain16_pad": ({"DMOE_PAD_PROJ": "1", "DMOE_CONV_CHAIN": "1",
                             "DMOE_CHAIN_SHAPES": "16"}, 0, 0.02),
            "winof_pad": ({"DMOE_PAD_PROJ": "1", "DMOE_WINOGRAD": "1",
                           "DMOE_WINO_FUSED": "1"}, 0, 0.02),
            "attnabs_pad": ({"DMOE_PAD_PROJ": "1", "DMOE_ATTN_ABSORB": "1"},
                            0, 0.02),
            "attnabs_fff_pad": ({"DMOE_PAD_PROJ": "1",
                                 "DMOE_ATTN_ABSORB": "1",
                                 "DMOE_FF_FUSED": "1"}, 0, 0.02),
            "dc3_fff_pad": ({"DMOE_PAD_PROJ": "1", "DMOE_FF_FUSED": "1"}, 3,
                            0.5),
            "dc3_attnabs_fff_pad": ({"DMOE_PAD_PROJ": "1",
                                     "DMOE_ATTN_ABSORB": "1",
                                     "DMOE_FF_FUSED": "1"}, 3, 0.5),
        }
        if mode not in MODE_KNOBS:
            raise SystemExit(f"--mode must be one of {list(MODE_KNOBS)}")
        knobs, dc, tier_bound = MODE_KNOBS[mode]
        saved = {k: os.environ.get(k) for k in knobs}
        os.environ.update(knobs)
        try:
            cfg_m = pipe.config
            if dc:
                cfg_m = dataclasses.replace(cfg_m, deep_cache_interval=dc)
            if knobs.get("DMOE_WINOGRAD") == "1":
                # winograd binds via config, not env (quality_modes._build)
                cfg_m = dataclasses.replace(
                    cfg_m,
                    unet=dataclasses.replace(cfg_m.unet, conv_winograd=True),
                    vae=dataclasses.replace(cfg_m.vae, conv_winograd=True))
            pipe_m = type(pipe)(cfg_m)   # fresh instance: knobs bind at trace
            lat_m, _ = pipe_m.generate(params, cond0, np.zeros_like(cond0),
                                       key, num_steps=steps, ivs=ivs_static,
                                       decode=False)
        finally:
            for k, v in saved.items():
                (os.environ.pop(k, None) if v is None
                 else os.environ.__setitem__(k, v))
        a = np.asarray(lat_dyn, np.float32)
        m_ = np.asarray(lat_m, np.float32)
        rel = float(np.linalg.norm(m_ - a) / (np.linalg.norm(a) + 1e-12))
        mse = float(np.mean((m_ - a) ** 2))
        # committed-matrix cross-check: if the serving matrix is on disk
        # (repo-root tooling), attach the mode's full-geometry row so the
        # day-one real-weights run adjudicates against the same evidence
        matrix_row = None
        for qp in ("quality_modes.json",
                   os.path.join(os.path.dirname(os.path.dirname(
                       os.path.abspath(__file__))), "quality_modes.json")):
            try:
                with open(qp) as f:
                    matrix_row = json.load(f)["modes"].get(mode)
                break
            except (FileNotFoundError, KeyError, ValueError):
                continue
        report["serving_mode"] = {
            "mode": mode, "knobs": knobs, "deep_cache": dc,
            "latent_rel_err_vs_exact": round(rel, 6),
            "latent_mse_vs_exact": mse,
            "tier_bound": tier_bound,
            "tier_ok": bool(rel <= tier_bound),
            "committed_matrix_row": matrix_row,
            "note": ("approximate-leg quality vs the exact path on the SAME "
                     "removal intervention, key, and steps — the day-one "
                     "real-weights run produces this verdict alongside the "
                     "exact scores")}

    report["acceptance"] = {
        "bake_parity_ok": report["bake"]["parity_ok"],
        "pipeline_complete": True,
        "real_weights_run": real,
        "note": ("compare scores against the reference's operating table "
                 "(BASELINE.md) — this was a REAL-weights run" if real else
                 "dbg mode: random weights — machinery verified, image "
                 "quality metrics are not meaningful; re-run with "
                 "--snapshot the day a local SD1.5 snapshot exists"),
    }

    with open(os.path.join(out, "parity_run.json"), "w") as f:
        json.dump(report, f, indent=1)
    _write_parity_md(os.path.join(out, "PARITY_RUN.md"), report)
    print(json.dumps(report["acceptance"]))
    return report


def _git_rev() -> str:
    import subprocess
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, timeout=10).stdout.strip()
    except Exception:
        return ""


def _write_parity_md(path: str, r: dict) -> None:
    import datetime
    ts = datetime.datetime.fromtimestamp(r["ts_unix"],
                                         datetime.timezone.utc).isoformat()
    mode = ("REAL WEIGHTS" if r["real_weights"]
            else "dbg (tiny random-init — machinery check only)")
    lines = [
        "# Parity run",
        "",
        f"- concept: **{r['concept']}**  |  mode: **{mode}**",
        f"- commit `{r['commit']}`  |  {ts}  |  steps {r['num_steps']}  |  "
        f"seed {r['seed']}",
        f"- snapshot: `{r['snapshot']}`",
        "",
        "| stage | key result |",
        "|---|---|",
        f"| moefy | experts/layer {list(r['moefy']['experts_per_layer'].values())[:4]}…, "
        f"{r['moefy']['routing_active_experts_l0']} experts active (L0) |",
        f"| wanda | skill_ratio {r['wanda']['skill_ratio']}, "
        f"{r['wanda']['skilled_entries']} skilled entries over "
        f"{r['wanda']['prompts']} prompt pairs |",
        f"| removal eval | {r['eval']} |",
        f"| bake | union_ratio {r['bake']['union_ratio']}, "
        f"max&#124;baked−dynamic&#124; = {r['bake']['bake_vs_dynamic_max_abs']:.2e} "
        f"→ parity_ok={r['bake']['parity_ok']} |",
        f"| scores | CLIP-FID(base, removed) = "
        f"{r['scores']['clip_fid_base_vs_removed']:.4f}, perceptual mean = "
        f"{r['scores']['clip_perceptual_base_vs_removed']['mean']:.4f} "
        f"over n={r['scores']['clip_perceptual_base_vs_removed']['n']} "
        f"({r['scores']['clip_featurizer']}) |",
    ]
    if "serving_mode" in r:
        sm = r["serving_mode"]
        lines.append(
            f"| serving mode | {sm['mode']}: latent rel-err vs exact = "
            f"{sm['latent_rel_err_vs_exact']} (same intervention/key) |")
    lines += [
        "",
        f"**Acceptance:** {r['acceptance']['note']}",
        "",
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines))


def cmd_serve(args):
    """Line-oriented serving loop over the batched engine (serving.py):
    stdin lines `seed<TAB>prompt` (or just `prompt`), PNGs written to
    --out-dir, one result line per request on stdout. A transport-agnostic
    front door: wrap it in whatever RPC layer the deployment uses."""
    import sys

    pipe, params, tokenize = _load_pipe(args)
    from diffusion_models_moe_tpu.serving import ServingEngine
    ivs = None
    if args.labels:
        from diffusion_models_moe_tpu.moefication.moefy import (
            build_moe_interventions, load_labels)
        ivs = build_moe_interventions(load_labels(args.labels), args.topk)
    os.makedirs(args.out_dir, exist_ok=True)
    eng = ServingEngine(pipe, params, tokenize, batch_size=args.batch,
                        num_steps=args.steps or 50, ivs=ivs,
                        max_wait_ms=args.max_wait_ms)
    import queue as _queue
    import threading

    from PIL import Image

    # Results stream as they complete (a request/response client must not wait
    # for stdin EOF), and completed images never accumulate unboundedly: the
    # writer drains futures in submit order while stdin is still open.
    done_q: "_queue.Queue" = _queue.Queue()

    def _writer():
        while True:
            item = done_q.get()
            if item is None:
                return
            fut, path = item
            try:
                Image.fromarray(fut.result()).save(path)
                print(path, flush=True)
            except Exception as e:
                print(f"ERROR {path}: {e}", flush=True)

    n = 0
    with eng:
        wt = threading.Thread(target=_writer, daemon=True)
        wt.start()
        for line in sys.stdin:
            line = line.rstrip("\n")
            if not line:
                continue
            seed_s, _, prompt = line.partition("\t")
            if not prompt:
                seed_s, prompt = str(args.seed), seed_s
            try:
                seed = int(seed_s)
            except ValueError:
                print(f"ERROR bad seed {seed_s!r} (line: {line[:80]!r})",
                      flush=True)
                continue
            path = os.path.join(args.out_dir, f"img_{n:05d}.png")
            done_q.put((eng.submit(prompt, seed=seed), path))
            n += 1
        done_q.put(None)
        wt.join()
    print(json.dumps({"served": eng.stats.requests,
                      "batches": eng.stats.batches,
                      "mean_fill": round(eng.stats.mean_fill, 3),
                      "images_per_second":
                          round(eng.stats.images_per_second, 4)}))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="diffusion_models_moe_tpu")
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp, concept=False):
        sp.add_argument("--snapshot", default=None)
        sp.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (smoke tests)")
        sp.add_argument("--seed", type=int, default=0)
        sp.add_argument("--steps", type=int, default=None)
        sp.add_argument("--relufied", action="store_true")
        if concept:
            sp.add_argument("--concept", default=None)
            sp.add_argument("--subjects-file", default=None)
            sp.add_argument("--limit", type=int, default=0)

    sp = sub.add_parser("moefy"); common(sp)
    sp.add_argument("--expert-size", type=int, default=20)
    sp.add_argument("--method", default="sinkhorn")
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_moefy)

    sp = sub.add_parser("generate"); common(sp)
    sp.add_argument("--prompt", required=True)
    sp.add_argument("--labels", default=None)
    sp.add_argument("--topk", type=float, default=0.3)
    sp.add_argument("--out", default="out.png")
    sp.set_defaults(fn=cmd_generate)

    sp = sub.add_parser("serve"); common(sp)
    sp.add_argument("--batch", type=int, default=8)
    sp.add_argument("--max-wait-ms", type=float, default=50.0)
    sp.add_argument("--labels", default=None)
    sp.add_argument("--topk", type=float, default=0.3)
    sp.add_argument("--out-dir", default="served")
    sp.add_argument("--int8", action="store_true",
                    help="int8 W8A8 serving mode (outputs differ from bf16)")
    sp.add_argument("--winograd", action="store_true",
                    help="Winograd 3x3-conv serving mode (DMOE_WINO_TILE=4 "
                         "for F(4x4,3x3); composes with --int8)")
    sp.add_argument("--deep-cache", type=int, default=0, metavar="N",
                    help="DeepCache serving mode: full UNet every N-th step, "
                         "cached-deep-feature shallow forward otherwise "
                         "(approximate; composes with --int8/--winograd)")
    sp.set_defaults(fn=cmd_serve)

    sp = sub.add_parser("wanda"); common(sp, concept=True)
    sp.add_argument("--skill-ratio", type=float, default=None,
                    help="top fraction of Wanda columns per (t,l); defaults "
                         "to the reference's per-concept operating point "
                         "(data/operating_points.py), else 0.05")
    sp.add_argument("--cache-dir", default=None)
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_wanda)

    sp = sub.add_parser("ttest"); common(sp, concept=True)
    sp.add_argument("--conf", type=float, default=0.05)
    sp.add_argument("--save-predictivity", default=None)
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_ttest)

    sp = sub.add_parser("remove"); common(sp, concept=True)
    sp.add_argument("--masks", required=True)
    sp.add_argument("--mode", choices=["neurons", "wanda"], default="wanda")
    sp.add_argument("--batch", type=int, default=4)
    sp.add_argument("--out-dir", required=True)
    sp.set_defaults(fn=cmd_remove)

    sp = sub.add_parser("bake-union"); common(sp)
    sp.add_argument("--masks", required=True)
    sp.add_argument("--ratio", type=float, default=0.3)
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_bake_union)

    sp = sub.add_parser("sparsity"); common(sp, concept=True)
    sp.add_argument("--out", default=None)
    sp.set_defaults(fn=cmd_sparsity)

    sp = sub.add_parser("expert-freq"); common(sp, concept=True)
    sp.add_argument("--labels", required=True)
    sp.add_argument("--topk", type=float, default=0.3)
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_expert_freq)

    sp = sub.add_parser("eval-gen"); common(sp, concept=True)
    sp.add_argument("--masks", default=None)
    sp.add_argument("--mode", choices=["neurons", "wanda"], default="wanda")
    sp.add_argument("--prompts-csv", default=None)
    sp.add_argument("--coco-root", default=None)
    sp.add_argument("--n-samples", type=int, default=100)
    sp.add_argument("--batch", type=int, default=4)
    sp.add_argument("--no-baseline", action="store_true")
    sp.add_argument("--out-dir", required=True)
    sp.set_defaults(fn=cmd_eval_gen)

    sp = sub.add_parser("score-dirs")
    sp.add_argument("--a-dir", required=True)
    sp.add_argument("--b-dir", required=True)
    sp.add_argument("--clip-snapshot", default=None)
    # native LPIPS (models/backbones.py): torchvision alexnet + lpips lin heads
    sp.add_argument("--lpips-alexnet", default=None)
    sp.add_argument("--lpips-lins", default=None)
    sp.set_defaults(fn=cmd_score_dirs)

    sp = sub.add_parser("protocol"); common(sp, concept=True)
    sp.add_argument("name", choices=["i2p", "memorize", "artists", "objects",
                                     "debias", "unified"])
    sp.add_argument("--out-dir", required=True)
    sp.add_argument("--masks", default=None,
                    help="wanda mask npz to apply as the intervention")
    sp.add_argument("--batch", type=int, default=4)
    sp.add_argument("--dp", action="store_true",
                    help="shard batches over all local devices")
    sp.add_argument("--variant", default="", help="i2p prompt-file variant")
    sp.add_argument("--split", default="", help="memorize split (0-19)")
    sp.add_argument("--n-artists", type=int, default=100)
    sp.add_argument("--part", type=int, default=1)
    sp.add_argument("--judge", default="none",
                    help="NudeNet path (i2p; a .onnx file runs the native "
                         "TPU detector) / ResNet-50 state dict (objects)")
    sp.add_argument("--clip-snapshot", default=None)
    sp.add_argument("--class-embs", default=None,
                    help=".npz of class text embeddings in the featurizer's "
                         "space (objects/debias zero-shot judges)")
    sp.add_argument("--prompts-file", default=None,
                    help="prompt CSV for 'unified' (combined artists+i2p)")
    sp.add_argument("--baseline", default=None,
                    help="run over a registry baseline (uce/esd/sld/sd2/...)"
                         " loaded from --snapshot (benchmarks/baselines.py)")
    sp.add_argument("--anchor", default="a photo",
                    help="no-concept anchor text for 'unified' checkers")
    sp.add_argument("--margin", type=float, default=0.0,
                    help="checker margin for 'unified'")
    sp.set_defaults(fn=cmd_protocol)

    sp = sub.add_parser("vqa")
    sp.add_argument("--judge", required=True,
                    help="llava-1.5 snapshot (native TPU judge) or "
                         "transformers checkpoint path")
    sp.add_argument("--judge-kind", default="native",
                    choices=["native", "qwen", "transformers"],
                    help="native = llava-1.5 on TPU, qwen = Qwen2-VL on TPU, "
                         "transformers = any local image-text-to-text model")
    sp.add_argument("--before-dir", default=None)
    sp.add_argument("--after-dir", default=None)
    sp.add_argument("--objects", required=True,
                    help="comma-separated ground-truth object per image "
                         "(sorted filename order)")
    sp.add_argument("--concept", required=True,
                    help="style/gender/scene question key (e.g. 'Van Gogh')")
    sp.add_argument("--label-before", type=int, default=2,
                    help="expected 1-based option before removal "
                         "(2 = concept present)")
    sp.add_argument("--label-after", type=int, default=1)
    sp.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel the judge LM over this many chips "
                         "(13B needs tp on v5e)")
    sp.add_argument("--int8", action="store_true",
                    help="W8A8 judge LM projections")
    sp.add_argument("--out", default=None)
    sp.add_argument("--cpu", action="store_true")
    sp.set_defaults(fn=cmd_vqa)

    sp = sub.add_parser("iqa")
    sp.add_argument("--base-dir", required=True)
    sp.add_argument("--concept-dir", required=True)
    sp.add_argument("--removed-dir", required=True)
    sp.add_argument("--concept", required=True,
                    help="per-concept test-prompt key (e.g. 'Van Gogh')")
    sp.add_argument("--out-dir", default=None)
    sp.add_argument("--clip-snapshot", default=None)
    sp.add_argument("--cpu", action="store_true")
    sp.set_defaults(fn=cmd_iqa)

    sp = sub.add_parser("check-snapshot")
    sp.add_argument("--snapshot", required=True)
    sp.add_argument("--kind", default="sd15", choices=["sd15", "sd21", "sdxl"])
    sp.add_argument("--cpu", action="store_true")
    sp.add_argument("--deep", action="store_true",
                    help="run the real porters component by component")
    sp.add_argument("--baseline-unet", default=None,
                    help="also validate an edited-UNet state-dict file "
                         "(the UCE/ESD publishing format: .pt/.bin/"
                         ".safetensors) against the --kind topology")
    sp.set_defaults(fn=cmd_check_snapshot)

    sp = sub.add_parser(
        "create-datasets",
        help="merge an artwork-prompts CSV with an I2P prompt list into one "
             "combined eval CSV (reference: benchmarks/create_datasets.py)")
    sp.add_argument("--artwork-csv", required=True)
    sp.add_argument("--i2p-file", required=True)
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_create_datasets)

    sp = sub.add_parser(
        "parity-run",
        help="snapshot-gated acceptance run: moefy->wanda->remove->bake->"
             "score in one command, writes PARITY_RUN.md")
    common(sp, concept=True)
    sp.add_argument("--out-dir", required=True)
    sp.add_argument("--batch", type=int, default=4)
    sp.add_argument("--expert-size", type=int, default=None,
                    help="default 20 (real) / 16 (dbg tiny)")
    sp.add_argument("--skill-ratio", type=float, default=None,
                    help="default: the concept's reference operating point")
    sp.add_argument("--union-ratio", type=float, default=None,
                    help="default: the concept's reference select_ratio")
    sp.add_argument("--clip-snapshot", default=None,
                    help="ported CLIP vision tower for real FID/perceptual")
    sp.add_argument("--mode", default=None,
                    help="also A/B one serving mode vs the exact path "
                         "(pad_proj|dc3|dc3_pad|fff_pad|chain_pad)")
    sp.set_defaults(fn=cmd_parity_run)

    sp = sub.add_parser("train"); common(sp)
    sp.add_argument("--data-dir", required=True,
                    help="imagefolder with metadata.{csv,jsonl}")
    sp.add_argument("--out-dir", required=True)
    sp.add_argument("--caption-col", default="text")
    sp.add_argument("--resolution", type=int, default=None,
                    help="default 512 (snapshot) / tiny-native (random init)")
    sp.add_argument("--batch", type=int, default=4)
    sp.add_argument("--lr", type=float, default=1e-5)
    sp.add_argument("--max-steps", type=int, default=1000)
    sp.add_argument("--checkpoint-every", type=int, default=500)
    sp.add_argument("--log-every", type=int, default=50)
    sp.add_argument("--warmup-steps", type=int, default=0)
    sp.add_argument("--lr-schedule", default="constant",
                    choices=["constant", "cosine", "linear"])
    # kept in sync with training.train.FT_METHODS (test_cli asserts it; a
    # live import here would drag jax into `--help`)
    sp.add_argument("--ft-method", default="full",
                    choices=["full", "attention", "norm", "bias", "ff",
                             "norm_bias", "norm_bias_attention"])
    sp.add_argument("--snr-gamma", type=float, default=None)
    sp.add_argument("--grad-accum", type=int, default=1)
    sp.add_argument("--optimizer", default="adamw",
                    choices=["adamw", "adafactor"])
    sp.add_argument("--ema", action="store_true")
    sp.add_argument("--noise-offset", type=float, default=0.0)
    sp.add_argument("--input-perturbation", type=float, default=0.0)
    sp.add_argument("--prediction-type", default="epsilon",
                    choices=["epsilon", "v_prediction"])
    sp.add_argument("--validation-every", type=int, default=0,
                    help="generate a validation image every N steps")
    sp.add_argument("--validation-prompt", default="a photo of a dog")
    sp.add_argument("--center-crop", action="store_true")
    sp.add_argument("--no-resume", action="store_true")
    sp.set_defaults(fn=cmd_train)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
