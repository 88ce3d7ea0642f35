"""External-baseline registry: run any protocol over comparison models.

The reference evaluates erasure against published baselines — UCE, ESD,
Concept-Ablation, Forget-Me-Not, Selective-Amnesia, SLD, SD2/2.1 — by loading
their edited checkpoints or alternative pipelines (reference:
benchmarks/eval_coco.py:70-101, i2p_eval.py:134-194, eval_baselines.py). Most
of those ship as diffusers-layout SD1.x checkpoints with an edited UNet, so
here a baseline is (config preset, snapshot layout, optional pipeline wrapper);
`load_baseline` returns a ready (pipe, params, generate_kwargs) triple that
any benchmarks/protocols.py driver accepts.

No baseline weights exist in this environment (no network) — the registry is
the code path; point `snapshot` at a local copy of the baseline's checkpoint.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class BaselineSpec:
    """How to instantiate a comparison model.

    kind:
      sd15-edited  diffusers SD1.x layout with an edited/fine-tuned UNet
                   (UCE, ESD, Concept-Ablation, Forget-Me-Not,
                   Selective-Amnesia all publish in this form)
      sd15-sld     stock SD1.4 + Safe Latent Diffusion guidance at generate
      sd2x         SD2/SD2.1 geometry (v-prediction for the 768 variant)
    """
    kind: str
    description: str
    v_prediction: bool = False


BASELINES: dict[str, BaselineSpec] = {
    "uce": BaselineSpec("sd15-edited", "Unified Concept Editing checkpoint"),
    "esd": BaselineSpec("sd15-edited", "Erased Stable Diffusion checkpoint"),
    "concept-ablation": BaselineSpec("sd15-edited",
                                     "Concept Ablation checkpoint"),
    "forget-me-not": BaselineSpec("sd15-edited", "Forget-Me-Not checkpoint"),
    "selective-amnesia": BaselineSpec("sd15-edited",
                                      "Selective Amnesia checkpoint"),
    "sld": BaselineSpec("sd15-sld", "SD1.4 + Safe Latent Diffusion guidance"),
    # the reference's SD2 comparison model is stabilityai/stable-diffusion-2
    # — the 768 v-prediction model (utils.py:91-95 pairs it with Euler; here
    # the v-pred path runs ddim/dpm, since euler+v-pred is rejected as
    # numerically unsupported — pipelines/stable_diffusion.py:63-74)
    "sd2": BaselineSpec("sd2x", "Stable Diffusion 2 (768, v-pred)",
                        v_prediction=True),
    "sd2-base": BaselineSpec("sd2x", "Stable Diffusion 2 base (512, epsilon)"),
    "sd2.1": BaselineSpec("sd2x", "Stable Diffusion 2.1 (768, v-pred)",
                          v_prediction=True),
    # this framework's own product path: a union-timesteps baked checkpoint
    "union-timesteps": BaselineSpec(
        "sd15-edited", "wanda union-over-timesteps baked checkpoint "
                       "(erasure/masks.py:bake_wanda_masks output)"),
}


def load_baseline(name: str, snapshot: str, dtype=jnp.bfloat16,
                  edited_unet: Optional[str] = None,
                  delta: Optional[str] = None, config=None):
    """-> (pipe, params, generate_kwargs). `snapshot` is a local
    diffusers-layout directory for the BASE checkpoint (the baselines edit
    SD1.4 — reference: eval_coco.py:96-101 builds the pipeline from
    CompVis/stable-diffusion-v1-4 and swaps the UNet).

    `edited_unet`: path to a whole-UNet state-dict file — the UCE/ESD
    publishing format ('erased-...-method_replace.pt',
    'diffusers-nudity-ESDu1-UNET.pt'; reference: eval_coco.py:70-101,
    i2p_eval.py:163-168). Replaces the snapshot's UNet entirely.

    `delta`: path to a Concept-Ablation delta.bin — {'unet': partial state
    dict, optional 'text_encoder': full state dict} applied OVER the base
    (reference: i2p_eval.py:142-152). Mutually exclusive with `edited_unet`.

    NOTE: 'sd2' is the 768 v-prediction model (the reference's comparison
    model, utils.py:91-95); point an SD2-base (512, epsilon) checkpoint at
    'sd2-base' instead — v-pred decoding of an epsilon model produces garbage
    with no error."""
    import os

    from diffusion_models_moe_tpu import (StableDiffusionPipeline,
                                          sd15_config, sd21_config)
    from diffusion_models_moe_tpu.weights.port import (
        load_delta_bin, port_clip_text_state_dict, port_edited_unet,
        port_pipeline, port_unet)

    spec = BASELINES[name]
    if spec.kind == "sd2x":
        cfg = config or sd21_config(dtype=dtype,
                                    v_prediction=spec.v_prediction)
        pipe = StableDiffusionPipeline(cfg)
        return pipe, port_pipeline(snapshot, cfg), {}
    # `config` overrides the sd15 preset — a tiny-dims config lets CI
    # exercise the full loader path against fixture snapshots
    cfg = config or sd15_config(dtype=dtype)
    pipe = StableDiffusionPipeline(cfg)
    if edited_unet and delta:
        raise ValueError("pass either edited_unet (UCE/ESD whole-UNet file) "
                         "or delta (Concept-Ablation delta.bin), not both")
    if (edited_unet or delta) and spec.kind != "sd15-edited":
        raise ValueError(f"baseline '{name}' ({spec.kind}) does not take an "
                         "edited-UNet checkpoint")
    params = port_pipeline(snapshot, cfg)
    if edited_unet:
        params["unet"] = port_edited_unet(edited_unet, cfg.unet)
    elif delta:
        bundle = load_delta_bin(delta)
        if "unet" in bundle:
            params["unet"] = port_unet(os.path.join(snapshot, "unet"),
                                       cfg.unet, overlay=bundle["unet"])
        if "text_encoder" in bundle:
            params["text_encoder"] = port_clip_text_state_dict(
                bundle["text_encoder"], cfg.text_encoder)
    if spec.kind == "sd15-sld":
        # protocol drivers call sld_generate instead of pipe.generate
        return pipe, params, {"use_sld": True}
    return pipe, params, {}


def baseline_generate(pipe, params, cond_ids, uncond_ids, key,
                      generate_kwargs: dict, safety_ids=None, **kw):
    """Uniform generate over stock and SLD baselines (the reference's
    eval_baselines dispatch, i2p_eval.py:134-194). SLD baselines need
    `safety_ids` — the tokenized SLD safety concept
    (pipelines/sld.py:SAFETY_CONCEPT)."""
    if generate_kwargs.get("use_sld"):
        from diffusion_models_moe_tpu.pipelines.sld import sld_generate
        if safety_ids is None:
            raise ValueError("SLD baseline needs safety_ids "
                             "(tokenize(pipelines.sld.SAFETY_CONCEPT))")
        out = sld_generate(pipe, params, cond_ids, uncond_ids, safety_ids,
                           key, **kw)
        # normalize to pipe.generate's (images, taps) shape
        return out if isinstance(out, tuple) else (out, None)
    return pipe.generate(params, cond_ids, uncond_ids, key, **kw)


def make_protocol_generate(pipe, generate_kwargs: dict, tokenize):
    """run_eval-compatible generate_fn for a loaded baseline, or None when
    the stock `pipe.generate` is correct. SLD baselines wrap `sld_generate`
    with the tokenized safety concept (the reference evaluates SLD through
    the same benchmark drivers, i2p_eval.py:134-194)."""
    if not generate_kwargs.get("use_sld"):
        return None
    import jax.numpy as jnp
    import numpy as np

    from diffusion_models_moe_tpu.pipelines.sld import (SAFETY_CONCEPT,
                                                        sld_generate)
    safety_row = np.asarray(tokenize([SAFETY_CONCEPT]))

    def gen(params, cond_ids, uncond_ids, key, *, num_steps=None,
            guidance_scale=None, ivs=None, mesh=None, seeds=None, **kw):
        if ivs is not None:
            raise ValueError("the SLD baseline is a comparison model — "
                             "interventions don't apply to it")
        if mesh is not None or seeds is not None:
            raise ValueError("SLD baseline generate supports neither mesh "
                             "sharding nor per-prompt seeds yet")
        safety = jnp.asarray(np.repeat(safety_row, cond_ids.shape[0], axis=0))
        imgs = sld_generate(pipe, params, cond_ids, uncond_ids, safety, key,
                            num_steps=num_steps,
                            guidance_scale=guidance_scale)
        return imgs, None

    return gen
