"""ReLUfication training driver: the end-to-end fine-tune loop.

Rebuild of the reference's forked diffusers trainer main()
(reference: train_relufied_sd.py:620-1151): load models, swap GELU->ReLU (a config
flag here), select trainable params, loop batches -> VAE-encode -> train step ->
periodic checkpoint + validation images. Accelerate/DDP becomes the ('dp','tp')
mesh; logging is JSONL (wandb/tensorboard optional in the reference,
train_relufied_sd.py:59-61).
"""
from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_models_moe_tpu.config import PipelineConfig
from diffusion_models_moe_tpu.models.clip_text import CLIPTextEncoder
from diffusion_models_moe_tpu.models.vae import VAEEncoder, sample_latents
from diffusion_models_moe_tpu.parallel.mesh import (batch_sharding, create_mesh,
                                                    replicated, state_shardings)
from diffusion_models_moe_tpu.training.train import (TrainConfig, TrainState,
                                                     create_train_state,
                                                     make_train_step,
                                                     restore_checkpoint,
                                                     save_checkpoint)


@dataclasses.dataclass
class RunConfig:
    out_dir: str
    max_steps: int = 1000
    checkpoint_every: int = 500
    log_every: int = 50
    max_checkpoints: int = 3
    resume: bool = True
    n_devices: Optional[int] = None
    # generate validation images every N steps (0 = off); see
    # make_validation_logger (reference: train_relufied_sd.py:1136-1151)
    validation_every: int = 0


def train_relufied(pipeline_cfg: PipelineConfig, train_cfg: TrainConfig,
                   run_cfg: RunConfig,
                   batches: Iterator[dict],
                   params: dict,
                   log_fn: Optional[Callable[[dict], None]] = None,
                   validation_fn: Optional[Callable] = None) -> TrainState:
    """`batches` yields {'images': (B,H,W,3) in [-1,1], 'input_ids': (B,S)} or
    pre-encoded {'latents', 'text_emb'}. `params` must contain 'unet' (the model
    being tuned, with ff_activation='geglu-relu') and, for raw-image batches,
    'vae_encoder' and 'text_encoder' (frozen; reference freezes them too,
    train_relufied_sd.py:676)."""
    mesh = create_mesh(run_cfg.n_devices)
    unet_cfg = pipeline_cfg.unet

    state = create_train_state(params["unet"], train_cfg)
    start_step = 0
    ckpt_dir = os.path.join(os.path.abspath(run_cfg.out_dir), "checkpoints")
    if run_cfg.resume and os.path.isdir(ckpt_dir):
        state, start_step = restore_checkpoint(ckpt_dir, state)

    step_fn = make_train_step(unet_cfg, train_cfg)
    state_shard = state_shardings(state, mesh)
    batch_shard = {"latents": batch_sharding(mesh, 4),
                   "text_emb": batch_sharding(mesh, 3)}
    jitted = jax.jit(step_fn, in_shardings=(state_shard, batch_shard,
                                            replicated(mesh)),
                     out_shardings=(state_shard, replicated(mesh)))

    text_encoder = CLIPTextEncoder(pipeline_cfg.text_encoder)
    vae_encoder = VAEEncoder(pipeline_cfg.vae)

    @jax.jit
    def encode_batch(tparams, vparams, images, input_ids, key):
        emb = text_encoder.apply({"params": tparams}, input_ids)
        mean, logvar = vae_encoder.apply({"params": vparams}, images)
        lat = sample_latents(mean, logvar, key,
                             pipeline_cfg.vae.scaling_factor)
        return lat, emb

    os.makedirs(run_cfg.out_dir, exist_ok=True)
    log_path = os.path.join(run_cfg.out_dir, "train_log.jsonl")
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    completed = start_step
    # resume-time data skipping: drop the batches the interrupted run already
    # consumed so the data stream continues where it left off (reference step
    # arithmetic: train_relufied_sd.py:976-1000). Materialize the iterator
    # FIRST: islice over a list/Sequence would consume nothing and iter()
    # would then restart from element 0, silently re-training consumed data.
    batches = iter(batches)
    if start_step > 0:
        import itertools
        for _ in itertools.islice(batches, start_step):
            pass
    with mesh:
        state = jax.device_put(state, state_shard)
        for step in range(start_step, run_cfg.max_steps):
            # pull-on-demand (a for-over-enumerate would consume one batch
            # past max_steps, breaking exact resume arithmetic)
            batch = next(batches, None)
            if batch is None:
                break
            key, k_enc, k_step = jax.random.split(key, 3)
            if "latents" not in batch:
                lat, emb = encode_batch(params["text_encoder"],
                                        params["vae_encoder"],
                                        jnp.asarray(batch["images"]),
                                        jnp.asarray(batch["input_ids"]), k_enc)
                batch = {"latents": lat, "text_emb": emb}
            batch = jax.device_put(batch, batch_shard)
            state, metrics = jitted(state, batch, k_step)
            if step % run_cfg.log_every == 0:
                rec = {"step": step, "loss": float(metrics["loss"]),
                       "grad_norm": float(metrics["grad_norm"]),
                       "elapsed_s": round(time.perf_counter() - t0, 1)}
                with open(log_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")
                if log_fn:
                    log_fn(rec)
            completed = step + 1
            # checkpoint labels are STEPS COMPLETED: a restore at label N
            # resumes at loop index N and skips N batches, so batch N-1 is
            # never re-trained (labeling by loop index was off by one: the
            # saved state had already consumed its own step's batch)
            if completed % run_cfg.checkpoint_every == 0:
                save_checkpoint(ckpt_dir, jax.device_get(state), completed,
                                run_cfg.max_checkpoints)
            if (validation_fn is not None and run_cfg.validation_every > 0
                    and step > 0 and step % run_cfg.validation_every == 0):
                val_params = (state.ema_params if state.ema_params is not None
                              else state.params)
                validation_fn(jax.device_get(val_params), step)
    if (completed > start_step
            and completed % run_cfg.checkpoint_every != 0):
        # skip when nothing ran (a resumed finished run would re-save an
        # existing step and orbax raises) or the loop just saved this label
        save_checkpoint(ckpt_dir, jax.device_get(state), completed,
                        run_cfg.max_checkpoints)
    return state


def make_validation_logger(pipe, full_params: dict, tokenize: Callable,
                           prompts, out_dir: str, num_steps: int = 4,
                           seed: int = 0) -> Callable:
    """validation_fn for `train_relufied`: generates `prompts` with the current
    (EMA) UNet params and writes PNGs + a JSONL record per validation step
    (reference: train_relufied_sd.py:1136-1151 logs validation images to
    wandb/tensorboard each epoch)."""
    from diffusion_models_moe_tpu.pipelines.stable_diffusion import to_pil

    os.makedirs(out_dir, exist_ok=True)
    cond = jnp.asarray(tokenize(list(prompts)))
    uncond = jnp.asarray(tokenize([""] * len(prompts)))
    log_path = os.path.join(out_dir, "validation_log.jsonl")

    def validation_fn(unet_params, step: int):
        params = dict(full_params, unet=unet_params)
        imgs, _ = pipe.generate(params, cond, uncond,
                                jax.random.PRNGKey(seed),
                                num_steps=num_steps)
        paths = []
        for i, img in enumerate(to_pil(imgs)):
            p = os.path.join(out_dir, f"val_step{step:06d}_{i}.png")
            img.save(p)
            paths.append(p)
        with open(log_path, "a") as f:
            f.write(json.dumps({"step": step, "images": paths,
                                "prompts": list(prompts)}) + "\n")

    return validation_fn


def param_count_report(params: dict, mask=None) -> dict:
    """Tunable-parameter share (reference: adapters.py:26-45
    check_tunable_params)."""
    total = sum(int(np.prod(x.shape))
                for x in jax.tree_util.tree_leaves(params))
    if mask is None:
        return {"total": total, "trainable": total, "share": 1.0}
    leaves = zip(jax.tree_util.tree_leaves(params),
                 jax.tree_util.tree_leaves(mask))
    trainable = sum(int(np.prod(x.shape)) for x, m in leaves if m)
    return {"total": total, "trainable": trainable,
            "share": trainable / total}
