"""End-to-end trainer: synthetic batches -> steps -> checkpoint -> resume."""
import jax
import jax.numpy as jnp
import numpy as np

from diffusion_models_moe_tpu import tiny_config
from diffusion_models_moe_tpu.models.unet import UNet2DCondition
from diffusion_models_moe_tpu.training.train import TrainConfig
from diffusion_models_moe_tpu.training.trainer import RunConfig, train_relufied


def _batches(n, b=2, s=8, d=32, seed=0):
    rng = np.random.RandomState(seed)
    for _ in range(n):
        yield {"latents": rng.randn(b, s, s, 4).astype(np.float32),
               "text_emb": rng.randn(b, 16, d).astype(np.float32)}


def test_train_loop_checkpoint_resume(tmp_path):
    import dataclasses
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, unet=dataclasses.replace(cfg.unet, ff_activation="geglu-relu"))
    unet = UNet2DCondition(cfg.unet)
    params_unet = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                            jnp.zeros((1,), jnp.int32),
                            jnp.zeros((1, 16, 32)))["params"]
    tcfg = TrainConfig(learning_rate=1e-4, use_ema=True, ft_method="ff",
                       snr_gamma=5.0)
    rcfg = RunConfig(out_dir=str(tmp_path), max_steps=3, checkpoint_every=2,
                     log_every=1, n_devices=2)
    state = train_relufied(cfg, tcfg, rcfg, _batches(10),
                           {"unet": params_unet})
    assert int(state.step) == 3
    import json, os
    logs = [json.loads(l) for l in open(tmp_path / "train_log.jsonl")]
    assert logs and np.isfinite(logs[-1]["loss"])
    assert os.path.isdir(tmp_path / "checkpoints")

    # resume continues from the saved step
    rcfg2 = RunConfig(out_dir=str(tmp_path), max_steps=5, checkpoint_every=10,
                      log_every=1, n_devices=2, resume=True)
    state2 = train_relufied(cfg, tcfg, rcfg2, _batches(10, seed=1),
                            {"unet": params_unet})
    assert int(state2.step) == 5
    # ema differs from live params after training
    a = jax.tree_util.tree_leaves(state2.params)[0]
    e = jax.tree_util.tree_leaves(state2.ema_params)[0]
    assert not np.allclose(np.asarray(a), np.asarray(e))


def test_lr_schedule_warmup_cosine():
    """Warmup rises linearly from 0; cosine decays to 0 at max_train_steps
    (reference: train_relufied_sd.py:755-757 get_scheduler + warmup)."""
    from diffusion_models_moe_tpu.training.train import make_lr_schedule
    tcfg = TrainConfig(learning_rate=1e-3, lr_schedule="cosine",
                       lr_warmup_steps=10, max_train_steps=110)
    sched = make_lr_schedule(tcfg)
    assert float(sched(0)) == 0.0
    assert float(sched(5)) == np.float32(5e-4)
    assert float(sched(10)) == np.float32(1e-3)
    assert 0 < float(sched(60)) < 1e-3
    assert float(sched(110)) < 1e-6
    const = make_lr_schedule(TrainConfig(learning_rate=2e-5))
    assert float(const(0)) == float(const(999)) == np.float32(2e-5)


def test_adafactor_low_memory_optimizer():
    """The adafactor option (TPU analogue of the reference's 8-bit Adam,
    train_relufied_sd.py:764-771) trains and changes params."""
    import dataclasses
    from diffusion_models_moe_tpu.training.train import (create_train_state,
                                                         make_train_step)
    cfg = tiny_config().unet
    unet = UNet2DCondition(cfg)
    params = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                       jnp.zeros((1,), jnp.int32),
                       jnp.zeros((1, 16, 32)))["params"]
    tcfg = TrainConfig(learning_rate=1e-3, optimizer="adafactor",
                       use_ema=False)
    state = create_train_state(params, tcfg)
    step = make_train_step(cfg, tcfg)
    batch = {"latents": jnp.ones((2, 8, 8, 4)),
             "text_emb": jnp.ones((2, 16, 32))}
    new_state, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(new_state.params)[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_resume_skips_consumed_batches(tmp_path):
    """On resume, the data stream continues past the already-consumed batches
    (round-1 bug: enumerate(start=N) relabeled but re-used batch 0)."""
    import dataclasses
    cfg = tiny_config()
    unet = UNet2DCondition(cfg.unet)
    params_unet = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                            jnp.zeros((1,), jnp.int32),
                            jnp.zeros((1, 16, 32)))["params"]
    tcfg = TrainConfig(learning_rate=1e-4, use_ema=False)
    rcfg = RunConfig(out_dir=str(tmp_path), max_steps=2, checkpoint_every=2,
                     log_every=1, n_devices=2)

    seen = []

    def tracking_batches(n):
        for i in range(n):
            seen.append(i)
            rng = np.random.RandomState(i)
            yield {"latents": rng.randn(2, 8, 8, 4).astype(np.float32),
                   "text_emb": rng.randn(2, 16, 32).astype(np.float32)}

    train_relufied(cfg, tcfg, rcfg, tracking_batches(10),
                   {"unet": params_unet})
    assert seen == [0, 1]
    seen.clear()
    rcfg2 = RunConfig(out_dir=str(tmp_path), max_steps=4, checkpoint_every=10,
                      log_every=1, n_devices=2, resume=True)
    train_relufied(cfg, tcfg, rcfg2, tracking_batches(10),
                   {"unet": params_unet})
    # resumed at step 2: batches 0,1 skipped, 2,3 trained on
    assert seen == [0, 1, 2, 3]


def test_validation_image_logging(tmp_path):
    """validation_fn fires every validation_every steps with EMA params and
    writes PNGs + JSONL (reference: train_relufied_sd.py:1136-1151)."""
    cfg = tiny_config()
    unet = UNet2DCondition(cfg.unet)
    params_unet = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                            jnp.zeros((1,), jnp.int32),
                            jnp.zeros((1, 16, 32)))["params"]
    tcfg = TrainConfig(learning_rate=1e-4, use_ema=True)
    rcfg = RunConfig(out_dir=str(tmp_path), max_steps=5, checkpoint_every=100,
                     log_every=10, n_devices=2, validation_every=2,
                     resume=False)
    calls = []
    train_relufied(cfg, tcfg, rcfg, _batches(10),
                   {"unet": params_unet},
                   validation_fn=lambda p, step: calls.append(step))
    assert calls == [2, 4]
