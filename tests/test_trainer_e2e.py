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
