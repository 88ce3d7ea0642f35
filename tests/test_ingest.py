"""Imagefolder ingestion (reference train_relufied_sd.py:788-898 data path)."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from diffusion_models_moe_tpu.data.ingest import (image_caption_batches,
                                                  imagefolder_batches,
                                                  read_metadata)


def _tok(texts):
    return np.asarray([[len(t) % 100] * 8 for t in texts], np.int32)


def _make_folder(root, n=5, fmt="csv", size=(40, 30)):
    rows = []
    rng = np.random.RandomState(0)
    for i in range(n):
        name = f"img_{i}.png"
        Image.fromarray(rng.randint(0, 255, (*size[::-1], 3), np.uint8)).save(
            os.path.join(root, name))
        rows.append({"file_name": name, "text": f"caption number {i}"})
    if fmt == "csv":
        import csv
        with open(os.path.join(root, "metadata.csv"), "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["file_name", "text"])
            w.writeheader()
            w.writerows(rows)
    else:
        with open(os.path.join(root, "metadata.jsonl"), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


@pytest.mark.parametrize("fmt", ["csv", "jsonl"])
def test_read_metadata_formats(tmp_path, fmt):
    _make_folder(str(tmp_path), n=3, fmt=fmt)
    paths, captions = read_metadata(str(tmp_path))
    assert len(paths) == len(captions) == 3
    assert captions[1] == "caption number 1"
    assert all(os.path.exists(p) for p in paths)


def test_missing_metadata_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        read_metadata(str(tmp_path))


def test_batches_shapes_and_range(tmp_path):
    _make_folder(str(tmp_path), n=5)
    it = imagefolder_batches(str(tmp_path), _tok, batch_size=2, resolution=16,
                             epochs=1, seed=0)
    batches = list(it)
    assert len(batches) == 2          # 5 samples, drop_last tail
    for b in batches:
        assert b["images"].shape == (2, 16, 16, 3)
        assert b["images"].dtype == np.float32
        assert b["input_ids"].shape == (2, 8)
        assert b["images"].min() >= -1.0 and b["images"].max() <= 1.0


def test_epoch_shuffling_and_determinism(tmp_path):
    _make_folder(str(tmp_path), n=4)
    paths, captions = read_metadata(str(tmp_path))

    def ids_seen(seed):
        out = []
        for b in image_caption_batches(paths, captions, _tok, batch_size=2,
                                       resolution=8, epochs=2, seed=seed,
                                       random_flip=False, center_crop=True):
            out.append(b["images"].sum())
        return out
    a, b = ids_seen(0), ids_seen(0)
    np.testing.assert_allclose(a, b)   # same seed -> same stream
    assert len(a) == 4                 # 2 epochs x 2 batches


def test_streams_forever_without_epochs(tmp_path):
    _make_folder(str(tmp_path), n=2)
    it = imagefolder_batches(str(tmp_path), _tok, batch_size=2, resolution=8,
                             epochs=None)
    for _ in range(5):                 # > one epoch worth
        next(it)


def test_feeds_trainer_contract(tmp_path):
    """The yielded raw-image dicts drive train_relufied end-to-end (tiny
    config): ingest -> VAE encode -> train step."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from diffusion_models_moe_tpu.config import tiny_config
    from diffusion_models_moe_tpu.models.clip_text import CLIPTextEncoder
    from diffusion_models_moe_tpu.models.unet import UNet2DCondition
    from diffusion_models_moe_tpu.models.vae import VAEEncoder
    from diffusion_models_moe_tpu.training.trainer import (RunConfig,
                                                           train_relufied)
    from diffusion_models_moe_tpu.training.train import TrainConfig

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, unet=dataclasses.replace(cfg.unet, ff_activation="geglu-relu"))
    unet_params = UNet2DCondition(cfg.unet).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 16, 32)))["params"]
    res = 8 * 2 ** (len(cfg.vae.block_out_channels) - 1)   # -> 8x8 latents
    vae_params = VAEEncoder(cfg.vae).init(
        jax.random.PRNGKey(1), jnp.zeros((1, res, res, 3)))["params"]
    text_params = CLIPTextEncoder(cfg.text_encoder).init(
        jax.random.PRNGKey(2),
        jnp.zeros((1, cfg.text_encoder.max_length), jnp.int32))["params"]

    os.mkdir(str(tmp_path / "data"))
    _make_folder(str(tmp_path / "data"), n=2)
    it = imagefolder_batches(
        str(tmp_path / "data"),
        lambda ts: np.asarray([[1] * cfg.text_encoder.max_length
                               for _ in ts], np.int32),
        batch_size=2, resolution=res, epochs=None)
    state = train_relufied(
        cfg, TrainConfig(learning_rate=1e-4, use_ema=False),
        RunConfig(out_dir=str(tmp_path / "run"), max_steps=2,
                  checkpoint_every=10, log_every=1, n_devices=1),
        it, {"unet": unet_params, "vae_encoder": vae_params,
             "text_encoder": text_params})
    assert int(state.step) == 2


def test_prefetch_preserves_stream_and_propagates_errors():
    from diffusion_models_moe_tpu.data.ingest import prefetch

    got = list(prefetch(iter([{"i": 0}, {"i": 1}, {"i": 2}]), depth=2))
    assert [b["i"] for b in got] == [0, 1, 2]

    def boom():
        yield {"i": 0}
        raise RuntimeError("decode failed")

    it = prefetch(boom(), depth=1)
    assert next(it)["i"] == 0
    with pytest.raises(RuntimeError, match="decode failed"):
        next(it)
