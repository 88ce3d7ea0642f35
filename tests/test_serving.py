"""Serving engine (serving.py) + per-request seed determinism.

The engine's contract: a request's image depends only on (prompt, seed,
engine config) — never on which other requests shared its micro-batch and
never on padding. Checked end-to-end on the tiny pipeline."""
import hashlib

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_models_moe_tpu import StableDiffusionPipeline, tiny_config
from diffusion_models_moe_tpu.serving import ServingEngine


def _make():
    pipe = StableDiffusionPipeline(tiny_config())
    params = pipe.init_params(jax.random.PRNGKey(0))
    cfg = pipe.config.text_encoder

    def tokenize(texts):
        out = []
        for t in texts:
            h = int(hashlib.md5(t.encode()).hexdigest(), 16) % (2 ** 31)
            out.append(np.asarray(jax.random.randint(
                jax.random.PRNGKey(h), (cfg.max_length,), 0, cfg.vocab_size)))
        return np.stack(out)

    return pipe, params, tokenize


def test_per_sample_seeds_are_batch_independent():
    pipe, params, tokenize = _make()
    ids = jnp.asarray(tokenize(["a", "b"]))
    un = jnp.asarray(tokenize(["", ""]))
    key = jax.random.PRNGKey(0)
    lat1, _ = pipe.generate(params, ids, un, key, num_steps=2, decode=False,
                            seeds=np.asarray([7, 3]))
    lat2, _ = pipe.generate(params, ids, un, jax.random.PRNGKey(99),
                            num_steps=2, decode=False,
                            seeds=np.asarray([7, 1000]))
    # sample 0 (same prompt, same seed) identical despite different key and
    # different co-batched seed
    np.testing.assert_array_equal(np.asarray(lat1[0]), np.asarray(lat2[0]))
    # different seeds differ
    assert np.abs(np.asarray(lat1[1]) - np.asarray(lat2[1])).max() > 1e-3


def test_serving_engine_end_to_end():
    pipe, params, tokenize = _make()
    eng = ServingEngine(pipe, params, tokenize, batch_size=4, num_steps=2,
                        max_wait_ms=200.0)
    with eng:
        futs = [eng.submit(f"prompt {i}", seed=i) for i in range(6)]
        imgs = [f.result(timeout=600) for f in futs]
    assert all(im.shape == imgs[0].shape and im.dtype == np.uint8
               for im in imgs)
    assert eng.stats.requests == 6
    assert eng.stats.batches >= 2
    assert 0.0 < eng.stats.mean_fill <= 1.0


def test_serving_result_independent_of_cobatching():
    pipe, params, tokenize = _make()
    eng = ServingEngine(pipe, params, tokenize, batch_size=4, num_steps=2,
                        max_wait_ms=200.0)
    with eng:
        solo = eng.submit("the probe prompt", seed=42).result(timeout=600)
    eng2 = ServingEngine(pipe, params, tokenize, batch_size=4, num_steps=2,
                         max_wait_ms=500.0)
    with eng2:
        futs = [eng2.submit("other prompt a", seed=1),
                eng2.submit("the probe prompt", seed=42),
                eng2.submit("other prompt b", seed=2)]
        crowded = futs[1].result(timeout=600)
        for f in (futs[0], futs[2]):
            f.result(timeout=600)
    np.testing.assert_array_equal(solo, crowded)


def test_lcm_per_sample_seeds_are_batch_independent():
    """LCM injects fresh noise per step; that noise must also derive from the
    sample's own seed, not its batch slot or the shared key (the code-review
    hole: schedulers/lcm.py used one key for the whole batch)."""
    import dataclasses
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, scheduler="lcm",
        unet=dataclasses.replace(cfg.unet, time_cond_proj_dim=32))
    pipe = StableDiffusionPipeline(cfg)
    params = pipe.init_params(jax.random.PRNGKey(0))
    _, _, tokenize = _make()
    ids = jnp.asarray(tokenize(["a", "b"]))
    un = jnp.asarray(tokenize(["", ""]))
    lat1, _ = pipe.generate(params, ids, un, jax.random.PRNGKey(0),
                            num_steps=3, decode=False,
                            seeds=np.asarray([7, 3]))
    # same request in the OTHER slot, different shared key and co-batched seed
    ids_sw = jnp.asarray(tokenize(["b", "a"]))
    lat2, _ = pipe.generate(params, ids_sw, un, jax.random.PRNGKey(99),
                            num_steps=3, decode=False,
                            seeds=np.asarray([1000, 7]))
    np.testing.assert_array_equal(np.asarray(lat1[0]), np.asarray(lat2[1]))


def test_failing_batch_with_cancelled_future_keeps_executor_alive():
    """A cancelled future inside a failing batch must not raise
    InvalidStateError out of the exception handler (which would kill the
    executor thread); unresolved futures get the batch error, and the engine
    keeps serving afterwards."""
    from concurrent.futures import Future

    from diffusion_models_moe_tpu.serving import ServingEngine, _Request

    cancelled = Future()
    assert cancelled.cancel()
    pending = Future()
    resolved = Future()
    resolved.set_running_or_notify_cancel()
    resolved.set_result("already done")

    batch = [_Request("a", 0, cancelled), _Request("b", 1, pending),
             _Request("c", 2, resolved)]
    err = RuntimeError("batch exploded")
    ServingEngine._fail_batch(batch, err)      # must not raise
    assert pending.exception() is err
    assert cancelled.cancelled()
    assert resolved.result() == "already done"

    # and end-to-end: a poisoned batch doesn't kill the loop
    pipe, params, tokenize = _make()
    eng = ServingEngine(pipe, params, tokenize, batch_size=2, num_steps=2,
                        max_wait_ms=200.0, decode=False)
    real_run = ServingEngine._run_batch
    calls = {"n": 0}

    def flaky(self, batch):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("first batch fails")
        return real_run(self, batch)

    eng._run_batch = flaky.__get__(eng)
    with eng:
        bad = eng.submit("x", seed=1)
        assert isinstance(bad.exception(timeout=60), RuntimeError)
        ok = eng.submit("y", seed=2)
        assert ok.result(timeout=120).shape[-1] == 4   # latents, engine alive


def test_stop_drain_sweep_tolerates_cancelled_future():
    """stop()'s raced-in-request sweep needs the same cancel guard as
    _fail_batch: a client cancel() on a still-queued future must not raise
    InvalidStateError out of stop(), and later queued futures still get the
    'engine stopped' error."""
    import threading
    from concurrent.futures import Future

    from diffusion_models_moe_tpu.serving import ServingEngine, _Request

    eng = ServingEngine.__new__(ServingEngine)  # no jit machinery needed
    import queue as _q
    eng._queue = _q.Queue()
    eng._stop = threading.Event()
    eng._lifecycle = threading.Lock()
    t = threading.Thread(target=lambda: None)
    t.start()
    t.join()
    eng._thread = t

    cancelled = Future()
    assert cancelled.cancel()
    pending = Future()
    eng._queue.put(_Request("a", 0, cancelled))
    eng._queue.put(_Request("b", 1, pending))

    eng.stop(drain=False)                      # must not raise
    assert cancelled.cancelled()
    assert isinstance(pending.exception(timeout=1), RuntimeError)
    assert eng._thread is None
    assert eng._queue.unfinished_tasks == 0
