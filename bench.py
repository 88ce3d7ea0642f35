"""Headline benchmark: moefied SD1.5 images/sec/chip at 50 denoise steps.

This is the reference's hot path — MoE top-k routed GEGLU inference under
instrumentation (reference: moefication/eval_moefied_sd.py:19-74, hooks recompute the
FFN up-projection and copy gates to host every call, neuron_receivers/moefy.py:10-27).
Here the whole 50-step loop + routing + VAE decode is one jit; no host syncs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` compares against an ESTIMATED 0.25 img/s for the reference's hooked
single-GPU loop (no published numbers exist — BASELINE.md; estimate from SD1.5
fp16 ~0.4 img/s at 50 steps on a datacenter GPU, halved by the hook overhead of
double FFN compute + per-call host copies). Every multiple printed downstream must
keep the word "estimated" attached.

Resilience (round-1 postmortem, BENCH_r01.json rc=1 kernel fault):
 - backend init runs under a watchdog deadline (DMOE_INIT_TIMEOUT, default
   1200s — axon init has been observed to HANG, not error, on a wedged
   tunnel; a hang would otherwise consume the driver's whole timeout with
   no JSON evidence);
 - a trivial-jit probe runs before any heavy compile, so a wedged TPU service
   fails fast with evidence on stderr;
 - the primary attempt uses flash blocks 1024/1024 (measured 0.916 vs 0.888
   img/s at 512/512 on v5e; the round-1 crash at 1024 was a wedged service,
   since re-verified green) — DMOE_FLASH_BLOCKS=bq,bk overrides;
 - on failure the bench re-execs itself in FRESH processes down a fallback
   chain (a crashed TPU worker can poison the in-process backend):
   1024/1024 -> 512/512 -> flash off; only the flash-off leg is flagged
   "degraded": true ("fallback" records the leg either way);
 - a JSON line is always emitted, even on total failure (value 0.0 + "error").

Env knobs: DMOE_FLASH=0 (disable flash), DMOE_FUSED=1/0 (force the Pallas
routing kernel on/off; default follows the config — OFF, since the XLA
sort-based routing measured faster: 1.0705 vs 0.9758 img/s),
DMOE_NO_MOE=1 (plain SD, for routing-overhead A/B),
DMOE_FAST_NORM=1, DMOE_FLASH_BLOCKS=bq,bk, DMOE_DP=1 (shard the batch over all
local devices with a ('dp',) mesh), DMOE_HOOK_SIM=1 (reference-semantics
mode: doubled FF projection + per-(t,l) gate stat — measured 0.9335 vs 1.0733
img/s native, a same-chip lower bound on the hook-architecture cost),
DMOE_XLA_OPTS=k=v;... (compiler options; xla_tpu_scoped_vmem_limit_kib=98304
measured 1.0083 — slower, rejected), DMOE_FF_2D=1 (2D-flattened FF dots;
1.0695 — no win, off), DMOE_QUANT=1 (int8 W8A8 serving mode),
DMOE_WINOGRAD=1 (Winograd F(2x2,3x3) conv serving mode),
DMOE_PAD_PROJ=1 (fold the flash head-dim pad into the q/k/v weights — exact;
combines with DMOE_QUANT=1, where the int8 twins keep it bit-exact too),
DMOE_DEEP_CACHE=N (DeepCache serving mode: full UNet every N-th step, shallow
cached-deep-feature forward otherwise — approximate, composes with the other
serving modes),
DMOE_BENCH_MODE=lcm-sdxl (moefied SDXL-LCM @ 4 steps, batch 2 — the
reference's few-step operating point, BASELINE.md "LCM: 4 steps"; reports
no vs_baseline multiple since the 0.25 estimate is SD1.5-specific).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))

REFERENCE_HOOKED_IMGS_PER_SEC = 0.25  # estimated, not measured — see module docstring


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _dp_devices(batch: int, avail: int) -> int:
    """Largest divisor of `batch` that fits the available devices — dp must
    divide the batch (lcm-sdxl defaults to batch 2, which an 8-device mesh
    cannot shard)."""
    return max(d for d in range(1, avail + 1) if batch % d == 0)


class InitHang(RuntimeError):
    """Backend init did not complete — wedged TPU tunnel (axon init can HANG
    rather than error; observed 2026-08-18 after killed clients)."""


def _init_watchdog(timeout_s: float = 1200.0) -> None:
    """Initialize the backend in a daemon thread with a deadline.

    jax.devices() on this image's axon tunnel can block indefinitely when the
    service is wedged; a bare hang would eat the driver's whole timeout and
    leave NO JSON evidence. Legitimate init has been observed up to ~800s
    under host CPU load (memory: probe 801s then ran fine), so the default
    deadline stays comfortably above that. DMOE_INIT_TIMEOUT overrides."""
    import threading
    timeout_s = float(os.environ.get("DMOE_INIT_TIMEOUT", timeout_s))
    done = threading.Event()
    err: list = []

    def _init():
        try:
            jax.devices()
        except Exception as e:  # surfaced below on the main thread
            err.append(e)
        finally:
            done.set()

    t0 = time.perf_counter()
    threading.Thread(target=_init, daemon=True).start()
    if not done.wait(timeout_s):
        raise InitHang(f"backend init incomplete after {timeout_s:.0f}s "
                       "(wedged TPU tunnel?)")
    if err:
        raise err[0]
    _log(f"# backend init {time.perf_counter()-t0:.1f}s")


def _probe() -> None:
    """Trivial jit + host fetch under a deadline. Fails fast (with evidence)
    if the TPU service is wedged, before we sink minutes into the UNet
    compile. The deadline matters: a wedged tunnel has been observed to hang
    EXECUTION (not just init — 2026-08-19: devices() returned in 0.3s, the
    probe matmul never completed), which would otherwise eat the driver's
    whole timeout with no JSON evidence. Legit probes have been observed up
    to 801s on a loaded host (and 386s on 2026-08-19 on an idle one — the
    tunnel itself can be slow), so the default deadline sits above both.
    DMOE_PROBE_TIMEOUT overrides."""
    import threading
    timeout_s = float(os.environ.get("DMOE_PROBE_TIMEOUT", 900.0))
    done = threading.Event()
    box: list = []

    def _run():
        try:
            x = jax.jit(lambda a: (a @ a).sum())(
                jnp.ones((256, 256), jnp.bfloat16))
            box.append(float(np.asarray(jax.device_get(x))))
        except Exception as e:
            box.append(e)
        finally:
            done.set()

    t0 = time.perf_counter()
    threading.Thread(target=_run, daemon=True).start()
    if not done.wait(timeout_s):
        raise InitHang(f"probe matmul incomplete after {timeout_s:.0f}s "
                       "(wedged TPU execution?)")
    if isinstance(box[0], Exception):
        raise box[0]
    _log(f"# probe ok ({box[0]:.0f}) {time.perf_counter()-t0:.1f}s "
         f"backend={jax.default_backend()}")


def _probe_with_retries() -> None:
    """Wedges are often transient (the service digests killed clients'
    server-side work and recovers); a second patient attempt after a pause has
    been observed to succeed where the first hung. DMOE_PROBE_ATTEMPTS
    (default 2) bounds total spend to ~attempts*(timeout+pause)."""
    attempts = int(os.environ.get("DMOE_PROBE_ATTEMPTS", 2))
    for i in range(attempts):
        try:
            _probe()
            return
        except InitHang:
            if i == attempts - 1:
                raise
            _log(f"# probe attempt {i + 1}/{attempts} hung; "
                 "pausing 120s before retry")
            time.sleep(120)


def main(batch: int | None = None, steps: int | None = None,
         runs: int = 3) -> None:
    from diffusion_models_moe_tpu import StableDiffusionPipeline, sd15_config
    from diffusion_models_moe_tpu.config import sdxl_config
    from diffusion_models_moe_tpu.moefication.moefy import build_moe_interventions
    from diffusion_models_moe_tpu.taps import layer_name

    # DMOE_BENCH_MODE=lcm-sdxl: the reference's other serving operating point
    # (LCM-SDXL, 4 steps — BASELINE.md "LCM: 4 steps" row). Default stays the
    # 50-step SD1.5 headline (what the driver records).
    mode = os.environ.get("DMOE_BENCH_MODE", "sd15")
    if mode not in ("sd15", "lcm-sdxl"):
        raise ValueError(f"DMOE_BENCH_MODE must be sd15|lcm-sdxl, got {mode}")
    lcm = mode == "lcm-sdxl"
    # `is None` (not `or`): an explicit 0 from the CLI must error below, not
    # silently benchmark the default shape under the requested label.
    batch = (2 if lcm else 8) if batch is None else batch
    steps = (4 if lcm else 50) if steps is None else steps
    if batch < 1 or steps < 1:
        raise ValueError(f"batch/steps must be >=1, got {batch}/{steps}")

    _init_watchdog()
    _probe_with_retries()

    import dataclasses
    degraded = os.environ.get("DMOE_BENCH_FALLBACK", "0") == "1"
    fallback_leg = os.environ.get("DMOE_BENCH_LEG", "")
    flash = os.environ.get("DMOE_FLASH", "1") == "1"
    os.environ.setdefault("DMOE_FLASH_BLOCKS", "1024,1024")
    cfg = (sdxl_config(dtype=jnp.bfloat16, lcm=True) if lcm
           else sd15_config(dtype=jnp.bfloat16))
    unet = dataclasses.replace(cfg.unet, flash_attention=flash)
    if os.environ.get("DMOE_FUSED", "") in ("0", "1"):
        unet = dataclasses.replace(
            unet, use_fused_routing=os.environ["DMOE_FUSED"] == "1")
    if os.environ.get("DMOE_FAST_NORM", "0") == "1":
        unet = dataclasses.replace(unet, fast_norm=True)
    quant = os.environ.get("DMOE_QUANT", "0") == "1"
    if quant:
        # int8 W8A8 serving mode (ops/quant.py) — outputs differ from bf16, so
        # this is never the default headline; the metric label says int8.
        unet = dataclasses.replace(unet, quant_int8=True)
    wino = os.environ.get("DMOE_WINOGRAD", "0") == "1"
    if wino:
        # Winograd F(2x2,3x3) conv serving mode (ops/winograd.py) — same
        # opt-in policy as int8: outputs differ at bf16 rounding scale.
        unet = dataclasses.replace(unet, conv_winograd=True)
    cfg = dataclasses.replace(cfg, unet=unet)
    dc = int(os.environ.get("DMOE_DEEP_CACHE", "0"))
    if dc:
        # DeepCache serving mode (config.deep_cache_interval): full UNet every
        # dc-th step, cached-deep-feature shallow forward otherwise. Approximate
        # like int8/winograd — never the default headline.
        cfg = dataclasses.replace(cfg, deep_cache_interval=dc)
    if quant or wino:
        # VAE decoder convs join the serving mode (models/vae.py; the decode
        # runs once per image so this mostly matters at few-step serving).
        cfg = dataclasses.replace(cfg, vae=dataclasses.replace(
            cfg.vae, quant_int8=quant, conv_winograd=wino))
    if lcm:
        from diffusion_models_moe_tpu.pipelines.sdxl import SDXLPipeline
        pipe = SDXLPipeline(cfg)
    else:
        pipe = StableDiffusionPipeline(cfg)
    t_p = time.perf_counter()
    params = jax.block_until_ready(pipe.init_params(jax.random.PRNGKey(0)))
    _log(f"# init_params {time.perf_counter()-t_p:.1f}s (flash={flash})")

    rng = np.random.RandomState(0)
    labels = {layer_name(i): rng.permutation(np.arange(4 * d) % ((4 * d) // 20))
              for i, d in enumerate(cfg.unet.ff_dims())}
    ivs = build_moe_interventions(labels, topk_ratio=0.3)
    if os.environ.get("DMOE_NO_MOE", "0") == "1":
        ivs = None   # plain SD baseline, for measuring routing overhead

    # DMOE_HOOK_SIM=1: reference-semantics measurement on the SAME chip — every
    # GEGLU FF recomputes its projection behind an optimization barrier (the
    # hook's proj->chunk->gelu re-derivation, neuron_receivers/moefy.py:10-27)
    # and a per-(t, l) gate statistic is collected, like the reference's
    # receivers do. The resulting img/s is an UPPER bound on what the
    # reference's architecture could reach on this chip (its hooks also copy
    # full gates to host every call, which a traced program cannot imitate).
    # native-vs-hook-sim is therefore a measured, same-hardware lower bound on
    # the architecture-inversion win.
    hook_sim = os.environ.get("DMOE_HOOK_SIM", "0") == "1"
    tap = None
    if hook_sim:
        from diffusion_models_moe_tpu.taps import TapSpec
        tap = TapSpec(gate_sparsity=True)

    tcfg = cfg.text_encoder
    cond = jax.random.randint(jax.random.PRNGKey(1), (batch, tcfg.max_length),
                              0, tcfg.vocab_size)
    uncond = jnp.zeros_like(cond)

    mesh = None
    n_dev = 1
    if os.environ.get("DMOE_DP", "0") == "1" and len(jax.devices()) > 1:
        from diffusion_models_moe_tpu.parallel.mesh import create_mesh
        avail = len(jax.devices())
        n_dev = _dp_devices(batch, avail)
        if n_dev > 1:
            mesh = create_mesh(n_dev, dp=n_dev, tp=1)
            _log(f"# dp mesh over {n_dev} of {avail} devices (batch {batch})")
        else:
            n_dev = 1
            _log(f"# DMOE_DP=1 ignored: batch {batch} has no divisor <= "
                 f"{avail} other than 1")

    # Execution must be forced by a host fetch (through remote-device tunnels
    # block_until_ready can return before execution finishes), but fetching
    # the full (B, 512, 512, 3) f32 images (~100MB) measures TUNNEL bandwidth
    # (~25MB/s), not TPU throughput — profiled at 29% of wall time. A scalar
    # checksum depends on every pixel, so fetching it forces the whole
    # computation while shipping 4 bytes. (On a real TPU host the image copy
    # is PCIe, ~10ms — negligible either way.)
    checksum = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))

    def run(key):
        img, _ = pipe.generate(params, cond, uncond, key, num_steps=steps,
                               ivs=ivs, mesh=mesh, tap=tap)
        return float(np.asarray(jax.device_get(checksum(img))))

    # warmup/compile
    t_c = time.perf_counter()
    run(jax.random.PRNGKey(2))
    _log(f"# warmup (compile) {time.perf_counter()-t_c:.1f}s")
    t0 = time.perf_counter()
    for i in range(runs):
        run(jax.random.PRNGKey(3 + i))
    dt = time.perf_counter() - t0

    imgs_per_sec = batch * runs / dt
    variant = " int8" if quant else ""
    if wino:
        variant += f" winograd-m{os.environ.get('DMOE_WINO_TILE', '2')}"
    if dc:
        variant += f" deepcache-{dc}"
    if hook_sim:
        variant += " hook-sim"
    model_name = "SDXL-LCM" if lcm else "SD1.5"
    out = {
        "metric": f"moefied {model_name}{variant} images/sec/chip @ {steps} "
                  f"steps (batch {batch})",
        "value": round(imgs_per_sec, 4),
        "unit": "images/sec",
        # the 0.25 estimate is for the reference's hooked 50-step SD1.5 loop;
        # there is no comparable estimate for LCM-SDXL (reference publishes
        # nothing) so the LCM mode reports no multiple.
        "vs_baseline": 0.0 if lcm else
        round(imgs_per_sec / REFERENCE_HOOKED_IMGS_PER_SEC, 2),
    }
    if degraded:
        out["degraded"] = True
    if fallback_leg:
        out["fallback"] = fallback_leg
    if mesh is not None:
        out["metric"] = out["metric"].replace("/chip", f"/{n_dev}chips(dp)")
    print(json.dumps(out), flush=True)


# Fallback chain: each leg runs in a FRESH process (a crashed TPU worker can
# poison the in-process runtime). Only the flash-off leg is "degraded".
_FALLBACK_CHAIN = [
    ("flash_blocks_512", {"DMOE_FLASH_BLOCKS": "512,512"}),
    ("flash_off", {"DMOE_FLASH": "0", "DMOE_BENCH_FALLBACK": "1"}),
]


def _fallback(argv: list[str], err: Exception) -> int:
    _log(f"# primary bench failed: {type(err).__name__}: {str(err)[:300]}")
    for leg, extra in _FALLBACK_CHAIN:
        _log(f"# retrying in fresh process: {leg}")
        env = dict(os.environ, DMOE_BENCH_LEG=leg, **extra)
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), *argv],
                env=env, timeout=3000)
            if r.returncode == 0:
                return 0
        except Exception as e2:  # timeout or spawn failure
            _log(f"# fallback {leg} failed: {type(e2).__name__}: "
                 f"{str(e2)[:300]}")
    return 1


if __name__ == "__main__":
    kwargs = {}
    if len(sys.argv) > 1:
        kwargs["batch"] = int(sys.argv[1])
    if len(sys.argv) > 2:
        kwargs["steps"] = int(sys.argv[2])
    try:
        main(**kwargs)
    except Exception as e:
        rc = 1
        if isinstance(e, InitHang):
            # service-level wedge: fresh-process retries would hang on the
            # same init for their full timeouts — emit the JSON line now
            _log(f"# {e}; skipping fallback chain")
        elif os.environ.get("DMOE_BENCH_LEG", "") == "" \
                and os.environ.get("DMOE_BENCH_FALLBACK", "0") != "1":
            rc = _fallback(sys.argv[1:], e)
        if rc != 0:
            # label the failure with the mode actually requested, or a
            # bench_modes lcm leg's failure would be tabulated as SD1.5
            failed_model = ("SDXL-LCM @ 4 steps"
                            if os.environ.get("DMOE_BENCH_MODE") == "lcm-sdxl"
                            else "SD1.5 @ 50 steps")
            print(json.dumps({
                "metric": f"moefied {failed_model} images/sec/chip",
                "value": 0.0, "unit": "images/sec", "vs_baseline": 0.0,
                "degraded": True, "error": f"{type(e).__name__}: {str(e)[:300]}",
            }), flush=True)
        # propagate failure: a fallback LEG that crashed must exit nonzero or
        # the parent's returncode==0 check would treat it as success and stop
        # the chain early (and callers could not script against the bench).
        # os._exit, not sys.exit: a hung probe/init daemon thread makes normal
        # interpreter teardown abort in the TPU runtime's C++ atexit path
        # ("terminate called / FATAL: exception not rethrown") AFTER the JSON
        # line — skip teardown entirely once the evidence is out.
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(rc)
