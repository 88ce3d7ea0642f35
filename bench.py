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
 - a JSON line is always emitted, even on total failure (value 0.0 + "error");
 - a host-wide flock (/tmp/dmoe_tpu.lock) serializes TPU jobs so no watcher or
   second bench can contend with a timed run (round-2's driver number came in
   20% below the builder's with no way to tell why — VERDICT r2 weak #1);
 - the JSON carries an "evidence" block: per-run wall times, median/best/mean,
   spread + "contended" flag, init/probe/compile/rtt latencies (the tunnel
   fingerprint), load averages, timestamp, commit, and the DMOE_* knob set.
   The headline value is batch/median(run_times) over DMOE_RUNS (default 5)
   timed runs — median, so one contended run cannot move it.

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
DMOE_PAD_PROJ (default 1 since r3: fold the flash head-dim pad into the q/k/v
weights — BIT-exact and measured +4.4%, bench_modes.json pad_proj vs plain;
=0 restores the boundary pad; combines with DMOE_QUANT=1, where the int8
twins keep it bit-exact too),
DMOE_DEEP_CACHE=N (DeepCache serving mode: full UNet every N-th step, shallow
cached-deep-feature forward otherwise — approximate, composes with the other
serving modes),
DMOE_ATTN_ABSORB=1 (absorbed attention sub-block: LN+qkv prologue and
out-proj+residual epilogue as Pallas kernels around the stock flash call,
ops/attn_absorb_fused.py — exact-tier; bench_modes.json attnabs_* legs),
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

_LOCK_FD = None  # module-global: held for process lifetime once acquired

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))

REFERENCE_HOOKED_IMGS_PER_SEC = 0.25  # estimated, not measured — see module docstring


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _acquire_tpu_lock() -> float:
    """One heavy TPU job at a time (ops memory: parallel kills once wedged the
    tunnel >1h; round-2's driver number was 20% below the builder's, with a
    concurrent watcher job the plausible culprit). A host-wide flock
    serializes every bench/quality/watcher process; crashed holders release
    automatically. Returns seconds spent waiting. DMOE_LOCK_TIMEOUT bounds the
    wait; DMOE_NO_LOCK=1 opts out (nested: fallback legs inherit the parent's
    release, see _fallback)."""
    global _LOCK_FD
    if os.environ.get("DMOE_NO_LOCK", "0") == "1":
        return 0.0
    import fcntl
    path = os.environ.get("DMOE_LOCK_FILE", "/tmp/dmoe_tpu.lock")
    # "a", not "w": open() must not truncate the current holder's pid record
    fd = open(path, "a")
    t0 = time.perf_counter()
    deadline = t0 + float(os.environ.get("DMOE_LOCK_TIMEOUT", 7200))
    while True:
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            break
        except OSError:
            if time.perf_counter() > deadline:
                fd.close()
                raise InitHang("TPU lock busy past DMOE_LOCK_TIMEOUT — "
                               "another TPU job is running")
            time.sleep(10.0)
    fd.truncate(0)
    fd.write(f"{os.getpid()}\n")
    fd.flush()
    _LOCK_FD = fd  # keep open: flock is released on close/exit
    waited = time.perf_counter() - t0
    if waited > 1.0:
        _log(f"# tpu lock acquired after {waited:.0f}s wait")
    return waited


def _release_tpu_lock() -> None:
    global _LOCK_FD
    if _LOCK_FD is not None:
        try:
            _LOCK_FD.close()
        except OSError:
            pass
        _LOCK_FD = None


def _loadavg() -> float:
    try:
        return os.getloadavg()[0]
    except OSError:
        return -1.0


def _git_commit() -> str:
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, timeout=10).stdout.strip()
    except Exception:
        return ""


def _dp_devices(batch: int, avail: int) -> int:
    """Largest divisor of `batch` that fits the available devices — dp must
    divide the batch (lcm-sdxl defaults to batch 2, which an 8-device mesh
    cannot shard)."""
    return max(d for d in range(1, avail + 1) if batch % d == 0)


class InitHang(RuntimeError):
    """Backend init did not complete — wedged TPU tunnel (axon init can HANG
    rather than error; observed 2026-08-18 after killed clients)."""


def _init_watchdog(timeout_s: float = 1200.0) -> float:
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
    dt = time.perf_counter() - t0
    _log(f"# backend init {dt:.1f}s")
    return dt


def _probe() -> float:
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
    # a BaseException in the worker leaves box empty while done is set —
    # treat that as a probe failure, not an IndexError
    if not box:
        raise InitHang("probe worker died without a result")
    if isinstance(box[0], Exception):
        raise box[0]
    dt = time.perf_counter() - t0
    _log(f"# probe ok ({box[0]:.0f}) {dt:.1f}s "
         f"backend={jax.default_backend()}")
    return dt


def _probe_with_retries() -> float:
    """Wedges are often transient (the service digests killed clients'
    server-side work and recovers); a second patient attempt after a pause has
    been observed to succeed where the first hung. DMOE_PROBE_ATTEMPTS
    (default 2, clamped >=1 — 0 must not silently skip the probe) bounds total
    spend to ~attempts*(timeout+pause). Returns the successful probe's
    latency — the tunnel-health fingerprint recorded in the evidence block
    (386-801s observed normal; >900 is a wedge)."""
    attempts = max(1, int(os.environ.get("DMOE_PROBE_ATTEMPTS", 2)))
    for i in range(attempts):
        try:
            return _probe()
        except InitHang:
            if i == attempts - 1:
                raise
            _log(f"# probe attempt {i + 1}/{attempts} hung; "
                 "pausing 120s before retry")
            time.sleep(120)
    raise AssertionError("unreachable")


def main(batch: int | None = None, steps: int | None = None,
         runs: int | None = None) -> None:
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
    runs = max(1, int(os.environ.get("DMOE_RUNS", 5))) if runs is None \
        else runs
    if batch < 1 or steps < 1:
        raise ValueError(f"batch/steps must be >=1, got {batch}/{steps}")

    # round-2 postmortem (VERDICT weak #1): the driver's 0.8644 vs the
    # builder's 1.0752 same-config spread could not be attributed — no per-run
    # times, no tunnel fingerprint, no contention guard. Everything below
    # exists to make the next spread diagnosable: a host-wide lock so no
    # second TPU job overlaps, per-run wall times, probe latency, load
    # averages, and a median aggregate robust to one contended run.
    lock_wait_s = _acquire_tpu_lock()
    load_start = _loadavg()
    init_s = _init_watchdog()
    probe_s = _probe_with_retries()

    import dataclasses
    degraded = os.environ.get("DMOE_BENCH_FALLBACK", "0") == "1"
    fallback_leg = os.environ.get("DMOE_BENCH_LEG", "")
    flash = os.environ.get("DMOE_FLASH", "1") == "1"
    os.environ.setdefault("DMOE_FLASH_BLOCKS", "1024,1024")
    # Promoted r5 (VERDICT r4 item 4): the fused-FF kernel is the measured
    # best exact-tier config (bench_modes.json fff_pad 1.1308 vs pad_proj
    # 1.1221) and its full-geometry quality row sits AT the fp32 rounding
    # floor (quality_modes.json fff_pad rel-err 0.0440 vs fp32_reference
    # 0.0484, PSNR 36.7 vs 35.5) — rounding-scale parity confirmed, so the
    # driver headline now measures it. Explicit DMOE_FF_FUSED=0 restores the
    # previous pad_proj headline (bench_modes.py legs pin it both ways).
    os.environ.setdefault("DMOE_FF_FUSED", "1")
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
    compile_s = time.perf_counter() - t_c
    _log(f"# warmup (compile) {compile_s:.1f}s")
    run_times = []
    for i in range(runs):
        t0 = time.perf_counter()
        run(jax.random.PRNGKey(3 + i))
        run_times.append(time.perf_counter() - t0)
        _log(f"# run {i + 1}/{runs}: {run_times[-1]:.3f}s "
             f"({batch / run_times[-1]:.4f} img/s)")
    # post-run round-trip probe: a tiny jit fetch whose latency fingerprints
    # the tunnel AFTER the timed region (a slow tunnel inflates every run; a
    # transiently contended host inflates some)
    t_r = time.perf_counter()
    _ = float(np.asarray(jax.device_get(
        jax.jit(lambda a: a.sum())(jnp.ones((8, 8), jnp.bfloat16)))))
    rtt_s = time.perf_counter() - t_r
    load_end = _loadavg()

    med = float(np.median(run_times))
    spread = (max(run_times) - min(run_times)) / med if med > 0 else 0.0
    # median, not mean: one contended run out of N must not move the
    # headline (round-2's 20% driver-vs-builder spread, VERDICT weak #1)
    imgs_per_sec = batch / med
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
        # provenance + variance evidence (VERDICT r2 weak #1/#5): enough to
        # reconcile any future driver-vs-builder spread without a rerun
        "evidence": {
            "run_s": [round(t, 3) for t in run_times],
            "best_imgs_per_sec": round(batch / min(run_times), 4),
            "mean_imgs_per_sec": round(batch * len(run_times)
                                       / sum(run_times), 4),
            "spread": round(spread, 4),
            "contended": spread > 0.15 or load_end > 2.5,
            "init_s": round(init_s, 1),
            "probe_s": round(probe_s, 1),
            "compile_s": round(compile_s, 1),
            "rtt_s": round(rtt_s, 3),
            "lock_wait_s": round(lock_wait_s, 1),
            "loadavg": [round(load_start, 2), round(load_end, 2)],
            "ts_unix": int(time.time()),
            "commit": _git_commit(),
            "knobs": {k: v for k, v in sorted(os.environ.items())
                      if k.startswith("DMOE_")},
        },
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
    # the parent may hold the TPU lock from its failed attempt; a child that
    # blocks on it while the parent waits on the child is a deadlock
    _release_tpu_lock()
    # leg timeout must exceed the child's own worst-case pre-bench stall
    # (init watchdog + probe attempts * (timeout + pause)) plus compile+run
    # headroom, or a maximally wedged leg is killed before it can emit its
    # JSON evidence line (ADVICE r2)
    attempts = max(1, int(os.environ.get("DMOE_PROBE_ATTEMPTS", 2)))
    budget = (float(os.environ.get("DMOE_INIT_TIMEOUT", 1200))
              + attempts * (float(os.environ.get("DMOE_PROBE_TIMEOUT", 900))
                            + 120.0) + 1500.0)
    for leg, extra in _FALLBACK_CHAIN:
        _log(f"# retrying in fresh process: {leg}")
        env = dict(os.environ, DMOE_BENCH_LEG=leg, **extra)
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), *argv],
                env=env, timeout=budget)
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
        # success must also skip interpreter teardown: after a probe RETRY
        # succeeds (18ab4bb's scenario) the first attempt's hung daemon
        # thread survives into teardown, which can abort in the TPU
        # runtime's C++ atexit path with rc!=0 AFTER the success JSON —
        # the parent's returncode check would then discard a good result
        # (ADVICE r2, medium).
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)
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
