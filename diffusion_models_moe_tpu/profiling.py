"""Profiling helpers: the perfetto-trace recipe that produced round 1's
flash-attention win, as reusable code instead of README prose.

The reference has no profiling support at all (SURVEY.md §5.1 — tqdm+prints).
On TPU the workflow that works in this environment:

    from diffusion_models_moe_tpu.profiling import trace, top_ops
    with trace("/tmp/prof"):                 # run the jitted fn inside
        np.asarray(jax.device_get(fn(x)))    # force a real fetch: through
                                             # remote tunnels block_until_ready
                                             # can return early
    for row in top_ops("/tmp/prof")[:20]:
        print(row)

`top_ops` parses the perfetto trace (events carry XLA op names, source lines,
and flops/bytes annotations) and aggregates device-time per op name — enough to
see e.g. "fusion.123 (attention scores) = 67% of step" without a UI.
"""
from __future__ import annotations

import contextlib
import glob
import gzip
import json
import os
from collections import defaultdict
from typing import Optional


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace with perfetto output (no TensorBoard needed)."""
    import jax
    jax.profiler.start_trace(log_dir, create_perfetto_trace=True)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def _find_perfetto(log_dir: str) -> str:
    hits = sorted(glob.glob(os.path.join(
        log_dir, "**", "*perfetto_trace.json.gz"), recursive=True))
    if not hits:
        raise FileNotFoundError(f"no perfetto trace under {log_dir}")
    return hits[-1]


def load_events(log_dir: str) -> list[dict]:
    """Raw complete-events ('X') from the newest perfetto trace."""
    with gzip.open(_find_perfetto(log_dir), "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", data) or []
    return [e for e in events if e.get("ph") == "X" and "dur" in e]


def top_ops(log_dir: str, min_us: float = 0.0,
            device_only: bool = True) -> list[dict]:
    """Aggregate duration by event name, descending.

    Returns [{"name", "total_us", "count", "pct"}]. With device_only, host
    python/runtime threads (names with '/' paths or 'Thread' categories) are
    skipped heuristically by keeping only events that carry XLA-ish names.
    """
    events = load_events(log_dir)
    agg = defaultdict(lambda: [0.0, 0])
    for e in events:
        name = e.get("name", "")
        if device_only and (name.startswith("$") or name.endswith(".py")
                            or "python" in name.lower()):
            continue
        agg[name][0] += float(e["dur"])
        agg[name][1] += 1
    total = sum(v[0] for v in agg.values()) or 1.0
    rows = [{"name": k, "total_us": round(v[0], 1), "count": v[1],
             "pct": round(100.0 * v[0] / total, 2)}
            for k, v in agg.items() if v[0] >= min_us]
    return sorted(rows, key=lambda r: -r["total_us"])


def step_time_report(log_dir: str, top_n: int = 25) -> str:
    """Human-readable table of the top ops (the artifact to paste into perf
    commit messages / docstrings)."""
    rows = top_ops(log_dir)[:top_n]
    width = max((len(r["name"]) for r in rows), default=4)
    lines = [f"{'op':<{width}}  {'total_ms':>9}  {'count':>6}  {'pct':>6}"]
    for r in rows:
        lines.append(f"{r['name']:<{width}}  {r['total_us']/1000.0:>9.3f}  "
                     f"{r['count']:>6}  {r['pct']:>5.1f}%")
    return "\n".join(lines)


def profile_generate(pipe, params, cond, uncond, log_dir: str,
                     num_steps: int = 50, ivs=None,
                     key: Optional[object] = None) -> str:
    """Convenience wrapper: warm up (compile outside the trace), then trace one
    full generate and return the report."""
    import jax
    import numpy as np
    key = key if key is not None else jax.random.PRNGKey(0)

    def run():
        img, _ = pipe.generate(params, cond, uncond, key,
                               num_steps=num_steps, ivs=ivs)
        return np.asarray(jax.device_get(img))

    run()                                   # compile + warm
    with trace(log_dir):
        run()
    return step_time_report(log_dir)
