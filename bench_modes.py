"""Serialized serving-mode benchmark matrix.

Runs `bench.py` once per serving mode in a FRESH process each (axon-tunnel
rule: one heavy TPU job at a time; a crashed worker can poison an in-process
backend), collects the one-line JSONs, writes `bench_modes.json`, and prints
a markdown table. Modes (see bench.py docstring for the knobs):

  plain          bf16, exact headline (what the driver records)
  pad_proj       + head-dim pad folded into q/k/v weights (exact)
  wino2 / wino4  Winograd F(2x2)/F(4x4) conv serving modes
  int8           W8A8 serving mode (per-token/per-sample scales)
  combinations   int8 x winograd x pad_proj
  lcm_sdxl       moefied SDXL-LCM @ 4 steps (DMOE_BENCH_MODE=lcm-sdxl)

Aborts the queue on an init hang (a wedged tunnel would hang every leg the
same way — memory/ops note in bench.py). Usage:

  python bench_modes.py            # all modes
  python bench_modes.py plain int8 # a subset
  python bench_modes.py --merge /tmp/new.json   # fold a subset re-run into
                                   # bench_modes.json (newest leg wins)
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# Every knob any mode sets. Each leg RESETS all of these to its own values —
# a DMOE_QUANT=1 left exported in the caller's shell must not silently turn
# the 'plain' leg into int8 while the table still labels it 'plain'.
KNOBS = ("DMOE_QUANT", "DMOE_WINOGRAD", "DMOE_WINO_TILE", "DMOE_WINO_FUSED",
         "DMOE_PAD_PROJ", "DMOE_BENCH_MODE", "DMOE_DEEP_CACHE",
         "DMOE_FF_FUSED", "DMOE_FF_ABSORB", "DMOE_CONV_CHAIN",
         "DMOE_CHAIN_SHAPES", "DMOE_ATTN_ABSORB")

# DMOE_PAD_PROJ defaults ON since r3 (models/attention.py — bit-exact,
# measured +4.4%); every leg pins it explicitly so re-running a leg measures
# the SAME config its committed evidence was captured under.
MODES: dict[str, dict[str, str]] = {
    "plain": {"DMOE_PAD_PROJ": "0"},
    # exact bf16 at batch 16 — throughput-vs-batch leg
    "plain16": {"DMOE_PAD_PROJ": "0"},
    "pad_proj": {"DMOE_PAD_PROJ": "1"},   # == the bench/driver default config
    "pad16": {"DMOE_PAD_PROJ": "1"},
    # whole-FF-in-one-Pallas-kernel legs (ops/geglu_ff_fused.py): proj dots +
    # exact GELU + top-k routing + out-proj without (B,S,2H) HBM round-trips
    "fff": {"DMOE_FF_FUSED": "1", "DMOE_PAD_PROJ": "0"},
    "fff_pad": {"DMOE_FF_FUSED": "1", "DMOE_PAD_PROJ": "1"},
    "dc3_fff_pad": {"DMOE_DEEP_CACHE": "3", "DMOE_FF_FUSED": "1",
                    "DMOE_PAD_PROJ": "1"},
    # fused resblock-chain kernel legs (ops/conv_chain_fused.py): GN+SiLU
    # prologue + direct-conv taps + bias/residual epilogue in one kernel —
    # the subsuming kernel ROOFLINE.md 3a calls for
    "chain_pad": {"DMOE_CONV_CHAIN": "1", "DMOE_PAD_PROJ": "1"},
    "chain_fff_pad": {"DMOE_CONV_CHAIN": "1", "DMOE_FF_FUSED": "1",
                      "DMOE_PAD_PROJ": "1"},
    "dc3_chain_pad": {"DMOE_DEEP_CACHE": "3", "DMOE_CONV_CHAIN": "1",
                      "DMOE_PAD_PROJ": "1"},
    "dc3_chain_fff_pad": {"DMOE_DEEP_CACHE": "3", "DMOE_CONV_CHAIN": "1",
                          "DMOE_FF_FUSED": "1", "DMOE_PAD_PROJ": "1"},
    # chain restricted to the one 1.657x micro-win site (16x16x1280->1280):
    # bisects whether the 32x32 marginal wins carry the end-to-end boundary
    # tax that made chain_pad negative (ROOFLINE.md §3d)
    "chain16_pad": {"DMOE_CONV_CHAIN": "1", "DMOE_CHAIN_SHAPES": "16",
                    "DMOE_PAD_PROJ": "1"},
    "chain16_fff_pad": {"DMOE_CONV_CHAIN": "1", "DMOE_CHAIN_SHAPES": "16",
                        "DMOE_FF_FUSED": "1", "DMOE_PAD_PROJ": "1"},
    # absorbed-attention kernel legs (ops/attn_absorb_fused.py): LN+qkv
    # prologue writing flash's (B,H,S,d) layout + out-proj+residual epilogue
    # consuming it — the last un-attacked S-minor residual (ROOFLINE.md §2,
    # VERDICT r4 item 3)
    "attnabs_pad": {"DMOE_ATTN_ABSORB": "1", "DMOE_PAD_PROJ": "1"},
    "attnabs_fff_pad": {"DMOE_ATTN_ABSORB": "1", "DMOE_FF_FUSED": "1",
                        "DMOE_PAD_PROJ": "1"},
    "dc3_attnabs_fff_pad": {"DMOE_DEEP_CACHE": "3", "DMOE_ATTN_ABSORB": "1",
                            "DMOE_FF_FUSED": "1", "DMOE_PAD_PROJ": "1"},
    # absorb bisection (r5 profile: full absorb adds 550ms/gen of kernel
    # time vs ~541ms removed boundary work — which half loses?)
    "attnabs_qkv_fff_pad": {"DMOE_ATTN_ABSORB": "qkv", "DMOE_FF_FUSED": "1",
                            "DMOE_PAD_PROJ": "1"},
    "attnabs_out_fff_pad": {"DMOE_ATTN_ABSORB": "out", "DMOE_FF_FUSED": "1",
                            "DMOE_PAD_PROJ": "1"},
    "wino2": {"DMOE_WINOGRAD": "1", "DMOE_PAD_PROJ": "0"},
    "wino4": {"DMOE_WINOGRAD": "1", "DMOE_WINO_TILE": "4",
              "DMOE_PAD_PROJ": "0"},
    "wino2_pad": {"DMOE_WINOGRAD": "1", "DMOE_PAD_PROJ": "1"},
    # fused Pallas Winograd (ops/winograd_fused.py): transforms stay in VMEM
    # — the XLA formulation is HBM-bound (dc3_wino 0.7445 vs dc3 1.4265)
    "winof": {"DMOE_WINOGRAD": "1", "DMOE_WINO_FUSED": "1",
              "DMOE_PAD_PROJ": "0"},
    "winof_pad": {"DMOE_WINOGRAD": "1", "DMOE_WINO_FUSED": "1",
                  "DMOE_PAD_PROJ": "1"},
    "dc3_winof_pad": {"DMOE_DEEP_CACHE": "3", "DMOE_WINOGRAD": "1",
                      "DMOE_WINO_FUSED": "1", "DMOE_PAD_PROJ": "1"},
    "int8": {"DMOE_QUANT": "1", "DMOE_PAD_PROJ": "0"},
    "int8_wino2": {"DMOE_QUANT": "1", "DMOE_WINOGRAD": "1",
                   "DMOE_PAD_PROJ": "0"},
    "int8_pad": {"DMOE_QUANT": "1", "DMOE_PAD_PROJ": "1"},
    "int8_wino2_pad": {"DMOE_QUANT": "1", "DMOE_WINOGRAD": "1",
                       "DMOE_PAD_PROJ": "1"},
    "dc2": {"DMOE_DEEP_CACHE": "2", "DMOE_PAD_PROJ": "0"},
    "dc3": {"DMOE_DEEP_CACHE": "3", "DMOE_PAD_PROJ": "0"},
    # dc3_serve bisection legs (round-2 collapse: the full composition
    # measured 0.6837 vs dc3-alone 1.4279 — which partner kills it?)
    "dc3_int8": {"DMOE_DEEP_CACHE": "3", "DMOE_QUANT": "1",
                 "DMOE_PAD_PROJ": "0"},
    "dc3_wino": {"DMOE_DEEP_CACHE": "3", "DMOE_WINOGRAD": "1",
                 "DMOE_PAD_PROJ": "0"},
    "dc3_pad": {"DMOE_DEEP_CACHE": "3", "DMOE_PAD_PROJ": "1"},
    "dc3_serve": {"DMOE_DEEP_CACHE": "3", "DMOE_QUANT": "1",
                  "DMOE_WINOGRAD": "1", "DMOE_PAD_PROJ": "1"},
    "lcm_sdxl": {"DMOE_BENCH_MODE": "lcm-sdxl", "DMOE_PAD_PROJ": "0"},
    "lcm_sdxl_serve": {"DMOE_BENCH_MODE": "lcm-sdxl", "DMOE_QUANT": "1",
                       "DMOE_WINOGRAD": "1", "DMOE_PAD_PROJ": "0"},
}
# bench.py defaults DMOE_FF_FUSED=1 since r5 (the promoted headline config),
# so every leg now pins it explicitly — a leg without "fff" in its name
# measures the un-fused FF its committed evidence was captured under.
for _env in MODES.values():
    _env.setdefault("DMOE_FF_FUSED", "0")

# extra argv per leg (bench.py takes [batch [steps]]); legs not listed run
# the bench defaults
MODE_ARGS: dict[str, list[str]] = {
    "plain16": ["16"],
    "pad16": ["16"],
}


def leg_env(extra_env: dict[str, str]) -> dict[str, str]:
    env = {k: v for k, v in os.environ.items() if k not in KNOBS}
    env.update(extra_env)
    env.setdefault("DMOE_INIT_TIMEOUT", "2000")
    return env


def run_leg(name: str, extra_env: dict[str, str],
            timeout_s: float) -> dict:
    env = leg_env(extra_env)
    t0 = time.perf_counter()
    # start_new_session + killpg: bench.py's fallback chain spawns fresh-
    # process legs of its own; killing only the direct child on timeout would
    # orphan a grandchild still running a heavy TPU job CONCURRENTLY with the
    # next leg (the one-job-at-a-time tunnel rule this module exists for).
    proc = subprocess.Popen(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "bench.py"), *MODE_ARGS.get(name, [])],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True, start_new_session=True)
    try:
        stdout, stderr = proc.communicate(timeout=timeout_s)
        rc = proc.returncode
    except subprocess.TimeoutExpired:
        import signal
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            proc.kill()
        stdout, stderr = proc.communicate()
        rc = -1
    parsed = None
    for line in reversed(stdout.strip().splitlines()):
        try:
            parsed = json.loads(line)
            break
        except json.JSONDecodeError:
            continue
    return {"leg": name, "rc": rc, "result": parsed,
            "wall_s": round(time.perf_counter() - t0, 1),
            "init_hang": "InitHang" in stderr + stdout}


def merge(paths: list[str],
          out_path: str = "bench_modes.json") -> int:
    """Merge leg results from `paths` into `out_path` by leg name (newest
    wins, order preserved, new legs appended) — re-running a subset with
    DMOE_MODES_OUT must not clobber the committed evidence for the rest."""
    try:
        with open(out_path) as f:
            base = json.load(f)
    except FileNotFoundError:
        base = []
    index = {e["leg"]: i for i, e in enumerate(base)}
    for p in paths:
        with open(p) as f:
            for e in json.load(f):
                if e["leg"] in index:
                    base[index[e["leg"]]] = e
                else:
                    index[e["leg"]] = len(base)
                    base.append(e)
    with open(out_path, "w") as f:
        json.dump(base, f, indent=1)
    print(f"# merged {paths} -> {out_path} ({len(base)} legs)",
          file=sys.stderr)
    return 0


def main(argv: list[str]) -> int:
    if argv and argv[0] == "--merge":
        return merge(argv[1:])
    names = argv or list(MODES)
    unknown = [n for n in names if n not in MODES]
    if unknown:
        print(f"unknown modes {unknown}; known: {list(MODES)}",
              file=sys.stderr)
        return 2
    # default must exceed bench.py's own worst case (primary attempt + two
    # 3000s fresh-process fallback legs), or a leg mid-recovery is killed
    # and recorded rc=-1 although its 512-block retry would have succeeded
    timeout_s = float(os.environ.get("DMOE_LEG_TIMEOUT", "8000"))
    out_path = os.environ.get("DMOE_MODES_OUT", "bench_modes.json")
    results = []
    for name in names:
        print(f"# leg {name} ...", file=sys.stderr, flush=True)
        res = run_leg(name, MODES[name], timeout_s)
        results.append(res)
        with open(out_path, "w") as f:          # partial results survive kills
            json.dump(results, f, indent=1)
        print(f"# leg {name}: rc={res['rc']} {res['result']}",
              file=sys.stderr, flush=True)
        if res["init_hang"]:
            print("# init hang (wedged tunnel) — aborting remaining legs",
                  file=sys.stderr)
            break
    print("| leg | img/s | metric |\n|---|---|---|")
    for r in results:
        v = r["result"] or {}
        metric = v.get("metric", "rc=%d" % r["rc"])
        print(f"| {r['leg']} | {v.get('value', '—')} | {metric} |")
    return 0 if all(r["rc"] == 0 for r in results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
