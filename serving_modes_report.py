"""Generate SERVING_MODES.md: the mode x throughput x quality-delta matrix.

Merges the two committed evidence files —
  bench_modes.json    (throughput: variance-robust median img/s + evidence)
  quality_modes.json  (fixed-seed A/B deltas vs exact bf16 + calibration rows)
— into one audited table (VERDICT r2 item 3). Pure formatting: every number
in the output is traceable to a committed artifact; nothing is measured here.

  python serving_modes_report.py > SERVING_MODES.md
"""
from __future__ import annotations

import json
import sys

EXACT = {"plain", "plain16", "pad_proj", "pad16", "int8_pad"}
# int8_pad is exact relative to int8 (the pad twins are bit-exact) but int8
# itself approximates; tier shows the output-vs-bf16 relationship
TIER = {
    "plain": "exact (headline)", "plain16": "exact", "pad_proj": "exact",
    "pad16": "exact", "int8": "approx (W8A8)", "int8_pad": "approx (W8A8)",
    "wino2": "exact-tier (rounding-scale)", "wino2_pad":
    "exact-tier (rounding-scale)", "winof": "exact-tier (rounding-scale)",
    "winof_pad": "exact-tier (rounding-scale)", "dc2": "approx (DeepCache)",
    "dc3": "approx (DeepCache)", "dc3_int8": "approx", "dc3_wino": "approx",
    "dc3_pad": "approx", "dc3_serve": "approx", "dc3_winof_pad": "approx",
    "fff": "exact (fused-FF Pallas)", "fff_pad": "exact (fused-FF Pallas)",
    "dc3_fff_pad": "approx (DeepCache)",
}


def main() -> int:
    bench = {r["leg"]: r for r in json.load(open("bench_modes.json"))}
    qual, qmodes = {}, {}
    # full-geometry quality run preferred; the tiny CPU smoke is the fallback
    # evidence (same tool, --tiny) until a full run lands
    for path in ("quality_modes.json", "quality_modes_tiny.json"):
        try:
            qual = json.load(open(path))
            qmodes = qual.get("modes", {})
            break
        except FileNotFoundError:
            continue

    def q(leg, field, alt=None):
        m = qmodes.get(leg) or qmodes.get(alt or "", {})
        v = m.get(field)
        return "—" if v is None else v

    lines = [
        "# Serving modes: throughput x quality matrix",
        "",
        "Throughput: committed `bench_modes.json` (median-of-5 on one v5e "
        "chip, batch 8 @ 50 steps, host-wide TPU lock, per-run evidence; "
        "`vs est.` is vs the ESTIMATED 0.25 img/s reference hooked-GPU "
        "loop — the reference publishes no numbers, BASELINE.md).",
        "Quality: committed `quality_modes.json` (fixed-seed A/B vs the "
        "exact bf16 leg at SD1.5 geometry; random weights — deltas quantify "
        "NUMERICAL perturbation of the real-geometry program; re-run with "
        "real weights via the same tool the day a snapshot exists).",
        "",
        "| mode | tier | img/s | vs est. | latent rel-err | PSNR (dB) | "
        "CLIP cos | run spread | contended |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for leg, r in bench.items():
        res = r.get("result") or {}
        ev = res.get("evidence", {})
        lines.append(
            f"| {leg} | {TIER.get(leg, '?')} | {res.get('value', '—')} | "
            f"{res.get('vs_baseline', '—')}x | {q(leg, 'latent_rel_err')} | "
            f"{q(leg, 'image_psnr_db')} | {q(leg, 'clip_cos')} | "
            f"{ev.get('spread', '—')} | {ev.get('contended', '—')} |")
    lines += ["", "## Calibration rows (quality_modes.json)", ""]
    for name in ("plain_rerun", "fp32_reference", "decorrelated"):
        m = qmodes.get(name)
        if not m or "error" in (m or {}):
            continue
        lines.append(f"- **{name}**: latent rel-err {m['latent_rel_err']}, "
                     f"PSNR {m['image_psnr_db']} dB, CLIP cos {m['clip_cos']}"
                     f" — {m.get('note', '')}")
    lines += [
        "",
        "## Provenance",
        "",
        f"- bench legs: commits "
        f"{sorted({(r.get('result') or {}).get('evidence', {}).get('commit', '?') for r in bench.values()})}, "
        "knobs + per-run times inside `bench_modes.json`.",
        f"- quality run: commit `{qual.get('commit', '—')}`, "
        f"ts {qual.get('ts_unix', '—')}, workload: "
        f"{qual.get('workload', '—')}; CLIP featurizer: "
        f"{qual.get('clip_featurizer', '—')}.",
        "",
        "Regenerate with `python serving_modes_report.py > SERVING_MODES.md` "
        "after re-measuring either artifact.",
    ]
    sys.stdout.write("\n".join(lines) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
