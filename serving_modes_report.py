"""Generate SERVING_MODES.md: the mode x throughput x quality-delta matrix.

Merges the two committed evidence files —
  bench_modes.json    (throughput: variance-robust median img/s + evidence)
  quality_modes.json  (fixed-seed A/B deltas vs exact bf16 + calibration rows)
— into one audited table (VERDICT r2 item 3). Pure formatting: every number
in the output is traceable to a committed artifact; nothing is measured here.
The header names the quality file ACTUALLY loaded and its recorded workload
(ADVICE r3: the generated doc must not claim SD1.5-geometry evidence when
the tiny CPU smoke supplied the rows), and each row flags a quality value
whose source commit differs from the bench leg's (VERDICT r3 #8).

  python serving_modes_report.py > SERVING_MODES.md
"""
from __future__ import annotations

import json
import sys

EXACT = {"plain", "plain16", "pad_proj", "pad16", "int8_pad"}
# int8_pad is exact relative to int8 (the pad twins are bit-exact) but int8
# itself approximates; tier shows the output-vs-bf16 relationship.
# "exact-tier (rounding-scale)" = same math, different summation/rounding
# points (bf16-ulp-scale deltas; quality rows sit at the fp32_reference
# floor): the winograd-fused, fused-FF (erf approximation + absorbed-LN fold
# order) and fused-chain (GN fold order + tap order) kernels all live here.
TIER = {
    "plain": "exact (headline)", "plain16": "exact", "pad_proj": "exact",
    "pad16": "exact", "int8": "approx (W8A8)", "int8_pad": "approx (W8A8)",
    "wino2": "exact-tier (rounding-scale)", "wino2_pad":
    "exact-tier (rounding-scale)", "winof": "exact-tier (rounding-scale)",
    "winof_pad": "exact-tier (rounding-scale)", "dc2": "approx (DeepCache)",
    "dc3": "approx (DeepCache)", "dc3_int8": "approx", "dc3_wino": "approx",
    "dc3_pad": "approx", "dc3_serve": "approx", "dc3_winof_pad": "approx",
    "fff": "exact-tier (rounding-scale)",
    "fff_pad": "exact-tier (rounding-scale)",
    "dc3_fff_pad": "approx (DeepCache)",
    "chain_pad": "exact-tier (rounding-scale)",
    "chain16_pad": "exact-tier (rounding-scale)",
    "chain_fff_pad": "exact-tier (rounding-scale)",
    "chain16_fff_pad": "exact-tier (rounding-scale)",
    "dc3_chain_pad": "approx (DeepCache)",
    "dc3_chain_fff_pad": "approx (DeepCache)",
}
PEAK_BF16 = 197e12   # v5e


def main() -> int:
    bench = {r["leg"]: r for r in json.load(open("bench_modes.json"))}
    qual, qmodes, qual_path = {}, {}, None
    # full-geometry quality run preferred; the tiny CPU smoke is the fallback
    # evidence (same tool, --tiny) until a full run lands
    for path in ("quality_modes.json", "quality_modes_tiny.json"):
        try:
            qual = json.load(open(path))
            qmodes = qual.get("modes", {})
            qual_path = path
            break
        except FileNotFoundError:
            continue
    qual_commit = qual.get("commit", "?")

    # per-leg MFU against the full-step MXU-padded roofline (roofline.py);
    # only meaningful for legs that execute the full UNet every step —
    # DeepCache legs skip logical work, so their MFU cell shows n/a
    try:
        from roofline import step_flops
        _, physical = step_flops()
    except Exception:
        physical = None

    def mfu(leg, res):
        v = res.get("value")
        if (physical is None or not v
                or "dc" in leg or "lcm" in leg or "16" in leg):
            return "—"
        return f"{physical * 50 * v / 8 / PEAK_BF16 * 100:.1f}%"

    # bench legs whose quality row lives under another name: `plain` IS the
    # quality reference (its determinism row is plain_rerun); plain16/pad16
    # are batch-16 THROUGHPUT legs of the same configs quality measures at
    # the fixed batch-8 workload
    QUAL_ALIAS = {"plain": "plain_rerun", "plain16": "plain_rerun",
                  "pad16": "pad_proj"}

    def q(leg, field):
        m = qmodes.get(QUAL_ALIAS.get(leg, leg), {})
        v = m.get(field)
        return "—" if v is None else v

    def qflag(leg, bench_commit):
        """Mark quality cells whose source commit differs from the leg's
        bench commit (evidence captured at different tree states); aliased
        rows (see QUAL_ALIAS) get ‡."""
        if QUAL_ALIAS.get(leg, leg) not in qmodes:
            return ""
        mark = "" if qual_commit == bench_commit else " †"
        if leg in QUAL_ALIAS:
            mark += " ‡"
        return mark

    lines = [
        "# Serving modes: throughput x quality matrix",
        "",
        "Throughput: committed `bench_modes.json` (median-of-5 on one v5e "
        "chip, batch 8 @ 50 steps, host-wide TPU lock, per-run evidence; "
        "`vs est.` is vs the ESTIMATED 0.25 img/s reference hooked-GPU "
        "loop — the reference publishes no numbers, BASELINE.md).",
        f"Quality: committed `{qual_path}` (fixed-seed A/B vs the exact bf16 "
        f"leg; workload: {qual.get('workload', '—')}; random weights — "
        "deltas quantify NUMERICAL perturbation of the measured program; "
        "re-run with real weights via the same tool the day a snapshot "
        "exists).",
        "MFU: leg throughput x the analytic MXU-padded step FLOPs "
        "(roofline.py) over the 197 TF/s v5e bf16 peak; full-work legs only.",
        "",
        "| mode | tier | img/s | vs est. | MFU | latent rel-err | PSNR (dB) "
        "| CLIP cos | run spread | contended |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    any_flag = False
    for leg, r in bench.items():
        res = r.get("result") or {}
        ev = res.get("evidence", {})
        flag = qflag(leg, ev.get("commit", "?"))
        any_flag = any_flag or bool(flag)
        lines.append(
            f"| {leg} | {TIER.get(leg, '?')} | {res.get('value', '—')} | "
            f"{res.get('vs_baseline', '—')}x | {mfu(leg, res)} | "
            f"{q(leg, 'latent_rel_err')}{flag} | "
            f"{q(leg, 'image_psnr_db')}{flag} | {q(leg, 'clip_cos')}{flag} | "
            f"{ev.get('spread', '—')} | {ev.get('contended', '—')} |")
    if any_flag:
        lines.append("")
        lines.append(f"† quality row captured at commit `{qual_commit}`, a "
                     "different tree state than this leg's bench evidence "
                     "(re-run whichever is stale to reconcile).")
        lines.append("‡ quality row measured under the leg's config at the "
                     "fixed batch-8 quality workload: `plain` is the quality "
                     "reference itself (determinism row `plain_rerun`); "
                     "`plain16`/`pad16` are batch-16 throughput legs of the "
                     "`plain`/`pad_proj` configs.")
    if qual.get("workload", "").startswith("tiny") and any(
            "—" in line for line in lines):
        lines.append("")
        lines.append("Legs with an empty quality cell are the Pallas-kernel "
                     "modes (winof/fff/chain): their kernels dispatch only on "
                     "a TPU backend, so a tiny CPU run would measure the XLA "
                     "fallback and mislabel it as kernel evidence — those "
                     "rows come only from the full-geometry on-chip run "
                     "(`python quality_modes.py`, pending tunnel health — "
                     "VERDICT_RESPONSE.md r4 item 2).")
    lines += ["", f"## Calibration rows (`{qual_path}`)", ""]
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
        f"- quality run: `{qual_path}`, commit `{qual_commit}`, "
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
