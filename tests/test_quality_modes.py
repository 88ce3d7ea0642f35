"""Smoke test for the serving-mode quality A/B harness (quality_modes.py,
VERDICT r2 item 3: attach quality deltas to the approximate modes)."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_quality_modes_tiny(tmp_path, capsys, monkeypatch):
    import quality_modes

    out = tmp_path / "q.json"
    monkeypatch.setenv("DMOE_QUALITY_OUT", str(out))
    rc = quality_modes.main(
        ["--tiny", "plain_rerun", "decorrelated", "dc2", "pad_proj"])
    assert rc == 0
    rep = json.loads(out.read_text())
    modes = rep["modes"]
    # determinism: same key, fresh instance -> bit-identical
    assert modes["plain_rerun"]["latent_rel_err"] == 0.0
    assert modes["plain_rerun"]["clip_cos"] == 1.0
    # pad_proj is exact by construction (zero-padded head dim folded into
    # q/k/v weights; models/attention.py:_PadHeadProj)
    assert modes["pad_proj"]["latent_rel_err"] == 0.0
    # dc2 approximates: perturbed, but FAR from the different-image floor
    floor = modes["decorrelated"]
    assert 0.0 < modes["dc2"]["latent_rel_err"] < 0.5 * floor["latent_rel_err"]
    assert modes["dc2"]["clip_cos"] > floor["clip_cos"]
    assert modes["dc2"]["image_psnr_db"] > floor["image_psnr_db"]
    # provenance
    assert rep["commit"]
    assert rep["ts_unix"] > 0
    # the printed markdown table includes every row
    table = capsys.readouterr().out
    for name in ("plain_rerun", "decorrelated", "pad_proj", "dc2"):
        assert f"| {name} |" in table
