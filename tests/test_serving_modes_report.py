"""Serving-matrix health check (VERDICT r4 item 6): the generated report
must fail loudly (nonzero exit) when an advertised leg has an empty quality
cell or quality evidence stale relative to its bench evidence, so the matrix
cannot silently regress to the r3 empty-cells state."""
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write(tmp_path, bench, qual):
    (tmp_path / "bench_modes.json").write_text(json.dumps(bench))
    (tmp_path / "quality_modes.json").write_text(json.dumps(qual))


def _bench_leg(leg, commit="abc1234"):
    return {"leg": leg, "rc": 0,
            "result": {"value": 1.0, "vs_baseline": 4.0,
                       "evidence": {"commit": commit, "spread": 0.001,
                                    "contended": False}}}


def _qrow(commit="abc1234"):
    return {"latent_rel_err": 0.001, "image_psnr_db": 60.0,
            "clip_cos": 0.999, "commit": commit}


def _qual(rows):
    return {"workload": "SD1.5 geometry bf16, batch 8, 50 steps",
            "commit": "abc1234", "ts_unix": 1, "clip_featurizer": "x",
            "modes": rows}


@pytest.fixture()
def report(monkeypatch, tmp_path):
    import serving_modes_report
    monkeypatch.chdir(tmp_path)
    return serving_modes_report


def test_check_ok_when_complete_and_same_commit(report, tmp_path, capsys):
    _write(tmp_path, [_bench_leg("plain"), _bench_leg("fff_pad")],
           _qual({"plain_rerun": _qrow(), "fff_pad": _qrow()}))
    assert report.main(["--check"]) == 0
    assert "CHECK OK" in capsys.readouterr().err


def test_check_fails_on_empty_quality_cell(report, tmp_path, capsys):
    _write(tmp_path, [_bench_leg("plain"), _bench_leg("winof")],
           _qual({"plain_rerun": _qrow()}))   # no winof row
    assert report.main(["--check"]) == 1
    assert "empty quality cells" in capsys.readouterr().err


def test_check_fails_on_stale_headline_leg(report, tmp_path, monkeypatch,
                                           capsys):
    # commits differ AND a file on the headline leg's executed path changed
    # between them -> hard fail; the leg-irrelevant change must NOT flag
    # (docs-only / other-kernel churn is the noise the per-leg model kills)
    _write(tmp_path, [_bench_leg("fff_pad", "old0001"),
                      _bench_leg("chain_pad", "old0001")],
           _qual({"fff_pad": _qrow("new0002"),
                  "chain_pad": _qrow("new0002")}))
    monkeypatch.setattr(
        report, "_changed_paths",
        lambda c1, c2: ["diffusion_models_moe_tpu/ops/geglu_ff_fused.py"])
    assert report.main(["--check"]) == 1
    err = capsys.readouterr().err
    assert "fff_pad" in err.split("headline")[1]


def test_check_warns_on_stale_nonheadline_leg(report, tmp_path, monkeypatch,
                                              capsys):
    _write(tmp_path, [_bench_leg("plain", "old0001"),
                      _bench_leg("chain_pad", "old0001")],
           _qual({"plain_rerun": _qrow("new0002"),
                  "chain_pad": _qrow("new0002")}))
    monkeypatch.setattr(
        report, "_changed_paths",
        lambda c1, c2: ["diffusion_models_moe_tpu/ops/conv_chain_fused.py"])
    assert report.main(["--check"]) == 0   # warn, not gate
    err = capsys.readouterr().err
    assert "CHECK WARN" in err and "chain_pad" in err


def test_check_ok_when_changed_paths_irrelevant(report, tmp_path,
                                                monkeypatch):
    _write(tmp_path, [_bench_leg("plain", "old0001")],
           _qual({"plain_rerun": _qrow("new0002")}))
    monkeypatch.setattr(
        report, "_changed_paths",
        lambda c1, c2: ["diffusion_models_moe_tpu/benchmarks/fid.py"])
    assert report.main(["--check"]) == 0


def test_check_fails_on_unknowable_commits(report, tmp_path, monkeypatch):
    _write(tmp_path, [_bench_leg("plain", "old0001")],
           _qual({"plain_rerun": _qrow("gone999")}))
    monkeypatch.setattr(report, "_changed_paths", lambda c1, c2: None)
    assert report.main(["--check"]) == 1


def test_check_fails_on_tiny_workload(report, tmp_path, capsys):
    qual = _qual({"plain_rerun": _qrow()})
    qual["workload"] = "tiny CPU smoke"
    _write(tmp_path, [_bench_leg("plain")], qual)
    assert report.main(["--check"]) == 1
    assert "tiny smoke" in capsys.readouterr().err


def test_report_renders_without_check(report, tmp_path, capsys):
    _write(tmp_path, [_bench_leg("plain"), _bench_leg("dc3_pad")],
           _qual({"plain_rerun": _qrow(), "dc3_pad": _qrow()}))
    assert report.main([]) == 0
    out = capsys.readouterr().out
    assert "| plain |" in out and "| dc3_pad |" in out
    # DeepCache legs get no MFU cell (they skip logical work)
    dc3_row = [ln for ln in out.splitlines() if ln.startswith("| dc3_pad")][0]
    assert "—" in dc3_row
