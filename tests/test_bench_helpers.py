"""Pure-python bench harness helpers (no TPU, no backend init).

bench.py / bench_modes.py are the driver-facing perf evidence; these tests pin
the harness logic that review found could silently corrupt the matrix:
knob leakage into the 'plain' leg, dp meshes that can't shard the batch,
and `or`-defaults swallowing explicit zeros.
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import bench_modes  # noqa: E402


def test_dp_devices_divides_batch():
    assert bench._dp_devices(8, 8) == 8
    assert bench._dp_devices(2, 8) == 2      # lcm-sdxl default batch
    assert bench._dp_devices(3, 8) == 3
    assert bench._dp_devices(7, 4) == 1      # prime > avail -> no sharding
    assert bench._dp_devices(12, 8) == 6


def test_leg_env_resets_foreign_knobs(monkeypatch):
    """A DMOE_QUANT=1 left exported in the shell must not leak into the
    'plain' leg (the matrix would label an int8 run 'plain')."""
    monkeypatch.setenv("DMOE_QUANT", "1")
    monkeypatch.setenv("DMOE_BENCH_MODE", "lcm-sdxl")
    monkeypatch.setenv("DMOE_FLASH_BLOCKS", "512,512")  # not a mode knob
    env = bench_modes.leg_env(bench_modes.MODES["plain"])
    assert "DMOE_QUANT" not in env
    assert "DMOE_BENCH_MODE" not in env
    assert env["DMOE_FLASH_BLOCKS"] == "512,512"         # non-knobs pass through
    env = bench_modes.leg_env(bench_modes.MODES["int8_wino2_pad"])
    assert (env["DMOE_QUANT"], env["DMOE_WINOGRAD"], env["DMOE_PAD_PROJ"]) \
        == ("1", "1", "1")
    assert "DMOE_BENCH_MODE" not in env                  # reset, not inherited


def test_every_mode_knob_is_in_reset_set():
    """Any knob ANY mode sets must be in KNOBS, or adding a mode silently
    reintroduces cross-leg leakage."""
    for name, extra in bench_modes.MODES.items():
        for k in extra:
            assert k in bench_modes.KNOBS, (name, k)


def test_bench_rejects_zero_batch_and_steps():
    for kwargs in ({"batch": 0}, {"steps": 0}):
        with pytest.raises(ValueError):
            bench.main(**kwargs)


def test_probe_watchdog_raises_on_hang(monkeypatch):
    """A wedged tunnel can hang EXECUTION, not just init (2026-08-19:
    devices() returned in 0.3s, the probe matmul never completed). The probe
    must enforce its own deadline and raise InitHang (which skips the
    fresh-process fallback chain — every leg would hang the same way)."""
    import jax

    monkeypatch.setenv("DMOE_PROBE_TIMEOUT", "0.05")

    def _hang(*a, **k):
        import time as _t
        _t.sleep(5.0)

    monkeypatch.setattr(jax, "jit", lambda f: _hang)
    with pytest.raises(bench.InitHang):
        bench._probe()


def test_probe_propagates_backend_errors(monkeypatch):
    """A probe that ERRORS (vs hangs) must surface the original exception so
    the fallback chain CAN run (a kernel fault is leg-specific)."""
    import jax

    def _boom(f):
        def inner(*a, **k):
            raise RuntimeError("kernel fault")
        return inner

    monkeypatch.setattr(jax, "jit", _boom)
    with pytest.raises(RuntimeError, match="kernel fault"):
        bench._probe()


def test_probe_retries_then_succeeds(monkeypatch):
    """A transiently wedged tunnel (first probe hangs, second completes) must
    not fail the bench — _probe_with_retries pauses and retries."""
    calls = []

    def fake_probe():
        calls.append(1)
        if len(calls) == 1:
            raise bench.InitHang("hung")

    monkeypatch.setattr(bench, "_probe", fake_probe)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    bench._probe_with_retries()
    assert len(calls) == 2


def test_probe_retries_exhausted_reraises(monkeypatch):
    monkeypatch.setenv("DMOE_PROBE_ATTEMPTS", "3")
    calls = []

    def fake_probe():
        calls.append(1)
        raise bench.InitHang("hung")

    monkeypatch.setattr(bench, "_probe", fake_probe)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    with pytest.raises(bench.InitHang):
        bench._probe_with_retries()
    assert len(calls) == 3


def test_bench_modes_merge_newest_wins(tmp_path):
    """--merge folds subset re-runs into the committed evidence file:
    matching legs are replaced in place, new legs appended, others kept."""
    import json

    out = tmp_path / "bench_modes.json"
    out.write_text(json.dumps([
        {"leg": "plain", "rc": 0, "result": {"value": 1.0}},
        {"leg": "int8", "rc": 0, "result": {"value": 2.0}},
    ]))
    new = tmp_path / "new.json"
    new.write_text(json.dumps([
        {"leg": "int8", "rc": 0, "result": {"value": 3.0}},
        {"leg": "winof", "rc": 0, "result": {"value": 4.0}},
    ]))
    assert bench_modes.merge([str(new)], str(out)) == 0
    merged = json.loads(out.read_text())
    assert [e["leg"] for e in merged] == ["plain", "int8", "winof"]
    assert merged[1]["result"]["value"] == 3.0
