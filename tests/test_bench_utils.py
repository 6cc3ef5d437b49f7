"""Pure-function tests for the bench harness's round-6 pollution
machinery — no Spark session needed."""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

import bench


def test_steady_spread_uses_best_three_runs():
    # polluted first run must not pin the spread forever once rescue
    # runs land: spread is over the 3 fastest samples
    assert bench._steady_spread([36.0, 13.0, 9.3]) > 1.0
    polluted_then_rescued = [36.0, 13.0, 9.3, 9.5, 9.4]
    assert bench._steady_spread(polluted_then_rescued) < 0.1


def test_steady_spread_zero_floor():
    assert bench._steady_spread([0.0, 0.0, 0.0]) == 0.0


def test_anchor_machine_fingerprint_gates_ratio_test(tmp_path, monkeypatch):
    import os

    path = tmp_path / "BENCH_ANCHOR.json"
    path.write_text(json.dumps({"machine": {"cpus": os.cpu_count()}}))
    monkeypatch.setattr(bench, "ANCHOR_PATH", str(path))
    assert bench._anchor_machine_matches()
    path.write_text(json.dumps({"machine": {"cpus": os.cpu_count() + 1}}))
    assert not bench._anchor_machine_matches()
    monkeypatch.setattr(bench, "ANCHOR_PATH", str(tmp_path / "missing.json"))
    assert not bench._anchor_machine_matches()


def test_load_anchor_sf_mismatch_and_shape(tmp_path, monkeypatch):
    path = tmp_path / "BENCH_ANCHOR.json"
    path.write_text(
        json.dumps({"queries": {"q": 1.5}, "sf": 0.1, "machine": {}})
    )
    monkeypatch.setattr(bench, "ANCHOR_PATH", str(path))
    assert bench._load_anchor(0.1) == {"q": 1.5}
    assert bench._load_anchor(0.01) == {}  # anchor only valid at its sf
    monkeypatch.setattr(bench, "ANCHOR_PATH", str(tmp_path / "missing.json"))
    assert bench._load_anchor(0.1) == {}


def test_preflight_canary_noop_paths_return_pass_empty(monkeypatch):
    """The canary gate must be a clean no-op — (True, {}) — whenever it
    has nothing comparable to measure: skip env var, missing/empty
    anchor, or an anchor from a different machine. A None or bare dict
    here would crash main()'s tuple unpacking or poison BENCH_FULL."""
    monkeypatch.setenv("SPARK_GRAFT_BENCH_SKIP_PREFLIGHT", "1")
    assert bench._preflight_canary(None, None, None, {"x": 1.0}) == (True, {})
    monkeypatch.delenv("SPARK_GRAFT_BENCH_SKIP_PREFLIGHT")
    assert bench._preflight_canary(None, None, None, {}) == (True, {})
    assert bench._preflight_canary(
        None, None, None, {"unrelated_query": 1.0}
    ) == (True, {})
    assert bench._preflight_canary(
        None, None, None, {bench._CANARY: 0.0}
    ) == (True, {})


def test_preflight_canary_measures_against_anchor(tmp_path, monkeypatch):
    """With a comparable anchor, the gate times the canary via the
    registry callable and returns (passed, ratio payload) — the payload
    lands in BENCH_FULL.json as the run's calibration number."""
    import json as _json
    import os

    path = tmp_path / "BENCH_ANCHOR.json"
    path.write_text(_json.dumps({"machine": {"cpus": os.cpu_count()}}))
    monkeypatch.setattr(bench, "ANCHOR_PATH", str(path))

    class FakeQuery:
        def spark(self, spark, sf_dir):
            class _DF:
                def count(self):
                    return 1

            return _DF()

    reg = {bench._CANARY: FakeQuery()}
    # a huge anchor best => measured ratio ~0 => pass, ratio recorded
    ok, info = bench._preflight_canary(None, reg, "x", {bench._CANARY: 1e9})
    assert ok and info["canary"] == bench._CANARY
    assert 0 <= info["canary_ratio"] < 0.001
