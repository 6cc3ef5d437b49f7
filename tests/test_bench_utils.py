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
