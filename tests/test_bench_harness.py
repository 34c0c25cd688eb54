"""Pure-driver tests of the bench harness's record and outlier logic —
no SparkSession; the expensive subprocess path is exercised by the
smoke runs documented in README (SPARK_GRAFT_BENCH_ONLY)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_reference_record_matches_scale_factor():
    rec = bench._reference_record(0.1)
    assert rec and "x01_dedup_exact" in rec  # full names, sf0.1 file
    assert bench._reference_record(99.0) is None


def test_reference_record_prefers_insuite_for_drift(tmp_path, monkeypatch):
    """The drift diagnostic compares in-suite against in-suite: rows
    whose published figure came from a fresh-JVM re-time keep their
    slower in-suite value in the record's ``insuite`` map, and
    ``prefer_insuite=True`` overlays it so the ratio distribution
    carries no built-in >1 skew for re-timed rows (r11 advice). The
    published map — the outlier-flagging baseline — is unchanged."""
    import json

    rec = {
        "sf": 7.0,
        "queries": {"a": 1.0, "b": 2.0},
        "insuite": {"b": 3.0, "bad": -1.0},
    }
    (tmp_path / "bench_sf7.json").write_text(json.dumps(rec))
    monkeypatch.setattr(bench, "_HERE", str(tmp_path))
    assert bench._reference_record(7.0) == {"a": 1.0, "b": 2.0}
    assert bench._reference_record(7.0, prefer_insuite=True) == {
        "a": 1.0,
        "b": 3.0,  # insuite overlays published; non-positive ignored
    }


def test_flag_outliers_rule():
    ref = {"a": 1.0, "b": 2.0, "c": 0.05, "d": 4.0}
    timings = {
        "a": 1.8,   # > 1.5*1.0 + 0.25 → flagged
        "b": 2.9,   # < 1.5*2.0 + 0.25 → not flagged
        "c": 0.3,   # above 1.5x but inside the 0.25 absolute floor
        "d": 40.0,  # worst ratio → first
        "e": 9.9,   # no reference row → never flagged
        "f": -1.0,  # errored query → never flagged
    }
    assert bench._flag_outliers(timings, ref) == ["d", "a"]


def test_flag_outliers_cap():
    ref = {f"q{i}": 1.0 for i in range(40)}
    timings = {f"q{i}": 10.0 + i for i in range(40)}
    flagged = bench._flag_outliers(timings, ref)
    assert len(flagged) == 15
    assert flagged[0] == "q39"  # worst relative offender leads


def test_median_vs_record_diagnostic():
    """The published host-drift diagnostic: median per-query ratio vs
    the record, ignoring errored rows and rows without a reference;
    None when no record exists (first run at a new scale factor)."""
    ref = {"a": 1.0, "b": 2.0, "c": 4.0, "z": 1.0}
    timings = {
        "a": 1.3,    # 1.3
        "b": 2.6,    # 1.3
        "c": 4.0,    # 1.0
        "d": 9.9,    # no reference row — excluded
        "z": -1.0,   # errored — excluded
    }
    assert bench._median_vs_record(timings, ref) == 1.3
    # even count → mean of the middle pair
    assert bench._median_vs_record({"a": 1.0, "b": 3.0}, ref) == 1.25
    assert bench._median_vs_record(timings, None) is None
    assert bench._median_vs_record({"z": -1.0}, ref) is None
