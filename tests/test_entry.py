"""Smoke: the driver contract (entry / queries / oracle_sql) is sound."""

from __future__ import annotations

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "__spark_entry__",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "__spark_entry__.py"),
)
entry_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry_mod)


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    cols = set(df.columns)
    assert {"topic_agg", "positivity_rate", "counts", "topic"} <= cols
    # pivot labels present
    assert {"joy", "anger", "love", "fear", "sadness", "surprise"} <= cols


def test_queries_and_oracles_align():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert q, "no queries registered"
    assert set(o) <= set(q)
    for name, fn in q.items():
        assert callable(fn), name


def test_rotation_order_from_synthetic_history(tmp_path):
    """The driver window is derived from CORRECTNESS history files:
    rewritten-since-check first, then latest-green ascending
    (never-checked = round 0), name tie-break."""
    import json

    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "a_old": {"rows_match": True, "schema_match": True,
                  "hash_match": True},
        "b_refreshed": {"rows_match": True, "schema_match": True,
                        "hash_match": True},
        "c_red": {"rows_match": False, "schema_match": True,
                  "hash_match": False},
        "e_rewritten": {"rows_match": True, "schema_match": True,
                        "hash_match": True},
    }))
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps({
        "b_refreshed": {"rows_match": True, "schema_match": True,
                        "hash_match": True},
        # hash-less rows-only check still counts as that round's green
        "f_rowsonly": {"rows_match": True, "schema_match": True,
                       "hash_match": None},
    }))
    # non-matching / corrupt files are ignored, not fatal
    (tmp_path / "CORRECTNESS_r02.json").write_text("{not json")
    (tmp_path / "BENCH_r01.json").write_text("{}")

    latest = entry_mod._latest_green(str(tmp_path))
    assert latest == {"a_old": 1, "b_refreshed": 3, "e_rewritten": 1,
                      "f_rowsonly": 3}

    names = ["b_refreshed", "a_old", "d_never", "c_red", "f_rowsonly",
             "e_rewritten"]
    order = entry_mod._rotation_order(
        names, latest, rewritten_in={"e_rewritten": 2, "b_refreshed": 2}
    )
    # e_rewritten: rewrite r2 > green r1 → fronted.
    # b_refreshed: rewrite r2 < green r3 → driver has seen it; normal rank.
    # c_red (red = never green) and d_never sort as round 0.
    assert order == ["e_rewritten", "c_red", "d_never", "a_old",
                     "b_refreshed", "f_rowsonly"]


def test_r8_window_contents():
    """The live r8 window fronts the two r7 rewrites then the r4-stale
    five, per VERDICT r7 item 1; nothing in the window is younger than
    its rotation seniority."""
    names = list(entry_mod.queries())
    window = names[:50]
    # rewritten-since-check first (latest-green ascending within)
    assert set(window[:3]) == {"qs14_stream_novelty",
                               "x98_dedup_method_agreement",
                               "qs12_stream_incremental_dedup"}
    # never-checked queries (r8's x102) sort ahead of the r4-stale five
    assert set(window[3:9]) == {
        "x102_pair_collapsed_form",
        "x67_prototype_prune", "x68_dsir_selection", "x69_langid_eval",
        "x70_unigram_nll", "x71_bpe_pair_stats",
    }
    latest = entry_mod._latest_green()
    # everything else in the window is the oldest remaining cohort
    window_rounds = [latest.get(n, 0) for n in window[9:]]
    tail_rounds = [latest.get(n, 0) for n in names[50:]]
    assert window_rounds and max(window_rounds) <= min(tail_rounds)


def test_end_to_end_example(spark, sf_dir, tmp_path):
    """The reference's full 3-stage pipeline shape runs green."""
    import importlib.util
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples", "end_to_end.py",
    )
    spec = importlib.util.spec_from_file_location("e2e", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    pdf = mod.main(sf_dir, work=str(tmp_path / "e2e"))
    assert len(pdf) > 0
    assert set(pdf.columns) == {"topic_agg", "emotion", "counts"}
    assert (pdf["counts"] >= 0).all()
