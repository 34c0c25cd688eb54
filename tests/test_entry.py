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
