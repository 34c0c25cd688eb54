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
