"""t2-gate mirror: every catalog query hash-matches its DuckDB oracle."""

from __future__ import annotations

import pytest

from twitter_kafka_etl_spark.plans import REGISTRY
from twitter_kafka_etl_spark.plans.oracle import compare

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_matches_oracle(name, spark, sf_dir, oracle_con):
    spec = REGISTRY[name]
    df = spec.build(spark, sf_dir)
    ok, msg = compare(df, oracle_con, spec.oracle)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(name, spark, sf_dir):
    spec = REGISTRY[name]
    df = spec.build(spark, sf_dir)
    # stable schema + executable plan; row count recorded, not asserted
    assert df.columns, f"{name}: empty schema"
    assert df.count() >= 0
