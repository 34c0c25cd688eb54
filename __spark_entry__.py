"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query — the reference's serving-layer
  aggregate (consumer.scala:157-188) over sf0.001 events.
- ``queries()`` / ``oracle_sql()``: one entry per implemented operator
  from SURVEY.md §2.12, sourced from the engine's query catalog
  (twitter_kafka_etl_spark/plans/catalog.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from twitter_kafka_etl_spark.io import read_table
from twitter_kafka_etl_spark.pipeline import enrich_rule_based, topic_aggregates
from twitter_kafka_etl_spark.plans import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: enrich events with sentiment/emotion labels, then the
    reference's two-branch aggregate (positivity rate ⋈ emotion pivot)."""
    events = read_table(spark, "/root/testdata/sf0.001", "events")
    enriched = enrich_rule_based(
        events.withColumnRenamed("event_type", "topic")
    )
    return topic_aggregates(enriched)


def _rank(name: str) -> int:
    """Emission order for the driver's per-round correctness pass.

    The round-1 driver file capped at exactly 50 entries in emission
    order, leaving x14-x24 without driver rows. Round 1 verified
    q01-q37 and x01-x13 green, so this round fronts the never-checked
    queries (x14-x24, then the rows-only qs set); the already-verified
    block fills the remaining slots. Every query is still emitted.
    """
    if name.startswith("x") and name[1:3].isdigit() and int(name[1:3]) >= 14:
        return 0
    if name.startswith("qs"):
        return 1
    if name.startswith("q"):
        return 2
    return 3  # x01-x13


def _ordered() -> list[str]:
    return sorted(REGISTRY, key=lambda n: (_rank(n), n))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented query/operator (SURVEY.md §2.12)."""
    return {name: REGISTRY[name].build for name in _ordered()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query in ``queries()``."""
    return {
        name: REGISTRY[name].oracle for name in _ordered()
        if REGISTRY[name].oracle is not None
    }
