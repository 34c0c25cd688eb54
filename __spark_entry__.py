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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented query/operator (SURVEY.md §2.12)."""
    return {name: spec.build for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query in ``queries()``."""
    return {
        name: spec.oracle for name, spec in REGISTRY.items()
        if spec.oracle is not None
    }
