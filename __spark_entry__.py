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


# The five queries whose last driver verification is round 3 — they
# overflowed round 6's 50-slot window and MUST front round 7's.
_R3_STALE: frozenset[str] = frozenset(
    {
        "x42_curation_balance",
        "x43_salted_join",
        "x44_pii_redaction",
        "x46_dedup_jaccard_estimate",
        "x47_embedding_project",
    }
)


def _rank(name: str) -> int:
    """Emission order for the driver's per-round correctness pass.

    The driver file caps at exactly 50 entries in emission order.
    Verification history: r1 = q01-q37 + x01-x13; r2 = q01-q22 +
    x14-x35 + qs1-6; r3 = q23-q37 + x01-x13 + x36-x48 + qs1-9;
    r4 = qs1-12 + x14-x26 + x45 + x48-x71; r5 = qs13-15 + x72-x84 +
    q01-q25 + x27-x35; r6 = x85-x101 + qs16-17 + q26-q37 + x01-x13 +
    x36-x41 (50/50 green each round).

    Round 7 adds no new queries (155 registered; the 50-slot window
    sustains a ~3-round rotation at this suite size, so the suite is
    deliberately frozen). The window fronts the five r3-verified
    stragglers (x42-x44, x46-x47 — the round-6 verdict's item 1),
    then the r4-verified block (qs1-12, x14-x26, x45, x48-x71 — 50
    queries, now three rounds old). 5 + 50 = 55 overflows by five:
    x67-x71 (last in sort order) slide to r8, where they front the
    rotation ahead of the r5-verified set.
    """
    if name in _R3_STALE:
        return 0  # last green r3 — four rounds ago, front of the window
    if (
        name.startswith("qs")
        and name[2:4].strip("_").isdigit()
        and int(name[2:4].strip("_")) <= 12
    ):
        return 1  # qs1-12 — green r4
    if name.startswith("x") and name[1:3].isdigit() and (
        14 <= int(name[1:3]) <= 26
        or name == "x45_embedding_quantize"
        or 48 <= int(name[1:3]) <= 71
    ):
        return 1  # x14-x26, x45, x48-x71 — green r4 (x67-x71 → r8)
    if (
        name.startswith("q")
        and not name.startswith("qs")
        and name[1:3].isdigit()  # guard: a q-name outside the qNN scheme
        and int(name[1:3]) <= 25  # must fall through, not raise
    ):
        return 2  # q01-q25 — green r5
    if name.startswith("x") and name[1:3].isdigit() and (
        27 <= int(name[1:3]) <= 35 or 72 <= int(name[1:3]) <= 84
    ):
        return 2  # x27-x35, x72-x84 — green r5
    if name.startswith("qs") and name[2:4].strip("_").isdigit() and (
        13 <= int(name[2:4].strip("_")) <= 15
    ):
        return 2  # qs13-15 — green r5
    return 3  # q26-q37, x01-x13, x36-x41, x85-x101, qs16-17 — green r6


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
