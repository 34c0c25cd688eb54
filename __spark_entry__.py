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

    The driver file caps at exactly 50 entries in emission order.
    Round 1 verified q01-q37 + x01-x13; round 2 verified q01-q22 +
    x14-x35 + qs1-6; round 3 verified x36-x48 + qs1-9 + x01-x13 +
    q23-q37 (x45/x48 red, repaired this round). Round 4 fronts: the
    two repaired queries and the two brand-new ones (x49/x50), the qs
    set (all nine now carry batch-readback oracles), then the blocks
    last verified in r2 —
    x14-x35 (one green round) before q01-q22 (two green rounds).
    Every query is still emitted; the tail is the freshly-r3-verified
    block.
    """
    if name in (
        "x45_embedding_quantize",
        "x48_sketch_ams_f2",
        "x49_length_buckets",   # new this round — never driver-verified
        "x50_dataset_mixture",  # new this round — never driver-verified
        "x51_snapshot_diff",    # new this round — never driver-verified
        "x52_heavy_hitters",    # new this round — never driver-verified
        "x53_duplicated_spans",     # new in r4 — never driver-verified
        "x54_quality_gate",         # new in r4 — never driver-verified
        "x55_compaction_roundtrip", # new in r4 — never driver-verified
        "x56_span_removal",         # new in r4 — never driver-verified
        "x57_bm25_rank",            # new in r4 — never driver-verified
        "x58_hll_merge",            # new in r4 — never driver-verified
        "x59_lsh_eval",             # new in r4 — never driver-verified
        "qs10_stream_upsert",       # new in r4 — never driver-verified
        "qs11_stream_trending",     # new in r4 — never driver-verified
        "x60_nearest_duplicate",    # new in r4 — never driver-verified
        "x61_hll_accuracy",         # new in r4 — never driver-verified
        "x62_k_anonymity",          # new in r4 — never driver-verified
        "qs12_stream_incremental_dedup",  # new in r4 — never verified
        "x63_pair_graph_degree",    # new in r4 — never driver-verified
        "x64_session_sequences",    # new in r4 — never driver-verified
        "x65_split_leakage",        # new in r4 — never driver-verified
        "x66_semantic_dedup",       # new in r4 — never driver-verified
        "x67_prototype_prune",      # new in r4 — never driver-verified
        "x68_dsir_selection",       # new in r4 — never driver-verified
        "x69_langid_eval",          # new in r4 — never driver-verified
        "x70_unigram_nll",          # new in r4 — never driver-verified
        "x71_bpe_pair_stats",       # new in r4 — never driver-verified
    ):
        return 0
    if name.startswith("qs"):
        return 1
    if name.startswith("x") and name[1:3].isdigit() and 14 <= int(name[1:3]) <= 35:
        return 2
    if name.startswith("q") and name[1:3].isdigit() and int(name[1:3]) <= 22:
        return 3
    if name.startswith("q"):
        return 4  # q23-q37 (verified r3)
    return 5  # x01-x13, x36-x47 (verified r3)


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
