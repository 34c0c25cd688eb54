"""Scalar column expressions (SURVEY.md §2.7).

Each helper cites the reference behavior it generalizes. All are pure
Column expressions — Catalyst folds/pushes them; codegen compiles them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def decode_kafka(df: DataFrame) -> DataFrame:
    """F1 — CAST(key/value AS STRING) on Kafka binary columns
    (consumer.scala:63)."""
    return df.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        *[c for c in ("topic", "partition", "offset", "timestamp") if c in df.columns],
    )


def parse_json_col(col: str | Column, schema) -> Column:
    """F2/F10 — permissive JSON→struct parse (consumer.scala:64).

    ``schema`` is a StructType or DDL string, e.g. ``"k INT"``.
    Malformed documents become nulls, not errors (PERMISSIVE mode).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.from_json(c, schema)


def json_field(col: str | Column, schema, field: str) -> Column:
    """P3 — nested-field extraction after JSON parse
    (consumer.scala:65-68)."""
    return parse_json_col(col, schema).getField(field)


def derive_date_hour(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """F3/F11/F12 — derive string ``date``/``hour`` plus a proper
    hour-truncated timestamp ``date_hour``.

    Generalizes consumer.scala:69-70 (date_format 'yyyy-MM-dd' / 'HH')
    and streamviz/wrangling.py:15-20 (part extraction + reassembly —
    which the engine replaces with a single date_trunc).
    """
    ts = F.col(ts_col)
    return (
        df.withColumn("date", F.date_format(ts, "yyyy-MM-dd"))
        .withColumn("hour", F.date_format(ts, "HH"))
        .withColumn("date_hour", F.date_trunc("hour", ts))
    )


def first_element(col: str | Column) -> Column:
    """F4 — ``element_at(arr, 1)``: first element of an array column
    (consumer.scala:128,153 take the head of NLP result arrays)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.element_at(c, 1)


def positivity_flag(col: str | Column, positive_value: str = "positive") -> Column:
    """F5/F6 — null-safe conditional 1/0 encoding
    (consumer.scala:159-160: ``when($"sentiment" <=> "positive", 1)``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.eqNullSafe(positive_value), F.lit(1)).otherwise(F.lit(0))


def construct_key(prefix_col: str | Column, id_col: str | Column, n: int = 2) -> Column:
    """F9 — Kafka message key construction:
    ``f"{topic[:2].upper()}{tweet_id}"`` (twitter_producer.py:33)."""
    p = F.col(prefix_col) if isinstance(prefix_col, str) else prefix_col
    i = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.concat(F.upper(F.substring(p, 1, n)), i.cast("string"))


def decimal_sum(col: str | Column, precision: int = 18, scale: int = 2) -> Column:
    """Deterministic money-sum: cast to decimal before aggregating so the
    result is exact regardless of partial-aggregation order, then callers
    cast back to double. At 100 TB, double summation order varies run to
    run; decimal aggregation is both deterministic and overflow-checked.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})"))
