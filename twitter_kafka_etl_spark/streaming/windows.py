"""Event-time windowing operators (T4/T5/T8).

The reference implements a 1-hour tumbling window *manually* — derived
date/hour partition directories written by wall clock, read back by a
batch job that sleeps an hour on a miss (consumer.scala:69-70,89-123).
Late tweets silently vanish. These operators are the idiomatic
replacements: event-time windows with watermark-bounded state, so
lateness is handled deterministically and state can't grow unboundedly
at 100 TB/day stream rates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """``withWatermark`` rejects TIMESTAMP_NTZ (the type a raw parquet
    scan yields under Spark 4's inferTimestampNTZ default). The session
    timezone is pinned to UTC, so casting to TIMESTAMP is value-
    preserving — do it here so every watermark caller is safe regardless
    of how the stream was read."""
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    keys: tuple[str, ...] = ("event_type",),
    watermark: str | None = None,
) -> DataFrame:
    """T4 — tumbling event-time window counts.

    On a stream, pass ``watermark`` (required for append mode); state per
    window×key is dropped once the watermark passes the window end.
    """
    if watermark:
        df = _event_time(df, ts_col).withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, duration).alias("win"), *keys)
        .agg(F.count(F.lit(1)).alias("counts"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            "counts",
        )
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "2 hours",
    slide: str = "1 hour",
    keys: tuple[str, ...] = ("event_type",),
    watermark: str | None = None,
) -> DataFrame:
    """T8 — sliding windows; each event lands in duration/slide windows."""
    if watermark:
        df = _event_time(df, ts_col).withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, duration, slide).alias("win"), *keys)
        .agg(F.count(F.lit(1)).alias("counts"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            "counts",
        )
    )


def session_counts(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    keys: tuple[str, ...] = ("user_id",),
    watermark: str | None = None,
) -> DataFrame:
    """T8 — session windows: a session closes after ``gap`` of silence.
    State size is bounded by watermark + gap, not by stream length."""
    if watermark:
        df = _event_time(df, ts_col).withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("win"), *keys)
        .agg(F.count(F.lit(1)).alias("counts"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            *keys,
            "counts",
        )
    )


def dedup_within_watermark(
    df: DataFrame,
    keys: tuple[str, ...],
    ts_col: str = "ts",
    delay: str = "1 hour",
) -> DataFrame:
    """D1 streaming variant — ``dropDuplicatesWithinWatermark``: keeps
    the first arrival per key among rows whose event times fall within
    the watermark delay of each other; key state is evicted once the
    watermark passes, so state is bounded by (keys arriving per delay
    window), not by stream length."""
    return (
        _event_time(df, ts_col)
        .withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark(list(keys))
    )


def kafka_shaped(
    df: DataFrame,
    key_col: Column,
    topic_col: Column,
    json_options: dict[str, str] | None = None,
) -> DataFrame:
    """S2 — project a frame into Kafka wire shape (key, value, topic):
    value is the full row as JSON, key/topic from the given expressions
    (producer fan-out semantics, twitter_producer.py:30-33,62-64).

    ``json_options`` passes through to ``to_json`` — e.g. a
    microsecond ``timestampFormat`` when the payload must round-trip
    event times losslessly (the default format keeps milliseconds only).
    """
    payload = F.to_json(
        F.struct(*[F.col(c) for c in df.columns]), json_options or {}
    )
    return df.select(
        key_col.cast("string").alias("key"),
        payload.alias("value"),
        topic_col.cast("string").alias("topic"),
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    within: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner interval join (T-surface the reference's
    batch-handoff design cannot express at all): right-side events that
    occur in [left_ts, left_ts + within] for the same key, e.g. purchases
    attributed to the click they followed.

    Both sides carry watermarks and the join condition bounds event time
    in BOTH directions, so Spark derives state-eviction watermarks for
    the two join buffers — state stays bounded on unbounded streams
    (without the time bound a stream-stream inner join must buffer
    everything forever). Columns must be pre-renamed disjoint except
    ``key``.
    """
    l = _event_time(left, left_ts).withWatermark(left_ts, watermark)
    r = _event_time(right, right_ts).withWatermark(right_ts, watermark)
    cond = (
        (l[key] == r[key])
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, "inner").drop(r[key])
