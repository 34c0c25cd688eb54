"""Table-layout maintenance: compaction and sort-ordered rewrite.

A 100 TB table's read performance is decided as much by its file layout
as by the query plan: streaming sinks and incremental appends accumulate
small files (one per micro-batch per partition — see the raw layer the
reference writes hourly, consumer.scala:73-82), and parquet row-group
min/max skipping only helps when the data is clustered on the filter
column. These jobs fix both offline:

- ``compact`` rewrites a directory to ~``target_file_mb`` files.
- ``rewrite_sorted`` range-partitions + sorts within partitions on the
  given columns, so every file covers a narrow value range and row-group
  statistics prune reads (the poor man's Z-order; true multi-dim
  clustering would interleave bits of several keys the same way).

Both are plain batch rewrite jobs — idempotent, safe to schedule, and
they never change row contents (asserted in tests).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _estimate_size_mb(df: DataFrame) -> float:
    """Planner's size estimate for the scan, in MB."""
    plan = df._jdf.queryExecution().optimizedPlan()
    size = plan.stats().sizeInBytes()
    if not isinstance(size, (int, float)):  # scala.math.BigInt on older py4j
        size = size.longValue()
    return float(size) / (1024 * 1024)


def compact(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_mb: int = 128,
    n_files: int | None = None,
) -> int:
    """Rewrite ``path`` to ``out_path`` with ~target-sized files.
    Returns the chosen file count. Uses the planner's size estimate —
    no data collected to the driver."""
    df = spark.read.parquet(path)
    n_files = n_files or max(1, math.ceil(_estimate_size_mb(df) / target_file_mb))
    df.repartition(n_files).write.mode("overwrite").parquet(out_path)
    return n_files


def rewrite_sorted(
    spark: SparkSession,
    path: str,
    out_path: str,
    sort_cols: list[str],
    target_file_mb: int = 128,
    n_files: int | None = None,
) -> int:
    """Cluster the table on ``sort_cols``: range-partition so each file
    owns a contiguous slice of the sort space, then sort within files so
    parquet row-group min/max stats are tight. Point/range filters on
    the leading sort column then skip whole files and row groups."""
    df = spark.read.parquet(path)
    n_files = n_files or max(1, math.ceil(_estimate_size_mb(df) / target_file_mb))
    (
        df.repartitionByRange(n_files, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .parquet(out_path)
    )
    return n_files


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16
) -> tuple[DataFrame, str]:
    """Attach a Z-order (Morton) key over ``cols``: each column is
    min/max-scaled to a ``bits``-wide integer and the bit planes are
    interleaved, so points close in EVERY dimension are close on the
    1-D key. The min/max pass is one partial aggregate broadcast back
    as a 1-row frame (no driver collect); the interleave is a static
    chain of shift/and/or expressions — whole-stage codegen, no Python.

    Returns (df + ``__z`` column, "__z"). NULLs scale to 0 (they
    cluster together at the low end, which is what file skipping
    wants).
    """
    if not 1 <= len(cols) * bits <= 63:
        raise ValueError("len(cols) * bits must fit a signed 64-bit key")
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"__mx_{c}") for c in cols],
    )
    scaled = df.join(F.broadcast(stats))
    top = (1 << bits) - 1
    z = F.lit(0).cast("bigint")
    for ci, c in enumerate(cols):
        rng = F.col(f"__mx_{c}") - F.col(f"__mn_{c}")
        q = F.when(
            rng > 0,
            F.least(
                F.lit(top).cast("bigint"),
                F.floor(
                    (F.col(c).cast("double") - F.col(f"__mn_{c}"))
                    / rng
                    * (1 << bits)
                ).cast("bigint"),
            ),
        ).otherwise(F.lit(0).cast("bigint"))
        q = F.coalesce(q, F.lit(0).cast("bigint"))
        for b in range(bits):
            bit = F.shiftright(q, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(
                F.shiftleft(bit.cast("bigint"), b * len(cols) + ci)
            )
    out = scaled.withColumn("__z", z).drop(
        *[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols]
    )
    return out, "__z"


def rewrite_zordered(
    spark: SparkSession,
    path: str,
    out_path: str,
    cols: list[str],
    target_file_mb: int = 128,
    n_files: int | None = None,
    bits: int = 16,
) -> int:
    """Cluster the table on a Z-order curve over ``cols`` — the
    multi-dimensional sibling of ``rewrite_sorted``: a single-column
    sort gives tight file/row-group stats on ONE column only, while the
    Morton interleave keeps per-file min/max boxes small in EVERY
    ``cols`` dimension, so conjunctive filters (user AND time, id AND
    score) skip files on all of them. Same shuffle shape as the sorted
    rewrite: one range exchange on the key, sort within files."""
    df = spark.read.parquet(path)
    n_files = n_files or max(1, math.ceil(_estimate_size_mb(df) / target_file_mb))
    keyed, zcol = zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, F.col(zcol))
        .sortWithinPartitions(zcol)
        .drop(zcol)
        .write.mode("overwrite")
        .parquet(out_path)
    )
    return n_files
