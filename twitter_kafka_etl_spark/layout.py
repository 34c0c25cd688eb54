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
