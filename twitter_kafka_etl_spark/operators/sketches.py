"""Mergeable sketches for streaming/approximate analytics.

The reference has no sketches; the engine adds a deterministic
count-min sketch (Cormode & Muthukrishnan 2005) as the custom-sketch
surface. Cells derive from md5-based hashes (mod-Mersenne, like the
MinHash family), so the sketch is bit-identical across engines, runs,
and partitionings — a DuckDB oracle can rebuild it exactly.

Scale properties:
- Build is one explode(depth) + groupBy(depth, cell) — map-side partial
  counts, a single shuffle of at most depth × width rows per partition.
- Sketches MERGE by cell-wise addition (union two sketch tables and
  re-sum), so per-partition / per-day sketches roll up without touching
  raw data — the point of a sketch at 100 TB.
- Point estimate = min over depths of the queried item's cells
  (classic CM overestimate bound: err <= 2N/width with prob 1-2^-depth).

Spark's built-ins (approx_count_distinct / percentile_approx) cover the
HLL and quantile cases; count-min covers frequency estimation, which has
no built-in.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from twitter_kafka_etl_spark.operators.dedup import MERSENNE, hash_params, token_hash

CM_WIDTH = 64
CM_DEPTH = 4
CM_SEED = 7


def _cells(h: Column, width: int, depth: int, seed: int) -> list[Column]:
    return [
        ((F.lit(a) * h + F.lit(b)) % MERSENNE) % width
        for a, b in hash_params(depth, seed=seed)
    ]


def count_min_build(
    df: DataFrame,
    col: str,
    width: int = CM_WIDTH,
    depth: int = CM_DEPTH,
    seed: int = CM_SEED,
) -> DataFrame:
    """Build the sketch as a (depth, cell, counts) long table.

    The item hash is computed once per row; each row fans out to its
    ``depth`` (depth, cell) coordinates via one array explode; the
    groupBy partial-aggregates map-side. Output rows <= depth × width
    regardless of input size."""
    h = token_hash(F.col(col).cast("string"))
    coords = F.explode(
        F.array(
            *[
                F.struct(F.lit(d).alias("depth"), c.alias("cell"))
                for d, c in enumerate(_cells(h, width, depth, seed))
            ]
        )
    )
    return (
        df.select(coords.alias("co"))
        .select(F.col("co.depth").alias("depth"), F.col("co.cell").alias("cell"))
        .groupBy("depth", "cell")
        .agg(F.count(F.lit(1)).alias("counts"))
    )


def count_min_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with the same (width, depth, seed):
    cell-wise addition. This is what makes per-partition/per-day
    sketches roll up without rescanning raw data."""
    return (
        a.unionByName(b)
        .groupBy("depth", "cell")
        .agg(F.sum("counts").alias("counts"))
    )


def count_min_estimate(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    width: int = CM_WIDTH,
    depth: int = CM_DEPTH,
    seed: int = CM_SEED,
) -> DataFrame:
    """Frequency estimate per item: min over depths of the item's cell
    counts. ``items`` joins the (tiny, <= depth×width rows) sketch via
    broadcast — no scan of the original data."""
    h = token_hash(F.col(col).cast("string"))
    coords = F.explode(
        F.array(
            *[
                F.struct(F.lit(d).alias("depth"), c.alias("cell"))
                for d, c in enumerate(_cells(h, width, depth, seed))
            ]
        )
    )
    probes = items.select(F.col(col), coords.alias("co")).select(
        col, F.col("co.depth").alias("depth"), F.col("co.cell").alias("cell")
    )
    return (
        probes.join(F.broadcast(sketch), ["depth", "cell"], "left")
        .na.fill({"counts": 0})
        .groupBy(col)
        .agg(F.min("counts").alias("est_count"))
    )
