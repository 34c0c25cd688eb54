"""Relational operator layer (SURVEY.md §2.2-§2.6, §2.8).

Thin, composable, *scale-disciplined* wrappers over the DataFrame API.
Value added over raw DataFrame calls:

- ``pivot_explicit`` requires the value list (the reference's bare
  ``.pivot("emotion")`` at consumer.scala:170 launches an extra
  distinct-scan job AND collects distinct values to the driver —
  unbounded at 100 TB).
- ``dedup_first`` implements deterministic keep-first dedup via
  ``row_number`` (pandas ``drop_duplicates`` keep='first' semantics,
  streamviz/wrangling.py:24) — plain ``dropDuplicates`` keeps an
  *arbitrary* row, which is not reproducible.
- ``share_of_total`` is the group-total window the viz layer fumbles
  (streamviz/visualisation.py:21 groups a Series by a column name —
  a latent pandas bug; this is the intended semantics).
- ``count_agg`` fixes the reference's alias bug (consumer.scala:168-169
  aliased the DataFrame, not the count column).

Every function returns a DataFrame and keeps the plan declarative so
Catalyst can reorder/prune/broadcast.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

JOIN_KINDS = ("inner", "left", "right", "full", "left_semi", "left_anti", "cross")


def project(df: DataFrame, *cols: str | Column) -> DataFrame:
    """P6/P8 — narrow projection; column pruning reaches the scan."""
    return df.select(*cols)


def filter_rows(df: DataFrame, predicate: str | Column) -> DataFrame:
    """P7 — predicate filter; pushes into the parquet scan when possible
    (replaces wrangling.py:25 ``topic != 'NoFlyZone'``)."""
    return df.filter(predicate)


def fill_nulls(df: DataFrame, value, subset: Sequence[str] | None = None) -> DataFrame:
    """P9 — null fill after pivot (consumer.scala:170 ``.na.fill(0)``)."""
    return df.na.fill(value, subset=list(subset) if subset else None)


def join_tables(
    left: DataFrame,
    right: DataFrame,
    on,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """J1 + full join surface (consumer.scala:172-174 is the inner case).

    ``broadcast_right`` hints a map-side join for small dimensions; with
    AQE on, Catalyst usually decides this itself, but an explicit hint is
    free insurance when the small side's size estimate is poor (e.g. after
    an aggregation).
    """
    if how not in JOIN_KINDS:
        raise ValueError(f"how={how!r}; expected one of {JOIN_KINDS}")
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=on, how=how)


def conditional_rate_agg(
    df: DataFrame,
    group_col: str,
    flag_col: Column,
    rate_name: str = "positivity_rate",
    count_name: str = "counts",
    ndigits: int = 2,
) -> DataFrame:
    """A1 — grouped conditional mean + count (consumer.scala:158-166).

    ``flag_col`` is a 0/1 Column (see functions.positivity_flag); the mean
    of it is the rate. Partial (map-side) aggregation applies — one shuffle
    of (group, sum, count) pairs, never raw rows.
    """
    return df.groupBy(group_col).agg(
        F.round(F.avg(flag_col), ndigits).alias(rate_name),
        F.count(F.lit(1)).alias(count_name),
    )


def count_agg(df: DataFrame, keys: Sequence[str], count_name: str = "counts") -> DataFrame:
    """A2 (fixed) — multi-key count with the alias on the *column*
    (the reference aliased the DataFrame: consumer.scala:168-169)."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias(count_name))


def pivot_explicit(
    df: DataFrame,
    group_col: str | Column,
    pivot_col: str,
    values: Sequence[str],
    agg: Column,
    fill=0,
) -> DataFrame:
    """A3/R2 — pivot with an explicit value list (consumer.scala:170,
    minus the driver-side distinct scan). Static schema, one shuffle."""
    out = df.groupBy(group_col).pivot(pivot_col, list(values)).agg(agg)
    return out.na.fill(fill) if fill is not None else out


def unpivot_long(
    df: DataFrame,
    ids: Sequence[str],
    values: Sequence[str],
    var_name: str,
    value_name: str,
) -> DataFrame:
    """R1/R3 — wide→long melt (streamviz/visualisation.py:19-20's
    ``pd.melt``) as the built-in ``DataFrame.unpivot`` (narrow op, no
    shuffle)."""
    return df.unpivot(list(ids), list(values), var_name, value_name)


def dedup_first(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str | Column],
) -> DataFrame:
    """D1/Q22 — deterministic keep-first dedup via row_number
    (wrangling.py:24 semantics). One shuffle on ``keys``; at scale prefer
    this over ``dropDuplicates`` whenever 'first' must be reproducible."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_any(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """D1 — keep an arbitrary row per key (plain ``dropDuplicates``);
    cheaper than dedup_first (partial agg, no full sort per group)."""
    return df.dropDuplicates(list(keys))


def share_of_total(
    df: DataFrame,
    partition_by: Sequence[str],
    value_col: str,
    out_name: str = "percent",
) -> DataFrame:
    """W1/A5/A6 — value / sum(value) over (partition by keys)
    (visualisation.py:21,35,72 intent). Window sum without ORDER BY uses
    the whole partition as the frame — one shuffle on the partition keys.
    """
    w = Window.partitionBy(*partition_by)
    return df.withColumn(out_name, F.col(value_col) / F.sum(value_col).over(w))


def rollup_agg(df: DataFrame, keys: Sequence[str], *aggs: Column) -> DataFrame:
    """Rollup aggregation (declared engine surface, SURVEY §2.4)."""
    return df.rollup(*keys).agg(*aggs)


def topk_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    k: int,
) -> DataFrame:
    """Top-K rows per group via row_number ≤ K — one shuffle on the
    group keys, per-group sort bounded by partition size (never a global
    sort). The canonical OLAP leaderboard pattern."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """MERGE INTO (SCD1 upsert) without a table format: rows from
    ``updates`` replace same-key rows in ``base``; unmatched base rows
    survive. Emulated as updates ∪ (base ▷anti updates) — two shuffles
    on the key, no MERGE-capable catalog needed. With Delta/Iceberg on
    the classpath, swap for native MERGE INTO (file-level skipping)."""
    keys = list(keys)
    kept = base.join(updates.select(*keys), on=keys, how="left_anti")
    return updates.unionByName(kept)


def union_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """Set op surface — by-name union keeping duplicates (UNION ALL)."""
    return a.unionByName(b)


def except_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """Set op surface — multiset difference (EXCEPT ALL)."""
    return a.exceptAll(b)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join with key salting for skewed keys (SURVEY brief: 'salting
    for skew'). The left (large, skewed) side derives a deterministic
    salt from a row hash; the right side is replicated ``salt`` times so
    every (key, salt) bucket matches. A hot key's rows then spread over
    ``salt`` tasks instead of one straggler.

    AQE's skew-join splitting covers most cases at runtime; explicit
    salting is for when AQE can't help — skewed *aggregations downstream
    of the join*, non-AQE engines, or a broadcast-ineligible dimension
    with a few hot keys. Right-side blowup is ``salt``×: keep the right
    side the smaller one.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    # deterministic content-hash salt: a nondeterministic salt (random /
    # monotonically_increasing_id) can migrate rows between shuffle
    # partitions under task retries and double-count or drop them
    l = left.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt)),
    )
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = l.join(r, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def salted_agg(
    df: DataFrame,
    key: str,
    value_col: str,
    salt: int = 16,
    count_name: str = "counts",
    sum_name: str = "total",
) -> DataFrame:
    """Two-phase salted aggregation for skewed group keys: partial
    count/sum per (key, salt) — spreading a hot key over ``salt``
    reducers — then a final combine per key. Only decomposable
    aggregates (sum/count/min/max) can be salted this way.

    With map-side partial aggregation Spark already does this implicitly
    for most inputs; explicit salting guards the case where one key's
    *post-shuffle* partial rows still overwhelm a reducer."""
    partial = (
        df.withColumn(
            "__salt",
            F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt)),
        )
        .groupBy(key, "__salt")
        .agg(
            F.count(F.lit(1)).alias("__cnt"),
            F.sum(value_col).alias("__sum"),
        )
    )
    return partial.groupBy(key).agg(
        F.sum("__cnt").alias(count_name),
        F.sum("__sum").alias(sum_name),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_values: Sequence[str],
    tiebreak: Sequence[str] = (),
    out_prefix: str = "asof_",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` per key (declared join surface, SURVEY §2.3 —
    "range/as-of via … Window/last() pattern").

    Implemented as union + keyed window, not a range join: both sides
    shuffle once on ``keys``, then ``last(value, ignorenulls)`` over the
    (ts, side, tiebreak) order picks the newest right value at or before
    each left timestamp. At 100 TB this is one shuffle and a per-key sort
    — no inequality-join row explosion, no broadcast requirement, and AQE
    skew handling applies to the single exchange.

    ``tiebreak`` columns (present in both frames, e.g. an id) make the
    winner among equal-timestamp right rows deterministic.
    """
    keys = list(keys)
    tiebreak = list(tiebreak)
    l = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    r = right.select(
        *keys,
        *tiebreak,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(v).alias(f"__v_{v}") for v in right_values],
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__side", *tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for v in right_values:
        u = u.withColumn(
            f"{out_prefix}{v}", F.last(f"__v_{v}", ignorenulls=True).over(w)
        )
    return u.filter(F.col("__side") == 1).drop(
        "__ts", "__side", *[f"__v_{v}" for v in right_values]
    )


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 100.0,
) -> DataFrame:
    """Range join (point ∈ [lo, hi)) decomposed into an equi-join —
    the 100 TB pattern for inequality joins (declared surface,
    SURVEY §2.3 'range/as-of via inequality conditions').

    Each interval explodes into the fixed-width buckets it covers; each
    point computes its bucket; a plain shuffled equi-join on the bucket
    id generates candidates and the exact ``lo <= p < hi`` filter
    finishes. Cost is O(points + intervals × span/width) rows — never a
    nested-loop or cartesian plan, and AQE handles bucket skew. Pick
    ``bucket_width`` near the median interval width.
    """
    p = points.withColumn(
        "__b", F.floor(F.col(point_col) / bucket_width).cast("bigint")
    )
    iv = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width).cast("bigint"),
                F.floor(F.col(hi_col) / bucket_width).cast("bigint"),
            )
        ),
    )
    return (
        p.join(iv, "__b")
        .filter(
            (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
        )
        .drop("__b")
    )


def cube_agg(df: DataFrame, keys: Sequence[str], *aggs: Column) -> DataFrame:
    """Cube aggregation — all 2^k grouping sets (declared agg surface,
    SURVEY §2.4). Same single-shuffle expand-then-aggregate plan family
    as rollup."""
    return df.cube(*keys).agg(*aggs)


def explode_route(
    df: DataFrame,
    array_col: str | Column,
    out_name: str,
    allowed: Sequence[str] | None = None,
) -> DataFrame:
    """P10/D2 — fan-out one row per array element, optionally filtered to
    an allow-list: the producer's per-matching-rule message fan-out
    (twitter_producer.py:62-64) as explode + isin."""
    c = F.col(array_col) if isinstance(array_col, str) else array_col
    out = df.withColumn(out_name, F.explode(c))
    if allowed is not None:
        out = out.filter(F.col(out_name).isin(list(allowed)))
    return out


def fixed_width_histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    nbins: int,
) -> DataFrame:
    """Fixed-width histogram of a numeric column: (bucket, bucket_lo,
    n, total) per bin, values clamped into [0, nbins-1]. The profiling
    primitive a 100 TB column scan can afford: one narrow bucket
    expression + one partial-agg shuffle of at most ``nbins`` groups —
    no sort, no percentile state.

    ``total`` is decimal-summed so the per-bin sum is exact under any
    partial-aggregation order (double summation drifts run-to-run at
    scale)."""
    from twitter_kafka_etl_spark.functions.scalar import decimal_sum

    step = (hi - lo) / nbins
    raw = F.floor((F.col(col) - F.lit(lo)) / F.lit(step))
    bucket = F.least(F.greatest(raw, F.lit(0)), F.lit(nbins - 1)).cast("bigint")
    return (
        df.select(bucket.alias("bucket"), F.col(col))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(decimal_sum(col, 28, 2).cast("double"), 2).alias("total"),
        )
        .select(
            "bucket",
            F.round(F.lit(lo) + F.col("bucket") * F.lit(step), 6).alias("bucket_lo"),
            "n",
            "total",
        )
    )


def grouped_percentiles(
    df: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...],
    qs: tuple[int, ...] = (25, 50, 75),
) -> DataFrame:
    """Per-group EXACT discrete percentiles, scale-safely: the
    cumulative-count walk runs over the per-group VALUE HISTOGRAM
    (bounded by distinct values per group), never a per-group row sort,
    and ceil thresholds stay in integer arithmetic — the grouped form of
    the corpus length-percentile filter, and the exact replacement for
    ``approx_percentile`` where cross-engine determinism matters.

    p_q = the smallest value whose cumulative count reaches
    ceil(n_group * q / 100). Two partial-agg shuffles (histogram, group
    sizes) + one histogram-sized window.
    """
    hist = df.groupBy(*group_cols, value_col).agg(
        F.count(F.lit(1)).alias("__c")
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.withColumn("__cum", F.sum("__c").over(w))
    sizes = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("__n"))
    joined = cum.join(sizes, list(group_cols))
    aggs = [
        F.min(
            F.when(
                F.col("__cum") >= F.expr(f"(__n * {q} + 99) div 100"),
                F.col(value_col),
            )
        ).alias(f"p{q}")
        for q in qs
    ]
    return joined.groupBy(*group_cols).agg(*aggs)



def profile_table(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """Column-level data profile — (column, n_rows, n_nulls, n_distinct)
    per column — the schema-quality audit run on any newly landed table
    before it joins a pipeline (null explosions and cardinality
    collapses are THE two silent upstream breakages).

    One job, one UNION branch per column, each a column-pruned scan +
    a SINGLE-distinct two-stage aggregate. This deliberately avoids
    the one-aggregate multi-countDistinct form: Catalyst plans that as
    an Expand that replicates every input row once per distinct-agg
    (a |columns|× row multiplication through the first hash-agg stage
    — measured 4.3 s vs 1.6 s at sf0.1, 5.6 s vs 1.8 s at sf1 for 11
    columns of lineitem), while the union's branches together read
    exactly the same bytes a single all-column scan would, partial-agg
    map-side, and run concurrently. Exact by construction — the
    cross-engine-checkable form; when an estimate suffices at 100 TB,
    swap countDistinct for approx_count_distinct (HLL sketch) in
    either shape.
    """
    from functools import reduce

    cols = list(columns) if columns is not None else list(df.columns)
    if not cols:
        # preserve the previous form's edge behavior: an empty column
        # selection profiles to zero rows, not a reduce() TypeError
        return df.sparkSession.createDataFrame(
            [],
            "column string, n_rows bigint, n_nulls bigint, n_distinct bigint",
        )
    parts = []
    for c in cols:
        parts.append(
            df.select(F.col(c))
            .agg(
                F.count(F.lit(1)).alias("__n"),
                F.count(F.col(c)).alias("__nn"),
                F.countDistinct(F.col(c)).alias("__nd"),
            )
            .select(
                F.lit(c).alias("column"),
                F.col("__n").cast("bigint").alias("n_rows"),
                (F.col("__n") - F.col("__nn")).cast("bigint").alias("n_nulls"),
                F.col("__nd").cast("bigint").alias("n_distinct"),
            )
        )
    return reduce(DataFrame.unionByName, parts)
