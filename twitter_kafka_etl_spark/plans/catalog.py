"""Oracle-checked query catalog (SURVEY.md §2.12, Q01-Q23).

Each entry pairs a PySpark builder with a DuckDB-SQL twin over the same
parquet tables. Determinism rules (so value hashes match at 6 dp):

- money sums go through ``decimal(18,2)`` then cast to double — exact and
  order-independent (double partial-agg order varies between engines and
  runs; at 100 TB it varies between *retries*);
- every computed column is aliased identically in both engines;
- integer-ish outputs are cast to bigint on the Spark side where DuckDB
  naturally widens (len(), EXTRACT);
- keep-first dedup uses row_number with a total order, never arbitrary.

Reference parity notes are in each builder's docstring (file:line).
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from twitter_kafka_etl_spark.functions.scalar import (
    construct_key,
    decimal_sum,
    derive_date_hour,
    first_element,
    parse_json_col,
    positivity_flag,
)
from twitter_kafka_etl_spark.io import read_table, write_partitioned
from twitter_kafka_etl_spark.operators import relational as R

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    description: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL over pre-registered table views
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def _register(name: str, description: str, oracle: str | None, tags=()):
    def deco(fn):
        REGISTRY[name] = QuerySpec(name, description, fn, oracle, tuple(tags))
        return fn

    return deco


def _dbl_sum(col: str, alias: str) -> F.Column:
    return decimal_sum(col).cast("double").alias(alias)


# --------------------------------------------------------------------------
# Q01 — partition-pruned scan (S5)
# --------------------------------------------------------------------------
@_register(
    "q01_pruned_scan",
    "events filtered to one date/hour — Catalyst partition pruning replaces "
    "the reference's manual per-hour path math (consumer.scala:89-123)",
    """
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE CAST(ts AS DATE) = DATE '2024-01-05' AND EXTRACT(hour FROM ts) >= 6
    """,
    tags=("scan",),
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    from twitter_kafka_etl_spark.io import read_table_time_range

    # date = 2024-01-05 AND hour >= 6  ⇔  ts ∈ [05 06:00, 06 00:00):
    # expressed as a raw-column range so it pushes into the parquet scan
    # (a filter on the rebuilt timestamp column cannot push)
    ev = read_table_time_range(
        spark, sf_dir, "events", "2024-01-05 06:00:00", "2024-01-06 00:00:00"
    )
    return R.project(ev, "event_id", "ts", "user_id", "event_type", "value")


# --------------------------------------------------------------------------
# Q02 — partitioned write → re-read (S7, fixed: .save() actually called,
# partition column is a low-cardinality dimension, not a measure)
# --------------------------------------------------------------------------
@_register(
    "q02_partitioned_roundtrip",
    "write events partitioned by event_type, read back, count per type "
    "(fixes consumer.scala:183-187: missing .save(), measure partition key)",
    "SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type",
    tags=("sink",),
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    out = os.path.join(tempfile.gettempdir(), "tkes_q02_roundtrip")
    write_partitioned(ev, out, ["event_type"], mode="overwrite")
    back = spark.read.parquet(out)
    return back.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))


# --------------------------------------------------------------------------
# Q03 — JSON parse → struct → nested field (P1-P3, F1/F2/F10)
# --------------------------------------------------------------------------
@_register(
    "q03_json_extract",
    "parse events.props JSON → struct → field (consumer.scala:63-68 "
    "from_json + getField path)",
    """
    SELECT event_id, CAST(json_extract(props, '$.k') AS INT) AS k_val
    FROM events
    """,
    tags=("json",),
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return ev.select(
        "event_id", parse_json_col("props", "k INT").getField("k").alias("k_val")
    )


# --------------------------------------------------------------------------
# Q04 — temporal derivation (P5, F3/F11/F12)
# --------------------------------------------------------------------------
@_register(
    "q04_time_derive",
    "derive date/hour strings + hour-truncated timestamp from events.ts "
    "(consumer.scala:69-70; wrangling.py:15-20 reassembly replaced by "
    "date_trunc)",
    """
    SELECT event_id,
           strftime(ts, '%Y-%m-%d') AS date,
           strftime(ts, '%H') AS hour,
           date_trunc('hour', ts) AS date_hour
    FROM events
    """,
    tags=("time",),
)
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return derive_date_hour(ev, "ts").select("event_id", "date", "hour", "date_hour")


# --------------------------------------------------------------------------
# Q05 — inequality filter + fixed projection (P7/P8)
# --------------------------------------------------------------------------
@_register(
    "q05_filter_project",
    "drop one event_type, fixed column subset (wrangling.py:25-28 "
    "NoFlyZone filter + 11-column projection)",
    """
    SELECT event_id, user_id, event_type, value
    FROM events WHERE event_type <> 'error'
    """,
    tags=("filter",),
)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return R.project(
        R.filter_rows(ev, F.col("event_type") != "error"),
        "event_id", "user_id", "event_type", "value",
    )


# --------------------------------------------------------------------------
# Q06 — explode + membership routing (P10/D2)
# --------------------------------------------------------------------------
@_register(
    "q06_explode_route",
    "array built from props/event_type, exploded one row per tag, routed "
    "by allow-list (producer fan-out, twitter_producer.py:62-64)",
    """
    WITH base AS (
      SELECT event_id, event_type,
             CAST(json_extract(props, '$.k') AS INT) AS k
      FROM events
    ), ex AS (
      SELECT event_id,
             unnest([event_type,
                     CASE WHEN k % 2 = 0 THEN 'even' ELSE 'odd' END]) AS tag
      FROM base
    )
    SELECT event_id, tag FROM ex
    WHERE tag IN ('click', 'purchase', 'even')
    """,
    tags=("explode",),
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    k = parse_json_col("props", "k INT").getField("k")
    tags = F.array(
        F.col("event_type"),
        F.when(k % 2 == 0, F.lit("even")).otherwise(F.lit("odd")),
    )
    routed = R.explode_route(
        ev.select("event_id", tags.alias("tags")),
        "tags", "tag", allowed=["click", "purchase", "even"],
    )
    return routed.select("event_id", "tag")


# --------------------------------------------------------------------------
# Q07 — pivot with explicit values + null fill (A3/R2/P9)
# --------------------------------------------------------------------------
_Q07_ORACLE_CASES = ",\n".join(
    f"CAST(COALESCE(SUM(CASE WHEN event_type = '{t}' THEN "
    f"CAST(value AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS {t}"
    for t in EVENT_TYPES
)


@_register(
    "q07_pivot",
    "user-bucket × event_type pivot, sum(value), fill 0 "
    "(consumer.scala:170, with explicit values = no driver distinct scan)",
    f"""
    SELECT user_id % 10 AS bucket, {_Q07_ORACLE_CASES}
    FROM events GROUP BY bucket
    """,
    tags=("pivot",),
)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return R.pivot_explicit(
        ev.withColumn("bucket", F.col("user_id") % 10),
        "bucket", "event_type", EVENT_TYPES,
        decimal_sum("value").cast("double"),
        fill=0,
    )


def _pivoted_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared wide frame (Q07 shape) for Q13/Q18 — the engine's stand-in
    for the reference's topic×emotion pivot table (consumer.scala:170)."""
    return q07(spark, sf_dir)


_PIVOT_CTE = f"""
    pivoted AS (
      SELECT user_id % 10 AS bucket, {_Q07_ORACLE_CASES}
      FROM events GROUP BY bucket
    )
"""


# --------------------------------------------------------------------------
# Q08 — inner equi-join (J1)
# --------------------------------------------------------------------------
@_register(
    "q08_inner_join",
    "orders ⋈ customer inner equi-join + per-segment rollup "
    "(consumer.scala:172-174 shape; broadcast decided by AQE)",
    """
    SELECT c.c_mktsegment,
           COUNT(*) AS order_cnt,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    tags=("join",),
)
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    joined = R.join_tables(
        orders, customer,
        on=orders.o_custkey == customer.c_custkey,
        how="inner", broadcast_right=True,
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("order_cnt"),
        _dbl_sum("o_totalprice", "total_price"),
    )


# --------------------------------------------------------------------------
# Q09 — left outer join with null handling
# --------------------------------------------------------------------------
@_register(
    "q09_left_join",
    "customer ⟕ orders; COUNT(col) skips nulls so order-less customers "
    "show 0 (declared join surface, SURVEY §2.3)",
    """
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS order_cnt
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
    tags=("join",),
)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    joined = R.join_tables(
        customer, orders, on=customer.c_custkey == orders.o_custkey, how="left"
    )
    return joined.groupBy("c_custkey").agg(F.count("o_orderkey").alias("order_cnt"))


# --------------------------------------------------------------------------
# Q10 — semi / anti joins
# --------------------------------------------------------------------------
@_register(
    "q10_semi_anti",
    "customers with vs without orders via left_semi / left_anti "
    "(declared join surface, SURVEY §2.3)",
    """
    SELECT 'with_orders' AS grp, COUNT(*) AS cnt FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT 'without_orders' AS grp, COUNT(*) AS cnt FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join",),
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    cond = customer.c_custkey == orders.o_custkey
    semi = R.join_tables(customer, orders, on=cond, how="left_semi").agg(
        F.count(F.lit(1)).alias("cnt")
    ).select(F.lit("with_orders").alias("grp"), "cnt")
    anti = R.join_tables(customer, orders, on=cond, how="left_anti").agg(
        F.count(F.lit(1)).alias("cnt")
    ).select(F.lit("without_orders").alias("grp"), "cnt")
    return R.union_all(semi, anti)


# --------------------------------------------------------------------------
# Q11 — conditional-rate aggregation (A1, the reference's core analytic)
# --------------------------------------------------------------------------
@_register(
    "q11_conditional_rate",
    "per-priority avg(when(status<=>'F',1).otherwise(0)) + count + round "
    "(positivity rate, consumer.scala:158-166)",
    """
    SELECT o_orderpriority,
           ROUND(AVG(CASE WHEN o_orderstatus IS NOT DISTINCT FROM 'F'
                          THEN 1 ELSE 0 END), 2) AS positivity_rate,
           COUNT(*) AS counts
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg",),
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return R.conditional_rate_agg(
        orders, "o_orderpriority", positivity_flag("o_orderstatus", "F")
    )


# --------------------------------------------------------------------------
# Q12 — two-key count (A2, alias bug fixed)
# --------------------------------------------------------------------------
@_register(
    "q12_two_key_count",
    "lineitem count by (returnflag, linestatus) — alias on the column, "
    "not the DataFrame (fixes consumer.scala:168-169)",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS counts
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg",),
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return R.count_agg(li, ["l_returnflag", "l_linestatus"])


# --------------------------------------------------------------------------
# Q13 — per-group sums over the pivoted wide table (A4/A7)
# --------------------------------------------------------------------------
_Q13_SUMS = ",\n".join(
    f"CAST(SUM(CAST({t} AS DECIMAL(18,2))) AS DOUBLE) AS sum_{t}"
    for t in EVENT_TYPES
)


@_register(
    "q13_wide_sums",
    "grouped sums of every wide (emotion-like) column "
    "(visualisation.py:27 groupby().sum())",
    f"""
    WITH {_PIVOT_CTE}
    SELECT bucket % 2 AS grp, {_Q13_SUMS}
    FROM pivoted GROUP BY grp
    """,
    tags=("agg",),
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = _pivoted_events(spark, sf_dir)
    return wide.groupBy((F.col("bucket") % 2).alias("grp")).agg(
        *[_dbl_sum(t, f"sum_{t}") for t in EVENT_TYPES]
    )


# --------------------------------------------------------------------------
# Q14 — share-of-group-total window (A5/A6/W1)
# --------------------------------------------------------------------------
@_register(
    "q14_share_of_total",
    "count / sum(count) over (partition by event_type) — the group-total "
    "window the viz layer intended (visualisation.py:21,35,72)",
    """
    WITH c AS (
      SELECT event_type, user_id % 10 AS bucket, COUNT(*) AS counts
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, bucket, counts,
           counts / SUM(counts) OVER (PARTITION BY event_type) AS percent
    FROM c
    """,
    tags=("window",),
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    counts = R.count_agg(
        ev.withColumn("bucket", F.col("user_id") % 10), ["event_type", "bucket"]
    )
    return R.share_of_total(counts, ["event_type"], "counts").select(
        "event_type", "bucket", "counts", "percent"
    )


# --------------------------------------------------------------------------
# Q15 — rollup (declared agg surface)
# --------------------------------------------------------------------------
@_register(
    "q15_rollup",
    "region/nation rollup of order totals across a 4-table join chain",
    """
    SELECT r.r_name, n.n_name,
           COUNT(*) AS order_cnt,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP(r.r_name, n.n_name)
    """,
    tags=("agg",),
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    joined = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return R.rollup_agg(
        joined, ["r_name", "n_name"],
        F.count(F.lit(1)).alias("order_cnt"),
        _dbl_sum("o_totalprice", "total_price"),
    )


# --------------------------------------------------------------------------
# Q16 — keyed dedup (D1)
# --------------------------------------------------------------------------
@_register(
    "q16_dedup_keys",
    "distinct (user_id, hour) — wrangling.py:24 drop_duplicates subset, "
    "projected to the dedup keys so the result is deterministic",
    """
    SELECT DISTINCT user_id, EXTRACT(hour FROM ts) AS hr FROM events
    """,
    tags=("dedup",),
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    keyed = ev.withColumn("hr", F.hour("ts").cast("bigint"))
    return R.dedup_any(keyed, ["user_id", "hr"]).select("user_id", "hr")


# --------------------------------------------------------------------------
# Q17 — union / except set ops
# --------------------------------------------------------------------------
@_register(
    "q17_set_ops",
    "unionByName of two customer splits, then exceptAll of a third "
    "(declared set-op surface, SURVEY §2.5)",
    """
    SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 1000
    UNION ALL
    SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT ALL
    SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000
    """,
    tags=("setop",),
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_acctbal") > 1000).select("c_custkey", "c_name")
    b = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey", "c_name")
    d = c.filter(F.col("c_acctbal") > 5000).select("c_custkey", "c_name")
    return R.except_all(R.union_all(a, b), d)


# --------------------------------------------------------------------------
# Q18 — unpivot / melt (R1/R3)
# --------------------------------------------------------------------------
_Q18_BRANCHES = "\n    UNION ALL\n".join(
    f"SELECT bucket, '{t}' AS event_type, {t} AS total FROM pivoted"
    for t in EVENT_TYPES
)


@_register(
    "q18_unpivot",
    "wide pivot → long (bucket, event_type, total) — pd.melt "
    "(visualisation.py:19-20) as DataFrame.unpivot",
    f"""
    WITH {_PIVOT_CTE}
    {_Q18_BRANCHES}
    """,
    tags=("reshape",),
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = _pivoted_events(spark, sf_dir)
    return R.unpivot_long(wide, ["bucket"], EVENT_TYPES, "event_type", "total")


# --------------------------------------------------------------------------
# Q19 — element_at on array column (F4)
# --------------------------------------------------------------------------
@_register(
    "q19_element_at",
    "first element of embeddings.embedding — element_at(arr, 1), the NLP "
    "result-array head take (consumer.scala:128,153)",
    """
    SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS first_dim FROM embeddings
    """,
    tags=("array",),
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", first_element("embedding").cast("double").alias("first_dim")
    )


# --------------------------------------------------------------------------
# Q20 — key construction (F9)
# --------------------------------------------------------------------------
@_register(
    "q20_key_construct",
    "concat(upper(substring(seg,1,2)), custkey) — the producer's Kafka "
    "key template (twitter_producer.py:33)",
    """
    SELECT c_custkey,
           upper(substr(c_mktsegment, 1, 2)) || CAST(c_custkey AS VARCHAR)
             AS msg_key
    FROM customer
    """,
    tags=("string",),
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey", construct_key("c_mktsegment", "c_custkey").alias("msg_key")
    )


# --------------------------------------------------------------------------
# Q21 — array functions over documents.text
# --------------------------------------------------------------------------
@_register(
    "q21_array_fns",
    "split / array_contains / element transform on documents.text "
    "(declared function surface, SURVEY §2.7)",
    """
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           list_contains(string_split(text, ' '), 'spark') AS has_spark,
           upper(string_split(text, ' ')[1]) AS first_tok_upper
    FROM documents
    """,
    tags=("array",),
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.upper(F.element_at(toks, 1)).alias("first_tok_upper"),
    )


# --------------------------------------------------------------------------
# Q22 — window dedup: row_number = 1 (declared window surface)
# --------------------------------------------------------------------------
@_register(
    "q22_window_dedup",
    "keep-first row per (user_id, event_type) by (ts, event_id) — "
    "deterministic drop_duplicates (wrangling.py:24 semantics at scale)",
    """
    SELECT event_id, user_id, event_type, ts
    FROM events
    QUALIFY row_number() OVER (
      PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
    """,
    tags=("window", "dedup"),
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return R.dedup_first(
        ev, ["user_id", "event_type"], [F.col("ts"), F.col("event_id")]
    ).select("event_id", "user_id", "event_type", "ts")


# --------------------------------------------------------------------------
# Q23 — lag / lead (declared window surface)
# --------------------------------------------------------------------------
@_register(
    "q23_lag_delta",
    "per-user event value delta vs previous event (lag over event-time)",
    """
    SELECT event_id, user_id,
           value - lag(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS delta
    FROM events
    """,
    tags=("window",),
)
def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id", "user_id",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


# --------------------------------------------------------------------------
# Q24 — as-of join (declared join surface, SURVEY §2.3)
# --------------------------------------------------------------------------
@_register(
    "q24_asof_join",
    "for each purchase, the latest click value at-or-before it per user — "
    "as-of join via union + keyed window (one shuffle, no range-join "
    "explosion; SURVEY §2.3 declared surface)",
    """
    WITH u AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS side
      FROM events WHERE event_type IN ('click', 'purchase')
    )
    SELECT event_id, user_id, last_click_value FROM (
      SELECT event_id, user_id, side,
             last_value(CASE WHEN side = 0 THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, side, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS last_click_value
      FROM u)
    WHERE side = 1
    """,
    tags=("join", "window"),
)
def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    joined = R.asof_join(
        purchases, clicks,
        keys=["user_id"], left_ts="ts", right_ts="ts",
        right_values=["value"], tiebreak=["event_id"],
    )
    return joined.select(
        "event_id", "user_id", F.col("asof_value").alias("last_click_value")
    )


# --------------------------------------------------------------------------
# Q25 — custom UDAF via pandas_udf GROUPED_AGG (SURVEY §2.10 surface)
# --------------------------------------------------------------------------
@_register(
    "q25_grouped_agg_udaf",
    "per-event_type exact median + midrange of value via Arrow "
    "GROUPED_AGG pandas_udf — the engine's custom-aggregate surface "
    "(SURVEY §2.10); exact order statistics are float-portable so the "
    "oracle hash-matches (grouped-agg UDFs cannot mix with JVM "
    "aggregates in one agg, so both columns are UDAFs)",
    """
    SELECT event_type,
           median(value) AS med_value,
           (MIN(value) + MAX(value)) / 2 AS midrange_value
    FROM events GROUP BY event_type
    """,
    tags=("agg", "udf"),
)
def q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from twitter_kafka_etl_spark.functions.aggregates import (
        median_agg,
        midrange_agg,
    )

    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        median_agg("value").alias("med_value"),
        midrange_agg("value").alias("midrange_value"),
    )


# --------------------------------------------------------------------------
# Q26 — cube over two keys (declared agg surface, SURVEY §2.4)
# --------------------------------------------------------------------------
@_register(
    "q26_cube",
    "lineitem counts + quantity sums over CUBE(returnflag, linestatus) — "
    "all four grouping sets in one expand+aggregate pass",
    """
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS counts,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    tags=("agg",),
)
def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return R.cube_agg(
        li, ["l_returnflag", "l_linestatus"],
        F.count(F.lit(1)).alias("counts"),
        _dbl_sum("l_quantity", "sum_qty"),
    )


# --------------------------------------------------------------------------
# Q27 — regex + MapType functions (declared function surface, SURVEY §2.7)
# --------------------------------------------------------------------------
@_register(
    "q27_regex_map",
    "regexp_extract/regexp_replace over documents.text plus a MapType "
    "build-and-extract — the regex and map surface the reference never "
    "uses but the engine exposes (SURVEY §2.7, §1.2)",
    r"""
    SELECT doc_id,
           regexp_extract(text, '\b(\w+ing)\b', 1) AS first_ing,
           CAST(length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT)
             AS consonant_len,
           CAST(length(text) AS BIGINT) AS from_map
    FROM documents
    """,
    tags=("string", "map"),
)
def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    stats = F.create_map(
        F.lit("len"), F.length("text").cast("bigint"),
        F.lit("doc"), F.col("doc_id"),
    )
    return docs.select(
        "doc_id",
        F.regexp_extract("text", r"\b(\w+ing)\b", 1).alias("first_ing"),
        F.length(F.regexp_replace("text", "[aeiou]", ""))
        .cast("bigint")
        .alias("consonant_len"),
        F.element_at(stats, "len").alias("from_map"),
    )


# --------------------------------------------------------------------------
# Q28 — session window, batch semantics (T8, SURVEY §2.9)
# --------------------------------------------------------------------------
@_register(
    "q28_session_window",
    "per-user 30-min-gap session windows over events (F.session_window, "
    "batch) — oracle-checked against the gaps-and-islands formulation; "
    "a session is [min ts, last ts + gap), new session when the gap to "
    "the previous event is >= 30 min",
    """
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS counts
    FROM numbered GROUP BY user_id, sess_id
    """,
    tags=("window", "session", "agg"),
)
def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    from twitter_kafka_etl_spark.streaming.windows import session_counts

    ev = read_table(spark, sf_dir, "events")
    return session_counts(ev, ts_col="ts", gap="30 minutes", keys=("user_id",))


# --------------------------------------------------------------------------
# Q29 — spark.sql entry point: TPC-H Q1 pricing summary
# --------------------------------------------------------------------------
#: identical text runs in Spark SQL and DuckDB (avg written as
#: decimal-sum / count so both engines divide the same exact numerator)
_Q29_SQL = """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
             AS avg_qty,
           COUNT(*) AS count_order
    FROM {table}
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
"""


@_register(
    "q29_sql_tpch_q1",
    "TPC-H Q1 pricing summary through the spark.sql entry point over a "
    "registered view — the engine's SQL surface; the same query text "
    "runs on both engines (decimal-exact sums, division as double)",
    _Q29_SQL.format(table="lineitem"),
    tags=("sql", "agg"),
)
def q29(spark: SparkSession, sf_dir: str) -> DataFrame:
    read_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(_Q29_SQL.format(table="lineitem_v"))


# --------------------------------------------------------------------------
# Q30 — hypertable-style multi-granularity time rollup (GROUPING SETS)
# --------------------------------------------------------------------------
#: identical text runs in Spark SQL and DuckDB: one expand+aggregate pass
#: produces hourly AND daily continuous-aggregate rows
_Q30_SQL = """
    WITH b AS (
      SELECT date_trunc('hour', ts) AS hb, date_trunc('day', ts) AS db,
             event_type, value
      FROM {table}
    )
    SELECT CASE WHEN GROUPING(hb) = 0 THEN 'hour' ELSE 'day' END
             AS granularity,
           COALESCE(hb, db) AS bucket_start,
           event_type,
           COUNT(*) AS counts,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM b
    GROUP BY GROUPING SETS ((hb, event_type), (db, event_type))
"""


@_register(
    "q30_time_rollup",
    "hypertable-style continuous aggregate: hourly and daily rollups of "
    "events in ONE expand+aggregate pass via GROUPING SETS (vs the "
    "reference's single manual hour granularity, consumer.scala:69-70)",
    _Q30_SQL.format(table="events"),
    tags=("agg", "time", "sql"),
)
def q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    read_table(spark, sf_dir, "events").createOrReplaceTempView("events_v")
    return spark.sql(_Q30_SQL.format(table="events_v"))


# --------------------------------------------------------------------------
# Q31 — range join via bucket decomposition (declared surface, §2.3)
# --------------------------------------------------------------------------
@_register(
    "q31_range_join",
    "events banded by value ∈ [lo, hi) against an interval table — the "
    "inequality join decomposed into a bucket equi-join + exact filter "
    "(no nested-loop plan at any scale)",
    """
    WITH bands AS (
      SELECT i AS band_id, i * 100.0 AS lo, (i + 1) * 100.0 AS hi
      FROM (SELECT unnest(range(0, 5)) AS i)
    )
    SELECT band_id, COUNT(*) AS counts,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY band_id
    """,
    tags=("join", "range"),
)
def q31(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [(i, i * 100.0, (i + 1) * 100.0) for i in range(5)],
        ["band_id", "lo", "hi"],
    ).withColumn("band_id", F.col("band_id").cast("bigint"))
    joined = R.range_join_bucketed(ev, bands, "value", bucket_width=100.0)
    return joined.groupBy("band_id").agg(
        F.count(F.lit(1)).alias("counts"),
        _dbl_sum("value", "total"),
    )


# --------------------------------------------------------------------------
# Q32 — interval arithmetic (F13 parity; §1.2 Interval type support)
# --------------------------------------------------------------------------
@_register(
    "q32_interval_arith",
    "timestamp ± INTERVAL arithmetic and timestamp diffs — the engine "
    "surface behind the reference's wall-clock minusHours/minusDays path "
    "math (consumer.scala:92-99), done declaratively on event time",
    """
    SELECT event_id,
           ts - INTERVAL 1 HOUR AS prev_hour,
           ts + INTERVAL 1 DAY AS next_day,
           CAST(date_diff('hour', TIMESTAMP '2024-01-01 00:00:00', ts)
                AS BIGINT) AS hours_since_epoch0
    FROM events
    """,
    tags=("time",),
)
def q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("prev_hour"),
        (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("next_day"),
        F.expr("timestampdiff(HOUR, TIMESTAMP '2024-01-01 00:00:00', ts)")
        .cast("bigint")
        .alias("hours_since_epoch0"),
    )


# --------------------------------------------------------------------------
# Q33 — top-K per group (canonical leaderboard window)
# --------------------------------------------------------------------------
@_register(
    "q33_topk_per_group",
    "top-3 orders by total price per market segment — row_number <= K "
    "over a keyed window: one shuffle, per-group bounded sort, no global "
    "ordering",
    """
    SELECT c_mktsegment, o_orderkey,
           CAST(o_totalprice AS DOUBLE) AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    QUALIFY row_number() OVER (
      PARTITION BY c_mktsegment
      ORDER BY o_totalprice DESC, o_orderkey) <= 3
    """,
    tags=("window", "join"),
)
def q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    joined = orders.join(
        F.broadcast(customer), orders.o_custkey == customer.c_custkey
    )
    top = R.topk_per_group(
        joined, ["c_mktsegment"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")], k=3,
    )
    return top.select(
        "c_mktsegment", "o_orderkey",
        F.col("o_totalprice").cast("double").alias("total_price"),
    )


# --------------------------------------------------------------------------
# Q34 — MERGE-style upsert (SCD1) via anti-join + union
# --------------------------------------------------------------------------
@_register(
    "q34_merge_upsert",
    "SCD1 upsert without a table format: account-balance updates replace "
    "same-key customer rows, unmatched rows survive (MERGE INTO emulated "
    "as updates ∪ (base ▷anti updates))",
    """
    WITH updates AS (
      SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) * 2 AS acctbal
      FROM customer WHERE c_custkey % 10 = 0
    ), base AS (
      SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS acctbal
      FROM customer
    )
    SELECT * FROM updates
    UNION ALL
    SELECT b.* FROM base b
    WHERE NOT EXISTS (SELECT 1 FROM updates u
                      WHERE u.c_custkey = b.c_custkey)
    """,
    tags=("merge", "join", "setop"),
)
def q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    base = c.select(
        "c_custkey", "c_name", F.col("c_acctbal").cast("double").alias("acctbal")
    )
    updates = base.filter(F.col("c_custkey") % 10 == 0).withColumn(
        "acctbal", F.col("acctbal") * 2
    )
    return R.merge_upsert(base, updates, ["c_custkey"])


# --------------------------------------------------------------------------
# Q35 — malformed-JSON handling (PERMISSIVE semantics, SURVEY §1.3/§1.4)
# --------------------------------------------------------------------------
@_register(
    "q35_json_corrupt_handling",
    "from_json PERMISSIVE + _corrupt_record over planted malformed "
    "payloads (every 7th row prefix-mangled): corrupt rows are captured "
    "and counted, never crash the job — the schema-on-read failure mode "
    "the reference swallows silently (consumer.scala:64) made explicit",
    """
    WITH mangled AS (
      SELECT event_type,
             CASE WHEN event_id % 7 = 0 THEN 'xx' || props
                  ELSE props END AS p
      FROM events
    )
    SELECT event_type,
           COUNT(*) FILTER (WHERE json_valid(p)) AS n_valid,
           COUNT(*) FILTER (WHERE NOT json_valid(p)) AS n_corrupt
    FROM mangled GROUP BY event_type
    """,
    tags=("json", "quality"),
)
def q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    mangled = ev.withColumn(
        "p",
        F.when(
            F.col("event_id") % 7 == 0, F.concat(F.lit("xx"), F.col("props"))
        ).otherwise(F.col("props")),
    )
    parsed = mangled.withColumn(
        "s",
        F.from_json(
            "p",
            "k INT, _corrupt_record STRING",
            {"columnNameOfCorruptRecord": "_corrupt_record"},
        ),
    )
    bad = F.col("s._corrupt_record").isNotNull()
    return parsed.groupBy("event_type").agg(
        F.count(F.when(~bad, 1)).alias("n_valid"),
        F.count(F.when(bad, 1)).alias("n_corrupt"),
    )


# --------------------------------------------------------------------------
# Q36 — posexplode (UDTF surface, SURVEY §2.10)
# --------------------------------------------------------------------------
@_register(
    "q36_posexplode_dims",
    "per-dimension min/max over embedding vectors via posexplode — the "
    "positional table-generating surface (§2.10); min/max of floats are "
    "order-independent so the oracle matches exactly",
    """
    WITH x AS (
      SELECT unnest(embedding) AS val,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    )
    SELECT CAST(pos - 1 AS BIGINT) AS pos,
           CAST(MIN(val) AS DOUBLE) AS dim_min,
           CAST(MAX(val) AS DOUBLE) AS dim_max,
           COUNT(*) AS counts
    FROM x GROUP BY pos
    """,
    tags=("array", "explode"),
)
def q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    exploded = emb.select(F.posexplode("embedding").alias("pos", "val"))
    return exploded.groupBy(F.col("pos").cast("bigint").alias("pos")).agg(
        F.min("val").cast("double").alias("dim_min"),
        F.max("val").cast("double").alias("dim_max"),
        F.count(F.lit(1)).alias("counts"),
    )


# --------------------------------------------------------------------------
# Q37 — exact percentiles (quantile surface; JVM-side, vs Q25's UDAF)
# --------------------------------------------------------------------------
@_register(
    "q37_percentiles",
    "exact interpolated p50/p90/p99 of value per event_type via the "
    "built-in percentile aggregate — order statistics are float-portable; "
    "at 100 TB swap for percentile_approx and accept the ε",
    """
    SELECT event_type,
           quantile_cont(value, 0.5) AS p50,
           quantile_cont(value, 0.9) AS p90,
           quantile_cont(value, 0.99) AS p99
    FROM events GROUP BY event_type
    """,
    tags=("agg", "quantile"),
)
def q37(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("p50"),
        F.percentile("value", 0.9).alias("p90"),
        F.percentile("value", 0.99).alias("p99"),
    )
