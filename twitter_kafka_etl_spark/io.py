"""Sources and sinks (SURVEY.md §2.1, S1-S9).

Batch + streaming readers/writers for parquet, JSON, and Kafka, expressed
so Catalyst keeps pushdown/pruning:

- ``read_table`` reads a whole table root; callers filter on partition or
  data columns and Catalyst prunes partitions / pushes predicates into the
  parquet scan. This replaces the reference's manual per-hour path
  construction (consumer.scala:89-123, S5) — filtering one hour of a
  partitioned table reads exactly that hour's files, no path math, no
  sleep-and-retry.
- ``write_partitioned`` is the fixed S7: it actually saves (the reference
  forgot ``.save()``, consumer.scala:183-187) and refuses measure-typed
  partition columns (the reference partitioned by ``counts``, a measure —
  pathological cardinality at scale).
- Kafka source/sink (S1/S2) mirror consumer.scala:56-62 and the producer's
  keyed writes (twitter_producer.py:30-33); they're config-gated since the
  test container runs no broker.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from twitter_kafka_etl_spark.session import default_parallelism

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def normalize_event_time(df: DataFrame) -> DataFrame:
    """Cast every TIMESTAMP_NTZ column to session-time TIMESTAMP.

    Parquet written with ``isAdjustedToUTC=false`` reads back as
    TIMESTAMP_NTZ under Spark 4's ``inferTimestampNTZ`` default — a type
    ``withWatermark`` rejects outright (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE),
    so every streaming path downstream of a raw scan would break. The
    engine pins the session timezone to UTC (session.py), which makes
    this cast value-preserving: the same wall-clock instant, now
    watermark-eligible."""
    ntz = [
        f.name
        for f in df.schema.fields
        if f.dataType.simpleString() == "timestamp_ntz"
    ]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def read_table(
    spark: SparkSession, sf_dir: str, name: str, rebalance: bool = False
) -> DataFrame:
    """Batch parquet scan of one synthetic table (TESTDATA.md layout).

    Handles nanosecond-precision parquet timestamps (``events.ts`` is
    TIMESTAMP(NANOS), which Spark's vectorized reader rejects): reads
    nanos as long and truncates to microseconds — the same floor
    conversion DuckDB applies, so oracle comparisons agree.

    ``rebalance=True`` is for expression-heavy consumers (tokenization,
    shingling, BLAS over embeddings): when the scan yields fewer input
    splits than the configured parallelism — single-row-group files can't
    be split, so a small table scans as ONE task no matter how many cores
    exist — it repartitions toward the core count. The width FOLLOWS THE
    DATA (guide §2.6): ``min(cores, ceil(rows / 128))`` from the parquet
    footers' row counts (a driver-side metadata read, no job), so a
    2k-row table gets a handful of tasks instead of one near-empty task
    per core — 32 tasks of ~60 rows each spend more wall on task launch,
    codegen setup and Python-worker handshakes than on work (the r13
    scaling block measured the embeddings family FASTER on 8 cores than
    32 for exactly this reason), and the same rule on a cluster stops a
    small dimension table from occupying the scheduler with empty tasks.
    The guard makes it free at scale: a 100 TB table already has orders
    of magnitude more splits than cores and is returned untouched, no
    shuffle.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    for fld in df.schema.fields:
        if fld.name == "ts" and fld.dataType.simpleString() == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    df = normalize_event_time(df)
    if rebalance:
        par = default_parallelism()
        if df.rdd.getNumPartitions() < par:
            rows = parquet_footer_rows(path)
            width = (
                min(par, max(1, -(-rows // 128))) if rows is not None else par
            )
            df = df.repartition(width)
    return df


def parquet_footer_rows(path: str) -> int | None:
    """Total row count of a parquet file or directory of part files,
    from the FOOTERS alone — driver-side metadata, no Spark job. None
    when the footers can't be read (caller falls back to a safe
    default). Exact by the parquet spec: every file's metadata carries
    its row count."""
    import pyarrow.parquet as pq

    def one(p: str) -> int:
        return pq.ParquetFile(p).metadata.num_rows

    try:
        if os.path.isdir(path):
            total = 0
            for root_, _dirs, files in os.walk(path):
                for f in files:
                    if f.endswith(".parquet"):
                        total += one(os.path.join(root_, f))
            return total
        return one(path)
    except Exception:  # noqa: BLE001 — metadata probe is best-effort
        return None


def parquet_footer_max(path: str, col: str) -> int | None:
    """Exact MAX of an integer column from parquet row-group statistics
    — the same footer min/max the scan's predicate pushdown trusts to
    skip row groups, read driver-side with no Spark job. Returns None
    (caller falls back to a Spark aggregate) unless EVERY row group of
    every part file carries stats for the column — a partial answer
    would be a lower bound, not the max. Like ``F.max``, column stats
    ignore nulls; an all-null/empty table returns None and the caller's
    Spark fallback reproduces its semantics exactly.

    The streaming builders use this for their arrival-schedule width
    (``MAX(doc_id) // n + 1``): computed per bench run, the one-job
    Spark aggregate is pure fixed cost per query — the value is a
    property of the input files the footers already state."""
    import pyarrow.parquet as pq

    def one(p: str):
        md = pq.ParquetFile(p).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        if col not in names:
            return None
        ci = names[col]
        best = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                if md.row_group(rg).num_rows == 0:
                    continue
                return None
            v = st.max
            if not isinstance(v, int):
                return None
            best = v if best is None else max(best, v)
        return best

    try:
        files = []
        if os.path.isdir(path):
            for root_, _dirs, fs in os.walk(path):
                files.extend(
                    os.path.join(root_, f)
                    for f in fs
                    if f.endswith(".parquet")
                )
        else:
            files = [path]
        best = None
        for p in files:
            v = one(p)
            if v is None:
                if pq.ParquetFile(p).metadata.num_rows == 0:
                    continue
                return None
            best = v if best is None else max(best, v)
        return best
    except Exception:  # noqa: BLE001 — metadata probe is best-effort
        return None


def read_table_time_range(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    ts_lo_iso: str,
    ts_hi_iso: str,
    ts_col: str = "ts",
) -> DataFrame:
    """Time-range scan with REAL predicate pushdown for nanos tables.

    ``read_table`` rebuilds ``ts`` from raw int64 nanos, which makes any
    later timestamp filter an expression over a derived column — Catalyst
    cannot push it, so the scan reads everything (the plan shows only
    IsNotNull under PushedFilters). This reader applies the [lo, hi)
    bound to the RAW long column first; the comparison pushes into the
    parquet reader and row-group min/max statistics skip non-matching
    data — the engine's honest replacement for the reference's per-hour
    path math (consumer.scala:89-123) when the layout isn't
    hive-partitioned."""
    import datetime

    def nanos(s: str) -> int:
        dt = datetime.datetime.fromisoformat(s).replace(
            tzinfo=datetime.timezone.utc
        )
        delta = dt - datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
        return (delta.days * 86_400 + delta.seconds) * 10**9 + delta.microseconds * 1_000

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    fld = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    if fld.get(ts_col) == "bigint":
        df = df.filter(
            (F.col(ts_col) >= nanos(ts_lo_iso)) & (F.col(ts_col) < nanos(ts_hi_iso))
        ).withColumn(ts_col, F.timestamp_micros(F.expr(f"{ts_col} DIV 1000")))
    elif fld.get(ts_col) == "timestamp_ntz":
        # compare in the column's own type so the bound still pushes into
        # the parquet scan, THEN normalize to session-time TIMESTAMP
        df = df.filter(
            (F.col(ts_col) >= F.lit(ts_lo_iso).cast("timestamp_ntz"))
            & (F.col(ts_col) < F.lit(ts_hi_iso).cast("timestamp_ntz"))
        ).withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    else:
        df = df.filter(
            (F.col(ts_col) >= F.lit(ts_lo_iso).cast("timestamp"))
            & (F.col(ts_col) < F.lit(ts_hi_iso).cast("timestamp"))
        )
    return df


def read_json(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """JSON file read (S8; streamviz/wrangling.py:7-11 equivalent)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    mode: str = "overwrite",
    fmt: str = "parquet",
    max_distinct_per_col: int = 10_000,
) -> None:
    """Partitioned batch sink (S4/S7 semantics, with ``.save()`` called).

    Guards against high-cardinality partition columns: at 100 TB,
    partitioning by a measure (consumer.scala:187 partitioned by
    ``counts``) creates millions of directories and kills the metastore.
    The guard samples distinct counts cheaply via approx_count_distinct.
    """
    if partition_by:
        approx = df.select(
            *[F.approx_count_distinct(c).alias(c) for c in partition_by]
        ).first()
        for c in partition_by:
            if approx[c] > max_distinct_per_col:
                raise ValueError(
                    f"partition column {c!r} has ~{approx[c]} distinct values; "
                    f"refusing to partition by a high-cardinality (measure-like) "
                    f"column (cf. reference bug consumer.scala:187)"
                )
    writer = df.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_external(
    df: DataFrame,
    fmt: str,
    options: dict[str, str] | None = None,
    mode: str = "append",
    path: str | None = None,
) -> None:
    """Generic external-system batch sink (S6) — the batch form of
    ``streaming.sinks.external_sink``, replacing the reference's
    hardcoded MongoDB write (consumer.scala:176-181). Any DataSource
    with a Spark batch writer plugs in by name:
    ``write_external(df, "mongodb", {"connection.uri": …})``,
    ``write_external(df, "jdbc", {...})``, or a path-based format
    (``write_external(df, "parquet", path=...)``). Unlike the
    reference's second sink (consumer.scala:183-187), this one calls
    ``.save()``."""
    writer = df.write.format(fmt).options(**(options or {})).mode(mode)
    if path is not None:
        writer.save(path)
    else:
        writer.save()


def mongodb_sink_options(
    connection_uri: str,
    database: str,
    collection: str,
    checkpoint: str | None = None,
) -> dict[str, str]:
    """Option set for the S6 MongoDB sink — the reference's hardcoded
    second sink (consumer.scala:176-181: uri/database/collection) as a
    validated builder for the public mongo-spark connector's ``mongodb``
    format (connector v10+ option names). ``checkpoint`` is required for
    the streaming writer, absent for batch.

    Pure function so the wiring is unit-testable in connectorless
    environments — the jar and a live mongod are only needed at
    ``save()``/``start()``, exactly like the Kafka builders above."""
    if not connection_uri:
        raise ValueError("connection_uri must be non-empty")
    if not connection_uri.startswith(("mongodb://", "mongodb+srv://")):
        raise ValueError(
            "connection_uri must be a mongodb:// or mongodb+srv:// URI"
        )
    if not database or not collection:
        raise ValueError("database and collection must be non-empty")
    opts = {
        "connection.uri": connection_uri,
        "database": database,
        "collection": collection,
    }
    if checkpoint is not None:
        if not checkpoint:
            raise ValueError("checkpoint location must be non-empty when given")
        opts["checkpointLocation"] = checkpoint
    return opts


def write_mongodb(
    df: DataFrame,
    connection_uri: str,
    database: str,
    collection: str,
    mode: str = "append",
) -> None:
    """S6 — MongoDB batch sink (consumer.scala:176-181) through the
    generic external writer with the validated option surface."""
    write_external(
        df,
        "mongodb",
        mongodb_sink_options(connection_uri, database, collection),
        mode=mode,
    )


def write_mongodb_stream(
    df: DataFrame,
    connection_uri: str,
    database: str,
    collection: str,
    checkpoint: str,
):
    """S6 streaming variant: checkpointed micro-batch writes to MongoDB
    (the connector's structured-streaming sink). For multi-sink fan-out
    pair with streaming.sinks.foreach_batch_fanout instead."""
    opts = mongodb_sink_options(connection_uri, database, collection, checkpoint)
    return (
        df.writeStream.format("mongodb")
        .options(**opts)
        .outputMode("append")
        .start()
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
) -> DataFrame:
    """CSV batch read. Always pass a schema in production — inference
    scans the data twice and types drift between files."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC batch read — same columnar pushdown/pruning path as parquet."""
    return spark.read.orc(path)


def read_text(spark: SparkSession, path: str, whole: bool = False) -> DataFrame:
    """Line-oriented (or whole-file) text read — the raw-corpus entry
    point for the text-analysis operators."""
    reader = spark.read
    if whole:
        reader = reader.option("wholetext", "true")
    return reader.text(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """JDBC batch source (config-gated — no database in the test
    container, mirroring the Kafka wrappers). Always pass the partition
    quad for tables of any size: without it the whole table is read by
    ONE task through one connection."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def rate_stream(
    spark: SparkSession, rows_per_second: int = 100, num_partitions: int = 1
) -> DataFrame:
    """Rate source — the built-in load generator for exercising
    streaming plans without a broker (returns (timestamp, value))."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .option("numPartitions", str(num_partitions))
        .load()
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str,
    n_buckets: int = 16,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table (SURVEY brief: 'bucketing for co-located
    joins'). Rows are hash-partitioned into ``n_buckets`` files per
    partition by ``bucket_by`` at write time; a join or aggregation on
    the bucket column between two tables bucketed the same way needs NO
    shuffle at read time — the co-location is baked into the layout.

    At 100 TB this converts every recurring fact⋈fact join on the same
    key from a multi-TB shuffle into a local zip of bucket files. Spark
    bucketing requires the catalog (saveAsTable), not a bare path."""
    writer = df.write.mode(mode).format("parquet")
    if sort_by:
        writer = writer.bucketBy(n_buckets, bucket_by).sortBy(sort_by)
    else:
        writer = writer.bucketBy(n_buckets, bucket_by)
    writer.saveAsTable(table)


def kafka_source_options(
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "latest",
    fail_on_data_loss: bool = False,
) -> dict[str, str]:
    """The exact option set the S1 source passes to the kafka format —
    option-for-option the reference consumer's surface
    (consumer.scala:56-62: bootstrap servers, subscribe list, starting
    offsets), plus explicit failOnDataLoss (the reference leaves the
    default, which kills the query on topic retention at scale).

    Pure function so the wiring is unit-testable in brokerless
    environments (the connector jar and a broker are only needed at
    ``load()``)."""
    if not bootstrap_servers:
        raise ValueError("bootstrap_servers must be non-empty")
    if not topics:
        raise ValueError("topics must name at least one topic")
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topics,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
    }


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "latest",
    fail_on_data_loss: bool = False,
) -> DataFrame:
    """S1 — Kafka streaming source (consumer.scala:56-62 surface).

    Returns the raw (key binary, value binary, topic, partition, offset,
    timestamp) frame; pair with functions.decode_kafka + from_json.
    """
    opts = kafka_source_options(
        bootstrap_servers, topics, starting_offsets, fail_on_data_loss
    )
    return spark.readStream.format("kafka").options(**opts).load()


def kafka_batch_options(
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "earliest",
    ending_offsets: str = "latest",
) -> dict[str, str]:
    """Option set for a BATCH read of a Kafka topic range — backfills
    and repair jobs over the same topics the S1 stream consumes
    (spark.read.format('kafka') with bounded offsets). Offsets accept
    'earliest'/'latest' or a per-partition JSON map; a batch read may
    not start at 'latest' (it would be empty by construction)."""
    if not bootstrap_servers:
        raise ValueError("bootstrap_servers must be non-empty")
    if not topics:
        raise ValueError("topics must name at least one topic")
    if starting_offsets == "latest":
        raise ValueError(
            "a batch Kafka read cannot start at 'latest' — it selects an "
            "empty range; use 'earliest' or an explicit offset map"
        )
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topics,
        "startingOffsets": starting_offsets,
        "endingOffsets": ending_offsets,
    }


def read_kafka_batch(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "earliest",
    ending_offsets: str = "latest",
) -> DataFrame:
    """S1 batch form — bounded-offset Kafka read for backfills; same
    raw wire frame as read_kafka_stream."""
    opts = kafka_batch_options(
        bootstrap_servers, topics, starting_offsets, ending_offsets
    )
    return spark.read.format("kafka").options(**opts).load()


def kafka_sink_options(
    bootstrap_servers: str,
    checkpoint: str,
    topic: str | None = None,
) -> dict[str, str]:
    """Option set for the S2 keyed sink (twitter_producer.py:30-33,
    62-64): checkpointed exactly-once producer; ``topic`` pins a fixed
    topic, otherwise each row routes via its ``topic`` column."""
    if not bootstrap_servers:
        raise ValueError("bootstrap_servers must be non-empty")
    if not checkpoint:
        raise ValueError("a checkpoint location is required for the kafka sink")
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "checkpointLocation": checkpoint,
    }
    if topic:
        opts["topic"] = topic
    return opts


def write_kafka_stream(
    df: DataFrame,
    bootstrap_servers: str,
    checkpoint: str,
    topic: str | None = None,
):
    """S2 — keyed Kafka sink. ``df`` must expose string/binary ``key`` and
    ``value`` columns, plus ``topic`` unless a fixed topic is given
    (fan-out routing, twitter_producer.py:62-64). The wire shape is
    validated at construction, not left to fail broker-side."""
    cols = set(df.columns)
    if "value" not in cols:
        raise ValueError("kafka sink requires a 'value' column")
    if "key" not in cols:
        raise ValueError(
            "keyed producer requires a 'key' column (unkeyed writes lose "
            "the reference's per-key partition ordering)"
        )
    if topic is None and "topic" not in cols:
        raise ValueError(
            "either pass a fixed topic or provide a per-row 'topic' column"
        )
    opts = kafka_sink_options(bootstrap_servers, checkpoint, topic)
    return df.writeStream.format("kafka").options(**opts).start()


def write_stream_partitioned(
    df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: list[str],
    fmt: str = "parquet",
    output_mode: str = "append",
    available_now: bool = True,
):
    """S4 — checkpointed, partitioned file streaming sink
    (consumer.scala:73-82). ``available_now`` gives deterministic
    catch-up-then-stop semantics for tests and backfills."""
    writer = (
        df.writeStream.format(fmt)
        .option("checkpointLocation", checkpoint)
        .option("path", path)
        .outputMode(output_mode)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def to_pandas(df: DataFrame):
    """S9 — engine→pandas boundary (Arrow-enabled) for viz layers."""
    return df.toPandas()
