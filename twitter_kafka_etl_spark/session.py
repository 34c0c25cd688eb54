"""SparkSession factory with scale-appropriate defaults.

Replaces the reference's session setup (consumer.scala:29-40), fixing its
anti-patterns: hardcoded ``local[*]`` master, static
``spark.sql.shuffle.partitions=8``, and unbounded
``spark.driver.maxResultSize=0``.

Design-for-100TB notes:
- AQE on: runtime shuffle-partition coalescing, skew-join splitting, and
  dynamic broadcast selection replace static tuning.
- Arrow on: the only sanctioned Python boundary is Arrow-batched
  (pandas_udf / mapInPandas); row-at-a-time Python UDFs are banned.
- Session timezone pinned to UTC so event-time semantics are stable across
  the cluster (and match the DuckDB oracle).
- maxResultSize bounded: a driver collect of unbounded size is a design
  bug, never a config fix.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Configs applied to every engine session. Each is safe at any scale; the
#: per-cluster tunables (executor memory, shuffle partitions) are derived
#: from the environment rather than hardcoded.
ENGINE_CONF: dict[str, str] = {
    # --- adaptive execution: the scale workhorse -------------------------
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # --- python boundary: Arrow only ------------------------------------
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # --- determinism / correctness ---------------------------------------
    "spark.sql.session.timeZone": "UTC",
    # --- scan efficiency --------------------------------------------------
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.optimizer.nestedSchemaPruning.enabled": "true",
    # --- bounded driver (reference set this to 0 = unlimited; never do) --
    "spark.driver.maxResultSize": "2g",
    # streaming: stop gracefully like the reference (consumer.scala:35)
    "spark.streaming.stopGracefullyOnShutdown": "true",
    # local file:// IO skips client-side CRC shadow files — they double
    # file-creation cost for many-partition sinks and protect nothing on
    # a local disk. Cluster object stores (s3a/abfs) ignore this key.
    "spark.hadoop.fs.file.impl": "org.apache.hadoop.fs.RawLocalFileSystem",
    # Always use the sort-based shuffle writer, never the bypass-merge
    # writer. Bypass engages when a shuffle has no map-side combine and
    # fewer reduce partitions than the threshold (default 200), and it
    # writes ONE FILE PER REDUCE PARTITION per map task — at this
    # engine's shuffle width that is cores² file creates per exchange,
    # and the stage profile showed it: ~110 ms of shuffle-write time
    # per map task for 17 KB of data (measured 415→211 ms per
    # repartition job with the sort writer, guide §2.1). At production
    # scale reduce counts are in the thousands, so bypass never engages
    # on a cluster — pinning the sort writer makes local runs match
    # cluster execution instead of exercising a code path 100 TB jobs
    # never hit.
    "spark.shuffle.sort.bypassMergeThreshold": "1",
    # small-file local runs: don't let 200 default partitions dominate
    # (AQE coalesces down, but the initial number still costs task launch)
}


def default_parallelism() -> int:
    """Engine parallelism: ``SPARK_GRAFT_CPUS`` env or local CPU count."""
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return int(env)
    return os.cpu_count() or 8


def get_spark(
    app_name: str = "twitter-kafka-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    On a real cluster, ``master`` is left to spark-submit; locally it
    defaults to ``local[$SPARK_GRAFT_CPUS]``.
    """
    par = default_parallelism()
    builder = SparkSession.builder.appName(app_name)
    local_mode = False
    if master:
        builder = builder.master(master)
        local_mode = master.startswith("local")
    elif "SPARK_MASTER" not in os.environ:
        builder = builder.master(f"local[{par}]")
        local_mode = True
    conf = dict(ENGINE_CONF)
    if local_mode:
        # local mode runs all 32 executor threads in the driver JVM; the
        # 1g default heap OOMs at sf1. A max-heap cap, not a reservation
        # — only effective before the JVM launches. On a cluster,
        # executor/driver memory comes from spark-submit.
        conf.setdefault(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")
        )
        # Local testdata is a handful of large parquet files; the 128m
        # default split gives expression-heavy scans (tokenization, shingle
        # builds) fewer input tasks than cores. Smaller splits restore scan
        # parallelism. Cluster runs read many files and keep the default.
        conf.setdefault(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_SPLIT_BYTES", "16m"),
        )
        # Every distinct query compiles fresh whole-stage-codegen classes;
        # a long suite (90+ queries) fills the JVM's 240m default code
        # cache, after which the JIT stops compiling and expression-heavy
        # operators (md5/minhash/shingle) run interpreted — measured 4-10x
        # mid-suite slowdowns. Flushing + a larger cache keeps codegen
        # compiled. Launch-time option: only effective for the JVM this
        # builder starts; spark-submit owns it on a cluster.
        conf.setdefault(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=512m -XX:+UseCodeCacheFlushing",
        )
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions or par)
    conf["spark.default.parallelism"] = str(par)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def tune_for_tables(spark: SparkSession, approx_rows: int) -> None:
    """Adjust runtime-settable knobs for a known input size.

    At 100 TB the initial shuffle partition count should target
    ~128-256 MB per partition; AQE coalesces the rest.
    """
    par = default_parallelism()
    target = max(par, min(2000, approx_rows // 2_000_000))
    spark.conf.set("spark.sql.shuffle.partitions", str(target))
