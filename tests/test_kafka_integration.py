"""Opt-in broker-backed Kafka integration harness (r4 verdict item 3).

The reference's real ingest path is a live Kafka round trip
(consumer.scala:56-62 subscribe, twitter_producer.py:30-33 keyed
produce). The engine's option builders and qs1's wire shape are
verified brokerless elsewhere; THIS module exercises the actual
``format("kafka")`` read/write code paths — offsets, checkpoint
resume, failOnDataLoss — against a real broker, and skips cleanly
in sandboxes without the connector jar or a broker.

Opt-in ladder (first rung that fails skips the test):
1. connector jar present (``format("kafka")`` resolvable);
2. a broker, from ``$SPARK_GRAFT_KAFKA_BOOTSTRAP`` (e.g. a
   ``docker run redpanda`` started by CI) or, failing that, a
   testcontainers-managed one.

Run it somewhere real with, e.g.::

    spark-submit --packages org.apache.spark:spark-sql-kafka-0-10_2.13:4.0.0 …
    SPARK_GRAFT_KAFKA_BOOTSTRAP=localhost:9092 pytest tests/test_kafka_integration.py
"""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import functions as F

from twitter_kafka_etl_spark.io import read_kafka_stream, read_table
from twitter_kafka_etl_spark.streaming.windows import kafka_shaped


def _broker_or_skip(spark) -> str:
    # rung 1: connector jar — load() of the kafka format fails fast and
    # brokerless when the data source can't resolve
    try:
        read_kafka_stream(spark, "localhost:9092", "__probe__")
    except Exception as e:  # noqa: BLE001
        if "Failed to find data source" in str(e):
            pytest.skip("kafka connector jar not available in this sandbox")
        raise
    # rung 2: a live broker
    env = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")
    if env:
        return env
    tc = pytest.importorskip(
        "testcontainers.kafka", reason="no $SPARK_GRAFT_KAFKA_BOOTSTRAP and no testcontainers"
    )
    try:
        container = tc.KafkaContainer()
        container.start()
    except Exception as e:  # noqa: BLE001 — no docker daemon
        pytest.skip(f"cannot start a kafka container here: {e}")
    return container.get_bootstrap_server()


def test_qs1_plan_against_real_topic_with_offset_resume(spark, sf_dir, tmp_path):
    """qs1's exact plan over a real topic, twice: the second run with
    the same checkpoint must consume ONLY the rows produced between the
    runs — the offsets-resume contract the file-source stand-in cannot
    exercise."""
    bootstrap = _broker_or_skip(spark)
    topic = f"tkes_it_{uuid.uuid4().hex[:8]}"
    ev = read_table(spark, sf_dir, "events")

    def produce(df) -> None:
        # the producer's keyed fan-out (twitter_producer.py:30-33): the
        # same kafka_shaped projection qs1 uses, batch-written
        (
            kafka_shaped(
                df,
                key_col=F.concat(
                    F.upper(F.substring("event_type", 1, 2)),
                    F.col("event_id").cast("string"),
                ),
                topic_col=F.lit(topic),
            )
            .write.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap)
            .save()
        )

    first = ev.filter(F.pmod("event_id", F.lit(2)) == 0)
    second = ev.filter(F.pmod("event_id", F.lit(2)) == 1)
    produce(first)

    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def drain() -> None:
        q = (
            read_kafka_stream(
                spark, bootstrap, topic, starting_offsets="earliest"
            )
            .selectExpr(
                "CAST(key AS STRING) AS key",
                "CAST(value AS STRING) AS value",
                "partition",
                "offset",
            )
            .writeStream.format("parquet")
            .option("checkpointLocation", ckpt)
            .option("path", sink)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    got1 = spark.read.parquet(sink)
    assert got1.count() == first.count()

    produce(second)
    drain()  # same checkpoint: must resume from committed offsets
    got2 = spark.read.parquet(sink)
    assert got2.count() == first.count() + second.count()
    # no offset consumed twice — Kafka offsets are unique only within a
    # partition, so the uniqueness check must key on (partition, offset)
    # or a multi-partition topic (broker default > 1) fails it spuriously
    assert (
        got2.groupBy("partition", "offset")
        .count()
        .filter(F.col("count") > 1)
        .count()
        == 0
    )
    # payload survives the wire: every produced key is in the sink once
    keys = {r.key for r in got2.select("key").collect()}
    want = {
        r.k
        for r in ev.select(
            F.concat(
                F.upper(F.substring("event_type", 1, 2)),
                F.col("event_id").cast("string"),
            ).alias("k")
        ).collect()
    }
    assert keys == want
