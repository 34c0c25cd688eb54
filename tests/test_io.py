"""IO layer unit tests (SURVEY §2.1 rows not covered by queries)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from twitter_kafka_etl_spark.io import (
    read_json,
    read_table,
    to_pandas,
    write_partitioned,
)


def test_read_json_single_and_multiline(spark, tmp_path):
    """S8 — the viz layer's JSON config read (wrangling.py:7-11)."""
    p = tmp_path / "conf.json"
    p.write_text(
        "\n".join(json.dumps({"k": i, "name": f"n{i}"}) for i in range(3))
    )
    df = read_json(spark, str(p))
    assert df.count() == 3
    assert {r.k for r in df.collect()} == {0, 1, 2}


def test_to_pandas_arrow_boundary(spark, sf_dir):
    """S9 — engine→pandas hand-off keeps values and dtypes."""
    ev = read_table(spark, sf_dir, "events").limit(100)
    pdf = to_pandas(ev.select("event_id", "event_type", "value"))
    assert len(pdf) == 100
    assert str(pdf["event_id"].dtype) == "int64"
    assert pdf["value"].notna().all()


def test_write_partitioned_rejects_measure_columns(spark, sf_dir, tmp_path):
    """S7 guard — the reference partitioned output by a measure
    (consumer.scala:187); the engine refuses pathological cardinality."""
    ev = read_table(spark, sf_dir, "events")
    with pytest.raises(ValueError, match="high-cardinality"):
        write_partitioned(
            ev, str(tmp_path / "bad"), ["event_id"], max_distinct_per_col=100
        )


def test_write_partitioned_roundtrip_preserves_rows(spark, sf_dir, tmp_path):
    ev = read_table(spark, sf_dir, "events")
    out = str(tmp_path / "ok")
    write_partitioned(ev, out, ["event_type"])
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    # partition column values survive the directory encoding
    assert sorted(
        r.event_type for r in back.select("event_type").distinct().collect()
    ) == sorted(r.event_type for r in ev.select("event_type").distinct().collect())


def test_read_table_rebuilds_nanos_ts(spark, sf_dir):
    """events.ts is TIMESTAMP(NANOS) parquet; read_table must surface a
    usable timestamp column (micros floor, matching DuckDB)."""
    ev = read_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    assert ev.filter(F.col("ts").isNull()).count() == 0


def test_compact_reduces_file_count(spark, sf_dir, tmp_path):
    """Compaction rewrites a fragmented directory into few files without
    changing a single row."""
    from twitter_kafka_etl_spark.layout import compact

    ev = read_table(spark, sf_dir, "events")
    frag = str(tmp_path / "frag")
    ev.repartition(64).write.parquet(frag)  # simulate small-file buildup
    out = str(tmp_path / "compacted")
    compact(spark, frag, out, target_file_mb=256)
    import glob

    assert len(glob.glob(f"{frag}/*.parquet")) == 64
    assert len(glob.glob(f"{out}/*.parquet")) < 8
    assert spark.read.parquet(out).count() == ev.count()


def test_rewrite_sorted_clusters_values(spark, sf_dir, tmp_path):
    """After a sorted rewrite, each file owns a contiguous slice of the
    sort key: per-file [min, max] ranges don't interleave."""
    from twitter_kafka_etl_spark.layout import rewrite_sorted

    ev = read_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    ev.repartition(8).write.parquet(src)
    out = str(tmp_path / "sorted")
    rewrite_sorted(spark, src, out, ["user_id"], n_files=6)
    import pyarrow.parquet as pq
    import glob

    ranges = []
    for f in glob.glob(f"{out}/*.parquet"):
        t = pq.read_table(f, columns=["user_id"])
        col = t.column("user_id").to_pylist()
        if col:
            ranges.append((min(col), max(col)))
    ranges.sort()
    assert len(ranges) > 1  # actually split into several files
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # contiguous, non-interleaved slices
    assert spark.read.parquet(out).count() == ev.count()


def test_read_csv_roundtrip(spark, sf_dir, tmp_path):
    from twitter_kafka_etl_spark.io import read_csv

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    p = str(tmp_path / "ev_csv")
    ev.coalesce(1).write.option("header", "true").csv(p)
    back = read_csv(spark, p, schema="event_id long, user_id long, event_type string")
    assert back.count() == ev.count()
    assert dict(back.dtypes) == dict(ev.dtypes)


def test_read_orc_roundtrip(spark, sf_dir, tmp_path):
    from twitter_kafka_etl_spark.io import read_orc

    ev = read_table(spark, sf_dir, "events").select("event_id", "value")
    p = str(tmp_path / "ev_orc")
    ev.write.orc(p)
    assert read_orc(spark, p).count() == ev.count()


# ---------------------------------------------------------------------------
# S1/S2 Kafka wrappers — exercised as far as a brokerless sandbox allows:
# the option surface is pure and asserted option-for-option against the
# reference consumer (consumer.scala:56-62) and producer
# (twitter_producer.py:30-33); load()/start() need the connector jar.
# ---------------------------------------------------------------------------


def test_kafka_source_options_match_reference_surface():
    from twitter_kafka_etl_spark.io import kafka_source_options

    opts = kafka_source_options("broker1:9092,broker2:9092", "tweets,retweets")
    assert opts == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "tweets,retweets",
        "startingOffsets": "latest",
        "failOnDataLoss": "false",
    }
    assert kafka_source_options("b:9092", "t", "earliest", True)[
        "startingOffsets"
    ] == "earliest"


def test_kafka_source_options_validate():
    import pytest

    from twitter_kafka_etl_spark.io import kafka_source_options

    with pytest.raises(ValueError, match="bootstrap"):
        kafka_source_options("", "topic")
    with pytest.raises(ValueError, match="topic"):
        kafka_source_options("b:9092", "")


def test_kafka_sink_options_fixed_vs_routed_topic():
    import pytest

    from twitter_kafka_etl_spark.io import kafka_sink_options

    fixed = kafka_sink_options("b:9092", "/ckpt", topic="tweets")
    assert fixed["topic"] == "tweets"
    routed = kafka_sink_options("b:9092", "/ckpt")
    assert "topic" not in routed  # per-row 'topic' column routes instead
    assert routed["checkpointLocation"] == "/ckpt"
    with pytest.raises(ValueError, match="checkpoint"):
        kafka_sink_options("b:9092", "")


def test_kafka_sink_validates_wire_shape(spark):
    """The keyed-producer contract (key/value/topic) fails fast at
    construction instead of broker-side."""
    import pytest

    from pyspark.sql import functions as F

    from twitter_kafka_etl_spark.io import write_kafka_stream

    schema = "key string, value string, topic string"
    stream = (
        spark.readStream.schema(schema).parquet("/tmp/tkes_kafka_never/*")
    )
    with pytest.raises(ValueError, match="'value'"):
        write_kafka_stream(stream.select("key"), "b:9092", "/ckpt")
    with pytest.raises(ValueError, match="'key'"):
        write_kafka_stream(stream.select("value"), "b:9092", "/ckpt")
    with pytest.raises(ValueError, match="topic"):
        write_kafka_stream(stream.select("key", "value"), "b:9092", "/ckpt")


def test_kafka_readstream_plan_shape_when_connector_present(spark):
    """Construction-level check of the real kafka format (no broker is
    contacted at load()); skipped where the connector jar is absent."""
    import pytest

    from twitter_kafka_etl_spark.io import read_kafka_stream

    try:
        df = read_kafka_stream(spark, "localhost:9092", "tweets")
    except Exception as e:  # noqa: BLE001 — connector jar not deployed
        if "Failed to find data source" in str(e):
            pytest.skip("kafka connector jar not available in this sandbox")
        raise
    got = {f.name for f in df.schema.fields}
    assert {"key", "value", "topic", "partition", "offset"} <= got


# ---------------------------------------------------------------------------
# S6 MongoDB wrappers — same brokerless strategy as the Kafka surface:
# the option builder is pure and asserted against the reference's
# hardcoded sink (consumer.scala:176-181); save()/start() need the
# mongo-spark connector jar + a live mongod.
# ---------------------------------------------------------------------------


def test_mongodb_sink_options_match_reference_surface():
    from twitter_kafka_etl_spark.io import mongodb_sink_options

    batch = mongodb_sink_options(
        "mongodb://localhost:27017", "twitter_db", "tweets"
    )
    assert batch == {
        "connection.uri": "mongodb://localhost:27017",
        "database": "twitter_db",
        "collection": "tweets",
    }
    streaming = mongodb_sink_options(
        "mongodb+srv://cluster0.example.net", "twitter_db", "tweets", "/ckpt"
    )
    assert streaming["checkpointLocation"] == "/ckpt"


def test_mongodb_sink_options_validate():
    import pytest

    from twitter_kafka_etl_spark.io import mongodb_sink_options

    with pytest.raises(ValueError, match="connection_uri"):
        mongodb_sink_options("", "db", "coll")
    with pytest.raises(ValueError, match="mongodb://"):
        mongodb_sink_options("http://not-mongo", "db", "coll")
    with pytest.raises(ValueError, match="database"):
        mongodb_sink_options("mongodb://h:27017", "", "coll")
    with pytest.raises(ValueError, match="database"):
        mongodb_sink_options("mongodb://h:27017", "db", "")
    with pytest.raises(ValueError, match="checkpoint"):
        mongodb_sink_options("mongodb://h:27017", "db", "coll", "")


def test_mongodb_batch_write_plumbs_through_external_writer(spark, sf_dir):
    """write_mongodb reaches the connector's save(); without the jar the
    failure is the data-source lookup — proving the option surface and
    writer wiring are correct up to the external dependency."""
    import pytest

    from twitter_kafka_etl_spark.io import read_table, write_mongodb

    ev = read_table(spark, sf_dir, "events").limit(5)
    try:
        write_mongodb(ev, "mongodb://localhost:27017", "db", "coll")
    except Exception as e:  # noqa: BLE001 — connector jar not deployed
        if "Failed to find data source" in str(e) or "DATA_SOURCE_NOT_FOUND" in str(e):
            pytest.skip("mongo-spark connector jar not available in this sandbox")
        raise


def test_kafka_batch_options_bounded_offsets():
    import pytest

    from twitter_kafka_etl_spark.io import kafka_batch_options

    opts = kafka_batch_options("b:9092", "tweets")
    assert opts == {
        "kafka.bootstrap.servers": "b:9092",
        "subscribe": "tweets",
        "startingOffsets": "earliest",
        "endingOffsets": "latest",
    }
    # a batch read from 'latest' is empty by construction: reject early
    with pytest.raises(ValueError, match="latest"):
        kafka_batch_options("b:9092", "tweets", starting_offsets="latest")
    with pytest.raises(ValueError, match="bootstrap"):
        kafka_batch_options("", "tweets")
    # explicit per-partition offset maps pass through untouched
    m = kafka_batch_options(
        "b:9092", "t", '{"t":{"0":23}}', '{"t":{"0":99}}'
    )
    assert m["startingOffsets"] == '{"t":{"0":23}}'
    assert m["endingOffsets"] == '{"t":{"0":99}}'


def test_rewrite_zordered_clusters_in_both_dims(spark, sf_dir, tmp_path):
    """Z-order clustering: per-file bounding boxes in the 2-D key space
    must be small in BOTH dimensions (a single-column sort only tightens
    one), so conjunctive filters skip files on every clustered column."""
    import glob

    import pyarrow.parquet as pq

    from twitter_kafka_etl_spark.layout import rewrite_zordered

    ev = read_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    ev.repartition(8).write.parquet(src)
    out = str(tmp_path / "zorder")
    rewrite_zordered(spark, src, out, ["user_id", "value"], n_files=8)

    g = {
        "u": (
            ev.agg(F.min("user_id"), F.max("user_id")).first()
        ),
        "v": (ev.agg(F.min("value"), F.max("value")).first()),
    }
    u_span = g["u"][1] - g["u"][0] or 1
    v_span = g["v"][1] - g["v"][0] or 1
    areas = []
    n_rows = 0
    for f in glob.glob(f"{out}/*.parquet"):
        t = pq.read_table(f, columns=["user_id", "value"])
        u = t.column("user_id").to_pylist()
        v = t.column("value").to_pylist()
        n_rows += len(u)
        if u:
            areas.append(
                ((max(u) - min(u)) / u_span) * ((max(v) - min(v)) / v_span)
            )
    assert n_rows == ev.count()
    assert len(areas) > 2
    # each file covers the full [0,1]^2 box under a random layout (area
    # ~1.0) and a full-height stripe under a 1-D sort; the z-curve must
    # do strictly better than stripes on average
    assert sum(areas) / len(areas) < 0.6, areas
