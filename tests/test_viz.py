"""E4 chart layer: distributed melt/shares + Vega-Lite spec builders
(streamviz/visualisation.py:14-76 parity, minus the Altair dependency).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from twitter_kafka_etl_spark.io import read_table
from twitter_kafka_etl_spark.pipeline import (
    EMOTIONS,
    enrich_rule_based,
    topic_aggregates,
)
from twitter_kafka_etl_spark.viz import (
    emotion_donut_spec,
    emotion_long,
    emotion_norm_bar_spec,
    emotion_period_area_spec,
)


@pytest.fixture(scope="module")
def agg(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events").withColumnRenamed(
        "event_type", "topic"
    )
    return topic_aggregates(enrich_rule_based(ev))


def test_emotion_long_shares_sum_to_one(spark, agg):
    long = emotion_long(agg, "topic")
    assert set(long.columns) == {"topic", "emotion", "counts", "percent"}
    sums = long.groupBy("topic").agg(F.round(F.sum("percent"), 9).alias("s"))
    assert all(r.s == 1.0 for r in sums.collect())
    # long total equals the wide total (melt loses nothing)
    wide_total = sum(
        agg.agg(*[F.sum(e).alias(e) for e in EMOTIONS]).first().asDict().values()
    )
    assert long.agg(F.sum("counts")).first()[0] == wide_total


def test_emotion_long_validates_inputs(spark, agg):
    with pytest.raises(ValueError, match="agg_level"):
        emotion_long(agg, "nope")
    with pytest.raises(ValueError, match="column"):
        emotion_long(agg.drop("topic"), "topic")
    with pytest.raises(ValueError, match="emotion columns"):
        emotion_long(agg.drop("joy"), "topic")


def test_chart_specs_are_json_serializable_vega_lite(spark, agg):
    bar = emotion_norm_bar_spec(agg)
    donut = emotion_donut_spec(agg)
    for spec in (bar, donut):
        assert "vega-lite/v5" in spec["$schema"]
        assert spec["data"]["values"], "chart data must be inlined"
        json.dumps(spec)  # fully serializable, no live objects
    assert bar["encoding"]["x"]["stack"] == "normalize"
    assert donut["mark"]["innerRadius"] == 50
    # chart-sized data: levels x emotions, never corpus-sized
    assert len(bar["data"]["values"]) <= 20 * len(EMOTIONS)


def test_period_area_spec_titles_and_normalize(spark, sf_dir):
    from twitter_kafka_etl_spark.functions.scalar import derive_date_hour

    ev = derive_date_hour(
        read_table(spark, sf_dir, "events"), "ts"
    ).withColumnRenamed("event_type", "topic")
    enriched = enrich_rule_based(ev)
    counts = (
        enriched.groupBy("date", "emotion")
        .count()
        .groupBy("date")
        .pivot("emotion", EMOTIONS)
        .sum("count")
        .na.fill(0)
    )
    spec = emotion_period_area_spec(counts, "date", normalize=True)
    assert spec["title"] == "Emotions per Day - Normalized"
    assert spec["encoding"]["y"]["stack"] == "normalize"
    spec2 = emotion_period_area_spec(counts, "date")
    assert spec2["mark"]["opacity"] == 0.38
    with pytest.raises(ValueError, match="period charts"):
        emotion_period_area_spec(counts, "topic")
