"""Reference-shaped analytics pipeline (consumer.scala:157-188).

The reference's serving-layer computation: per-topic positivity rate +
counts (A1), per-(topic, emotion) counts pivoted wide (A2+A3), inner join
of the two branches (J1). Re-expressed as one declarative plan:

- both aggregation branches share one scan (Catalyst reuses the exchange);
- the pivot takes an explicit label list (no driver-side distinct scan —
  the reference's bare pivot at consumer.scala:170 collects distinct
  emotions to the driver, unbounded at scale);
- the tiny per-topic aggregates are broadcast for the join.

``enrich`` attaches sentiment/emotion labels. The reference uses Spark-NLP
pretrained models (consumer.scala:85,139); the engine's default backend is
a deterministic rule classifier with identical shape (text→label), and the
operators/text.py pandas-UDF backend is the pluggable real-model path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from twitter_kafka_etl_spark.functions.scalar import positivity_flag
from twitter_kafka_etl_spark.operators import relational as R

SENTIMENTS = ["positive", "negative", "neutral"]
#: label set evidenced at streamviz/wrangling.py:26-27
EMOTIONS = ["surprise", "fear", "joy", "sadness", "anger", "love"]


def enrich_rule_based(df: DataFrame, value_col: str = "value", key_col: str = "event_id") -> DataFrame:
    """Deterministic stand-in for the NLP annotators (U1/U2): assigns
    sentiment by value terciles and emotion by key modulo — same output
    shape as consumer.scala:127-128,149-154."""
    sentiment = (
        F.when(F.col(value_col) > 10, "positive")
        .when(F.col(value_col) > 3, "neutral")
        .otherwise("negative")
    )
    emotion = F.element_at(
        F.array(*[F.lit(e) for e in EMOTIONS]),
        (F.col(key_col) % len(EMOTIONS) + 1).cast("int"),
    )
    return df.withColumn("sentiment", sentiment).withColumn("emotion", emotion)


def topic_aggregates(enriched: DataFrame, topic_col: str = "topic") -> DataFrame:
    """consumer.scala:158-174 — positivity branch ⋈ emotion-pivot branch."""
    agg_sentiment = R.conditional_rate_agg(
        enriched, topic_col, positivity_flag("sentiment")
    ).withColumnRenamed(topic_col, "topic_agg")

    agg_emotion = R.pivot_explicit(
        R.count_agg(enriched, [topic_col, "emotion"], "emotion_counts"),
        topic_col, "emotion", EMOTIONS,
        F.sum("emotion_counts"),
        fill=0,
    )
    return R.join_tables(
        agg_sentiment, agg_emotion,
        on=agg_sentiment.topic_agg == agg_emotion[topic_col],
        how="inner", broadcast_right=True,
    )
