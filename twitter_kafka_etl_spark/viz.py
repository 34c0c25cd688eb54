"""Chart layer (E4 — streamviz/visualisation.py:14-76).

The reference melts the wide emotion counts in driver-side pandas and
hands Altair the result. Here the data shaping is a distributed Spark
plan (unpivot → per-level sums → window shares — the q18/q13/q14
surface composed), and only the tiny aggregated frame crosses the S9
Arrow boundary into the chart spec. The builders emit plain Vega-Lite
v5 spec dicts — the grammar Altair compiles to — so there is no
plotting dependency; any Vega-Lite renderer (or Altair itself) displays
them unchanged.

Parity notes vs the reference:
- ``check_string`` (visualisation.py:5-11) wraps a no-op expression in
  try/except, so invalid levels pass silently; ``emotion_long``
  validates for real and raises.
- ``get_long_emotion_df``'s percent column (visualisation.py:21)
  assigns the group TOTAL, not a share (a pandas groupby-on-Series
  slip); the evident intent — counts / level total — is what the
  charts' ``.1%`` tooltips format, so that is what we compute.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from twitter_kafka_etl_spark.io import to_pandas
from twitter_kafka_etl_spark.operators.relational import (
    share_of_total,
    unpivot_long,
)
from twitter_kafka_etl_spark.pipeline import EMOTIONS

AGG_LEVELS = ("date_hour", "date", "topic")


def emotion_long(
    df: DataFrame,
    agg_level: str,
    emotions: Sequence[str] = tuple(EMOTIONS),
) -> DataFrame:
    """Wide per-topic emotion counts → long (level, emotion, counts,
    percent) — the distributed form of get_long_emotion_df
    (visualisation.py:14-28). One narrow unpivot, one partial-agg
    shuffle on (level, emotion), one window shuffle on level."""
    if agg_level not in AGG_LEVELS:
        raise ValueError(
            f"agg_level must be one of {AGG_LEVELS}, got {agg_level!r}"
        )
    if agg_level not in df.columns:
        raise ValueError(f"frame has no {agg_level!r} column")
    missing = [e for e in emotions if e not in df.columns]
    if missing:
        raise ValueError(f"frame is missing emotion columns {missing}")
    long = unpivot_long(df, [agg_level], list(emotions), "emotion", "counts")
    summed = long.groupBy(agg_level, "emotion").agg(
        F.sum("counts").alias("counts")
    )
    return share_of_total(summed, [agg_level], "counts", "percent")


def _inline_data(df: DataFrame) -> list[dict]:
    """S9 boundary: the aggregated frame is (levels × emotions) rows —
    chart-sized by construction, never corpus-sized."""
    pdf = to_pandas(df)
    return pdf.to_dict("records")


def emotion_norm_bar_spec(df: DataFrame) -> dict:
    """Normalized horizontal stacked bar, emotions per topic
    (visualisation.py:30-41)."""
    data = _inline_data(emotion_long(df, "topic"))
    return {
        "$schema": "https://vega.github.io/schema/vega-lite/v5.json",
        "title": "Emotions per Topic - Normalized",
        "data": {"values": data},
        "mark": "bar",
        "encoding": {
            "x": {"aggregate": "sum", "field": "counts", "stack": "normalize"},
            "y": {"field": "topic", "type": "nominal"},
            "color": {"field": "emotion", "type": "nominal"},
            "tooltip": [
                {"field": "topic"},
                {"field": "emotion"},
                {"field": "percent", "type": "quantitative", "format": ".1%"},
                {"field": "counts", "aggregate": "sum"},
            ],
        },
    }


def emotion_donut_spec(df: DataFrame) -> dict:
    """Donut of total emotion counts (visualisation.py:43-52)."""
    data = _inline_data(emotion_long(df, "topic"))
    return {
        "$schema": "https://vega.github.io/schema/vega-lite/v5.json",
        "title": "Emotions - Total Count",
        "data": {"values": data},
        "mark": {"type": "arc", "innerRadius": 50},
        "encoding": {
            "theta": {"field": "counts", "type": "quantitative"},
            "color": {"field": "emotion", "type": "nominal"},
            "tooltip": [
                {"field": "topic"},
                {"field": "emotion"},
                {"field": "percent", "type": "quantitative", "format": ".1%"},
                {"field": "counts", "aggregate": "sum"},
            ],
        },
    }


def emotion_period_area_spec(
    df: DataFrame, agg_level: str, normalize: bool = False
) -> dict:
    """Stacked area of emotions over a period (visualisation.py:54-76):
    hour or day granularity, optionally share-normalized."""
    if agg_level not in ("date_hour", "date"):
        raise ValueError(
            f"period charts take 'date_hour' or 'date', got {agg_level!r}"
        )
    data = _inline_data(emotion_long(df, agg_level))
    period = "Hour" if agg_level == "date_hour" else "Day"
    how = "Normalized" if normalize else "Non-Normalized"
    return {
        "$schema": "https://vega.github.io/schema/vega-lite/v5.json",
        "title": f"Emotions per {period} - {how}",
        "data": {"values": data},
        "mark": {"type": "area", "opacity": 1 if normalize else 0.38},
        "encoding": {
            "x": {"field": agg_level, "type": "temporal"},
            "y": {
                "field": "counts",
                "type": "quantitative",
                "stack": "normalize" if normalize else "zero",
            },
            "color": {"field": "emotion", "type": "nominal"},
            "tooltip": [
                {"field": agg_level},
                {"field": "counts"},
                {"field": "emotion"},
            ],
        },
    }
