"""Scalar function surface (SURVEY.md §2.7, F1-F14).

Thin, composable column expressions. Everything stays JVM-side (built-in
``pyspark.sql.functions``) so whole-stage codegen applies; no Python UDFs
in this module.
"""

from twitter_kafka_etl_spark.functions.scalar import (
    construct_key,
    decode_kafka,
    derive_date_hour,
    first_element,
    json_field,
    parse_json_col,
    positivity_flag,
)

__all__ = [
    "construct_key",
    "decode_kafka",
    "derive_date_hour",
    "first_element",
    "json_field",
    "parse_json_col",
    "positivity_flag",
]
