"""Declared query plans (SURVEY.md §2.12) + LLM-pipeline extensions."""

from twitter_kafka_etl_spark.plans.catalog import REGISTRY, QuerySpec
from twitter_kafka_etl_spark.plans import extensions as _extensions  # noqa: F401 — registers x* queries
from twitter_kafka_etl_spark.streaming import queries as _streaming  # noqa: F401 — registers qs* queries

__all__ = ["REGISTRY", "QuerySpec"]
