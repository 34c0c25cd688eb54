"""Declared query plans (SURVEY.md §2.12) + LLM-pipeline extensions."""

from twitter_kafka_etl_spark.plans.catalog import REGISTRY, QuerySpec

__all__ = ["REGISTRY", "QuerySpec"]
