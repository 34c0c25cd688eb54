"""twitter_kafka_etl_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference Twitter→Kafka→Spark ETL pipeline (h-crawshaw/twitter-kafka-etl),
re-expressed Spark-first:

- relational operators (scan/project/filter/join/agg/pivot/unpivot/dedup/
  window/set-ops) as thin, tested wrappers over the DataFrame API
- streaming ingest with event-time windows + watermarks (replacing the
  reference's wall-clock directory windowing)
- text classification via Arrow-vectorized pandas UDFs
- LLM-data-pipeline extensions: deduplication (exact / MinHash-LSH /
  SimHash / n-gram Jaccard / embedding-cosine), similarity search,
  multimodal binary columns, text analysis

Everything is declarative DataFrame/SQL so Catalyst + Tungsten pick the
physical strategy (pushdown, pruning, broadcast, AQE, codegen).
"""

from twitter_kafka_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
