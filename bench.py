#!/usr/bin/env python
"""Benchmark harness: run the declared query set and emit one JSON line.

Reads ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``. Each query is built and fully executed
(count + a cheap checksum action via ``write.format('noop')``-equivalent
collect-less action). Prints:

    {"metric": "total_query_sec", "value": N, "unit": "sec",
     "queries": {"q01_...": sec, ...}, "sf": 0.1}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from twitter_kafka_etl_spark.plans import REGISTRY
from twitter_kafka_etl_spark.session import get_spark


def run_one(spark, spec, sf_dir: str) -> float:
    t0 = time.perf_counter()
    df = spec.build(spark, sf_dir)
    # Execute the full plan without shipping rows to the driver:
    # a count over the materialized result forces every operator.
    df.count()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("tkes-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup on a trivial action so q01 doesn't pay startup
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name, spec in sorted(REGISTRY.items()):
        try:
            timings[name] = round(run_one(spark, spec, sf_dir), 4)
        except Exception as e:  # noqa: BLE001
            print(f"bench error {name}: {e}", file=sys.stderr)
            timings[name] = -1.0
    total = round(sum(t for t in timings.values() if t >= 0), 4)
    print(json.dumps({
        "metric": "total_query_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
