#!/usr/bin/env python
"""Run every registered query against the DuckDB oracle and report.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from twitter_kafka_etl_spark.plans import REGISTRY
from twitter_kafka_etl_spark.plans.oracle import compare, duckdb_connection
from twitter_kafka_etl_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb_connection(sf_dir)
    failed = []
    for name, spec in sorted(REGISTRY.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = spec.build(spark, sf_dir)
            if spec.oracle is None:
                n = df.count()
                print(f"  ~ {name}: rows-only ({n} rows) [{time.time()-t0:.1f}s]")
                continue
            ok, msg = compare(df, con, spec.oracle)
            status = "PASS" if ok else "FAIL"
            print(f"  {status} {name}: {msg} [{time.time()-t0:.1f}s]")
            if not ok:
                failed.append(name)
        except Exception as e:  # noqa: BLE001
            print(f"  ERROR {name}: {type(e).__name__}: {e}")
            failed.append(name)
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
