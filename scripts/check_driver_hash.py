#!/usr/bin/env python
"""Driver-fidelity comparison: catch dtype-level hash mismatches.

The in-repo oracle compare (plans/oracle.py) canonicalizes VALUES, so a
Spark bigint vs DuckDB HUGEINT→float64 mismatch passes locally but
red-flags in the round driver, whose canonicalizer hashes the pandas
frames dtype-sensitively (x48 in round 3: identical values, red row).

This script mimics the driver: toPandas both engines, sort columns
lexicographically, round float columns to 6 dp, sort rows, then demand
(a) IDENTICAL canonical dtypes and (b) identical values. Run it after
adding or changing any oracle twin.

Usage: python scripts/check_driver_hash.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import numpy as np
import pandas as pd

from twitter_kafka_etl_spark.plans import REGISTRY
from twitter_kafka_etl_spark.plans.oracle import duckdb_connection
from twitter_kafka_etl_spark.session import get_spark


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6) + 0.0  # collapse -0.0
        # tz-aware → UTC-naive, so both engines' timestamps canonicalize
        # to one dtype (the driver does the same)
        if isinstance(df[c].dtype, pd.DatetimeTZDtype):
            df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("driver-hash-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_connection(sf_dir)
    bad = []
    for name, spec in sorted(REGISTRY.items()):
        if only and name not in only:
            continue
        if spec.oracle is None:
            continue
        try:
            sp = canon(spec.build(spark, sf_dir).toPandas())
            dp = canon(con.execute(spec.oracle).df())
            issues = []
            sdt = {c: str(t) for c, t in sp.dtypes.items()}
            ddt = {c: str(t) for c, t in dp.dtypes.items()}
            if sdt != ddt:
                diff = {c: (sdt.get(c), ddt.get(c))
                        for c in set(sdt) | set(ddt) if sdt.get(c) != ddt.get(c)}
                issues.append(f"dtype mismatch: {diff}")
            if len(sp) != len(dp):
                issues.append(f"row count {len(sp)} vs {len(dp)}")
            elif not issues:
                for c in sp.columns:
                    a, b = pd.Series(sp[c].to_numpy()), pd.Series(dp[c].to_numpy())
                    if pd.api.types.is_float_dtype(sp[c]):
                        eq = np.array_equal(a.to_numpy(), b.to_numpy(), equal_nan=True)
                    else:
                        # None == None is False element-wise; NULL rollup/
                        # cube subtotal keys must still compare equal
                        eq = ((a == b) | (a.isna() & b.isna())).all()
                    if not eq:
                        issues.append(f"values differ in column {c}")
                        break
            status = "PASS" if not issues else "FAIL"
            print(f"  {status} {name}" + (f": {'; '.join(issues)}" if issues else ""))
            if issues:
                bad.append(name)
        except Exception as e:  # noqa: BLE001
            print(f"  ERR  {name}: {e}")
            bad.append(name)
    print(f"{len(bad)} driver-fidelity failures" + (f": {bad}" if bad else ""))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
