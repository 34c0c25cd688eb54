"""Local DuckDB-oracle comparison harness.

Mirrors the driver's t2 gate (FIXTURES.md §3 canonicalization): sort
columns lexicographically, sort rows by all columns (nulls first), round
doubles to 6 dp, timestamps → UTC ISO-8601, then hash-compare.

Used by tests/ and scripts/check_oracle.py so mismatches surface locally
before the driver runs.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import math

import duckdb

from twitter_kafka_etl_spark.io import TABLES

CANON_DIGITS = 6


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Connection with the synthetic tables registered as views,
    matching the driver's pre-registration."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_value(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, CANON_DIGITS)
        return 0.0 if r == 0 else r  # collapse -0.0
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    if isinstance(v, _dt.timedelta):
        return v.total_seconds()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return _canon_value(float(v))
    except ImportError:  # pragma: no cover
        pass
    return v


def _sort_key(row):
    # nulls first, then by type-stable repr
    return tuple((v is not None, str(v)) for v in row)


def canonicalize(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    out.sort(key=_sort_key)
    return out


def result_hash(columns: list[str], rows: list[tuple]) -> str:
    canon = canonicalize(columns, rows)
    h = hashlib.sha256()
    h.update(("|".join(sorted(columns))).encode())
    for row in canon:
        h.update(repr(row).encode())
    return h.hexdigest()


def compare(
    spark_df, con: duckdb.DuckDBPyConnection, sql: str
) -> tuple[bool, str]:
    """Run both sides, canonicalize, diff. Returns (ok, message)."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.execute(sql)
    d_cols = [d[0] for d in rel.description]
    d_rows = rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    sc = canonicalize(s_cols, s_rows)
    dc = canonicalize(d_cols, d_rows)
    if sc != dc:
        diffs = [
            f"  row {i}: spark={a} duckdb={b}"
            for i, (a, b) in enumerate(zip(sc, dc))
            if a != b
        ][:5]
        return False, "value mismatch:\n" + "\n".join(diffs)
    return True, f"ok ({len(s_rows)} rows)"
