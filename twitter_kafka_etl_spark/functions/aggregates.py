"""Custom aggregate functions (UDAF surface, SURVEY §2.10).

The reference has no UDAFs; the engine's declared surface is Arrow-backed
``pandas_udf`` GROUPED_AGG — the idiomatic Spark route for aggregates the
built-ins can't express. Each UDAF receives the group's values as a
pandas Series over Arrow (one JVM→Python batch per group, vectorized),
and returns one scalar.

Scale notes: a grouped-agg pandas UDF has no partial-aggregation step —
every group's raw values shuffle to one task. That is inherent to
arbitrary aggregates (a median cannot be partially aggregated); keep
group cardinality high / group size bounded at 100 TB, or switch to the
built-in approx (``percentile_approx``) when an ε-error is acceptable.
Exact order statistics are engine-portable (no float-summation order
sensitivity), which is why the oracle can hash-match them exactly.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def median_agg(v: pd.Series) -> float:
    """Exact median (interpolated midpoint for even counts) — matches
    DuckDB's ``median(DOUBLE)`` bitwise: both sort exactly and average
    the two middle doubles."""
    return float(v.median())


@pandas_udf("double")
def midrange_agg(v: pd.Series) -> float:
    """(min + max) / 2 — a toy UDAF exercising the same surface with a
    trivially portable result."""
    return float((v.min() + v.max()) / 2.0)
