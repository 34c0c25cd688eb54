"""Custom stateful streaming operators (T8: arbitrary state).

``applyInPandasWithState`` is the engine's escape hatch for semantics the
built-in windowed aggregations can't express — running counters, custom
sessionization, online sketches. State lives in the state store (per key,
spilled/checkpointed), so memory stays bounded at any key cardinality.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = "user_id bigint, total_events bigint, total_value double"
STATE_SCHEMA = "cnt bigint, val double"


def _update_running(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user running (count, sum(value)) across micro-batches."""
    cnt, val = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        cnt += len(pdf)
        val += float(pdf["value"].sum())
    state.update((cnt, val))
    yield pd.DataFrame(
        {"user_id": [key[0]], "total_events": [cnt], "total_value": [val]}
    )


def running_user_totals(stream_df: DataFrame) -> DataFrame:
    """Streaming running totals per user — emits the updated total every
    micro-batch the user appears in (append-mode emission so file sinks
    work; each emission is the state snapshot at that batch). Input needs
    (user_id, value)."""
    return (
        stream_df.groupBy("user_id")
        .applyInPandasWithState(
            _update_running,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
