"""Custom stateful streaming operators (T8: arbitrary state).

``applyInPandasWithState`` is the engine's escape hatch for semantics the
built-in windowed aggregations can't express — running counters, custom
sessionization, online sketches. State lives in the state store (per key,
spilled/checkpointed); *bounded* state additionally requires eviction:
on an unbounded key space (user ids at 100 TB/day) a NoTimeout operator
grows the store forever. Every stateful operator here therefore carries
an event-time TTL: a key idle past the TTL (by watermark time) is
evicted, mirroring the watermark discipline of the windowed layer.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = (
    "user_id bigint, total_events bigint, total_value double, last_ts timestamp"
)
STATE_SCHEMA = "cnt bigint, val double"

_UNIT_MS = {
    "second": 1_000,
    "minute": 60_000,
    "hour": 3_600_000,
    "day": 86_400_000,
}


def duration_ms(spec: str) -> int:
    """'30 days' / '1 hour' → milliseconds (the same unit grammar the
    watermark APIs use, for the subset the engine needs)."""
    n, unit = spec.split()
    return int(float(n) * _UNIT_MS[unit.rstrip("s")])


def _make_update(ttl_ms: int):
    # one-row output template, built ONCE from the first emission's
    # inferred dtypes and then copy-and-assigned per key: this function
    # runs once per user per micro-batch, and the generic
    # pd.DataFrame({col: [v]}) constructor costs ~420 µs/row vs ~140 µs
    # for template.copy() + .iat writes (measured) — at 10k keys/batch
    # that is seconds of Python-worker time per batch the JVM spends
    # blocked on (guide §4.2: the per-row Python work IS the stage).
    tmpl: list = [None]

    def _update_running(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Per-user running (count, sum(value)) across micro-batches.

        Emits one snapshot per batch the user appears in. The timeout
        timestamp slides to last-seen-event-time + TTL on every data
        batch; when the watermark passes it (user idle for TTL of event
        time) the state is evicted silently — a reappearing user starts
        a fresh total, exactly the bounded-state semantics a 100 TB/day
        key space needs.
        """
        if state.hasTimedOut:
            state.remove()
            return
        cnt, val = state.get if state.exists else (0, 0.0)
        last_ts = None
        for pdf in pdfs:
            cnt += len(pdf)
            # nansum, not ndarray.sum: a nullable 'value' column arrives
            # as float64 with NaN, and ndarray.sum would poison the
            # persisted running total forever after one null row —
            # Series.sum's skipna=True semantics (the original form)
            # must survive the vectorized rewrite (r13 advice)
            val += float(np.nansum(pdf["value"].values))
            m = pdf["ts"].max()  # pandas max keeps tz-awareness exact
            last_ts = m if last_ts is None else max(last_ts, m)
        state.update((cnt, val))
        # event-time TTL: evict when the watermark passes last-seen+TTL.
        # Anchoring to the data's own timestamps (not the current
        # watermark) keeps the TTL meaningful in the first batches,
        # where the watermark is still the epoch.
        state.setTimeoutTimestamp(int(last_ts.value // 1_000_000) + ttl_ms)
        if tmpl[0] is None:
            # first key: infer exact dtypes (incl. ts tz-awareness)
            # with the generic constructor, keep as the template
            out = pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "total_events": [cnt],
                    "total_value": [val],
                    "last_ts": [last_ts],
                }
            )
            tmpl[0] = out
            yield out.copy()
            return
        out = tmpl[0].copy()
        out.iat[0, 0] = key[0]
        out.iat[0, 1] = cnt
        out.iat[0, 2] = val
        out.iat[0, 3] = last_ts
        yield out

    return _update_running


def running_user_totals(
    stream_df: DataFrame,
    ts_col: str = "ts",
    watermark: str = "1 day",
    ttl: str = "30 days",
) -> DataFrame:
    """Streaming running totals per user — emits the updated
    (total, last event time) snapshot every micro-batch the user appears
    in (append-mode emission so file sinks work). Input needs
    (user_id, value, ts).

    State is bounded: users idle for ``ttl`` of event time (measured by
    the stream's watermark, declared with ``watermark`` delay) are
    evicted from the state store. ``ttl`` must be >= the watermark delay
    or surviving rows could try to set a timeout at/below the watermark.

    The *last* snapshot per user is the one with max ``last_ts`` (ties
    broken by ``total_events``) — selecting max(total_value) instead
    would return a mid-stream peak when values can be negative, and
    max(total_events) a pre-eviction total.
    """
    ttl_ms = duration_ms(ttl)
    if ttl_ms < duration_ms(watermark):
        raise ValueError(
            f"ttl ({ttl}) must be >= the watermark delay ({watermark})"
        )
    from twitter_kafka_etl_spark.streaming.windows import _event_time

    return (
        _event_time(stream_df, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update(ttl_ms),
            outputStructType=RUNNING_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
