#!/usr/bin/env python
"""Per-trigger durationMs breakdown for the streaming queries.

Drives the REGISTERED builders and prints, for every micro-batch,
Structured Streaming's own progress metrics (triggerExecution,
queryPlanning, getBatch, latestOffset, walCommit, commitOffsets,
addBatch) plus the wall gap between consecutive triggers — the tool
that located the r14 finding that the inter-batch "trigger gap" is
gone (±30 ms) and all remaining fold cost sits inside addBatch.

The folds run on a pinned CLONE session (queries._pinned_session)
whose StreamingQueryManager is separate from the parent's, so the
listener must be attached to the clone — a parent-session
addListener never fires for these queries; this script patches the
clone factory to do that.

Usage: python scripts/probe_trigger.py [sf_dir] [query_prefix ...]
(defaults: /root/testdata/sf0.1, qs14 qs17). Numbers are single cold
runs — use them for the per-trigger STRUCTURE, not for A/B timing
(bench.py is the timing tool).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.streaming import StreamingQueryListener

from twitter_kafka_etl_spark.session import get_spark

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
names = sys.argv[2:] or ["qs14", "qs17"]

events: list[tuple] = []


class _Capture(StreamingQueryListener):
    def onQueryStarted(self, e):
        events.append(("start", time.time(), None))

    def onQueryProgress(self, e):
        p = e.progress
        events.append(
            (
                "progress",
                time.time(),
                {
                    "batchId": p.batchId,
                    "durationMs": dict(p.durationMs),
                    "numInputRows": p.numInputRows,
                },
            )
        )

    def onQueryIdle(self, e):
        pass

    def onQueryTerminated(self, e):
        events.append(("end", time.time(), None))


spark = get_spark("probe-trigger")
spark.streams.addListener(_Capture())

import twitter_kafka_etl_spark.streaming.queries as SQ  # noqa: E402

_orig_pin = SQ._pinned_session


def _patched(sp, n):
    s = _orig_pin(sp, n)
    s.streams.addListener(_Capture())
    return s


SQ._pinned_session = _patched

from twitter_kafka_etl_spark.plans import REGISTRY  # noqa: E402

for short in names:
    full = sorted(
        n for n in REGISTRY if n == short or n.startswith(short + "_")
    )[0]
    events.clear()
    t0 = time.time()
    df = REGISTRY[full].build(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    time.sleep(0.5)  # let the listener thread drain
    print(f"\n=== {full}: wall {wall:.2f}s ===")
    prev_end = None
    for kind, ts, payload in list(events):
        if kind != "progress":
            print(f"  [{kind}] t={ts - t0:.3f}")
            prev_end = ts if kind == "start" else prev_end
            continue
        d = payload["durationMs"]
        trig = d.get("triggerExecution", 0)
        start_of_batch = ts - trig / 1000.0
        gap = (start_of_batch - prev_end) if prev_end else 0.0
        prev_end = ts
        print(
            f"  batch {payload['batchId']}: rows={payload['numInputRows']}"
            f" gap_before={gap * 1000:.0f}ms {json.dumps(d)}"
        )
