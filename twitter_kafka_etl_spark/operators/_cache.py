"""Session-scoped memoization of persisted derived DataFrames.

Several operator families derive the same expensive working set from
the same input plan — the MinHash family (x02/x03/x25/x36/x46/x59/x60/
x63/x65) all start from ``shingle(docs)`` → ``minhash_signatures``,
and the cluster-then-score family (x66/x67) both start from
``ivf_assign``. Within one driver/correctness session those queries
run back-to-back over identical inputs, so rebuilding (and separately
persisting) the identical working set per query is pure waste — the
round-4 verdict flagged both the duplicated shingle pass (x59 pays the
interpreter-bound HOF build twice) and the doubled IVF persist.

``plan_memo`` keys a persisted derived frame on the *input plan's*
``semanticHash()`` plus a tag, so textually-identical rebuilds of the
same source (each registry query constructs ``read_table(...)`` fresh)
hit the same entry. Entries are bounded and unpersisted on eviction.
A hit whose blocks were evicted externally (``spark.catalog
.clearCache()`` — bench.py isolates queries this way) is detected via
``storageLevel`` and simply re-persisted: the memo then degrades to
exactly the old per-query persist behavior, never worse.

Scale note: this is driver-side plan bookkeeping only — nothing here
collects data. At 100 TB the persisted working sets themselves are the
usual candidates for explicit parquet staging instead of block-manager
caching; the memo's contract (build once, feed every consumer) is the
same either way.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_MEMO: dict[tuple, DataFrame] = {}
#: entries are few and small (signature/assignment tables), but bound
#: the memo anyway so a long exploratory session can't accumulate
#: unbounded pinned lineages
_MEMO_MAX = 6


def peek_memo(source: DataFrame, tag: tuple) -> DataFrame | None:
    """Return the memoized frame for (source, tag) if one exists,
    WITHOUT building or persisting anything on a miss — for consumers
    that can use a shared working set when present but shouldn't pay
    its materialization when they are the only consumer (a single
    groupBy over the shingle table doesn't warrant pinning it)."""
    try:
        key = (source.sparkSession, source.semanticHash(), *tag)
    except Exception:
        return None
    hit = _MEMO.get(key)
    if hit is not None:
        lvl = hit.storageLevel
        if not (lvl.useMemory or lvl.useDisk):
            hit.persist(StorageLevel.MEMORY_AND_DISK)
    return hit


def plan_memo(
    source: DataFrame, tag: tuple, build: Callable[[], DataFrame]
) -> DataFrame:
    """Return a persisted ``build()`` result memoized on
    ``(session, source.semanticHash(), *tag)``.

    ``build`` must derive its result from ``source`` alone (plus the
    parameters captured in ``tag``) — the tag is the cache-correctness
    contract, exactly like a cache key's closure.
    """
    try:
        key = (source.sparkSession, source.semanticHash(), *tag)
    except Exception:  # semanticHash is a developer API — degrade to no memo
        key = None
    if key is not None:
        hit = _MEMO.get(key)
        if hit is not None:
            lvl = hit.storageLevel
            if not (lvl.useMemory or lvl.useDisk):
                hit.persist(StorageLevel.MEMORY_AND_DISK)
            return hit
    out = build().persist(StorageLevel.MEMORY_AND_DISK)
    if key is not None:
        while len(_MEMO) >= _MEMO_MAX:
            old = _MEMO.pop(next(iter(_MEMO)))
            try:
                old.unpersist()
            except Exception:
                pass
        _MEMO[key] = out
    return out
