"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query — the reference's serving-layer
  aggregate (consumer.scala:157-188) over sf0.001 events.
- ``queries()`` / ``oracle_sql()``: one entry per implemented operator
  from SURVEY.md §2.12, sourced from the engine's query catalog
  (twitter_kafka_etl_spark/plans/catalog.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from twitter_kafka_etl_spark.io import read_table
from twitter_kafka_etl_spark.pipeline import enrich_rule_based, topic_aggregates
from twitter_kafka_etl_spark.plans import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: enrich events with sentiment/emotion labels, then the
    reference's two-branch aggregate (positivity rate ⋈ emotion pivot)."""
    events = read_table(spark, "/root/testdata/sf0.001", "events")
    enriched = enrich_rule_based(
        events.withColumnRenamed("event_type", "topic")
    )
    return topic_aggregates(enriched)


# Queries whose Spark plan was rewritten in the named round AFTER their
# last driver verification: the driver has never hashed the new plan, so
# they jump the rotation queue until a driver check at-or-after the
# rewrite round lands.
#
# DO NOT hand-add per-query entries here. Since r10, rewrites are
# declared at the OPERATOR level in _REWRITTEN_OPS below and expanded
# to consumer queries mechanically — see _effective_rewritten(). This
# dict exists only for the (rare) case the impact graph cannot express:
# a semantic change with no touched engine function or oracle constant
# (none so far). The r7–r9 hand-maintained history that used to live
# here became dead weight once every entry's round was ≤ its latest
# driver green (r10 verdict process nit); see git history for the
# entries and their rationales.
_REWRITTEN_IN: dict[str, int] = {}

# Rewrites declared at the OPERATOR level, expanded to the registered
# consumers mechanically by the package reference graph
# (twitter_kafka_etl_spark/plans/impact.py) — replaces the hand scan
# for "every registered consumer that EMBEDS the touched subtree"
# that r9's review had to derive manually (r9 verdict finding #2; the
# advisor caught the x66 it missed). Targets may be engine functions
# OR module-level oracle constants (shared SQL CTEs are graph nodes
# too). A typo'd target raises loudly at expansion time and the unit
# tests exercise the expansion, so a bookkeeping slip can no longer
# silently starve a consumer of re-verification. Entries become dead
# weight once every expanded consumer's latest driver green is ≥ the
# entry's round; dead entries may be deleted (git history keeps the
# record — the r10 batch was removed in r11 after CORRECTNESS_r10
# hashed all six consumers green).
_REWRITTEN_OPS: dict[str, int] = {
    # (r11 entries pruned: every expanded consumer re-hashed green in
    # CORRECTNESS_r11 — see git history.)
    #
    # r12: the four state-heavy ingest folds compact their __b=
    # side-state partitions every N committed batches
    # (streaming/side_state.py — checksum-gated size-tiered snapshots
    # with an intent-journal swap; kills the +9-10 ms/batch listing
    # growth the r11 100-batch probe isolated). Never triggers at the
    # 4-batch oracle schedule, but the fold internals changed
    # post-check; qs15 additionally converted its raw/cells appends to
    # replay-idempotent per-batch overwrite partitions (its serve-time
    # read shape changed).
    "streaming.side_state.maybe_compact": 12,
    # r12: plan-capture seam for the PLANS.md streaming sections —
    # _run_to_sink taps the per-trigger plan and the three ingest
    # callbacks tap their inner frames when $SPARK_GRAFT_PLAN_TAP is
    # set (no-op otherwise; default-path plans unchanged, but the
    # builder internals moved post-check)
    "streaming.queries._run_to_sink": 12,
    # r13: qs10 gained an inner-frame tap for its PLANS.md section
    # (no-op on the default path, but the builder changed post-check)
    "streaming.queries._tap_frame": 13,
    # r12: footer walk consolidated into side_state._dir_stats
    # (consumers qs12/qs14 — already fronted via maybe_compact, listed
    # for bookkeeping precision)
    "streaming.queries._rows_in": 12,
    # r13: compaction-swap durability fences (r12 advice) — _recover
    # re-verifies the INSTALLED snapshot before any trash deletion and
    # fsyncs the table root around each destructive step; _rollback
    # fsyncs after restoring sources. Recovery-path only (the happy
    # path still never triggers at the 4-batch oracle schedule), but
    # the fold internals changed post-check.
    "streaming.side_state._recover": 13,
    # r13: manifest (rename-free, object-store) visibility mode —
    # maybe_compact dispatches on the table's visibility primitive,
    # the four ingest folds' side-table reads went through read_side
    # and their writes gained register_batch publishes, and _rows_in
    # counts live partitions only. Default-path (listing-visible)
    # plans unchanged, but every touched fold re-verifies.
    "streaming.side_state.maybe_compact": 13,
    "streaming.side_state.read_side": 13,
    "streaming.queries._rows_in": 13,
    # r13 OPTIMIZATION round: shared working sets are now FULLY
    # materialized at build time (plan_memo count + eager_persist —
    # kills the concurrent-AQE-consumer cache stampede that re-ran the
    # build lineage once per racer). Consumer plans and values are
    # unchanged by design, but the fold internals of every pinning
    # operator changed post-check, so the consumers re-verify.
    "operators._cache.plan_memo": 13,
    "operators._cache.eager_persist": 13,
    # r13: connected_components carries a coalesce VIEW of the edge
    # checkpoint instead of a second eager checkpoint, and the label
    # seed checkpoint went lazy — the registered consumers' lineage
    # shape changed (same values, test-asserted).
    "operators.dedup.connected_components": 13,
    # r13: x98's collapse/signature/simhash pins went eager (same
    # stampede fix, checkpoint flavor).
    "operators.dedup.dedup_method_agreement": 13,
    # r13: qs6's per-key emission path rewritten (template-copy frames,
    # ndarray sums) — same emitted values, Python internals changed.
    "streaming.stateful.running_user_totals": 13,
    # r13: x59 computes both evaluation arms ONCE (full-outer join +
    # single aggregate replaces the three-aggregate crossJoin) — the
    # registered plan changed shape.
    "plans.extensions.x59": 13,
    # r13: qs2's sink repartition is (date, hour) at an explicit
    # uncoalescible width — the per-trigger sink plan changed.
    "streaming.queries.qs2": 13,
}
# NOT registered: _order_files' numeric-aware sort — for every staging
# the committed queries produce (≤10 single-digit "__f=N" dirs) the
# numeric and lexicographic orders are identical, so no registered
# plan changed; the divergence is only reachable at probe batch
# counts (>10 files).


def _effective_rewritten() -> dict[str, int]:
    """Manual per-query entries ∪ the mechanical expansion of
    ``_REWRITTEN_OPS`` (max round wins on overlap)."""
    from twitter_kafka_etl_spark.plans.impact import rewritten_queries

    out = dict(_REWRITTEN_IN)
    for name, rnd in rewritten_queries(_REWRITTEN_OPS).items():
        out[name] = max(out.get(name, 0), rnd)
    return out


def _latest_green(history_dir: str | None = None) -> dict[str, int]:
    """Latest round each query went green in the driver's correctness
    files (``CORRECTNESS_r*.json``). Missing/never-checked → round 0.

    A row counts as green when rows+schema match and hash_match is not
    an explicit False (hash-less rows-only checks still count as that
    round's verification — the driver records them for non-SQL ops).
    """
    import glob
    import json
    import re

    base = history_dir or os.path.dirname(os.path.abspath(__file__))
    latest: dict[str, int] = {}
    for path in glob.glob(os.path.join(base, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path, encoding="utf-8") as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue  # valid JSON but not a correctness map — skip it
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            green = (
                row.get("rows_match") is True
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
            )
            if green:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def _rotation_order(
    names,
    latest_green: dict[str, int],
    rewritten_in: dict[str, int] | None = None,
) -> list[str]:
    """Emission order for the driver's per-round correctness pass.

    The driver caps its file at exactly 50 entries in emission order,
    so ordering IS the verification window. Rule (oldest debt first):

    1. Queries rewritten since their last driver check (their recorded
       green predates the plan now in the repo) — the driver must hash
       the new plan before anything else re-verifies.
    2. Everything else by latest-green round ascending (never-checked
       sorts as round 0, i.e. first), tie-broken by name for a stable,
       diffable window.
    """
    # default to the FULL effective map (manual ∪ operator-level
    # expansion): now that _REWRITTEN_IN is empty by policy, falling
    # back to it would silently disable stale-rewrite fronting for any
    # caller that omits the argument (r11 review finding)
    rewritten = (
        rewritten_in if rewritten_in is not None else _effective_rewritten()
    )

    def key(name: str) -> tuple[int, int, str]:
        green = latest_green.get(name, 0)
        stale_rewrite = rewritten.get(name, 0) > green
        return (0 if stale_rewrite else 1, green, name)

    return sorted(names, key=key)


def _ordered() -> list[str]:
    return _rotation_order(REGISTRY, _latest_green(), _effective_rewritten())


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented query/operator (SURVEY.md §2.12)."""
    return {name: REGISTRY[name].build for name in _ordered()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query in ``queries()``."""
    return {
        name: REGISTRY[name].oracle for name in _ordered()
        if REGISTRY[name].oracle is not None
    }
