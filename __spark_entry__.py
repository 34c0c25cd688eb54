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
# rewrite round lands. Historical entries (≤ r9) are per-query, as
# maintained by hand at the time; from r10 on, rewrites are declared at
# the operator level in _REWRITTEN_OPS below and expanded to consumers
# mechanically — see _effective_rewritten().
_REWRITTEN_IN: dict[str, int] = {
    "x98_dedup_method_agreement": 7,  # collapse-on-md5 rewrite (r7)
    # r7 bloom pre-probe + exact confirm; r8 side-file-before-append
    # ordering; r9 NULL-sentinel rewrite of the embedded bloom_build
    # subtree (r9 advisor finding — the sentinel change landed after
    # their r8 driver checks)
    "qs14_stream_novelty": 9,
    "qs12_stream_incremental_dedup": 9,
    # r8 collapsed-pair-form refactor (expand=False) restructured the
    # shared internals of the four pair families after their last
    # driver checks (r6/r6/r6/r5); r9 adds the expand/collapse_exact
    # conflict guard on the same entry points
    "x03_dedup_minhash_lsh_pairs": 9,
    "x05_dedup_simhash_pairs": 9,
    "x06_dedup_ngram_jaccard": 9,
    "x77_containment_pairs": 9,
    # ... and every registered consumer that EMBEDS those subtrees and
    # whose last green predates the refactor (transitive scan over the
    # dedup module, r9 review finding): direct pair-fn callers checked
    # r7, plus the r6-checked wrappers that fell outside the r9 window
    "x25_dedup_components": 9,
    "x46_dedup_jaccard_estimate": 9,
    "x59_lsh_eval": 9,
    "x60_nearest_duplicate": 9,
    "x63_pair_graph_degree": 9,
    "x65_split_leakage": 9,
    "x91_cross_source_leakage": 9,
    "x99_dedup_source_yield": 9,
    # r9 (late): the _pin_lazy reuse guard replaced the unconditional
    # lazy checkpoint in the expand=False and auto-probe branches of
    # minhash_lsh_pairs/simhash_pairs (plan-neutral for queries, which
    # never pre-pin, but internals changed post-check). All default-
    # branch callers above are already flagged 9; these two were green
    # at r8 and embed the touched branches (x73 default probe, x102
    # expand=False)
    "x73_edit_distance_verify": 9,
    "x102_pair_collapsed_form": 9,
    # r9 (late): packing_stats' n_seqs/fill_rate redefined to the
    # stream model — ceil(total/budget) compute units — on BOTH
    # engines (the distinct-seq-id rule let fill_rate exceed 1 when a
    # doc outspans the budget); the driver has only hashed the old
    # semantics
    "x93_packing_stats": 9,
    # r9 (late): zero-norm guards on the cosine surface — zero vectors
    # NaN-ranked first in top-k/pairs/prototype/separation windows —
    # plus the count-reuse in cosine_pairs' path pick; oracles mirrored
    "x07_dedup_embedding_cosine": 9,
    "x08_sim_topk_bruteforce": 9,
    "x09_sim_ann_lsh": 9,
    # (x16/x67's r9 entries superseded by their r10 ones below)
    "x97_embedding_separation": 9,
    # r9 (late): sketch keys hash through a NULL sentinel on both
    # engines (md5(NULL) silently dropped NULL keys from builds and
    # probes); heavy_hitters candidates now pre-filter map-side
    # against the broadcast cell map (no full-cardinality distinct,
    # no NULL-dropping semi join) — qs15's serve path shares it
    "x19_sketch_countmin": 9,
    "x20_sketch_countmin_estimate": 9,
    "x26_sketch_hll": 9,
    "x33_sketch_bloom": 9,
    # (x52's r9 entry superseded by its r10 one below)
    "x58_hll_merge": 9,
    "x61_hll_accuracy": 9,
    # (qs15's r9 entry superseded by the r10 _REWRITTEN_OPS expansion)
}

# Rewrites declared at the OPERATOR level, expanded to the registered
# consumers mechanically by the package reference graph
# (twitter_kafka_etl_spark/plans/impact.py) — replaces the hand scan
# for "every registered consumer that EMBEDS the touched subtree"
# that r9's review had to derive manually (r9 verdict finding #2; the
# advisor caught the x66 it missed). Targets may be engine functions
# OR module-level oracle constants (shared SQL CTEs are graph nodes
# too). A typo'd target raises loudly at expansion time and the unit
# tests exercise the expansion, so a bookkeeping slip can no longer
# silently starve a consumer of re-verification.
_REWRITTEN_OPS: dict[str, int] = {
    # r10: IVF centroid stride now computed from the zero-norm-FILTERED
    # count on the engine side (r9 advisor medium) → x16/x66/x67
    "operators.similarity.ivf_assign": 10,
    "operators.similarity.topk_ivf": 10,
    # r10: the shared x66/x67 oracle CTE filters zero-norm rows at the
    # source to match (r9 advisor low) → x66/x67
    "plans.extensions._IVF_ASSIGN_CTE": 10,
    # r10: heavy_hitters_from_sketch validates sketch rows against the
    # passed width/depth (loud error instead of silent mis-slotting;
    # internals changed post-check) → x52/qs15
    "operators.sketches.heavy_hitters_from_sketch": 10,
    # r10: x103 fixture grew Sub/Up-filtered PNG payloads and the
    # oracle PNG arm became filter-aware (prefix-sum reconstruction) —
    # the driver has hashed neither the 34-row fixture nor the new
    # oracle → x103
    "operators.multimodal.media_fixture_payloads": 10,
}


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
    rewritten = rewritten_in if rewritten_in is not None else _REWRITTEN_IN

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
