"""Compaction of the streaming ingest folds' ``__b=`` side-state tables.

The incremental ingest queries (qs12/qs14/qs15/qs17) accumulate their
cross-batch state — fingerprint indexes, shingle indexes, band indexes,
sketch cells, kept corpora — as one hive partition ``__b=<batch_id>``
per micro-batch, because per-batch OVERWRITE partitions are what makes
the folds replay-idempotent under foreachBatch's at-least-once delivery
(each table's write lands outside the checkpoint transaction; see
queries.py's qs12 ingest comment). The r11 100-batch probe isolated the
ONE growing per-batch cost term in that design: not state compute — flat
at horizon — but the file-listing/footer walk over the accumulating
partition dirs, +9–10 ms/batch at 100 dirs (SURVEY.md §6). Harmless in
every measured regime, linear-in-history in principle: at a crawl's
10k-th micro-batch the listing alone would cost ~1 s/batch.

``maybe_compact`` is the production fix: every ``every`` batches the
fold rolls its committed delta partitions into a SNAPSHOT partition
(``__b=-g`` — negative, so it can never collide with a real batch id
and never matches the folds' own-batch ``__b != batch_id`` exclusion),
bounding the live dir count. Three properties carry the design:

- **Size-tiered merging, not rewrite-everything.** Folding all history
  into one snapshot every N batches rewrites O(history) bytes each time
  — O(B²/N) total write amplification over a B-batch crawl. Instead the
  deltas always fold together, and an existing snapshot joins the merge
  only while it is no larger than ``ratio``× the rows already being
  folded (the Lucene/LSM tiered-merge rule). Each row is then rewritten
  O(log B) times total, and the live dir count stays ≤ every + O(log B)
  snapshots. Both bounds are asserted in tests.
- **Checksum-gated, x55's content-oracle pattern** (extensions.py x55:
  invariants computed FROM THE REWRITTEN FILES). The snapshot is read
  back and an invariant — by default row count plus a summed 60-bit
  md5 row fingerprint, the same ``_CK_MOD`` construction x55 uses — is
  compared against the same invariant over the input runs. A compaction
  that drops, duplicates or mangles one row aborts loudly BEFORE any
  source dir is touched; an additive merge (qs15's count-min cells)
  passes its own merge-preserved invariant instead.
- **Intent-journal crash protocol.** POSIX gives no atomic
  "delete N dirs + rename 1"; Structured Streaming's own file sink
  solves the same problem with a metadata log. Order here: (1) write
  the snapshot to a SIBLING tmp dir (outside the table root, so it is
  invisible to readers and safe to read back for the gate), (2) verify
  the checksum, (3) write a journal naming the folded dirs and the
  destination, (4) rename folded dirs into a sibling trash dir,
  (5) rename tmp → ``__b=-g``, (6) delete trash + journal. Every step
  after (3) is idempotent, so a crash anywhere is rolled FORWARD at the
  next call; a crash before (3) leaves only an orphan tmp that is
  swept. At no point is a row present zero times or twice in the
  visible listing. On object stores without atomic rename (S3), step
  (3)'s journal generalizes to the manifest the reads consult — same
  protocol, different visibility primitive.

Replay safety: only partitions with ``0 <= __b < batch_id`` are ever
folded — strictly earlier batches, which foreachBatch has already
committed to the checkpoint before batch ``batch_id`` runs. A replayed
batch therefore always finds its own leftover partition intact (still
excluded from reads, still overwritten by the re-run), and a snapshot
never absorbs rows the checkpoint might re-deliver.

Call discipline: inline compaction is for tables the fold READS every
batch (the fingerprint/shingle/band indexes and the kept corpora whose
listing cost lands on every micro-batch's plan) plus bounded-size
merge-collapsible state (qs15's count-min cells). A write-only landed
layer (qs15's raw events) gets NOTHING from an inline fold — no batch
ever lists it — and rewriting a linearly-growing corpus inline costs
real scans (+21% on qs15's 100-batch probe before the split); its
small-file maintenance is the offline x55 ``layout.compact`` job, like
any other landed table.

The default trigger (16 dirs) never fires in the 4-batch oracle
harness — the committed query plans are unchanged there — and fires ~6
times per table in the 100-batch probe, which re-measures the listing
slope with compaction live.
"""

from __future__ import annotations

import json
import math
import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: delta-dir count that triggers a fold (env-overridable; the 4-batch
#: oracle harness never reaches it, the 100-batch probe does ~6 times)
DEFAULT_EVERY = 16
#: an existing snapshot joins the merge only while its rows are <= this
#: multiple of the rows already folding (tiered-merge rule)
RATIO = 2.0
#: x55's checksum modulus — summable without overflow (n rows × <1e9)
_CK_MOD = 1_000_000_007

_JOURNAL = ".compact_journal"


def _tmp_of(path: str) -> str:
    """Snapshot staging dir — a SIBLING of the table root, not a
    dot-dir inside it: Spark reads an explicitly-given dot-path
    correctly but logs 'All paths were ignored' while doing so (the
    hidden-file filter applies to the root too), and the checksum gate
    must read the staged files back. Same parent dir → os.rename into
    the table root stays an atomic same-filesystem move."""
    return os.path.normpath(path) + ".compact_tmp"


def _trash_of(path: str) -> str:
    return os.path.normpath(path) + ".compact_trash"


def _every() -> int:
    n = int(os.environ.get("SPARK_GRAFT_SIDE_COMPACT_EVERY", DEFAULT_EVERY))
    if n < 2:
        raise ValueError(f"SPARK_GRAFT_SIDE_COMPACT_EVERY={n}: need >= 2")
    return n


def _partitions(path: str) -> dict[int, str]:
    """``__b`` value -> dir name, visible partitions only."""
    out: dict[int, str] = {}
    try:
        names = os.listdir(path)
    except OSError:
        return out
    for d in names:
        if d.startswith("__b="):
            try:
                out[int(d.split("=", 1)[1])] = d
            except ValueError:
                continue
    return out


def _dir_stats(path: str) -> tuple[int, int]:
    """(rows, bytes) of one partition dir, from parquet footers/sizes —
    the planner is never consulted, no Spark job runs."""
    import pyarrow.parquet as pq

    rows = 0
    size = 0
    for root_, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root_, f)
                rows += pq.ParquetFile(p).metadata.num_rows
                size += os.path.getsize(p)
    return rows, size


def _default_invariant(df: DataFrame) -> DataFrame:
    """Row count + summed 60-bit md5 row fingerprint mod ``_CK_MOD``
    over ALL data columns (x55's construction lifted to arbitrary
    schemas via to_json(struct(*)) — column order fixes the serialized
    form, so the same rows always hash the same)."""
    ck = (
        F.conv(
            F.substring(F.md5(F.to_json(F.struct(*df.columns))), 1, 15),
            16,
            10,
        ).cast("bigint")
        % _CK_MOD
    )
    return df.agg(
        F.count(F.lit(1)).alias("__n"),
        F.coalesce(F.sum(ck), F.lit(0)).cast("bigint").alias("__ck"),
    )


def _recover(path: str) -> None:
    """Roll an interrupted swap FORWARD (journal present — the tmp
    snapshot was verified complete before the journal was written), and
    sweep any orphan tmp from a crash before the journal existed."""
    jpath = os.path.join(path, _JOURNAL)
    if os.path.exists(jpath):
        with open(jpath, encoding="utf-8") as fh:
            j = json.load(fh)
        trash = _trash_of(path)
        os.makedirs(trash, exist_ok=True)
        for d in j["fold"]:
            src = os.path.join(path, d)
            if os.path.exists(src):
                os.rename(src, os.path.join(trash, d))
        tmp = _tmp_of(path)
        dest = os.path.join(path, j["dest"])
        if os.path.exists(tmp) and not os.path.exists(dest):
            os.rename(tmp, dest)
        shutil.rmtree(trash, ignore_errors=True)
        os.remove(jpath)
    tmp = _tmp_of(path)
    if os.path.exists(tmp):  # crashed before the journal: orphan
        shutil.rmtree(tmp, ignore_errors=True)


def maybe_compact(
    spark: SparkSession,
    path: str,
    batch_id: int,
    every: int | None = None,
    merge: Callable[[DataFrame], DataFrame] | None = None,
    invariant: Callable[[DataFrame], DataFrame] | None = None,
    target_file_mb: int = 128,
) -> bool:
    """Fold committed ``__b=`` delta partitions of ``path`` into a
    snapshot partition when ``every`` or more have accumulated; no-op
    (one listdir) otherwise. Returns True when a fold ran.

    ``merge``: optional whole-frame reduction applied to the unioned
    runs (e.g. qs15's cell-wise count-min sum). Must be idempotent over
    already-merged data. ``invariant``: 1-row aggregate preserved by
    ``merge`` (REQUIRED when merge is given — the default row-identity
    checksum is only valid for pure rewrites); computed over the input
    union and over the written snapshot files, compared exactly.
    """
    if not os.path.isdir(path):
        return False
    _recover(path)
    parts = _partitions(path)
    deltas = {b: d for b, d in parts.items() if 0 <= b < batch_id}
    if len(deltas) < (every if every is not None else _every()):
        return False
    if merge is not None and invariant is None:
        raise ValueError(
            "maybe_compact: a custom merge changes row identity — pass "
            "the merge-preserved invariant explicitly"
        )
    inv = invariant or _default_invariant

    # choose the runs: all committed deltas, plus (tiered rule) any
    # snapshot no larger than RATIO x the rows already folding —
    # smallest first, so absorbing one can qualify the next
    stats = {d: _dir_stats(os.path.join(path, d)) for d in parts.values()}
    fold = [parts[b] for b in sorted(deltas)]
    total_rows = sum(stats[d][0] for d in fold)
    snaps = sorted(
        (parts[b] for b in parts if b < 0), key=lambda d: stats[d][0]
    )
    for d in snaps:
        if stats[d][0] <= RATIO * max(total_rows, 1):
            fold.append(d)
            total_rows += stats[d][0]
    gen = 1 + max((-b for b in parts if b < 0), default=0)
    dest = f"__b=-{gen}"

    src_paths = [os.path.join(path, d) for d in fold]
    union = spark.read.parquet(*src_paths)
    out = merge(union) if merge is not None else union
    n_files = max(
        1,
        math.ceil(
            sum(stats[d][1] for d in fold) / (target_file_mb * 1024 * 1024)
        ),
    )
    tmp = _tmp_of(path)
    shutil.rmtree(tmp, ignore_errors=True)
    out.coalesce(n_files).write.mode("overwrite").parquet(tmp)

    # checksum gate BEFORE any source dir is touched, from the written
    # files (x55: a fold that drops/duplicates/mangles one row must go
    # red here, leaving the deltas exactly as they were). The expected
    # side is computed over the RAW input union — a merge-preserved
    # invariant must survive the merge, so this also catches a merge
    # that loses counts, not just a bad write.
    expect = inv(union).collect()[0]
    got = inv(spark.read.parquet(tmp)).collect()[0]
    if tuple(expect) != tuple(got):
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"side-state compaction of {path} failed its content "
            f"invariant (expected {tuple(expect)}, snapshot has "
            f"{tuple(got)}); sources left untouched"
        )

    # intent journal, then the idempotent swap (see module docstring)
    jpath = os.path.join(path, _JOURNAL)
    with open(jpath + ".tmp", "w", encoding="utf-8") as fh:
        json.dump({"fold": fold, "dest": dest}, fh)
    os.replace(jpath + ".tmp", jpath)
    _recover(path)
    return True
