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
- **Intent-journal crash protocol, power-loss safe.** POSIX gives no
  atomic "delete N dirs + rename 1"; Structured Streaming's own file
  sink solves the same problem with a metadata log. Order here:
  (1) write the snapshot to a SIBLING tmp dir (outside the table root,
  so it is invisible to readers and safe to read back for the gate),
  (2) verify the checksum, (3) fsync the snapshot tree — data pages
  durable BEFORE anything commits to installing them, (4) durably
  write a journal (tmp + fsync + atomic replace + dir fsync) naming
  the folded dirs, the destination, and the EXPECTED snapshot row
  count, (5) rename folded dirs into a sibling trash dir, (6) rename
  tmp → ``__b=-g``, (7) delete trash + journal. The journal is the
  commit point: a crash before it leaves only an orphan tmp (swept);
  a crash after it rolls FORWARD — but recovery first RE-VERIFIES the
  tmp snapshot against the journaled row count from its parquet
  footers, so even a snapshot torn by power loss (fsync bugs, disk
  cache lies) rolls the swap BACK with sources restored rather than
  installing truncated data. Every post-journal step is idempotent.
  At no point is a row present zero times or twice in the visible
  listing. On object stores without atomic rename (S3), the journal
  generalizes to the manifest the reads consult — same protocol,
  different visibility primitive.

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


def _fsync_tree(path: str) -> None:
    """fsync every file under ``path`` plus the dirs themselves, so the
    snapshot's data pages are durable BEFORE the journal that commits
    to installing it — without this, a power loss (not just a process
    crash) could persist the tiny journal but lose the just-written
    parquet pages to delayed allocation, and roll-forward would install
    a truncated snapshot (r12 review finding)."""
    for root_, dirs, files in os.walk(path, topdown=False):
        for name in files:
            fd = os.open(os.path.join(root_, name), os.O_RDONLY)
            try:
                os.fsync(fd)
            finally:
                os.close(fd)
        fd = os.open(root_, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)


def _fsync_dir(path: str) -> None:
    """fsync one directory's metadata (its entry list). The swap's
    correctness argument assumes renames become durable in program
    order; a filesystem that reorders metadata ops breaks that unless
    each destructive step is fenced behind an explicit dir fsync."""
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def _write_journal(path: str, journal: dict) -> None:
    """Durable journal write: tmp file + fsync + atomic replace + dir
    fsync. A torn journal is therefore impossible on a POSIX fs; a
    crash before the replace leaves no journal (pre-swap state)."""
    jpath = os.path.join(path, _JOURNAL)
    with open(jpath + ".tmp", "w", encoding="utf-8") as fh:
        json.dump(journal, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(jpath + ".tmp", jpath)
    _fsync_dir(path)


def _rollback(path: str) -> None:
    """Undo a partially-applied swap: restore anything already moved to
    trash, then drop the tmp snapshot and the journal. Leaves the table
    exactly as it was before the fold started."""
    trash = _trash_of(path)
    if os.path.isdir(trash):
        for d in os.listdir(trash):
            target = os.path.join(path, d)
            if not os.path.exists(target):
                os.rename(os.path.join(trash, d), target)
        shutil.rmtree(trash, ignore_errors=True)
        # restored sources durable BEFORE the journal disappears — a
        # power loss that persisted the journal removal but not the
        # restore renames would otherwise leave the table with neither
        # sources nor a journal to retry from (r12 advice)
        _fsync_dir(path)
    shutil.rmtree(_tmp_of(path), ignore_errors=True)
    jpath = os.path.join(path, _JOURNAL)
    if os.path.exists(jpath):
        os.remove(jpath)


def _recover(path: str) -> None:
    """Finish an interrupted swap. The journal names the folded dirs,
    the destination, and the EXPECTED SNAPSHOT ROW COUNT; before any
    destructive step the tmp snapshot (when still present) is
    re-verified against that count from its parquet footers — a
    snapshot torn by power loss rolls the swap BACK (sources restored
    untouched, fold retried from scratch at the next trigger) instead
    of being installed — and the same count gates the INSTALLED
    snapshot while the trash still holds the sources' last copy, so a
    dest torn after its rename is replaced from trash rather than made
    permanent by the cleanup. A journal that fails to PARSE means the
    durable-replace in _write_journal never completed, i.e. no
    destructive step ran: roll back (trash cannot exist yet). A
    parseable journal without a ``rows`` field (the pre-r12 format) is
    rolled forward under its original semantics — verification is
    simply skipped; treating it as torn would restore trash next to an
    already-installed snapshot and double every folded row. Orphan tmp
    without a journal = crash before the commit point: swept."""
    jpath = os.path.join(path, _JOURNAL)
    if os.path.exists(jpath):
        try:
            with open(jpath, encoding="utf-8") as fh:
                j = json.load(fh)
            fold, dest_name = j["fold"], j["dest"]
            rows = int(j["rows"]) if "rows" in j else None
        except (ValueError, KeyError):
            _rollback(path)
            return

        def _verified(d: str) -> bool:
            if rows is None:
                return True
            try:
                return _dir_stats(d)[0] == rows
            except Exception:  # unreadable footer = torn write
                return False

        tmp = _tmp_of(path)
        dest = os.path.join(path, dest_name)
        if not os.path.exists(tmp) and not os.path.exists(dest):
            # unreachable by any crash schedule (tmp is only removed
            # after the rename or by rollback, which also removes the
            # journal) — but if it ever occurs, rolling forward would
            # delete sources with no snapshot; restore instead
            _rollback(path)
            return
        if os.path.exists(tmp) and not os.path.exists(dest):
            if not _verified(tmp):
                _rollback(path)
                return
        # commit point passed and the staged snapshot verified: roll
        # forward. The INSTALLED snapshot is re-verified below, after
        # the rename and before any trash deletion.
        trash = _trash_of(path)
        os.makedirs(trash, exist_ok=True)
        for d in fold:
            src = os.path.join(path, d)
            if os.path.exists(src):
                os.rename(src, os.path.join(trash, d))
        if os.path.exists(tmp) and not os.path.exists(dest):
            os.rename(tmp, dest)
        # durability fence between install and destruction (r12
        # advice): make the dest + fold renames durable, then re-verify
        # the INSTALLED snapshot while the trash still holds the
        # sources' last complete copy — only then may that copy be
        # destroyed. Without the fsync, a metadata-reordering power
        # loss could persist the trash deletion while losing the dest
        # rename (neither snapshot nor sources); without the
        # verify-before-delete, a dest torn after its rename (the
        # fsync-distrust threat model) would see its only replacement
        # material destroyed mid-rmtree and be silently committed.
        _fsync_dir(path)
        if not _verified(dest):
            shutil.rmtree(dest, ignore_errors=True)
            _rollback(path)
            return
        shutil.rmtree(trash, ignore_errors=True)
        # trash removal durable before the journal vanishes: a
        # resurrected trash dir next to a removed journal would look
        # like rollback material to no one (nothing reads it without a
        # journal) but would shadow-restore on the NEXT fold's
        # _rollback; fence it away
        _fsync_dir(path)
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
    if merge is not None and invariant is None:
        # validated BEFORE the trigger early-return: a mis-wired call
        # site must fail on its first batch in every harness, not at
        # batch >= every mid-production (r12 review finding)
        raise ValueError(
            "maybe_compact: a custom merge changes row identity — pass "
            "the merge-preserved invariant explicitly"
        )
    if not os.path.isdir(path):
        return False
    _recover(path)
    parts = _partitions(path)
    deltas = {b: d for b, d in parts.items() if 0 <= b < batch_id}
    if len(deltas) < (every if every is not None else _every()):
        return False
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

    # durability fence, then the intent journal (the commit point),
    # then the idempotent swap (see module docstring): the snapshot's
    # pages must be on disk before the journal that commits to
    # installing it, and the journal carries the expected row count so
    # recovery re-verifies the snapshot before any destructive step
    snap_rows = _dir_stats(tmp)[0]
    _fsync_tree(tmp)
    _write_journal(path, {"fold": fold, "dest": dest, "rows": snap_rows})
    _recover(path)
    return True
