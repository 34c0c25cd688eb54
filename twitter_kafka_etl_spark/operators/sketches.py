"""Mergeable sketches for streaming/approximate analytics.

The reference has no sketches; the engine adds a deterministic
count-min sketch (Cormode & Muthukrishnan 2005) as the custom-sketch
surface. Cells derive from md5-based hashes (mod-Mersenne, like the
MinHash family), so the sketch is bit-identical across engines, runs,
and partitionings — a DuckDB oracle can rebuild it exactly.

Scale properties:
- Build is one explode(depth) + groupBy(depth, cell) — map-side partial
  counts, a single shuffle of at most depth × width rows per partition.
- Sketches MERGE by cell-wise addition (union two sketch tables and
  re-sum), so per-partition / per-day sketches roll up without touching
  raw data — the point of a sketch at 100 TB.
- Point estimate = min over depths of the queried item's cells
  (classic CM overestimate bound: err <= 2N/width with prob 1-2^-depth).

Spark's built-ins (approx_count_distinct / percentile_approx) cover the
in-engine HLL and quantile cases; count-min covers frequency estimation,
which has no built-in. The deterministic HLL below exists because the
built-in's registers are JVM-private: they can't be oracle-checked,
persisted portably, or merged with sketches built by another engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from twitter_kafka_etl_spark.operators.dedup import MERSENNE, hash_params, token_hash

CM_WIDTH = 64
CM_DEPTH = 4
CM_SEED = 7


def _key_str(col: str) -> Column:
    """Sentinel-coalesced string rendering of a sketch key: NULL keys
    hash as the literal ``'NULL'`` (the ams_f2_sketch convention)
    instead of vanishing — ``md5(NULL)`` is NULL, which silently
    dropped NULL keys from every build and probe (a count-min/bloom/
    HLL miss, and a heavy_hitters false negative that broke its
    bitwise-exact contract; r9 review finding). The sentinel conflates
    a NULL key with the literal string ``'NULL'`` — deterministic,
    documented, and mirrored in the DuckDB twins."""
    return F.coalesce(F.col(col).cast("string"), F.lit("NULL"))


def _cells(h: Column, width: int, depth: int, seed: int) -> list[Column]:
    return [
        ((F.lit(a) * h + F.lit(b)) % MERSENNE) % width
        for a, b in hash_params(depth, seed=seed)
    ]


def count_min_build(
    df: DataFrame,
    col: str,
    width: int = CM_WIDTH,
    depth: int = CM_DEPTH,
    seed: int = CM_SEED,
) -> DataFrame:
    """Build the sketch as a (depth, cell, counts) long table.

    The item hash is computed once per row; each row fans out to its
    ``depth`` (depth, cell) coordinates via one array explode; the
    groupBy partial-aggregates map-side. Output rows <= depth × width
    regardless of input size."""
    h = token_hash(_key_str(col))
    coords = F.explode(
        F.array(
            *[
                F.struct(F.lit(d).alias("depth"), c.alias("cell"))
                for d, c in enumerate(_cells(h, width, depth, seed))
            ]
        )
    )
    return (
        df.select(coords.alias("co"))
        .select(F.col("co.depth").alias("depth"), F.col("co.cell").alias("cell"))
        .groupBy("depth", "cell")
        .agg(F.count(F.lit(1)).alias("counts"))
    )


def count_min_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with the same (width, depth, seed):
    cell-wise addition. This is what makes per-partition/per-day
    sketches roll up without rescanning raw data."""
    return (
        a.unionByName(b)
        .groupBy("depth", "cell")
        .agg(F.sum("counts").alias("counts"))
    )


def count_min_estimate(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    width: int = CM_WIDTH,
    depth: int = CM_DEPTH,
    seed: int = CM_SEED,
) -> DataFrame:
    """Frequency estimate per item: min over depths of the item's cell
    counts. ``items`` joins the (tiny, <= depth×width rows) sketch via
    broadcast — no scan of the original data."""
    h = token_hash(_key_str(col))
    coords = F.explode(
        F.array(
            *[
                F.struct(F.lit(d).alias("depth"), c.alias("cell"))
                for d, c in enumerate(_cells(h, width, depth, seed))
            ]
        )
    )
    probes = items.select(F.col(col), coords.alias("co")).select(
        col, F.col("co.depth").alias("depth"), F.col("co.cell").alias("cell")
    )
    return (
        probes.join(F.broadcast(sketch), ["depth", "cell"], "left")
        .na.fill({"counts": 0})
        .groupBy(col)
        .agg(F.min("counts").alias("est_count"))
    )


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007) — deterministic variant.
#
# Spark's approx_count_distinct is HLL++ but its hash/registers are not
# reproducible outside the JVM, so it can't be oracle-checked or merged
# with sketches built elsewhere. This variant derives registers from the
# md5 token hash: bucket = low p bits, rho = leading-zero rank of the
# remaining w bits — bit-identical in any engine. The harmonic-mean sum
# adds powers of two (all partial sums exact in a double), so even the
# float estimate is deterministic across engines and summation orders.
# ---------------------------------------------------------------------------

HLL_P = 6                  # 2^6 = 64 registers
HLL_M = 1 << HLL_P
HLL_W = 25                 # remaining bits of the 31-bit token hash
HLL_ALPHA = 0.709          # standard alpha_64


def _rho(v: Column, w: int = HLL_W) -> Column:
    """Leading-zero rank of ``v`` in a ``w``-bit word: w - bitlength + 1
    (v = 0 → w + 1). A literal WHEN-chain — exact, no float log2."""
    # build innermost-first so the LARGEST threshold lands outermost:
    # the chain must test v >= 2^(w-1) before v >= 2^(w-2), etc.
    expr = F.lit(w + 1)
    for i in range(w - 1, -1, -1):          # i zeros → rho = i + 1
        expr = F.when(v >= F.lit(1 << (w - 1 - i)), F.lit(i + 1)).otherwise(expr)
    return expr


def hll_build(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Per-group HLL registers as a (group, bucket, rho) long table —
    one shuffle, max folds map-side; <= m rows per group at any scale.
    Registers MERGE by cell-wise max (hll_merge), so per-partition
    sketches roll up without rescanning raw data."""
    h = token_hash(_key_str(value_col))
    return (
        df.select(
            F.col(group_col),
            (h % HLL_M).alias("bucket"),
            _rho(F.shiftright(h, HLL_P)).alias("rho"),
        )
        .groupBy(group_col, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(a: DataFrame, b: DataFrame, group_col: str) -> DataFrame:
    """Merge register tables built over disjoint (or any) row sets:
    cell-wise max — HLL's defining mergeability."""
    return (
        a.unionByName(b).groupBy(group_col, "bucket").agg(F.max("rho").alias("rho"))
    )


def hll_estimate(registers: DataFrame, group_col: str) -> DataFrame:
    """Distinct-count estimate per group: alpha * m^2 / sum(2^-M_j),
    absent registers contributing 2^0; below 2.5m with empty registers,
    the standard linear-counting correction m*ln(m/V) replaces the raw
    estimate (raw HLL is badly biased at small cardinalities).
    Deterministic: the harmonic sum is over exact dyadic rationals, so
    no summation-order drift exists; the branch condition is exact."""
    raw = F.lit(HLL_ALPHA * HLL_M * HLL_M) / F.col("__s")
    v = F.lit(HLL_M) - F.col("__n")  # empty registers
    est = F.when(
        (v > 0) & (raw <= 2.5 * HLL_M),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v),
    ).otherwise(raw)
    return (
        registers.groupBy(group_col)
        .agg(
            (
                F.sum(F.pow(F.lit(2.0), -F.col("rho")))
                + (F.lit(HLL_M) - F.count(F.lit(1)))
            ).alias("__s"),
            F.count(F.lit(1)).alias("__n"),
        )
        .select(group_col, F.round(est, 6).alias("est_distinct"))
    )


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970) — deterministic, mergeable membership sketch.
#
# Spark's own BloomFilter (DataFrameStatFunctions.bloomFilter / the AQE
# runtime bloom join) lives JVM-side with a non-portable hash, so — like
# the built-in HLL — it can't be oracle-checked, persisted portably, or
# merged with a filter built by another engine. This variant packs the
# bitmap into 32-bit words derived from the md5 token hash: bit-identical
# in any engine, merged by cell-wise OR.
# ---------------------------------------------------------------------------

BLOOM_M = 4096            # bits
BLOOM_K = 4               # hash functions
BLOOM_SEED = 11
BLOOM_WORD = 32           # bits per packed word (fits signed ops safely)


def _bloom_coords(h: Column, m: int, k: int, seed: int) -> list[Column]:
    """(word, bit-value) coordinates of the k bloom positions of ``h``.

    The bit value is pow(2, bit) — exact in a double for bit < 52 —
    because Spark's shiftleft takes only literal shift amounts."""
    out = []
    for a, b in hash_params(k, seed=seed):
        pos = ((F.lit(a) * h + F.lit(b)) % MERSENNE) % m
        word = F.floor(pos / BLOOM_WORD).cast("int")
        bit_val = F.pow(F.lit(2.0), (pos % BLOOM_WORD)).cast("bigint")
        out.append((word, bit_val))
    return out


def bloom_build(
    df: DataFrame,
    col: str,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
    seed: int = BLOOM_SEED,
) -> DataFrame:
    """Build the filter as a (word, bits) packed-bitmap table.

    Each row fans out to its k (word, bit) coordinates via one array
    explode; the groupBy ORs words map-side. Output <= m/32 rows no
    matter the input size — the whole point of a membership sketch at
    100 TB: ship the bitmap, not the key set."""
    h = token_hash(_key_str(col))
    coords = F.explode(
        F.array(
            *[
                F.struct(w.alias("word"), v.alias("v"))
                for w, v in _bloom_coords(h, m, k, seed)
            ]
        )
    )
    return (
        df.select(coords.alias("co"))
        .select(F.col("co.word").alias("word"), F.col("co.v").alias("v"))
        .groupBy("word")
        .agg(F.bit_or("v").alias("bits"))
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge filters built with the same (m, k, seed): word-wise OR —
    per-partition/per-day filters roll up without rescanning raw data."""
    return a.unionByName(b).groupBy("word").agg(F.bit_or("bits").alias("bits"))


def bloom_probe(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
    seed: int = BLOOM_SEED,
) -> DataFrame:
    """Membership probe: an item is a (possible) member iff all k of its
    bits are set. The <= m/32-row sketch broadcasts; probing never scans
    the build data. One-sided error only: misses are definite, hits may
    be false positives at the classic (1 - e^{-kn/m})^k rate."""
    h = token_hash(_key_str(col))
    coords = F.explode(
        F.array(
            *[
                F.struct(w.alias("word"), v.alias("v"))
                for w, v in _bloom_coords(h, m, k, seed)
            ]
        )
    )
    probes = items.select(F.col(col), coords.alias("co")).select(
        col, F.col("co.word").alias("word"), F.col("co.v").alias("v")
    )
    hit = (
        F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("v")) != 0
    ).cast("int")
    return (
        probes.join(F.broadcast(sketch), "word", "left")
        .groupBy(col)
        .agg((F.min(hit) == 1).alias("bloom_hit"))
    )


def ams_f2_sketch(df: DataFrame, key_col: str, k: int = 8) -> DataFrame:
    """AMS (Alon-Matias-Szegedy) second-frequency-moment sketch: k
    independent +-1 hash signs over the key; each signed row-sum s_i is
    an unbiased estimator of F2 = sum(count_key^2) via s_i^2.

    F2 is the self-join size of the key column — the quantity a planner
    needs to predict join blow-ups — and the AMS form computes it in ONE
    pass with NO keyed shuffle and O(k) state: every s_i is a map-side
    partial sum folded into a single-row aggregate, so the plan is
    scan -> partial agg -> 1-row combine even over 100 TB (contrast the
    exact form: a full groupBy(key) shuffle). md5-derived signs make the
    sketch identical in any engine. Output: (sketch_id, signed_sum,
    est_f2) — median/mean of est_f2 across sketches is the estimate.
    """
    if not 1 <= k <= 32:
        raise ValueError(f"k must be in [1, 32] (one md5 nibble per sketch), got {k}")
    # ONE digest per row, sign_i = parity of hex nibble i — instead of k
    # per-sketch md5s over distinct preimages (8x the hash work, and md5
    # dominates this operator's cost: the single-digest form measured
    # ~4x faster at sf1). Distinct bit positions of one md5 are
    # independent uniform bits for every practical purpose (md5 is a
    # PRF); the per-preimage form buys formal 4-wise independence the
    # estimator does not need at this accuracy. NULL keys hash as the
    # literal 'NULL' sentinel on BOTH engines so the signs agree.
    digest = F.md5(F.coalesce(F.col(key_col).cast("string"), F.lit("NULL")))
    aggs = []
    for i in range(k):
        nib = F.conv(F.substring(digest, i + 1, 1), 16, 10).cast("int")
        sign = F.when(nib % 2 == 1, F.lit(1)).otherwise(F.lit(-1))
        aggs.append(F.sum(sign).alias(f"s{i}"))
    row = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("sketch_id"), F.col(f"s{i}").alias("signed_sum")
            )
            for i in range(k)
        ]
    )
    return row.select(F.explode(pairs).alias("e")).select(
        F.col("e.sketch_id").cast("bigint").alias("sketch_id"),
        F.col("e.signed_sum").cast("bigint").alias("signed_sum"),
        (F.col("e.signed_sum") * F.col("e.signed_sum"))
        .cast("bigint")
        .alias("est_f2"),
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    threshold: int,
    width: int = CM_WIDTH,
    depth: int = CM_DEPTH,
    seed: int = CM_SEED,
) -> DataFrame:
    """EXACT heavy hitters (count >= threshold) with sketch-guided
    pruning — the two-pass pattern that finds hot keys in a 100 TB
    stream without a full-cardinality groupBy ever materializing:

    1. count-min over the column (O(width × depth) state, map-side
       partial agg — no per-key shuffle);
    2. every ROW computes its key's sketch estimate map-side against
       the broadcast cell map and rows below the threshold are
       filtered before any exchange. Count-min never underestimates,
       so no true heavy hitter is pruned (no false negatives);
       collisions only ADD spurious candidates, bounded by the sketch
       error n/width;
    3. exact counts over the surviving (candidate-key) rows only — the
       sole shuffle in the plan — and the final filter removes the
       false positives. NULL keys count like any other key (sentinel
       hashing + groupBy's NULL group), matching the naive form.

    The result is bitwise EXACT (identical to the naive full groupBy +
    HAVING), which is what makes the approximate machinery safely
    substitutable at scale.
    """
    sketch = count_min_build(df, col, width, depth, seed)
    return heavy_hitters_from_sketch(
        df, sketch, col, threshold, width, depth, seed
    )


def heavy_hitters_from_sketch(
    df: DataFrame,
    sketch: DataFrame,
    col: str,
    threshold: int,
    width: int = CM_WIDTH,
    depth: int = CM_DEPTH,
    seed: int = CM_SEED,
) -> DataFrame:
    """Step 2+3 of :func:`heavy_hitters` against an externally built
    (possibly merged) sketch — the streaming serve path (qs15).

    The candidate pass is MAP-SIDE: the <= width×depth sketch cells
    collect into a literal map (same bounded-collect justification as
    the IVF centroid matrix), each row computes its own min-over-depths
    estimate as a pure JVM expression, and rows below the threshold are
    filtered BEFORE any exchange — so the only shuffle is the exact
    groupBy over candidate-key rows. The r9-review predecessor derived
    candidates from ``df.select(col).distinct()``, which was itself the
    full-cardinality shuffle the sketch exists to avoid; it also
    semi-joined on the raw key, silently dropping a NULL heavy hitter
    (NULL never equi-joins). The estimate is a pure function of the
    key, so every occurrence of a candidate key survives the filter and
    the groupBy counts are exact — bitwise the naive groupBy+HAVING.

    CONTRACT (validated): the sketch must have absorbed at least every
    key occurrence in ``df`` under this exact (width, depth, seed) —
    that is what makes the estimate an over-approximation of the true
    ``df`` count and the result bitwise-exact. Both call sites satisfy
    it by construction (x52 builds the sketch from ``df``; qs15's
    landed raw layer is exactly what its per-batch sketches folded).
    Parameter mismatches fail LOUDLY in every direction:

    - larger build width/depth -> a cell lands out of range (checked
      below);
    - smaller build depth -> a depth level in 0..depth-1 is absent
      from the sketch (every inserted row touches every level, so a
      non-empty depth-D' build has exactly levels 0..D'-1);
    - smaller build width (cells all in range, counts silently
      mis-slotted — the r10 advisor's mirrored case) -> caught by the
      sampled-key coverage probe: a few ``df`` keys are re-hashed
      driver-side (the md5 token hash is engine-portable) and each
      must hit a nonzero cell at every depth, which coverage
      guarantees under matching parameters and which a mismatched
      width makes vanishingly unlikely to pass by collision.
    """
    rows = sketch.collect()
    if not rows:
        return (
            df.groupBy(col)
            .agg(F.count(F.lit(1)).alias("counts"))
            .filter(F.lit(False))
        )
    # flat depth-major array literal: element_at by INDEX is O(1) per
    # probe (a literal map would linear-scan its width*depth entries
    # for every row — measured ~2x on x52)
    flat = [0] * (width * depth)
    depths_seen: set[int] = set()
    for r in rows:
        cell, depth_i = int(r["cell"]), int(r["depth"])
        # a sketch built with other params must fail LOUDLY: a larger
        # width/depth would raise a bare IndexError below, but a SMALLER
        # one would silently land counts in wrong slots and serve bogus
        # estimates (r9 advisor finding)
        if not (0 <= cell < width and 0 <= depth_i < depth):
            raise ValueError(
                f"sketch cell (depth={depth_i}, cell={cell}) out of range "
                f"for width={width}, depth={depth} — the sketch was built "
                "with different parameters than this probe"
            )
        depths_seen.add(depth_i)
        flat[depth_i * width + cell] = int(r["counts"])
    if depths_seen != set(range(depth)):
        raise ValueError(
            f"sketch depth levels {sorted(depths_seen)} != expected "
            f"0..{depth - 1} — the sketch was built with a smaller depth "
            "than this probe (r10 advisor mirrored-mismatch finding)"
        )
    # sampled-key coverage probe (closes the smaller-WIDTH direction):
    # keys are collected ALREADY RENDERED by the engine's own cast
    # (_key_str), so the Python re-hash sees byte-identical strings.
    # Bounded work: one take() of a handful of single-column rows.
    import hashlib

    params = hash_params(depth, seed=seed)
    for r in df.select(_key_str(col).alias("__k")).take(8):
        h_py = int(
            hashlib.md5(r["__k"].encode("utf-8")).hexdigest()[:8], 16
        ) % MERSENNE
        for d, (a, b) in enumerate(params):
            if flat[d * width + ((a * h_py + b) % MERSENNE) % width] == 0:
                raise ValueError(
                    f"df key {r['__k']!r} probes to an empty sketch cell "
                    f"at depth {d} under (width={width}, depth={depth}, "
                    f"seed={seed}) — the sketch was built with different "
                    "parameters, or does not cover df's keys (both break "
                    "the over-approximation contract this serve path "
                    "relies on)"
                )
    arr = F.array(*[F.lit(v) for v in flat])
    h = token_hash(_key_str(col))
    ests = [
        F.element_at(arr, (c + F.lit(d * width + 1)).cast("int"))
        for d, c in enumerate(_cells(h, width, depth, seed))
    ]
    est = ests[0] if len(ests) == 1 else F.least(*ests)
    return (
        df.filter(est >= threshold)
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("counts"))
        .filter(F.col("counts") >= threshold)
    )
