"""Similarity search over embedding columns (array<float>).

Two tiers:
- ``topk_bruteforce`` — exact cosine top-k: the correctness baseline.
  The query vector rides along as a broadcast literal-free one-row frame;
  scoring is a JVM-side higher-order fold (zip_with + aggregate), so the
  scan stays distributed and nothing but the top-k heap reaches the driver.
- ``lsh_assign`` / ``topk_lsh`` — the scale path: sign-random-projection
  LSH buckets vectors; search touches only the query's bucket. Hyperplanes
  are deterministic ±1 vectors (seeded), embeddable in the DuckDB oracle.
- ``cosine_pairs`` — all-pairs near-duplicate detection above a cosine
  threshold (embedding near-dup dedup). Exact variant is O(n²) per
  partition-pair; the LSH bucket join is the 100 TB route.

All math is double-precision with a fixed left-to-right fold, which is
bitwise-identical to DuckDB's list_dot_product — verified, not assumed.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential double-precision dot product (JVM higher-order fold)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def hyperplanes(n_planes: int = 8, dim: int = 64, seed: int = 42) -> list[list[int]]:
    """Deterministic ±1 hyperplanes for sign-random-projection LSH.
    Integer-valued so the projection is an exact ± sum of components —
    no float literal drift between engines."""
    rng = random.Random(seed)
    return [[rng.choice((-1, 1)) for _ in range(dim)] for _ in range(n_planes)]


def _plane_col(plane: list[int]) -> Column:
    return F.array(*[F.lit(float(v)) for v in plane])


def lsh_bucket(vec: Column, planes: list[list[int]]) -> Column:
    """Bucket id: bit i = sign(dot(vec, plane_i))."""
    bucket = F.lit(0).cast("bigint")
    for i, p in enumerate(planes):
        bit = F.when(dot(vec, _plane_col(p)) > 0, F.lit(2**i)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket


def lsh_assign(
    df: DataFrame,
    vec_col: str = "embedding",
    planes: list[list[int]] | None = None,
    out: str = "bucket",
) -> DataFrame:
    planes = planes or hyperplanes()
    return df.withColumn(out, lsh_bucket(as_double(vec_col), planes))


def label_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label centroid components — the "train the coarse quantizer"
    step of IVF-style ANN, and the class-prototype pass of embedding
    diagnostics. Output is long form: (label, pos, centroid) — one row
    per label × dimension, which keeps the aggregate a plain groupBy
    (no array re-assembly whose element order would depend on shuffle
    nondeterminism).

    Sums run in DECIMAL(38,12): float addition is order-dependent under
    partitioning, decimal addition is exact — the same determinism
    discipline as the quality rollup's decimal-summed means. One
    posexplode (narrow) + one partial-agg shuffle on (label, pos);
    output size is labels × dims regardless of input row count.
    """
    pos = df.select(
        F.col(label_col), F.posexplode(as_double(vec_col)).alias("pos", "v")
    )
    return (
        pos.groupBy(label_col, "pos")
        .agg(
            F.sum(F.col("v").cast("decimal(38,12)")).alias("s"),
            F.count(F.lit(1)).alias("c"),
        )
        .select(
            F.col(label_col),
            F.col("pos").cast("bigint").alias("pos"),
            # cast the EXACT decimal sum to double, then one division:
            # decimal/bigint division scale rules differ between engines
            F.round(F.col("s").cast("double") / F.col("c"), 6).alias("centroid"),
        )
    )


def topk_bruteforce(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k against the vector with ``query_id``.

    The one-row query side is broadcast; ordering uses the 6-dp-rounded
    similarity with the id as tie-break, so results are stable under any
    float summation regime. Output: (vec_id, cos_sim) — k rows.

    Zero-norm vectors are excluded on both sides: cosine is undefined
    there (0/0 = NaN, and Spark ranks NaN ABOVE every real similarity,
    so unguarded zero vectors would win the top-k outright — r9 review
    finding); a zero-norm query returns an empty result.
    """
    q = df.filter(F.col(id_col) == query_id).select(
        as_double(vec_col).alias("qvec")
    ).filter(dot(F.col("qvec"), F.col("qvec")) > 0)
    scored = df.join(F.broadcast(q)).select(
        F.col(id_col),
        as_double(vec_col).alias("__v"),
        F.col("qvec"),
    ).filter(dot(F.col("__v"), F.col("__v")) > 0).select(
        F.col(id_col),
        F.round(cosine(F.col("__v"), F.col("qvec")), 6).alias("cos_sim"),
    )
    return (
        scored.filter(F.col(id_col) != query_id)
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def _probe_masks(n_planes: int, radius: int) -> list[int]:
    """XOR masks for every bucket within hamming distance ``radius`` of
    the query bucket, in (distance, mask) order. C(b,0)+...+C(b,r)
    masks — tiny for practical b, computed driver-side."""
    from itertools import combinations

    masks = []
    for r in range(radius + 1):
        for bits in combinations(range(n_planes), r):
            masks.append(sum(1 << b for b in bits))
    return masks


def topk_lsh(
    df: DataFrame,
    query_id: int,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    planes: list[list[int]] | None = None,
    probe_radius: int = 0,
) -> DataFrame:
    """ANN top-k: score only vectors in (or near) the query's LSH bucket.

    At scale this is a bucket-pruned scan: with b planes, ~n/2^b vectors
    are touched per probed bucket. ``probe_radius`` is the recall dial —
    multi-probe LSH scans every bucket within that hamming distance of
    the query's (sum C(b,r) buckets), trading a linear candidate
    increase for recall without rebuilding anything. The candidate set
    grows monotonically with the radius, so recall@k vs brute force is
    nondecreasing in ``probe_radius`` (asserted in tests).

    Zero-norm guard: same rule as :func:`topk_bruteforce` — zero
    vectors (which all hash to bucket 0 in every table and would
    NaN-rank first) never score, and a zero-norm query returns empty."""
    planes = planes or hyperplanes()
    assigned = lsh_assign(df, vec_col, planes)
    masks = _probe_masks(len(planes), probe_radius)
    q = assigned.filter(F.col(id_col) == query_id).select(
        as_double(vec_col).alias("qvec"),
        F.col("bucket"),
    ).filter(dot(F.col("qvec"), F.col("qvec")) > 0).select(
        "qvec",
        F.explode(
            F.array(*[F.col("bucket").bitwiseXOR(m) for m in masks])
        ).alias("qbucket"),
    )
    scored = (
        assigned.join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .filter(F.col(id_col) != query_id)
        .select(
            F.col(id_col),
            as_double(vec_col).alias("__v"),
            F.col("qvec"),
        )
        .filter(dot(F.col("__v"), F.col("__v")) > 0)
        .select(
            F.col(id_col),
            F.round(cosine(F.col("__v"), F.col("qvec")), 6).alias("cos_sim"),
        )
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


#: deterministic coarse-quantizer centroid selection: vec_id % MOD == 0.
#: A real deployment would train centroids (k-means); the engine keeps
#: selection deterministic so the DuckDB oracle can replicate it exactly.
#: 61 is the FLOOR: above 61² rows the mod grows as isqrt(n), capping
#: the centroid count at ~√n (FAISS-style IVF sizing) so assignment is
#: O(n^1.5) total FLOPs instead of O(n²/61).
CENTROID_MOD = 61

#: exact argmax safety margin: numpy proposes this many nearest
#: centroids per vector; the JVM fold re-scores them and picks the
#: final cell. The true argmax escapes a top-4 only if pairwise-summed
#: and sequential-summed cosines disagree past rank 4 — ~1e-15 drift
#: against typical inter-centroid gaps, and exact ties are rescued by
#: the stable candidate ordering (lowest cent_id first).
IVF_TOPM = 4


def centroid_mod_for(n: int, floor: int = CENTROID_MOD) -> int:
    """Adaptive centroid stride: max(floor, isqrt(n)) → ≈√n centroids
    above floor² rows, exactly n/floor below. Mirrored verbatim in the
    x16 DuckDB oracle via GREATEST(floor, FLOOR(SQRT(COUNT(*))))."""
    import math

    return max(floor, math.isqrt(n))


def ivf_assign(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_mod: int | None = None,
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest
    centroid by cosine (ties → lowest centroid id).

    ``centroid_mod=None`` sizes the centroid set adaptively to ≈√n
    (``centroid_mod_for``); pass an int to pin it. The scale shape:

    1. The centroid table (≈√n rows) is collected once — the coarse
       quantizer is driver/broadcast state in every IVF system — and
       shipped as a normalized numpy matrix.
    2. A narrow ``mapInPandas`` pass scores each Arrow batch against
       the matrix in one BLAS matmul and emits the ``IVF_TOPM``
       nearest centroid ids per vector, stable-ordered so exact ties
       list the lowest cent_id first (centroid rows are sorted by id
       and the argsort is stable). Candidate generation only — no
       emitted value comes from numpy.
    3. The exact sequential JVM fold re-scores the n×TOPM candidates
       against the broadcast centroid frame, drops both arrays
       map-side, and takes the argmax as a max_by partial aggregate —
       only (id, cent_id, sim) triples cross the exchange.

    A pure-JVM fold over all n×C pairs scored 10× slower at sf1 and
    O(n²/61) at fixed mod; this path is O(n·√n) BLAS FLOPs + O(n)
    JVM folds, and every tie-break is decided by the same exact
    arithmetic the oracle uses.

    Zero-norm vectors have no angle to any centroid — unassignable —
    and under Spark's default ANSI mode the cosine's 0/0 is a hard
    DIVIDE_BY_ZERO error, so they are excluded here at the source
    (likewise zero centroids from the quantizer); consumers' own
    zero-norm guards (topk_ivf, semantic_dedup, prototype_scores)
    already drop them from outputs (r9 review finding)."""
    vecs = df.select(F.col(id_col), as_double(vec_col).alias("v")).filter(
        dot(F.col("v"), F.col("v")) > 0
    )
    if centroid_mod is None:
        # stride basis is the zero-norm-FILTERED count: the oracles size
        # the centroid set from the filtered `e` CTE, and a stride
        # computed over raw rows would pick a different centroid set the
        # moment a zero vector pushes n past the floor² boundary
        # (r9 advisor finding)
        centroid_mod = centroid_mod_for(vecs.count())
    cents = df.filter(F.pmod(F.col(id_col), F.lit(centroid_mod)) == 0).select(
        F.col(id_col).alias("cent_id"),
        as_double(vec_col).alias("cvec"),
        norm(as_double(vec_col)).alias("cnorm"),
    ).filter(F.col("cnorm") > 0)

    import numpy as np

    crows = cents.select("cent_id", "cvec").orderBy("cent_id").collect()
    cids = np.array([r[0] for r in crows], dtype="int64")
    cmatn = np.stack([np.asarray(r[1]) for r in crows])
    cmatn = cmatn / np.linalg.norm(cmatn, axis=1, keepdims=True)
    topm = min(IVF_TOPM, len(cids))
    bc = df.sparkSession.sparkContext.broadcast((cids, cmatn, topm))

    def _cand_gen(batches):
        import numpy as _np
        import pandas as _pd

        ids_, mat_, m = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            vmat = _np.stack(pdf["v"].to_numpy())
            vmat = vmat / _np.linalg.norm(vmat, axis=1, keepdims=True)
            sims = vmat @ mat_.T
            # stable argsort on -sims: exact numpy ties keep centroid
            # order, which is ascending cent_id — the deterministic rule
            top = _np.argsort(-sims, axis=1, kind="stable")[:, :m]
            # id selected by NAME (closure-captured id_col): positional
            # iloc would silently mis-pair if the projection order ever
            # changed upstream
            out = pdf.loc[pdf.index.repeat(m), [id_col, "v"]]
            out["cent_id"] = ids_[top].ravel()
            yield out

    cands = vecs.mapInPandas(
        _cand_gen, f"{id_col} bigint, v array<double>, cent_id bigint"
    )
    # exact re-score: arrays dropped in this map-side projection, so the
    # argmax exchange carries only (id, cent_id, sim) triples
    scored = cands.join(F.broadcast(cents), "cent_id").select(
        F.col(id_col),
        F.col("cent_id"),
        (dot(F.col("v"), F.col("cvec"))
         / (norm(F.col("v")) * F.col("cnorm"))).alias("cent_sim"),
    )
    # max of (sim, -cent_id) == highest similarity, ties to lowest id —
    # the same deterministic rule as ORDER BY sim DESC, cent_id ASC
    best = scored.groupBy(id_col).agg(
        F.max_by("cent_id", F.struct("cent_sim", -F.col("cent_id"))).alias(
            "cent_id"
        )
    )
    return best.join(vecs, id_col).select(id_col, "v", "cent_id")


def topk_ivf(
    df: DataFrame,
    query_id: int,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_mod: int | None = None,
    nprobe: int = 1,
) -> DataFrame:
    """ANN top-k, IVF flavor: exact cosine rerank inside the query's
    ``nprobe`` nearest coarse cells. Complements topk_lsh — IVF cells
    adapt to the data distribution where LSH buckets are data-oblivious.
    ``nprobe`` is the recall dial: cells are scanned in decreasing
    query-centroid similarity, so the candidate set (and recall@k vs
    brute force) grows monotonically with it.

    Zero-norm guard: same rule as :func:`topk_bruteforce` — zero
    corpus vectors and zero coarse centroids never rank (cosine is
    undefined, NaN would sort first), a zero-norm query returns
    empty."""
    if centroid_mod is None:
        # same filtered-count stride basis as ivf_assign (the two must
        # agree on the centroid set, and both must agree with the
        # oracle's zero-norm-filtered COUNT(*))
        centroid_mod = centroid_mod_for(
            df.filter(
                dot(as_double(vec_col), as_double(vec_col)) > 0
            ).count()
        )
    assigned = ivf_assign(df, vec_col, id_col, centroid_mod)
    qvec = df.filter(F.col(id_col) == query_id).select(
        as_double(vec_col).alias("qvec")
    ).filter(dot(F.col("qvec"), F.col("qvec")) > 0)
    cents = df.filter(F.pmod(F.col(id_col), F.lit(centroid_mod)) == 0).select(
        F.col(id_col).alias("cent_id"), as_double(vec_col).alias("cvec")
    ).filter(dot(F.col("cvec"), F.col("cvec")) > 0)
    probe_cells = (
        cents.join(F.broadcast(qvec))
        .select("cent_id", cosine(F.col("cvec"), F.col("qvec")).alias("qc_sim"))
        .orderBy(F.desc("qc_sim"), "cent_id")
        .limit(nprobe)
        .select("cent_id")
    )
    return (
        assigned.join(F.broadcast(probe_cells), "cent_id")
        .join(F.broadcast(qvec))
        .filter(F.col(id_col) != query_id)
        .filter(dot(F.col("v"), F.col("v")) > 0)
        .select(
            F.col(id_col),
            F.round(cosine(F.col("v"), F.col("qvec")), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def _vec_fp(vec_col: str) -> Column:
    """Byte-stable fingerprint of a vector: md5 over the JSON rendering
    of the double-cast array. Engine-internal only (never compared to an
    oracle) — it just has to be equal iff the vectors are equal, which
    the deterministic double→JSON formatting guarantees within Spark."""
    return F.md5(F.to_json(F.struct(as_double(vec_col).alias("v"))))


def _cosine_pairs_collapsed(
    df: DataFrame,
    threshold: float,
    vec_col: str,
    id_col: str,
    use_lsh_prefilter: bool | None,
    planes: list[list[int]] | None,
    n_blocks: int,
    n_tables: int,
    lsh_auto_rows: int,
) -> DataFrame:
    """Collapse-exact rewrite for duplicate-heavy embedding sets — which
    replicated / re-crawled corpora are: byte-identical vectors collapse
    to one representative before the (quadratic) candidate generation;
    pairs expand back through fingerprint equi-joins. A duplication
    factor d cuts the matmul/bucket work by d² (measured 6× at the
    10-fold-replicated sf1, where the LSH path drowns in intra-bucket
    duplicate candidates). Output is identical: cross-group pairs
    inherit the representative pair's cos_sim (identical vectors ⇒
    identical cosine), within-group pairs are exactly 1.0 (guarded to
    vectors with positive norm — a zero vector has no cosine and the
    naive path never emits it either).

    Path-selection note: with ``use_lsh_prefilter=None`` the inner
    ``cosine_pairs`` call decides exact-vs-LSH from the REPRESENTATIVE
    count, not the raw row count — deliberately: the candidate join runs
    over representatives, so rep count is the size that matters (10M rows
    collapsing to 50k reps should take the exact path). Near the
    ``lsh_auto_rows`` boundary this can differ from the path the
    uncollapsed call would pick; emitted cos_sim values are exact either
    way, only LSH-recall at the threshold boundary differs.

    Cache lifetime: ``members`` stays persisted for the returned plan's
    lifetime (it feeds the expand joins twice) and is released by
    session cache eviction (`spark.catalog.clearCache()` — bench.py does
    this between queries) or session end, same contract as the
    ``persist=True`` working sets in ``dedup.minhash_lsh_pairs``.
    """
    from twitter_kafka_etl_spark.operators._cache import eager_persist

    members = eager_persist(
        df.select(
            F.col(id_col).alias("m_id"),
            _vec_fp(vec_col).alias("fp"),
            dot(as_double(vec_col), as_double(vec_col)).alias("__nrm2"),
        )
    )
    reps = members.groupBy("fp").agg(F.min("m_id").alias("rep_id"))
    rep_df = df.join(
        reps.select(F.col("rep_id").alias(id_col)), id_col, "left_semi"
    )
    rep_pairs = cosine_pairs(
        rep_df, threshold, vec_col, id_col, use_lsh_prefilter, planes,
        n_blocks, n_tables, lsh_auto_rows, collapse_exact=False,
    )
    fp_of = reps.select("rep_id", "fp")
    cross = (
        rep_pairs.join(
            fp_of.select(F.col("rep_id").alias("id_a"), F.col("fp").alias("fp_a")),
            "id_a",
        )
        .join(
            fp_of.select(F.col("rep_id").alias("id_b"), F.col("fp").alias("fp_b")),
            "id_b",
        )
        .join(members.select(F.col("m_id").alias("ma"), F.col("fp").alias("fp_a")), "fp_a")
        .join(members.select(F.col("m_id").alias("mb"), F.col("fp").alias("fp_b")), "fp_b")
        .select(
            F.least("ma", "mb").alias("id_a"),
            F.greatest("ma", "mb").alias("id_b"),
            F.col("cos_sim"),
        )
    )
    m1, m2 = members.alias("m1"), members.alias("m2")
    within = (
        m1.join(
            m2,
            (F.col("m1.fp") == F.col("m2.fp"))
            & (F.col("m1.m_id") < F.col("m2.m_id")),
        )
        .filter(F.col("m1.__nrm2") > 0)
        .select(
            F.col("m1.m_id").alias("id_a"),
            F.col("m2.m_id").alias("id_b"),
            F.lit(1.0).alias("cos_sim"),
        )
        .filter(F.lit(1.0) >= threshold)
    )
    return cross.unionByName(within)


def cosine_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    use_lsh_prefilter: bool | None = None,
    planes: list[list[int]] | None = None,
    n_blocks: int = 8,
    n_tables: int = 4,
    lsh_auto_rows: int = 100_000,
    collapse_exact: bool | None = None,
) -> DataFrame:
    """Embedding near-duplicate pairs: exact cosine >= threshold.

    **Path selection** (the 100 TB decision): the blocked all-pairs
    matmul is exact but O(n²/B) FLOPs — fine to ~10⁵ vectors, a
    scale-killer beyond. With ``use_lsh_prefilter=None`` (default) the
    operator counts the input (a metadata-cheap parquet count) and
    switches to the LSH-bucketed candidate join above ``lsh_auto_rows``
    rows; pass True/False to force a path. Both paths feed the same
    exact re-score, so every emitted ``cos_sim`` value is identical —
    only recall at the threshold boundary differs on the LSH path.

    1a. **Blocked candidate generation** (small n; Arrow + numpy):
        vectors are assigned to ``n_blocks`` blocks; each vector is
        replicated once per partner block so every unordered block pair
        lands in one ``applyInPandas`` group, which matmuls the two
        blocks and emits ids whose approximate cosine clears
        ``threshold - 1e-6``. Shuffle volume is O(n × n_blocks × dim) —
        bounded, no row-level cross join ever materializes. Exact:
        every qualifying pair is generated.
    1b. **Multi-table LSH candidate generation** (large n): ``n_tables``
        independent sign-random-projection tables (seeds 42+t) are
        unioned into one (id, table, bucket) long table and self-joined
        on (table, bucket) — one shuffled equi-join over a reused
        exchange, AQE-split on skewed buckets, never a cross join.
        OR-construction recall is 1-(1-p^k)^L with p = 1 - θ/π per
        plane; raise ``n_tables`` (or lower planes-per-table) for
        recall, at linear candidate cost. Approximate: bucket-disjoint
        pairs are never scored.
    2.  **Exact re-score** (JVM fold): candidates join back to their
        vectors and the final ``cos_sim`` is the sequential
        double-precision fold — bitwise-identical to DuckDB's
        ``list_dot_product`` oracle, so numpy's pairwise-summation
        drift can never change an emitted value.

    Zero-norm vectors are excluded up front: cosine is undefined there,
    and the two candidate paths disagreed on them — numpy's
    ``NaN >= margin`` is False (blocked path drops the pair) while
    Spark's ``NaN >= threshold`` is TRUE (the LSH path emitted
    ``cos_sim = NaN`` rows, since zero vectors collide in bucket 0 of
    every table) — breaking the documented path-equivalence contract
    (r9 review finding).
    """
    df = df.filter(
        dot(as_double(vec_col), as_double(vec_col)) > 0
    )
    n_rows = None
    if collapse_exact is None:
        from twitter_kafka_etl_spark.operators.dedup import _auto_collapse_n

        collapse_exact, n_rows = _auto_collapse_n(df, _vec_fp(vec_col))
    if collapse_exact:
        return _cosine_pairs_collapsed(
            df, threshold, vec_col, id_col, use_lsh_prefilter, planes,
            n_blocks, n_tables, lsh_auto_rows,
        )
    a = df.select(
        F.col(id_col).alias("id_a"), as_double(vec_col).alias("va")
    )
    b = df.select(
        F.col(id_col).alias("id_b"), as_double(vec_col).alias("vb")
    )
    if use_lsh_prefilter is None:
        # the collapse probe already counted the (filtered) corpus —
        # reuse it; only an explicit collapse_exact pays a count job
        if n_rows is None:
            n_rows = df.count()
        use_lsh_prefilter = n_rows > lsh_auto_rows
    if use_lsh_prefilter:
        vecs = df.select(F.col(id_col).alias("_id"), as_double(vec_col).alias("_v"))
        tables = None
        for t in range(n_tables if planes is None else 1):
            tp = planes if planes is not None else hyperplanes(seed=42 + t)
            part = vecs.select(
                "_id",
                F.lit(t).alias("tbl"),
                lsh_bucket(F.col("_v"), tp).alias("bucket"),
            )
            tables = part if tables is None else tables.unionByName(part)
        lt, rt = tables.alias("l"), tables.alias("r")
        cands = (
            lt.join(
                rt,
                (F.col("l.tbl") == F.col("r.tbl"))
                & (F.col("l.bucket") == F.col("r.bucket"))
                & (F.col("l._id") < F.col("r._id")),
            )
            .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
            .distinct()
        )
        return (
            cands.join(a, "id_a")
            .join(b, "id_b")
            .select(
                "id_a",
                "id_b",
                F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
            )
            .filter(F.col("cos_sim") >= threshold)
        )

    import pandas as pd

    margin = threshold - 1e-6

    def _block_pairs(key, pdf):
        import numpy as np

        bi, bj = key
        left = pdf[pdf["_blk"] == bi]
        right = pdf[pdf["_blk"] == bj] if bi != bj else left
        if left.empty or right.empty:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
        va = np.stack(left["_v"].to_numpy())
        vb = np.stack(right["_v"].to_numpy())
        sims = (va @ vb.T) / np.outer(
            np.linalg.norm(va, axis=1), np.linalg.norm(vb, axis=1)
        )
        r, c = np.nonzero(sims >= margin)
        id_a = left["_id"].to_numpy()[r]
        id_b = right["_id"].to_numpy()[c]
        if bi == bj:
            # same-block matrix holds both (x,y) and (y,x): keep one
            keep = id_a < id_b
            id_a, id_b = id_a[keep], id_b[keep]
        else:
            # cross-block pairs occur exactly once: order, don't drop
            id_a, id_b = np.minimum(id_a, id_b), np.maximum(id_a, id_b)
        return pd.DataFrame({"id_a": id_a, "id_b": id_b})

    base = df.select(
        F.col(id_col).cast("bigint").alias("_id"), as_double(vec_col).alias("_v")
    ).withColumn("_blk", F.pmod("_id", F.lit(n_blocks)).cast("int"))
    tasks = (
        base.withColumn(
            "_partner", F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1)))
        )
        .withColumn("_bi", F.least("_blk", "_partner"))
        .withColumn("_bj", F.greatest("_blk", "_partner"))
    )
    cands = tasks.groupBy("_bi", "_bj").applyInPandas(
        _block_pairs, "id_a bigint, id_b bigint"
    )
    exact = (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
        )
    )
    return exact.filter(F.col("cos_sim") >= threshold)


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the storage/bandwidth
    lever for embedding corpora (4x smaller vectors, SIMD-friendly int
    dot products downstream). scale = max|v| / 127; each component maps
    to floor(v/scale + 0.5), exactly representable in [-127, 127].

    Engine-portable determinism: every step (exact float->double widen,
    one double division, +0.5, floor, order-free array max) is the same
    IEEE operation in any engine, so the quantized vectors — not just
    summaries — hash-match an oracle bit-for-bit. Narrow per-row array
    expressions: no shuffle, no Python, scale-free.

    Output: (id, scale [rounded for display], qvec array<int>,
    max_err = max reconstruction error |v_i - q_i * scale|).
    """
    v = as_double(vec_col)
    s = F.array_max(F.transform(v, F.abs)) / F.lit(127.0)
    q = F.when(
        s == 0, F.transform(v, lambda x: F.lit(0))
    ).otherwise(
        F.transform(v, lambda x: F.floor(x / s + F.lit(0.5)).cast("int"))
    )
    staged = df.select(
        F.col(id_col),
        F.round(s, 6).alias("scale"),
        q.alias("qvec"),
        F.array_max(
            F.zip_with(v, q, lambda x, qi: F.abs(x - qi * s))
        ).alias("__err"),
    )
    return staged.select(
        id_col, "scale", "qvec", F.round("__err", 6).alias("max_err")
    )


def project_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    planes: list[list[int]] | None = None,
) -> DataFrame:
    """Random-projection dimensionality reduction: k = len(planes) exact
    dot products against deterministic +-1 hyperplanes — the cheap dim
    cut (64 -> 8 here) LLM pipelines apply before ANN indexing or
    clustering (Johnson-Lindenstrauss: pairwise distances survive up to
    1+-eps). Integer planes keep every projection an exact +- sum, so
    results hash-match across engines. Narrow per-row arithmetic: no
    shuffle, no Python, unconditionally scale-safe."""
    planes = planes or hyperplanes()
    v = as_double(vec_col)
    return df.select(
        F.col(id_col),
        *[
            F.round(dot(v, _plane_col(p)), 6).alias(f"p{i}")
            for i, p in enumerate(planes)
        ],
    )


def _assigned_shared(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    centroid_mod: int | None,
) -> DataFrame:
    """Persisted ``ivf_assign`` output + ``__nrm`` (exact JVM norm),
    memoized per (input plan, params) so sibling operators
    (``semantic_dedup`` / ``prototype_scores``) share one cached
    assignment and one quantizer build (ADVICE r4: the x66+x67 pair
    previously cached the same assignment twice and never released
    it)."""
    from twitter_kafka_etl_spark.operators._cache import plan_memo

    return plan_memo(
        df,
        ("ivf_assign_nrm", vec_col, id_col, centroid_mod),
        lambda: ivf_assign(df, vec_col, id_col, centroid_mod).withColumn(
            "__nrm", norm(F.col("v"))
        ),
    )


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_mod: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): coarse-cluster the embedding space, then prune
    near-duplicates *within* each cluster — the clustering is what makes
    semantic dedup tractable at corpus scale, bounding the quadratic
    pair search to cluster-sized blocks instead of the whole corpus.

    Stage 1 reuses the IVF coarse quantizer (``ivf_assign``): a
    deterministic ≈√n-cell assignment with driver-bounded broadcast
    state. At 100 TB the cells come from a real trained k-means; the
    plumbing — broadcast quantizer, narrow assignment pass, per-cell
    equi-join — is identical, which is the point of sharing the
    operator. Stage 2 generates candidate pairs with one BLAS matmul
    per cell (``applyInPandas`` over the cent_id groups — the same
    exact-candidate pattern as the blocked ``cosine_pairs`` path:
    anything whose approximate cosine clears ``threshold - 1e-6`` is
    emitted, so no qualifying pair is ever missed), then re-scores the
    surviving candidates with the exact sequential JVM fold. A document
    is dropped when any LOWER-id cell-mate clears the threshold (the
    greedy keep-lowest rule, deterministic with no iteration).

    Output: one row per DROPPED document — (vec_id, cluster_id,
    dup_of = its lowest-id qualifying neighbor, cos_sim to that
    neighbor). Anti-joining this against the corpus is the keep-set.

    Scale: pair scoring never leaves a cell (cells are ~n/√n rows, one
    Arrow batch + one O(c²·dim) BLAS matmul per cell — a trained
    k-means keeps cells balanced at 100 TB; the earlier pure-JVM
    per-pair fold measured 3× slower at sf1 because lambda HOFs never
    codegen); only (id_a, id_b, cent_id) candidate triples cross the
    exchange, and the final per-document reduction is a
    map-side-combined min/min_by aggregate. Every EMITTED cosine comes
    from the exact fold — bitwise equal to the DuckDB oracle's
    list_dot_product; numpy only nominates candidates.

    The assignment is persisted for the plan's lifetime and SHARED
    with ``prototype_scores`` via ``_assigned_shared`` (one cached
    copy for the x66+x67 pair instead of two; released on cache-entry
    eviction or session cache clear).

    Zero-norm embeddings are excluded up front on BOTH engines (the
    x66 oracle filters ``list_dot_product(v,v) > 0`` in its pair
    join): a zero vector has no cosine, and leaving the semantics to
    NaN comparison rules would make the two engines disagree —
    DuckDB's NaN sorts greater-than-everything, numpy's propagates.
    """
    assigned = _assigned_shared(df, vec_col, id_col, centroid_mod)
    nz = assigned.filter(F.col("__nrm") > 0)

    import numpy as np
    import pandas as pd

    cand_floor = threshold - 1e-6

    def _cell_pairs(pdf):
        if len(pdf) < 2:
            return pd.DataFrame(
                {"id_a": pd.Series(dtype="int64"),
                 "id_b": pd.Series(dtype="int64"),
                 "cent_id": pd.Series(dtype="int64")}
            )
        # id selected by NAME (closure-captured id_col), not position
        ids = pdf[id_col].to_numpy()
        mat = np.stack(pdf["v"].to_numpy())
        nrm = np.linalg.norm(mat, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0  # belt-and-braces: zero rows filtered upstream
        sims = (mat / nrm) @ (mat / nrm).T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sims[ia, ib] >= cand_floor
        return pd.DataFrame(
            {
                "id_a": np.minimum(ids[ia[keep]], ids[ib[keep]]),
                "id_b": np.maximum(ids[ia[keep]], ids[ib[keep]]),
                "cent_id": pdf["cent_id"].iloc[0],
            }
        )

    cands = nz.groupBy("cent_id").applyInPandas(
        _cell_pairs, "id_a bigint, id_b bigint, cent_id bigint"
    )
    va = nz.select(
        F.col(id_col).alias("id_a"),
        F.col("v").alias("va"),
        F.col("__nrm").alias("na"),
    )
    vb = nz.select(
        F.col(id_col).alias("id_b"),
        F.col("v").alias("vb"),
        F.col("__nrm").alias("nb"),
    )
    pairs = (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_b",
            "cent_id",
            "id_a",
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
                6,
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
    return pairs.groupBy("id_b", "cent_id").agg(
        F.min("id_a").alias("dup_of"),
        F.min_by("cos", "id_a").alias("cos_sim"),
    ).select(
        F.col("id_b").alias(id_col),
        F.col("cent_id").alias("cluster_id"),
        "dup_of",
        "cos_sim",
    )


def prototype_scores(
    df: DataFrame,
    keep_frac: float = 0.8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_mod: int | None = None,
) -> DataFrame:
    """Prototypicality-based data pruning (Sorscher et al. 2022,
    "Beyond neural scaling laws"): score every example by cosine to its
    cluster's mean embedding, then keep the top ``keep_frac`` of each
    cluster — the self-supervised pruning metric that paper shows can
    beat random subsampling at scale.

    Cluster assignment reuses the IVF coarse quantizer; the cluster
    mean is computed in long form (posexplode → one partial-agg shuffle
    on (cent_id, pos)) with DECIMAL(38,12) sums so the mean is
    order-independent under partitioning — the same determinism
    discipline as ``label_centroids``. The k×dim mean table re-assembles
    driver-free via array_sort(collect_list(struct(pos, m))) per cell
    (k·dim rows total — broadcast-sized at any corpus scale) and
    broadcast-joins back for a narrow per-row scoring pass.

    Output: every document with (vec_id, cluster_id, proto_cos,
    keep ∈ {0,1}). The per-cluster rank is a row_number window on
    (proto_cos DESC, vec_id) — an n/√n-row sort per cell; at extreme
    cell sizes the x41-style histogram-walk percentile replaces the
    sort, same cut semantics.

    The assignment is persisted for the plan's lifetime and SHARED
    with ``semantic_dedup`` via ``_assigned_shared``: the mean pass
    and the scoring pass both read the one cached copy the x66+x67
    pair builds.

    Zero-norm vectors are excluded (cosine to the mean is undefined —
    unguarded they'd NaN-rank FIRST and be kept in every cluster,
    displacing genuinely prototypical rows; r9 review finding), as is
    any cell whose mean degenerates to the zero vector (all its
    members' scores would be undefined). x92's ``n_zero`` counts what
    this drops.
    """
    assigned = _assigned_shared(df, vec_col, id_col, centroid_mod).filter(
        dot(F.col("v"), F.col("v")) > 0
    )
    means = (
        assigned.select("cent_id", F.posexplode("v").alias("pos", "val"))
        .groupBy("cent_id", "pos")
        .agg(
            F.sum(F.col("val").cast("decimal(38,12)")).alias("s"),
            F.count(F.lit(1)).alias("c"),
        )
        .select(
            "cent_id",
            "pos",
            F.round(F.col("s").cast("double") / F.col("c"), 6).alias("m"),
        )
        .groupBy("cent_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select(
            "cent_id", F.transform("pm", lambda x: x["m"]).alias("cvec")
        )
        .filter(dot(F.col("cvec"), F.col("cvec")) > 0)
    )
    scored = assigned.join(F.broadcast(means), "cent_id").select(
        F.col(id_col),
        F.col("cent_id").alias("cluster_id"),
        F.round(cosine(F.col("v"), F.col("cvec")), 6).alias("proto_cos"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("proto_cos"), F.col(id_col)
    )
    wc = Window.partitionBy("cluster_id")
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(wc))
        .select(
            id_col,
            "cluster_id",
            "proto_cos",
            (F.col("__rn") <= F.ceil(F.col("__n") * F.lit(keep_frac)))
            .cast("int")
            .alias("keep"),
        )
    )


def embedding_profile(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Embedding-table QA profile, per label: ``(label, n_vecs,
    dim_min, dim_max, n_zero, n_dup_vecs, mean_norm)`` — the pre-flight
    the similarity family (ANN, SemDeDup, prototypicality) runs before
    trusting a vector column. The four silent breakages it catches:
    ragged dimensions (dim_min != dim_max breaks every dot product),
    zero vectors (cosine is undefined — they score 0 against
    everything and pollute IVF cells), duplicate vectors (an upstream
    encoder re-run or join fan-out — they make every neighbor list a
    mirror), and a drifting norm profile (un-normalized batches mixed
    into a normalized table).

    Determinism: the per-vector norm is the engine's sequential
    double-precision fold (bitwise-identical to DuckDB's
    list_aggregate — the x07 discipline), immediately quantized to a
    scaled BIGINT so the per-label mean is an exact integer sum;
    duplicate detection groups on the RAW float array — no arithmetic,
    so float formatting never enters. ONE scan: the first aggregate
    groups on (label, vector) — dim and norm are functions of the
    vector, evaluated once per distinct copy — and every per-label
    statistic re-aggregates that vector-distinct table (n_vecs as
    Σ count, duplicate mass as Σ count where ≥2, norm mass as
    Σ count·normq), so no second pass over the source exists to pin.
    Output is |labels| rows.
    """
    vd = as_double(F.col(vec_col))
    normq = (
        F.round(norm(vd) * F.lit(1e6), 0).cast("bigint").alias("__nq")
    )
    base = df.select(
        F.col(label_col),
        F.col(vec_col).alias("__v"),
        F.size(F.col(vec_col)).alias("__dim"),
        normq,
    )
    g = base.groupBy(label_col, "__v", "__dim", "__nq").agg(
        F.count(F.lit(1)).alias("__c")
    )
    per = g.groupBy(label_col).agg(
        F.sum("__c").cast("bigint").alias("n_vecs"),
        F.min("__dim").cast("bigint").alias("dim_min"),
        F.max("__dim").cast("bigint").alias("dim_max"),
        F.sum(F.when(F.col("__nq") == 0, F.col("__c")).otherwise(0))
        .cast("bigint")
        .alias("n_zero"),
        F.sum(F.when(F.col("__c") >= 2, F.col("__c")).otherwise(0))
        .cast("bigint")
        .alias("n_dup_vecs"),
        F.sum(F.col("__c") * F.col("__nq")).alias("__snq"),
    )
    return per.select(
        F.col(label_col),
        "n_vecs",
        "dim_min",
        "dim_max",
        "n_zero",
        "n_dup_vecs",
        F.round(F.col("__snq").cast("double") / 1e6 / F.col("n_vecs"), 6)
        .alias("mean_norm"),
    )


def embedding_separation(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Class-separation audit of a labeled embedding table: per label,
    ``(label, n_scored, cohesion, nearest_label, inter_cos, margin)``
    where cohesion is the mean cosine of members to their own label's
    centroid, inter_cos the cosine between this centroid and its
    NEAREST other centroid, and margin = cohesion − inter_cos. A label
    whose margin ≤ 0 overlaps a neighbor more than it coheres —
    mislabeled or duplicated classes that poison both stratified
    mixtures and classifier-filtered curation; the embedding-space twin
    of the x69 label audit.

    Determinism: centroids are the DECIMAL(38,12)-exact means of
    ``label_centroids`` rounded to 6 dp; member cosines are sequential
    double folds against that rounded centroid (the x07 bitwise-identity
    discipline), quantized to scaled BIGINT before the per-label mean so
    the sum is exact-integer in any partition order; the nearest-other
    choice orders by (rounded cosine DESC, label) — no float tie-break.
    Zero-norm vectors are excluded from cohesion, and a label whose
    CENTROID degenerates to the zero vector is excluded entirely
    (cosine against it is undefined; unguarded, its NaN inter_cos
    would rank first in EVERY label's nearest-neighbor window and
    poison the whole audit — r9 review finding; x92 counts the zero
    members).

    Plan shape: one posexplode partial-agg shuffle for the centroids
    (output labels × dims — broadcast-sized at any corpus scale), a
    labels²-row centroid-pair comparison entirely on that broadcast
    table, and ONE narrow scoring pass over the vectors against the
    broadcast centroid map. Nothing but the centroid agg shuffles the
    big table.
    """
    from pyspark.sql import Window

    cents = label_centroids(df, vec_col, label_col)
    cv = (
        cents.groupBy(label_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "centroid"))).alias("pm"))
        .select(
            label_col, F.transform("pm", lambda x: x["centroid"]).alias("cvec")
        )
        .filter(dot(F.col("cvec"), F.col("cvec")) > 0)
    )
    vd = as_double(F.col(vec_col))
    base = df.select(F.col(label_col), vd.alias("__v")).filter(
        dot(F.col("__v"), F.col("__v")) > 0
    )
    coh = (
        base.join(F.broadcast(cv), label_col)
        .select(
            label_col,
            F.round(cosine(F.col("__v"), F.col("cvec")) * 1e6, 0)
            .cast("bigint")
            .alias("__cq"),
        )
        .groupBy(label_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_scored"),
            F.sum("__cq").alias("__s"),
        )
    )
    a = cv.select(F.col(label_col).alias("__la"), F.col("cvec").alias("__ca"))
    b = cv.select(F.col(label_col).alias("__lb"), F.col("cvec").alias("__cb"))
    pairs = a.join(F.broadcast(b), F.col("__la") != F.col("__lb")).select(
        "__la",
        "__lb",
        F.round(cosine(F.col("__ca"), F.col("__cb")), 6).alias("inter_cos"),
    )
    w = Window.partitionBy("__la").orderBy(F.desc("inter_cos"), F.col("__lb"))
    nearest = (
        pairs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("__la").alias(label_col),
            F.col("__lb").alias("nearest_label"),
            "inter_cos",
        )
    )
    return coh.join(nearest, label_col).select(
        label_col,
        "n_scored",
        F.round(F.col("__s").cast("double") / 1e6 / F.col("n_scored"), 6).alias(
            "cohesion"
        ),
        "nearest_label",
        "inter_cos",
        F.round(
            F.round(F.col("__s").cast("double") / 1e6 / F.col("n_scored"), 6)
            - F.col("inter_cos"),
            6,
        ).alias("margin"),
    )
