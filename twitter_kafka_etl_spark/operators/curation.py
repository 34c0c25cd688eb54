"""Training-data curation operators: sampling, splits, packing, chunking.

The operations an LLM data pipeline runs between "deduped corpus" and
"training batches". All are deterministic — sampling and splits hash a
stable id (md5-derived, like the dedup family) instead of rand(), so a
re-run, a retry, or another engine produces the same subset; packing
and chunking are pure window/array arithmetic. Everything is
shuffle-minimal: sampling/splits/chunking are narrow per-row ops,
packing is one window over (partition, order).

At 100 TB: hash-sampling is the only defensible sampling (Bernoulli
rand() changes under retries and cannot be reproduced for an ablation);
split membership must be a pure function of the id or train/test leak
across reshuffles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from twitter_kafka_etl_spark.operators._cache import eager_persist


def _hash32(salt: str, c: Column) -> Column:
    """First 8 md5 hex chars of salt||id as a BIGINT in [0, 2^32) — the
    one salted-hash primitive behind hash_bucket / weighted_sample
    (single definition so the engine-portability recipe cannot drift
    between inline copies; r9 review finding)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), c)), 1, 8), 16, 10
    ).cast("bigint")


def hash_bucket(id_col: str | Column, salt: str, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets): md5 of salt+id, first 8 hex
    chars, mod buckets. Stable across engines, runs, and partitionings."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return _hash32(salt, c.cast("string")) % buckets


def hash_sample(
    df: DataFrame, id_col: str, rate_pct: int, salt: str = "sample"
) -> DataFrame:
    """Reproducible ``rate_pct``% sample keyed on the id hash — the same
    rows are selected on every run and engine (rand()-based sampling is
    neither)."""
    return df.filter(hash_bucket(id_col, salt) < rate_pct)


def split_assign(
    df: DataFrame,
    id_col: str,
    fractions: Sequence[tuple[str, int]] = (("train", 90), ("val", 5), ("test", 5)),
    salt: str = "split",
    out: str = "split",
) -> DataFrame:
    """Disjoint train/val/test assignment from contiguous hash ranges.
    Membership is a pure function of the id: no leakage under
    reshuffling, appending, or re-running. Percentages must sum to 100."""
    total = sum(p for _, p in fractions)
    if total != 100:
        raise ValueError(f"fractions must sum to 100, got {total}")
    b = hash_bucket(id_col, salt)
    expr = None
    lo = 0
    for name, pct in fractions:
        cond = (b >= lo) & (b < lo + pct)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += pct
    return df.withColumn(out, expr)


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    out: str = "seq_id",
) -> DataFrame:
    """Assign documents to fixed-token-budget training sequences: within
    each partition (e.g. source), in a stable order, a document joins the
    sequence its cumulative start offset falls in (seq = floor(tokens
    before it / budget)). One window shuffle; downstream groupBy(seq_id)
    concatenates."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return df.withColumn(out, F.floor(cum_before / budget).cast("bigint"))


def chunk_spans(
    df: DataFrame,
    token_col: str,
    size: int = 128,
    overlap: int = 32,
    id_col: str = "doc_id",
) -> DataFrame:
    """Context-window chunking: a doc of T tokens yields chunks starting
    at 0, size-overlap, 2(size-overlap), … while the start is < T (so
    every token is covered and consecutive chunks share ``overlap``
    tokens). Pure array arithmetic + explode — no shuffle, no Python.
    Output: (id, chunk_idx, start_tok, chunk_tokens).

    ``overlap`` must be smaller than ``size``: a zero stride would make
    the chunk count NULL (non-ANSI division by zero) and explode would
    then silently DROP every document longer than one window, and a
    negative stride would emit descending/negative spans — both are
    caller bugs, rejected loudly (r9 review finding)."""
    if size <= 0 or overlap < 0 or overlap >= size:
        raise ValueError(
            f"chunk_spans needs 0 <= overlap < size; got size={size}, "
            f"overlap={overlap}"
        )
    stride = size - overlap
    t = F.col(token_col)
    n_chunks = F.when(t <= size, F.lit(1)).otherwise(
        F.ceil((t - F.lit(size)) / stride) + 1
    )
    idx = F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int")))
    out = df.select(F.col(id_col), t.alias("__t"), idx.alias("chunk_idx"))
    start = F.col("chunk_idx") * stride
    return out.select(
        id_col,
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        start.cast("bigint").alias("start_tok"),
        F.least(F.lit(size), F.col("__t") - start).cast("bigint").alias("chunk_tokens"),
    )


def select_keepers(
    scored: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "quality_score",
    component_col: str = "component_id",
) -> DataFrame:
    """The dedup *decision*: given per-document quality scores and the
    duplicate clusters from ``dedup.connected_components``, keep exactly
    one document per cluster — the highest-quality member, ties broken
    by min id (so the choice is deterministic under any partitioning).
    This is the step LLM pipelines run between "pairs found" and "rows
    dropped": near-dup groups keep their best-written member, not an
    arbitrary one.

    One window shuffle on the component key; singleton components pass
    through as their own keeper. Output: (id, component, score, keep).
    """
    joined = components.join(
        scored.select(F.col(id_col), F.col(score_col)), id_col
    )
    w = Window.partitionBy(component_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return joined.withColumn("__r", F.row_number().over(w)).select(
        F.col(id_col),
        F.col(component_col),
        F.col(score_col),
        (F.col("__r") == 1).alias("keep"),
    )


def length_percentile_flags(
    df: DataFrame,
    q_lo: int = 10,
    q_hi: int = 90,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flag documents outside the corpus's [p_lo, p_hi] token-length
    band — the outlier filter a training mix applies before packing
    (truncated fragments below, concatenation junk above).

    Percentiles are EXACT discrete quantiles computed scale-safely: the
    length histogram (groupBy length — bounded by the distinct-length
    count, not the corpus) gets a cumulative count; p_q = the smallest
    length whose cumulative count reaches ceil(N*q/100). The window
    ordering runs over the tiny histogram, never the corpus; thresholds
    broadcast back as a one-row frame. All arithmetic is integer, so
    both engines agree bit-for-bit.
    """
    lens = df.select(
        F.col(id_col), F.size(F.split(F.col(text_col), " ")).alias("n_tokens")
    )
    hist = lens.groupBy("n_tokens").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("n_tokens").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("c").over(w))
    n_total = lens.agg(F.count(F.lit(1)).alias("n"))
    # ceil(n*q/100) in pure integer arithmetic: (n*q + 99) div 100
    th = (
        cum.join(F.broadcast(n_total))
        .agg(
            F.min(
                F.when(
                    F.col("cum") >= F.expr(f"(n * {q_lo} + 99) div 100"),
                    F.col("n_tokens"),
                )
            ).alias("p_lo"),
            F.min(
                F.when(
                    F.col("cum") >= F.expr(f"(n * {q_hi} + 99) div 100"),
                    F.col("n_tokens"),
                )
            ).alias("p_hi"),
        )
    )
    return lens.join(F.broadcast(th)).select(
        F.col(id_col),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        (F.col("n_tokens") < F.col("p_lo")).alias("flag_short"),
        (F.col("n_tokens") > F.col("p_hi")).alias("flag_long"),
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: Sequence[str],
    n_per_stratum: int,
    id_col: str,
    salt: str = "strat",
) -> DataFrame:
    """Deterministic stratified sampling: exactly ``n_per_stratum`` rows
    per stratum (fewer if the stratum is smaller), selected by md5 order
    so the same rows are chosen on every run, engine, and partitioning —
    the per-group analog of ``hash_sample`` for balancing skewed classes
    (languages, sources) in a training mix.

    One window shuffle on the strata key; the md5 sort key is salted so
    different sampling purposes draw independent subsets.
    """
    from pyspark.sql import Window

    key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(*strata_cols).orderBy(key, F.col(id_col))
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n_per_stratum)
        .withColumn("sample_rank", F.col("sample_rank").cast("bigint"))
    )


def balance_strata(
    df: DataFrame,
    strata_cols: Sequence[str],
    id_col: str,
    salt: str = "balance",
) -> DataFrame:
    """Class-balance a skewed corpus: downsample every stratum to the
    size of the SMALLEST stratum, selecting members in salted-md5 order
    — the deterministic, data-dependent form of ``stratified_sample``
    (there the cap is given; here it comes from the data). The language/
    source balancing step of a training-mix build, reproducible under
    any partitioning or re-run.

    Plan: per-stratum sizes (partial-agg shuffle) → global min as a
    broadcast one-row frame (no driver action) → per-stratum md5-order
    rank (one window shuffle) filtered to the cap.
    """
    sizes = df.groupBy(*strata_cols).agg(F.count(F.lit(1)).alias("__n"))
    cap = sizes.agg(F.min("__n").alias("__cap"))
    key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(*strata_cols).orderBy(key, F.col(id_col))
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .join(F.broadcast(cap))
        .filter(F.col("sample_rank") <= F.col("__cap"))
        .select(
            *df.columns, F.col("sample_rank").cast("bigint").alias("rank")
        )
    )


DEFAULT_LENGTH_BUCKETS = (64, 128, 256, 512, 1024, 2048, 4096)


def length_bucket(
    token_count: Column,
    boundaries: Sequence[int] = DEFAULT_LENGTH_BUCKETS,
) -> Column:
    """Smallest configured bucket that holds ``token_count`` tokens;
    documents longer than the largest bucket truncate into it (the
    model's context limit). Fixed integer boundaries — no float log2 —
    so the assignment is bitwise-identical on any engine."""
    bs = sorted(boundaries)
    expr = None
    for b in bs:
        cond = token_count <= b
        expr = F.when(cond, b) if expr is None else expr.when(cond, b)
    return expr.otherwise(bs[-1])


def length_bucket_stats(
    df: DataFrame,
    text_col: str = "text",
    boundaries: Sequence[int] = DEFAULT_LENGTH_BUCKETS,
) -> DataFrame:
    """Sequence-length bucketing with padding-waste accounting — the
    batch-shape decision for training/inference: every sequence in a
    batch pads to its bucket size, so waste = bucket - effective_tokens
    is compute burned on pad tokens. Output per bucket: doc count,
    effective token total (post-truncation), padded token total
    (bucket × docs), waste, and waste fraction.

    All JVM expressions over whitespace tokens (the corpus convention,
    text.token_stats), one partial-agg shuffle on ≤len(boundaries)
    keys — scale-free."""
    bs = sorted(boundaries)
    n = F.size(F.split(F.col(text_col), " ")).cast("bigint")
    eff = F.least(n, F.lit(bs[-1]).cast("bigint"))
    b = length_bucket(eff, bs).cast("bigint")
    per_doc = df.select(b.alias("bucket"), eff.alias("__eff"))
    return (
        per_doc.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__eff").alias("total_tokens"),
        )
        .select(
            "bucket",
            "n_docs",
            "total_tokens",
            (F.col("bucket") * F.col("n_docs")).alias("padded_tokens"),
            (F.col("bucket") * F.col("n_docs") - F.col("total_tokens")).alias(
                "padding_waste"
            ),
            F.round(
                (F.col("bucket") * F.col("n_docs") - F.col("total_tokens"))
                / (F.col("bucket") * F.col("n_docs")),
                6,
            ).alias("waste_frac"),
        )
    )


def mixture_sample(
    df: DataFrame,
    source_col: str,
    id_col: str,
    weights: dict[str, int],
    default_pct: int = 100,
    salt: str = "mixture",
) -> DataFrame:
    """Per-source weighted sampling — the dataset-mixture step of a
    training-mix build (each source kept at its own rate, e.g. web 30%,
    reference text 100%). Rates are integer percents applied through
    the same salted-md5 bucket as ``hash_sample``, so the selected set
    is a pure function of (salt, id): reproducible under retries,
    re-partitioning, and across engines — and a different salt draws an
    independent mixture from the same corpus.

    Narrow per-row filter, no shuffle; the per-source rate CASE is a
    broadcast-free literal expression (mixture configs are small)."""
    for s, p in weights.items():
        if not 0 <= p <= 100:
            raise ValueError(f"rate for {s!r} must be in [0, 100], got {p}")
    if not 0 <= default_pct <= 100:
        raise ValueError(f"default_pct must be in [0, 100], got {default_pct}")
    rate = None
    for s, p in sorted(weights.items()):
        cond = F.col(source_col) == s
        rate = F.when(cond, p) if rate is None else rate.when(cond, p)
    rate = F.lit(default_pct) if rate is None else rate.otherwise(default_pct)
    return df.filter(hash_bucket(id_col, salt) < rate)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus snapshot delta — the recrawl/refresh primitive: classify
    every id across two snapshots as added / removed / changed /
    unchanged by comparing content fingerprints, so the downstream
    pipeline reprocesses ONLY the delta instead of re-curating 100 TB.

    One full-outer equi-join on the id (single shuffle; zero with
    co-bucketed snapshot tables); fingerprints are md5 over the text,
    computed map-side, so "changed" is content-defined rather than
    trusting upstream modification flags. Output:
    (id, status, fp_old, fp_new).
    """
    o = old.select(
        F.col(id_col).alias("__id"), F.md5(F.col(text_col)).alias("fp_old")
    )
    n = new.select(
        F.col(id_col).alias("__id"), F.md5(F.col(text_col)).alias("fp_new")
    )
    status = (
        F.when(F.col("fp_old").isNull(), "added")
        .when(F.col("fp_new").isNull(), "removed")
        .when(F.col("fp_old") == F.col("fp_new"), "unchanged")
        .otherwise("changed")
    )
    return (
        o.join(n, "__id", "full_outer")
        .select(
            F.col("__id").alias(id_col),
            status.alias("status"),
            "fp_old",
            "fp_new",
        )
    )


def quality_gate(
    docs: DataFrame,
    min_tokens: int = 24,
    max_tokens: int = 100_000,
    min_distinct_ratio: float = 0.35,
    max_stopword_ratio: float = 0.12,
    max_dup_frac: float = 0.08,
    max_top_share: float = 0.10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher/C4-style quality-filter battery: the composed keep/drop
    verdict a pre-training pipeline applies after scoring — length
    bounds, distinct-token ratio (repetitive text), stopword-fraction
    ceiling (boilerplate), duplicate-2-gram fraction and
    most-repeated-2-gram share (template spam). Emits one 0/1 flag per
    rule (so drop *reasons* are aggregable — pipelines tune rules from
    exactly this breakdown) plus the conjunctive ``keep``.

    Every ratio is an exact int/int double computed identically in any
    engine, so the threshold comparisons are reproducible bit-for-bit —
    the property that makes a filter config auditable across reruns.
    Plan: quality_features is narrow per-row; repetition_signals adds
    its two partial-agg shuffles; the final join is id-equi. Flags are
    BIGINT 0/1 (not boolean) so downstream rollups sum them directly.
    """
    from twitter_kafka_etl_spark.operators.text import (
        quality_features,
        repetition_signals,
    )

    def flag(c: Column) -> Column:
        return c.cast("bigint")

    q = quality_features(docs).select(
        id_col, "n_tokens", "distinct_ratio", "stopword_ratio"
    )
    r = repetition_signals(docs, n=2).select(id_col, "dup_frac", "top_share")
    g = q.join(r, id_col)
    return g.select(
        F.col(id_col),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        flag(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("n_tokens") <= max_tokens)
        ).alias("pass_length"),
        flag(F.col("distinct_ratio") >= min_distinct_ratio).alias(
            "pass_distinct"
        ),
        flag(F.col("stopword_ratio") <= max_stopword_ratio).alias(
            "pass_stopword"
        ),
        flag(F.col("dup_frac") <= max_dup_frac).alias("pass_repetition"),
        flag(F.col("top_share") <= max_top_share).alias("pass_top_share"),
        flag(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("n_tokens") <= max_tokens)
            & (F.col("distinct_ratio") >= min_distinct_ratio)
            & (F.col("stopword_ratio") <= max_stopword_ratio)
            & (F.col("dup_frac") <= max_dup_frac)
            & (F.col("top_share") <= max_top_share)
        ).alias("keep"),
    )


def k_anonymity(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination: every
    equivalence class (distinct quasi-identifier tuple) with its size
    and whether it meets the ``k`` threshold — classes below ``k`` are
    re-identification risks a release pipeline must suppress or
    generalize before publishing. One partial-agg shuffle on the
    quasi-identifier tuple; output is bounded by the number of distinct
    classes, never the corpus.
    """
    qc = [F.col(c) for c in quasi_cols]
    return (
        df.groupBy(*qc)
        .agg(F.count(F.lit(1)).alias("class_size"))
        .select(
            *qc,
            F.col("class_size").cast("bigint").alias("class_size"),
            (F.col("class_size") >= k).cast("bigint").alias("k_anonymous"),
        )
    )


def dsir_weights(
    df: DataFrame,
    target_source: str,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    top_k: int = 100,
) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling", arXiv:2302.03169):
    weight every document by the log-likelihood ratio of its hashed
    unigram features under a target domain vs the raw corpus, and keep
    the ``top_k`` highest-weighted documents — the importance-sampling
    recipe for steering a web-scale crawl toward a curated target.

    Determinism across engines (the log problem): per-document float
    sums of log-ratios are order-dependent under partitioning, and
    Spark's Math.log and the oracle's libm can drift a ulp apart. Both
    are solved at the FEATURE level — the per-bucket log-ratio is
    quantized ONCE to a scaled BIGINT (round(ln(p/q)·1e6)), so the
    per-document reduction is an exact integer sum in any order, and a
    ulp flip would have to land within 5e-7 of a rounding boundary on
    one of only ``n_buckets`` values to matter at all.

    Smoothing is add-one over the bucket vocabulary: p_b=(tc_b+1)/(T+B),
    q_b=(cc_b+1)/(C+B); the ratio is formed as one integer-product
    division so both engines feed ln() the identical double (products
    stay exact below 2^53 — at larger corpora, pre-divide the counts).

    Scale: the feature table is one explode + two bounded groupBys
    (≤ n_buckets rows each — broadcast-sized forever); the per-document
    pass is a broadcast join + one partial-agg shuffle on the id; the
    final top-k is a distributed TakeOrdered heap, never a global sort.
    """
    from twitter_kafka_etl_spark.operators.dedup import MERSENNE, token_hash

    tb = df.select(
        F.col(id_col),
        F.col(source_col),
        F.explode(F.split(F.col(text_col), " ")).alias("__tok"),
    ).select(
        id_col,
        source_col,
        F.pmod(token_hash(F.col("__tok")), F.lit(n_buckets)).alias("b"),
    )
    cc = tb.groupBy("b").agg(F.count(F.lit(1)).alias("cc"))
    tc = (
        tb.filter(F.col(source_col) == target_source)
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("tc"))
    )
    tot = cc.agg(F.sum("cc").alias("ctot")).crossJoin(
        tc.agg(F.sum("tc").alias("ttot"))
    )
    lr = (
        cc.join(tc, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.round(
                F.log(
                    (
                        (F.coalesce(F.col("tc"), F.lit(0)) + 1)
                        * (F.col("ctot") + n_buckets)
                    ).cast("double")
                    / ((F.col("cc") + 1) * (F.col("ttot") + n_buckets))
                )
                * F.lit(1e6),
                0,
            )
            .cast("bigint")
            .alias("lr"),
        )
    )
    db = tb.groupBy(id_col, "b").agg(F.count(F.lit(1)).alias("cnt"))
    w = (
        db.join(F.broadcast(lr), "b")
        .groupBy(id_col)
        .agg(F.sum(F.col("cnt") * F.col("lr")).alias("wi"))
        .select(
            id_col,
            F.round(F.col("wi").cast("double") / F.lit(1e6), 6).alias(
                "dsir_logweight"
            ),
        )
    )
    return (
        w.join(df.select(id_col, source_col), id_col)
        .orderBy(F.desc("dsir_logweight"), id_col)
        .limit(top_k)
        .select(id_col, source_col, "dsir_logweight")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str = "n_chars",
    k: int = 5,
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling without replacement, k per group
    (Efraimidis & Spirakis 2006 A-ES): each row gets key u^(1/w) for a
    uniform u and weight w, and the k largest keys per group are an
    exact weighted sample. Ranking by ln(u)/w instead — the strictly
    monotone log of the key (u∈(0,1] ⇒ ln u ≤ 0) — keeps every
    intermediate in the well-conditioned range both engines compute
    identically, instead of u^(1/w) underflowing for large weights.

    u is md5-derived from (salt, id) — the hash-not-rand() contract the
    rest of the curation family keeps: a retry, a re-partitioning, or
    another engine selects the SAME sample, which rand()-keyed reservoirs
    cannot promise. u = (h+1)/2^32 over the first 8 md5 hex chars, so
    u ∈ (0, 1] and ln(u) is always defined.

    One hash-partition shuffle on ``group_col`` for the rank window. At
    100 TB with few giant groups, pre-reduce each map partition to its
    local top-k first (the window only needs candidates that could rank
    ≤ k globally); the full window form here is the semantics.

    Rows with w ≤ 0 carry no sampling mass and are excluded up front
    (ln(u)/w would invert the ordering for them, silently making the
    LIGHTEST rows certain winners).
    """
    c = F.col(id_col).cast("string")
    h = _hash32(salt, c)
    u = (h + F.lit(1)).cast("double") / F.lit(4294967296.0)
    key = F.log(u) / F.col(weight_col).cast("double")
    w = Window.partitionBy(group_col).orderBy(
        F.desc("__aes_key"), F.col(id_col)
    )
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__aes_key", key)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(group_col, id_col, F.col(weight_col).alias("weight"))
    )


def psi_drift(
    df: DataFrame,
    cohort: Column,
    value_col: str = "n_chars",
    bucket_width: int = 256,
    n_buckets: int = 16,
) -> DataFrame:
    """Population Stability Index terms between two cohorts of one
    corpus — the distribution-drift audit run between crawl snapshots
    or supplier feeds (row-level ``snapshot_diff`` says WHICH docs
    changed; PSI says whether the corpus SHAPE moved, which is what
    decides re-mixing). PSI = Σ (p_i - q_i) ln(p_i / q_i); the usual
    reading: < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted.

    ``cohort`` must evaluate to 'base' or 'cand' per row. Buckets are
    fixed-width integer intervals of ``value_col`` (capped into a final
    overflow bucket) — integer arithmetic, so bucket membership is
    exact on any engine, unlike quantile-derived edges which would make
    the audit depend on an estimated split. Counts use +1/2 smoothing
    over the FULL bucket spine (empty buckets included via a broadcast
    range join) so ln is always finite and the result is defined even
    for disjoint supports.

    One partial-agg pass over the corpus → n_buckets rows; every
    downstream term is arithmetic on exact integer counts. Driver-safe
    and partition-invariant at any scale.
    """
    # clamp BOTH ends into the spine: values past the top land in the
    # overflow bucket, negatives (legal for a generic value_col — a
    # delta, a score) in bucket 0. Without the bottom clamp they would
    # bucket outside 0..n_buckets-1 and silently vanish at the spine
    # join, deflating the cohort totals.
    b = F.greatest(
        F.lit(0),
        F.least(
            (F.col(value_col).cast("bigint") / F.lit(bucket_width)).cast(
                "bigint"
            ),
            F.lit(n_buckets - 1),
        ),
    )
    counts = (
        df.withColumn("bucket", b)
        .groupBy("bucket")
        .agg(
            F.sum(F.when(cohort == "base", 1).otherwise(0)).alias("n_base"),
            F.sum(F.when(cohort == "cand", 1).otherwise(0)).alias("n_cand"),
        )
    )
    return psi_from_counts(counts, n_buckets)


def psi_from_counts(counts: DataFrame, n_buckets: int = 16) -> DataFrame:
    """PSI terms from pre-aggregated per-bucket counts
    (bucket, n_base, n_cand) — the merge step a monitor runs after
    accumulating counts incrementally (e.g. per micro-batch from a
    stream, or per corpus shard): counts are associative, PSI is not,
    so accumulate-then-PSI is the only correct decomposition. Missing
    buckets are restored from the broadcast spine before smoothing.
    See ``psi_drift`` for the semantics and smoothing contract."""
    spine = counts.sparkSession.range(n_buckets).select(
        F.col("id").alias("bucket")
    )
    joined = spine.join(counts, "bucket", "left").select(
        "bucket",
        F.coalesce("n_base", F.lit(0)).cast("bigint").alias("n_base"),
        F.coalesce("n_cand", F.lit(0)).cast("bigint").alias("n_cand"),
    )
    tot = joined.agg(
        F.sum("n_base").alias("t_base"), F.sum("n_cand").alias("t_cand")
    )
    half = F.lit(0.5)
    denom_b = F.col("t_base") + half * n_buckets
    denom_c = F.col("t_cand") + half * n_buckets
    p = (F.col("n_base") + half) / denom_b
    q = (F.col("n_cand") + half) / denom_c
    return (
        joined.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n_base",
            "n_cand",
            F.round((p - q) * F.log(p / q), 6).alias("psi_term"),
        )
    )


def robust_outliers(
    df: DataFrame,
    value_col: str = "n_chars",
    group_cols: tuple[str, ...] = ("source",),
    k: int = 3,
) -> DataFrame:
    """Per-group robust outlier flags by discrete median/MAD — the
    length-anomaly screen that, unlike mean/stddev z-scores, a handful
    of giant documents cannot drag (median and MAD have a 50%
    breakdown point; the mean's is 0).

    Built on ``grouped_percentiles``'s exact discrete median (ceil-rule
    cumulative walk over the value histogram — never a per-group sort),
    applied twice: once on the value, once on |value - median|. For
    integer values every quantity here — deviation, MAD, the k·MAD
    threshold — stays in integer arithmetic end to end, so the flag is
    bit-identical on any engine and partitioning. Three partial-agg
    shuffles + two histogram windows; nothing quadratic, nothing
    collected.
    """
    from twitter_kafka_etl_spark.operators.relational import grouped_percentiles

    g = list(group_cols)
    med = grouped_percentiles(df, value_col, tuple(group_cols), qs=(50,)).select(
        *g, F.col("p50").alias("med")
    )
    dev = df.join(med, g).withColumn(
        "__ad", F.abs(F.col(value_col) - F.col("med"))
    )
    mad = grouped_percentiles(dev, "__ad", tuple(group_cols), qs=(50,)).select(
        *g, F.col("p50").alias("mad")
    )
    return (
        dev.join(mad, g)
        .withColumn("is_outlier", F.col("__ad") > k * F.col("mad"))
        .drop("__ad")
    )


def mixture_temperature(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    alpha: float = 0.7,
) -> DataFrame:
    """Temperature-scaled mixture weights per source: w_i ∝ share_i^α
    with share_i the source's fraction of corpus tokens — the standard
    multinomial up/down-sampling rule (α=0.7 in GPT-3's and mT5's data
    mixes; α=1 keeps natural proportions, α→0 approaches uniform) a
    pipeline computes before writing its sampling plan. Output per
    source: ``(source, n_docs, n_tokens, raw_share, temp_weight,
    boost)`` where ``boost`` = temp_weight / raw_share is the effective
    epoch multiplier each source sees (>1 = upsampled).

    Determinism: the per-source token counts are exact integers from
    one partial-agg pass; shares are single int64/int64 divisions;
    pow() is evaluated once per source and immediately quantized to a
    scaled BIGINT (1e12) so the normalizing sum — the only
    order-sensitive reduction — is an exact integer sum, identical
    under any partitioning and engine (the x70/x83 discipline applied
    to a |sources|-row table).

    Scale: one tokenize+agg pass over the corpus; everything after is
    |sources| rows against two 1-row aggregates — driver-safe at any
    corpus size (source cardinality is bounded by the catalog, not the
    data).
    """
    from twitter_kafka_etl_spark.operators.text import tokenize


    # |sources| rows, but its lineage is the corpus scan — pin it so
    # the total and the weight projection don't each re-scan
    per = eager_persist(
        df.select(group_col, F.size(tokenize(text_col)).alias("__n"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__n").alias("n_tokens"),
        )
    )
    return temperature_weights(per, group_col=group_col, alpha=alpha)


def temperature_weights(
    counts: DataFrame,
    group_col: str = "source",
    tokens_col: str = "n_tokens",
    by: tuple[str, ...] = (),
    alpha: float = 0.7,
) -> DataFrame:
    """The temperature math itself, over a precomputed counts table —
    the single site of the share^α → quantize → exact-sum → normalize
    rule (same single-site discipline as the bigram prefix rule), so
    the batch audit (x86) and the streaming monitor (qs16) can never
    disagree on what a temperature weight is.

    ``counts``: one row per (*by, group) with ``tokens_col`` (plus any
    carry-through columns, all preserved); normalization runs WITHIN
    each ``by`` group (qs16 passes ``by=("batch",)`` to get a weight
    table per micro-batch horizon). Caller persists ``counts`` if its
    lineage is expensive — this helper only adds group-bounded
    aggregates and joins on top."""
    keys = list(by)
    tot = (
        counts.groupBy(*keys).agg(F.sum(tokens_col).alias("__tot"))
        if keys
        else counts.agg(F.sum(tokens_col).alias("__tot"))
    )
    joined = counts.join(tot, keys) if keys else counts.crossJoin(tot)
    share = F.col(tokens_col).cast("double") / F.col("__tot")
    p = joined.withColumns(
        {
            "__share": share,
            "__pwq": F.round(F.pow(share, F.lit(alpha)) * F.lit(1e12), 0)
            .cast("bigint"),
        }
    ).drop("__tot")
    den = p.groupBy(*keys).agg(F.sum("__pwq").alias("__den")) if keys else p.agg(
        F.sum("__pwq").alias("__den")
    )
    p2 = p.join(den, keys) if keys else p.crossJoin(den)
    w = F.col("__pwq").cast("double") / F.col("__den")
    # carry columns pass through UNCHANGED — a cast here would silently
    # truncate a double or null a string carry; only the tokens column
    # (an integer count by contract) is normalized to bigint for the
    # cross-engine dtype-exact compare
    carry = [
        c
        for c in counts.columns
        if c not in keys and c != group_col and c != tokens_col
    ]
    return p2.select(
        *keys,
        F.col(group_col),
        *[F.col(c) for c in carry],
        F.col(tokens_col).cast("bigint").alias(tokens_col),
        F.round("__share", 6).alias("raw_share"),
        F.round(w, 6).alias("temp_weight"),
        F.round(w / F.col("__share"), 6).alias("boost"),
    )


def packing_stats(
    df: DataFrame,
    budget: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Per-source packing yield at a given sequence budget: ``(source,
    n_docs, n_tokens, n_seqs, fill_rate)`` where ``n_seqs`` is the
    number of ``budget``-token compute units the source's concatenated
    token stream spans (``ceil(total_tokens / budget)``, exact integer
    arithmetic) and ``fill_rate`` = tokens / (n_seqs × budget) — the
    fraction of the training compute that is real data rather than the
    final partial block, under the ``pack_sequences`` offset rule
    (documents stream contiguously; seq ids label where each doc
    STARTS). The number a batch-shape decision actually optimizes:
    x49 accounts padding for FIXED buckets, this accounts the packed
    alternative, and the two together are the bucket-vs-pack tradeoff
    table.

    Counting DISTINCT seq ids (the pre-r9 rule) undercounts compute:
    a document longer than the budget skips the intermediate seq
    labels it streams through, so ``fill_rate`` could exceed 1 — a
    nonsense "fraction" that inverted the tradeoff comparison (r9
    review finding). One partial-agg pass, no window shuffle. Output
    is |sources| rows.
    """
    from twitter_kafka_etl_spark.operators.text import tokenize

    t = df.select(
        F.col(group_col),
        F.size(tokenize(text_col)).alias("__tok"),
    )
    # exact ceil on BIGINTs: (sum + budget-1) div budget — float
    # division could land a hair under an exact quotient and truncate
    units = F.expr(f"(sum(__tok) + {budget - 1}) div {budget}")
    return t.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("__tok").cast("bigint").alias("n_tokens"),
        units.cast("bigint").alias("n_seqs"),
        F.round(
            F.when(
                F.sum("__tok") > 0,
                F.sum("__tok") / (units * budget).cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("fill_rate"),
    )


def feature_correlation(
    df: DataFrame,
    text_col: str = "text",
    chars_col: str = "n_chars",
) -> DataFrame:
    """Pairwise Pearson correlation between the per-document integer
    features a curation pipeline filters on — declared char count,
    whitespace tokens, distinct tokens — in long form ``(feat_x,
    feat_y, n_docs, pearson)``. The feature-redundancy audit run
    before building a quality classifier or stratifying a mixture: a
    pair at |r| ≈ 1 is one signal counted twice (weighting it double
    in a gate silently doubles its influence), and a declared-length
    column that does NOT correlate ≈ 1 with the recomputed token
    count exposes a corrupted ingest.

    Determinism: Pearson is computed from the five raw moment sums
    (n, Σx, Σy, Σx², Σy², Σxy), and every feature is an INTEGER, so
    the sums are exact BIGINT in any partition order — the float math
    is a fixed expression dag over those exact integers, identical
    across engines (the scaled-BIGINT discipline of the quality
    rollup, applied to second moments). Degenerate variance yields
    0.0, not NaN, in both engines.

    Plan shape: ONE scan → one partial-aggregated global agg to a
    single moment row (map-side combine does nearly all the work; the
    exchange carries one row per task) → the 3 output rows are
    projected from that row with no further scan. At 100 TB the only
    caveat is BIGINT headroom on Σxy: with per-doc features capped at
    ~10⁶ the second moments stay < 2⁶³ up to ~10⁴ PB of documents —
    lift the sums to DECIMAL(38,0) past that.
    """
    from twitter_kafka_etl_spark.operators.text import tokenize

    names = ["f_chars", "f_tokens", "f_types"]
    toks = tokenize(text_col)
    feats = df.select(
        F.col(chars_col).cast("bigint").alias("f_chars"),
        F.size(toks).cast("bigint").alias("f_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("f_types"),
    )
    pairs = [(a, b) for i, a in enumerate(names) for b in names[i + 1 :]]
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    for a in names:
        aggs.append(F.sum(a).alias(f"s_{a}"))
        aggs.append(F.sum(F.col(a) * F.col(a)).alias(f"ss_{a}"))
    for a, b in pairs:
        aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"sp_{a}_{b}"))
    one = feats.agg(*aggs)

    def _pearson(a: str, b: str) -> Column:
        n = F.col("n")
        cov = (n * F.col(f"sp_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}"))
        vx = n * F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")
        vy = n * F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")
        r = cov.cast("double") / (
            F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))
        )
        return F.when((vx > 0) & (vy > 0), F.round(r, 6)).otherwise(F.lit(0.0))

    rows = F.array(
        *[
            F.struct(
                F.lit(a).alias("feat_x"),
                F.lit(b).alias("feat_y"),
                _pearson(a, b).alias("pearson"),
            )
            for a, b in pairs
        ]
    )
    # generator stays a top-level select item (never nested in an expr)
    exploded = one.select(F.col("n").alias("n_docs"), F.explode(rows).alias("p"))
    return exploded.select(
        "p.feat_x", "p.feat_y", F.col("n_docs"), "p.pearson"
    )


def quality_dedup_calibration(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10,
) -> DataFrame:
    """Cross-signal calibration: per fixed-width quality-score bucket,
    the fraction of documents a near-dup dedup pass removes —
    ``(q_bucket, n_docs, n_removed, removed_frac)``. Answers the
    question that decides pipeline ORDER at 100 TB: if low-quality
    buckets carry most of the duplication (boilerplate is both), the
    cheap quality filter runs FIRST and shrinks the expensive
    LSH/components pass; a flat curve means filtering first buys the
    dedup pass nothing. It is also the score's external validation —
    a quality score UNcorrelated with duplication is suspect, since
    template text should sit low on both axes.

    Buckets are fixed-width (floor(score·n), top-clamped), not
    data-dependent quantiles — the same doc lands in the same bucket
    on every engine, run and partitioning, and the score itself is the
    round-6dp expression both engines share. Reads the memoized
    components working set (x25/x36/x89/x99); the only new work is a
    narrow int64-keyed join of (id, score-bucket) against (id,
    component_id) and an ``n_buckets``-row agg.
    """
    from twitter_kafka_etl_spark.operators.dedup import corpus_components
    from twitter_kafka_etl_spark.operators.text import quality_features

    q = quality_features(df, text_col=text_col).select(
        F.col(id_col),
        F.least(
            F.floor(F.col("quality_score") * n_buckets),
            F.lit(n_buckets - 1),
        )
        .cast("bigint")
        .alias("q_bucket"),
    )
    comps = corpus_components(df, text_col=text_col, id_col=id_col)
    removed = F.col(id_col) != F.col("component_id")
    return (
        q.join(comps, id_col)
        .groupBy("q_bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(removed.cast("int")).cast("bigint").alias("n_removed"),
        )
        .select(
            "q_bucket",
            "n_docs",
            "n_removed",
            F.round(
                F.col("n_removed").cast("double") / F.col("n_docs"), 6
            ).alias("removed_frac"),
        )
    )


#: Poisson(1) inverse-CDF cut points (cumulative e^-1 * 1/k! sums); the
#: per-(doc, replica) resample weight is the first k whose cumulative
#: probability exceeds the doc's uniform hash — tail clamped at 5.
_POIS1_CDF = (
    0.36787944117144233,  # P(0)
    0.7357588823428847,   # P(<=1)
    0.9196986029286058,   # P(<=2)
    0.9810118431238462,   # P(<=3)
    0.9963401531726563,   # P(<=4)
)
_HASH60_DEN = float(1 << 60)


def bootstrap_source_ci(
    df: DataFrame,
    metric_col: str = "n_chars",
    group_col: str = "source",
    id_col: str = "doc_id",
    n_replicas: int = 32,
    salt: str = "boot",
) -> DataFrame:
    """Per-source Poisson-bootstrap confidence interval for the mean of
    an integer metric: ``(source, n_docs, mean, boot_mean, boot_sd,
    ci_lo, ci_hi)`` with ci = boot_mean ± 1.96·sd over ``n_replicas``
    resample means. THE one-pass CI technique for data too large to
    resample by shuffling: instead of drawing n docs with replacement
    per replica, each (doc, replica) pair gets an independent
    Poisson(1) weight — the large-n limit of multinomial resampling —
    so every replica is computed in the same streaming aggregation as
    the plain mean. The audit that turns 'source A scores lower than
    B' into 'lower AND the intervals don't overlap' before a curator
    drops a feed on a point estimate.

    Determinism (the salted-md5 discipline): weights come from the
    Poisson(1) inverse CDF applied to a 60-bit md5 hash of
    (salt, doc_id, replica) — the same doc draws the same weight in
    every engine, run and partitioning, so the CI is reproducible
    bit-for-bit. Weighted sums are exact BIGINT (int weight × int
    metric); each replica mean is ONE double division quantized to a
    scaled BIGINT before the cross-replica moments, so the sd is
    computed from exact integer sums in any aggregation order.

    Plan shape: project (group, metric, id) → explode ``n_replicas``
    ints (narrow rows; the fan-out hits the map-side combiner, the
    exchange carries |groups|·B partial rows per task) → one
    (group, rep) partial agg → one |groups|-row re-agg. No shuffle of
    resampled DATA ever exists — the resample lives entirely in the
    weight column.
    """
    reps = F.explode(
        F.sequence(F.lit(0), F.lit(int(n_replicas) - 1))
    ).alias("__rep")
    base = df.select(
        F.col(group_col),
        F.col(metric_col).cast("bigint").alias("__x"),
        F.col(id_col).cast("string").alias("__id"),
    ).select(F.col(group_col), "__x", "__id", reps)
    from twitter_kafka_etl_spark.operators.dedup import token_hash60

    h = token_hash60(
        F.concat(
            F.lit(salt),
            F.col("__id"),
            F.lit("_"),
            F.col("__rep").cast("string"),
        )
    )
    u = h / F.lit(_HASH60_DEN)
    w = F.lit(5)
    for k in range(len(_POIS1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(_POIS1_CDF[k]), F.lit(k)).otherwise(w)
    per_rep = (
        base.select(F.col(group_col), "__rep", "__x", w.alias("__w"))
        .groupBy(group_col, "__rep")
        .agg(
            F.sum(F.col("__w") * F.col("__x")).alias("__wx"),
            F.sum("__w").alias("__wn"),
        )
        .select(
            F.col(group_col),
            # quantized replica mean: exact int from here on (an empty
            # replica — every weight 0, likely only for 1-doc sources —
            # contributes mean 0 in both engines, division guarded)
            F.round(
                F.when(
                    F.col("__wn") > 0,
                    F.col("__wx").cast("double") / F.col("__wn"),
                ).otherwise(F.lit(0.0))
                * 1e6,
                0,
            )
            .cast("bigint")
            .alias("__mq"),
        )
    )
    # second moment in DECIMAL(38,0): mq is metric·1e6 (≤ ~1e12 for
    # million-unit metrics), so mq² reaches ~1e24 — far past BIGINT.
    # decimal(19,0)·decimal(19,0) → exact decimal(38,0) products and
    # sums; only the final variance expression drops to double
    mq_dec = F.col("__mq").cast("decimal(19,0)")
    moments = per_rep.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("__b"),
        F.sum("__mq").alias("__s"),
        F.sum(mq_dec * mq_dec).alias("__ss"),
    )
    plain = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.col(metric_col).cast("bigint")).alias("__sx"),
    )
    bm = F.col("__s").cast("double") / F.col("__b") / 1e6
    var = (
        F.col("__ss").cast("double") / F.col("__b")
        - (F.col("__s").cast("double") / F.col("__b"))
        * (F.col("__s").cast("double") / F.col("__b"))
    ) / 1e12
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    return plain.join(moments, group_col).select(
        group_col,
        "n_docs",
        F.round(F.col("__sx").cast("double") / F.col("n_docs"), 6).alias(
            "mean"
        ),
        F.round(bm, 6).alias("boot_mean"),
        F.round(sd, 6).alias("boot_sd"),
        F.round(bm - F.lit(1.96) * sd, 6).alias("ci_lo"),
        F.round(bm + F.lit(1.96) * sd, 6).alias("ci_hi"),
    )
