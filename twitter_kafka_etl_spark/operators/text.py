"""Text-analysis operators for large-scale training-data pipelines.

Everything here is built from JVM-side column expressions (codegen-friendly,
no Python in the hot path) except the classifier backends, which follow the
reference's NLP stages (consumer.scala:85,125-155) as Arrow-vectorized
pandas UDFs — the engine's sanctioned Python boundary.

Operators:
- ``tokenize``            whitespace tokens (F.split)
- ``token_stats``         token counting incl. a BPE-ish regex piece count
- ``quality_features``    length / distinct / stopword-ratio scoring
- ``lang_id``             marker-word n-gram heuristic language ID
- ``fingerprint``         md5 document fingerprint over normalized text
- ``classify_sentiment`` / ``classify_emotion``  lexicon pandas UDFs with
  the same (text)->label shape as the reference's pretrained pipelines
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from twitter_kafka_etl_spark.operators._cache import eager_persist
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

#: deterministic lexicons over the synthetic vocabulary; the real-model
#: backend plugs in behind the same column signature.
POSITIVE_WORDS = frozenset({"fast", "small", "spark"})
NEGATIVE_WORDS = frozenset({"slow", "big", "error"})
SENTIMENTS = ["positive", "negative", "neutral"]
EMOTIONS = ["surprise", "fear", "joy", "sadness", "anger", "love"]

#: stopword markers per language for the n-gram heuristic. The engine's
#: honest answer for text without markers is 'und' (undetermined).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "und", "ist", "das"),
    "fr": ("le", "la", "et", "les", "est"),
    "es": ("el", "la", "de", "los", "es"),
}

#: BPE-ish piece pattern: runs of letters, digits, or single non-space
#: punctuation — a cheap stand-in for subword tokenization.
BPE_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def tokenize(col: str | Column = "text") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex pieces + the
    chars/4 heuristic LLM pipelines use for budget estimates."""
    toks = tokenize(text_col)
    return df.withColumns({
        "ws_tokens": F.size(toks).cast("bigint"),
        "bpe_pieces": F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_PATTERN), 0)).cast("bigint"),
        "approx_tokens": F.ceil(F.length(text_col) / 4).cast("bigint"),
    })


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring: distinct-token ratio and stopword ratio combined.
    Low distinct ratio = repetitive text; extreme stopword ratio = boilerplate.
    """
    toks = tokenize(text_col)
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin("a", "the")))
    n_chars = F.length(text_col)
    punct_chars = n_chars - F.length(
        F.regexp_replace(F.col(text_col), "[^a-zA-Z0-9 ]", "")
    )
    return df.withColumns({
        "n_tokens": n.cast("bigint"),
        "n_distinct": n_distinct.cast("bigint"),
        "distinct_ratio": n_distinct / n,
        "stopword_ratio": stop_hits / n,
        "punct_ratio": punct_chars / n_chars,
        "quality_score": F.round(
            (n_distinct / n) * 0.5 + (F.lit(1.0) - stop_hits / n) * 0.5, 6
        ),
    })


def lang_id(df: DataFrame, text_col: str = "text", out: str = "pred_lang") -> DataFrame:
    """Marker-word language ID: count distinct marker hits per language,
    pick the argmax if it clears a 2-marker threshold, else 'und'.

    One pass of array ops per language — no shuffle, no Python.
    """
    toks_d = F.array_distinct(tokenize(text_col))
    scores = {
        lang: F.size(F.array_intersect(toks_d, F.array(*[F.lit(m) for m in marks])))
        for lang, marks in LANG_MARKERS.items()
    }
    # argmax with deterministic tie-break on language-code order
    best_lang, best_score = F.lit("und"), F.lit(0)
    for lang in sorted(scores):
        s = scores[lang]
        better = s > best_score
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, s).otherwise(best_score)
    pred = F.when(best_score >= 2, best_lang).otherwise(F.lit("und"))
    return df.withColumn(out, pred)


def _winnow_fps(
    df: DataFrame, k: int, w: int, text_col: str
) -> tuple[DataFrame, Column]:
    """(staged frame, fingerprint-array column) — the single site of
    the winnowing rule shared by the per-doc summary and the cross-doc
    matcher."""
    from twitter_kafka_etl_spark.operators.dedup import _gram_array, token_hash

    toked, grams = _gram_array(df, k, text_col)
    # materialize the hash array as its own projection BEFORE the window
    # transform: referencing the transform expression inside the window
    # lambda re-evaluates the whole k-gram md5 array once per window
    # start — O(n²) md5 calls per document (measured 9× at sf0.1)
    staged = toked.withColumn("__hs", F.transform(grams, token_hash))
    hs = F.col("__hs")
    starts = F.when(
        F.size(hs) >= w, F.sequence(F.lit(1), F.size(hs) - w + 1)
    ).otherwise(F.array().cast("array<int>"))
    fps = F.array_distinct(
        F.transform(starts, lambda i: F.array_min(F.slice(hs, i, w)))
    )
    return staged, fps


def winnow_fingerprints(
    df: DataFrame,
    k: int = 3,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing rolling-hash fingerprints (Schleimer, Wilkerson, Aiken —
    SIGMOD 2003): hash every ordered k-gram, slide a window of ``w``
    hashes, keep each window's minimum; any shared substring of
    ``w + k - 1`` tokens is guaranteed to share a fingerprint.

    The whole chain — k-grams, hashes, window minima, distinct — is JVM
    array expressions per row: no explode, no shuffle, embarrassingly
    parallel at any scale. Output: (id, n_fp, min_fp) summary per doc;
    ``winnow_match_pairs`` is the cross-doc matcher over the same rule.
    """
    staged, fps = _winnow_fps(df, k, w, text_col)
    return staged.select(
        F.col(id_col),
        F.size(fps).cast("bigint").alias("n_fp"),
        F.array_min(fps).cast("bigint").alias("min_fp"),
    )


def winnow_match_pairs(
    df: DataFrame,
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    df_cap: int | None = None,
    collapse_exact: bool | None = None,
) -> DataFrame:
    """Cross-document winnowing matcher: pairs of documents sharing at
    least ``min_shared`` fingerprints, with the shared count —
    MOSS-style substring-overlap detection (Schleimer et al. 2003,
    §4), the guarantee-backed complement to MinHash (any shared run of
    ``w + k − 1`` tokens MUST surface here; MinHash only matches
    whole-document resemblance). Output: (doc_a, doc_b, shared_fp).

    Same inverted-index discipline as the shingle pair joins: only
    documents sharing ≥1 fingerprint are ever materialized, via a
    self-equi-join on the 31-bit fingerprint; ``min_shared`` then
    filters the pair aggregate. Winnowing keeps ~2/(w+1) of the gram
    hashes, so the exploded table is a fraction of the shingle join's
    and the same df-cap story applies if boilerplate makes a
    fingerprint hot (``df_cap``, default off — the window-min selection
    already suppresses most stopword grams).

    Default ``df_cap=None`` keeps the exact guarantee; the registered
    query keeps it off because its oracle mirrors the uncapped join.

    ``collapse_exact`` (auto-probed like the shingle pair metrics):
    byte-identical texts carry identical fingerprint sets, so the fp
    self-join runs on distinct texts only and pairs expand back via
    two text-fingerprint equi-joins (within-group shared_fp = the
    group's |fps|; cross-group pairs inherit the representative pair's
    count — a pure function of the two fp sets). 1/d² the join work on
    a duplication-factor-d corpus, bitwise-identical output. Only
    taken when ``df_cap is None``: a cap would need the full-corpus
    weighting machinery (see dedup._collapse_expand_pairs), and the
    window-min selection rarely needs a cap at all.
    """

    from twitter_kafka_etl_spark.operators.dedup import _auto_collapse

    def fpr_of(docs: DataFrame) -> DataFrame:
        """Exploded, persisted (id, fp) fingerprint table — one
        materialization of the per-row gram/hash/window chain feeding
        every downstream consumer."""
        staged, fps = _winnow_fps(docs, k, w, text_col)
        return eager_persist(
            staged.select(F.col(id_col), F.explode(fps).alias("fp"))
        )

    def pair_core(fpr: DataFrame) -> DataFrame:
        if df_cap is not None:
            hot = (
                fpr.groupBy("fp")
                .agg(F.count(F.lit(1)).alias("__df"))
                .filter(F.col("__df") > df_cap)
                .select("fp")
            )
            fpr = fpr.join(hot, "fp", "left_anti")
        a, b = fpr.alias("a"), fpr.alias("b")
        return (
            a.join(
                b,
                (F.col("a.fp") == F.col("b.fp"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .groupBy(
                F.col(f"a.{id_col}").alias("doc_a"),
                F.col(f"b.{id_col}").alias("doc_b"),
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias("shared_fp"))
            .filter(F.col("shared_fp") >= min_shared)
        )

    if collapse_exact is None and df_cap is None:
        collapse_exact = _auto_collapse(df, F.md5(F.col(text_col)))
    if not (df_cap is None and collapse_exact):
        return pair_core(fpr_of(df))
    # collapse branch. The (id, text-md5) map feeds seven consumers
    # (reps, both expansion sides, both within sides) — pin it, or each
    # re-scans and re-hashes the full corpus (measured 29 s vs 2 s on a
    # 1.5k-doc triplicate corpus before the pin/share rework)
    members = eager_persist(
        df.select(
            F.col(id_col).alias("m_id"), F.md5(F.col(text_col)).alias("tfp")
        )
    )
    reps = members.groupBy("tfp").agg(F.min("m_id").alias("rep_id"))
    rep_docs = df.join(
        reps.select(F.col("rep_id").alias(id_col)), id_col, "left_semi"
    )
    # ONE fingerprint build over the representatives serves the pair
    # join AND the within-group fp-set sizes
    fpr_rep = fpr_of(rep_docs)
    rep_pairs = pair_core(fpr_rep)
    fp_of = reps.select("rep_id", "tfp")
    cross = (
        rep_pairs.join(
            fp_of.select(
                F.col("rep_id").alias("doc_a"), F.col("tfp").alias("ta")
            ),
            "doc_a",
        )
        .join(
            fp_of.select(
                F.col("rep_id").alias("doc_b"), F.col("tfp").alias("tb")
            ),
            "doc_b",
        )
        .join(
            members.select(F.col("m_id").alias("ia"), F.col("tfp").alias("ta")),
            "ta",
        )
        .join(
            members.select(F.col("m_id").alias("ib"), F.col("tfp").alias("tb")),
            "tb",
        )
        .select(
            F.least("ia", "ib").alias("doc_a"),
            F.greatest("ia", "ib").alias("doc_b"),
            F.col("shared_fp"),
        )
    )
    # within-group pairs: identical texts share their whole fp set
    # (|fps| = the persisted table's per-rep row count; zero-fp groups
    # have no rows, so the >=min_shared filter also excludes them)
    gsz = (
        fpr_rep.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("__nfp"))
        .filter(F.col("__nfp") >= min_shared)
        .join(reps.select(F.col("rep_id").alias(id_col), "tfp"), id_col)
        .select(F.col("tfp").alias("__wt"), "__nfp")
    )
    m1, m2 = members.alias("m1"), members.alias("m2")
    within = (
        m1.join(
            m2,
            (F.col("m1.tfp") == F.col("m2.tfp"))
            & (F.col("m1.m_id") < F.col("m2.m_id")),
        )
        .join(gsz, F.col("m1.tfp") == F.col("__wt"))
        .select(
            F.col("m1.m_id").alias("doc_a"),
            F.col("m2.m_id").alias("doc_b"),
            F.col("__nfp").cast("bigint").alias("shared_fp"),
        )
    )
    return cross.unionByName(within)


def fingerprint(df: DataFrame, text_col: str = "text", out: str = "fp") -> DataFrame:
    """Document fingerprint: md5 over whitespace-normalized lowercase text.
    Stable across engines and runs — the exact-dedup key at 100 TB."""
    norm = F.lower(F.regexp_replace(F.col(text_col), "\\s+", " "))
    return df.withColumn(out, F.md5(norm))


#: PII-shape patterns applied IN ORDER (specific before general, so an
#: email's digits are masked as <EMAIL>, not chopped by <NUM>). The
#: regexes stick to syntax Java and RE2 agree on (no lookaround/backrefs)
#: so the DuckDB oracle can run the identical program.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\d{2,}", "<NUM>"),
)


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out: str = "redacted",
    count_col: str = "n_redactions",
    patterns: tuple[tuple[str, str], ...] = PII_PATTERNS,
) -> DataFrame:
    """PII-shape redaction: sequentially mask each pattern and count the
    masks. Pure JVM regexp expressions — narrow, shuffle-free, and
    codegen'd, so the cost at 100 TB is one scan at regex speed. Each
    pattern's count is taken on the text the pattern actually sees (the
    output of the previous mask), so overlapping patterns never
    double-count."""
    cur = F.col(text_col)
    total = F.lit(0)
    for pat, tag in patterns:
        total = total + F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
        cur = F.regexp_replace(cur, pat, tag)
    return df.withColumns({out: cur, count_col: total.cast("bigint")})


# ---------------------------------------------------------------------------
# classifier backends (U1/U2): Arrow pandas UDFs, (text) -> label
# ---------------------------------------------------------------------------

def _counts(text: str) -> tuple[int, int]:
    pos = neg = 0
    for t in text.split(" "):
        if t in POSITIVE_WORDS:
            pos += 1
        elif t in NEGATIVE_WORDS:
            neg += 1
    return pos, neg


@pandas_udf(StringType())
def classify_sentiment(texts: pd.Series) -> pd.Series:
    """U1 — sentiment annotator shape (consumer.scala:85,125-128).
    Deterministic lexicon backend; swap the body for a real model
    (batch inference over the Arrow batch) without changing the plan."""
    def one(t: str) -> str:
        pos, neg = _counts(t)
        if pos > neg:
            return "positive"
        if neg > pos:
            return "negative"
        return "neutral"

    return texts.map(one)


@pandas_udf(StringType())
def classify_emotion(texts: pd.Series) -> pd.Series:
    """U2 — emotion classifier shape (consumer.scala:132-155), 6-label set
    {surprise,fear,joy,sadness,anger,love} (wrangling.py:26-27)."""
    def one(t: str) -> str:
        pos, neg = _counts(t)
        return EMOTIONS[(pos * 3 + neg) % len(EMOTIONS)]

    return texts.map(one)


def make_classifier(batch_fn) -> Column:
    """Wrap ANY batch text-classification function — (pd.Series of str)
    -> (pd.Series of str) — as an Arrow pandas UDF with the engine's
    (text) -> label plan shape. This is the seam where a real model
    replaces the lexicon backend: ``batch_fn`` receives whole Arrow
    batches, so model inference runs batched on the executor exactly
    like the reference's Spark-NLP annotators (consumer.scala:85,148) —
    load the model once per worker inside ``batch_fn``'s closure.
    """
    return pandas_udf(batch_fn, StringType())


def enrich_text(
    df: DataFrame,
    text_col: str = "text",
    sentiment_backend=None,
    emotion_backend=None,
) -> DataFrame:
    """The reference's two-stage NLP enrichment (consumer.scala:125-155)
    as one projection: sentiment + emotion columns appended. Backends
    default to the deterministic lexicon UDFs; pass batch functions
    (pd.Series -> pd.Series) to swap in real models without touching
    the plan (see ``make_classifier``)."""
    sent = (
        make_classifier(sentiment_backend)
        if sentiment_backend is not None
        else classify_sentiment
    )
    emo = (
        make_classifier(emotion_backend)
        if emotion_backend is not None
        else classify_emotion
    )
    return df.withColumns({
        "sentiment": sent(F.col(text_col)),
        "emotion": emo(F.col(text_col)),
    })


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF.

    Uses the *rational* idf variant (N+1)/(df+1) instead of its log:
    every score is then a ratio of exact integers — one IEEE division,
    bit-identical in any engine — where ln() depends on the platform's
    libm rounding. Ranking is unchanged (log is monotone), which is all
    TF-IDF's ordering semantics promise.

    Plan: explode → tf groupBy (one shuffle) → document-frequency via a
    count window over term (second shuffle) → global N joined in as a
    broadcast 1-row aggregate (no driver action) → per-doc top-k window.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.agg(F.count(F.lit(1)).alias("__n"))
    w_term = Window.partitionBy("term")
    w_doc = Window.partitionBy(id_col).orderBy(F.desc("score"), "term")
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(w_term))
        .join(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf") * (F.col("__n") + 1).cast("double") / (F.col("df") + 1),
        )
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_doc))
        .filter(F.col("rank") <= k)
        .select(
            F.col(id_col),
            "term",
            F.round("score", 6).alias("tfidf"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def repetition_signals(
    df: DataFrame,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Intra-document repetition quality signals (the Gopher/C4-style
    filters): duplicate n-gram fraction and the share of the single most
    repeated n-gram. High values flag boilerplate/spam for removal
    before training.

    Plan: n-gram explode → per-(doc, gram) counts → per-doc aggregate —
    two partial-agg shuffles, O(total grams) work, no per-row quadratic
    scan. Documents shorter than ``n`` tokens emit zeros via the left
    join back to the input.
    """
    from twitter_kafka_etl_spark.operators.dedup import _gram_array

    toked, grams = _gram_array(df, n, text_col)
    g = toked.select(F.col(id_col), F.explode(grams).alias("g"))
    per = g.groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
    sig = per.groupBy(id_col).agg(
        F.sum("c").alias("n_grams"),
        F.count(F.lit(1)).alias("nd"),
        F.max("c").alias("top_c"),
    )
    n_g = F.col("n_grams")
    return (
        df.select(F.col(id_col))
        .join(sig, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(n_g, F.lit(0)).cast("bigint").alias("n_grams"),
            F.round(
                F.when(n_g > 0, (n_g - F.col("nd")) / n_g.cast("double"))
                .otherwise(F.lit(0.0)),
                6,
            ).alias("dup_frac"),
            F.round(
                F.when(n_g > 0, F.col("top_c") / n_g.cast("double"))
                .otherwise(F.lit(0.0)),
                6,
            ).alias("top_share"),
        )
    )


def corpus_freq_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Unigram corpus-frequency fluency score — the cheap stand-in for a
    language-model perplexity filter: documents whose tokens are rare in
    the corpus score low (OCR junk, codes, foreign-script noise),
    common-word prose scores high.

    score = (Σ_occurrences corpus_count(token)) / (n_tokens_doc · N_corpus)
    — the mean corpus-frequency share of the document's tokens. Both the
    numerator and denominator are exact integer aggregates; the single
    final IEEE division makes the value bit-identical across engines
    (a log-probability variant would hit libm rounding differences).

    Plan: explode → token counts (one partial-agg shuffle, bounded by
    the vocabulary) → join counts back onto the token stream (shares
    the token partitioning, so the exchange is reused) → per-doc sum
    (second partial-agg shuffle). N rides along as a broadcast one-row
    aggregate — no driver action.
    """
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("__c"))
    total = toks.agg(F.count(F.lit(1)).alias("__n"))
    per_doc = (
        toks.join(counts, "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("__c").alias("sum_freq"),
        )
    )
    return per_doc.join(F.broadcast(total)).select(
        F.col(id_col),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("sum_freq").cast("bigint").alias("sum_freq"),
        F.round(
            F.col("sum_freq")
            / (F.col("n_tokens") * F.col("__n")).cast("double"),
            6,
        ).alias("freq_score"),
    )


def zipf_top_tokens(
    df: DataFrame, k: int = 20, text_col: str = "text"
) -> DataFrame:
    """Token rank/frequency head — the Zipf profile a corpus audit reads
    before choosing stopword caps and vocabulary cuts. Top-``k`` tokens
    by global count (ties broken by token asc), each with its corpus
    share and the cumulative share of the head so far.

    The ranking window orders the *distinct-token* counts table —
    bounded by the vocabulary, not the corpus (same caveat as
    ``vocab_coverage``: feed a min-count filter first for open vocabs).
    Shares divide exact integers, rounded once.
    """
    toks = df.select(F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = toks.agg(F.count(F.lit(1)).alias("__n"))
    w = Window.orderBy(F.col("c").desc(), F.col("tok").asc())
    w_cum = w.rowsBetween(Window.unboundedPreceding, 0)
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .withColumn("cum_c", F.sum("c").over(w_cum))
        .filter(F.col("rank") <= k)
        .join(F.broadcast(total))
        .select(
            "tok",
            F.col("c").cast("bigint").alias("count"),
            F.col("rank").cast("bigint").alias("rank"),
            F.round(F.col("c") / F.col("__n").cast("double"), 6).alias("share"),
            F.round(F.col("cum_c") / F.col("__n").cast("double"), 6).alias(
                "cum_share"
            ),
        )
    )


def vocab_coverage(
    df: DataFrame,
    top_k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Vocabulary build + per-document OOV rate — the tokenizer-prep
    step of a training pipeline: pick the ``top_k`` tokens by global
    frequency (ties broken by token asc, so the vocab is deterministic),
    then score every document by the fraction of its token occurrences
    that fall outside that vocabulary.

    Plan: one explode+groupBy pass builds the global counts; the top-k
    cut is a row_number over the (tiny: one row per *distinct* token)
    counts table; the vocab then broadcasts back onto the token stream,
    so the per-doc pass adds exactly one partial-agg shuffle. At 100 TB
    the counts table is bounded by the distinct-token count, not the
    corpus — for open vocabularies feed a min-count filter first.
    """
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    from pyspark.sql import Window

    w = Window.orderBy(F.col("c").desc(), F.col("tok").asc())
    vocab = (
        counts.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= top_k)
        .select("tok", F.lit(1).alias("__in_vocab"))
    )
    oov = F.sum(F.when(F.col("__in_vocab").isNull(), 1).otherwise(0))
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            oov.alias("oov_tokens"),
        )
        .select(
            F.col(id_col),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.col("oov_tokens").cast("bigint").alias("oov_tokens"),
            F.round(F.col("oov_tokens") / F.col("n_tokens"), 6).alias("oov_rate"),
        )
    )


def duplicated_spans(
    df: DataFrame,
    block_tokens: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sub-document exact-span dedup signal (the Lee et al. 2022
    "Deduplicating Training Data" primitive at block granularity):
    split each document into disjoint ``block_tokens``-token blocks,
    fingerprint each block, and count corpus-wide how many of a
    document's blocks occur at more than one (doc, position) anywhere —
    repeated boilerplate/template spans that whole-document dedup
    (x01/x13) never sees because the surrounding text differs.

    Plan: one explode (tokens / block_tokens rows — 16× smaller than a
    token explode), one partial-agg groupBy on the 64-bit fingerprint
    (first 16 md5 hex chars — halves shuffle key bytes vs the full
    digest; ~1e-8 collision odds at 10^9 blocks distort counts
    negligibly), one fp-equi-join back, one per-doc partial agg. No
    self-join, no quadratic step; at 100 TB every stage is
    shuffle-bounded by corpus_tokens/16 rows of (16B fp, 8B id).
    Documents shorter than one block emit zeros via the left join
    (short docs are guarded explicitly — ``F.sequence(0, -1)``
    *descends*, see ``dedup._gram_array``).
    """
    toked = df.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__t")
    )
    nb = F.floor(F.size("__t") / block_tokens).cast("int")
    fps = F.when(
        nb > 0,
        F.transform(
            F.sequence(F.lit(0), nb - 1),
            lambda i: F.substring(
                F.md5(
                    F.array_join(
                        F.slice(
                            F.col("__t"), i * block_tokens + 1, block_tokens
                        ),
                        " ",
                    )
                ),
                1,
                16,
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    blocks = toked.select(F.col(id_col), F.explode(fps).alias("fp"))
    occ = blocks.groupBy("fp").agg(F.count(F.lit(1)).alias("__occ"))
    per = (
        blocks.join(occ, "fp")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("nb"),
            F.sum(F.when(F.col("__occ") > 1, 1).otherwise(0)).alias("ndup"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(per, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("nb", F.lit(0)).cast("bigint").alias("n_blocks"),
            F.coalesce("ndup", F.lit(0)).cast("bigint").alias("n_dup_blocks"),
            F.round(
                F.when(
                    F.col("nb") > 0,
                    F.col("ndup") / F.col("nb").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_frac"),
        )
    )


def remove_duplicated_spans(
    df: DataFrame,
    block_tokens: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The rewrite counterpart of :func:`duplicated_spans`: drop every
    16-token block whose exact content already occurred earlier in the
    corpus (first occurrence wins, ordered by (doc_id, position) — a
    total order, so the rewrite is deterministic and idempotent), then
    reassemble each document from its kept blocks plus the sub-block
    tail. This is the span-level dedup PASS — x53 is the audit, this
    emits the cleaned corpus a training run would actually consume.

    Plan: one explode to (doc, idx, block) rows, one window over the
    block fingerprint (each fp partition holds only that span's
    occurrences — tiny), one groupBy(doc) reassembly whose state is
    bounded by document length. At 100 TB the only wrinkle is carrying
    the ~100-byte block string through the fp shuffle; carrying
    (doc_id, idx) only and re-slicing at reassembly halves the shuffle
    at the cost of a second scan — worth it above ~10 TB, not below.
    """
    toked = df.select(
        F.col(id_col),
        F.col(text_col).alias("__txt"),
        F.split(F.col(text_col), " ").alias("__t"),
    )
    nb = F.floor(F.size("__t") / block_tokens).cast("int")
    rem = F.array_join(
        F.slice(
            F.col("__t"),
            nb * block_tokens + 1,
            F.greatest(F.size("__t") - nb * block_tokens, F.lit(0)),
        ),
        " ",
    )
    base = toked.select(
        F.col(id_col),
        nb.alias("__nb"),
        rem.alias("__rem"),
        F.when(
            nb > 0,
            F.transform(
                F.sequence(F.lit(0), nb - 1),
                lambda i: F.array_join(
                    F.slice(F.col("__t"), i * block_tokens + 1, block_tokens),
                    " ",
                ),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("__blocks"),
    )
    blocks = base.select(
        F.col(id_col),
        F.posexplode("__blocks").alias("idx", "s"),
    ).withColumn("fp", F.md5(F.col("s")))
    w = Window.partitionBy("fp").orderBy(F.col(id_col), F.col("idx"))
    kept = (
        blocks.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("__nkept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("idx"), F.col("s")))
                    ),
                    lambda st: st.getField("s"),
                ),
                " ",
            ).alias("__kept"),
        )
    )
    out = base.join(kept, id_col, "left")
    cleaned = F.trim(
        F.concat(
            F.coalesce(F.col("__kept"), F.lit("")),
            F.lit(" "),
            F.col("__rem"),
        )
    )
    return out.select(
        F.col(id_col),
        F.col("__nb").cast("bigint").alias("n_blocks"),
        (F.col("__nb") - F.coalesce("__nkept", F.lit(0)))
        .cast("bigint")
        .alias("n_removed"),
        cleaned.alias("cleaned"),
    )


def _eq_term(term: str):
    return lambda x: x == F.lit(term)


def bm25_rank(
    df: DataFrame,
    terms: list[str],
    k1: float = 1.25,
    b: float = 0.75,
    top_k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 relevance ranking of the corpus against a fixed term set —
    the retrieval scorer for search/RAG over the document table.

    Engine-reproducibility choices (same policy as x28's rational idf):
    the idf is the rational (N - df + 0.5)/(df + 0.5) — no ln(), whose
    last-ulp varies across math libraries — and k1/b default to exact
    binary fractions (1.25, 0.75), so every float op is bit-identical
    in any IEEE engine and the ranking is byte-stable across reruns.

    Plan: per-term tf via array filters (narrow per-row, no explode);
    corpus stats (N, Σdl, per-term df) in ONE partial aggregate
    broadcast back as a 1-row frame; top-k via orderBy+limit — Spark
    plans TakeOrderedAndProject (per-partition heaps, no global sort),
    so the ranking never materializes a full-corpus sort at 100 TB.
    The per-rank row_number runs on the ≤ top_k survivors only.
    """
    toks = F.split(F.col(text_col), " ")
    dl = F.size(toks)
    scored_in = df.select(
        F.col(id_col),
        dl.alias("__dl"),
        *[
            # one-arg lambda built by a factory: a 2-arg lambda with a
            # default would make F.filter pass the array INDEX as arg 2
            F.size(F.filter(toks, _eq_term(t))).alias(f"__tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = scored_in.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__dl").alias("__sum_dl"),
        *[
            F.sum((F.col(f"__tf_{i}") > 0).cast("bigint")).alias(f"__df_{i}")
            for i in range(len(terms))
        ],
    )
    joined = scored_in.join(F.broadcast(stats))
    avgdl = F.col("__sum_dl") / F.col("__n")
    score = F.lit(0.0)
    for i in range(len(terms)):
        tf = F.col(f"__tf_{i}")
        idf = (F.col("__n") - F.col(f"__df_{i}") + F.lit(0.5)) / (
            F.col(f"__df_{i}") + F.lit(0.5)
        )
        score = score + idf * (tf * F.lit(k1 + 1.0)) / (
            tf + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("__dl") / avgdl)
        )
    top = (
        joined.select(F.col(id_col), score.alias("__s"))
        .orderBy(F.col("__s").desc(), F.col(id_col))
        .limit(top_k)
    )
    w = Window.orderBy(F.col("__s").desc(), F.col(id_col))
    return top.select(
        F.col(id_col),
        F.round("__s", 6).alias("bm25"),
        F.row_number().over(w).cast("bigint").alias("rank"),
    )


def langid_eval(
    df: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Classifier audit for the lang-ID heuristic: confusion matrix of
    predicted vs recorded language plus per-truth-class recall — the
    acceptance check a pipeline owner runs before letting a cheap
    classifier route a 100 TB corpus (mirrors the x59/x61 pattern:
    every approximate component ships with its accuracy query).

    One narrow lang_id pass + one (truth, pred) groupBy + a share-of-
    truth-class window over the tiny confusion table — the corpus is
    touched exactly once. recall_share sums to 1 within each truth row.
    """
    pred = lang_id(df, text_col)
    cm = pred.groupBy(
        F.col(lang_col).alias("true_lang"), F.col("pred_lang")
    ).agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy("true_lang")
    return cm.select(
        "true_lang",
        "pred_lang",
        "n_docs",
        F.round(F.col("n_docs") / F.sum("n_docs").over(w), 6).alias(
            "recall_share"
        ),
    )


def unigram_nll(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """LM-perplexity quality scoring, CCNet-style (Wenzek et al. 2020,
    arXiv:1911.00359): score every document by its average negative
    log-probability under a unigram model of the corpus itself — the
    filter that ranks fluent prose above boilerplate/gibberish before a
    pre-training run (CCNet uses a KenLM 5-gram; the unigram variant is
    the same plumbing with a corpus-derived table instead of a shipped
    model).

    Determinism: the same quantized-log discipline as ``dsir_weights``
    — each vocab entry's ln(c/N) is rounded once to a scaled BIGINT, so
    the per-document reduction is an exact integer sum under any
    partitioning, and the single ln() per VOCAB entry (not per token
    instance) is where engines could differ by a ulp, bounded by vocab
    size.

    Scale: one explode + a vocab groupBy (vocab ≪ corpus), one shuffle
    join of the token table against the vocab on the token, one
    partial-agg shuffle on the id. At 100 TB, hash the token to a
    64-bit key for the join (token_hash60) and broadcast the vocab when
    it fits. Output: (id, n_tokens, avg_neg_logp); high avg_neg_logp =
    improbable text = drop candidate.
    """
    t = df.select(
        F.col(id_col), F.explode(tokenize(text_col)).alias("tok")
    )
    c = t.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = c.agg(F.sum("c").alias("n"))
    lp = c.crossJoin(F.broadcast(tot)).select(
        "tok",
        F.round(
            F.log(F.col("c").cast("double") / F.col("n")) * F.lit(1e6), 0
        )
        .cast("bigint")
        .alias("lp"),
    )
    d = t.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        d.join(lp, "tok")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.sum(F.col("cnt") * F.col("lp")).alias("s"),
        )
        .select(
            id_col,
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.round(
                -F.col("s").cast("double") / 1e6 / F.col("n_tokens"), 6
            ).alias("avg_neg_logp"),
        )
    )


def bpe_pair_stats(
    df: DataFrame,
    top_k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """The first step of BPE tokenizer training, distributed: count
    every adjacent character pair WITHIN words across the corpus and
    return the ``top_k`` merge candidates — the statistic a
    Sennrich-style (2016, arXiv:1508.07909) trainer recomputes each
    merge round, and the part that must scale with the corpus (the
    merge loop itself runs on this bounded table).

    Narrow per-row array arithmetic (tokenize → per-token 2-char
    slices) into one partial-agg shuffle on the pair; the result is
    vocabulary-bounded. Top-k is a TakeOrdered heap with (count DESC,
    pair ASC) determinism — never a full sort.
    """
    toks = df.select(F.explode(tokenize(text_col)).alias("tok")).filter(
        F.length("tok") >= 2
    )
    pairs = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("tok") - 1),
                lambda i: F.col("tok").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "pair")
        .limit(top_k)
    )


def charset_profile(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-group character-class profile: average letter / digit /
    whitespace / other ratios — the cheap script-and-noise screen a
    crawl pipeline runs per source before tokenization (a source whose
    "text" is 40% digits or control bytes is markup or tables, not
    prose; CCNet and Gopher both gate on character-class ratios).

    Determinism discipline: each document's ratios are exact IEEE
    divisions of two ints, quantized ONCE to a scaled BIGINT
    (round(ratio·1e6)); the per-group aggregate then sums integers —
    exact in any partitioning/order — and divides at the end. The same
    program runs in the oracle.

    Scale shape: four regexp_replace lengths per row (codegen'd,
    shuffle-free scan) + one partial-agg shuffle on the group key."""
    n = F.length(F.col(text_col))

    def klass_count(pattern: str) -> Column:
        return n - F.length(F.regexp_replace(F.col(text_col), pattern, ""))

    def q(cls_count: Column) -> Column:
        ratio = F.when(n > 0, cls_count / n).otherwise(F.lit(0.0))
        return F.round(ratio * 1e6, 0).cast("bigint")

    letters = klass_count("[A-Za-z]")
    digits = klass_count("[0-9]")
    spaces = klass_count("[ ]")
    other = n - letters - digits - spaces
    pre = df.select(
        F.col(group_col),
        q(letters).alias("__l"),
        q(digits).alias("__d"),
        q(spaces).alias("__s"),
        q(other).alias("__o"),
    )

    def avg6(col: str) -> Column:
        return F.round(
            F.sum(col).cast("double") / (F.count(F.lit(1)) * 1e6), 6
        )

    return (
        pre.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            avg6("__l").alias("avg_letters"),
            avg6("__d").alias("avg_digits"),
            avg6("__s").alias("avg_space"),
            avg6("__o").alias("avg_other"),
        )
    )


def _bigram_rows(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """One (id, bg) row per adjacent token pair — the single site of
    the bigram construction rule, shared by ``bigram_nll`` and
    ``pmi_top_bigrams`` so the two can never disagree on what a bigram
    is (the same single-site discipline as the w1 prefix rule)."""
    toked = df.withColumn("__toks", tokenize(text_col))
    idx = F.sequence(F.lit(0), F.size("__toks") - 2)
    # guard: sequence(0, negative) is DESCENDING (bogus indices) — an
    # under-2-token doc must yield an empty array, like the oracle's
    # empty range()
    grams = F.when(
        F.size("__toks") >= 2,
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ",
                F.element_at("__toks", (i + 1).cast("int")),
                F.element_at("__toks", (i + 2).cast("int")),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return toked.select(F.col(id_col), F.explode(grams).alias("bg"))


def bigram_nll(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Conditional bigram LM scoring: average -ln P(w2|w1) per document
    with P(w2|w1) = c(w1 w2) / c(w1 ·) over the corpus itself — one
    order up from ``unigram_nll``, so word-salad that fools a unigram
    model (right words, impossible transitions) scores high here. The
    CCNet/KenLM filter family's plumbing (Wenzek et al. 2020) with the
    model order that still needs no smoothing: self-scoring means every
    scored bigram exists in the counts, so P > 0 always.

    Determinism: identical discipline to ``unigram_nll`` — ln() once
    per distinct BIGRAM (both engines see the same rational c2/c1),
    quantized to scaled BIGINT, per-doc reduction an exact integer sum
    under any partitioning.

    Scale: one explode at tokens-1 rows/doc, a bigram-vocab groupBy
    (vocab ≪ corpus), a prefix re-aggregation of the vocab table
    (vocab-sized, not corpus-sized), one join back, one partial-agg
    shuffle on the id. Docs with fewer than 2 tokens have no bigrams
    and are absent from the output — the same contract as the oracle's
    inner join.
    """
    big = _bigram_rows(df, text_col, id_col)
    # the w1 prefix rule is derived in exactly ONE place per engine
    # (here, and the oracle's c2 CTE) — it is the join key between the
    # bigram vocab and its prefix totals, so a divergent copy would
    # silently mis-pair the two tables
    c2 = big.groupBy("bg").agg(F.count(F.lit(1)).alias("c2")).withColumn(
        "w1", F.substring_index("bg", " ", 1)
    )
    # prefix totals by re-aggregating the VOCAB table: c(w1 ·) is the
    # sum of c2 over the prefix, so no second corpus pass
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    lp = (
        c2.join(c1, "w1")
        .select(
            "bg",
            F.round(
                F.log(F.col("c2").cast("double") / F.col("c1")) * F.lit(1e6),
                0,
            )
            .cast("bigint")
            .alias("lp"),
        )
    )
    d = big.groupBy(id_col, "bg").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        d.join(lp, "bg")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_bigrams"),
            F.sum(F.col("cnt") * F.col("lp")).alias("s"),
        )
        .select(
            id_col,
            F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
            F.round(
                -F.col("s").cast("double") / 1e6 / F.col("n_bigrams"), 6
            ).alias("avg_neg_logp"),
        )
    )


def pmi_top_bigrams(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    k: int = 50,
) -> DataFrame:
    """Top-k collocations by pointwise mutual information:
    PMI(w1,w2) = ln( c(w1 w2) · N / (c(w1 ·) · c(· w2)) ) over adjacent
    token pairs, with a ``min_count`` floor — the classic association
    screen (Church & Hanks 1990) a corpus audit runs to surface
    templated phrases and collocational anomalies before training
    (boilerplate shows up as impossibly-strong associations; a healthy
    corpus's top PMI list is named entities and idioms).

    The floor matters statistically AND mechanically: rare pairs have
    unboundedly-high PMI noise, and the floor is what keeps the ranked
    set vocabulary-bounded after filtering.

    Determinism: PMI is computed once per surviving bigram from four
    exact integers — the two marginals come from re-aggregating the
    bigram VOCAB table (no second corpus pass), N from its 1-row sum —
    as ln of one int64-ratio division, rounded to 6 dp; ordering is
    (pmi DESC, bigram ASC) so rank-boundary ties resolve identically
    in both engines. int64 products c·N stay exact below ~3·10^9
    bigram instances per product pair; past that (a 100 TB corpus)
    promote the ratio to double-first division — noted, not gated,
    since the floor keeps c(w1 w2)·N the only product at risk.

    Scale: one explode, one bigram-vocab groupBy, two vocab-sized
    re-aggregations joined back, and a TakeOrdered top-k heap — never
    a full sort; nothing after the first groupBy is corpus-sized.
    """

    big = _bigram_rows(df, text_col, id_col)
    # the bigram vocab feeds four consumers (N, both marginals, the
    # floored candidate set): pin it so the corpus explode runs once —
    # unpersisted, the plan re-scanned the corpus per consumer
    c2 = eager_persist(
        big.groupBy("bg").agg(F.count(F.lit(1)).alias("c_ab"))
    )
    n_tot = c2.agg(F.sum("c_ab").alias("__n"))
    parts = c2.select(
        "bg",
        "c_ab",
        F.substring_index("bg", " ", 1).alias("__w1"),
        F.substring_index("bg", " ", -1).alias("__w2"),
    )
    c1 = parts.groupBy("__w1").agg(F.sum("c_ab").alias("c_a"))
    cb = parts.groupBy("__w2").agg(F.sum("c_ab").alias("c_b"))
    pmi = F.round(
        F.log(
            (F.col("c_ab") * F.col("__n")).cast("double")
            / (F.col("c_a") * F.col("c_b"))
        ),
        6,
    )
    return (
        parts.filter(F.col("c_ab") >= min_count)
        .join(c1, "__w1")
        .join(cb, "__w2")
        .crossJoin(n_tot)
        .select(
            F.col("bg").alias("bigram"),
            F.col("c_ab").cast("bigint").alias("c_ab"),
            F.col("c_a").cast("bigint").alias("c_a"),
            F.col("c_b").cast("bigint").alias("c_b"),
            pmi.alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), F.col("bigram"))
        .limit(k)
    )


def source_token_kl(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source KL divergence from the corpus unigram distribution:
    KL(P_src ‖ P_corpus) = Σ_t p_t · ln(p_t / q_t) in nats — the
    mixture-audit scalar that ranks sources by how far their token
    distribution sits from the blend they are about to join (CCNet
    ranks by LM perplexity against a reference; against the corpus
    itself KL is the model-free equivalent). A boilerplate-heavy or
    wrong-language source shows up as a high-KL outlier before any
    model is trained; x79's PSI drifts a single numeric column, this
    drifts the whole vocabulary.

    No smoothing is needed: each source's tokens are a subset of the
    corpus's, so q_t > 0 wherever p_t > 0, and absent tokens contribute
    exactly 0 (lim p→0 of p·ln p/q). Every ratio
    (c_st·N)/(N_s·c_t) is a ratio of exact int64 products (exact below
    ~3·10^9 tokens per product; the 100 TB path promotes to
    double-first division), ln() is evaluated once per (source, token)
    — a vocab-bounded table — quantized to scaled BIGINT, and the
    per-source reduction is an exact integer sum, order-free under any
    partitioning (the x70/x83 determinism discipline).

    Scale: one explode, one (source, token) groupBy (vocab-bounded per
    source), one token-vocab re-aggregation for q, broadcast-sized
    joins of the per-source and corpus totals. Output is |sources|
    rows: (source, n_tokens, n_types, kl_nats).
    """

    tok = df.select(
        F.col(group_col), F.explode(tokenize(text_col)).alias("__t")
    )
    # the (source, token) table feeds three consumers (per-source
    # totals, corpus totals, the term join): pin it so the corpus
    # explode runs once instead of once per consumer
    cs = eager_persist(
        tok.groupBy(group_col, "__t").agg(F.count(F.lit(1)).alias("c_st"))
    )
    ns = cs.groupBy(group_col).agg(
        F.sum("c_st").alias("n_s"), F.count(F.lit(1)).alias("n_types")
    )
    ct = cs.groupBy("__t").agg(F.sum("c_st").alias("c_t"))
    n_tot = ct.agg(F.sum("c_t").alias("__n"))
    lnq = (
        F.round(
            F.log(
                (F.col("c_st") * F.col("__n")).cast("double")
                / (F.col("n_s") * F.col("c_t"))
            )
            * F.lit(1e6),
            0,
        )
        .cast("bigint")
        .alias("__lnq")
    )
    terms = (
        cs.join(ct, "__t")
        .join(ns.select(group_col, "n_s"), group_col)
        .crossJoin(n_tot)
        .select(F.col(group_col), F.col("c_st"), lnq)
    )
    return (
        terms.groupBy(group_col)
        .agg(F.sum(F.col("c_st") * F.col("__lnq")).alias("__s"))
        .join(ns, group_col)
        .select(
            F.col(group_col),
            F.col("n_s").cast("bigint").alias("n_tokens"),
            F.col("n_types").cast("bigint").alias("n_types"),
            F.round(
                F.col("__s").cast("double") / 1e6 / F.col("n_s"), 6
            ).alias("kl_nats"),
        )
    )


def source_stylometry(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Vocabulary-richness profile per source: ``(source, n_docs,
    n_tokens, n_types, n_hapax, ttr, hapax_frac, mean_word_len)``.
    Type-token ratio and hapax fraction are the classic stylometry
    signals for machine-generated or template text (a scraped listing
    farm has a tiny TTR; human prose at this scale sits much higher),
    and a mean-word-length outlier flags tokenizer-hostile content —
    the per-source triage read BEFORE choosing dedup and quality
    thresholds per source.

    Every emitted ratio is int/int (exact BIGINT numerators and
    denominators, one double division, round 6) — bit-reproducible
    across engines and partitionings, the x54 discipline.

    Plan shape: explode tokens → ONE partial-agg shuffle on (source,
    token) — the same vocabulary-bounded exchange as the corpus-freq
    family (shuffle rows ≤ |sources| × |vocab|, regardless of corpus
    row count) — then a |vocab|-sized re-agg per source and a
    broadcast join with the |sources|-row doc count. At 100 TB the
    map-side combine absorbs the token stream; nothing scales with
    raw token count past the combiner.
    """
    tok = df.select(
        F.col(group_col), F.explode(tokenize(text_col)).alias("__tok")
    )
    per = tok.groupBy(group_col, "__tok").agg(F.count(F.lit(1)).alias("__c"))
    st = per.groupBy(group_col).agg(
        F.sum("__c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum(F.when(F.col("__c") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_hapax"),
        F.sum(F.length("__tok") * F.col("__c")).cast("bigint").alias("__chars"),
    )
    nd = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    return st.join(F.broadcast(nd), group_col).select(
        group_col,
        "n_docs",
        "n_tokens",
        "n_types",
        "n_hapax",
        F.round(F.col("n_types").cast("double") / F.col("n_tokens"), 6).alias(
            "ttr"
        ),
        F.round(F.col("n_hapax").cast("double") / F.col("n_types"), 6).alias(
            "hapax_frac"
        ),
        F.round(F.col("__chars").cast("double") / F.col("n_tokens"), 6).alias(
            "mean_word_len"
        ),
    )
