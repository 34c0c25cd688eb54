"""LLM-data-pipeline extension queries (SURVEY.md §2.12 north star).

Deduplication, similarity search, text analysis, and multimodal plumbing —
each registered with a DuckDB oracle wherever the semantics are
SQL-expressible. The oracles share their constants (hash params,
hyperplanes, lexicons) with the operators via programmatic SQL generation,
so Spark and DuckDB compute the *same* deterministic function.

Cross-engine determinism relies on:
- md5 as the only string hash (identical in both engines);
- MinHash arithmetic mod the Mersenne prime 2^31-1 (no int64 overflow);
- double-precision sequential dot products (verified bitwise-identical
  between Spark's aggregate fold and DuckDB's list_dot_product);
- ±1 integer hyperplanes for LSH (exact ± sums, no float literal drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from twitter_kafka_etl_spark.io import read_table
from twitter_kafka_etl_spark.operators._cache import eager_persist
from twitter_kafka_etl_spark.operators import dedup as D
from twitter_kafka_etl_spark.operators import multimodal as M
from twitter_kafka_etl_spark.operators import similarity as S
from twitter_kafka_etl_spark.operators import text as T
from twitter_kafka_etl_spark.plans.catalog import _register

# ---------------------------------------------------------------------------
# shared SQL fragments
# ---------------------------------------------------------------------------

_NORM_SQL = "lower(regexp_replace(text, '\\s+', ' ', 'g'))"

#: DuckDB twin of operators.dedup.token_hash
_HASH_SQL = "(CAST('0x' || substr(md5({col}), 1, 8) AS BIGINT) % 2147483647)"

#: 3-gram shingle CTE (DuckDB is 1-indexed; Spark sequence is 0-indexed —
#: both yield len(tokens)-2 shingles)
_SHINGLE_CTE = """
  toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
  sh AS (
    SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, len(t) - 1),
             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
    FROM toks
  )
"""

_PARAMS = D.hash_params()
_MINHASH_EXPRS = ",\n      ".join(
    f"MIN(({a} * {_HASH_SQL.format(col='shingle')} + {b}) % {D.MERSENNE}) AS mh{i}"
    for i, (a, b) in enumerate(_PARAMS)
)
_SIG_CTE = f"""
  {_SHINGLE_CTE},
  sigs AS (
    SELECT doc_id,
      {_MINHASH_EXPRS}
    FROM sh GROUP BY doc_id
  )
"""

_BAND_BRANCHES = "\n    UNION ALL\n".join(
    "SELECT doc_id, {b} AS band, concat_ws('_', {cols}) AS sig FROM sigs".format(
        b=b,
        cols=", ".join(f"mh{b * D.ROWS_PER_BAND + r}" for r in range(D.ROWS_PER_BAND)),
    )
    for b in range(D.N_BANDS)
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rebalance: every consumer tokenizes/shingles — CPU-bound per row, so
    # scan splits must cover the cores (see read_table docstring).
    return read_table(spark, sf_dir, "documents", rebalance=True)


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "embeddings", rebalance=True)


# ---------------------------------------------------------------------------
# deduplication
# ---------------------------------------------------------------------------
@_register(
    "x01_dedup_exact",
    "exact dedup: hash-groupBy on normalized-md5 fingerprint; keeper = min id",
    f"""
    SELECT md5({_NORM_SQL}) AS fp, min(doc_id) AS keeper_id,
           COUNT(*) AS dup_cnt
    FROM documents GROUP BY fp
    """,
    tags=("dedup", "extension"),
)
def x01(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_duplicates(_docs(spark, sf_dir))


@_register(
    "x02_dedup_minhash_signatures",
    "16-fn MinHash signatures over 3-gram shingles (md5-derived hashes, "
    "mod-Mersenne arithmetic — engine-portable)",
    f"""
    WITH {_SIG_CTE}
    SELECT * FROM sigs
    """,
    tags=("dedup", "extension"),
)
def x02(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.corpus_signatures(_docs(spark, sf_dir))


@_register(
    "x03_dedup_minhash_lsh_pairs",
    "banded MinHash-LSH candidate pairs (4 bands × 4 rows, bucket equi-join)",
    f"""
    WITH {_SIG_CTE},
    bands AS (
    {_BAND_BRANCHES}
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    """,
    tags=("dedup", "extension"),
)
def x03(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_lsh_pairs(D.corpus_signatures(_docs(spark, sf_dir)))


_SIMHASH_BITS = 32
_SIMHASH_SUMS = ",\n      ".join(
    f"SUM(CASE WHEN (hv >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS s{i}"
    for i in range(_SIMHASH_BITS)
)
_SIMHASH_VALUE = " + ".join(
    f"(CASE WHEN s{i} > 0 THEN {2**i} ELSE 0 END)" for i in range(_SIMHASH_BITS)
)
_SIMHASH_CTE = f"""
  tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
  hv AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) AS hv FROM tk),
  bits AS (SELECT doc_id, {_SIMHASH_SUMS} FROM hv GROUP BY doc_id),
  sim AS (SELECT doc_id, CAST({_SIMHASH_VALUE} AS BIGINT) AS simhash FROM bits)
"""


@_register(
    "x04_dedup_simhash",
    "32-bit SimHash per document (token-hash bit votes, sign → bit)",
    f"""
    WITH {_SIMHASH_CTE}
    SELECT doc_id, simhash FROM sim
    """,
    tags=("dedup", "extension"),
)
def x04(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash(_docs(spark, sf_dir))


@_register(
    "x05_dedup_simhash_pairs",
    "SimHash near-dup pairs: hamming <= 3 via 4-chunk pigeonhole banding",
    f"""
    WITH {_SIMHASH_CTE},
    chunks AS (
      SELECT doc_id, simhash,
             (simhash >> 0) & 255 AS c0, (simhash >> 8) & 255 AS c1,
             (simhash >> 16) & 255 AS c2, (simhash >> 24) & 255 AS c3
      FROM sim
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.simhash AS sa, b.simhash AS sb
      FROM chunks a JOIN chunks b
        ON a.doc_id < b.doc_id
       AND (a.c0 = b.c0 OR a.c1 = b.c1 OR a.c2 = b.c2 OR a.c3 = b.c3)
    )
    SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
    FROM pairs WHERE bit_count(xor(sa, sb)) <= 3
    """,
    tags=("dedup", "extension"),
)
def x05(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_pairs(D.simhash(_docs(spark, sf_dir)))


@_register(
    "x06_dedup_ngram_jaccard",
    "exact 3-gram Jaccard >= 0.2 via inverted-index self-join "
    "(|A∩B| from shared shingles, joined on the shared 60-bit md5 hash "
    "— 8-byte shuffle keys; hot shingles df-capped before the join; "
    "no cross join)",
    f"""
    WITH {_SHINGLE_CTE},
    shh0 AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) AS sh_h
      FROM sh
    ),
    shh AS (
      SELECT doc_id, sh_h FROM shh0
      QUALIFY COUNT(*) OVER (PARTITION BY sh_h) <= {D.JACCARD_DF_CAP}
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
      FROM shh a JOIN shh b ON a.sh_h = b.sh_h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           common / (sa.n_sh + sb.n_sh - common) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE common / (sa.n_sh + sb.n_sh - common) >= 0.2
    """,
    tags=("dedup", "extension"),
)
def x06(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.2)


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

_COS_SQL = (
    "round(list_dot_product({v}, {q}) / "
    "(sqrt(list_dot_product({v}, {v})) * sqrt(list_dot_product({q}, {q}))), 6)"
)


@_register(
    "x07_dedup_embedding_cosine",
    "embedding near-dup pairs: exact cosine >= 0.35 over id-ordered join",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
           -- zero-norm guard: cosine undefined, same rule as the engine
           WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_COS_SQL.format(v='a.v', q='b.v')} AS cos_sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE {_COS_SQL.format(v='a.v', q='b.v')} >= 0.35
    """,
    tags=("dedup", "similarity", "extension"),
)
def x07(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.cosine_pairs(_emb(spark, sf_dir), threshold=0.35)


@_register(
    "x08_sim_topk_bruteforce",
    "exact cosine top-10 neighbors of vec_id=0 (brute-force baseline)",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
           -- zero-norm guard: cosine undefined, same rule as the engine
           WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0),
    q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
    SELECT vec_id, {_COS_SQL.format(v='v', q='qv')} AS cos_sim
    FROM e, q WHERE vec_id <> 0
    ORDER BY cos_sim DESC, vec_id LIMIT 10
    """,
    tags=("similarity", "extension"),
)
def x08(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.topk_bruteforce(_emb(spark, sf_dir), query_id=0, k=10)


_PLANES = S.hyperplanes()
_PLANE_LITS = [
    "[" + ", ".join(f"{float(v)}" for v in p) + "]::DOUBLE[]" for p in _PLANES
]
_BUCKET_SQL = " + ".join(
    f"(CASE WHEN list_dot_product({{v}}, {lit}) > 0 THEN {2**i} ELSE 0 END)"
    for i, lit in enumerate(_PLANE_LITS)
)


@_register(
    "x09_sim_ann_lsh",
    "ANN top-5 via sign-random-projection LSH: score only the query's "
    "bucket (the 100 TB scale path; brute-force is the recall baseline)",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
           -- zero-norm guard: cosine undefined, same rule as the engine
           WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0),
    assigned AS (
      SELECT vec_id, v, ({_BUCKET_SQL.format(v='v')}) AS bucket FROM e
    ),
    q AS (SELECT v AS qv, bucket AS qb FROM assigned WHERE vec_id = 0)
    SELECT vec_id, {_COS_SQL.format(v='v', q='qv')} AS cos_sim
    FROM assigned, q WHERE bucket = qb AND vec_id <> 0
    ORDER BY cos_sim DESC, vec_id LIMIT 5
    """,
    tags=("similarity", "extension"),
)
def x09(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.topk_lsh(_emb(spark, sf_dir), query_id=0, k=5)


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

_MARKER_LIST = {
    lang: "[" + ", ".join(f"'{m}'" for m in marks) + "]"
    for lang, marks in T.LANG_MARKERS.items()
}


@_register(
    "x10_text_langid",
    "marker-word language ID with 'und' fallback (argmax, alphabetical "
    "tie-break, >=2 marker threshold)",
    f"""
    WITH t AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS td
               FROM documents),
    s AS (SELECT doc_id,
          len(list_intersect(td, {_MARKER_LIST['de']})) AS s_de,
          len(list_intersect(td, {_MARKER_LIST['en']})) AS s_en,
          len(list_intersect(td, {_MARKER_LIST['es']})) AS s_es,
          len(list_intersect(td, {_MARKER_LIST['fr']})) AS s_fr
          FROM t)
    SELECT doc_id,
      CASE WHEN greatest(s_de, s_en, s_es, s_fr) < 2 THEN 'und'
           WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
           WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
           WHEN s_es >= s_fr THEN 'es'
           ELSE 'fr' END AS pred_lang
    FROM s
    """,
    tags=("text", "extension"),
)
def x10(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.lang_id(_docs(spark, sf_dir)).select("doc_id", "pred_lang")


@_register(
    "x11_text_quality",
    "quality features: distinct-token ratio, stopword ratio, punctuation "
    "ratio, combined score",
    """
    WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS tk
               FROM documents),
    c AS (SELECT doc_id, len(tk) AS n, len(list_distinct(tk)) AS nd,
                 len(list_filter(tk, x -> x = 'a' OR x = 'the')) AS sh,
                 length(text) AS nc,
                 length(text)
                   - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))
                   AS np
          FROM t)
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           CAST(nd AS BIGINT) AS n_distinct,
           nd / n AS distinct_ratio,
           sh / n AS stopword_ratio,
           np / nc AS punct_ratio,
           round((nd / n) * 0.5 + (1.0 - sh / n) * 0.5, 6) AS quality_score
    FROM c
    """,
    tags=("text", "extension"),
)
def x11(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.quality_features(_docs(spark, sf_dir)).select(
        "doc_id", "n_tokens", "n_distinct", "distinct_ratio",
        "stopword_ratio", "punct_ratio", "quality_score",
    )


@_register(
    "x12_text_tokens",
    "token counting: whitespace, BPE-ish regex pieces, chars/4 estimate",
    f"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '{T.BPE_PATTERN}')) AS BIGINT)
             AS bpe_pieces,
           CAST(ceil(length(text) / 4) AS BIGINT) AS approx_tokens
    FROM documents
    """,
    tags=("text", "extension"),
)
def x12(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.token_stats(_docs(spark, sf_dir)).select(
        "doc_id", "ws_tokens", "bpe_pieces", "approx_tokens"
    )


@_register(
    "x13_text_fingerprint",
    "md5 document fingerprint over normalized text (rolling exact-dup key)",
    f"""
    SELECT doc_id, md5({_NORM_SQL}) AS fp FROM documents
    """,
    tags=("text", "extension"),
)
def x13(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.fingerprint(_docs(spark, sf_dir)).select("doc_id", "fp")


_POS_PRED = " OR ".join(f"x = '{w}'" for w in sorted(T.POSITIVE_WORDS))
_NEG_PRED = " OR ".join(f"x = '{w}'" for w in sorted(T.NEGATIVE_WORDS))
_EMOTION_LIST = "[" + ", ".join(f"'{e}'" for e in T.EMOTIONS) + "]"


@_register(
    "x14_text_classify",
    "U1/U2 lexicon classifiers as Arrow pandas UDFs — sentiment + 6-label "
    "emotion, same (text)->label shape as the reference's NLP pipelines "
    "(consumer.scala:85,125-155)",
    f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    c AS (SELECT doc_id,
          len(list_filter(tk, x -> {_POS_PRED})) AS pos,
          len(list_filter(tk, x -> {_NEG_PRED})) AS neg
          FROM t)
    SELECT doc_id,
      CASE WHEN pos > neg THEN 'positive'
           WHEN neg > pos THEN 'negative'
           ELSE 'neutral' END AS sentiment,
      {_EMOTION_LIST}[(pos * 3 + neg) % 6 + 1] AS emotion
    FROM c
    """,
    tags=("text", "udf", "extension"),
)
def x14(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.enrich_text(_docs(spark, sf_dir)).select("doc_id", "sentiment", "emotion")


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------
@_register(
    "x15_multimodal_features",
    "binary payload column + Arrow mapInPandas feature extraction "
    "(deterministic fake decoder; real decoders are explicit stubs)",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           -- first BYTE of the UTF-8 payload (hex pair 1), not the first
           -- CHARACTER's codepoint: ascii() would diverge from the
           -- engine's payload[0] on any non-ASCII leading char
           CAST(CASE WHEN octet_length(encode(text)) = 0 THEN -1
                ELSE CAST('0x' || substr(hex(encode(text)), 1, 2) AS INT)
                END AS INT) AS first_byte,
           'application/octet-stream' AS media_type
    FROM documents
    """,
    tags=("multimodal", "udf", "extension"),
)
def x15(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.extract_features(M.attach_binary(_docs(spark, sf_dir)))


# ---------------------------------------------------------------------------
# x16 — IVF ANN (complements the LSH variant: data-adaptive coarse cells)
# ---------------------------------------------------------------------------
@_register(
    "x16_sim_ivf",
    "ANN top-5 neighbors of vec_id=0 via IVF coarse quantization: "
    "deterministic centroids (vec_id % max(61, isqrt(n)) = 0, ≈√n cells "
    "above 61² rows), nearest-centroid assignment, exact cosine rerank "
    "inside the query's cell (nprobe=1)",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
           -- zero-norm guard: cosine undefined, same rule as the engine
           WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0),
    -- centroid stride mirrors similarity.centroid_mod_for: max(61, isqrt(n))
    cents AS (SELECT vec_id AS cent_id, v AS cvec FROM e
              WHERE vec_id % (SELECT GREATEST({S.CENTROID_MOD},
                       CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT)) FROM e) = 0),
    assign AS (
      SELECT vec_id, v, cent_id FROM (
        SELECT e.vec_id, e.v, c.cent_id,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_dot_product(e.v, c.cvec) /
                          (sqrt(list_dot_product(e.v, e.v)) *
                           sqrt(list_dot_product(c.cvec, c.cvec))) DESC,
                   c.cent_id) AS rn
        FROM e CROSS JOIN cents c)
      WHERE rn = 1
    ),
    q AS (SELECT v AS qvec, cent_id AS qcent FROM assign WHERE vec_id = 0)
    SELECT a.vec_id, {_COS_SQL.format(v='a.v', q='qvec')} AS cos_sim
    FROM assign a, q
    WHERE a.cent_id = q.qcent AND a.vec_id <> 0
    ORDER BY cos_sim DESC, a.vec_id LIMIT 5
    """,
    tags=("similarity", "extension"),
)
def x16(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.topk_ivf(_emb(spark, sf_dir), query_id=0, k=5)


# ---------------------------------------------------------------------------
# x17 — multimodal frame sampling (video-style fan-out plumbing)
# ---------------------------------------------------------------------------
@_register(
    "x17_multimodal_frames",
    "frame the binary payload into 16-byte chunks, sample every 4th "
    "frame, one metadata-only row per sampled frame (video keyframe "
    "sampling plumbing; real decoder slots into the same mapInPandas)",
    """
    WITH f AS (
      SELECT doc_id,
             unnest(range(0, CAST(ceil(octet_length(encode(text)) / 16.0)
                                  AS BIGINT), 4)) AS i,
             octet_length(encode(text)) AS n
      FROM documents
    )
    SELECT doc_id, CAST(i AS INT) AS frame_idx,
           CAST(LEAST(16, n - i * 16) AS INT) AS frame_bytes
    FROM f
    """,
    tags=("multimodal", "udf", "extension"),
)
def x17(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.sample_frames(M.attach_binary(_docs(spark, sf_dir)))


# ---------------------------------------------------------------------------
# x18 — winnowing rolling-hash fingerprints (Schleimer et al., SIGMOD 2003)
# ---------------------------------------------------------------------------
@_register(
    "x18_text_winnowing",
    "winnowing fingerprints: ordered 3-gram hashes, window-of-4 minima, "
    "distinct — shared >=6-token substrings are guaranteed to share a "
    "fingerprint; the whole chain is per-row JVM array ops (no shuffle)",
    f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    g AS (
      SELECT doc_id,
             CASE WHEN len(t) >= 3 THEN
               list_transform(range(1, len(t) - 1),
                              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
             ELSE []::VARCHAR[] END AS grams
      FROM toks
    ),
    h AS (
      SELECT doc_id,
             list_transform(grams, s -> {_HASH_SQL.format(col='s')}) AS hs
      FROM g
    ),
    wnd AS (
      SELECT doc_id,
             CASE WHEN len(hs) >= 4 THEN
               list_distinct(list_transform(range(1, len(hs) - 2),
                                            i -> list_min(hs[i:i+3])))
             ELSE []::BIGINT[] END AS fps
      FROM h
    )
    SELECT doc_id,
           CAST(len(fps) AS BIGINT) AS n_fp,
           CAST(list_min(fps) AS BIGINT) AS min_fp
    FROM wnd
    """,
    tags=("text", "dedup", "extension"),
)
def x18(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.winnow_fingerprints(_docs(spark, sf_dir), k=3, w=4)


# ---------------------------------------------------------------------------
# x19/x20 — count-min sketch (deterministic frequency sketch; Cormode &
# Muthukrishnan 2005). Cells derive from md5 hashes, so the oracle
# rebuilds the sketch bit-identically.
# ---------------------------------------------------------------------------
from twitter_kafka_etl_spark.operators import sketches as K  # noqa: E402

_CM_PARAMS = D.hash_params(K.CM_DEPTH, seed=K.CM_SEED)


def _cm_coords_sql(hash_expr: str) -> str:
    """UNION ALL branches producing (depth, cell) per input row."""
    return "\n      UNION ALL\n".join(
        f"SELECT {d} AS depth, "
        f"((({a} * {hash_expr} + {b}) % {D.MERSENNE}) % {K.CM_WIDTH}) AS cell "
        f"FROM {{src}}"
        for d, (a, b) in enumerate(_CM_PARAMS)
    )


_CM_BUILD_SQL = f"""
    WITH h AS (
      SELECT {_HASH_SQL.format(col="COALESCE(CAST(user_id AS VARCHAR), 'NULL')")} AS hv
      FROM events
    ),
    coords AS (
      {_cm_coords_sql('hv').format(src='h')}
    )
    SELECT depth, cell, COUNT(*) AS counts
    FROM coords GROUP BY depth, cell
"""


@_register(
    "x19_sketch_countmin",
    "count-min sketch (depth 4 × width 64) over events.user_id — "
    "md5-derived cells, one explode + groupBy, <= depth×width output "
    "rows at any input scale; sketches merge by cell-wise addition",
    _CM_BUILD_SQL,
    tags=("sketch", "extension"),
)
def x19(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return K.count_min_build(ev, "user_id")


_cm_probe_branches = "\n      UNION ALL\n      ".join(
    f"SELECT event_type, {d} AS depth, "
    f"((({a} * ih + {b}) % {D.MERSENNE}) % {K.CM_WIDTH}) AS cell FROM items"
    for d, (a, b) in enumerate(_CM_PARAMS)
)


@_register(
    "x20_sketch_countmin_estimate",
    "count-min point estimates for every distinct event_type: min over "
    "depths of the item's cells — probes join the tiny sketch, never "
    "the raw data; estimates upper-bound the true counts",
    f"""
    WITH h AS (
      SELECT {_HASH_SQL.format(col="COALESCE(event_type, 'NULL')")} AS hv FROM events
    ),
    coords AS (
      {_cm_coords_sql('hv').format(src='h')}
    ),
    sketch AS (
      SELECT depth, cell, COUNT(*) AS counts
      FROM coords GROUP BY depth, cell
    ),
    items AS (
      SELECT DISTINCT event_type,
             {_HASH_SQL.format(col="COALESCE(event_type, 'NULL')")} AS ih
      FROM events
    ),
    probes AS (
      {_cm_probe_branches}
    )
    -- LEFT JOIN + COALESCE 0: an item absent from the build data has
    -- empty cells and must estimate to 0, matching the engine's
    -- fill-missing-with-0 semantics (an inner join would silently take
    -- MIN over only the present cells)
    SELECT p.event_type, MIN(COALESCE(s.counts, 0)) AS est_count
    FROM probes p LEFT JOIN sketch s
      ON s.depth = p.depth AND s.cell = p.cell
    GROUP BY p.event_type
    """,
    tags=("sketch", "extension"),
)
def x20(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    sketch = K.count_min_build(ev, "event_type")
    items = ev.select("event_type").distinct()
    return K.count_min_estimate(sketch, items, "event_type")


# ---------------------------------------------------------------------------
# x21-x24 — training-data curation: deterministic sampling, splits,
# sequence packing, context-window chunking
# ---------------------------------------------------------------------------
from twitter_kafka_etl_spark.operators import curation as C  # noqa: E402

_BUCKET_SQL_T = (
    "(CAST('0x' || substr(md5('{salt}' || CAST({col} AS VARCHAR)), 1, 8) "
    "AS BIGINT) % 100)"
)


@_register(
    "x21_curation_sample",
    "reproducible 10% document sample keyed on md5(doc_id) — rand()-free "
    "so retries/ablations/engines select identical rows",
    f"""
    SELECT doc_id, lang FROM documents
    WHERE {_BUCKET_SQL_T.format(salt='sample', col='doc_id')} < 10
    """,
    tags=("curation", "extension"),
)
def x21(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.hash_sample(_docs(spark, sf_dir), "doc_id", 10).select(
        "doc_id", "lang"
    )


@_register(
    "x22_curation_split",
    "disjoint 90/5/5 train/val/test assignment from contiguous hash "
    "ranges — membership is a pure function of doc_id (no leakage under "
    "reshuffles or appends); counts per (split, lang)",
    f"""
    WITH b AS (
      SELECT lang, {_BUCKET_SQL_T.format(salt='split', col='doc_id')} AS bk
      FROM documents
    )
    SELECT CASE WHEN bk < 90 THEN 'train'
                WHEN bk < 95 THEN 'val' ELSE 'test' END AS split,
           lang, COUNT(*) AS counts
    FROM b GROUP BY split, lang
    """,
    tags=("curation", "extension"),
)
def x22(spark: SparkSession, sf_dir: str) -> DataFrame:
    assigned = C.split_assign(_docs(spark, sf_dir), "doc_id")
    return assigned.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("counts")
    )


@_register(
    "x23_curation_pack",
    "pack documents into 512-token training sequences per source (stable "
    "doc_id order): seq = floor(cumulative-tokens-before / budget) — one "
    "window shuffle; output per-sequence doc and token counts",
    """
    WITH t AS (
      SELECT source, doc_id, len(string_split(text, ' ')) AS tok
      FROM documents
    ),
    c AS (
      SELECT source, tok,
             COALESCE(SUM(tok) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
      FROM t
    )
    SELECT source, CAST(floor(cb / 512) AS BIGINT) AS seq_id,
           COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS seq_tokens
    FROM c GROUP BY source, seq_id
    """,
    tags=("curation", "extension"),
)
def x23(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).withColumn(
        "tok", F.size(F.split("text", " ")).cast("bigint")
    )
    packed = C.pack_sequences(docs, "tok", 512, ["source"], ["doc_id"])
    return packed.groupBy("source", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tok").cast("bigint").alias("seq_tokens"),
    )


@_register(
    "x24_curation_chunks",
    "context-window chunking: 128-token windows, 32-token overlap, one "
    "row per chunk via pure array arithmetic + explode (no shuffle)",
    """
    WITH t AS (
      SELECT doc_id, len(string_split(text, ' ')) AS tok FROM documents
    ),
    n AS (
      SELECT doc_id, tok,
             CASE WHEN tok <= 128 THEN 1
                  ELSE CAST(ceil((tok - 128) / 96.0) AS BIGINT) + 1 END AS nc
      FROM t
    ),
    e AS (SELECT doc_id, tok, unnest(range(0, nc)) AS ci FROM n)
    SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
           CAST(ci * 96 AS BIGINT) AS start_tok,
           CAST(LEAST(128, tok - ci * 96) AS BIGINT) AS chunk_tokens
    FROM e
    """,
    tags=("curation", "extension"),
)
def x24(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).withColumn(
        "tok", F.size(F.split("text", " ")).cast("bigint")
    )
    return C.chunk_spans(docs, "tok", size=128, overlap=32)


# ---------------------------------------------------------------------------
# x25 — duplicate clustering: pair graph → connected components
# ---------------------------------------------------------------------------
@_register(
    "x25_dedup_components",
    "near-dup pair graph → duplicate clusters: distributed min-label "
    "propagation (one equi-join + partial-agg shuffle per round, "
    "lineage-truncated; rounds = component diameter) over minhash-LSH "
    "pairs; every document gets component_id = min reachable doc id, "
    "singletons = self — the step that turns candidate pairs into an "
    "actual keep/drop dedup decision",
    f"""
    WITH RECURSIVE {_SIG_CTE},
    bands AS (
    {_BAND_BRANCHES}
    ),
    prs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM prs
      UNION SELECT doc_b, doc_a FROM prs
    ),
    reach(id, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id
    )
    SELECT id AS doc_id, MIN(lbl) AS component_id FROM reach GROUP BY id
    """,
    tags=("dedup", "extension"),
)
def x25(spark: SparkSession, sf_dir: str) -> DataFrame:
    # memoized: x25/x36/x89 share one pairs→components build per session
    return D.corpus_components(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# x26 — deterministic HyperLogLog distinct-count sketch
# ---------------------------------------------------------------------------

_HLL_HASH = _HASH_SQL.format(col="COALESCE(CAST(user_id AS VARCHAR), 'NULL')")
_HLL_RHO = "CASE " + " ".join(
    f"WHEN v >= {1 << (K.HLL_W - 1 - i)} THEN {i + 1}" for i in range(K.HLL_W)
) + f" ELSE {K.HLL_W + 1} END"


@_register(
    "x26_sketch_hll",
    "deterministic HyperLogLog (p=6, 64 registers from md5-derived "
    "hashes): distinct users per event_type; registers merge by "
    "cell-wise max, estimates are bit-identical across engines because "
    "the harmonic sum adds exact powers of two (unlike "
    "approx_count_distinct, whose JVM-private registers can't be "
    "oracle-checked or merged cross-engine)",
    f"""
    WITH h AS (
      SELECT event_type, {_HLL_HASH} AS hv FROM events
    ),
    r AS (
      SELECT event_type, hv % {K.HLL_M} AS bucket,
             (SELECT {_HLL_RHO} FROM (SELECT hv // {K.HLL_M} AS v)) AS rho
      FROM h
    ),
    regs AS (
      SELECT event_type, bucket, MAX(rho) AS rho FROM r GROUP BY 1, 2
    ),
    agg AS (
      SELECT event_type,
             SUM(power(2.0, -rho)) + ({K.HLL_M} - COUNT(*)) AS s,
             {K.HLL_M} - COUNT(*) AS v
      FROM regs GROUP BY event_type
    )
    -- below 2.5m with empty registers: linear-counting correction
    -- m*ln(m/V), else raw alpha*m^2/S (branch condition is exact)
    SELECT event_type,
           round(CASE WHEN v > 0
                       AND {K.HLL_ALPHA} * {K.HLL_M * K.HLL_M} / s
                           <= {2.5 * K.HLL_M}
                      THEN {K.HLL_M} * ln({K.HLL_M} / v)
                      ELSE {K.HLL_ALPHA} * {K.HLL_M * K.HLL_M} / s END, 6)
             AS est_distinct
    FROM agg GROUP BY event_type, s, v
    """,
    tags=("sketch", "extension"),
)
def x26(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return K.hll_estimate(K.hll_build(ev, "event_type", "user_id"), "event_type")


# ---------------------------------------------------------------------------
# x27 — end-to-end curation pipeline: quality → lang → dedup → split
# ---------------------------------------------------------------------------
@_register(
    "x27_pipeline_curation",
    "the full pre-training curation chain as ONE declarative plan — "
    "quality-score filter (>= 0.5), language filter (en), exact-dedup "
    "keeper selection, deterministic split assignment, per-split doc/"
    "token accounting. Catalyst fuses the chain: the three doc-level "
    "signals compute in parallel branches joined on doc_id, no "
    "intermediate materialization (what a user actually runs at 100 TB)",
    f"""
    WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS tk
               FROM documents),
    q AS (
      SELECT doc_id,
             round((len(list_distinct(tk)) / len(tk)) * 0.5 +
                   (1.0 - len(list_filter(tk, x -> x = 'a' OR x = 'the'))
                     / len(tk)) * 0.5, 6) AS quality_score
      FROM t
    ),
    s AS (SELECT doc_id,
          len(list_intersect(list_distinct(tk), {_MARKER_LIST['de']})) AS s_de,
          len(list_intersect(list_distinct(tk), {_MARKER_LIST['en']})) AS s_en,
          len(list_intersect(list_distinct(tk), {_MARKER_LIST['es']})) AS s_es,
          len(list_intersect(list_distinct(tk), {_MARKER_LIST['fr']})) AS s_fr
          FROM t),
    l AS (
      SELECT doc_id,
        CASE WHEN greatest(s_de, s_en, s_es, s_fr) < 2 THEN 'und'
             WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
             WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
             WHEN s_es >= s_fr THEN 'es'
             ELSE 'fr' END AS pred_lang
      FROM s
    ),
    k AS (SELECT min(doc_id) AS doc_id FROM documents
          GROUP BY md5({_NORM_SQL})),
    base AS (
      SELECT t.doc_id, len(tk) AS tok,
             {_BUCKET_SQL_T.format(salt='split', col='t.doc_id')} AS bk
      FROM t
      JOIN q ON q.doc_id = t.doc_id
      JOIN l ON l.doc_id = t.doc_id
      JOIN k ON k.doc_id = t.doc_id
      WHERE q.quality_score >= 0.5 AND l.pred_lang = 'en'
    )
    SELECT CASE WHEN bk < 90 THEN 'train'
                WHEN bk < 95 THEN 'val' ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(tok) AS BIGINT) AS total_tokens
    FROM base GROUP BY split
    """,
    tags=("curation", "text", "dedup", "extension"),
)
def x27(spark: SparkSession, sf_dir: str) -> DataFrame:
    # quality + lang are per-row signals: computed as columns in ONE narrow
    # pass (no self-joins). Keeper selection is the only shuffle; exact
    # duplicates share identical text, hence identical quality/lang, so
    # filtering BEFORE the keeper window keeps whole dup-groups or none —
    # same keepers as dedup-then-filter, but the shuffle only carries
    # survivors, and only (doc_id, fp, tok), never the text.
    docs = _docs(spark, sf_dir)
    enriched = T.lang_id(T.quality_features(docs))
    slim = enriched.filter(
        (F.col("quality_score") >= 0.5) & (F.col("pred_lang") == "en")
    ).select(
        "doc_id",
        F.md5(D.fingerprint_norm(F.col("text"))).alias("fp"),
        F.size(F.split("text", " ")).cast("bigint").alias("tok"),
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    keepers = (
        slim.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "fp")
    )
    assigned = C.split_assign(keepers, "doc_id")
    return assigned.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tok").cast("bigint").alias("total_tokens"),
    )


# ---------------------------------------------------------------------------
# x28 — TF-IDF characteristic terms (rational idf: engine-portable, no ln)
# ---------------------------------------------------------------------------
@_register(
    "x28_text_tfidf",
    "top-3 characteristic terms per document by TF-IDF with rational idf "
    "(N+1)/(df+1) — same ranking as log-idf (monotone transform) but "
    "every score is one IEEE division of exact integers, so no libm-"
    "rounding drift across engines; explode → tf groupBy → df count "
    "window → broadcast N → per-doc top-k window (two shuffles)",
    """
    WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tk GROUP BY 1, 2),
    sc AS (
      SELECT doc_id, term,
             tf * ((SELECT COUNT(*) FROM documents) + 1.0)
                / (COUNT(*) OVER (PARTITION BY term) + 1) AS score
      FROM tf
    ),
    r AS (
      SELECT doc_id, term, round(score, 6) AS tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, term) AS rank
      FROM sc
    )
    SELECT doc_id, term, tfidf, CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= 3
    """,
    tags=("text", "extension"),
)
def x28(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.tfidf_top_terms(_docs(spark, sf_dir), k=3)


# ---------------------------------------------------------------------------
# x29 — intra-document repetition signals (Gopher/C4-style filters)
# ---------------------------------------------------------------------------
@_register(
    "x29_text_repetition",
    "intra-document repetition quality signals: duplicate 2-gram "
    "fraction and most-repeated-2-gram share (the Gopher/C4 boilerplate "
    "filters) — n-gram explode + two partial-agg shuffles, O(grams) "
    "work, zeros for sub-n-token docs via left join",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    g AS (
      SELECT doc_id,
             unnest(CASE WHEN len(t) >= 2 THEN
               list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
             ELSE []::VARCHAR[] END) AS g
      FROM toks
    ),
    per AS (SELECT doc_id, g, COUNT(*) AS c FROM g GROUP BY 1, 2),
    sig AS (
      SELECT doc_id, SUM(c) AS n_grams, COUNT(*) AS nd, MAX(c) AS top_c
      FROM per GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(s.n_grams, 0) AS BIGINT) AS n_grams,
           round(CASE WHEN s.n_grams > 0
                      THEN (s.n_grams - s.nd) / CAST(s.n_grams AS DOUBLE)
                      ELSE 0.0 END, 6) AS dup_frac,
           round(CASE WHEN s.n_grams > 0
                      THEN s.top_c / CAST(s.n_grams AS DOUBLE)
                      ELSE 0.0 END, 6) AS top_share
    FROM documents d LEFT JOIN sig s ON s.doc_id = d.doc_id
    """,
    tags=("text", "extension"),
)
def x29(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.repetition_signals(_docs(spark, sf_dir), n=2)


# ---------------------------------------------------------------------------
# x30 — per-source quality rollup (the curation dashboard query)
# ---------------------------------------------------------------------------
@_register(
    "x30_source_quality_rollup",
    "per-source curation rollup joining the doc-level signals: doc/token "
    "counts, mean quality score (decimal-summed — order-independent "
    "across any partitioning), share of high-repetition docs. The "
    "query a data curator runs to decide which sources to keep at 100 TB",
    """
    WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS tk
               FROM documents),
    q AS (
      SELECT doc_id, source, len(tk) AS tok,
             round((len(list_distinct(tk)) / len(tk)) * 0.5 +
                   (1.0 - len(list_filter(tk, x -> x = 'a' OR x = 'the'))
                     / len(tk)) * 0.5, 6) AS qs
      FROM t
    ),
    g AS (
      SELECT doc_id,
             unnest(CASE WHEN len(tk) >= 2 THEN
               list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])
             ELSE []::VARCHAR[] END) AS g
      FROM t
    ),
    per AS (SELECT doc_id, g, COUNT(*) AS c FROM g GROUP BY 1, 2),
    rep AS (
      SELECT doc_id,
             (SUM(c) - COUNT(*)) / CAST(SUM(c) AS DOUBLE) AS dup_frac
      FROM per GROUP BY doc_id
    )
    SELECT q.source,
           COUNT(*) AS n_docs,
           CAST(SUM(q.tok) AS BIGINT) AS total_tokens,
           round(CAST(SUM(CAST(q.qs AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_quality,
           CAST(count_if(COALESCE(rep.dup_frac, 0) > 0.2) AS BIGINT)
             AS high_repetition_docs
    FROM q LEFT JOIN rep ON rep.doc_id = q.doc_id
    GROUP BY q.source
    """,
    tags=("curation", "text", "extension"),
)
def x30(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    q = T.quality_features(docs).select(
        "doc_id", "source", F.col("n_tokens").alias("tok"), F.col("quality_score")
    )
    rep = T.repetition_signals(docs).select("doc_id", "dup_frac")
    from twitter_kafka_etl_spark.functions.scalar import decimal_sum

    return (
        q.join(rep, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok").cast("bigint").alias("total_tokens"),
            F.round(
                decimal_sum("quality_score", 18, 6).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_quality"),
            F.sum(
                F.when(F.coalesce(F.col("dup_frac"), F.lit(0.0)) > 0.2, 1).otherwise(0)
            ).cast("bigint").alias("high_repetition_docs"),
        )
    )


# ---------------------------------------------------------------------------
# x31 — deterministic stratified sampling (N per language)
# ---------------------------------------------------------------------------
@_register(
    "x31_curation_stratified",
    "stratified sample: exactly 20 docs per language, chosen by salted "
    "md5 order — deterministic across runs/engines/partitionings, the "
    "class-balancing step of a training mix (one window shuffle)",
    """
    WITH r AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5('strat' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS sample_rank
      FROM documents
    )
    SELECT doc_id, lang, CAST(sample_rank AS BIGINT) AS sample_rank
    FROM r WHERE sample_rank <= 20
    """,
    tags=("curation", "extension"),
)
def x31(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.stratified_sample(
        _docs(spark, sf_dir), ["lang"], 20, "doc_id"
    ).select("doc_id", "lang", "sample_rank")


# ---------------------------------------------------------------------------
# x32 — benchmark decontamination (n-gram overlap vs a held-out set)
# ---------------------------------------------------------------------------
#: 60-bit md5 gram hash, the DuckDB twin of dedup.token_hash60
_HASH60_SQL = "CAST('0x' || substr(md5({col}), 1, 15) AS BIGINT)"


@_register(
    "x32_decontaminate",
    "benchmark decontamination: per-doc 3-gram overlap vs the held-out "
    "set (doc_id % 41 = 0) — the keep-evals-out-of-training step; the "
    "small benchmark gram set broadcasts, grams join on 60-bit hashes",
    f"""
    WITH {_SHINGLE_CTE},
    hsh AS (
      SELECT doc_id, {_HASH60_SQL.format(col='shingle')} AS g FROM sh
    ),
    bench AS (SELECT DISTINCT g FROM hsh WHERE doc_id % 41 = 0),
    hit AS (
      SELECT h.doc_id, COUNT(*) AS c
      FROM hsh h JOIN bench b ON b.g = h.g GROUP BY h.doc_id
    ),
    sizes AS (
      SELECT d.doc_id, COALESCE(s.c0, 0) AS n_grams
      FROM documents d LEFT JOIN
        (SELECT doc_id, COUNT(*) AS c0 FROM sh GROUP BY doc_id) s
        USING (doc_id)
    )
    SELECT s.doc_id,
           CAST(s.n_grams AS BIGINT) AS n_grams,
           CAST(COALESCE(h.c, 0) AS BIGINT) AS contaminated_grams,
           round(CASE WHEN s.n_grams = 0 THEN 0.0
                 ELSE COALESCE(h.c, 0) / CAST(s.n_grams AS DOUBLE) END,
                 6) AS contamination,
           (CASE WHEN s.n_grams = 0 THEN 0.0
            ELSE COALESCE(h.c, 0) / CAST(s.n_grams AS DOUBLE) END)
             >= 0.5 AS flagged
    FROM sizes s LEFT JOIN hit h USING (doc_id)
    """,
    tags=("dedup", "curation", "extension"),
)
def x32(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 41 == 0)
    return D.decontaminate(docs, bench, n=3, flag_threshold=0.5)


# ---------------------------------------------------------------------------
# x33 — bloom-filter membership sketch (build + probe, FP-rate visible)
# ---------------------------------------------------------------------------
_BLOOM_PARAMS = D.hash_params(K.BLOOM_K, seed=K.BLOOM_SEED)
_BLOOM_CUT = "TIMESTAMP '1995-07-01'"


def _bloom_coords_sql(table: str, hcol: str, carry: str = "") -> str:
    """UNION ALL branches emitting each row's k (word, bit-value) bloom
    coordinates, optionally carrying an id column through."""
    carry_sql = f", {carry}" if carry else ""
    branches = []
    for a, b in _BLOOM_PARAMS:
        pos = f"((({a} * {hcol} + {b}) % {D.MERSENNE}) % {K.BLOOM_M})"
        branches.append(
            f"SELECT {pos} // {K.BLOOM_WORD} AS word, "
            f"CAST(pow(2, {pos} % {K.BLOOM_WORD}) AS BIGINT) AS v"
            f"{carry_sql} FROM {table}"
        )
    return "\n      UNION ALL\n      ".join(branches)


@_register(
    "x33_sketch_bloom",
    "bloom membership (m=4096, k=4, md5-derived bits packed into 32-bit "
    "words): build over custkeys ordering before 1995-07-01, probe every "
    "customer; output shows hits vs ground truth (one-sided error: "
    "misses definite, hits may be false positives)",
    f"""
    WITH bh AS (
      SELECT {_HASH_SQL.format(col="COALESCE(CAST(o_custkey AS VARCHAR), 'NULL')")} AS h
      FROM orders WHERE o_orderdate < {_BLOOM_CUT}
    ),
    coords AS (
      {_bloom_coords_sql('bh', 'h')}
    ),
    sketch AS (SELECT word, bit_or(v) AS bits FROM coords GROUP BY word),
    items AS (
      SELECT c_custkey AS custkey,
             {_HASH_SQL.format(col="COALESCE(CAST(c_custkey AS VARCHAR), 'NULL')")} AS h
      FROM customer
    ),
    probes AS (
      {_bloom_coords_sql('items', 'h', carry='custkey')}
    ),
    hit AS (
      SELECT p.custkey,
             MIN(CASE WHEN (COALESCE(s.bits, 0) & p.v) <> 0
                 THEN 1 ELSE 0 END) AS all_set
      FROM probes p LEFT JOIN sketch s USING (word)
      GROUP BY p.custkey
    ),
    truth AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate < {_BLOOM_CUT}
    )
    SELECT h.custkey, h.all_set = 1 AS bloom_hit,
           t.o_custkey IS NOT NULL AS actual
    FROM hit h LEFT JOIN truth t ON t.o_custkey = h.custkey
    """,
    tags=("sketch", "extension"),
)
def x33(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    members = orders.filter(
        F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp")
    ).select("o_custkey")
    sketch = K.bloom_build(members, "o_custkey")
    probed = K.bloom_probe(
        sketch, cust.select(F.col("c_custkey").alias("custkey")), "custkey"
    )
    truth = members.distinct().withColumnRenamed("o_custkey", "custkey")
    return probed.join(
        truth.withColumn("__t", F.lit(1)), "custkey", "left"
    ).select(
        "custkey", "bloom_hit", F.col("__t").isNotNull().alias("actual")
    )


# ---------------------------------------------------------------------------
# x34 — vocabulary build + per-doc OOV rate (tokenizer prep)
# ---------------------------------------------------------------------------
@_register(
    "x34_vocab_coverage",
    "top-20 global vocabulary (count desc, token asc — deterministic) "
    "+ per-doc OOV rate: one counts pass over distinct tokens, vocab "
    "broadcast back onto the token stream, one partial-agg shuffle",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    counts AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
    vocab AS (
      SELECT tok FROM (
        SELECT tok, ROW_NUMBER() OVER (ORDER BY c DESC, tok ASC) AS r
        FROM counts
      ) WHERE r <= 20
    )
    SELECT t.doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS oov_tokens,
           round(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS oov_rate
    FROM toks t LEFT JOIN vocab v ON v.tok = t.tok
    GROUP BY t.doc_id
    """,
    tags=("text", "curation", "extension"),
)
def x34(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.vocab_coverage(_docs(spark, sf_dir), top_k=20)


# ---------------------------------------------------------------------------
# x35 — fixed-width histogram (the 100 TB column-profiling primitive)
# ---------------------------------------------------------------------------
from twitter_kafka_etl_spark.operators import relational as R  # noqa: E402


@_register(
    "x35_price_histogram",
    "fixed-width histogram of l_extendedprice (24 bins over [0, 120k]): "
    "narrow bucket expression + one partial-agg shuffle of <= nbins "
    "groups — no sort, no percentile state; decimal-exact per-bin sums",
    """
    WITH b AS (
      SELECT LEAST(GREATEST(CAST(floor((l_extendedprice - 0.0) / 5000.0)
               AS BIGINT), 0), 23) AS bucket,
             l_extendedprice
      FROM lineitem
    )
    SELECT bucket,
           round(0.0 + bucket * 5000.0, 6) AS bucket_lo,
           COUNT(*) AS n,
           round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2)))
                 AS DOUBLE), 2) AS total
    FROM b GROUP BY bucket
    """,
    tags=("relational", "extension"),
)
def x35(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return R.fixed_width_histogram(li, "l_extendedprice", 0.0, 120000.0, 24)


# ---------------------------------------------------------------------------
# x36 — the dedup DECISION: components + quality → keeper per cluster
# ---------------------------------------------------------------------------
@_register(
    "x36_dedup_keepers",
    "keeper selection: minhash-LSH pair graph → connected components → "
    "keep the highest-quality member per duplicate cluster (ties by min "
    "id) — the decision step between 'pairs found' and 'rows dropped'; "
    "one window shuffle on the component key",
    f"""
    WITH RECURSIVE {_SIG_CTE},
    bands AS (
    {_BAND_BRANCHES}
    ),
    prs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM prs
      UNION SELECT doc_b, doc_a FROM prs
    ),
    reach(id, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id
    ),
    comp AS (SELECT id AS doc_id, MIN(lbl) AS component_id
             FROM reach GROUP BY id),
    q AS (
      SELECT doc_id,
             round((len(list_distinct(tk)) / len(tk)) * 0.5 +
                   (1.0 - len(list_filter(tk, x -> x = 'a' OR x = 'the'))
                     / len(tk)) * 0.5, 6) AS quality_score
      FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
    )
    SELECT c.doc_id, c.component_id, q.quality_score,
           ROW_NUMBER() OVER (PARTITION BY c.component_id
                              ORDER BY q.quality_score DESC, c.doc_id) = 1
             AS keep
    FROM comp c JOIN q USING (doc_id)
    """,
    tags=("dedup", "curation", "extension"),
)
def x36(spark: SparkSession, sf_dir: str) -> DataFrame:
    from twitter_kafka_etl_spark.operators import curation as C

    docs = _docs(spark, sf_dir)
    # memoized components working set (pair-graph persist + propagation
    # live inside corpus_components) — shared with x25/x89
    comp = D.corpus_components(docs)
    scored = T.quality_features(docs).select("doc_id", "quality_score")
    return C.select_keepers(scored, comp)


# ---------------------------------------------------------------------------
# x37 — unigram corpus-frequency fluency score (perplexity-filter stand-in)
# ---------------------------------------------------------------------------
@_register(
    "x37_text_corpus_freq",
    "unigram corpus-frequency fluency score: mean corpus-frequency share "
    "of each document's tokens — exact integer numerator/denominator, "
    "one final division (the engine-portable perplexity-filter stand-in)",
    """
    WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
               FROM documents),
    c AS (SELECT tok, COUNT(*) AS c FROM t GROUP BY tok),
    tot AS (SELECT COUNT(*) AS n FROM t),
    d AS (
      SELECT t.doc_id, COUNT(*) AS n_tokens, SUM(c.c) AS sum_freq
      FROM t JOIN c USING (tok) GROUP BY t.doc_id
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(sum_freq AS BIGINT) AS sum_freq,
           round(CAST(sum_freq AS DOUBLE) / (n_tokens * n), 6) AS freq_score
    FROM d, tot
    """,
    tags=("text", "extension"),
)
def x37(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.corpus_freq_score(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# x38 — exact length-percentile outlier flags
# ---------------------------------------------------------------------------
@_register(
    "x38_length_percentiles",
    "token-length outlier flags at exact discrete p10/p90: cumulative "
    "count over the length HISTOGRAM (vocabulary of lengths, not the "
    "corpus), thresholds broadcast back — integer arithmetic only",
    """
    WITH lens AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
                  FROM documents),
    h AS (SELECT n_tokens AS v, COUNT(*) AS c FROM lens GROUP BY v),
    cc AS (SELECT v, CAST(SUM(c) OVER (ORDER BY v) AS BIGINT) AS cum FROM h),
    tot AS (SELECT COUNT(*) AS n FROM lens),
    th AS (
      SELECT MIN(CASE WHEN cum >= (n * 10 + 99) // 100 THEN v END) AS p_lo,
             MIN(CASE WHEN cum >= (n * 90 + 99) // 100 THEN v END) AS p_hi
      FROM cc, tot
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           n_tokens < p_lo AS flag_short,
           n_tokens > p_hi AS flag_long
    FROM lens, th
    """,
    tags=("curation", "text", "extension"),
)
def x38(spark: SparkSession, sf_dir: str) -> DataFrame:
    from twitter_kafka_etl_spark.operators import curation as C

    return C.length_percentile_flags(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# x39 — Zipf head: top tokens by corpus frequency with cumulative share
# ---------------------------------------------------------------------------
@_register(
    "x39_zipf_tokens",
    "Zipf profile head: top-20 tokens by global count with corpus share "
    "and cumulative head share — ranking window over the distinct-token "
    "counts table (vocabulary-bounded), exact integer shares",
    """
    WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
    c AS (SELECT tok, COUNT(*) AS c FROM t GROUP BY tok),
    tot AS (SELECT COUNT(*) AS n FROM t),
    r AS (
      SELECT tok, c,
             ROW_NUMBER() OVER (ORDER BY c DESC, tok ASC) AS rank,
             CAST(SUM(c) OVER (ORDER BY c DESC, tok ASC
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_c
      FROM c
    )
    SELECT tok, CAST(c AS BIGINT) AS count, CAST(rank AS BIGINT) AS rank,
           round(CAST(c AS DOUBLE) / n, 6) AS share,
           round(CAST(cum_c AS DOUBLE) / n, 6) AS cum_share
    FROM r, tot WHERE rank <= 20
    """,
    tags=("text", "extension"),
)
def x39(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.zipf_top_tokens(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# x40 — per-label embedding centroids (IVF coarse-quantizer training pass)
# ---------------------------------------------------------------------------
@_register(
    "x40_label_centroids",
    "per-label embedding centroids in long form (label, dim, value): "
    "posexplode + one partial-agg shuffle on (label, pos); sums in "
    "DECIMAL(38,12) so the mean is order-independent — the coarse-"
    "quantizer/class-prototype pass over the embedding table",
    """
    WITH x AS (
      SELECT label,
             unnest(list_transform(range(1, len(embedding) + 1),
                    i -> {'p': i, 'v': embedding[i]})) AS s
      FROM embeddings
    ),
    f AS (SELECT label, s.p - 1 AS pos, CAST(s.v AS DOUBLE) AS v FROM x)
    SELECT label, CAST(pos AS BIGINT) AS pos,
           round(CAST(SUM(CAST(v AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*), 6)
             AS centroid
    FROM f GROUP BY label, pos
    """,
    tags=("similarity", "extension"),
)
def x40(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.label_centroids(_emb(spark, sf_dir))


# ---------------------------------------------------------------------------
# x41 — per-group EXACT percentiles (grouped profiling primitive)
# ---------------------------------------------------------------------------
@_register(
    "x41_grouped_percentiles",
    "exact discrete p25/p50/p75 of value per event_type: cumulative "
    "window over the per-group VALUE HISTOGRAM (distinct values, never "
    "a per-group row sort), integer ceil thresholds — the deterministic "
    "replacement for approx_percentile in cross-engine profiling",
    """
    WITH h AS (SELECT event_type, value AS v, COUNT(*) AS c
               FROM events GROUP BY 1, 2),
    cc AS (SELECT event_type, v,
                  CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
           FROM h),
    n AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1)
    SELECT event_type,
           MIN(CASE WHEN cum >= (n * 25 + 99) // 100 THEN v END) AS p25,
           MIN(CASE WHEN cum >= (n * 50 + 99) // 100 THEN v END) AS p50,
           MIN(CASE WHEN cum >= (n * 75 + 99) // 100 THEN v END) AS p75
    FROM cc JOIN n USING (event_type) GROUP BY event_type
    """,
    tags=("relational", "extension"),
)
def x41(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return R.grouped_percentiles(ev, "value", ("event_type",))


# ---------------------------------------------------------------------------
# x42 — strata balancing (downsample to the smallest class)
# ---------------------------------------------------------------------------
@_register(
    "x42_curation_balance",
    "class-balance by language: every stratum downsampled to the "
    "smallest stratum's size in salted-md5 order — data-dependent cap "
    "(vs x31's given cap), broadcast as a one-row frame; deterministic "
    "under any partitioning",
    """
    WITH s AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    cap AS (SELECT MIN(n) AS cap FROM s),
    r AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5('balance' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rank
      FROM documents
    )
    SELECT doc_id, lang, CAST(rank AS BIGINT) AS rank
    FROM r, cap WHERE rank <= cap
    """,
    tags=("curation", "extension"),
)
def x42(spark: SparkSession, sf_dir: str) -> DataFrame:
    from twitter_kafka_etl_spark.operators import curation as C

    docs = _docs(spark, sf_dir)
    return C.balance_strata(docs, ("lang",), "doc_id").select(
        "doc_id", "lang", "rank"
    )


# ---------------------------------------------------------------------------
# x43 — salted skew join (result == plain join, pathological-skew insurance)
# ---------------------------------------------------------------------------
@_register(
    "x43_salted_join",
    "skew-salted equi-join lineitem ⋈ part: fact rows carry a "
    "deterministic xxhash64 salt, the dimension replicates n_salts ways, "
    "the join key becomes (key, salt) — one hot key spreads over "
    "n_salts reducers; output identical to the plain join (the oracle "
    "IS the plain join)",
    """
    SELECT l.l_orderkey, l.l_partkey, l.l_quantity, p.p_name
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
    tags=("relational", "extension"),
)
def x43(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_partkey").alias("p_partkey"), "l_quantity"
    )
    pt = read_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    return R.salted_join(li, pt, "p_partkey").select(
        "l_orderkey",
        F.col("p_partkey").alias("l_partkey"),
        "l_quantity",
        "p_name",
    )


# ---------------------------------------------------------------------------
# x44 — PII-shape redaction (oracle generated from the SAME pattern list)
# ---------------------------------------------------------------------------
def _pii_sql(col: str) -> tuple[str, str]:
    """DuckDB twin of operators.text.redact_pii: same patterns, same
    order, counts taken on the same intermediate each mask sees."""
    cur, counts = col, []
    for pat, tag in T.PII_PATTERNS:
        counts.append(f"len(regexp_extract_all({cur}, '{pat}'))")
        cur = f"regexp_replace({cur}, '{pat}', '{tag}', 'g')"
    return cur, " + ".join(counts)


_PII_RED, _PII_CNT = _pii_sql("props")


@_register(
    "x44_pii_redaction",
    "PII-shape redaction over event payloads: ordered email/IP/number "
    "masking with per-pattern counts — pure JVM regexp, shuffle-free "
    "(the pre-training scrub pass)",
    f"""
    SELECT event_id, {_PII_RED} AS redacted,
           CAST({_PII_CNT} AS BIGINT) AS n_redactions
    FROM events
    """,
    tags=("text", "extension"),
)
def x44(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return T.redact_pii(ev, "props").select(
        "event_id", "redacted", "n_redactions"
    )


# ---------------------------------------------------------------------------
# x45 — int8 embedding quantization (bit-exact across engines)
# ---------------------------------------------------------------------------
@_register(
    "x45_embedding_quantize",
    "symmetric int8 embedding quantization: scale = max|v|/127, "
    "q_i = floor(v_i/scale + 0.5) — every step an identical IEEE op in "
    "both engines, so the full quantized VECTORS hash-match (encoded as "
    "a CSV string: the driver's canonicalizer can't sort raw array "
    "columns), plus the max reconstruction error; narrow per-row "
    "arrays, no shuffle",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    s AS (SELECT vec_id, v,
                 list_max(list_transform(v, x -> abs(x))) / 127.0 AS sc
          FROM e),
    q AS (SELECT vec_id, v, sc,
                 CASE WHEN sc = 0 THEN list_transform(v, x -> 0)
                      ELSE list_transform(
                          v, x -> CAST(floor(x / sc + 0.5) AS INT))
                 END AS qv
          FROM s)
    SELECT vec_id, round(sc, 6) AS scale,
           array_to_string(qv, ',') AS qvec_csv,
           round(list_max(list_transform(
               range(1, len(v) + 1), i -> abs(v[i] - qv[i] * sc))), 6)
             AS max_err
    FROM q
    """,
    tags=("similarity", "extension"),
)
def x45(spark: SparkSession, sf_dir: str) -> DataFrame:
    # quantize_int8 keeps the real array<int> output for downstream use;
    # the registered (oracle-compared) surface encodes it as CSV because
    # the driver's canonicalizer sorts every column and raw lists are
    # unhashable (CORRECTNESS_r03: TypeError crash, no signal at all)
    out = S.quantize_int8(_emb(spark, sf_dir))
    return out.select(
        "vec_id",
        "scale",
        F.array_join(F.col("qvec").cast("array<string>"), ",").alias(
            "qvec_csv"
        ),
        "max_err",
    )


# ---------------------------------------------------------------------------
# x46 — MinHash-estimated Jaccard on the LSH candidate pairs
# ---------------------------------------------------------------------------
_AGREE_SQL = " + ".join(
    f"(CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END)"
    for i in range(D.N_HASHES)
)


@_register(
    "x46_dedup_jaccard_estimate",
    "MinHash Jaccard estimate per LSH candidate pair: fraction of the "
    "16 signature components that agree — scores candidates from the "
    "tiny signature table (two equi-joins) instead of re-reading text, "
    "the near-dup decision input at corpus scale",
    f"""
    WITH {_SIG_CTE},
    bands AS (
    {_BAND_BRANCHES}
    ),
    prs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    )
    SELECT p.doc_a, p.doc_b,
           round(({_AGREE_SQL}) / {float(D.N_HASHES)}, 6) AS est_jaccard
    FROM prs p
    JOIN sigs sa ON p.doc_a = sa.doc_id
    JOIN sigs sb ON p.doc_b = sb.doc_id
    """,
    tags=("dedup", "extension"),
)
def x46(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    # corpus_signatures is memoized+persisted: the signature table feeds
    # both the band join and the two estimate joins, and sibling queries
    # (x59/x60) share the same working set
    sigs = D.corpus_signatures(docs)
    pairs = D.minhash_lsh_pairs(sigs)
    return D.estimate_jaccard(sigs, pairs)


# ---------------------------------------------------------------------------
# x47 — random-projection dim reduction (the pre-ANN 64d -> 8d cut)
# ---------------------------------------------------------------------------
_PROJ_COLS = ",\n           ".join(
    f"round(list_dot_product(v, {lit}), 6) AS p{i}"
    for i, lit in enumerate(_PLANE_LITS)
)


@_register(
    "x47_embedding_project",
    "random-projection dim reduction 64d -> 8d against the deterministic "
    "+-1 hyperplanes (Johnson-Lindenstrauss cut before ANN indexing) — "
    "exact +- sums, narrow per-row arithmetic, no shuffle",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT vec_id,
           {_PROJ_COLS}
    FROM e
    """,
    tags=("similarity", "extension"),
)
def x47(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.project_embeddings(_emb(spark, sf_dir))


# ---------------------------------------------------------------------------
# x48 — AMS F2 sketch (self-join-size estimate, one pass, no keyed shuffle)
# ---------------------------------------------------------------------------
_AMS_K = 8
# one digest per row; sign_i = parity of hex nibble i (mirror of
# sketches.ams_f2_sketch — k per-preimage md5s would cost 8x the hash
# work for independence the estimator doesn't need)
_AMS_DIGEST = "md5(COALESCE(CAST(user_id AS VARCHAR), 'NULL'))"
_AMS_SUMS = ",\n           ".join(
    f"SUM(CASE WHEN CAST('0x' || substr({_AMS_DIGEST}, {i + 1}, 1) AS BIGINT)"
    f" % 2 = 1 THEN 1 ELSE -1 END) AS s{i}"
    for i in range(_AMS_K)
)
# CAST everything to BIGINT: DuckDB SUM(int) returns HUGEINT (INT128),
# which pandas materializes as object/float64 and the driver's
# canonicalized hash then differs from Spark's bigint output even when
# every value is identical (CORRECTNESS_r03 x48 false red).
_AMS_BRANCHES = "\n    UNION ALL\n".join(
    f"    SELECT CAST({i} AS BIGINT) AS sketch_id,"
    f" CAST(s{i} AS BIGINT) AS signed_sum,"
    f" CAST(s{i} * s{i} AS BIGINT) AS est_f2 FROM s"
    for i in range(_AMS_K)
)


@_register(
    "x48_sketch_ams_f2",
    "AMS second-moment sketch over event user_id: k +-1-signed row sums, "
    "each squared an unbiased self-join-size estimate — ONE pass, no "
    "keyed shuffle, O(k) state at any scale (the exact form needs a full "
    "groupBy shuffle); md5 signs make it engine-exact",
    f"""
    WITH s AS (
      SELECT
           {_AMS_SUMS}
      FROM events
    )
{_AMS_BRANCHES}
    """,
    tags=("sketch", "extension"),
)
def x48(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return K.ams_f2_sketch(ev, "user_id", k=_AMS_K)


# ---------------------------------------------------------------------------
# x49 — sequence-length bucketing with padding-waste accounting
# ---------------------------------------------------------------------------
# boundaries start at 16 so the synthetic corpus (10-99 whitespace
# tokens) actually spreads across buckets; the tail mirrors real
# context-window configs
_LB = (16, 32, 64, 128, 256, 512, 1024, 2048, 4096)
_LB_CASE = (
    "CASE "
    + " ".join(f"WHEN eff <= {b} THEN {b}" for b in _LB)
    + f" ELSE {_LB[-1]} END"
)


@_register(
    "x49_length_buckets",
    "sequence-length bucketing for batch shaping: each document maps to "
    "the smallest power-of-two bucket holding its whitespace tokens "
    "(truncating at the 4096 context limit); per-bucket padding-waste "
    "accounting = the compute burned on pad tokens — fixed integer "
    "boundaries, one partial-agg shuffle on <=7 keys",
    f"""
    WITH d AS (
      SELECT LEAST(CAST(len(string_split(text, ' ')) AS BIGINT), {_LB[-1]})
               AS eff
      FROM documents
    ), b AS (
      SELECT CAST({_LB_CASE} AS BIGINT) AS bucket, eff FROM d
    )
    SELECT bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(eff) AS BIGINT) AS total_tokens,
           CAST(bucket * COUNT(*) AS BIGINT) AS padded_tokens,
           CAST(bucket * COUNT(*) - SUM(eff) AS BIGINT) AS padding_waste,
           round((bucket * COUNT(*) - SUM(eff))
                 / CAST(bucket * COUNT(*) AS DOUBLE), 6) AS waste_frac
    FROM b GROUP BY bucket
    """,
    tags=("curation", "text", "extension"),
)
def x49(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.length_bucket_stats(_docs(spark, sf_dir), "text", _LB)


# ---------------------------------------------------------------------------
# x50 — per-source weighted mixture sampling (the training-mix step)
# ---------------------------------------------------------------------------
#: mixture config: high-value sources kept whole, web-ish sources cut
_MIX_WEIGHTS = {"src0": 100, "src1": 75, "src2": 50, "src3": 25, "src4": 0}
_MIX_DEFAULT = 10
_MIX_CASE = (
    "CASE source "
    + " ".join(f"WHEN '{s}' THEN {p}" for s, p in sorted(_MIX_WEIGHTS.items()))
    + f" ELSE {_MIX_DEFAULT} END"
)


@_register(
    "x50_dataset_mixture",
    "per-source weighted mixture sampling: each source kept at its own "
    "integer rate through the salted-md5 bucket (src0 whole, src4 "
    "dropped, long tail at 10%) — the dataset-mixture step of a "
    "training-mix build; pure function of (salt, doc_id), so the drawn "
    "mixture is reproducible under retries and across engines; narrow "
    "per-row filter, no shuffle",
    f"""
    SELECT doc_id, source FROM documents
    WHERE {_BUCKET_SQL_T.format(salt='mixture', col='doc_id')}
            < {_MIX_CASE}
    """,
    tags=("curation", "extension"),
)
def x50(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.mixture_sample(
        _docs(spark, sf_dir), "source", "doc_id", _MIX_WEIGHTS, _MIX_DEFAULT
    ).select("doc_id", "source")


# ---------------------------------------------------------------------------
# x51 — corpus snapshot diff (the recrawl-delta primitive)
# ---------------------------------------------------------------------------
@_register(
    "x51_snapshot_diff",
    "corpus snapshot delta: classify every doc across two snapshots as "
    "added/removed/changed/unchanged by content fingerprint (md5), so a "
    "refresh reprocesses only the delta — one full-outer equi-join on "
    "doc_id, fingerprints map-side; the 'new' snapshot is a "
    "deterministic perturbation of documents (drop %7, edit %5, add "
    "%11 under shifted ids) so the expected statuses are known",
    """
    WITH old AS (SELECT doc_id, md5(text) AS fp FROM documents),
    new AS (
      SELECT doc_id,
             md5(text || CASE WHEN doc_id % 5 = 0 THEN ' delta'
                              ELSE '' END) AS fp
      FROM documents WHERE doc_id % 7 <> 0
      UNION ALL
      SELECT doc_id + 1000000, md5(text)
      FROM documents WHERE doc_id % 11 = 0
    )
    SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN o.fp = n.fp THEN 'unchanged'
                ELSE 'changed' END AS status
    FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
    """,
    tags=("curation", "dedup", "extension"),
)
def x51(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    changed = docs.filter(F.col("doc_id") % 7 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" delta"))
        ).otherwise(F.col("text")),
    )
    added = docs.filter(F.col("doc_id") % 11 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1_000_000)
    )
    new_snapshot = changed.unionByName(added)
    return C.snapshot_diff(docs, new_snapshot).select("doc_id", "status")


# ---------------------------------------------------------------------------
# x52 — sketch-guided EXACT heavy hitters (two-pass hot-key detection)
# ---------------------------------------------------------------------------
_HH_T = 70  # ~mean events/user is ~67 at every sf — selects the hot tail


@_register(
    "x52_heavy_hitters",
    "exact heavy hitters via count-min pruning: pass 1 builds the O(w*d) "
    "sketch (no per-key shuffle), candidates = keys whose estimate "
    "clears the threshold (CM never underestimates -> no false "
    "negatives), pass 2 exact-counts ONLY the broadcast candidate set "
    "and filters the collisions — output is bitwise identical to the "
    "full groupBy + HAVING the oracle runs, which is the point: the "
    "approximate machinery is safely substitutable at 100 TB",
    f"""
    SELECT user_id, COUNT(*) AS counts
    FROM events GROUP BY user_id HAVING COUNT(*) >= {_HH_T}
    """,
    tags=("sketch", "extension"),
)
def x52(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return K.heavy_hitters(ev, "user_id", _HH_T)


# ---------------------------------------------------------------------------
# x53 — sub-document duplicated-span analysis (exact substring-block dedup)
# ---------------------------------------------------------------------------
_SPAN_W = 16


@_register(
    "x53_duplicated_spans",
    "sub-document exact-span dedup signal (Lee et al. 2022 at block "
    "granularity): disjoint 16-token blocks fingerprinted corpus-wide; "
    "per doc the count/fraction of blocks that occur at >1 (doc, "
    "position) anywhere — catches repeated boilerplate whole-doc dedup "
    "misses; one explode at tokens/16 rows, one partial-agg groupBy on "
    "a 64-bit fp, one equi-join back — no self-join, no quadratic step",
    f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    b AS (
      SELECT doc_id,
             unnest(list_transform(
               range(0, CAST(len(t) // {_SPAN_W} AS INT)),
               i -> substr(md5(array_to_string(
                      t[i*{_SPAN_W}+1:i*{_SPAN_W}+{_SPAN_W}], ' ')), 1, 16)))
               AS fp
      FROM toks),
    occ AS (SELECT fp, COUNT(*) AS c FROM b GROUP BY fp),
    per AS (SELECT doc_id, COUNT(*) AS nb,
                   SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS ndup
            FROM b JOIN occ USING (fp) GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(p.nb, 0) AS BIGINT) AS n_blocks,
           CAST(COALESCE(p.ndup, 0) AS BIGINT) AS n_dup_blocks,
           round(CASE WHEN p.nb > 0 THEN p.ndup / CAST(p.nb AS DOUBLE)
                      ELSE 0.0 END, 6) AS dup_frac
    FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id
    """,
    tags=("dedup", "text", "extension"),
)
def x53(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.duplicated_spans(_docs(spark, sf_dir), block_tokens=_SPAN_W)


# ---------------------------------------------------------------------------
# x54 — composed quality-filter gate (the Gopher/C4 keep/drop verdict)
# ---------------------------------------------------------------------------
_QG = dict(
    min_tokens=24,
    max_tokens=100_000,
    min_distinct_ratio=0.35,
    max_stopword_ratio=0.12,
    max_dup_frac=0.08,
    max_top_share=0.10,
)
_QG_CONDS = {
    "pass_length": f"(n >= {_QG['min_tokens']} AND n <= {_QG['max_tokens']})",
    "pass_distinct": f"(nd / n >= {_QG['min_distinct_ratio']})",
    "pass_stopword": f"(sh / n <= {_QG['max_stopword_ratio']})",
    "pass_repetition": f"(dup_frac <= {_QG['max_dup_frac']})",
    "pass_top_share": f"(top_share <= {_QG['max_top_share']})",
}
_QG_FLAGS = ",\n           ".join(
    f"CAST({cond} AS BIGINT) AS {name}" for name, cond in _QG_CONDS.items()
)


@_register(
    "x54_quality_gate",
    "Gopher/C4-style composed quality gate: length bounds, "
    "distinct-token ratio, stopword ceiling, duplicate-2-gram fraction "
    "and top-2-gram share as per-rule 0/1 flags plus the conjunctive "
    "keep verdict — every ratio an exact int/int double, so the "
    "threshold decisions reproduce bit-for-bit across engines/reruns",
    f"""
    WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS tk
               FROM documents),
    c AS (SELECT doc_id, len(tk) AS n, len(list_distinct(tk)) AS nd,
                 len(list_filter(tk, x -> x = 'a' OR x = 'the')) AS sh
          FROM t),
    g AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(tk)),
                    i -> tk[i] || ' ' || tk[i+1])) AS g
      FROM t
    ),
    per AS (SELECT doc_id, g, COUNT(*) AS cnt FROM g GROUP BY 1, 2),
    sig AS (
      SELECT doc_id, SUM(cnt) AS ng, COUNT(*) AS ndg, MAX(cnt) AS tc
      FROM per GROUP BY doc_id
    ),
    r AS (
      SELECT c.doc_id, c.n, c.nd, c.sh,
             round(CASE WHEN s.ng > 0
                        THEN (s.ng - s.ndg) / CAST(s.ng AS DOUBLE)
                        ELSE 0.0 END, 6) AS dup_frac,
             round(CASE WHEN s.ng > 0
                        THEN s.tc / CAST(s.ng AS DOUBLE)
                        ELSE 0.0 END, 6) AS top_share
      FROM c LEFT JOIN sig s ON s.doc_id = c.doc_id
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           {_QG_FLAGS},
           CAST(({" AND ".join(_QG_CONDS.values())}) AS BIGINT) AS keep
    FROM r
    """,
    tags=("curation", "text", "extension"),
)
def x54(spark: SparkSession, sf_dir: str) -> DataFrame:
    from twitter_kafka_etl_spark.operators import curation as C

    return C.quality_gate(_docs(spark, sf_dir), **_QG)


# ---------------------------------------------------------------------------
# x55 — compaction round-trip (layout maintenance with a content oracle)
# ---------------------------------------------------------------------------
#: 60-bit md5-prefix row fingerprint mod a prime: summable without
#: overflow (sf1 ~6e5 rows × <1e9 ≈ 6e14 « 2^63) and identical in both
#: engines, so the compacted files must carry EXACTLY the input rows
_CK_MOD = 1_000_000_007
_CK_SQL = (
    f"(CAST('0x' || substr(md5(doc_id || ':' || text), 1, 15) AS BIGINT)"
    f" % {_CK_MOD})"
)


@_register(
    "x55_compaction_roundtrip",
    "small-file compaction as a verified maintenance job: a 64-file "
    "fragmented copy of documents (the layout a streaming sink "
    "accumulates) is rewritten to ~4 right-sized files by "
    "layout.compact, and the per-source row counts, char totals and "
    "md5 content checksums are computed FROM THE REWRITTEN FILES — the "
    "oracle computes the same invariants from the raw table, so a "
    "compaction that drops, duplicates or mangles one row goes red; "
    "the rewrite itself is one shuffle-free repartition pass",
    f"""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM({_CK_SQL}) AS BIGINT) AS content_sum
    FROM documents GROUP BY source
    """,
    tags=("layout", "extension"),
)
def x55(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from twitter_kafka_etl_spark import layout

    sf_name = os.path.basename(os.path.normpath(sf_dir))
    root = os.path.join(tempfile.gettempdir(), f"tkes_compact_{sf_name}")
    frag = os.path.join(root, "fragmented")
    marker = os.path.join(root, ".staged")
    try:
        st = os.stat(os.path.join(sf_dir, "documents.parquet"))
        key = f"{os.path.abspath(sf_dir)}|{st.st_mtime_ns}:{st.st_size}"
    except OSError:
        key = "missing"
    try:
        with open(marker) as fh:
            cached = fh.read() == key
    except OSError:
        cached = False
    if not cached:
        # stage the fragmented input once per source-table identity
        # (same marker-last contract as streaming._staged_input)
        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(root, exist_ok=True)
        read_table(spark, sf_dir, "documents").repartition(64).write.mode(
            "overwrite"
        ).parquet(frag)
        with open(marker, "w") as fh:
            fh.write(key)
    out = os.path.join(root, f"compacted_{os.getpid()}")
    layout.compact(spark, frag, out, n_files=4)
    comp = spark.read.parquet(out)
    ck = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        F.col("text"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % _CK_MOD
    )
    return comp.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum(ck).cast("bigint").alias("content_sum"),
    )


# ---------------------------------------------------------------------------
# x56 — span-removal rewrite (the dedup PASS that x53 audits)
# ---------------------------------------------------------------------------
@_register(
    "x56_span_removal",
    "span-level dedup rewrite: every 16-token block that already "
    "occurred earlier in the corpus (first occurrence by (doc_id, "
    "position) wins — a total order, so the rewrite is deterministic "
    "and idempotent) is dropped and each document reassembled from its "
    "kept blocks + sub-block tail; emits the cleaned text itself, so "
    "the oracle verifies the full rewritten corpus byte-for-byte",
    f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                  FROM documents),
    base AS (SELECT doc_id, t, CAST(len(t) // {_SPAN_W} AS INT) AS nb
             FROM toks),
    b AS (SELECT doc_id, unnest(range(0, nb)) AS idx, t FROM base),
    b2 AS (
      SELECT doc_id, idx,
             array_to_string(
               t[idx*{_SPAN_W}+1:idx*{_SPAN_W}+{_SPAN_W}], ' ') AS s
      FROM b),
    k AS (
      SELECT doc_id, idx, s,
             ROW_NUMBER() OVER (PARTITION BY md5(s)
                                ORDER BY doc_id, idx) AS rn
      FROM b2),
    kept AS (
      SELECT doc_id, COUNT(*) AS nkept,
             string_agg(s, ' ' ORDER BY idx) AS kept
      FROM k WHERE rn = 1 GROUP BY doc_id)
    SELECT base.doc_id,
           CAST(nb AS BIGINT) AS n_blocks,
           CAST(nb - COALESCE(kept.nkept, 0) AS BIGINT) AS n_removed,
           trim(COALESCE(kept.kept, '') || ' ' ||
                -- array_to_string([]) is NULL in DuckDB, '' in Spark
                COALESCE(array_to_string(t[nb*{_SPAN_W}+1:len(t)], ' '), ''))
             AS cleaned
    FROM base LEFT JOIN kept ON kept.doc_id = base.doc_id
    """,
    tags=("dedup", "text", "extension"),
)
def x56(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.remove_duplicated_spans(_docs(spark, sf_dir), block_tokens=_SPAN_W)


# ---------------------------------------------------------------------------
# x57 — BM25 relevance ranking (the search/RAG retrieval scorer)
# ---------------------------------------------------------------------------
_BM25_TERMS = ("spark", "join", "stream")
_BM25_TF = ",\n             ".join(
    f"len(list_filter(tk, x -> x = '{t}')) AS tf{i}"
    for i, t in enumerate(_BM25_TERMS)
)
_BM25_DF = ",\n             ".join(
    f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
    for i in range(len(_BM25_TERMS))
)
# expression shapes mirror operators.text.bm25_rank exactly (same
# association order) so every IEEE op is bit-identical; k1=1.25, b=0.75
# are exact binary fractions (see the operator docstring)
_BM25_SCORE = "\n             + ".join(
    f"((n - df{i} + 0.5) / (df{i} + 0.5)) * (tf{i} * 2.25)"
    f" / (tf{i} + 1.25 * (1.0 - 0.75 + 0.75 * dl / (sum_dl / n)))"
    for i in range(len(_BM25_TERMS))
)


@_register(
    "x57_bm25_rank",
    "BM25 top-20 corpus ranking for a fixed query-term set with "
    "rational idf (no ln() — last-ulp portable) and exact-binary "
    "k1/b, so the ranking reproduces byte-for-byte across engines; "
    "per-term tf via narrow array filters (no explode), corpus stats "
    "in one broadcast 1-row aggregate, top-k as TakeOrdered heaps — "
    "never a full corpus sort",
    f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk
               FROM documents),
    d AS (SELECT doc_id, len(tk) AS dl,
             {_BM25_TF}
          FROM t),
    s AS (SELECT COUNT(*) AS n, SUM(dl) AS sum_dl,
             {_BM25_DF}
          FROM d),
    sc AS (SELECT doc_id,
             {_BM25_SCORE}
               AS score
           FROM d, s)
    SELECT doc_id, round(score, 6) AS bm25,
           CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
             AS rank
    FROM sc ORDER BY score DESC, doc_id LIMIT 20
    """,
    tags=("text", "similarity", "extension"),
)
def x57(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.bm25_rank(_docs(spark, sf_dir), list(_BM25_TERMS))


# ---------------------------------------------------------------------------
# x58 — HLL merge proof (the distributed-rollup property, driver-verified)
# ---------------------------------------------------------------------------
@_register(
    "x58_hll_merge",
    "HLL mergeability as a verified invariant: registers built over two "
    "DISJOINT halves of events (split on event_id parity) and merged by "
    "cell-wise max must estimate exactly what one pass over the whole "
    "table estimates — the property that lets per-partition / per-day "
    "sketches roll up at 100 TB without rescanning raw data; the oracle "
    "computes the single-pass estimate, so any merge bug goes red",
    f"""
    WITH h AS (
      SELECT event_type, {_HLL_HASH} AS hv FROM events
    ),
    r AS (
      SELECT event_type, hv % {K.HLL_M} AS bucket,
             (SELECT {_HLL_RHO} FROM (SELECT hv // {K.HLL_M} AS v)) AS rho
      FROM h
    ),
    regs AS (
      SELECT event_type, bucket, MAX(rho) AS rho FROM r GROUP BY 1, 2
    ),
    agg AS (
      SELECT event_type,
             SUM(power(2.0, -rho)) + ({K.HLL_M} - COUNT(*)) AS s,
             {K.HLL_M} - COUNT(*) AS v
      FROM regs GROUP BY event_type
    )
    SELECT event_type,
           round(CASE WHEN v > 0
                       AND {K.HLL_ALPHA} * {K.HLL_M * K.HLL_M} / s
                           <= {2.5 * K.HLL_M}
                      THEN {K.HLL_M} * ln({K.HLL_M} / v)
                      ELSE {K.HLL_ALPHA} * {K.HLL_M * K.HLL_M} / s END, 6)
             AS est_distinct
    FROM agg GROUP BY event_type, s, v
    """,
    tags=("sketch", "extension"),
)
def x58(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    even = K.hll_build(ev.filter(F.col("event_id") % 2 == 0), "event_type", "user_id")
    odd = K.hll_build(ev.filter(F.col("event_id") % 2 == 1), "event_type", "user_id")
    return K.hll_estimate(K.hll_merge(even, odd, "event_type"), "event_type")


# ---------------------------------------------------------------------------
# x59 — approximate-dedup evaluation (LSH candidates vs exact Jaccard)
# ---------------------------------------------------------------------------
@_register(
    "x59_lsh_eval",
    "dedup-pipeline evaluation: MinHash-LSH candidate pairs (x03) "
    "scored against the exact 3-gram Jaccard >= 0.2 truth set (x06) — "
    "pair counts, true positives, precision and recall in one row; the "
    "number a pipeline owner tunes bands/rows against before trusting "
    "approximate dedup at full scale (both sides banded/inverted-index "
    "joins — the evaluation itself never goes quadratic)",
    f"""
    WITH {_SIG_CTE},
    bands AS (
    {_BAND_BRANCHES}
    ),
    pred AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    ),
    shh0 AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) AS sh_h
      FROM sh
    ),
    shh AS (
      SELECT doc_id, sh_h FROM shh0
      QUALIFY COUNT(*) OVER (PARTITION BY sh_h) <= {D.JACCARD_DF_CAP}
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
      FROM shh a JOIN shh b ON a.sh_h = b.sh_h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT doc_a, doc_b
      FROM common
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE common / (sa.n_sh + sb.n_sh - common) >= 0.2
    ),
    m AS (
      SELECT (SELECT COUNT(*) FROM truth) AS n_true,
             (SELECT COUNT(*) FROM pred) AS n_pred,
             (SELECT COUNT(*) FROM pred p JOIN truth t
                ON p.doc_a = t.doc_a AND p.doc_b = t.doc_b) AS n_tp
    )
    SELECT CAST(n_true AS BIGINT) AS n_true,
           CAST(n_pred AS BIGINT) AS n_pred,
           CAST(n_tp AS BIGINT) AS n_tp,
           round(CASE WHEN n_pred > 0
                      THEN n_tp / CAST(n_pred AS DOUBLE) ELSE 0.0 END, 6)
             AS lsh_precision,
           round(CASE WHEN n_true > 0
                      THEN n_tp / CAST(n_true AS DOUBLE) ELSE 0.0 END, 6)
             AS lsh_recall
    FROM m
    """,
    tags=("dedup", "extension"),
)
def x59(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    # ONE shingle working set feeds both evaluation arms (r4 verdict:
    # the interpreter-bound HOF shingle pass was paid twice here):
    # the pred arm's signatures consume the persisted table DIRECTLY —
    # guaranteed sharing regardless of which sibling query populated
    # the signature memo first — and are themselves persisted because
    # the band self-join reads the signature table on BOTH sides
    # (unpersisted, the sig aggregate would run twice). Released by
    # session cache eviction, same contract as x36's pair persist.
    shingled = D.corpus_shingles(docs)
    pred = D.minhash_lsh_pairs(
        eager_persist(D.minhash_signatures(shingled))
    ).select("doc_a", "doc_b")
    truth = D.ngram_jaccard_pairs(
        docs, threshold=0.2, shingled=shingled
    ).select("doc_a", "doc_b")
    # ONE pass over each arm: full-outer join the two (unique-keyed)
    # pair sets and take all three counts from a single aggregate.
    # The previous three-aggregate crossJoin form executed the pred
    # subtree twice (n_pred + tp) and the truth subtree twice (n_true
    # + tp) — at 100 TB that is two redundant executions of the two
    # most expensive pair generators in the suite (guide §1.2: remove
    # whole passes before tuning inside them). Both sides are DISTINCT
    # on (doc_a, doc_b), so the outer join preserves exact row
    # multiplicity and sum(flag) ≡ the old COUNT(*) per branch.
    tagged = pred.withColumn("__p", F.lit(1)).join(
        truth.withColumn("__t", F.lit(1)), ["doc_a", "doc_b"], "full_outer"
    )
    counts = tagged.agg(
        F.coalesce(F.sum("__t"), F.lit(0)).alias("n_true"),
        F.coalesce(F.sum("__p"), F.lit(0)).alias("n_pred"),
        F.coalesce(F.sum(F.col("__p") * F.col("__t")), F.lit(0)).alias("n_tp"),
    )
    return counts.select(
        F.col("n_true").cast("bigint").alias("n_true"),
        F.col("n_pred").cast("bigint").alias("n_pred"),
        F.col("n_tp").cast("bigint").alias("n_tp"),
        F.round(
            F.when(
                F.col("n_pred") > 0,
                F.col("n_tp") / F.col("n_pred").cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("lsh_precision"),
        F.round(
            F.when(
                F.col("n_true") > 0,
                F.col("n_tp") / F.col("n_true").cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("lsh_recall"),
    )


# ---------------------------------------------------------------------------
# x60 — nearest duplicate per document (the dedup-review query)
# ---------------------------------------------------------------------------
@_register(
    "x60_nearest_duplicate",
    "each candidate document's single most-similar neighbor by MinHash "
    "estimate (ties to the lowest neighbor id): the review surface a "
    "dedup operator inspects before approving a purge — symmetric "
    "expansion of the x46 estimate table + one row_number window per "
    "doc; everything runs off the k-int64 signature table, text is "
    "never re-read",
    f"""
    WITH {_SIG_CTE},
    bands AS (
    {_BAND_BRANCHES}
    ),
    prs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    ),
    est AS (
      SELECT p.doc_a, p.doc_b,
             round(({_AGREE_SQL}) / {float(D.N_HASHES)}, 6) AS est_jaccard
      FROM prs p
      JOIN sigs sa ON p.doc_a = sa.doc_id
      JOIN sigs sb ON p.doc_b = sb.doc_id
    ),
    sym AS (
      SELECT doc_a AS doc_id, doc_b AS neighbor, est_jaccard FROM est
      UNION ALL
      SELECT doc_b AS doc_id, doc_a AS neighbor, est_jaccard FROM est
    )
    SELECT doc_id, neighbor, est_jaccard
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY est_jaccard DESC, neighbor)
                  AS rnk
      FROM sym
    ) WHERE rnk = 1
    """,
    tags=("dedup", "extension"),
)
def x60(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    sigs = D.corpus_signatures(docs)
    est = D.estimate_jaccard(sigs, D.minhash_lsh_pairs(sigs))
    sym = est.select(
        F.col("doc_a").alias("doc_id"),
        F.col("doc_b").alias("neighbor"),
        "est_jaccard",
    ).unionByName(
        est.select(
            F.col("doc_b").alias("doc_id"),
            F.col("doc_a").alias("neighbor"),
            "est_jaccard",
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("est_jaccard").desc(), F.col("neighbor")
    )
    return (
        sym.withColumn("__rnk", F.row_number().over(w))
        .filter(F.col("__rnk") == 1)
        .select("doc_id", "neighbor", "est_jaccard")
    )


# ---------------------------------------------------------------------------
# x61 — sketch accuracy audit: HLL estimate vs exact distinct
# ---------------------------------------------------------------------------
@_register(
    "x61_hll_accuracy",
    "sketch-accuracy audit: the deterministic HLL estimate (x26) joined "
    "against the exact distinct-user count per event_type with the "
    "relative error — the operator a pipeline runs on a sample before "
    "trusting the sketch at full scale (p=6 -> ~13% theoretical RSE; "
    "the audit shows the actual corpus error); exact side is one "
    "partial-agg distinct, estimate side never shuffles per key",
    f"""
    WITH h AS (
      SELECT event_type, {_HLL_HASH} AS hv FROM events
    ),
    r AS (
      SELECT event_type, hv % {K.HLL_M} AS bucket,
             (SELECT {_HLL_RHO} FROM (SELECT hv // {K.HLL_M} AS v)) AS rho
      FROM h
    ),
    regs AS (
      SELECT event_type, bucket, MAX(rho) AS rho FROM r GROUP BY 1, 2
    ),
    agg AS (
      SELECT event_type,
             SUM(power(2.0, -rho)) + ({K.HLL_M} - COUNT(*)) AS s,
             {K.HLL_M} - COUNT(*) AS v
      FROM regs GROUP BY event_type
    ),
    est AS (
      SELECT event_type,
             round(CASE WHEN v > 0
                         AND {K.HLL_ALPHA} * {K.HLL_M * K.HLL_M} / s
                             <= {2.5 * K.HLL_M}
                        THEN {K.HLL_M} * ln({K.HLL_M} / v)
                        ELSE {K.HLL_ALPHA} * {K.HLL_M * K.HLL_M} / s END, 6)
               AS est_distinct
      FROM agg GROUP BY event_type, s, v
    ),
    exact AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
      FROM events GROUP BY event_type
    )
    SELECT e.event_type, est_distinct,
           CAST(exact_distinct AS BIGINT) AS exact_distinct,
           round(abs(est_distinct - exact_distinct)
                 / CAST(exact_distinct AS DOUBLE), 6) AS rel_error
    FROM est e JOIN exact x ON e.event_type = x.event_type
    """,
    tags=("sketch", "extension"),
)
def x61(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    est = K.hll_estimate(K.hll_build(ev, "event_type", "user_id"), "event_type")
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_distinct")
    )
    return est.join(exact, "event_type").select(
        "event_type",
        "est_distinct",
        "exact_distinct",
        F.round(
            F.abs(F.col("est_distinct") - F.col("exact_distinct"))
            / F.col("exact_distinct").cast("double"),
            6,
        ).alias("rel_error"),
    )


# ---------------------------------------------------------------------------
# x62 — k-anonymity audit (the pre-release privacy gate)
# ---------------------------------------------------------------------------
_KA_K = 5
#: 100-char width bucket over n_chars — the generalization a release
#: pipeline would apply to a numeric quasi-identifier
_KA_BUCKET = "CAST(n_chars // 100 AS BIGINT)"


@_register(
    "x62_k_anonymity",
    "k-anonymity audit over the (lang, source, length-bucket) "
    "quasi-identifier: every equivalence class with its size and a "
    "below-k risk flag — the privacy gate a corpus release runs before "
    "publishing; one partial-agg shuffle, output bounded by distinct "
    "classes",
    f"""
    SELECT lang, source, {_KA_BUCKET} AS len_bucket,
           COUNT(*) AS class_size,
           CAST(COUNT(*) >= {_KA_K} AS BIGINT) AS k_anonymous
    FROM documents
    GROUP BY lang, source, {_KA_BUCKET}
    """,
    tags=("curation", "extension"),
)
def x62(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).withColumn(
        "len_bucket", F.floor(F.col("n_chars") / 100).cast("bigint")
    )
    return C.k_anonymity(docs, ["lang", "source", "len_bucket"], k=_KA_K)


# ---------------------------------------------------------------------------
# x63 — near-dup pair-graph degree profile (graph health before clustering)
# ---------------------------------------------------------------------------
@_register(
    "x63_pair_graph_degree",
    "degree distribution of the MinHash-LSH candidate graph: per-degree "
    "document counts — the health check before connected components "
    "(a heavy-tailed profile means hot shingles/band collisions and "
    "predicts component blow-up; informs the df-cap and band/row "
    "tuning); symmetric expand + two partial-agg shuffles, output "
    "bounded by the distinct degrees",
    f"""
    WITH {_SIG_CTE},
    bands AS (
    {_BAND_BRANCHES}
    ),
    prs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    ),
    deg AS (
      SELECT doc_id, COUNT(*) AS degree FROM (
        SELECT doc_a AS doc_id FROM prs
        UNION ALL
        SELECT doc_b AS doc_id FROM prs
      ) GROUP BY doc_id
    )
    SELECT CAST(degree AS BIGINT) AS degree,
           COUNT(*) AS n_docs
    FROM deg GROUP BY degree
    """,
    tags=("dedup", "extension"),
)
def x63(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    pairs = D.minhash_lsh_pairs(D.corpus_signatures(docs))
    sym = pairs.select(F.col("doc_a").alias("doc_id")).unionByName(
        pairs.select(F.col("doc_b").alias("doc_id"))
    )
    deg = sym.groupBy("doc_id").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_docs")).select(
        F.col("degree").cast("bigint").alias("degree"), "n_docs"
    )


# ---------------------------------------------------------------------------
# x64 — sessionized event-sequence assembly (behavioral training data)
# ---------------------------------------------------------------------------
@_register(
    "x64_session_sequences",
    "per-user 30-min-gap sessions assembled into ordered event-type "
    "sequences — the sequence-construction step for behavior-model "
    "training data (q28 counts sessions; this EMITS them as training "
    "rows); order inside a session is (ts, event_id) — total, so the "
    "assembled string is deterministic; one session_window aggregate, "
    "state bounded by session length",
    """
    WITH marked AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           COUNT(*) AS n_events,
           string_agg(event_type, ',' ORDER BY ts, event_id) AS seq
    FROM numbered GROUP BY user_id, sess_id
    """,
    tags=("window", "curation", "extension"),
)
def x64(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("win"), F.col("user_id")
        )
        .agg(
            F.min("ts").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda s: s.getField("event_type"),
                ),
                ",",
            ).alias("seq"),
        )
        .select("user_id", "session_start", "n_events", "seq")
    )


# ---------------------------------------------------------------------------
# x65 — split-leakage audit (eval hygiene: does test leak from train?)
# ---------------------------------------------------------------------------
@_register(
    "x65_split_leakage",
    "eval-hygiene audit of the train/test split: count of test docs "
    "with an EXACT duplicate in train (md5) and with a NEAR-dup LSH "
    "candidate in train — the contamination check a pipeline must pass "
    "before any benchmark number is believed (the hash split x22 is "
    "leak-proof by id, but duplicated CONTENT still crosses it; this "
    "measures exactly that); fingerprint semi-join + the banded "
    "candidate graph, nothing quadratic",
    f"""
    WITH {_SIG_CTE},
    bands AS (
    {_BAND_BRANCHES}
    ),
    prs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    ),
    sp AS (
      SELECT doc_id, md5(text) AS fp,
             CASE WHEN bk < 90 THEN 'train'
                  WHEN bk < 95 THEN 'val' ELSE 'test' END AS split
      FROM (SELECT doc_id, text,
                   {_BUCKET_SQL_T.format(salt='split', col='doc_id')} AS bk
            FROM documents)
    ),
    te AS (SELECT doc_id, fp FROM sp WHERE split = 'test'),
    near AS (
      SELECT COUNT(DISTINCT td) AS n FROM (
        SELECT CASE WHEN sa.split = 'test' AND sb.split = 'train'
                    THEN p.doc_a
                    WHEN sb.split = 'test' AND sa.split = 'train'
                    THEN p.doc_b END AS td
        FROM prs p
        JOIN sp sa ON sa.doc_id = p.doc_a
        JOIN sp sb ON sb.doc_id = p.doc_b
      ) WHERE td IS NOT NULL
    )
    SELECT (SELECT COUNT(*) FROM te) AS n_test,
           (SELECT COUNT(*) FROM te
            WHERE fp IN (SELECT fp FROM sp WHERE split = 'train'))
             AS exact_leaked,
           CAST((SELECT n FROM near) AS BIGINT) AS neardup_leaked
    """,
    tags=("curation", "dedup", "extension"),
)
def x65(spark: SparkSession, sf_dir: str) -> DataFrame:
    from twitter_kafka_etl_spark.operators import curation as C

    docs = _docs(spark, sf_dir)
    spl = eager_persist(
        C.split_assign(docs, "doc_id").select(
            "doc_id", F.md5("text").alias("fp"), "split"
        )
    )
    te = spl.filter(F.col("split") == "test")
    tr_fp = spl.filter(F.col("split") == "train").select("fp").distinct()
    pairs = D.minhash_lsh_pairs(D.corpus_signatures(docs))
    lab = pairs.join(
        spl.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sp_a")),
        "doc_a",
    ).join(
        spl.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sp_b")),
        "doc_b",
    )
    td = (
        lab.select(
            F.when(
                (F.col("sp_a") == "test") & (F.col("sp_b") == "train"),
                F.col("doc_a"),
            )
            .when(
                (F.col("sp_b") == "test") & (F.col("sp_a") == "train"),
                F.col("doc_b"),
            )
            .alias("td")
        )
        .filter(F.col("td").isNotNull())
        .distinct()
    )
    return (
        te.agg(F.count(F.lit(1)).alias("n_test"))
        .crossJoin(
            te.join(tr_fp, "fp", "left_semi").agg(
                F.count(F.lit(1)).alias("exact_leaked")
            )
        )
        .crossJoin(td.agg(F.count(F.lit(1)).alias("neardup_leaked")))
    )


# ---------------------------------------------------------------------------
# x66/x67 — semantic dedup + prototypicality pruning (cluster-then-score)
# ---------------------------------------------------------------------------
#: IVF coarse-assignment CTEs shared by the cluster-then-score family —
#: the same deterministic quantizer the x16 oracle embeds (stride
#: max(61, isqrt(n)); nearest centroid by exact cosine, ties to the
#: lowest cent_id). Zero-norm rows are filtered at the source exactly
#: as the engine's ivf_assign does (r9 advisor finding): they can be
#: neither members (no angle to any centroid) nor centroids (a
#: zero-norm vector at a stride id would reroute every assignment),
#: and the stride COUNT(*) is therefore the filtered count on both
#: engines.
_IVF_ASSIGN_CTE = f"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
           WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0),
    cents AS (SELECT vec_id AS cent_id, v AS cvec FROM e
              WHERE vec_id % (SELECT GREATEST({{mod}},
                       CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT)) FROM e) = 0),
    assign AS (
      SELECT vec_id, v, cent_id FROM (
        SELECT e.vec_id, e.v, c.cent_id,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_dot_product(e.v, c.cvec) /
                          (sqrt(list_dot_product(e.v, e.v)) *
                           sqrt(list_dot_product(c.cvec, c.cvec))) DESC,
                   c.cent_id) AS rn
        FROM e CROSS JOIN cents c)
      WHERE rn = 1
    )"""


@_register(
    "x66_semantic_dedup",
    "SemDeDup (Abbas et al. 2023): coarse-cluster embeddings with the "
    "IVF quantizer, prune cosine near-duplicates within each cluster — "
    "the cluster bound is what keeps semantic dedup sub-quadratic at "
    "corpus scale; emits each dropped doc with its keeper "
    "(greedy keep-lowest-id, deterministic, no iteration)",
    f"""
    WITH {_IVF_ASSIGN_CTE.format(mod=S.CENTROID_MOD)},
    pairs AS (
      -- zero-norm vectors have no cosine: excluded explicitly on both
      -- engines (Spark filters __nrm > 0) so the semantics are defined
      -- rather than NaN-comparison-dependent
      SELECT b.vec_id AS vid, b.cent_id AS cluster_id, a.vec_id AS id_a,
             {_COS_SQL.format(v='a.v', q='b.v')} AS cos
      FROM assign a JOIN assign b
        ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
      WHERE list_dot_product(a.v, a.v) > 0
        AND list_dot_product(b.v, b.v) > 0
        AND {_COS_SQL.format(v='a.v', q='b.v')} >= 0.35
    )
    SELECT vid AS vec_id, cluster_id, MIN(id_a) AS dup_of,
           arg_min(cos, id_a) AS cos_sim
    FROM pairs GROUP BY vid, cluster_id
    """,
    tags=("dedup", "similarity", "extension"),
)
def x66(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.semantic_dedup(_emb(spark, sf_dir), threshold=0.35)


@_register(
    "x67_prototype_prune",
    "prototypicality pruning (Sorscher et al. 2022, 'Beyond neural "
    "scaling laws'): score every embedding by cosine to its cluster's "
    "decimal-exact mean, keep the top 80% of each cluster — the "
    "self-supervised data-pruning metric, cluster means broadcast-sized "
    "at any corpus scale",
    f"""
    WITH {_IVF_ASSIGN_CTE.format(mod=S.CENTROID_MOD)},
    -- zero-norm guard, same rule as the engine: members with no cosine
    -- are excluded from the mean AND the ranking, and a cell whose
    -- mean degenerates to the zero vector drops entirely
    nz AS (SELECT * FROM assign WHERE list_dot_product(v, v) > 0),
    comp AS (
      SELECT cent_id,
             unnest(list_transform(range(1, len(v) + 1),
                    i -> {{'p': i, 'v': v[i]}})) AS s
      FROM nz
    ),
    m AS (
      SELECT cent_id, s.p - 1 AS pos,
             round(CAST(SUM(CAST(s.v AS DECIMAL(38,12))) AS DOUBLE)
                   / COUNT(*), 6) AS m
      FROM comp GROUP BY 1, 2
    ),
    cv AS (SELECT cent_id, list(m ORDER BY pos) AS cvec FROM m GROUP BY 1
           HAVING list_dot_product(list(m ORDER BY pos),
                                   list(m ORDER BY pos)) > 0),
    scored AS (
      SELECT a.vec_id, a.cent_id AS cluster_id,
             {_COS_SQL.format(v='a.v', q='cv.cvec')} AS proto_cos
      FROM nz a JOIN cv ON a.cent_id = cv.cent_id
    ),
    ranked AS (
      SELECT vec_id, cluster_id, proto_cos,
             ROW_NUMBER() OVER (PARTITION BY cluster_id
                                ORDER BY proto_cos DESC, vec_id) AS rn,
             COUNT(*) OVER (PARTITION BY cluster_id) AS n
      FROM scored
    )
    SELECT vec_id, cluster_id, proto_cos,
           CAST(rn <= CEIL(n * 0.8) AS INT) AS keep
    FROM ranked
    """,
    tags=("curation", "similarity", "extension"),
)
def x67(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.prototype_scores(_emb(spark, sf_dir), keep_frac=0.8)


# ---------------------------------------------------------------------------
# x68/x69 — DSIR importance selection + lang-ID classifier audit
# ---------------------------------------------------------------------------
@_register(
    "x68_dsir_selection",
    "DSIR data selection (Xie et al. 2023): hashed-unigram "
    "log-likelihood ratio of the src0 target domain vs the raw corpus, "
    "per-bucket ratios quantized to scaled BIGINT so the per-doc sum "
    "is exact-integer in any order; top-100 docs by importance weight "
    "via a distributed TakeOrdered heap",
    """
    WITH tb AS (
      SELECT doc_id, source,
             ((CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 2147483647)
              % 1024) AS b
      FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
            FROM documents)
    ),
    cc AS (SELECT b, COUNT(*) AS cc FROM tb GROUP BY b),
    tc AS (SELECT b, COUNT(*) AS tc FROM tb WHERE source = 'src0' GROUP BY b),
    tot AS (SELECT (SELECT COUNT(*) FROM tb) AS ctot,
                   (SELECT COUNT(*) FROM tb WHERE source = 'src0') AS ttot),
    lr AS (
      SELECT cc.b,
             CAST(round(ln(CAST((COALESCE(tc, 0) + 1) * (ctot + 1024)
                                AS DOUBLE)
                           / ((cc + 1) * (ttot + 1024))) * 1e6, 0)
                  AS BIGINT) AS lr
      FROM cc LEFT JOIN tc ON cc.b = tc.b, tot
    ),
    db AS (SELECT doc_id, b, COUNT(*) AS cnt FROM tb GROUP BY 1, 2),
    w AS (SELECT doc_id, CAST(SUM(cnt * lr) AS BIGINT) AS wi
          FROM db JOIN lr USING (b) GROUP BY 1)
    SELECT w.doc_id, d.source,
           round(CAST(wi AS DOUBLE) / 1e6, 6) AS dsir_logweight
    FROM w JOIN documents d ON w.doc_id = d.doc_id
    ORDER BY dsir_logweight DESC, w.doc_id LIMIT 100
    """,
    tags=("curation", "extension"),
)
def x68(spark: SparkSession, sf_dir: str) -> DataFrame:
    # n_buckets / top_k pinned EXPLICITLY to the literals hardcoded in
    # the oracle SQL above (% 1024, +1024 smoothing, LIMIT 100) — a
    # default change in dsir_weights must not silently diverge from it
    return C.dsir_weights(
        _docs(spark, sf_dir), target_source="src0", n_buckets=1024, top_k=100
    )


@_register(
    "x69_langid_eval",
    "lang-ID classifier audit: confusion matrix of the marker-word "
    "heuristic's prediction vs the recorded lang column, with "
    "per-truth-class recall share — every approximate component ships "
    "with its accuracy query (the x59/x61 discipline applied to "
    "classification)",
    f"""
    WITH t AS (SELECT doc_id, lang,
                      list_distinct(string_split(text, ' ')) AS td
               FROM documents),
    s AS (SELECT doc_id, lang,
          len(list_intersect(td, {_MARKER_LIST['de']})) AS s_de,
          len(list_intersect(td, {_MARKER_LIST['en']})) AS s_en,
          len(list_intersect(td, {_MARKER_LIST['es']})) AS s_es,
          len(list_intersect(td, {_MARKER_LIST['fr']})) AS s_fr
          FROM t),
    p AS (SELECT lang AS true_lang,
      CASE WHEN greatest(s_de, s_en, s_es, s_fr) < 2 THEN 'und'
           WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
           WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
           WHEN s_es >= s_fr THEN 'es'
           ELSE 'fr' END AS pred_lang
      FROM s),
    cm AS (SELECT true_lang, pred_lang, COUNT(*) AS n_docs
           FROM p GROUP BY 1, 2)
    SELECT true_lang, pred_lang, n_docs,
           round(n_docs / CAST(SUM(n_docs) OVER (PARTITION BY true_lang)
                               AS DOUBLE), 6) AS recall_share
    FROM cm
    """,
    tags=("text", "extension"),
)
def x69(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.langid_eval(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# x70/x71 — LM-perplexity quality filter + BPE merge statistics
# ---------------------------------------------------------------------------
@_register(
    "x70_unigram_nll",
    "CCNet-style LM quality scoring (Wenzek et al. 2020): average "
    "negative log-probability of each doc under the corpus unigram "
    "model — vocab log-probs quantized once to scaled BIGINT so the "
    "per-doc sum is exact-integer in any partition order; high "
    "avg_neg_logp = improbable text = drop candidate",
    """
    WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
               FROM documents),
    c AS (SELECT tok, COUNT(*) AS c FROM t GROUP BY tok),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM c),
    lp AS (SELECT tok,
                  CAST(round(ln(CAST(c AS DOUBLE) / n) * 1e6, 0) AS BIGINT)
                    AS lp
           FROM c, tot),
    d AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM t GROUP BY 1, 2),
    w AS (SELECT doc_id,
                 CAST(SUM(cnt) AS BIGINT) AS n_tokens,
                 CAST(SUM(cnt * lp) AS BIGINT) AS s
          FROM d JOIN lp USING (tok) GROUP BY 1)
    SELECT doc_id, n_tokens,
           round(-CAST(s AS DOUBLE) / 1e6 / n_tokens, 6) AS avg_neg_logp
    FROM w
    """,
    tags=("text", "extension"),
)
def x70(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.unigram_nll(_docs(spark, sf_dir))


@_register(
    "x71_bpe_pair_stats",
    "distributed BPE merge statistics (Sennrich et al. 2016): top-20 "
    "adjacent character pairs within words across the corpus — the "
    "per-round statistic of tokenizer training, computed as one "
    "vocabulary-bounded partial agg + a TakeOrdered heap",
    """
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS tok
                 FROM documents),
    p AS (
      SELECT substr(tok, CAST(i AS INT), 2) AS pair
      FROM (SELECT tok, unnest(range(1, len(tok))) AS i
            FROM tok WHERE len(tok) >= 2)
    )
    SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM p GROUP BY pair
    ORDER BY cnt DESC, pair LIMIT 20
    """,
    tags=("text", "extension"),
)
def x71(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.bpe_pair_stats(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# x72/x73/x74/x75 — LSH planning & audit + edit-distance verify + charset
# profile (round-5 additions)
# ---------------------------------------------------------------------------
@_register(
    "x72_lsh_sensitivity_curve",
    "analytic banded-LSH S-curve for the configured (b,r): "
    "P(candidate | jaccard=s) = 1-(1-s^r)^b over a 20-point grid — the "
    "parameter-planning query run before any LSH deployment, published "
    "next to x59's empirical precision/recall; powers expanded to "
    "multiplication chains so both engines do identical IEEE ops",
    f"""
    SELECT s, round(1.0 - q4 * q4 * q4 * q4, 6) AS p_candidate
    FROM (
      SELECT s, 1.0 - (s * s * s * s) AS q4
      FROM (SELECT CAST(i AS DOUBLE) / 20.0 AS s
            FROM range(1, 21) r(i))
    )
    """,
    tags=("dedup", "extension"),
)
def x72(spark: SparkSession, sf_dir: str) -> DataFrame:
    # b = r = 4 in this engine (dedup.N_BANDS/ROWS_PER_BAND); the oracle
    # above hardcodes the same multiplication chains
    assert D.N_BANDS == 4 and D.ROWS_PER_BAND == 4
    return D.lsh_sensitivity_curve(spark)


@_register(
    "x73_edit_distance_verify",
    "Levenshtein confirmation of the LSH candidate pairs over bounded "
    "200-char prefixes (the budgeted RETSim-style verify for docs too "
    "short for shingle Jaccard); |pairs| is LSH-bounded and only ids + "
    "two scalars leave the projection",
    f"""
    WITH {_SIG_CTE},
    bands AS (
    {_BAND_BRANCHES}
    ),
    prs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    ),
    t AS (SELECT doc_id, substr(text, 1, 200) AS tt FROM documents)
    SELECT p.doc_a, p.doc_b,
           CAST(levenshtein(ta.tt, tb.tt) AS BIGINT) AS edit_distance,
           round(CASE WHEN GREATEST(len(ta.tt), len(tb.tt)) > 0
                      THEN 1.0 - levenshtein(ta.tt, tb.tt)
                           / CAST(GREATEST(len(ta.tt), len(tb.tt)) AS DOUBLE)
                      ELSE 1.0 END, 6) AS edit_sim
    FROM prs p
    JOIN t ta ON p.doc_a = ta.doc_id
    JOIN t tb ON p.doc_b = tb.doc_id
    """,
    tags=("dedup", "extension"),
)
def x73(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    pairs = D.minhash_lsh_pairs(D.corpus_signatures(docs))
    return D.edit_distance_verify(docs, pairs)


@_register(
    "x74_charset_profile",
    "per-source character-class profile (letter/digit/space/other "
    "ratios): the script-and-noise screen run before tokenization — "
    "per-doc ratios quantized once to scaled BIGINT so the per-source "
    "averages are exact-integer sums in any partition order",
    """
    WITH d AS (
      SELECT source,
             LENGTH(text) AS n,
             LENGTH(text) - LENGTH(regexp_replace(text, '[A-Za-z]', '', 'g'))
               AS l,
             LENGTH(text) - LENGTH(regexp_replace(text, '[0-9]', '', 'g'))
               AS dg,
             LENGTH(text) - LENGTH(regexp_replace(text, '[ ]', '', 'g'))
               AS sp
      FROM documents
    ),
    q AS (
      SELECT source,
        CAST(round(CASE WHEN n > 0 THEN l / CAST(n AS DOUBLE) ELSE 0.0 END
                   * 1e6, 0) AS BIGINT) AS ql,
        CAST(round(CASE WHEN n > 0 THEN dg / CAST(n AS DOUBLE) ELSE 0.0 END
                   * 1e6, 0) AS BIGINT) AS qd,
        CAST(round(CASE WHEN n > 0 THEN sp / CAST(n AS DOUBLE) ELSE 0.0 END
                   * 1e6, 0) AS BIGINT) AS qs,
        CAST(round(CASE WHEN n > 0
                        THEN (n - l - dg - sp) / CAST(n AS DOUBLE)
                        ELSE 0.0 END * 1e6, 0) AS BIGINT) AS qo
      FROM d
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           round(SUM(ql) / (COUNT(*) * 1e6), 6) AS avg_letters,
           round(SUM(qd) / (COUNT(*) * 1e6), 6) AS avg_digits,
           round(SUM(qs) / (COUNT(*) * 1e6), 6) AS avg_space,
           round(SUM(qo) / (COUNT(*) * 1e6), 6) AS avg_other
    FROM q GROUP BY source
    """,
    tags=("text", "extension"),
)
def x74(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.charset_profile(_docs(spark, sf_dir))


@_register(
    "x75_lsh_bucket_histogram",
    "bucket-size histogram of the banded LSH join — the skew audit run "
    "BEFORE the pair self-join at scale (a size-c bucket emits c(c-1)/2 "
    "candidates, so the tail IS the skew that decides AQE splitting or "
    "a hot-bucket cap); integer-exact in any engine",
    f"""
    WITH {_SIG_CTE},
    bands AS (
    {_BAND_BRANCHES}
    ),
    b AS (
      SELECT band, sig, COUNT(*) AS c
      FROM bands GROUP BY band, sig
    )
    SELECT c AS bucket_size,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(COUNT(*) * (c * (c - 1) / 2) AS BIGINT) AS pair_candidates
    FROM b GROUP BY c
    """,
    tags=("dedup", "extension"),
)
def x75(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.lsh_bucket_histogram(D.corpus_signatures(_docs(spark, sf_dir)))


# ---------------------------------------------------------------------------
# x76/x77/x78/x79 — weighted sampling, containment dedup, corpus overlap,
# distribution drift (round-5 additions)
# ---------------------------------------------------------------------------
@_register(
    "x76_weighted_sample",
    "deterministic weighted sampling without replacement, 5 per source "
    "(Efraimidis-Spirakis A-ES: top-k by u^(1/w), ranked as ln(u)/w with "
    "md5-derived u) — a retry, a repartition, or another engine selects "
    "the SAME sample, which rand()-keyed reservoirs cannot promise",
    """
    WITH k AS (
      SELECT source, doc_id, n_chars,
             ln((CAST('0x' || substr(md5('wsample' || CAST(doc_id AS VARCHAR)),
                      1, 8) AS BIGINT) + 1) / 4294967296.0)
               / CAST(n_chars AS DOUBLE) AS key
      FROM documents WHERE n_chars > 0
    )
    SELECT source, doc_id, CAST(n_chars AS BIGINT) AS weight
    FROM k
    QUALIFY row_number() OVER (
      PARTITION BY source ORDER BY key DESC, doc_id) <= 5
    """,
    tags=("curation", "extension"),
)
def x76(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.weighted_sample(_docs(spark, sf_dir), "n_chars", k=5)


@_register(
    "x77_containment_pairs",
    "asymmetric near-dup pairs by shingle-set containment "
    "max(|A∩B|/|A|, |A∩B|/|B|) >= 0.6 — the quote/boilerplate-inclusion "
    "screen symmetric Jaccard misses (a small doc embedded in a big one "
    "has containment 1.0 but Jaccard ~0); same inverted-index join and "
    "df cap as x06, different projection",
    f"""
    WITH {_SHINGLE_CTE},
    shh0 AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) AS sh_h
      FROM sh
    ),
    shh AS (
      SELECT doc_id, sh_h FROM shh0
      QUALIFY COUNT(*) OVER (PARTITION BY sh_h) <= {D.JACCARD_DF_CAP}
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
      FROM shh a JOIN shh b ON a.sh_h = b.sh_h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, CAST(common AS BIGINT) AS common,
           greatest(common / sa.n_sh, common / sb.n_sh) AS containment,
           common / (sa.n_sh + sb.n_sh - common) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE greatest(common / sa.n_sh, common / sb.n_sh) >= 0.6
    """,
    tags=("dedup", "extension"),
)
def x77(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    # peek, don't build: a sibling's shingle memo is reused (one
    # semi-join), but forcing the full-corpus materialization would
    # cost more than the collapse path's rep-subset build saves
    return D.containment_pairs(
        docs, threshold=0.6, shingled=D.corpus_shingles_cached(docs)
    )


@_register(
    "x78_source_overlap",
    "corpus-level overlap matrix: pairwise Jaccard of each source's "
    "DISTINCT shingle set — the crawl-snapshot / supplier-feed audit run "
    "before mixing corpora; join fan-out per shingle is bounded by "
    "|sources|^2 so no df cap is needed and output is |sources|^2 rows "
    "at any corpus size",
    f"""
    WITH {_SHINGLE_CTE},
    ss AS (
      SELECT DISTINCT d.source,
             CAST('0x' || substr(md5(sh.shingle), 1, 15) AS BIGINT) AS sh_h
      FROM sh JOIN documents d USING (doc_id)
    ),
    sizes AS (SELECT source, COUNT(*) AS n_sh FROM ss GROUP BY source),
    common AS (
      SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS common
      FROM ss a JOIN ss b ON a.sh_h = b.sh_h AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT source_a, source_b, CAST(common AS BIGINT) AS common,
           common / (sa.n_sh + sb.n_sh - common) AS jaccard
    FROM common
    JOIN sizes sa ON sa.source = source_a
    JOIN sizes sb ON sb.source = source_b
    """,
    tags=("dedup", "extension"),
)
def x78(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return D.source_overlap(docs, shingled=D.corpus_shingles(docs))


#: DuckDB twin of the PSI computation — shared verbatim with the qs13
#: streaming drift monitor, whose accumulated stream counts must equal
#: this batch form exactly (stream/batch equivalence)
PSI_DRIFT_SQL = """
    WITH c AS (
      SELECT CASE WHEN CAST(substr(source, 4) AS INT) < 10
                  THEN 'base' ELSE 'cand' END AS coh,
             LEAST(n_chars // 256, 15) AS b
      FROM documents
    ),
    counts AS (
      SELECT b,
             SUM(CASE WHEN coh = 'base' THEN 1 ELSE 0 END) AS n_base,
             SUM(CASE WHEN coh = 'cand' THEN 1 ELSE 0 END) AS n_cand
      FROM c GROUP BY b
    ),
    spine AS (SELECT i AS bucket FROM range(0, 16) r(i)),
    j AS (
      SELECT bucket, COALESCE(n_base, 0) AS n_base,
             COALESCE(n_cand, 0) AS n_cand
      FROM spine LEFT JOIN counts ON counts.b = spine.bucket
    ),
    tot AS (SELECT SUM(n_base) AS t_base, SUM(n_cand) AS t_cand FROM j)
    SELECT bucket, CAST(n_base AS BIGINT) AS n_base,
           CAST(n_cand AS BIGINT) AS n_cand,
           round(((n_base + 0.5) / (t_base + 8.0)
                  - (n_cand + 0.5) / (t_cand + 8.0))
                 * ln(((n_base + 0.5) / (t_base + 8.0))
                      / ((n_cand + 0.5) / (t_cand + 8.0))), 6) AS psi_term
    FROM j CROSS JOIN tot
    """


@_register(
    "x79_psi_drift",
    "Population Stability Index terms between the src0-9 and src10-19 "
    "cohorts over fixed-width n_chars buckets (+1/2 smoothing on the "
    "full 16-bucket spine) — the distribution-drift audit between crawl "
    "snapshots: snapshot_diff says WHICH docs changed, PSI says whether "
    "the corpus SHAPE moved",
    PSI_DRIFT_SQL,
    tags=("curation", "extension"),
)
def x79(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    cohort = F.when(
        F.expr("CAST(substring(source, 4) AS INT)") < 10, "base"
    ).otherwise("cand")
    return C.psi_drift(docs, cohort)


# ---------------------------------------------------------------------------
# x80/x81 — column-level table profile + marginal shingle novelty
# (round-5 additions, second batch)
# ---------------------------------------------------------------------------
#: lineitem column inventory shared by the x80 Spark call and its
#: generated oracle — one source of truth for both engines
_PROFILE_COLS = (
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
    "l_linestatus", "l_shipdate",
)

_PROFILE_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct
    FROM lineitem"""
    for c in _PROFILE_COLS
)


@_register(
    "x80_table_profile",
    "column-level data profile of lineitem — (column, n_rows, n_nulls, "
    "n_distinct) for every column as one job of per-column pruned-scan "
    "single-distinct agg branches (the multi-distinct Expand form "
    "replicated every row |columns|x — 2.7-3x slower measured; "
    "approx_count_distinct is the documented estimate alternative at "
    "scale): the schema-quality audit run on any newly landed table "
    "before it joins a pipeline",
    _PROFILE_SQL,
    tags=("relational", "extension"),
)
def x80(spark: SparkSession, sf_dir: str) -> DataFrame:
    from twitter_kafka_etl_spark.operators.relational import profile_table

    return profile_table(
        read_table(spark, sf_dir, "lineitem"), columns=_PROFILE_COLS
    )


@_register(
    "x81_shingle_novelty",
    "per-document marginal novelty in doc_id (~crawl) order: the share "
    "of each doc's shingles appearing in NO earlier document — the "
    "diminishing-returns curve that is the data-acquisition stopping "
    "rule (novelty -> 0 means new data is re-crawl, not new content); "
    "min-id per shingle hash + one join back, no pair join anywhere",
    f"""
    WITH {_SHINGLE_CTE},
    shh AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) AS sh_h
      FROM sh
    ),
    first AS (SELECT sh_h, MIN(doc_id) AS first_id FROM shh GROUP BY sh_h),
    per AS (
      SELECT s.doc_id, COUNT(*) AS n_sh,
             SUM(CASE WHEN f.first_id = s.doc_id THEN 1 ELSE 0 END) AS n_novel
      FROM shh s JOIN first f USING (sh_h) GROUP BY s.doc_id
    )
    SELECT d.doc_id, CAST(COALESCE(n_sh, 0) AS BIGINT) AS n_sh,
           CAST(COALESCE(n_novel, 0) AS BIGINT) AS n_novel,
           CASE WHEN COALESCE(n_sh, 0) > 0
                THEN n_novel / n_sh ELSE 0.0 END AS novelty
    FROM documents d LEFT JOIN per USING (doc_id)
    """,
    tags=("dedup", "extension"),
)
def x81(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return D.shingle_novelty(docs, shingled=D.corpus_shingles(docs))


@_register(
    "x82_robust_outliers",
    "per-source robust length-outlier flags by discrete median/MAD "
    "(50% breakdown point — giant docs cannot drag the threshold the "
    "way they drag mean/stddev z-scores); both quantiles via the exact "
    "ceil-rule histogram walk, all arithmetic integer end to end",
    """
    WITH h AS (
      SELECT source, n_chars AS v, COUNT(*) AS c FROM documents GROUP BY 1, 2
    ),
    c1 AS (
      SELECT source, v,
             SUM(c) OVER (PARTITION BY source ORDER BY v) AS cum
      FROM h
    ),
    sz AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
    med AS (
      SELECT c1.source,
             MIN(CASE WHEN cum >= (50 * n + 99) // 100 THEN v END) AS med
      FROM c1 JOIN sz ON sz.source = c1.source GROUP BY c1.source
    ),
    dev AS (
      SELECT d.doc_id, d.source, d.n_chars, m.med,
             ABS(d.n_chars - m.med) AS ad
      FROM documents d JOIN med m ON m.source = d.source
    ),
    h2 AS (SELECT source, ad AS v, COUNT(*) AS c FROM dev GROUP BY 1, 2),
    c2 AS (
      SELECT source, v,
             SUM(c) OVER (PARTITION BY source ORDER BY v) AS cum
      FROM h2
    ),
    mad AS (
      SELECT c2.source,
             MIN(CASE WHEN cum >= (50 * n + 99) // 100 THEN v END) AS mad
      FROM c2 JOIN sz ON sz.source = c2.source GROUP BY c2.source
    )
    SELECT dev.doc_id, dev.source, dev.n_chars,
           CAST(dev.med AS BIGINT) AS med, CAST(ma.mad AS BIGINT) AS mad,
           dev.ad > 3 * ma.mad AS is_outlier
    FROM dev JOIN mad ma ON ma.source = dev.source
    """,
    tags=("curation", "extension"),
)
def x82(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.robust_outliers(_docs(spark, sf_dir)).select(
        "doc_id", "source", "n_chars", "med", "mad", "is_outlier"
    )


@_register(
    "x83_bigram_nll",
    "conditional bigram LM scoring: average -ln P(w2|w1) per doc with "
    "P = c(w1 w2)/c(w1 .) over the corpus — one order above x70, so "
    "word-salad with impossible transitions scores high even when its "
    "unigram profile looks fluent; ln() once per distinct bigram, "
    "quantized to scaled BIGINT for order-free exact per-doc sums",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    b AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t)),
                                   i -> t[i] || ' ' || t[i+1])) AS bg
      FROM toks
    ),
    c2 AS (
      SELECT bg, split_part(bg, ' ', 1) AS w1, COUNT(*) AS c2
      FROM b GROUP BY bg
    ),
    c1 AS (SELECT w1, SUM(c2) AS c1 FROM c2 GROUP BY w1),
    lp AS (
      SELECT bg,
             CAST(round(ln(CAST(c2 AS DOUBLE) / c1) * 1e6, 0) AS BIGINT)
               AS lp
      FROM c2 JOIN c1 USING (w1)
    ),
    d AS (SELECT doc_id, bg, COUNT(*) AS cnt FROM b GROUP BY 1, 2),
    w AS (
      SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
             CAST(SUM(cnt * lp) AS BIGINT) AS s
      FROM d JOIN lp USING (bg) GROUP BY 1
    )
    SELECT doc_id, n_bigrams,
           round(-CAST(s AS DOUBLE) / 1e6 / n_bigrams, 6) AS avg_neg_logp
    FROM w
    """,
    tags=("text", "extension"),
)
def x83(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.bigram_nll(_docs(spark, sf_dir))


@_register(
    "x84_dedup_threshold_curve",
    "operating curve for the near-dup threshold decision: pairs fired "
    "and docs removed (keep-min-id estimate) at every threshold 0.1-0.9 "
    "from ONE pair materialization — per-pair bucket floor(10j) and "
    "per-doc max-bucket make the distinct-doc counts additive, so "
    "everything after the pair join is a <=10-row histogram against a "
    "9-row spine",
    f"""
    WITH {_SHINGLE_CTE},
    shh0 AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) AS sh_h
      FROM sh
    ),
    shh AS (
      SELECT doc_id, sh_h FROM shh0
      QUALIFY COUNT(*) OVER (PARTITION BY sh_h) <= {D.JACCARD_DF_CAP}
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
      FROM shh a JOIN shh b ON a.sh_h = b.sh_h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pr AS (
      SELECT doc_a, doc_b,
             common / (sa.n_sh + sb.n_sh - common) AS j
      FROM common
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE common / (sa.n_sh + sb.n_sh - common) >= 0.1
    ),
    pb AS (
      SELECT doc_a, doc_b,
             LEAST(CAST(floor(j * 10) AS INT), 9) AS b
      FROM pr
    ),
    ph AS (SELECT b, COUNT(*) AS np FROM pb GROUP BY b),
    dh AS (
      SELECT b, COUNT(*) AS nd
      FROM (SELECT doc_b, MAX(b) AS b FROM pb GROUP BY doc_b)
      GROUP BY b
    ),
    h AS (
      SELECT COALESCE(ph.b, dh.b) AS b, COALESCE(np, 0) AS np,
             COALESCE(nd, 0) AS nd
      FROM ph FULL JOIN dh ON ph.b = dh.b
    ),
    spine AS (SELECT CAST(i AS INT) AS t FROM range(1, 10) r(i))
    SELECT round(CAST(t AS DOUBLE) / 10, 1) AS threshold,
           CAST(COALESCE(SUM(np), 0) AS BIGINT) AS n_pairs,
           CAST(COALESCE(SUM(nd), 0) AS BIGINT) AS est_docs_removed
    FROM spine LEFT JOIN h ON h.b >= spine.t
    GROUP BY t
    """,
    tags=("dedup", "extension"),
)
def x84(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return D.dedup_threshold_curve(
        docs, shingled=D.corpus_shingles_cached(docs)
    )


# ---------------------------------------------------------------------------
# x85 — chunk-level duplication audit (substring-dedup stand-in)
# ---------------------------------------------------------------------------
@_register(
    "x85_segment_dedup",
    "chunk-level duplication audit: non-overlapping 8-token segments "
    "hashed corpus-wide; per doc, the count and fraction of segments "
    "occurring >= 2 times anywhere — the boilerplate/template screen "
    "whole-doc and near-dup passes miss (fixed-window stand-in for "
    "suffix-array substring dedup); segment-vocab-bounded counts, no "
    "self-join, 8x fewer exploded rows than the shingle join",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    seg0 AS (
      SELECT doc_id,
             unnest(list_transform(range(0, len(t) // 8),
                    i -> array_to_string(list_slice(t, i*8 + 1, i*8 + 8), ' ')))
               AS seg
      FROM toks WHERE len(t) >= 8
    ),
    seg AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(seg), 1, 15) AS BIGINT) AS seg_h
      FROM seg0
    ),
    d AS (SELECT doc_id, seg_h, COUNT(*) AS cnt FROM seg GROUP BY 1, 2),
    c AS (SELECT seg_h, SUM(cnt) AS tc FROM d GROUP BY seg_h)
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_segments,
           CAST(SUM(CASE WHEN tc >= 2 THEN cnt ELSE 0 END) AS BIGINT)
             AS n_dup_segments,
           round(SUM(CASE WHEN tc >= 2 THEN cnt ELSE 0 END)
                 / CAST(SUM(cnt) AS DOUBLE), 6) AS dup_fraction
    FROM d JOIN c USING (seg_h) GROUP BY doc_id
    """,
    tags=("dedup", "extension"),
)
def x85(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.segment_dedup_stats(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# x86 — temperature-scaled mixture weights
# ---------------------------------------------------------------------------
@_register(
    "x86_mixture_temperature",
    "temperature-scaled sampling weights per source (w ~ share^0.7, "
    "the GPT-3/mT5 multinomial mix rule): per-source token counts -> "
    "share -> pow quantized to scaled BIGINT so the normalizing sum is "
    "an exact integer reduction; boost = effective epoch multiplier",
    """
    WITH t AS (
      SELECT source, COUNT(*) AS n_docs,
             SUM(len(string_split(text, ' '))) AS n_tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT SUM(n_tokens) AS tot FROM t),
    p AS (
      SELECT source, n_docs, n_tokens,
             CAST(n_tokens AS DOUBLE) / tot AS share,
             CAST(round(pow(CAST(n_tokens AS DOUBLE) / tot, 0.7) * 1e12, 0)
                  AS BIGINT) AS pwq
      FROM t, tot
    ),
    s AS (SELECT SUM(pwq) AS den FROM p)
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           round(share, 6) AS raw_share,
           round(CAST(pwq AS DOUBLE) / den, 6) AS temp_weight,
           round(CAST(pwq AS DOUBLE) / den / share, 6) AS boost
    FROM p, s
    """,
    tags=("curation", "extension"),
)
def x86(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.mixture_temperature(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# x87 — per-source KL divergence from the corpus unigram distribution
# ---------------------------------------------------------------------------
@_register(
    "x87_source_divergence",
    "per-source KL(P_src || P_corpus) over unigram token distributions "
    "in nats — the model-free mixture audit that ranks sources by "
    "distributional distance before blending (x79 drifts one numeric "
    "column; this drifts the whole vocabulary); no smoothing needed "
    "(source tokens are a subset of corpus tokens), ln once per "
    "(source, token), scaled-BIGINT order-free sums",
    """
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    cs AS (SELECT source, t, COUNT(*) AS c_st FROM tok GROUP BY 1, 2),
    ns AS (
      SELECT source, SUM(c_st) AS n_s, COUNT(*) AS n_types
      FROM cs GROUP BY source
    ),
    ct AS (SELECT t, SUM(c_st) AS c_t FROM cs GROUP BY t),
    n AS (SELECT SUM(c_t) AS n FROM ct),
    terms AS (
      SELECT cs.source, cs.c_st,
             CAST(round(ln(CAST(cs.c_st * n.n AS DOUBLE)
                           / (ns.n_s * ct.c_t)) * 1e6, 0) AS BIGINT) AS lnq
      FROM cs JOIN ct USING (t) JOIN ns USING (source) CROSS JOIN n
    ),
    agg AS (
      SELECT source, SUM(c_st * lnq) AS s FROM terms GROUP BY source
    )
    SELECT source, CAST(n_s AS BIGINT) AS n_tokens,
           CAST(n_types AS BIGINT) AS n_types,
           round(CAST(s AS DOUBLE) / 1e6 / n_s, 6) AS kl_nats
    FROM agg JOIN ns USING (source)
    """,
    tags=("text", "curation", "extension"),
)
def x87(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.source_token_kl(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# x88 — top-k PMI collocations
# ---------------------------------------------------------------------------
@_register(
    "x88_pmi_bigrams",
    "top-50 collocations by pointwise mutual information with a "
    "min-count floor (Church & Hanks): templated phrases surface as "
    "impossibly strong associations before training; marginals from "
    "re-aggregating the bigram vocab (no second corpus pass), PMI once "
    "per surviving bigram from exact int64 counts, TakeOrdered heap "
    "with (pmi DESC, bigram) tie-break — never a full sort",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    b AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t)),
                                   i -> t[i] || ' ' || t[i+1])) AS bg
      FROM toks
    ),
    c2 AS (SELECT bg, COUNT(*) AS c_ab FROM b GROUP BY bg),
    n AS (SELECT SUM(c_ab) AS n FROM c2),
    parts AS (
      SELECT bg, c_ab, split_part(bg, ' ', 1) AS w1,
             split_part(bg, ' ', 2) AS w2
      FROM c2
    ),
    c1 AS (SELECT w1, SUM(c_ab) AS c_a FROM parts GROUP BY w1),
    cb AS (SELECT w2, SUM(c_ab) AS c_b FROM parts GROUP BY w2)
    SELECT bg AS bigram, CAST(c_ab AS BIGINT) AS c_ab,
           CAST(c_a AS BIGINT) AS c_a, CAST(c_b AS BIGINT) AS c_b,
           round(ln(CAST(c_ab * n.n AS DOUBLE) / (c_a * c_b)), 6) AS pmi
    FROM parts JOIN c1 USING (w1) JOIN cb USING (w2) CROSS JOIN n
    WHERE c_ab >= 5
    ORDER BY pmi DESC, bigram
    LIMIT 50
    """,
    tags=("text", "extension"),
)
def x88(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.pmi_top_bigrams(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# x89 — duplicate-cluster size profile
# ---------------------------------------------------------------------------
@_register(
    "x89_cluster_size_profile",
    "near-dup cluster size distribution from the memoized components "
    "working set (minhash-LSH pairs -> connected components, built "
    "once per session for x25/x36/x89): n_clusters and exact "
    "docs_removed = (size-1)*n_clusters per size — the transitive "
    "dedup yield-loss audit x84's pair-based estimate lower-bounds",
    f"""
    WITH RECURSIVE {_SIG_CTE},
    bands AS (
    {_BAND_BRANCHES}
    ),
    prs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM prs
      UNION SELECT doc_b, doc_a FROM prs
    ),
    reach(id, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id
    ),
    comp AS (SELECT id AS doc_id, MIN(lbl) AS component_id
             FROM reach GROUP BY id),
    sz AS (SELECT component_id, COUNT(*) AS cluster_size
           FROM comp GROUP BY component_id)
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs,
           CAST((cluster_size - 1) * COUNT(*) AS BIGINT) AS docs_removed
    FROM sz GROUP BY cluster_size
    """,
    tags=("dedup", "extension"),
)
def x89(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.cluster_size_profile(
        D.corpus_components(_docs(spark, sf_dir))
    )


# ---------------------------------------------------------------------------
# x90 — winnowing cross-document matcher (MOSS-style substring overlap)
# ---------------------------------------------------------------------------
@_register(
    "x90_winnow_matches",
    "cross-document winnowing matcher: pairs sharing >= 2 window-min "
    "fingerprints with the shared count (MOSS, Schleimer et al. 2003) "
    "— the guarantee-backed substring-overlap detector (any shared "
    ">= w+k-1 token run MUST share a fingerprint) complementing "
    "MinHash's whole-document resemblance; inverted-index self-join on "
    "the 31-bit fingerprint, ~2/(w+1) the shingle join's exploded rows",
    f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    g AS (
      SELECT doc_id,
             CASE WHEN len(t) >= 3 THEN
               list_transform(range(1, len(t) - 1),
                              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
             ELSE []::VARCHAR[] END AS grams
      FROM toks
    ),
    h AS (
      SELECT doc_id,
             list_transform(grams, s -> {_HASH_SQL.format(col='s')}) AS hs
      FROM g
    ),
    wnd AS (
      SELECT doc_id,
             CASE WHEN len(hs) >= 4 THEN
               list_distinct(list_transform(range(1, len(hs) - 2),
                                            i -> list_min(hs[i:i+3])))
             ELSE []::BIGINT[] END AS fps
      FROM h
    ),
    fpr AS (SELECT doc_id, unnest(fps) AS fp FROM wnd)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS shared_fp
    FROM fpr a JOIN fpr b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING COUNT(*) >= 2
    """,
    tags=("text", "dedup", "extension"),
)
def x90(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.winnow_match_pairs(_docs(spark, sf_dir), k=3, w=4, min_shared=2)


# ---------------------------------------------------------------------------
# x91 — cross-source near-duplicate leakage matrix
# ---------------------------------------------------------------------------
@_register(
    "x91_cross_source_leakage",
    "near-dup leakage matrix between sources: LSH candidate pairs "
    "aggregated by normalized endpoint sources — the doc-granular "
    "complement to x78's shingle-set overlap (N specific documents are "
    "near-copies across two feeds: re-sold crawls, and the leak risk "
    "of source-keyed train/eval splits); two id->source joins over the "
    "memoized signature working set, |sources|^2-bounded output",
    f"""
    WITH {_SIG_CTE},
    bands AS (
    {_BAND_BRANCHES}
    ),
    prs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    ),
    lab AS (
      SELECT LEAST(da.source, db.source) AS source_a,
             GREATEST(da.source, db.source) AS source_b
      FROM prs
      JOIN documents da ON da.doc_id = prs.doc_a
      JOIN documents db ON db.doc_id = prs.doc_b
    )
    SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM lab GROUP BY 1, 2
    """,
    tags=("dedup", "curation", "extension"),
)
def x91(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return D.cross_source_pairs(docs)


# ---------------------------------------------------------------------------
# x92 — embedding-table QA profile
# ---------------------------------------------------------------------------
@_register(
    "x92_embedding_profile",
    "embedding-table QA per label: vector counts, dim min/max (ragged "
    "dims break every dot product), zero vectors (cosine-undefined), "
    "duplicate vectors (grouped on the RAW float array — no float "
    "formatting), and the quantized-exact mean norm — the pre-flight "
    "the ANN/SemDeDup/prototype family runs before trusting a vector "
    "column",
    """
    WITH e AS (
      SELECT label, embedding AS v, embedding::DOUBLE[] AS vd
      FROM embeddings
    ),
    n AS (
      SELECT label, v, len(v) AS dim,
             CAST(round(sqrt(list_aggregate(
                 list_transform(vd, x -> x * x), 'sum')) * 1e6, 0)
               AS BIGINT) AS nq
      FROM e
    ),
    d AS (SELECT label, v, COUNT(*) AS c FROM e GROUP BY 1, 2),
    dup AS (
      SELECT label,
             CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
               AS n_dup_vecs
      FROM d GROUP BY label
    ),
    per AS (
      SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
             CAST(MIN(dim) AS BIGINT) AS dim_min,
             CAST(MAX(dim) AS BIGINT) AS dim_max,
             CAST(SUM(CASE WHEN nq = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zero,
             SUM(nq) AS snq
      FROM n GROUP BY label
    )
    SELECT label, n_vecs, dim_min, dim_max, n_zero, n_dup_vecs,
           round(CAST(snq AS DOUBLE) / 1e6 / n_vecs, 6) AS mean_norm
    FROM per JOIN dup USING (label)
    """,
    tags=("similarity", "extension"),
)
def x92(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.embedding_profile(_emb(spark, sf_dir))


# ---------------------------------------------------------------------------
# x93 — packing yield accounting
# ---------------------------------------------------------------------------
@_register(
    "x93_packing_stats",
    "per-source packing yield at a 512-token budget: n_seqs = budget "
    "units the concatenated token stream spans (exact integer ceil) "
    "and fill_rate = tokens/(n_seqs*budget) under the pack_sequences "
    "offset rule — the compute-utilization half of the bucket-vs-pack "
    "batch-shape decision (x49 accounts the fixed-bucket half). "
    "Counting distinct seq ids undercounted compute when a document "
    "spans multiple budget units (fill_rate > 1, r9 review finding); "
    "one partial agg, no window",
    """
    WITH t AS (
      SELECT source, len(string_split(text, ' ')) AS tok
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(tok) AS BIGINT) AS n_tokens,
           CAST((SUM(tok) + 511) // 512 AS BIGINT) AS n_seqs,
           round(CASE WHEN SUM(tok) > 0
                      THEN SUM(tok)
                           / CAST(((SUM(tok) + 511) // 512) * 512 AS DOUBLE)
                      ELSE 0.0 END, 6) AS fill_rate
    FROM t GROUP BY source
    """,
    tags=("curation", "extension"),
)
def x93(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.packing_stats(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# x94 — per-document feature correlation (curation-feature QA)
# ---------------------------------------------------------------------------
_FC_FEATS = {
    "f_chars": "n_chars",
    "f_tokens": "len(string_split(text, ' '))",
    "f_types": "len(list_distinct(string_split(text, ' ')))",
}
_FC_MOMENTS = ",\n         ".join(
    f"CAST(SUM({k}) AS BIGINT) AS s_{k}, "
    f"CAST(SUM({k} * {k}) AS BIGINT) AS ss_{k}"
    for k in _FC_FEATS
) + ",\n         " + ",\n         ".join(
    f"CAST(SUM({a} * {b}) AS BIGINT) AS sp_{a}_{b}"
    for i, a in enumerate(_FC_FEATS)
    for b in list(_FC_FEATS)[i + 1 :]
)
_FC_BRANCHES = "\n    UNION ALL\n".join(
    f"""SELECT '{a}' AS feat_x, '{b}' AS feat_y, n AS n_docs,
       CASE WHEN (n * ss_{a} - s_{a} * s_{a}) > 0
              AND (n * ss_{b} - s_{b} * s_{b}) > 0
            THEN round(CAST(n * sp_{a}_{b} - s_{a} * s_{b} AS DOUBLE)
                       / (sqrt(CAST(n * ss_{a} - s_{a} * s_{a} AS DOUBLE))
                          * sqrt(CAST(n * ss_{b} - s_{b} * s_{b} AS DOUBLE))),
                       6)
            ELSE 0.0 END AS pearson
    FROM s"""
    for i, a in enumerate(_FC_FEATS)
    for b in list(_FC_FEATS)[i + 1 :]
)


@_register(
    "x94_feature_correlation",
    "pairwise Pearson correlation of the per-doc curation features "
    "(declared chars, tokens, distinct tokens) from exact BIGINT "
    "moment sums — the redundancy audit before weighting features in "
    "a quality gate, and a declared-vs-recomputed ingest check; one "
    "global partial agg to a single moment row",
    f"""
    WITH f AS (
      SELECT {", ".join(f"{v} AS {k}" for k, v in _FC_FEATS.items())}
      FROM documents
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
         {_FC_MOMENTS}
      FROM f
    )
    {_FC_BRANCHES}
    """,
    tags=("curation", "extension"),
)
def x94(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.feature_correlation(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# x95 — per-source stylometry (vocabulary-richness profile)
# ---------------------------------------------------------------------------
@_register(
    "x95_source_stylometry",
    "per-source vocabulary-richness profile: type-token ratio, hapax "
    "fraction and mean word length as exact int/int ratios — the "
    "template/machine-text triage read before setting per-source "
    "dedup and quality thresholds; one vocabulary-bounded shuffle",
    """
    WITH tk AS (SELECT source, unnest(string_split(text, ' ')) AS tok
                FROM documents),
    per AS (SELECT source, tok, COUNT(*) AS c FROM tk GROUP BY 1, 2),
    st AS (
      SELECT source,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_types,
             CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hapax,
             CAST(SUM(len(tok) * c) AS BIGINT) AS cm
      FROM per GROUP BY source
    ),
    d AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
          FROM documents GROUP BY source)
    SELECT source, n_docs, n_tokens, n_types, n_hapax,
           round(CAST(n_types AS DOUBLE) / n_tokens, 6) AS ttr,
           round(CAST(n_hapax AS DOUBLE) / n_types, 6) AS hapax_frac,
           round(CAST(cm AS DOUBLE) / n_tokens, 6) AS mean_word_len
    FROM st JOIN d USING (source)
    """,
    tags=("text", "extension"),
)
def x95(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.source_stylometry(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# x96 — duplicate-fraction growth curve (dedup scaling study)
# ---------------------------------------------------------------------------
@_register(
    "x96_dup_growth_curve",
    "exact-dedup statistics over NESTED md5-keyed corpus samples "
    "(25/50/75/100%): duplicate rate grows with corpus size, so this "
    "curve — monotone by construction — is how a 100 TB dedup budget "
    "is extrapolated from affordable prefixes; text never leaves the "
    "scan, the exchange carries 16-byte fingerprints",
    f"""
    WITH b AS (
      SELECT md5({_NORM_SQL}) AS fp,
             {_BUCKET_SQL_T.format(salt='growth', col='doc_id')} AS bk
      FROM documents
    ),
    l AS (SELECT unnest([25, 50, 75, 100]) AS pct),
    m AS (SELECT l.pct, b.fp FROM b, l WHERE b.bk < l.pct),
    g AS (SELECT pct, fp, COUNT(*) AS c FROM m GROUP BY 1, 2)
    SELECT CAST(pct AS BIGINT) AS pct,
           CAST(SUM(c) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
             AS n_dup_docs,
           CAST(SUM(c - 1) AS BIGINT) AS n_excess,
           round(CAST(SUM(c - 1) AS DOUBLE) / SUM(c), 6) AS dup_frac
    FROM g GROUP BY pct
    """,
    tags=("dedup", "extension"),
)
def x96(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.dup_growth_curve(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# x97 — embedding class-separation audit (cohesion vs nearest centroid)
# ---------------------------------------------------------------------------
_CENT_COS = (
    "round(list_dot_product({v}, {q}) / "
    "(sqrt(list_dot_product({v}, {v})) * sqrt(list_dot_product({q}, {q}))), 6)"
)


@_register(
    "x97_embedding_separation",
    "class-separation audit: per label, members' mean cosine to their "
    "own decimal-exact centroid vs the cosine to the NEAREST other "
    "centroid; margin <= 0 flags overlapping/mislabeled classes — the "
    "embedding-space twin of the x69 label audit; centroid table is "
    "broadcast-sized, one narrow scoring pass",
    f"""
    WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
    comp AS (
      SELECT label,
             unnest(list_transform(range(1, len(v) + 1),
                    i -> {{'p': i, 'v': v[i]}})) AS s
      FROM e
    ),
    m AS (
      SELECT label, s.p - 1 AS pos,
             round(CAST(SUM(CAST(s.v AS DECIMAL(38,12))) AS DOUBLE)
                   / COUNT(*), 6) AS m
      FROM comp GROUP BY 1, 2
    ),
    -- zero-norm centroid guard, same rule as the engine: a label whose
    -- centroid degenerates to the zero vector has no defined cosine to
    -- anything and is excluded entirely (its NaN inter_cos would
    -- otherwise NaN-rank first in every label's nearest window)
    cv AS (SELECT label, list(m ORDER BY pos) AS cvec FROM m GROUP BY 1
           HAVING list_dot_product(list(m ORDER BY pos),
                                   list(m ORDER BY pos)) > 0),
    coh AS (
      SELECT e.label, CAST(COUNT(*) AS BIGINT) AS n_scored,
             SUM(CAST(round(list_dot_product(e.v, cv.cvec)
                   / (sqrt(list_dot_product(e.v, e.v))
                      * sqrt(list_dot_product(cv.cvec, cv.cvec)))
                   * 1e6, 0) AS BIGINT)) AS sq
      FROM e JOIN cv USING (label)
      WHERE list_dot_product(e.v, e.v) > 0
      GROUP BY e.label
    ),
    pr AS (
      SELECT a.label, b.label AS nearest_label,
             {_CENT_COS.format(v='a.cvec', q='b.cvec')} AS inter_cos,
             ROW_NUMBER() OVER (
               PARTITION BY a.label
               ORDER BY {_CENT_COS.format(v='a.cvec', q='b.cvec')} DESC,
                        b.label) AS rn
      FROM cv a JOIN cv b ON a.label <> b.label
    )
    SELECT coh.label, n_scored,
           round(CAST(sq AS DOUBLE) / 1e6 / n_scored, 6) AS cohesion,
           nearest_label, inter_cos,
           round(round(CAST(sq AS DOUBLE) / 1e6 / n_scored, 6) - inter_cos,
                 6) AS margin
    FROM coh JOIN pr USING (label)
    WHERE rn = 1
    """,
    tags=("similarity", "extension"),
)
def x97(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.embedding_separation(_emb(spark, sf_dir))


# ---------------------------------------------------------------------------
# x98 — dedup-method agreement matrix (exact vs MinHash-LSH vs SimHash)
# ---------------------------------------------------------------------------
@_register(
    "x98_dedup_method_agreement",
    "agreement matrix across the three cheap pair detectors (exact "
    "fingerprint, banded MinHash-LSH candidates, SimHash hamming<=3): "
    "pair counts per membership combination — the method-calibration "
    "read before committing a 100 TB dedup stack; the exact-without-"
    "minhash cell exposes LSH's sub-shingle blind spot, simhash-only "
    "sizes the bag-of-words false-positive surface; fully collapsed — "
    "detectors run on distinct raw texts only, every member pair's "
    "cell is derived combinatorially (within-group mass is C(c,2) "
    "arithmetic, cross-group weights c_a*c_b), no per-member pair is "
    "ever enumerated",
    f"""
    WITH {_SIG_CTE},
    bands AS (
    {_BAND_BRANCHES}
    ),
    mh AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    ),
    {_SIMHASH_CTE},
    chunks AS (
      SELECT doc_id, simhash,
             (simhash >> 0) & 255 AS c0, (simhash >> 8) & 255 AS c1,
             (simhash >> 16) & 255 AS c2, (simhash >> 24) & 255 AS c3
      FROM sim
    ),
    sp AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM chunks a JOIN chunks b
        ON a.doc_id < b.doc_id
       AND (a.c0 = b.c0 OR a.c1 = b.c1 OR a.c2 = b.c2 OR a.c3 = b.c3)
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    ),
    fp AS (SELECT doc_id, md5({_NORM_SQL}) AS fp FROM documents),
    ex AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
    ),
    tagged AS (
      SELECT doc_a, doc_b, 1 AS e, 0 AS m, 0 AS s FROM ex
      UNION ALL
      SELECT doc_a, doc_b, 0, 1, 0 FROM mh
      UNION ALL
      SELECT doc_a, doc_b, 0, 0, 1 FROM sp
    ),
    pp AS (
      SELECT doc_a, doc_b, MAX(e) AS e, MAX(m) AS m, MAX(s) AS s
      FROM tagged GROUP BY 1, 2
    )
    SELECT CAST(e AS BIGINT) AS in_exact, CAST(m AS BIGINT) AS in_minhash,
           CAST(s AS BIGINT) AS in_simhash,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM pp GROUP BY 1, 2, 3
    """,
    tags=("dedup", "extension"),
)
def x98(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.dedup_method_agreement(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# x99 — per-source dedup yield loss (mixture impact of the dedup pass)
# ---------------------------------------------------------------------------
@_register(
    "x99_dedup_source_yield",
    "per-source yield loss under near-dup dedup (min-id keeper per LSH "
    "component): docs removed, removed fraction, and docs whose keeper "
    "lives in a DIFFERENT source — the mixture-impact audit priced "
    "before committing a dedup pass (a high-loss source is a re-sold "
    "crawl; n_lost_other measures how the pass silently reweights the "
    "x50/x86 mixture); reads the memoized components working set, two "
    "int64-keyed narrow joins, one |sources|-row agg",
    f"""
    WITH RECURSIVE {_SIG_CTE},
    bands AS (
    {_BAND_BRANCHES}
    ),
    prs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM prs
      UNION SELECT doc_b, doc_a FROM prs
    ),
    reach(id, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id
    ),
    comp AS (SELECT id AS doc_id, MIN(lbl) AS component_id
             FROM reach GROUP BY id),
    j AS (
      SELECT c.doc_id, c.component_id, d.source,
             k.source AS keeper_src
      FROM comp c
      JOIN documents d ON c.doc_id = d.doc_id
      JOIN documents k ON c.component_id = k.doc_id
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN doc_id <> component_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_removed,
           round(CAST(SUM(CASE WHEN doc_id <> component_id THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS removed_frac,
           CAST(SUM(CASE WHEN doc_id <> component_id
                          AND keeper_src <> source THEN 1 ELSE 0 END)
                AS BIGINT) AS n_lost_other
    FROM j GROUP BY source
    """,
    tags=("dedup", "extension"),
)
def x99(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.dedup_source_yield(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# x100 — quality-vs-dedup calibration (pipeline-order decision table)
# ---------------------------------------------------------------------------
@_register(
    "x100_quality_dedup_calibration",
    "cross-signal calibration: per fixed-width quality-score bucket, "
    "the fraction of docs the near-dup pass removes — decides pipeline "
    "ORDER at 100 TB (if low-quality buckets carry the duplication, "
    "the cheap filter runs first and shrinks the LSH pass) and "
    "externally validates the score (template text should sit low on "
    "both axes); memoized components + one narrow int64 join, "
    "n_buckets rows out",
    f"""
    WITH RECURSIVE {_SIG_CTE},
    bands AS (
    {_BAND_BRANCHES}
    ),
    prs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM prs
      UNION SELECT doc_b, doc_a FROM prs
    ),
    reach(id, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id
    ),
    comp AS (SELECT id AS doc_id, MIN(lbl) AS component_id
             FROM reach GROUP BY id),
    t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    q AS (
      SELECT doc_id,
             LEAST(CAST(FLOOR(round(
                     (len(list_distinct(tk)) / len(tk)) * 0.5
                     + (1.0 - len(list_filter(tk, x -> x = 'a' OR x = 'the'))
                              / len(tk)) * 0.5, 6) * 10) AS BIGINT),
                   9) AS q_bucket
      FROM t
    )
    SELECT q.q_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN c.doc_id <> c.component_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_removed,
           round(CAST(SUM(CASE WHEN c.doc_id <> c.component_id
                                THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS removed_frac
    FROM q JOIN comp c ON q.doc_id = c.doc_id
    GROUP BY q.q_bucket
    """,
    tags=("curation", "extension"),
)
def x100(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.quality_dedup_calibration(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# x101 — Poisson-bootstrap per-source CI (one-pass resampling at scale)
# ---------------------------------------------------------------------------
@_register(
    "x101_bootstrap_source_ci",
    "per-source Poisson-bootstrap 95% CI for mean n_chars: each (doc, "
    "replica) draws a deterministic md5-derived Poisson(1) weight (the "
    "large-n limit of with-replacement resampling), so all 32 replicas "
    "compute in ONE streaming aggregation — the technique that turns "
    "'source A scores lower' into 'lower and the intervals do not "
    "overlap' without ever shuffling resampled data; replica means "
    "quantized to scaled BIGINT so the sd is exact-integer in any "
    "aggregation order",
    """
    WITH r AS (
      SELECT source, CAST(n_chars AS BIGINT) AS x, doc_id,
             unnest(range(32)) AS rep
      FROM documents
    ),
    h AS (
      SELECT source, x, rep,
             CAST('0x' || substr(md5('boot' || CAST(doc_id AS VARCHAR)
                                  || '_' || CAST(rep AS VARCHAR)), 1, 15)
                  AS BIGINT) / 1152921504606846976.0 AS u
      FROM r
    ),
    w AS (SELECT source, rep, x, CASE WHEN u < 0.36787944117144233 THEN 0 WHEN u < 0.7357588823428847 THEN 1 WHEN u < 0.9196986029286058 THEN 2 WHEN u < 0.9810118431238462 THEN 3 WHEN u < 0.9963401531726563 THEN 4 ELSE 5 END AS w FROM h),
    pr AS (
      SELECT source, rep,
             CAST(round(CASE WHEN SUM(w) > 0
                             THEN CAST(SUM(w * x) AS DOUBLE) / SUM(w)
                             ELSE 0.0 END * 1e6, 0) AS BIGINT) AS mq
      FROM w GROUP BY 1, 2
    ),
    mo AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS b,
             CAST(SUM(mq) AS BIGINT) AS s,
             SUM(CAST(mq AS HUGEINT) * mq) AS ss
      FROM pr GROUP BY 1
    ),
    pl AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS sx
      FROM documents GROUP BY 1
    )
    SELECT pl.source, n_docs,
           round(CAST(sx AS DOUBLE) / n_docs, 6) AS mean,
           round(CAST(s AS DOUBLE) / b / 1e6, 6) AS boot_mean,
           round(sqrt(GREATEST(
             (CAST(ss AS DOUBLE) / b
              - (CAST(s AS DOUBLE) / b) * (CAST(s AS DOUBLE) / b)) / 1e12,
             0.0)), 6) AS boot_sd,
           round(CAST(s AS DOUBLE) / b / 1e6
                 - 1.96 * sqrt(GREATEST(
                     (CAST(ss AS DOUBLE) / b
                      - (CAST(s AS DOUBLE) / b) * (CAST(s AS DOUBLE) / b))
                     / 1e12, 0.0)), 6) AS ci_lo,
           round(CAST(s AS DOUBLE) / b / 1e6
                 + 1.96 * sqrt(GREATEST(
                     (CAST(ss AS DOUBLE) / b
                      - (CAST(s AS DOUBLE) / b) * (CAST(s AS DOUBLE) / b))
                     / 1e12, 0.0)), 6) AS ci_hi
    FROM pl JOIN mo ON pl.source = mo.source
""",
    tags=("curation", "extension"),
)
def x101(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.bootstrap_source_ci(_docs(spark, sf_dir))


# collapsed-pair-form twins run on a duplicate-heavy corpus (documents
# unioned with an id-shifted copy — every text duplicated), reading from
# the `dupdocs` CTE instead of the raw table; rep-level bands/chunks run
# on the per-group representative signatures only.
_DUP_SIG_CTE = _SIG_CTE.replace("FROM documents", "FROM dupdocs")
_DUP_SIMHASH_CTE = _SIMHASH_CTE.replace("FROM documents", "FROM dupdocs")
_REP_BAND_BRANCHES = _BAND_BRANCHES.replace("FROM sigs", "FROM rep_sigs")
_MH_ALL = ", ".join(f"mh{i}" for i in range(D.N_BANDS * D.ROWS_PER_BAND))


@_register(
    "x102_pair_collapsed_form",
    "collapsed candidate-pair form (expand=False) over a duplicate-heavy "
    "corpus: banded joins run on per-signature-group representatives "
    "only; output is (method, rep_a, rep_b, c_a, c_b, implied_pairs) "
    "where within-group rows (rep_a=rep_b) stand for C(c,2) member "
    "pairs and cross rows for c_a*c_b — the x98 collapse discipline as "
    "a public variant of the minhash-LSH and simhash pair surfaces "
    "(dedup.minhash_lsh_pairs/simhash_pairs expand=False; "
    "expand_collapsed_pairs inverts it exactly, test-asserted)",
    f"""
    WITH dupdocs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents
    ),
    {_DUP_SIG_CTE},
    {_DUP_SIMHASH_CTE},
    mh_key AS (
      SELECT doc_id, concat_ws('_', {_MH_ALL}) AS fullsig FROM sigs
    ),
    mh_groups AS (
      SELECT fullsig, min(doc_id) AS rep_id, COUNT(*) AS c
      FROM mh_key GROUP BY fullsig
    ),
    rep_sigs AS (
      SELECT s.* FROM sigs s JOIN mh_groups g ON s.doc_id = g.rep_id
    ),
    bands AS (
    {_REP_BAND_BRANCHES}
    ),
    mh_pairs AS (
      SELECT DISTINCT a.doc_id AS rep_a, b.doc_id AS rep_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    ),
    mh_coll AS (
      SELECT 'minhash' AS method, rep_a, rep_b, ga.c AS c_a, gb.c AS c_b
      FROM mh_pairs
      JOIN mh_groups ga ON ga.rep_id = rep_a
      JOIN mh_groups gb ON gb.rep_id = rep_b
      UNION ALL
      SELECT 'minhash', rep_id, rep_id, c, c FROM mh_groups WHERE c >= 2
    ),
    sh_groups AS (
      SELECT simhash, min(doc_id) AS rep_id, COUNT(*) AS c
      FROM sim GROUP BY simhash
    ),
    chunks AS (
      SELECT rep_id AS doc_id, simhash,
             (simhash >> 0) & 255 AS c0, (simhash >> 8) & 255 AS c1,
             (simhash >> 16) & 255 AS c2, (simhash >> 24) & 255 AS c3
      FROM sh_groups
    ),
    sh_pairs AS (
      SELECT DISTINCT a.doc_id AS rep_a, b.doc_id AS rep_b,
             a.simhash AS sa, b.simhash AS sb
      FROM chunks a JOIN chunks b
        ON a.doc_id < b.doc_id
       AND (a.c0 = b.c0 OR a.c1 = b.c1 OR a.c2 = b.c2 OR a.c3 = b.c3)
    ),
    sh_coll AS (
      SELECT 'simhash' AS method, rep_a, rep_b, ga.c AS c_a, gb.c AS c_b
      FROM sh_pairs
      JOIN sh_groups ga ON ga.rep_id = rep_a
      JOIN sh_groups gb ON gb.rep_id = rep_b
      WHERE bit_count(xor(sa, sb)) <= 3
      UNION ALL
      SELECT 'simhash', rep_id, rep_id, c, c FROM sh_groups WHERE c >= 2
    ),
    un AS (SELECT * FROM mh_coll UNION ALL SELECT * FROM sh_coll)
    SELECT method, CAST(rep_a AS BIGINT) AS rep_a,
           CAST(rep_b AS BIGINT) AS rep_b,
           CAST(c_a AS BIGINT) AS c_a, CAST(c_b AS BIGINT) AS c_b,
           CAST(CASE WHEN rep_a = rep_b THEN c_a * (c_a - 1) // 2
                     ELSE c_a * c_b END AS BIGINT) AS implied_pairs
    FROM un
    """,
    tags=("dedup", "extension"),
)
def x102(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    dup = docs.unionByName(
        docs.withColumn("doc_id", (F.col("doc_id") + F.lit(1000000)).cast("long"))
    )
    mh = D.minhash_lsh_pairs(D.corpus_signatures(dup), expand=False).select(
        F.lit("minhash").alias("method"), "rep_a", "rep_b", "c_a", "c_b"
    )
    sh = D.simhash_pairs(D.simhash(dup), expand=False).select(
        F.lit("simhash").alias("method"), "rep_a", "rep_b", "c_a", "c_b"
    )
    both = mh.unionByName(sh)
    # integer DIV, not float /: C(c,2) must stay exact past 2^53 for
    # the boilerplate-duplicated-millions-of-times groups the collapsed
    # form exists for (and to match the oracle's integer //)
    implied = F.when(
        F.col("rep_a") == F.col("rep_b"),
        F.expr("c_a * (c_a - 1) DIV 2"),
    ).otherwise(F.col("c_a") * F.col("c_b"))
    return both.withColumn("implied_pairs", implied.cast("bigint"))


# ---------------------------------------------------------------------------
# x103 — REAL media decode, oracle-gated (the r8 decoders' CORRECTNESS row)
# ---------------------------------------------------------------------------
# A deterministic fixture of raw media bytes (multimodal.
# media_fixture_payloads: netpbm P5/P6 images, uncompressed 24/32-bit
# BMPs in both row orders, canonical mono PCM WAV at 8/16/24-bit
# sample widths, stored-deflate PNGs in gray and RGB — filter 0 plus
# 8-bit Sub/Up-filtered rows and 8-bit palette images — one
# unrecognized payload, one truncated image) is shared as hex literals
# between the two engines. Spark decodes the bytes with the REAL
# decode_netpbm / decode_bmp / decode_wav / decode_png kernels inside
# the media_features mapInPandas pass; DuckDB re-parses the SAME bytes
# with pure byte arithmetic — netpbm at fixed offsets (single-digit
# dims make that header always 11 bytes), BMP and WAV by parsing
# dimensions / bit depth / data offset / sample width out of their
# little-endian header fields, PNG by parsing IHDR big-endian fields
# and walking the scanlines of the level-0 zlib stream (a stored
# block is raw bytes at a fixed offset — so the engine's real inflate
# path IS oracle-gated; Sub/Up-filtered scanlines reconstruct as
# modular prefix-sum WINDOWS over those bytes, gating the real
# unfilter kernel for types 1/2), and TIFF by actually walking the IFD in SQL
# (unnest over the fixed-width entry records → width/height/spp/
# compression/strip offset, then the raw single strip). Compressed-
# Huffman and Average/Paeth-filtered PNGs (the left-PIXEL recurrence
# mixes both axes — not a SQL window over the filtered bytes) and
# big-endian/multi-strip TIFFs remain property-tested only.
# Fixture contract: every PNG/TIFF/BMP/WAV payload in the fixture MUST
# conform to the layout its oracle arm models — an out-of-contract
# payload (e.g. a compressed-IDAT PNG, which Spark decodes fine) would
# match no oracle arm and surface as a row-count mismatch. The guards
# are string-equality/bounds checks, so such a payload degrades to a
# visible diff, never a query abort. Degrade-path rows (truncated /
# unrecognized) are modeled only where byte math can decide them (the
# netpbm truncation and the magic-byte 'unknown' arm).
# Floats are quantized to scaled BIGINT (×1e6, round) and NULL
# not-applicable fields coalesce to -1 on both sides, per the driver's
# dtype-exact hashing contract.
_MEDIA_FIXTURE_VALUES = ",\n      ".join(
    f"({did}, '{hx}')" for did, hx in M.media_fixture_payloads()
)

def _hxb(off: str | int) -> str:
    """DuckDB expression: unsigned byte of blob-hex ``hx`` at offset."""
    if isinstance(off, int):
        return f"CAST('0x' || substr(hx, {2 * off + 1}, 2) AS BIGINT)"
    return f"CAST('0x' || substr(hx, 2 * ({off}) + 1, 2) AS BIGINT)"


_MEDIA_ORACLE = f"""
    WITH payload_rows(did, hx) AS (VALUES
      {_MEDIA_FIXTURE_VALUES}),
    -- VALUES literals type as INT32; the engine's doc_id is BIGINT
    payloads AS (SELECT CAST(did AS BIGINT) AS doc_id, hx FROM payload_rows),
    -- netpbm: header is the fixed 11 bytes 'P5\\n{{w}} {{h}}\\n255\\n'
    imgh AS (
      SELECT doc_id, hx,
             CAST(length(hx) // 2 AS BIGINT) AS n_bytes,
             CASE WHEN substr(hx, 1, 4) = '5036' THEN 3 ELSE 1 END AS ch,
             {_hxb(3)} - 48 AS w,
             {_hxb(5)} - 48 AS h
      FROM payloads WHERE substr(hx, 1, 4) IN ('5035', '5036')
    ),
    imgok AS (SELECT * FROM imgh WHERE n_bytes >= 11 + w * h * ch),
    imgpix AS (
      SELECT doc_id, hx, unnest(range(0, w * h * ch)) AS k FROM imgok
    ),
    imgmean AS (
      SELECT doc_id, AVG({_hxb('11 + k')}) AS meanv
      FROM imgpix GROUP BY doc_id
    ),
    -- WAV: canonical 44-byte RIFF/WAVE header, mono PCM; the sample
    -- width (8/16/24-bit) is PARSED from the bits-per-sample field
    wavh AS (
      SELECT doc_id, hx,
             CAST(length(hx) // 2 AS BIGINT) AS n_bytes,
             {_hxb(22)} + 256 * {_hxb(23)} AS ch,
             {_hxb(24)} + 256 * {_hxb(25)}
               + 65536 * {_hxb(26)} + 16777216 * {_hxb(27)} AS rate,
             ({_hxb(34)} + 256 * {_hxb(35)}) // 8 AS wb,
             {_hxb(40)} + 256 * {_hxb(41)}
               + 65536 * {_hxb(42)} + 16777216 * {_hxb(43)} AS dsize
      FROM payloads
      WHERE substr(hx, 1, 8) = '52494646' AND substr(hx, 17, 8) = '57415645'
    ),
    wavn AS (SELECT *, dsize // (ch * wb) AS n FROM wavh),
    wavsmp AS (
      SELECT doc_id, hx, wb, unnest(range(0, n)) AS k FROM wavn
    ),
    wavval AS (
      SELECT doc_id,
             -- 8-bit PCM is unsigned centered at 128; 16/24-bit are
             -- signed little-endian
             CASE WHEN wb = 1 THEN u - 128
                  WHEN wb = 2 AND u >= 32768 THEN u - 65536
                  WHEN wb = 3 AND u >= 8388608 THEN u - 16777216
                  ELSE u END AS v
      FROM (SELECT doc_id, wb,
                   {_hxb('44 + wb * k')}
                   + CASE WHEN wb >= 2
                          THEN 256 * {_hxb('45 + wb * k')} ELSE 0 END
                   + CASE WHEN wb >= 3
                          THEN 65536 * {_hxb('46 + wb * k')} ELSE 0 END AS u
            FROM wavsmp)
    ),
    wavagg AS (
      SELECT doc_id, MAX(ABS(v)) AS peak,
             SQRT(AVG(CAST(v * v AS DOUBLE))) AS rms
      FROM wavval GROUP BY doc_id
    ),
    -- BMP: BITMAPINFOHEADER fixed little-endian offsets; height is
    -- SIGNED (negative = top-down, irrelevant to the mean); rows pad
    -- to 4 bytes, excluded by in-row addressing
    bmph AS (
      SELECT doc_id, hx,
             CAST(length(hx) // 2 AS BIGINT) AS n_bytes,
             {_hxb(10)} + 256 * {_hxb(11)}
               + 65536 * {_hxb(12)} + 16777216 * {_hxb(13)} AS data_off,
             {_hxb(18)} + 256 * {_hxb(19)}
               + 65536 * {_hxb(20)} + 16777216 * {_hxb(21)} AS w,
             {_hxb(22)} + 256 * {_hxb(23)}
               + 65536 * {_hxb(24)} + 16777216 * {_hxb(25)} AS h_raw,
             ({_hxb(28)} + 256 * {_hxb(29)}) // 8 AS ch
      FROM payloads WHERE substr(hx, 1, 4) = '424d'
    ),
    bmpd AS (
      SELECT doc_id, hx, n_bytes, data_off, w, ch,
             CASE WHEN h_raw >= 2147483648
                  THEN 4294967296 - h_raw ELSE h_raw END AS h,
             ((8 * ch * w + 31) // 32) * 4 AS stride
      FROM bmph
    ),
    bmppix AS (
      SELECT doc_id, hx, data_off, w, ch, stride,
             unnest(range(0, w * ch * h)) AS k
      FROM bmpd
    ),
    bmpmean AS (
      SELECT doc_id,
             AVG({_hxb('data_off + (k // (w * ch)) * stride + (k % (w * ch))')})
               AS meanv
      FROM bmppix GROUP BY doc_id
    ),
    -- PNG (stored-deflate, filter-0 fixture layout): IHDR fields are
    -- big-endian at fixed offsets; the IDAT zlib stream is one stored
    -- block, so scanlines start at payload offset 48 (sig 8 + IHDR 25
    -- + IDAT len/type 8 + zlib hdr 2 + stored-block hdr 5) and row y
    -- carries 1 filter byte (0) + w*ch pixel bytes
    pngh AS (
      SELECT doc_id, hx,
             CAST(length(hx) // 2 AS BIGINT) AS n_bytes,
             16777216 * {_hxb(16)} + 65536 * {_hxb(17)}
               + 256 * {_hxb(18)} + {_hxb(19)} AS w,
             16777216 * {_hxb(20)} + 65536 * {_hxb(21)}
               + 256 * {_hxb(22)} + {_hxb(23)} AS h,
             {_hxb(24)} // 8 AS bps,                  -- sample bytes
             CASE WHEN {_hxb(25)} = 2 THEN 3 ELSE 1 END AS ch
      FROM payloads
      -- string-equality guards ONLY (the arm convention): substr on a
      -- truncated payload just fails to match, while a byte CAST in a
      -- WHERE aborts the whole query on '0x' || '' — and the matched
      -- guards (byte 43 in particular) guarantee the header bytes the
      -- SELECT casts read all exist
      WHERE substr(hx, 1, 16) = '89504e470d0a1a0a'
        AND substr(hx, 2 * 12 + 1, 8) = '49484452'        -- IHDR
        AND substr(hx, 2 * 24 + 1, 2) IN ('08', '10')     -- 8/16-bit
        AND substr(hx, 2 * 25 + 1, 2) IN ('00', '02')     -- gray/RGB
        AND substr(hx, 2 * 37 + 1, 8) = '49444154'        -- IDAT
        AND substr(hx, 2 * 43 + 1, 2) = '01'   -- final stored block
    ),
    -- per-image filter discipline: the fixture contract is ONE uniform
    -- filter type per image, detected from the per-scanline filter
    -- bytes; a mixed-filter or Average/Paeth payload matches no arm
    -- and surfaces as a visible row diff
    pngflt AS (
      SELECT doc_id, MIN(fb) AS fmin, MAX(fb) AS fmax
      FROM (SELECT doc_id,
                   {_hxb('48 + y * (1 + w * ch * bps)')} AS fb
            FROM (SELECT *, unnest(range(0, h)) AS y FROM pngh))
      GROUP BY doc_id
    ),
    pnguni AS (
      SELECT doc_id, fmin AS fu FROM pngflt
      WHERE fmin = fmax AND fmin IN (0, 1, 2)
    ),
    png0 AS (
      SELECT p.* FROM pngh p JOIN pnguni u USING (doc_id) WHERE u.fu = 0
    ),
    pngpix AS (
      SELECT doc_id, hx, w, ch, bps,
             48 + (k // (w * ch)) * (1 + w * ch * bps)
                + 1 + bps * (k % (w * ch)) AS soff
      FROM (SELECT *, unnest(range(0, w * h * ch)) AS k FROM png0)
    ),
    pngmean0 AS (
      -- 16-bit PNG samples are big-endian pairs; 8-bit is one byte
      SELECT doc_id,
             AVG(CASE WHEN bps = 2
                      THEN 256 * {_hxb('soff')} + {_hxb('soff + 1')}
                      ELSE {_hxb('soff')} END) AS meanv
      FROM pngpix GROUP BY doc_id
    ),
    -- Sub/Up reconstruction (8-bit arms): recon chains are modular
    -- prefix sums of the filtered bytes — per (row, lane-within-pixel)
    -- along x for Sub (recon[x] = raw[x] + recon[x-bpp], left pixel
    -- zero at the row start), per byte-column down y for Up
    -- (recon[y] = raw[y] + recon[y-1], prior row zero at the top) —
    -- so a SQL window SUM ... % 256 reproduces the engine's
    -- _unfilter_scanline exactly
    png12 AS (
      SELECT p.*, u.fu FROM pngh p JOIN pnguni u USING (doc_id)
      WHERE u.fu IN (1, 2) AND p.bps = 1
    ),
    pngrb AS (
      SELECT doc_id, fu, ch,
             k // (w * ch) AS y, k % (w * ch) AS x,
             {_hxb('48 + (k // (w * ch)) * (1 + w * ch) + 1 + (k % (w * ch))')} AS b
      FROM (SELECT *, unnest(range(0, w * h * ch)) AS k FROM png12)
    ),
    pngrec AS (
      SELECT doc_id,
             CASE WHEN fu = 1
                  THEN SUM(b) OVER (PARTITION BY doc_id, y, x % ch
                                    ORDER BY x) % 256
                  ELSE SUM(b) OVER (PARTITION BY doc_id, x
                                    ORDER BY y) % 256
             END AS v
      FROM pngrb
    ),
    pngmean12 AS (
      SELECT doc_id, AVG(v) AS meanv FROM pngrec GROUP BY doc_id
    ),
    pngmean AS (
      SELECT * FROM pngmean0 UNION ALL SELECT * FROM pngmean12
    ),
    -- palette PNGs (color type 3, fixture layout: PLTE directly after
    -- IHDR, so its length field is at offset 33 and its RGB triples
    -- at 41; the IDAT/stored-block offsets then shift by the palette
    -- length): each index byte maps to its three palette bytes at
    -- 41 + 3*idx — the engine's real PLTE expansion re-done as byte
    -- arithmetic. Guards stay string-equality; the computed-offset
    -- substr checks are safe on any length (no CAST aborts).
    pngph AS (
      SELECT doc_id, hx, n_bytes, w, h, plen FROM (
        SELECT doc_id, hx, CAST(length(hx) // 2 AS BIGINT) AS n_bytes,
               16777216 * {_hxb(16)} + 65536 * {_hxb(17)}
                 + 256 * {_hxb(18)} + {_hxb(19)} AS w,
               16777216 * {_hxb(20)} + 65536 * {_hxb(21)}
                 + 256 * {_hxb(22)} + {_hxb(23)} AS h,
               16777216 * {_hxb(33)} + 65536 * {_hxb(34)}
                 + 256 * {_hxb(35)} + {_hxb(36)} AS plen
        FROM payloads
        WHERE substr(hx, 1, 16) = '89504e470d0a1a0a'
          AND substr(hx, 2 * 12 + 1, 8) = '49484452'      -- IHDR
          AND substr(hx, 2 * 24 + 1, 2) = '08'            -- 8-bit
          AND substr(hx, 2 * 25 + 1, 2) = '03'            -- palette
          AND substr(hx, 2 * 37 + 1, 8) = '504c5445')     -- PLTE
      WHERE substr(hx, 2 * (49 + plen) + 1, 8) = '49444154'  -- IDAT
        AND substr(hx, 2 * (55 + plen) + 1, 2) = '01'  -- final stored
    ),
    pngpflt AS (
      -- filter-0 contract for the palette arm (a filtered palette
      -- payload would match no arm and surface as a row diff)
      SELECT doc_id FROM (
        SELECT doc_id, {_hxb('60 + plen + y * (1 + w)')} AS fb
        FROM (SELECT *, unnest(range(0, h)) AS y FROM pngph))
      GROUP BY doc_id HAVING MIN(fb) = 0 AND MAX(fb) = 0
    ),
    pngpmean AS (
      -- mean over the EXPANDED RGB raster = mean over the 3 palette
      -- bytes of every pixel's index, exactly the engine's
      -- raster.mean() after PLTE expansion
      SELECT doc_id, AVG(pb) AS meanv FROM (
        SELECT doc_id,
               unnest([{_hxb('41 + 3 * idx')},
                       {_hxb('42 + 3 * idx')},
                       {_hxb('43 + 3 * idx')}]) AS pb
        FROM (
          SELECT doc_id, hx, plen,
                 {_hxb('60 + plen + (k // w) * (1 + w) + 1 + (k % w)')}
                   AS idx
          FROM (SELECT *, unnest(range(0, w * h)) AS k
                FROM pngph JOIN pngpflt USING (doc_id))))
      GROUP BY doc_id
    ),
    -- TIFF (little-endian fixture): an ACTUAL IFD walk in SQL — the
    -- entry count and every 12-byte tag record are fixed-width LE
    -- integers, so unnest(range(n)) + CASE-per-tag recovers width /
    -- height / samples-per-pixel / compression / strip position, and
    -- the single uncompressed strip is raw chunky bytes from there
    tiffh AS (
      SELECT doc_id, hx,
             CAST(length(hx) // 2 AS BIGINT) AS n_bytes,
             {_hxb(4)} + 256 * {_hxb(5)} + 65536 * {_hxb(6)}
               + 16777216 * {_hxb(7)} AS ifd_off
      -- length guard: the SELECT casts read bytes 4-7, which a
      -- signature-only truncation would not carry
      FROM payloads
      WHERE substr(hx, 1, 8) = '49492a00' AND length(hx) >= 16
    ),
    tiffent AS (
      -- bounds-checked walk: a truncated IFD yields fewer (or zero)
      -- entry offsets instead of an out-of-range byte cast
      SELECT doc_id, hx, n_bytes,
             ifd_off + 2 + 12 * unnest(range(0,
               {_hxb('ifd_off')} + 256 * {_hxb('ifd_off + 1')})) AS eoff
      FROM tiffh WHERE ifd_off + 2 <= n_bytes
    ),
    tiffrec AS (
      SELECT doc_id, hx, n_bytes, typ, cnt,
             {_hxb('eoff')} + 256 * {_hxb('eoff + 1')} AS tag,
             CASE WHEN typ = 3
                  THEN {_hxb('eoff + 8')} + 256 * {_hxb('eoff + 9')}
                  ELSE {_hxb('eoff + 8')} + 256 * {_hxb('eoff + 9')}
                    + 65536 * {_hxb('eoff + 10')}
                    + 16777216 * {_hxb('eoff + 11')} END AS val
      FROM (
        SELECT doc_id, hx, n_bytes, eoff,
               {_hxb('eoff + 2')} + 256 * {_hxb('eoff + 3')} AS typ,
               {_hxb('eoff + 4')} + 256 * {_hxb('eoff + 5')}
                 + 65536 * {_hxb('eoff + 6')}
                 + 16777216 * {_hxb('eoff + 7')} AS cnt
        FROM tiffent WHERE eoff + 12 <= n_bytes
      )
    ),
    tifftags AS (
      SELECT doc_id, hx, n_bytes,
             MAX(CASE WHEN tag = 256 THEN val END) AS w,
             MAX(CASE WHEN tag = 257 THEN val END) AS h,
             COALESCE(MAX(CASE WHEN tag = 277 THEN val END), 1) AS ch,
             MAX(CASE WHEN tag = 259 THEN val END) AS comp,
             MAX(CASE WHEN tag = 273 AND cnt = 1 THEN val END) AS strip_off,
             MAX(CASE WHEN tag = 273 THEN cnt END) AS n_strips
      FROM tiffrec GROUP BY doc_id, hx, n_bytes
    ),
    tiffok AS (
      SELECT * FROM tifftags
      WHERE comp = 1 AND n_strips = 1 AND strip_off IS NOT NULL
        AND w IS NOT NULL AND h IS NOT NULL
        AND strip_off + w * h * ch <= n_bytes   -- strip fully present
    ),
    tiffpix AS (
      SELECT doc_id, hx, strip_off, unnest(range(0, w * h * ch)) AS k
      FROM tiffok
    ),
    tiffmean AS (
      SELECT doc_id, AVG({_hxb('strip_off + k')}) AS meanv
      FROM tiffpix GROUP BY doc_id
    ),
    neg AS (SELECT CAST(-1 AS BIGINT) AS na)
    SELECT i.doc_id,
           CASE WHEN i.ch = 3 THEN 'image/x-portable-pixmap'
                ELSE 'image/x-portable-graymap' END AS media_type,
           i.n_bytes,
           CAST(i.w AS BIGINT) AS width,
           CAST(i.h AS BIGINT) AS height,
           CAST(i.ch AS BIGINT) AS n_channels,
           CAST(ROUND(m.meanv * 1000000) AS BIGINT) AS mean_q6,
           na AS sample_rate, na AS n_samples, na AS duration_ms,
           na AS peak_i, na AS rms_q6
    FROM imgok i JOIN imgmean m USING (doc_id) CROSS JOIN neg
    UNION ALL
    SELECT w.doc_id, 'audio/wav', w.n_bytes, na, na,
           CAST(w.ch AS BIGINT),
           na,
           CAST(w.rate AS BIGINT),
           CAST(w.n AS BIGINT),
           CAST(ROUND(1000.0 * w.n / w.rate) AS BIGINT),
           CAST(a.peak AS BIGINT),
           CAST(ROUND(a.rms * 1000000) AS BIGINT)
    FROM wavn w JOIN wavagg a USING (doc_id) CROSS JOIN neg
    UNION ALL
    SELECT b.doc_id, 'image/bmp', b.n_bytes,
           CAST(b.w AS BIGINT), CAST(b.h AS BIGINT), CAST(b.ch AS BIGINT),
           CAST(ROUND(m.meanv * 1000000) AS BIGINT),
           na, na, na, na, na
    FROM bmpd b JOIN bmpmean m USING (doc_id) CROSS JOIN neg
    UNION ALL
    SELECT p.doc_id, 'image/png', p.n_bytes,
           CAST(p.w AS BIGINT), CAST(p.h AS BIGINT), CAST(p.ch AS BIGINT),
           CAST(ROUND(m.meanv * 1000000) AS BIGINT),
           na, na, na, na, na
    FROM pngh p JOIN pngmean m USING (doc_id) CROSS JOIN neg
    UNION ALL
    -- palette rows report the EXPANDED channel count (3: no tRNS in
    -- the fixture family), matching the engine's decode contract
    SELECT p.doc_id, 'image/png', p.n_bytes,
           CAST(p.w AS BIGINT), CAST(p.h AS BIGINT), CAST(3 AS BIGINT),
           CAST(ROUND(m.meanv * 1000000) AS BIGINT),
           na, na, na, na, na
    FROM pngph p JOIN pngpmean m USING (doc_id) CROSS JOIN neg
    UNION ALL
    SELECT t.doc_id, 'image/tiff', t.n_bytes,
           CAST(t.w AS BIGINT), CAST(t.h AS BIGINT), CAST(t.ch AS BIGINT),
           CAST(ROUND(m.meanv * 1000000) AS BIGINT),
           na, na, na, na, na
    FROM tiffok t JOIN tiffmean m USING (doc_id) CROSS JOIN neg
    UNION ALL
    SELECT doc_id, 'corrupt', n_bytes, na, na, na, na, na, na, na, na, na
    FROM imgh CROSS JOIN neg WHERE n_bytes < 11 + w * h * ch
    UNION ALL
    SELECT doc_id, 'unknown', CAST(length(hx) // 2 AS BIGINT),
           na, na, na, na, na, na, na, na, na
    FROM payloads CROSS JOIN neg
    WHERE substr(hx, 1, 4) NOT IN ('5035', '5036', '424d')
      AND substr(hx, 1, 16) != '89504e470d0a1a0a'
      AND substr(hx, 1, 8) != '49492a00'
      AND NOT (substr(hx, 1, 8) = '52494646'
               AND substr(hx, 17, 8) = '57415645')
"""


@_register(
    "x103_media_decode",
    "REAL media decode oracle-gated end-to-end: hex-literal fixture "
    "payloads decoded by the engine's native netpbm / 24+32-bit BMP / "
    "8+16+24-bit PCM WAV / PNG / TIFF kernels inside the "
    "media_features Arrow mapInPandas pass vs a DuckDB twin that "
    "re-parses the same bytes with pure byte arithmetic. The PNG rows "
    "use stored-deflate (zlib level 0) payloads so the REAL inflate + "
    "scanline-unfilter decode runs on Spark while the oracle reaches "
    "the filtered bytes at fixed offsets — filter-0 rows read "
    "directly, Sub/Up-filtered rows reconstruct as modular prefix-sum "
    "windows (per-lane along the row / down the byte column), and "
    "palette rows map each index byte to its PLTE triples; the "
    "TIFF rows are single-strip little-endian baseline files whose "
    "IFD the oracle ACTUALLY walks (unnest over the entry records). "
    "Compressed-Huffman and Average/Paeth PNGs (left-pixel recurrence "
    "is not a window over filtered bytes), big-endian or multi-strip "
    "TIFFs remain property-tested. Unknown/truncated payloads "
    "exercise the degrade-per-row path",
    _MEDIA_ORACLE,
    tags=("multimodal", "udf", "extension"),
)
def x103(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The fixture is a bounded literal list (36 tiny payloads), not
    # data: at corpus scale the payload column comes off parquet and
    # feeds the same media_features pass (x15's plumbing).
    rows = [
        (did, bytes.fromhex(hx)) for did, hx in M.media_fixture_payloads()
    ]
    # Width note (r14): the r13 scaling block flagged this row as
    # anti-scaling (faster at 8 cores than 32), suggesting the 32
    # ~1-row tasks were overhead. Measured otherwise: the 36 payloads
    # cost ~4.3 s of REAL single-thread decode CPU (pure-Python
    # inflate/unfilter/IFD walks), so coalesce(1) ran 6x SLOWER and
    # the per-payload task fan-out is genuine parallelism, not
    # scheduler waste. Default createDataFrame slicing stands.
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    feats = M.media_features(df)
    neg = F.lit(-1).cast("long")

    def q6(col: str) -> F.Column:
        return F.round(F.col(col) * 1000000).cast("long")

    return feats.select(
        "doc_id",
        "media_type",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        F.coalesce(F.col("width").cast("long"), neg).alias("width"),
        F.coalesce(F.col("height").cast("long"), neg).alias("height"),
        F.coalesce(F.col("n_channels").cast("long"), neg).alias("n_channels"),
        F.coalesce(q6("mean_value"), neg).alias("mean_q6"),
        F.coalesce(F.col("sample_rate").cast("long"), neg).alias("sample_rate"),
        F.coalesce(F.col("n_samples").cast("long"), neg).alias("n_samples"),
        F.coalesce(F.col("duration_ms").cast("long"), neg).alias("duration_ms"),
        F.coalesce(F.col("peak").cast("long"), neg).alias("peak_i"),
        F.coalesce(q6("rms"), neg).alias("rms_q6"),
    )
