"""Training-data curation, end to end, on this engine.

The LLM-pipeline counterpart to ``end_to_end.py``: the full document
curation flow a 100 TB pre-training run needs, built from the engine's
oracle-gated operators and run as a handful of fused Catalyst plans:

0. pre-flight     — column profile, source-overlap matrix, PSI drift,
                    robust length outliers: is this corpus fit to curate?
1. signal pass    — quality score, language ID, repetition signals
                    (one projection chain, no shuffle)
2. filter pass    — drop low-quality / boilerplate / off-language docs
3. dedup pass     — exact fingerprint collapse, then MinHash-LSH near-dup
                    candidates → connected components → keep cluster reps
4. assignment     — leak-proof train/val/test split + per-language
                    stratified sample for eval sets
5. packing        — 512-token training sequences per source
6. accounting     — per-source rollup a curator reviews before a run

Run: ``python examples/curation_pipeline.py [sf_dir]`` (default sf0.001).

Every step is deterministic (md5-derived hashes, no rand()): re-running
on retried/re-partitioned data reproduces byte-identical curation
decisions — the property that makes a 100 TB pipeline debuggable.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from twitter_kafka_etl_spark.io import read_table
from twitter_kafka_etl_spark.operators import curation as C
from twitter_kafka_etl_spark.operators import dedup as D
from twitter_kafka_etl_spark.operators import similarity as S
from twitter_kafka_etl_spark.operators import text as T
from twitter_kafka_etl_spark.session import get_spark


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("tkes-curation")
    spark.sparkContext.setLogLevel("ERROR")
    docs = read_table(spark, sf_dir, "documents")

    # 0 — pre-flight audits, BEFORE any curation decision:
    #     null explosions / cardinality collapses per column,
    from twitter_kafka_etl_spark.operators.relational import profile_table

    profile_table(
        docs, columns=("doc_id", "text", "lang", "source", "n_chars")
    ).show()
    #     re-crawled source pairs (mixing them double-counts content),
    overlap = D.source_overlap(docs).filter(F.col("jaccard") >= 0.5)
    print(f"pre-flight: {overlap.count()} source pairs share >=50% shingles")
    #     the doc-granular form of the same question — N specific
    #     near-copy documents ACROSS two feeds (re-sold crawls; leak
    #     risk for any source-keyed split)
    leak = D.cross_source_pairs(docs).filter(
        F.col("source_a") != F.col("source_b")
    )
    print(f"pre-flight: {leak.count()} source pairs with cross-feed near-dups")
    #     and each source's distributional distance from the blend it
    #     is about to join (high-KL outliers are wrong-language or
    #     boilerplate-heavy feeds)
    print("pre-flight: most-divergent sources (KL vs corpus):")
    T.source_token_kl(docs).orderBy(F.desc("kl_nats")).show(3)
    #     corpus-shape drift between the two acquisition cohorts,
    cohort = F.when(
        F.expr("CAST(substring(source, 4) AS INT)") < 10, "base"
    ).otherwise("cand")
    psi = C.psi_drift(docs, cohort).agg(F.sum("psi_term")).first()[0]
    print(f"pre-flight: cohort PSI = {psi:.4f} (<0.1 stable, >0.25 shifted)")
    #     and length anomalies no mean/stddev screen survives
    n_out = (
        C.robust_outliers(docs).filter(F.col("is_outlier")).count()
    )
    print(f"pre-flight: {n_out} robust length outliers (median/MAD)")
    #     the declared-vs-recomputed ingest check: declared n_chars must
    #     correlate ~1 with recomputed token counts, and a |r|~1 feature
    #     pair is one gate signal about to be counted twice
    print("pre-flight: curation-feature correlations:")
    C.feature_correlation(docs).show()
    #     per-source stylometry: tiny TTR = template/listing farm; a
    #     mean-word-length outlier is tokenizer-hostile content
    print("pre-flight: lowest type-token-ratio sources:")
    T.source_stylometry(docs).orderBy("ttr").show(3)
    #     multimodal triage: opaque binary payloads classified in ONE
    #     Arrow pass (netpbm/PNG/WAV decode natively; codec formats and
    #     corrupt payloads degrade per-row, never failing the job) —
    #     run before committing decode budget to a mixed-media crawl
    from twitter_kafka_etl_spark.operators import multimodal as M

    media = M.media_features(M.attach_binary(docs.limit(500)))
    media.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_bytes").alias("bytes"),
    ).show()

    # 1 — doc-level signals (parallel branches, joined on doc_id)
    signals = (
        T.quality_features(docs)
        .select("doc_id", "text", "lang", "source", "quality_score")
        .join(T.lang_id(docs).select("doc_id", "pred_lang"), "doc_id")
        .join(T.repetition_signals(docs).select("doc_id", "dup_frac"), "doc_id")
        .join(T.unigram_nll(docs).select("doc_id", "avg_neg_logp"), "doc_id")
    )

    # 2 — keep: decent quality, known language, not boilerplate, and
    #     LM-probable (the CCNet-style perplexity cut)
    kept = signals.filter(
        (F.col("quality_score") >= 0.4)
        & (F.col("pred_lang") != "und")
        & (F.col("dup_frac") <= 0.5)
        & (F.col("avg_neg_logp") <= 8.0)
    )
    print(f"filter pass: {docs.count()} -> {kept.count()} docs")

    # 2b — rule-gate accounting: the composed Gopher/C4 verdict with
    #      per-rule drop reasons (what a curator tunes thresholds from)
    gate = C.quality_gate(docs)
    gate.agg(
        F.count(F.lit(1)).alias("docs"),
        *[
            F.sum(1 - F.col(c)).alias(f"drop_{c[5:]}")
            for c in gate.columns
            if c.startswith("pass_")
        ],
        F.sum("keep").alias("kept"),
    ).show()

    # 2c — sub-document scrub: drop 16-token spans already seen earlier
    #      in the corpus (boilerplate whole-doc dedup can't catch)
    scrubbed = T.remove_duplicated_spans(kept)
    removed = scrubbed.agg(F.sum("n_removed")).first()[0]
    kept = (
        kept.drop("text")
        .join(
            scrubbed.filter(F.length("cleaned") > 0).select(
                "doc_id", F.col("cleaned").alias("text")
            ),
            "doc_id",
        )
    )
    print(f"span scrub: {removed} duplicated 16-token blocks removed")

    # 3 — dedup: exact collapse, then near-dup clusters -> representatives
    keepers = D.exact_duplicates(kept).select(
        F.col("keeper_id").alias("doc_id")
    )
    uniq = kept.join(keepers, "doc_id")
    pairs = D.minhash_lsh_pairs(D.minhash_signatures(D.shingle(uniq)))
    comps = D.connected_components(pairs, nodes=uniq)
    # keep each cluster's BEST-quality member (not the arbitrary min id)
    keep = (
        C.select_keepers(uniq.select("doc_id", "quality_score"), comps)
        .filter(F.col("keep"))
        .select("doc_id")
    )
    deduped = uniq.join(keep, "doc_id")
    print(f"dedup pass: {uniq.count()} unique -> {deduped.count()} cluster keepers")

    # 3a — the asymmetric screen Jaccard misses: small docs embedded
    #      verbatim in big ones (quotes, boilerplate inclusion)
    quotes = D.containment_pairs(deduped, threshold=0.8).filter(
        F.col("jaccard") < 0.2
    )
    print(f"containment pass: {quotes.count()} quote-inclusion pairs flagged")

    # 3a-bis — sizing the pass WITHOUT materializing member pairs: the
    #      collapsed form (expand=False) keeps one row per
    #      representative pair with group sizes, so total pair mass is
    #      integer arithmetic over a near-linear table — on a 100 TB
    #      duplicate-heavy corpus the expanded pair set is quadratic in
    #      the duplication factor and must never be built just to count
    # pin the signature table: the collapsed pairs AND the membership
    # below both consume it, and unpinned each would re-run the whole
    # shingle+minhash subtree (eager=False — materialized on first use)
    csigs = D.corpus_signatures(kept).localCheckpoint(eager=False)
    coll = D.minhash_lsh_pairs(csigs, expand=False)
    mass = coll.agg(
        F.sum(
            F.when(
                F.col("rep_a") == F.col("rep_b"),
                F.expr("c_a * (c_a - 1) DIV 2"),
            ).otherwise(F.col("c_a") * F.col("c_b"))
        ).alias("pair_mass")
    ).first()[0]
    print(
        f"collapsed pair audit: {coll.count()} rep rows stand for "
        f"{mass or 0} member pairs"
    )

    # 3a-ter — the DECISION from the collapsed table directly: cluster
    #      the representative graph, let members inherit their rep's
    #      component through the membership join, then apply the same
    #      best-quality keeper rule — the full dedup decision with no
    #      member pair ever materialized (set-identical to the expanded
    #      path; asserted in tests/test_extensions.py)
    cmem = D.minhash_signature_groups(csigs)
    ccomps = D.collapsed_components(coll, cmem)
    ckeep = C.select_keepers(
        kept.select("doc_id", "quality_score"), ccomps
    ).filter(F.col("keep"))
    print(
        f"collapsed-path decision: {ckeep.count()} keepers chosen "
        "without expanding member pairs"
    )

    # 3a' — how much chunk-level duplication survives document-level
    #       dedup (the substring-dedup signal, 8-token segments), plus
    #       the guarantee-backed winnowing matcher for shared runs
    seg = D.segment_dedup_stats(deduped).agg(
        (F.sum("n_dup_segments") / F.sum("n_segments")).alias("dup_frac")
    ).first()
    print(f"segment audit: {seg.dup_frac:.3f} of segments still duplicated")
    runs = T.winnow_match_pairs(deduped, min_shared=2)
    print(f"winnow audit: {runs.count()} doc pairs share >=2 fingerprints")

    # 3a'' — what the dedup decision DID: cluster size distribution and
    #        the exact transitive yield loss (x84's curve estimates it;
    #        this counts it)
    print("cluster profile (size, clusters, docs removed):")
    D.cluster_size_profile(comps).orderBy("cluster_size").show(5)

    # 3a''' — method calibration and budget sizing for the pass itself:
    #         which pairs each cheap detector finds (the exact-without-
    #         minhash cell is LSH's sub-shingle blind spot), how the
    #         duplicate fraction grows with corpus size (what a 100 TB
    #         pass will actually face, extrapolated from prefixes), and
    #         which sources the pass taxes — including mass silently
    #         reassigned to OTHER sources' keepers
    print("dedup method agreement (exact / minhash / simhash):")
    D.dedup_method_agreement(docs).orderBy(
        "in_exact", "in_minhash", "in_simhash"
    ).show()
    print("duplicate-fraction growth over nested samples:")
    D.dup_growth_curve(docs).orderBy("pct").show()
    print("per-source dedup yield loss (mixture impact):")
    D.dedup_source_yield(docs).orderBy(F.desc("removed_frac")).show(3)

    # 3b — embedding-space curation (the semantic layer textual dedup
    #      can't see): SemDeDup near-dup pruning inside IVF cells, then
    #      prototypicality pruning against each cell's mean
    emb = read_table(spark, sf_dir, "embeddings")
    sem_drops = S.semantic_dedup(emb, threshold=0.35)
    proto = S.prototype_scores(emb, keep_frac=0.8)
    n_emb = emb.count()
    print(
        f"semantic pass: {sem_drops.count()} embedding near-dups dropped, "
        f"{proto.filter(F.col('keep') == 1).count()}/{n_emb} kept as "
        "prototypical"
    )
    #      labels with margin <= 0 overlap a neighbor more than they
    #      cohere — don't stratify or classifier-filter on them
    print("embedding class separation (cohesion vs nearest centroid):")
    S.embedding_separation(emb).orderBy("margin").show(3)

    # 3c — importance selection: steer the mix toward the target domain
    #      (DSIR log-likelihood ratio of hashed unigrams vs src0)
    selected = C.dsir_weights(deduped, target_source="src0", top_k=50)
    print("dsir selection: top sources in the selected set:")
    selected.groupBy("source").count().orderBy(F.desc("count")).show(5)

    # 4 — splits + a balanced eval sample + a review queue where longer
    #     docs are proportionally likelier (A-ES weighted sampling —
    #     deterministic, so the queue survives retries and re-runs)
    assigned = C.split_assign(deduped, "doc_id")
    eval_sample = C.stratified_sample(
        assigned.filter(F.col("split") == "val"), ["lang"], 5, "doc_id"
    )
    print("eval sample per lang:")
    eval_sample.groupBy("lang").count().orderBy("lang").show()
    review = C.weighted_sample(
        deduped.withColumn("n_chars", F.length("text")), "n_chars", k=2
    )
    print(f"review queue: {review.count()} docs (2 per source, length-weighted)")

    # 5 — mix the sources at configured rates (the training-mix recipe),
    #     then pack into 512-token sequences per source. The
    #     temperature table is where those rates COME from: share^0.7
    #     up/down-sampling with the boost column as the per-source
    #     epoch multiplier a curator sanity-checks first
    train = assigned.filter(F.col("split") == "train").withColumn(
        "tok", F.size(F.split("text", " ")).cast("bigint")
    )
    print("temperature mixture plan (alpha=0.7):")
    C.mixture_temperature(train).orderBy(F.desc("n_tokens")).show(5)
    mixed = C.mixture_sample(
        train, "source", "doc_id", {"src0": 100, "src1": 50}, default_pct=25
    )
    print(f"mixture pass: {train.count()} -> {mixed.count()} docs")
    packed = C.pack_sequences(mixed, "tok", 512, ["source"], ["doc_id"])
    n_seqs = packed.select("source", "seq_id").distinct().count()
    print(f"packed into {n_seqs} training sequences")

    # 5b — batch-shape accounting: how much compute the bucket config
    #      burns on padding (informs the packing/bucketing tradeoff)
    C.length_bucket_stats(mixed, "text", (64, 128, 256, 512)).orderBy(
        "bucket"
    ).show()

    # 6 — what a curator reviews before launching the run, including
    #     the acquisition stopping-rule signal: what fraction of the
    #     corpus's shingles were novel when first crawled
    nov = D.shingle_novelty(docs).agg(
        (F.sum("n_novel") / F.sum("n_sh")).alias("novel_frac")
    ).first()
    print(f"novelty: {nov.novel_frac:.3f} of shingle mass was first-seen")
    #     and the strongest collocations — templated phrases read as
    #     impossibly strong associations; a healthy corpus's top PMI
    #     list is entities and idioms
    print("top collocations (PMI, min-count 5):")
    T.pmi_top_bigrams(train, min_count=5, k=3).show(truncate=False)
    rollup = (
        train.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok").alias("tokens"),
            F.round(F.avg("quality_score"), 4).alias("avg_q"),
        )
        .orderBy(F.desc("tokens"))
    )
    rollup.show(5)
    # no spark.stop(): get_spark reuses any active session, so stopping
    # here would kill a caller's session (e.g. the pytest smoke test);
    # the interpreter exit handles the standalone-script case


if __name__ == "__main__":
    main(*sys.argv[1:])
