"""U1/U2 model-backend contract: make_classifier is the seam where a
real model replaces the deterministic lexicon (consumer.scala:85,125-155
— the reference hardwires Spark-NLP annotators; the engine takes any
batch function over Arrow batches).

Two layers:
- an always-on test drives the seam with a stateful model OBJECT
  (load-once-per-worker closure, batched predict) — the exact lifecycle
  a HF pipeline has, minus the heavyweight dependency;
- an opt-in test loads a real transformers checkpoint through the same
  seam, skipped wherever the dependency stack is absent (this sandbox).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from twitter_kafka_etl_spark.io import read_table
from twitter_kafka_etl_spark.operators.text import make_classifier


def test_make_classifier_runs_a_stateful_batched_model(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").limit(200)

    def backend(texts):
        # Stand-in with the lifecycle of a real checkpoint: construction
        # is 'model load' (must happen once per task, not per row),
        # inference is vectorized over the whole Arrow batch. Defined
        # inside the backend so cloudpickle ships it by value — test
        # modules aren't importable on executors, same as a notebook.
        class _BatchModel:
            def predict_batch(self, texts):
                return (
                    texts.str.len()
                    .mod(3)
                    .map({0: "neutral", 1: "positive", 2: "negative"})
                )

        # load-once-per-worker: the model lives in the closure, built on
        # first batch, reused for subsequent batches of the same task
        if not hasattr(backend, "_model"):
            backend._model = _BatchModel()
        return backend._model.predict_batch(texts)

    label = make_classifier(backend)
    out = docs.select("doc_id", label(F.col("text")).alias("label"))
    rows = out.collect()
    assert len(rows) == 200
    assert set(r.label for r in rows) <= {"neutral", "positive", "negative"}
    # plan shape: the UDF evaluates as ArrowEvalPython (batched), not
    # row-at-a-time BatchEvalPython
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_make_classifier_with_real_hf_checkpoint(spark, sf_dir):
    """Opt-in: proves the pandas_udf backend contract with a real model.
    Needs transformers+torch and a locally cached checkpoint — skipped
    in dependency-less sandboxes."""
    transformers = pytest.importorskip("transformers")
    pytest.importorskip("torch")
    try:
        clf = transformers.pipeline(
            "sentiment-analysis",
            model="distilbert-base-uncased-finetuned-sst-2-english",
        )
    except Exception as e:  # noqa: BLE001 — no network / no cache
        pytest.skip(f"checkpoint unavailable offline: {e}")

    def backend(texts):
        import pandas as pd

        preds = clf(list(texts), truncation=True)
        return pd.Series([p["label"].lower() for p in preds], index=texts.index)

    label = make_classifier(backend)
    docs = read_table(spark, sf_dir, "documents").limit(20)
    rows = docs.select(label(F.col("text")).alias("label")).collect()
    assert len(rows) == 20
    assert set(r.label for r in rows) <= {"positive", "negative"}


def test_make_classifier_with_real_weight_artifact(spark, sf_dir, tmp_path):
    """Weights ACTUALLY flow through the seam in this sandbox: train a
    hashed-BoW softmax classifier, persist it as an .npz artifact, load
    it once-per-worker inside the backend closure, and classify the
    documents table — the full checkpoint lifecycle (train → artifact →
    executor load → batched inference) with no torch dependency."""
    from twitter_kafka_etl_spark.operators.model_artifact import (
        linear_model_backend,
        save_artifact,
        train_linear_classifier,
    )

    # tiny labeled corpus with a real signal (sentiment-ish lexicon)
    pos = ["great fantastic love it", "wonderful amazing day", "best happy joy"]
    neg = ["terrible awful hate it", "worst horrible day", "sad bad angry"]
    texts = pos * 10 + neg * 10
    labels = ["positive"] * 30 + ["negative"] * 30
    weights = train_linear_classifier(texts, labels)
    art = str(tmp_path / "sentiment.npz")
    save_artifact(weights, art)

    label = make_classifier(linear_model_backend(art))
    docs = read_table(spark, sf_dir, "documents").limit(100)
    out = docs.select("doc_id", label(F.col("text")).alias("label"))
    rows = out.collect()
    assert len(rows) == 100
    assert set(r.label for r in rows) <= {"positive", "negative"}
    # the artifact really learned: executor-side inference over the
    # training texts reproduces the labels (not chance)
    train_df = spark.createDataFrame(
        [(t, l) for t, l in zip(texts, labels)], "text string, want string"
    )
    hits = (
        train_df.select(
            (label(F.col("text")) == F.col("want")).cast("int").alias("ok")
        )
        .agg(F.sum("ok"))
        .first()[0]
    )
    assert hits == len(texts)
    # plan shape: Arrow-batched, never row-at-a-time
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan
