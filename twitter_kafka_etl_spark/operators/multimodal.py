"""Multimodal column handling: opaque binary payloads + typed metadata.

The engine treats image/audio/video as ``binary`` columns with a typed
metadata struct, processed by Arrow-batched ``mapInPandas`` — the decode
kernels are pluggable. This container has no image/audio libraries, so
the real decoders are explicit stubs (``NotImplementedError``); the
Spark-side plumbing — schema, batch iteration, partition preservation —
is real and tested with the deterministic fake decoder.

At 100 TB: binary payloads dominate row size, so operators here always
project metadata-only before shuffles and keep payload access inside a
single mapInPandas pass (no payload ever enters a join or groupBy key).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: output schema of the metadata/feature extraction pass
MM_FEATURE_SCHEMA = "doc_id bigint, n_bytes bigint, first_byte int, media_type string"


def attach_binary(df: DataFrame, text_col: str = "text", out: str = "payload") -> DataFrame:
    """Materialize an opaque binary payload column (here: UTF-8 bytes of
    the text — the stand-in for image/audio bytes) plus media metadata."""
    return df.withColumn(out, F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_type", F.lit("application/octet-stream")
    )


def decode_image(payload: bytes) -> object:
    """Real image decode — requires an imaging library not present in this
    container. The plumbing around it (extract_features) is real."""
    raise NotImplementedError(
        "image decoding requires an imaging backend (e.g. Pillow); "
        "plug one in here — the mapInPandas plumbing is already wired"
    )


def decode_audio(payload: bytes) -> object:
    """Real audio decode/frame-sample — same stub contract as decode_image."""
    raise NotImplementedError(
        "audio decoding requires an audio backend (e.g. soundfile); "
        "plug one in here — the mapInPandas plumbing is already wired"
    )


def fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in decoder: byte-level features only.
    Lets the batch shape / schema / partitioning be tested end-to-end."""
    return {
        "n_bytes": len(payload),
        "first_byte": payload[0] if payload else -1,
    }


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decoder=fake_decode,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas: each Arrow batch arrives as a pandas DataFrame; the
    decoder runs per payload; output is metadata-only (payload dropped
    before any downstream shuffle).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decoder(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [d["n_bytes"] for d in decoded],
                    "first_byte": [d["first_byte"] for d in decoded],
                    "media_type": pdf["media_type"],
                }
            )

    return df.mapInPandas(run, schema=MM_FEATURE_SCHEMA)
