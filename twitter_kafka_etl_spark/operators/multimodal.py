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


#: output schema of the frame-sampling pass (one row per sampled frame)
FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_bytes int"


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_size: int = 16,
    step: int = 4,
) -> DataFrame:
    """Video-style frame sampling over a binary payload: the payload is
    framed into ``frame_size``-byte chunks and every ``step``-th frame is
    emitted (one output row per sampled frame, metadata only).

    A real video backend would decode containers and sample keyframes;
    the framing/fan-out plumbing — Arrow batches in, exploded
    metadata-only rows out, payload never shuffled — is exactly what the
    real decoder plugs into.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            sizes: list[int] = []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                n = len(p)
                n_frames = (n + frame_size - 1) // frame_size
                for i in range(0, n_frames, step):
                    ids.append(int(did))
                    idxs.append(i)
                    sizes.append(min(frame_size, n - i * frame_size))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_bytes": sizes}
            )

    return df.mapInPandas(run, schema=FRAME_SCHEMA)


def resize_payload(
    df: DataFrame,
    payload_col: str = "payload",
    out: str = "payload_small",
    factor: int = 2,
) -> DataFrame:
    """Byte-stride downsample of the payload (every ``factor``-th byte) —
    the stand-in for image resize; swap the slice for a real resampling
    kernel. Stays a single mapInPandas projection (payload in, smaller
    payload out, no shuffle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out] = [bytes(p[::factor]) for p in pdf[payload_col]]
            yield pdf

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.mapInPandas(run, schema=f"{fields}, {out} binary")
