"""Multimodal column handling: opaque binary payloads + typed metadata.

The engine treats image/audio/video as ``binary`` columns with a typed
metadata struct, processed by Arrow-batched ``mapInPandas`` — the decode
kernels are pluggable. Decoding is REAL for the uncompressed formats the
standard library + numpy can parse — PCM WAV (stdlib ``wave``) and
netpbm P5/P6 images — and a declared plug-point
(``NotImplementedError``) for codec-bound formats (PNG/JPEG/MP3/video
containers), which need an external backend this container doesn't
ship. The Spark-side plumbing — schema, batch iteration, partition
preservation — is identical either way and tested end-to-end with both
the real decoders and the deterministic fake.

At 100 TB: binary payloads dominate row size, so operators here always
project metadata-only before shuffles and keep payload access inside a
single mapInPandas pass (no payload ever enters a join or groupBy key).
"""

from __future__ import annotations

import io
import wave
from collections.abc import Iterator

import numpy as np
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


def decode_netpbm(payload: bytes) -> dict:
    """Real netpbm decode (binary PGM ``P5`` / PPM ``P6``) — pure
    header parse + one numpy view, no imaging library. Returns width,
    height, channel count, and the mean pixel value (the cheap
    brightness/degenerate-image QA signal)."""
    if payload[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm payload")
    n_channels = 3 if payload[:2] == b"P6" else 1
    # header tokens: magic, width, height, maxval — whitespace-separated
    # with '#' comments; the raster starts after the single whitespace
    # byte following maxval
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(int(payload[i:j]))
        i = j
    i += 1  # the single whitespace byte before the raster
    width, height, maxval = tokens
    dtype = np.dtype(">u2") if maxval > 255 else np.dtype(np.uint8)
    n_vals = width * height * n_channels
    raster = np.frombuffer(
        payload, dtype=dtype, count=n_vals, offset=i
    ).reshape(height, width, n_channels)
    return {
        "media": "image/x-portable-pixmap" if n_channels == 3 else "image/x-portable-graymap",
        "width": width,
        "height": height,
        "n_channels": n_channels,
        "mean_value": float(raster.mean()) if n_vals else 0.0,
    }


def decode_wav(payload: bytes) -> dict:
    """Real PCM WAV decode — stdlib ``wave`` reader + one numpy view.
    Returns channel/rate/duration metadata plus peak and RMS amplitude
    (the cheap silence/clipping QA signals)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        n_channels = w.getnchannels()
        width = w.getsampwidth()
        rate = w.getframerate()
        n_frames = w.getnframes()
        raw = w.readframes(n_frames)
    dtype = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}.get(width)
    if dtype is None:
        raise NotImplementedError(
            f"{8 * width}-bit PCM needs a real audio backend"
        )
    x = np.frombuffer(raw, dtype=dtype).astype(np.float64)
    if width == 1:  # 8-bit WAV is unsigned, centered at 128
        x = x - 128.0
    return {
        "media": "audio/wav",
        "n_channels": n_channels,
        "sample_rate": rate,
        "n_samples": n_frames,
        "duration_ms": int(round(1000.0 * n_frames / rate)) if rate else 0,
        "peak": float(np.max(np.abs(x))) if x.size else 0.0,
        "rms": float(np.sqrt(np.mean(x * x))) if x.size else 0.0,
    }


def decode_image(payload: bytes) -> dict:
    """Image decode: REAL for uncompressed netpbm (P5/P6); codec-bound
    formats (PNG/JPEG/WebP/...) are the declared plug-point — swap in an
    imaging backend here, the mapInPandas plumbing is already wired."""
    if payload[:2] in (b"P5", b"P6"):
        return decode_netpbm(payload)
    raise NotImplementedError(
        "compressed image formats need an imaging backend (e.g. Pillow); "
        "netpbm (P5/P6) decodes natively — plug a codec in here"
    )


def decode_audio(payload: bytes) -> dict:
    """Audio decode: REAL for PCM WAV (RIFF/WAVE); codec-bound formats
    (MP3/OGG/FLAC/...) are the declared plug-point — same contract as
    decode_image."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    raise NotImplementedError(
        "compressed audio formats need an audio backend (e.g. soundfile); "
        "PCM WAV decodes natively — plug a codec in here"
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


#: unified output schema of the real-decoder media pass: image fields
#: null for audio rows and vice versa; unknown/codec formats degrade to
#: byte-level features with media_type 'unknown' rather than failing a
#: corpus-scale job on one bad payload
MEDIA_FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, "
    "width int, height int, n_channels int, mean_value double, "
    "sample_rate int, n_samples bigint, duration_ms bigint, "
    "peak double, rms double"
)

_MEDIA_NULLS = {
    "width": None, "height": None, "n_channels": None, "mean_value": None,
    "sample_rate": None, "n_samples": None, "duration_ms": None,
    "peak": None, "rms": None,
}


def media_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL multimodal feature extraction in one Arrow-batched
    mapInPandas pass: netpbm images and PCM WAV audio decode natively
    (dimensions / mean pixel value; rate / duration / peak / RMS);
    payloads neither can parse emit byte-level features under
    media_type 'unknown' — a 100 TB pass must degrade per-row, never
    die on one corrupt file. Output is metadata-only; the payload
    never crosses a shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                p = bytes(p) if p is not None else b""
                row = {"doc_id": int(did), "n_bytes": len(p), **_MEDIA_NULLS}
                try:
                    if p[:2] in (b"P5", b"P6"):
                        d = decode_netpbm(p)
                        row.update(
                            media_type=d["media"], width=d["width"],
                            height=d["height"], n_channels=d["n_channels"],
                            mean_value=d["mean_value"],
                        )
                    elif p[:4] == b"RIFF" and p[8:12] == b"WAVE":
                        d = decode_wav(p)
                        row.update(
                            media_type=d["media"], n_channels=d["n_channels"],
                            sample_rate=d["sample_rate"],
                            n_samples=d["n_samples"],
                            duration_ms=d["duration_ms"],
                            peak=d["peak"], rms=d["rms"],
                        )
                    else:
                        row["media_type"] = "unknown"
                except Exception:  # noqa: BLE001 — degrade, never die
                    row["media_type"] = "corrupt"
                rows.append(row)
            cols = [
                "doc_id", "media_type", "n_bytes", "width", "height",
                "n_channels", "mean_value", "sample_rate", "n_samples",
                "duration_ms", "peak", "rms",
            ]
            # explicit column order + pandas nullable dtypes: Arrow must
            # see real nulls (not NaN-in-float) for the int fields
            out = pd.DataFrame(rows, columns=cols).astype(
                {
                    "doc_id": "int64", "n_bytes": "int64",
                    "width": "Int32", "height": "Int32",
                    "n_channels": "Int32", "mean_value": "Float64",
                    "sample_rate": "Int32", "n_samples": "Int64",
                    "duration_ms": "Int64", "peak": "Float64",
                    "rms": "Float64",
                }
            )
            yield out

    return df.mapInPandas(run, schema=MEDIA_FEATURE_SCHEMA)


def resize_netpbm(payload: bytes, factor: int = 2) -> bytes:
    """REAL image resize for netpbm payloads: nearest-neighbor
    subsampling by ``factor`` on the decoded raster, re-emitted as the
    same binary format. Runs per payload inside the resize_payload-style
    mapInPandas pass — no imaging library needed."""
    meta = decode_netpbm(payload)
    n_channels, w, h = meta["n_channels"], meta["width"], meta["height"]
    # re-locate the raster offset exactly as decode_netpbm does
    tokens, i = [], 2
    while len(tokens) < 3:
        while payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(int(payload[i:j]))
        i = j
    i += 1
    maxval = tokens[2]
    dtype = np.dtype(">u2") if maxval > 255 else np.dtype(np.uint8)
    raster = np.frombuffer(
        payload, dtype=dtype, count=w * h * n_channels, offset=i
    ).reshape(h, w, n_channels)
    small = raster[::factor, ::factor, :]
    header = (
        (b"P6" if n_channels == 3 else b"P5")
        + b"\n%d %d\n%d\n" % (small.shape[1], small.shape[0], maxval)
    )
    return header + small.tobytes()


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
