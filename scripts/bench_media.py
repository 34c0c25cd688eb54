#!/usr/bin/env python
"""Reproducible PNG-decode throughput benchmark (the SURVEY §6 media
figures). Synthesizes 1024x1024 RGB frames, forward-filters them with
each PNG filter discipline, deflates, and times the REAL decode kernel
(multimodal.decode_png_raster — zlib inflate + unfiltering), verifying
bit-exact reconstruction each time. Prints one JSON line.

Run: python scripts/bench_media.py [size]
"""

from __future__ import annotations

import json
import os
import struct
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from twitter_kafka_etl_spark.operators import multimodal as M


def encode_png(raster: np.ndarray, ftypes) -> bytes:
    """Forward-filter per row with the given filter types and deflate
    (level 1) — a test-side encoder, independent of the fixture
    writers, so the decode path is exercised against bytes the engine
    never produced."""
    h, w, ch = raster.shape
    bpp = ch
    r = raster.astype(np.int64).reshape(h, w * ch)
    z0 = np.zeros(bpp, dtype=np.int64)
    lines = []
    prev = np.zeros(w * ch, dtype=np.int64)
    for y in range(h):
        cur = r[y]
        ft = int(ftypes[y])
        left = np.concatenate([z0, cur[:-bpp]]) if w > 1 else cur * 0
        ul = np.concatenate([z0, prev[:-bpp]]) if w > 1 else cur * 0
        if ft == 0:
            filt = cur
        elif ft == 1:
            filt = (cur - left) % 256
        elif ft == 2:
            filt = (cur - prev) % 256
        elif ft == 3:
            filt = (cur - ((left + prev) >> 1)) % 256
        else:
            pa = np.abs(prev - ul)
            pb = np.abs(left - ul)
            pc = np.abs(left + prev - 2 * ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc),
                left,
                np.where(pb <= pc, prev, ul),
            )
            filt = (cur - pred) % 256
        lines.append(bytes([ft]) + filt.astype(np.uint8).tobytes())
        prev = cur
    body = b"".join(lines)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2 if ch == 3 else 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + M._png_chunk(b"IHDR", ihdr)
        + M._png_chunk(b"IDAT", zlib.compress(body, 1))
        + M._png_chunk(b"IEND", b"")
    )


def main() -> None:
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    rng = np.random.default_rng(7)
    raster = rng.integers(0, 256, size=(size, size, 3), dtype=np.uint8)
    mb = raster.nbytes / 1e6
    cases = {
        "filter0": [0] * size,
        "sub": [1] * size,
        "up": [2] * size,
        "average": [3] * size,
        "paeth": [4] * size,
        "segments_0_4_3": [0] * (size // 3)
        + [4] * (size // 3)
        + [3] * (size - 2 * (size // 3)),
        "alternating_3_4": [3 if y % 2 else 4 for y in range(size)],
    }
    out = {}
    for name, fts in cases.items():
        payload = encode_png(raster, fts)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            got = M.decode_png_raster(payload)
            best = min(best, time.perf_counter() - t0)
        assert (got == raster).all(), name  # bit-exact or the number lies
        out[name] = round(mb / best, 1)
    print(json.dumps({"metric": "png_decode_mb_per_sec",
                      "size": size, "cases": out}))


if __name__ == "__main__":
    main()
