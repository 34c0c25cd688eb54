"""Multimodal column handling: opaque binary payloads + typed metadata.

The engine treats image/audio/video as ``binary`` columns with a typed
metadata struct, processed by Arrow-batched ``mapInPandas`` — the decode
kernels are pluggable. Decoding is REAL for the formats the standard
library + numpy can parse — PCM WAV (stdlib ``wave``; 8/16/24/32-bit),
netpbm P5/P6 images, non-interlaced 8/16-bit and 8-bit-palette PNG
(stdlib ``zlib`` inflate + scanline unfiltering), uncompressed
24/32-bit BMP, and uncompressed baseline TIFF (both byte orders) — and
a declared plug-point (``NotImplementedError``) for the remaining
codec-bound formats (JPEG/WebP/MP3/video containers, interlaced or
sub-byte PNG, RLE BMP, LZW TIFF), which need an external backend this
container doesn't ship. The Spark-side plumbing — schema, batch iteration, partition
preservation — is identical either way and tested end-to-end with both
the real decoders and the deterministic fake.

At 100 TB: binary payloads dominate row size, so operators here always
project metadata-only before shuffles and keep payload access inside a
single mapInPandas pass (no payload ever enters a join or groupBy key).
"""

from __future__ import annotations

import io
import wave
import zlib
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


def _parse_netpbm_header(payload: bytes) -> tuple[int, int, int, int, int]:
    """Parse a binary netpbm (P5/P6) header. Returns
    ``(n_channels, width, height, maxval, raster_offset)``. The single
    shared tokenizer for decode and resize — header tokens are magic,
    width, height, maxval, whitespace-separated with ``#`` comments; the
    raster starts after the single whitespace byte following maxval."""
    if payload[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm payload")
    n_channels = 3 if payload[:2] == b"P6" else 1
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if i >= len(payload):
            raise ValueError("truncated netpbm header")
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
    return n_channels, width, height, maxval, i


def decode_netpbm(payload: bytes) -> dict:
    """Real netpbm decode (binary PGM ``P5`` / PPM ``P6``) — pure
    header parse + one numpy view, no imaging library. Returns width,
    height, channel count, and the mean pixel value (the cheap
    brightness/degenerate-image QA signal)."""
    n_channels, width, height, maxval, offset = _parse_netpbm_header(payload)
    dtype = np.dtype(">u2") if maxval > 255 else np.dtype(np.uint8)
    n_vals = width * height * n_channels
    raster = np.frombuffer(
        payload, dtype=dtype, count=n_vals, offset=offset
    ).reshape(height, width, n_channels)
    return {
        "media": "image/x-portable-pixmap" if n_channels == 3 else "image/x-portable-graymap",
        "width": width,
        "height": height,
        "n_channels": n_channels,
        "mean_value": float(raster.mean()) if n_vals else 0.0,
    }


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: PNG color type → channel count (palette excluded: needs PLTE expansion)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
#: per-payload raster allocation bound (filter bytes included): 128 MiB
#: covers a 4096x4096 RGBA frame twice over; anything claiming more in
#: its IHDR is treated as corrupt rather than risking an executor OOM
_PNG_MAX_PIXEL_BYTES = 128 << 20


def decode_png_raster(payload: bytes) -> np.ndarray:
    """Real PNG decode for non-interlaced 8/16-bit gray / gray+alpha /
    RGB / RGBA and 8-bit palette (PLTE, with optional tRNS alpha) —
    stdlib ``zlib`` inflate of the IDAT stream + per-scanline
    unfiltering (None/Sub/Up/Average/Paeth), no imaging library.
    Returns the reconstructed ``(height, width, channels)`` raster:
    uint8, or uint16 for 16-bit samples; palette images come back
    expanded to RGB (RGBA when tRNS is present).

    Out-of-scope PNG variants (sub-byte bit depths, interlaced) raise
    ``NotImplementedError`` — they fall to the codec plug-point rather
    than decoding wrong.
    """
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    # walk chunks: 4-byte BE length, 4-byte type, data, 4-byte CRC
    pos, ihdr, idat, plte, trns = 8, None, [], None, None
    while pos + 8 <= len(payload):
        length = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) < length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"tRNS":
            trns = data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + CRC
    if ihdr is None or len(ihdr) < 13 or not idat:
        raise ValueError("missing IHDR/IDAT")
    width = int.from_bytes(ihdr[0:4], "big")
    height = int.from_bytes(ihdr[4:8], "big")
    bit_depth, color_type, _compression, _filter, interlace = ihdr[8:13]
    if interlace != 0:
        raise NotImplementedError("interlaced (Adam7) PNG not supported")
    if color_type == 3:
        if bit_depth != 8:
            raise NotImplementedError(
                f"{bit_depth}-bit palette PNG not supported"
            )
        if plte is None or len(plte) % 3 or not len(plte):
            raise ValueError("palette PNG missing or invalid PLTE")
        channels, bps = 1, 1
    elif color_type in _PNG_CHANNELS:
        if bit_depth not in (8, 16):
            raise NotImplementedError(f"{bit_depth}-bit PNG not supported")
        channels, bps = _PNG_CHANNELS[color_type], bit_depth // 8
    else:
        raise NotImplementedError(f"PNG color type {color_type} not supported")
    if width <= 0 or height <= 0:
        # a zero dimension is not just degenerate: expected becomes 0
        # below and zlib treats max_length=0 as UNLIMITED, so a tiny
        # IDAT bomb would inflate fully before the length check
        raise ValueError("bad PNG dimensions (zero width or height)")
    bpp = channels * bps  # the filter unit is BYTES per pixel (spec §9)
    row_bytes = width * bpp
    expected = height * (1 + row_bytes)
    # bound the inflate by the dimensions BEFORE allocating: a bomb
    # payload (tiny IDAT claiming huge dimensions, or a stream inflating
    # past what the IHDR promises) must degrade per-row like any other
    # corrupt file, not OOM the Arrow worker
    if expected > _PNG_MAX_PIXEL_BYTES:
        raise ValueError(
            f"PNG dimensions {width}x{height}x{channels} exceed the "
            f"{_PNG_MAX_PIXEL_BYTES >> 20} MiB decode bound"
        )
    d = zlib.decompressobj()
    data = d.decompress(b"".join(idat), expected)
    if (
        len(data) != expected
        or d.unconsumed_tail
        or d.decompress(b"", 1)  # pending output past the expected size
    ):
        raise ValueError("PNG pixel data does not match dimensions")
    raw = np.frombuffer(data, dtype=np.uint8)
    raw = raw.reshape(height, 1 + row_bytes)
    ftypes = raw[:, 0].astype(np.int64)
    if ftypes.size and int(ftypes.max()) > 4:
        raise ValueError(
            f"unknown PNG filter type {int(ftypes.max())}"
        )
    if np.any(ftypes >= 3) and height * row_bytes > 256 * (
        height + width
    ):
        # Average/Paeth rows present and the raster is big enough to
        # amortize the sweep's fixed cost: the left-pixel recurrence
        # makes a per-row pass sequential in x, but cells on
        # anti-diagonal y + x = d depend only on diagonals d-1/d-2,
        # so a wavefront sweep vectorizes the raster in h + w - 1
        # numpy steps (measured figures in _unfilter_wavefront). The
        # cost model: the plain-int row loop is ~0.3 us/byte =
        # h*row_bytes work, the wavefront pays ~0.1 ms/diagonal over
        # h + w - 1 diagonals regardless of width — so thin rasters
        # (either axis) stay on the loop.
        out = _unfilter_wavefront(raw[:, 1:], ftypes, bpp)
    else:
        out = np.zeros((height, row_bytes), dtype=np.uint8)
        prev = np.zeros(row_bytes, dtype=np.int64)
        for y in range(height):
            out[y] = _unfilter_scanline(
                int(ftypes[y]), raw[y, 1:].astype(np.int64), prev, bpp
            )
            prev = out[y].astype(np.int64)
    if color_type == 3:
        idx = out.reshape(height, width)
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        if idx.size and int(idx.max()) >= len(pal):
            raise ValueError("palette index out of range")
        rgb = pal[idx]  # (h, w, 3)
        if trns is not None:
            alpha = np.full(len(pal), 255, dtype=np.uint8)
            alpha[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
            return np.dstack([rgb, alpha[idx]])
        return rgb
    if bps == 2:
        return (
            out.view(">u2").astype(np.uint16).reshape(height, width, channels)
        )
    return out.reshape(height, width, channels)


def _unfilter_wavefront(
    raw: np.ndarray, ftypes: np.ndarray, bpp: int
) -> np.ndarray:
    """Unfilter a whole PNG raster by anti-diagonal wavefront — exact
    per the spec (§9), handling a different filter type per row.

    A scanline with Average/Paeth filtering has a LEFT-pixel recurrence
    (recon[x] needs recon[x-bpp]), so a per-row pass is inherently
    sequential in x — the r8/r9 implementation ran it over plain Python
    ints at ~3-6 MB/s. But every filter's dependencies (left, up,
    upper-left) live on earlier anti-diagonals of the (row, PIXEL)
    grid: cells with y + x = d depend only on diagonals d-1 and d-2.
    Sweeping d therefore computes each diagonal — up to min(h, w)
    pixels x bpp byte lanes — as one vectorized numpy step, h + w - 1
    sequential steps total instead of h*w*bpp. Measured on a 1024 sq
    RGB frame (r10): Paeth 3.3 -> 12.5 MB/s, Average 6.3 -> 24.3 MB/s,
    a 3-segment 0/Paeth/Average raster 17.9 MB/s, vs 115 MB/s for a
    filter-0 frame through the cumsum row pass (which 0/1/2-only
    rasters and thin rasters keep using). The remaining gap is
    per-diagonal numpy-call overhead (~0.1 ms x 2047 diagonals), not
    element work — few-run diagonals take a specialized 1-4-ufunc arm
    per run, and a raster alternating filter types row-by-row falls
    to the generic np.select arm (6.8 MB/s).

    ``raw`` is the filtered bytes (h, width*bpp); ``ftypes`` the
    per-row filter types (all <= 4). Returns uint8 (h, w*bpp).

    Each anti-diagonal of a C-contiguous array is a CONSTANT-STRIDE
    slice (flat index d*bpp + y*(row_stride - bpp) + lane), so every
    per-diagonal operand — cur, left, up, upper-left, and the write
    target — is an ``as_strided`` view: no gather/scatter indexing
    anywhere in the sweep (a fancy-indexed first cut ran 10x slower
    than this). All intermediates fit int16 (|a + b - 2c| <= 510),
    which halves the memory traffic and keeps the padded recon buffer
    at 2 bytes/pixel-byte.
    """
    from numpy.lib.stride_tricks import as_strided

    h, rb = raw.shape
    w = rb // bpp
    # R padded with one zero row (top) and one zero pixel (left):
    # R[y+1, j+bpp] = recon[y, j], so left/up/upper-left of (y, j) are
    # R[y+1, j] / R[y, j+bpp] / R[y, j] — no bounds branches anywhere
    rw = rb + bpp
    R = np.zeros((h + 1) * rw, dtype=np.int16)
    cflat = np.ascontiguousarray(raw, dtype=np.int16).reshape(-1)
    ft16 = ftypes.astype(np.int16)
    isz = R.itemsize

    def dview(flat, off, stride, k):
        return as_strided(
            flat[off:], shape=(k, bpp), strides=(stride * isz, isz)
        )

    # filter-type RUNS down the rows: per-diagonal numpy-call overhead
    # is the cost model here (not element arithmetic), so a diagonal
    # whose rows span few runs applies a specialized 1-4-ufunc arm per
    # run on sliced sub-views. Note the reach: a full diagonal covers
    # ~min(h, w) consecutive rows, so this helps rasters whose rows
    # form a handful of filter SEGMENTS (uniform, or header rows +
    # one body filter) — an encoder alternating filters row-by-row
    # crosses many runs per diagonal and falls to the generic
    # all-predictors np.select arm
    seg = np.concatenate(([0], np.cumsum(ftypes[1:] != ftypes[:-1])))
    rstart = np.flatnonzero(
        np.concatenate(([True], ftypes[1:] != ftypes[:-1]))
    )
    rend = np.append(rstart[1:] - 1, h - 1)
    for d in range(h + w - 1):
        y0, y1 = max(0, d - (w - 1)), min(h - 1, d)
        k = y1 - y0 + 1
        base = d * bpp + y0 * (rw - bpp)
        a = dview(R, base + rw, rw - bpp, k)  # left
        b = dview(R, base + bpp, rw - bpp, k)  # up
        c = dview(R, base, rw - bpp, k)  # upper-left
        cur = dview(cflat, d * bpp + y0 * (rb - bpp), rb - bpp, k)
        out = dview(R, base + rw + bpp, rw - bpp, k)
        r0, r1 = int(seg[y0]), int(seg[y1])
        if r1 - r0 < 4:
            for r in range(r0, r1 + 1):
                lo = max(y0, int(rstart[r])) - y0
                hi = min(y1, int(rend[r])) - y0
                s = slice(lo, hi + 1)
                f = int(ftypes[y0 + lo])
                if f == 0:
                    out[s] = cur[s]
                elif f == 1:
                    np.bitwise_and(cur[s] + a[s], 255, out=out[s])
                elif f == 2:
                    np.bitwise_and(cur[s] + b[s], 255, out=out[s])
                elif f == 3:
                    np.bitwise_and(
                        cur[s] + ((a[s] + b[s]) >> 1), 255, out=out[s]
                    )
                else:
                    av, bv, cv = a[s], b[s], c[s]
                    pa = np.abs(bv - cv)
                    pb = np.abs(av - cv)
                    pc = np.abs(av + bv - 2 * cv)
                    paeth = np.where(
                        (pa <= pb) & (pa <= pc),
                        av,
                        np.where(pb <= pc, bv, cv),
                    )
                    np.bitwise_and(cur[s] + paeth, 255, out=out[s])
            continue
        pa = np.abs(b - c)
        pb = np.abs(a - c)
        pc = np.abs(a + b - 2 * c)
        paeth = np.where(
            (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
        )
        ft = ft16[y0 : y1 + 1, None]  # many-run diagonal
        pred = np.select(
            [ft == 1, ft == 2, ft == 3, ft == 4],
            [a, b, (a + b) >> 1, paeth],
            default=np.int16(0),
        )
        np.bitwise_and(cur + pred, 255, out=out)
    return R.reshape(h + 1, rw)[1:, bpp:].astype(np.uint8)


def _unfilter_scanline(
    ftype: int, cur: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    """Reverse one PNG scanline filter (spec §9, filter types 0-4).
    ``cur`` is the filtered scanline, ``prev`` the reconstructed prior
    scanline (zeros for the first), both int64 of length width*bpp."""
    if ftype == 0:  # None
        return (cur % 256).astype(np.uint8)
    if ftype == 2:  # Up
        return ((cur + prev) % 256).astype(np.uint8)
    if ftype == 1:  # Sub: recon[x] = cur[x] + recon[x-1] → per-channel cumsum
        c = cur.reshape(cur.size // bpp, bpp)
        return (np.cumsum(c, axis=0) % 256).astype(np.uint8).reshape(-1)
    # Average/Paeth carry a left-pixel dependency, so the scan is
    # inherently sequential in x — run it over plain Python ints (one
    # flat list pass, ~10× the per-pixel-numpy version this replaced;
    # these two filters still decode slower than None/Sub/Up, which stay
    # fully vectorized)
    n = cur.size
    cl = cur.tolist()
    pl = prev.tolist()
    res = [0] * n
    if ftype == 3:  # Average: recon = cur + floor((left + up) / 2)
        for i in range(n):
            a = res[i - bpp] if i >= bpp else 0
            res[i] = (cl[i] + ((a + pl[i]) >> 1)) & 255
    elif ftype == 4:  # Paeth
        for i in range(n):
            a = res[i - bpp] if i >= bpp else 0  # left
            b = pl[i]  # up
            cc = pl[i - bpp] if i >= bpp else 0  # upper-left
            pa = abs(b - cc)
            pb = abs(a - cc)
            pc = abs(a + b - 2 * cc)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            res[i] = (cl[i] + pred) & 255
    else:
        raise ValueError(f"unknown PNG filter type {ftype}")
    return np.array(res, dtype=np.uint8)


def decode_png(payload: bytes) -> dict:
    """Real PNG decode (non-interlaced 8/16-bit + 8-bit palette) — same
    QA-signal contract as :func:`decode_netpbm`: dimensions, channel
    count, mean pixel (palette images report their expanded RGB(A)
    channel count and mean)."""
    raster = decode_png_raster(payload)
    return {
        "media": "image/png",
        "width": int(raster.shape[1]),
        "height": int(raster.shape[0]),
        "n_channels": int(raster.shape[2]),
        "mean_value": float(raster.mean()) if raster.size else 0.0,
    }


def decode_bmp_raster(payload: bytes) -> np.ndarray:
    """Real BMP decode for uncompressed (BI_RGB) 24/32-bit DIBs with a
    BITMAPINFOHEADER(-or-later) header — pure header parse + one numpy
    view, no imaging library. Handles 4-byte row padding, bottom-up and
    top-down storage, and returns an RGB(A) ``(height, width,
    channels)`` uint8 raster (BGR(A) channel order swapped).

    Out-of-scope variants (BITMAPCOREHEADER, palette/16-bit pixels, RLE
    or bitfield compression) raise ``NotImplementedError``."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    data_off = int.from_bytes(payload[10:14], "little")
    hdr_size = int.from_bytes(payload[14:18], "little")
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP not supported")
    width = int.from_bytes(payload[18:22], "little", signed=True)
    height = int.from_bytes(payload[22:26], "little", signed=True)
    bitcount = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if compression != 0:
        raise NotImplementedError(
            f"BMP compression {compression} not supported"
        )
    if bitcount not in (24, 32):
        raise NotImplementedError(f"{bitcount}-bit BMP not supported")
    if width <= 0 or height == 0:
        raise ValueError("bad BMP dimensions")
    top_down = height < 0
    h = abs(height)
    ch = bitcount // 8
    stride = ((bitcount * width + 31) // 32) * 4  # rows pad to 4 bytes
    need = stride * h
    if need > _PNG_MAX_PIXEL_BYTES:  # same per-payload allocation bound
        raise ValueError(
            f"BMP dimensions {width}x{h}x{ch} exceed the "
            f"{_PNG_MAX_PIXEL_BYTES >> 20} MiB decode bound"
        )
    if len(payload) < data_off + need:
        raise ValueError("BMP pixel data does not match dimensions")
    raw = np.frombuffer(
        payload, dtype=np.uint8, count=need, offset=data_off
    ).reshape(h, stride)
    px = raw[:, : width * ch].reshape(h, width, ch)
    if not top_down:
        px = px[::-1]
    order = [2, 1, 0] + ([3] if ch == 4 else [])
    return np.ascontiguousarray(px[:, :, order])


def _tiff_tags(payload: bytes, order: str) -> dict[int, list[int]]:
    """Walk the first IFD of a TIFF payload and return {tag: values}
    for the integer-typed tags (BYTE/SHORT/LONG). Values whose encoded
    size exceeds 4 bytes live at an offset; inline values are packed
    into the 4-byte field."""
    sizes = {1: 1, 3: 2, 4: 4}  # BYTE, SHORT, LONG
    ifd_off = int.from_bytes(payload[4:8], order)
    if ifd_off + 2 > len(payload):
        raise ValueError("truncated TIFF IFD")
    n = int.from_bytes(payload[ifd_off : ifd_off + 2], order)
    tags: dict[int, list[int]] = {}
    for i in range(n):
        e = ifd_off + 2 + 12 * i
        if e + 12 > len(payload):
            raise ValueError("truncated TIFF IFD entry")
        tag = int.from_bytes(payload[e : e + 2], order)
        typ = int.from_bytes(payload[e + 2 : e + 4], order)
        cnt = int.from_bytes(payload[e + 4 : e + 8], order)
        if typ not in sizes:
            continue  # rationals etc. — not needed for the raster walk
        total = sizes[typ] * cnt
        if total <= 4:
            base = e + 8
        else:
            base = int.from_bytes(payload[e + 8 : e + 12], order)
            if base + total > len(payload):
                raise ValueError("TIFF tag data out of bounds")
        tags[tag] = [
            int.from_bytes(
                payload[base + j * sizes[typ] : base + (j + 1) * sizes[typ]],
                order,
            )
            for j in range(cnt)
        ]
    return tags


def decode_tiff_raster(payload: bytes) -> np.ndarray:
    """Real TIFF decode for uncompressed (compression=1), chunky-planar,
    8-bit-per-sample gray / RGB / RGBA baseline TIFFs, both byte orders
    — IFD walk + strip concatenation + one numpy view, no imaging
    library. Returns the ``(height, width, channels)`` uint8 raster.

    Out-of-scope variants (LZW/JPEG/packbits compression, planar
    config 2, sub/super-byte sample depths, tiles) raise
    ``NotImplementedError``."""
    if payload[:4] == b"II*\x00":
        order = "little"
    elif payload[:4] == b"MM\x00*":
        order = "big"
    else:
        raise ValueError("not a TIFF payload")
    t = _tiff_tags(payload, order)
    if 322 in t or 323 in t:
        raise NotImplementedError("tiled TIFF not supported")
    comp = t.get(259, [1])[0]
    if comp != 1:
        raise NotImplementedError(f"TIFF compression {comp} not supported")
    if t.get(284, [1])[0] != 1:
        raise NotImplementedError("planar TIFF (separate planes) not supported")
    if 256 not in t or 257 not in t or 273 not in t:
        raise ValueError("TIFF missing width/height/strip offsets")
    width, height = t[256][0], t[257][0]
    ch = t.get(277, [1])[0]
    bits = t.get(258, [8] * ch)
    if ch not in (1, 3, 4) or any(b != 8 for b in bits):
        raise NotImplementedError(
            f"TIFF with {ch} samples x {bits} bits not supported"
        )
    if width <= 0 or height <= 0 or width * height * ch > _PNG_MAX_PIXEL_BYTES:
        raise ValueError("bad TIFF dimensions")
    offsets = t[273]
    counts = t.get(279)
    if counts is None:
        rows_per_strip = t.get(278, [height])[0]
        counts = [
            min(rows_per_strip, height - i * rows_per_strip) * width * ch
            for i in range(len(offsets))
        ]
    data = b"".join(
        payload[o : o + c] for o, c in zip(offsets, counts, strict=True)
    )
    if len(data) != width * height * ch:
        raise ValueError("TIFF strip data does not match dimensions")
    return np.frombuffer(data, dtype=np.uint8).reshape(height, width, ch)


def decode_tiff(payload: bytes) -> dict:
    """Real TIFF decode — same QA-signal contract as
    :func:`decode_netpbm`: dimensions, channel count, mean pixel."""
    raster = decode_tiff_raster(payload)
    return {
        "media": "image/tiff",
        "width": int(raster.shape[1]),
        "height": int(raster.shape[0]),
        "n_channels": int(raster.shape[2]),
        "mean_value": float(raster.mean()) if raster.size else 0.0,
    }


def decode_bmp(payload: bytes) -> dict:
    """Real BMP decode — same QA-signal contract as
    :func:`decode_netpbm`: dimensions, channel count, mean pixel."""
    raster = decode_bmp_raster(payload)
    return {
        "media": "image/bmp",
        "width": int(raster.shape[1]),
        "height": int(raster.shape[0]),
        "n_channels": int(raster.shape[2]),
        "mean_value": float(raster.mean()) if raster.size else 0.0,
    }


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    """One framed PNG chunk: big-endian length, type, data, CRC32 over
    type+data — shared by :func:`encode_png` and the x103 fixture
    writer so the framing exists exactly once."""
    import struct

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def encode_png(raster: np.ndarray) -> bytes:
    """Minimal standards-conformant PNG writer for an
    ``(height, width, channels)`` raster (1/2/3/4 channels → gray /
    gray+alpha / RGB / RGBA; uint8 → 8-bit, uint16/2-byte dtypes →
    16-bit big-endian samples): filter type None on every scanline, one
    zlib-compressed IDAT. The emit side of the resize path — any PNG
    reader (including :func:`decode_png_raster`) round-trips it
    exactly."""
    import struct

    h, w, ch = raster.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    bit_depth = 16 if raster.dtype.itemsize == 2 else 8
    arr = np.ascontiguousarray(
        raster.astype(">u2") if bit_depth == 16 else raster.astype(np.uint8)
    )
    body = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(body))
        + _png_chunk(b"IEND", b"")
    )


def resize_png(payload: bytes, factor: int = 2) -> bytes:
    """REAL image resize for PNG payloads: nearest-neighbor subsampling
    by ``factor`` on the decoded raster, re-emitted as PNG — the
    :func:`resize_netpbm` contract for the compressed format a real
    crawl actually carries. Pure zlib+numpy, no imaging library."""
    small = decode_png_raster(payload)[::factor, ::factor, :]
    return encode_png(small)


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
    if width == 3:  # 24-bit PCM: little-endian signed, no native dtype
        b = np.frombuffer(raw, dtype=np.uint8)
        b = b.reshape(-1, 3).astype(np.int64)
        x = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.float64)
    else:
        dtype = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}.get(
            width
        )
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
    """Image decode: REAL for uncompressed netpbm (P5/P6),
    non-interlaced 8/16-bit + 8-bit-palette PNG (stdlib zlib + scanline
    unfiltering), and uncompressed 24/32-bit BMP; remaining codec-bound
    formats (JPEG/WebP/interlaced PNG/...) are the declared plug-point
    — swap in an imaging backend here, the mapInPandas plumbing is
    already wired."""
    if payload[:2] in (b"P5", b"P6"):
        return decode_netpbm(payload)
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        return decode_tiff(payload)
    raise NotImplementedError(
        "JPEG/WebP and exotic PNG/BMP/TIFF variants need an imaging "
        "backend (e.g. Pillow); netpbm (P5/P6), 8/16-bit non-interlaced "
        "PNG, uncompressed BMP, and uncompressed baseline TIFF decode "
        "natively — plug a codec in here"
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
    mapInPandas pass: netpbm, 8/16-bit PNG (incl. palette), 24/32-bit
    BMP (both row orders), baseline TIFF (both byte orders), and PCM
    WAV (8/16/24-bit) decode natively (dimensions / mean pixel value;
    rate / duration / peak / RMS); payloads none of those can parse
    emit byte-level features
    under media_type 'unknown' — a 100 TB pass must degrade per-row,
    never die on one corrupt file. Output is metadata-only; the payload
    never crosses a shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                # even id/payload coercion degrades per-row: a null id or
                # a non-bytes payload cell must not fail the Arrow pass —
                # and a bad payload must not discard a good id (or vice
                # versa), so the two coerce independently
                row = dict(_MEDIA_NULLS)
                try:
                    row["doc_id"] = int(did)
                except Exception:  # noqa: BLE001 — degrade, never die
                    row["doc_id"] = -1  # sentinel: id itself unreadable
                try:
                    p = bytes(p) if p is not None else b""
                    row["n_bytes"] = len(p)
                except Exception:  # noqa: BLE001 — degrade, never die
                    row.update(n_bytes=0, media_type="corrupt")
                    rows.append(row)
                    continue
                try:
                    if (
                        p[:2] in (b"P5", b"P6", b"BM")
                        or p[:8] == _PNG_SIG
                        or p[:4] in (b"II*\x00", b"MM\x00*")
                    ):
                        d = decode_image(p)
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
                except NotImplementedError:
                    # recognized container, unsupported codec (16-bit or
                    # palette PNG, non-PCM WAV, ...) — not corrupt data
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


def _fixture_png_palette(
    w: int, h: int, indices: bytes, palette: bytes
) -> bytes:
    """Oracle-parseable PALETTE PNG (color type 3, 8-bit indices, no
    tRNS): the PLTE chunk sits at the fixed post-IHDR offset (data at
    payload offset 41), the IDAT stream is stored-deflate with
    filter-0 scanlines, so the SQL twin can walk index byte -> three
    palette bytes at 41 + 3*idx with pure byte arithmetic while the
    engine runs the real palette-expansion decode. Layout asserted
    like :func:`_fixture_png`."""
    import struct

    if len(palette) % 3 or not palette:
        raise ValueError("palette must be non-empty RGB triples")
    if indices and max(indices) >= len(palette) // 3:
        raise ValueError("palette index out of range in fixture")
    body = b"".join(
        b"\x00" + indices[y * w : (y + 1) * w] for y in range(h)
    )
    z = zlib.compress(body, 0)
    if not (
        z[:2] == b"\x78\x01"
        and z[2] == 0x01
        and int.from_bytes(z[3:5], "little") == len(body)
        and z[7 : 7 + len(body)] == body
    ):
        raise AssertionError("level-0 zlib stream is not one stored block")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", palette)
        + _png_chunk(b"IDAT", z)
        + _png_chunk(b"IEND", b"")
    )


def _fixture_wav(rate: int, samples: list[int], width: int) -> bytes:
    """Canonical 44-byte-header mono PCM WAV: ``width``-byte samples
    (1 = unsigned 8-bit, 2/3 = signed little-endian)."""
    if width == 1:
        data = bytes((s + 128) & 0xFF for s in samples)
    else:
        mask = (1 << (8 * width)) - 1
        data = b"".join((s & mask).to_bytes(width, "little") for s in samples)
    return (
        b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")              # PCM
        + (1).to_bytes(2, "little")              # mono
        + rate.to_bytes(4, "little")
        + (rate * width).to_bytes(4, "little")   # byte rate
        + width.to_bytes(2, "little")            # block align
        + (8 * width).to_bytes(2, "little")      # bits per sample
        + b"data" + len(data).to_bytes(4, "little")
    ) + data


def _fixture_bmp(
    w: int, h: int, ch: int, pix: bytes, top_down: bool = False
) -> bytes:
    """Uncompressed BI_RGB BMP (BITMAPINFOHEADER, 24/32-bit): ``pix``
    is the raw BGR(A) byte stream row-major top-to-bottom; rows are
    re-ordered bottom-up and padded to 4 bytes unless ``top_down``."""
    stride = ((8 * ch * w + 31) // 32) * 4
    rows = [
        pix[y * w * ch : (y + 1) * w * ch].ljust(stride, b"\x00")
        for y in range(h)
    ]
    if not top_down:
        rows.reverse()
    body = b"".join(rows)
    return (
        b"BM" + (54 + len(body)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00" + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little")
        + ((-h if top_down else h) & 0xFFFFFFFF).to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (8 * ch).to_bytes(2, "little")
        + (0).to_bytes(4, "little")              # BI_RGB
        + len(body).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") + (2835).to_bytes(4, "little")
        + (0).to_bytes(4, "little") + (0).to_bytes(4, "little")
    ) + body


def _fixture_png(
    w: int,
    h: int,
    ch: int,
    raster: bytes,
    bit_depth: int = 8,
    filter_type: int = 0,
) -> bytes:
    """Oracle-parseable PNG: 8/16-bit gray (ch=1) / RGB (ch=3), ONE
    uniform filter type on every scanline (0=None, or — 8-bit only —
    1=Sub / 2=Up, forward-filtered here from the reconstructed
    ``raster``), and the IDAT zlib stream STORED
    (``zlib.compress(body, 0)``) — a level-0 stream is one or more
    uncompressed blocks, so for a fixture small enough to fit one
    block the raw scanlines sit at a fixed offset inside the payload
    (zlib header 2 B, stored-block header 5 B) and pure byte
    arithmetic can reach every FILTERED byte (16-bit samples are
    big-endian byte pairs); Sub/Up reconstruction is then a modular
    prefix sum the oracle expresses as a SQL window. ``raster`` is the
    raw RECONSTRUCTED sample byte stream (already big-endian for
    16-bit). The DECODER path exercised is the real one (zlib inflate
    + scanline unfilter); only the fixture's byte layout is
    constrained. Layout is asserted here so a zlib behavior change
    fails the generator loudly, not the oracle quietly."""
    import struct

    if filter_type not in (0, 1, 2):
        raise ValueError("fixture supports filter types 0/1/2 only")
    if filter_type and bit_depth != 8:
        raise ValueError("Sub/Up fixture arms are 8-bit only")
    row_bytes = w * ch * (bit_depth // 8)
    bpp = ch * (bit_depth // 8)
    lines: list[bytes] = []
    prev = bytes(row_bytes)
    for y in range(h):
        recon = raster[y * row_bytes : (y + 1) * row_bytes]
        if filter_type == 1:  # Sub: raw[x] = recon[x] - recon[x-bpp]
            filt = bytes(
                (recon[i] - (recon[i - bpp] if i >= bpp else 0)) % 256
                for i in range(row_bytes)
            )
        elif filter_type == 2:  # Up: raw[x] = recon[x] - prior_recon[x]
            filt = bytes(
                (recon[i] - prev[i]) % 256 for i in range(row_bytes)
            )
        else:
            filt = recon
        lines.append(bytes([filter_type]) + filt)
        prev = recon
    body = b"".join(lines)
    z = zlib.compress(body, 0)
    if not (
        z[:2] == b"\x78\x01"
        and z[2] == 0x01
        and int.from_bytes(z[3:5], "little") == len(body)
        and z[7 : 7 + len(body)] == body
    ):
        raise AssertionError("level-0 zlib stream is not one stored block")

    ihdr = struct.pack(
        ">IIBBBBB", w, h, bit_depth, {1: 0, 3: 2}[ch], 0, 0, 0
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", z)
        + _png_chunk(b"IEND", b"")
    )


def _fixture_tiff(w: int, h: int, ch: int, raster: bytes) -> bytes:
    """Oracle-walkable TIFF: little-endian, uncompressed, chunky 8-bit
    samples in ONE strip, a single IFD of seven ascending LONG-typed
    entries (ImageWidth, ImageLength, Compression, Photometric,
    StripOffsets, SamplesPerPixel, StripByteCounts; BitsPerSample
    omitted — the baseline default 8*spp applies). Every field a
    consumer needs (entry count, tag/type/count/value records, strip
    position) is a fixed-width little-endian integer, so a DuckDB
    query can perform the actual IFD walk with byte arithmetic. The
    Spark-side decode is the real generic one (:func:`decode_tiff` —
    both byte orders, multi-strip, SHORT/LONG tags); only this
    fixture's layout is pinned down."""
    entries = [
        (256, w),               # ImageWidth
        (257, h),               # ImageLength
        (259, 1),               # Compression: none
        (262, 1 if ch == 1 else 2),  # Photometric: gray / RGB
        (273, 0),               # StripOffsets — patched below
        (277, ch),              # SamplesPerPixel
        (279, len(raster)),     # StripByteCounts
    ]
    data_off = 8 + 2 + 12 * len(entries) + 4
    entries[4] = (273, data_off)
    ifd = len(entries).to_bytes(2, "little") + b"".join(
        tag.to_bytes(2, "little")
        + (4).to_bytes(2, "little")      # type LONG
        + (1).to_bytes(4, "little")      # count
        + val.to_bytes(4, "little")
        for tag, val in entries
    ) + b"\x00\x00\x00\x00"              # no next IFD
    return b"II*\x00" + (8).to_bytes(4, "little") + ifd + raster


def media_fixture_payloads() -> list[tuple[int, str]]:
    """Deterministic cross-engine media fixture: tiny netpbm images
    (P5 gray / P6 RGB), uncompressed 24/32-bit BMPs (bottom-up and
    top-down), canonical mono PCM WAV clips at 8/16/24-bit sample
    widths, stored-deflate PNGs (8/16-bit gray and RGB at filter 0,
    8-bit Sub- and Up-filtered rows, and 8-bit palette images — the
    real zlib-inflate + scanline-unfilter + PLTE-expansion decode
    paths, with filtered bytes and palette entries at
    oracle-computable offsets; see :func:`_fixture_png` and
    :func:`_fixture_png_palette`),
    single-strip little-endian TIFFs in gray/RGB/RGBA (the real IFD
    walk, with an IFD a SQL query can itself walk; see
    :func:`_fixture_tiff`), one unrecognized payload, and one
    truncated (corrupt) netpbm, as ``(doc_id, hex)`` rows. Shared by
    the x103 Spark query (which decodes the bytes with the REAL
    :func:`decode_netpbm` / :func:`decode_bmp` / :func:`decode_wav` /
    :func:`decode_png` / :func:`decode_tiff` kernels) and its DuckDB
    oracle (which re-parses the SAME hex literals with pure byte
    arithmetic) — the two engines meet only at the byte level, so a
    decoder bug cannot cancel out.

    Layout constraints that keep the SQL twin to fixed-offset math:
    single-digit netpbm dimensions (that header is then always the 11
    bytes ``P5\\n{w} {h}\\n255\\n``); BMP and WAV headers are already
    fixed-offset little-endian fields (the oracle parses width / height
    / bit depth / data offset / sample width from the header bytes, it
    does not assume the generator's values); PNG rows must keep the
    stored-deflate single-IDAT layout with ONE uniform filter type in
    0/1/2 per image (the oracle detects it per image and picks
    the fixed-offset or prefix-sum arm) and TIFF rows the
    single-strip little-endian layout (an out-of-contract payload —
    e.g. a compressed-IDAT PNG, which Spark decodes fine — matches no
    oracle arm and surfaces as a row-count diff, never a query abort).
    Durations are generated to never land on an exact .5 ms (Python
    banker-rounds, SQL rounds half-away)."""
    rows: list[tuple[int, str]] = []
    did = 0
    for i in range(8):
        w = 2 + (i * 3) % 7  # 2..8: single digit, varies per row
        h = 1 + (i * 5) % 8  # 1..8
        ch = 3 if i % 2 else 1
        magic = b"P6" if ch == 3 else b"P5"
        raster = bytes((i * 37 + k * 11) % 256 for k in range(w * h * ch))
        payload = magic + b"\n%d %d\n255\n" % (w, h) + raster
        rows.append((did, payload.hex()))
        did += 1
    for i in range(8):
        # offset the rate cycle by one so no (n, rate) pairing lands on
        # an exact .5 ms (e.g. 8 samples at 16 kHz)
        rate = (8000, 11025, 16000, 22050)[(i + 1) % 4]
        n = 6 + i  # 6..13 samples
        # exact .5 ms would round differently in the two engines
        assert (2000 * n) % (2 * rate) != rate, (n, rate)
        width = (2, 1, 3)[i % 3]  # 16-, 8-, 24-bit PCM arms all covered
        half = 1 << (8 * width - 1)
        samples = [
            ((i * 31 + k * 17) * 9973) % (2 * half) - half for k in range(n)
        ]
        rows.append((did, _fixture_wav(rate, samples, width).hex()))
        did += 1
    for i, (w, h, ch, td) in enumerate(
        [(5, 3, 3, False), (4, 2, 4, False), (3, 3, 3, True), (2, 4, 4, True)]
    ):
        pix = bytes((i * 29 + k * 13) % 256 for k in range(w * h * ch))
        rows.append((did, _fixture_bmp(w, h, ch, pix, top_down=td).hex()))
        did += 1
    for i, (w, h, ch) in enumerate(
        [(6, 4, 1), (3, 5, 3), (11, 2, 1), (4, 7, 3)]
    ):
        raster = bytes((i * 41 + k * 7) % 256 for k in range(w * h * ch))
        rows.append((did, _fixture_png(w, h, ch, raster).hex()))
        did += 1
    # one 16-bit gray PNG: big-endian sample pairs, same stored layout
    w16, h16 = 5, 3
    r16 = b"".join(
        ((k * 9973) % 65536).to_bytes(2, "big") for k in range(w16 * h16)
    )
    rows.append((did, _fixture_png(w16, h16, 1, r16, bit_depth=16).hex()))
    did += 1
    # Sub- and Up-filtered PNGs (8-bit gray and RGB): the REAL
    # _unfilter_scanline types 1/2 under the oracle gate — their
    # reconstruction is a modular prefix sum, which the SQL twin
    # expresses as a window (per-lane within the row for Sub, down the
    # byte column for Up). Average/Paeth stay property-tested: their
    # left-PIXEL recurrence mixes both axes and is not expressible as
    # a SQL window over the filtered bytes.
    for i, (w, h, ch, ft) in enumerate(
        [(5, 4, 1, 1), (3, 4, 3, 1), (6, 3, 1, 2), (4, 5, 3, 2)]
    ):
        raster = bytes((i * 61 + k * 23) % 256 for k in range(w * h * ch))
        rows.append(
            (did, _fixture_png(w, h, ch, raster, filter_type=ft).hex())
        )
        did += 1
    # palette PNGs (color type 3, no tRNS): the real PLTE-expansion
    # decode under the oracle gate — the SQL twin maps each index byte
    # to its three palette bytes at the fixed PLTE offset
    for i, (w, h, np_) in enumerate([(6, 4, 7), (4, 6, 16)]):
        pal = bytes((i * 47 + k * 31) % 256 for k in range(3 * np_))
        idx = bytes((i * 13 + k * 5) % np_ for k in range(w * h))
        rows.append((did, _fixture_png_palette(w, h, idx, pal).hex()))
        did += 1
    for i, (w, h, ch) in enumerate([(7, 3, 1), (2, 6, 3), (5, 5, 4)]):
        raster = bytes((i * 53 + k * 19) % 256 for k in range(w * h * ch))
        rows.append((did, _fixture_tiff(w, h, ch, raster).hex()))
        did += 1
    # degrade path: unrecognized container → 'unknown'; a netpbm whose
    # header promises more raster than the payload carries → 'corrupt'
    rows.append((did, b"\xde\xad\xbe\xef\x00\x01".hex()))
    rows.append((did + 1, (b"P5\n9 9\n255\n" + b"\x01\x02").hex()))
    return rows


def resize_netpbm(payload: bytes, factor: int = 2) -> bytes:
    """REAL image resize for netpbm payloads: nearest-neighbor
    subsampling by ``factor`` on the decoded raster, re-emitted as the
    same binary format. Runs per payload inside the resize_payload-style
    mapInPandas pass — no imaging library needed."""
    n_channels, w, h, maxval, offset = _parse_netpbm_header(payload)
    dtype = np.dtype(">u2") if maxval > 255 else np.dtype(np.uint8)
    raster = np.frombuffer(
        payload, dtype=dtype, count=w * h * n_channels, offset=offset
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
