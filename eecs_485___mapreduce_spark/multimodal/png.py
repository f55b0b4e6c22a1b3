"""REAL PNG pixel codec for 8-bit RGB: CRC-verified chunk walk,
bounded zlib inflate, and full reversal of the five scanline filters
(None/Sub/Up/Average/Paeth)."""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .bmp import BMP_STATS_SCHEMA, _bmp_doc_pixels
from .raster import MAX_DECODE_PIXELS, _raster_stats

# --------------------------- REAL PNG pixel decode (inflate+unfilter)
#
# PNG's pixel plane is zlib-deflated scanlines, each prefixed by one
# of five filter types (None/Sub/Up/Average/Paeth). zlib ships in the
# Python stdlib, so unlike JPEG (Huffman+DCT) and GIF (LZW) the PNG
# plane needs no imaging library: the builder below APPLIES a cycling
# mix of all five filters per the spec, and the decoder REVERSES them
# after CRC-verified chunk parsing — a complete, real PNG codec for
# 8-bit RGB.

import zlib

PNG_STATS_SCHEMA = BMP_STATS_SCHEMA  # same statistics, PNG container


def _paeth(a: int, b: int, c: int) -> int:
    """The Paeth predictor exactly as specified (PNG spec 9.4)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def build_png_from_pixels(px_rgb: np.ndarray, filter_seed: int = 0) -> bytes:
    """Serialize ANY (h, w, 3) uint8 RGB top-down array as a COMPLETE
    8-bit RGB PNG, with scanline filter type cycling
    ``(filter_seed + y) % 5`` so every filter in the spec gets applied
    (and must be reversed by the decoder). Real CRCs, real deflate
    stream; exact round-trip with :func:`decode_png_pixels` is
    property-tested over random rasters and seeds."""
    h, w, _ = px_rgb.shape
    d = int(filter_seed)
    bpp = 3
    px = px_rgb.astype(np.int64).reshape(h, w * bpp)
    out = bytearray()
    prior = [0] * (w * bpp)
    for y in range(h):
        raw = [int(v) for v in px[y]]
        f = (d + y) % 5
        out.append(f)
        for i in range(w * bpp):
            left = raw[i - bpp] if i >= bpp else 0
            up = prior[i]
            ul = prior[i - bpp] if i >= bpp else 0
            if f == 0:
                v = raw[i]
            elif f == 1:
                v = raw[i] - left
            elif f == 2:
                v = raw[i] - up
            elif f == 3:
                v = raw[i] - (left + up) // 2
            else:
                v = raw[i] - _paeth(left, up, ul)
            out.append(v % 256)
        prior = raw
    ihdr = struct.pack(">II5B", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
        + _png_chunk(b"IEND", b"")
    )


def build_png_rgb(doc_id: int) -> bytes:
    """The deterministic per-document PNG: same pixel function as the
    BMP raster (channels reordered to the PNG's RGB byte order),
    filter cycling seeded by doc_id."""
    d = int(doc_id)
    return build_png_from_pixels(_bmp_doc_pixels(d)[:, :, ::-1], filter_seed=d)


def decode_png_pixels(payload: bytes) -> tuple | None:
    """REAL PNG decode: chunk walk with CRC verification, zlib
    inflate, and per-scanline reversal of all five PNG filters —
    returns (w, h, (h, w, 3) RGB top-down uint8 array). Returns None
    for non-PNG, non-8-bit-RGB, bad-CRC, or truncated payloads."""
    try:
        if bytes(payload[:8]) != b"\x89PNG\r\n\x1a\n":
            return None
        i, w = 8, None
        idat = bytearray()
        while i + 12 <= len(payload):
            (length,) = struct.unpack(">I", payload[i : i + 4])
            tag = bytes(payload[i + 4 : i + 8])
            body = bytes(payload[i + 8 : i + 8 + length])
            (crc,) = struct.unpack(
                ">I", payload[i + 8 + length : i + 12 + length]
            )
            if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
                return None
            if tag == b"IHDR":
                w, h, bit_depth, color_type = struct.unpack(">IIBB", body[:10])
                if bit_depth != 8 or color_type != 2:
                    return None
            elif tag == b"IDAT":
                idat.extend(body)
            elif tag == b"IEND":
                break
            i += 12 + length
        if w is None or not idat:
            return None
        if w == 0 or h == 0 or w * h > MAX_DECODE_PIXELS:
            return None  # PNG spec minimum is 1x1; cap vs header bombs
        bpp, row_len = 3, 3 * w
        expected = h * (1 + row_len)
        # Bounded inflate: ask for at most expected+1 bytes so a
        # zlib bomb (tiny IDAT, huge plaintext) stops at the cap
        # instead of materializing its full expansion.
        raw = zlib.decompressobj().decompress(bytes(idat), expected + 1)
        if len(raw) != expected:
            return None
        prior = [0] * row_len
        rows = []
        for y in range(h):
            line = raw[y * (1 + row_len) : (y + 1) * (1 + row_len)]
            f, data = line[0], list(line[1:])
            if f > 4:
                return None
            cur: list[int] = []
            for i2 in range(row_len):
                left = cur[i2 - bpp] if i2 >= bpp else 0
                up = prior[i2]
                ul = prior[i2 - bpp] if i2 >= bpp else 0
                if f == 0:
                    v = data[i2]
                elif f == 1:
                    v = data[i2] + left
                elif f == 2:
                    v = data[i2] + up
                elif f == 3:
                    v = data[i2] + (left + up) // 2
                else:
                    v = data[i2] + _paeth(left, up, ul)
                cur.append(v % 256)
            rows.append(cur)
            prior = cur
        px = np.array(rows, dtype=np.uint8).reshape(h, w, 3)
        return (w, h, px)
    except (struct.error, ValueError, zlib.error):
        return None


def decode_png_pixel_stats(payload: bytes) -> tuple | None:
    """Per-image statistics over :func:`decode_png_pixels` output —
    same tuple as the BMP path (sum_b/g/r name the pixel-function
    channels, independent of the container's RGB byte order)."""
    r = decode_png_pixels(payload)
    if r is None:
        return None
    w, h, px = r
    sums = px.reshape(-1, 3).astype(np.int64).sum(axis=0)
    # PNG stores RGB; the stats contract names channels B,G,R
    return _raster_stats(w, h, (int(sums[2]), int(sums[1]), int(sums[0])))


def with_png_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach the deterministic full RGB PNG per row."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf[[id_col]].copy()
            out["payload"] = [build_png_rgb(d) for d in pdf[id_col]]
            yield out

    return df.select(id_col).mapInPandas(batches, f"{id_col} bigint, payload binary")


def png_pixel_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """mapInPandas operator: full PNG payload -> per-image pixel
    statistics via :func:`decode_png_pixel_stats`."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            stats = [decode_png_pixel_stats(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": [s[0] if s else None for s in stats],
                    "height": [s[1] if s else None for s in stats],
                    "n_pixels": [s[2] if s else None for s in stats],
                    "sum_b": [s[3] if s else None for s in stats],
                    "sum_g": [s[4] if s else None for s in stats],
                    "sum_r": [s[5] if s else None for s in stats],
                    "mean_gray_milli": [s[6] if s else None for s in stats],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, PNG_STATS_SCHEMA)
