"""REAL GIF89a pixel codec: greedy-match variable-width LZW
(9->12 bits, clear-code resets, the KwKwK case), sub-block framing,
and the global color table."""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .bmp import BMP_H_MOD, BMP_STATS_SCHEMA, BMP_W_MOD
from .raster import MAX_DECODE_PIXELS, _raster_stats

# ------------------------------- REAL GIF pixel decode (LZW+palette)
#
# GIF's pixel plane is LZW-coded palette indices. The codec below is
# a complete GIF89a implementation of that plane: a real greedy-match
# LZW encoder (variable code width 9->12, clear-code table resets at
# 4096) and its decoder (including the "code == next free entry"
# KwKwK case), sub-block framing, and the global color table. The
# width-growth pairing is pinned by a long-stream property test
# (tests/test_multimodal.py) because the tiny per-document images
# here never leave 9-bit codes.

GIF_MIN_CODE = 8
GIF_STATS_SCHEMA = BMP_STATS_SCHEMA  # same statistics, GIF container


def lzw_encode(indices: bytes, min_code_size: int = GIF_MIN_CODE) -> bytes:
    """GIF-flavor LZW: greedy longest-match, LSB-first packing,
    CLEAR emitted up front and on table overflow per the spec."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out_bits: list[int] = []
    width = min_code_size + 1
    next_code = eoi + 1

    def emit(code: int) -> None:
        nonlocal width
        while next_code > (1 << width) and width < 12:
            width += 1
        for b in range(width):
            out_bits.append((code >> b) & 1)

    table = {bytes([i]): i for i in range(1 << min_code_size)}
    emit(clear)
    seq = b""
    for ix in indices:
        cand = seq + bytes([ix])
        if cand in table:
            seq = cand
            continue
        emit(table[seq])
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(1 << min_code_size)}
            next_code = eoi + 1
            width = min_code_size + 1
        seq = bytes([ix])
    if seq:
        emit(table[seq])
    emit(eoi)
    by = bytearray()
    for i in range(0, len(out_bits), 8):
        v = 0
        for j, bit in enumerate(out_bits[i : i + 8]):
            v |= bit << j
        by.append(v)
    return bytes(by)


def lzw_decode(
    data: bytes, min_code_size: int = GIF_MIN_CODE, max_out: int | None = None
) -> bytes:
    """Inverse of :func:`lzw_encode` — raises ValueError on truncated
    or ill-formed streams (callers surface that as a NULL row).

    ``max_out`` bounds the decoded length: LZW expands up to ~4096
    bytes per 12-bit code, so an adversarial stream must stop at the
    raster size the GIF header declares, not at its full expansion."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    nbits = len(data) * 8
    pos = 0
    width = min_code_size + 1
    table = [bytes([i]) for i in range(1 << min_code_size)] + [b"", b""]

    def read() -> int:
        nonlocal pos, width
        if len(table) >= (1 << width) and width < 12:
            width += 1
        if pos + width > nbits:
            raise ValueError("truncated LZW stream")
        v = 0
        for j in range(width):
            v |= ((data[(pos + j) >> 3] >> ((pos + j) & 7)) & 1) << j
        pos += width
        return v

    out = bytearray()
    prev: bytes | None = None
    while True:
        code = read()
        if code == clear:
            table = [bytes([i]) for i in range(1 << min_code_size)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise ValueError("bad first code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK self-reference case
            entry = prev + prev[:1]
            if len(table) < 4096:
                table.append(entry)
        else:
            raise ValueError("bad LZW code")
        out.extend(entry)
        if max_out is not None and len(out) > max_out:
            raise ValueError("LZW output exceeds declared raster size")
        prev = entry


def _gif_palette() -> bytes:
    """Global color table: entry i -> (R,G,B) = ((i+170)%256,
    (i+85)%256, i), so index (d+k)%256 reproduces the shared pixel
    function of the BMP/PNG rasters."""
    pal = bytearray()
    for i in range(256):
        pal += bytes([(i + 170) % 256, (i + 85) % 256, i])
    return bytes(pal)


def build_gif_from_indices(ix: np.ndarray, palette: bytes | None = None) -> bytes:
    """Serialize ANY (h, w) uint8 index array as a COMPLETE GIF89a
    (logical screen descriptor, global color table, image descriptor,
    real LZW-coded index stream in 255-byte sub-blocks, trailer).
    Exact round-trip with :func:`decode_gif_indices` is
    property-tested over random index rasters."""
    h, w = ix.shape
    if palette is None:
        palette = _gif_palette()
    lzw = lzw_encode(ix.astype(np.uint8).tobytes())
    blocks = bytearray([GIF_MIN_CODE])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks += bytes([len(chunk)]) + chunk
    blocks += b"\x00"
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # GCT, 256 colors
        + palette
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, w, h, 0)  # no LCT, no interlace
        + bytes(blocks)
        + b"\x3b"
    )


def build_gif_indexed(doc_id: int) -> bytes:
    """The deterministic per-document GIF: index (d+k)%256 through the
    default palette reproduces the shared BMP/PNG pixel function."""
    d = int(doc_id)
    w, h = d % BMP_W_MOD + 1, d % BMP_H_MOD + 1
    k = np.arange(w * h, dtype=np.int64)
    return build_gif_from_indices(((d + k) % 256).astype(np.uint8).reshape(h, w))


def decode_gif_indices(payload: bytes) -> tuple | None:
    """REAL GIF decode: header/LSD parse, global color table, image
    descriptor, sub-block reassembly, LZW decompression — returns
    (w, h, (h, w) uint8 index array, palette bytes). Returns None for
    non-GIF, interlaced, local-color-table, or corrupt payloads."""
    try:
        if bytes(payload[:6]) not in (b"GIF87a", b"GIF89a"):
            return None
        w, h, flags = struct.unpack("<HHB", payload[6:11])
        i = 13
        pal = None
        if flags & 0x80:
            n_colors = 2 << (flags & 0x07)
            pal = bytes(payload[i : i + 3 * n_colors])
            i += 3 * n_colors
        while i < len(payload) and payload[i] == 0x21:  # extensions
            i += 2
            while payload[i] != 0:
                i += 1 + payload[i]
            i += 1
        if i >= len(payload) or payload[i] != 0x2C or pal is None:
            return None
        _, _, iw, ih, iflags = struct.unpack("<HHHHB", payload[i + 1 : i + 10])
        if iflags & 0xC0:  # local color table / interlace unsupported
            return None
        i += 10
        if iw == 0 or ih == 0 or iw * ih > MAX_DECODE_PIXELS:
            return None  # header bomb: dims the data cannot back
        min_code = payload[i]
        i += 1
        lzw = bytearray()
        while i < len(payload) and payload[i] != 0:
            size = payload[i]
            lzw += payload[i + 1 : i + 1 + size]
            i += 1 + size
        indices = lzw_decode(bytes(lzw), min_code, max_out=iw * ih)
        if len(indices) != iw * ih:
            return None
        ix = np.frombuffer(indices, np.uint8).reshape(ih, iw)
        return (iw, ih, ix, pal)
    except (struct.error, ValueError, IndexError):
        return None


def decode_gif_pixel_stats(payload: bytes) -> tuple | None:
    """Per-image statistics over :func:`decode_gif_indices` output —
    palette-mapped channels, same tuple as the BMP/PNG paths."""
    r = decode_gif_indices(payload)
    if r is None:
        return None
    iw, ih, ix, pal = r
    flat = ix.astype(np.int64).ravel()
    p = np.frombuffer(pal, np.uint8).reshape(-1, 3).astype(np.int64)
    if flat.max(initial=0) >= p.shape[0]:
        return None
    sums = (int(p[flat, 2].sum()), int(p[flat, 1].sum()), int(p[flat, 0].sum()))
    return _raster_stats(iw, ih, sums)


def with_gif_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach the deterministic full GIF per row."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf[[id_col]].copy()
            out["payload"] = [build_gif_indexed(d) for d in pdf[id_col]]
            yield out

    return df.select(id_col).mapInPandas(batches, f"{id_col} bigint, payload binary")


def gif_pixel_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """mapInPandas operator: full GIF payload -> per-image pixel
    statistics via :func:`decode_gif_pixel_stats`."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            stats = [decode_gif_pixel_stats(p) for p in pdf[payload_col]]
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

    return df.select(id_col, payload_col).mapInPandas(batches, GIF_STATS_SCHEMA)
