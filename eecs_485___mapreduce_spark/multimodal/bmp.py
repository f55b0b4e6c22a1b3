"""REAL 24bpp BMP codec: full byte layout (BITMAPFILEHEADER +
BITMAPINFOHEADER, bottom-up 4-byte-padded rows) in, exact integer
pixel statistics out — uncompressed, so numpy alone decodes it."""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .raster import MAX_DECODE_PIXELS, _raster_stats

# Uncompressed payloads need nothing beyond numpy: full byte layout
# in (headers, bottom-up 4-byte-padded rows), full numeric content
# out. The entropy-coded planes live in png/gif/jpeg siblings.

# Deterministic raster: pixel k (top-down row-major) of document d has
# channels B=(d+k)%256, G=(d+k+85)%256, R=(d+k+170)%256 — chosen so a
# SQL oracle can regenerate every pixel with unnest(range(w*h)).
BMP_W_MOD, BMP_H_MOD = 16, 8
BMP_STATS_SCHEMA = (
    "doc_id bigint, width bigint, height bigint, n_pixels bigint, "
    "sum_b bigint, sum_g bigint, sum_r bigint, mean_gray_milli bigint"
)


def build_bmp_from_pixels(px: np.ndarray) -> bytes:
    """Serialize ANY (h, w, 3) uint8 BGR top-down array as a COMPLETE
    24bpp BMP (BITMAPFILEHEADER + BITMAPINFOHEADER + bottom-up,
    4-byte-padded pixel rows). Every byte follows the published spec;
    exact round-trip with :func:`decode_bmp_pixels` is property-tested
    over random rasters."""
    h, w, _ = px.shape
    stride = (3 * w + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : 3 * w] = px[::-1].reshape(h, 3 * w)  # bottom-up storage
    header = (
        b"BM"
        + struct.pack("<IHHI", 14 + 40 + stride * h, 0, 0, 54)
        + struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 2835, 2835, 0, 0
        )
    )
    return header + rows.tobytes()


def _bmp_doc_pixels(doc_id: int) -> np.ndarray:
    d = int(doc_id)
    w, h = d % BMP_W_MOD + 1, d % BMP_H_MOD + 1
    k = np.arange(w * h, dtype=np.int64)
    return (
        np.stack(
            [(d + k) % 256, (d + k + 85) % 256, (d + k + 170) % 256], axis=1
        )
        .astype(np.uint8)
        .reshape(h, w, 3)
    )


def build_bmp_raster(doc_id: int) -> bytes:
    """The deterministic per-document BMP (pixel function above)."""
    return build_bmp_from_pixels(_bmp_doc_pixels(doc_id))


def decode_bmp_pixels(payload: bytes) -> tuple | None:
    """REAL numpy BMP raster decode: header parse, bottom-up row
    unflip, stride-padding strip — returns (w, h, (h, w, 3) BGR
    top-down uint8 array), or None on anything that is not an
    uncompressed 24bpp BMP."""
    try:
        if bytes(payload[:2]) != b"BM" or len(payload) < 54:
            return None
        off = struct.unpack("<I", payload[10:14])[0]
        w, h = struct.unpack("<ii", payload[18:26])
        bpp = struct.unpack("<H", payload[28:30])[0]
        compression = struct.unpack("<I", payload[30:34])[0]
        if bpp != 24 or compression != 0 or w <= 0 or h == 0:
            return None
        top_down, h = h < 0, abs(h)
        stride = (3 * w + 3) // 4 * 4
        if off + stride * h > len(payload):
            return None
        arr = np.frombuffer(payload, np.uint8, count=stride * h, offset=off)
        px = arr.reshape(h, stride)[:, : 3 * w].reshape(h, w, 3)
        if not top_down:
            px = px[::-1]
        return (w, h, px)
    except (struct.error, ValueError):
        return None


def decode_bmp_raster_stats(payload: bytes) -> tuple | None:
    """Per-image statistics (exact integer channel sums, half-up gray
    mean) over :func:`decode_bmp_pixels` output; None degrades
    through (corruption is routine at crawl scale, never a batch
    failure)."""
    r = decode_bmp_pixels(payload)
    if r is None:
        return None
    w, h, px = r
    sums = px.reshape(-1, 3).astype(np.int64).sum(axis=0)
    return _raster_stats(w, h, (int(sums[0]), int(sums[1]), int(sums[2])))


def with_bmp_raster(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach the deterministic full BMP raster per row (Arrow
    batches; payload bytes never touch the driver)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf[[id_col]].copy()
            out["payload"] = [build_bmp_raster(d) for d in pdf[id_col]]
            yield out

    return df.select(id_col).mapInPandas(batches, f"{id_col} bigint, payload binary")


def bmp_pixel_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """mapInPandas operator: full BMP payload -> per-image pixel
    statistics via :func:`decode_bmp_raster_stats`. Undecodable
    payloads surface as width=NULL rows."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            stats = [decode_bmp_raster_stats(p) for p in pdf[payload_col]]
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

    return df.select(id_col, payload_col).mapInPandas(batches, BMP_STATS_SCHEMA)

