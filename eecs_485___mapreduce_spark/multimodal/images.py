"""Image-container HEADER codecs (PNG/GIF/BMP/JPEG dimensions are
plain struct fields — a genuine production decoder for the metadata
plane, no imaging library needed) plus the deterministic payload
builders the oracle queries regenerate."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# ------------------------------------------------------------------
# REAL image-container header codecs (no imaging library needed):
# PNG / GIF / BMP / JPEG dimensions are plain struct fields, so the
# parser below is a genuine production decoder for the metadata
# plane — only pixel decode needs Pillow/libvips and stays stubbed.

import struct

IMAGE_FORMATS = ("png", "gif", "bmp", "jpeg")

IMAGE_HEADER_SCHEMA = (
    "doc_id bigint, fmt string, width bigint, height bigint, byte_len bigint"
)


def build_image_payload(fmt: str, width: int, height: int, filler: int = 0) -> bytes:
    """Serialize a minimal-but-valid image container of the given
    dimensions (header + ``filler`` padding bytes). Used to fabricate
    deterministic media payloads for the test corpus; every byte
    layout below follows the published file-format specs."""
    if fmt == "png":
        ihdr = struct.pack(">II5B", width, height, 8, 2, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13)
            + b"IHDR"
            + ihdr
            + b"\x00" * 4  # CRC placeholder (not validated here)
            + b"\x00" * filler
        )
    if fmt == "gif":
        return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00" * filler
    if fmt == "bmp":
        # BITMAPINFOHEADER: signed little-endian dims at offset 18
        return (
            b"BM"
            + b"\x00" * 16
            + struct.pack("<ii", width, height)
            + b"\x00" * filler
        )
    if fmt == "jpeg":
        # SOI, APP0 (JFIF stub), then SOF0 carrying the dimensions
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, height, width, 3)
        return b"\xff\xd8" + app0 + sof0 + b"\x00" * filler
    raise ValueError(f"unknown format {fmt!r}")


def parse_image_header(payload: bytes) -> tuple[str, int, int] | None:
    """Sniff the container magic and decode (format, width, height)
    from the header — a REAL parser over the spec'd byte layouts:
    PNG IHDR (big-endian at offset 16), GIF logical screen descriptor
    (little-endian at offset 6), BMP BITMAPINFOHEADER (signed LE at
    offset 18), JPEG SOFn marker walk. Returns None for unrecognized
    or truncated payloads (never raises on bad input — at 100 TB some
    payloads WILL be corrupt)."""
    try:
        if payload[:8] == b"\x89PNG\r\n\x1a\n" and payload[12:16] == b"IHDR":
            w, h = struct.unpack(">II", payload[16:24])
            return ("png", w, h)
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", payload[6:10])
            return ("gif", w, h)
        if payload[:2] == b"BM":
            w, h = struct.unpack("<ii", payload[18:26])
            return ("bmp", w, abs(h))  # negative height = top-down rows
        if payload[:2] == b"\xff\xd8":
            i = 2
            while i + 9 <= len(payload):
                if payload[i] != 0xFF:
                    return None
                marker = payload[i + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                    return ("jpeg", w, h)
                i += 2 + seg_len
    except (struct.error, IndexError):
        return None
    return None


def decode_image_headers(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """mapInPandas operator: binary media payload -> decoded container
    metadata via :func:`parse_image_header`. This is the REAL decode
    path (headers only); unrecognized payloads surface as fmt=NULL
    rather than failing the batch."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parsed = [parse_image_header(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "fmt": [p[0] if p else None for p in parsed],
                    "width": [p[1] if p else None for p in parsed],
                    "height": [p[2] if p else None for p in parsed],
                    "byte_len": [len(p) for p in pdf[payload_col]],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        batches, IMAGE_HEADER_SCHEMA
    )


def with_image_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic REAL image payload per row: format cycles
    through png/gif/bmp/jpeg by doc_id % 4, dimensions are fixed
    functions of doc_id — so an oracle can recompute the expected
    metadata arithmetically while Spark actually round-trips the
    bytes through build -> parse."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf[id_col]:
                fmt = IMAGE_FORMATS[int(doc_id) % 4]
                w = int(doc_id) % 640 + 1
                h = int(doc_id) % 480 + 1
                payloads.append(
                    build_image_payload(fmt, w, h, filler=int(doc_id) % 32)
                )
            out = pdf[[id_col]].copy()
            out["payload"] = payloads
            yield out

    return df.select(id_col).mapInPandas(batches, f"{id_col} bigint, payload binary")
