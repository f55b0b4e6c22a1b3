"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs
over ``mapInPandas``.

The decode step is STUBBED (no image/audio libraries in this
container): :func:`decode_image_meta` raises ``NotImplementedError``
unless ``fake=True``, in which case it produces a deterministic fake
(metadata derived from the byte payload) so the Spark-side plumbing —
schema, batch iteration, partitioning — is real and tested end-to-end.

Scale: binary payloads ride parquet as BYTE_ARRAY; mapInPandas
processes them per-partition in Arrow batches, so decode parallelism
equals partition count and no payload ever visits the driver.
``spark.sql.files.maxPartitionBytes`` is the knob that keeps a batch
of blobs inside executor memory at 100 TB.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BINARY_META_SCHEMA = (
    "doc_id bigint, byte_len bigint, fake_width bigint, fake_height bigint, "
    "payload_md5 string"
)


def decode_image_meta(payload: bytes, fake: bool = False) -> dict:
    """Decode an arbitrary image payload to (width, height, ...)
    metadata via an imaging library.

    Historical stub, kept for the generic any-format path a
    Pillow/libvips deployment would provide. The engine no longer
    depends on it: every reference container now decodes for real
    with stdlib+numpy codecs below — headers (parse_image_header /
    parse_audio_header), full pixel planes (decode_bmp_raster_stats,
    decode_png_pixel_stats, decode_gif_pixel_stats,
    decode_jpeg_gray), and PCM samples (decode_wav_pcm_stats). The
    deterministic fake remains for tests of the generic Arrow path.
    """
    if not fake:
        raise NotImplementedError(
            "generic any-format image decode requires an imaging library not "
            "present in this environment; the spec'd-format codecs in this "
            "module (BMP/PNG/GIF/JPEG/WAV) decode for real — pass fake=True "
            "only for the deterministic generic-path stub"
        )
    n = len(payload)
    return {"byte_len": n, "fake_width": n % 640, "fake_height": n % 480}


def extract_binary_meta(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """mapInPandas operator: binary payload -> typed metadata row.

    This is the canonical shape for any multimodal feature extractor
    (resize, frame-sample, fingerprint): swap the per-payload function,
    keep the batch plumbing.
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            metas = [decode_image_meta(p, fake=True) for p in payloads]
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "byte_len": [m["byte_len"] for m in metas],
                    "fake_width": [m["fake_width"] for m in metas],
                    "fake_height": [m["fake_height"] for m in metas],
                    "payload_md5": [hashlib.md5(p).hexdigest() for p in payloads],
                }
            )
            yield out

    return df.select(id_col, payload_col).mapInPandas(batches, BINARY_META_SCHEMA)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a binary payload column (UTF-8 bytes of the text column).

    The test tables carry no real media, so the text bytes stand in as
    the opaque payload — the downstream plumbing is identical.
    """
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


# ------------------------------------------------------------------
# Frame sampling (video-shaped payloads)

FRAME_CHARS = 256  # fake frame = 256-char slice of the payload text
FRAME_STRIDE = 4  # sample every 4th frame

FRAME_SCHEMA = (
    "doc_id bigint, frame_idx bigint, frame_start bigint, frame_len bigint, "
    "frame_md5 string"
)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    frame_chars: int = FRAME_CHARS,
    stride: int = FRAME_STRIDE,
) -> DataFrame:
    """mapInPandas frame sampler: one output row per sampled frame.

    A real video decoder would seek to every ``stride``-th frame and
    emit (timestamp, jpeg_bytes); the deterministic fake slices the
    payload into fixed-size frames and fingerprints each sampled slice.
    The 1→N row fan-out, Arrow batching, and schema are the real
    production shape.

    Scale: fan-out happens executor-side per Arrow batch; no shuffle,
    no driver involvement. Output partitioning inherits the scan.
    """
    import hashlib
    import math

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, starts, lens, md5s = [], [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                n = len(text)
                n_frames = math.ceil(n / frame_chars)
                for fi in range(0, n_frames, stride):
                    off = fi * frame_chars
                    chunk = text[off : off + frame_chars]
                    ids.append(doc_id)
                    idxs.append(fi)
                    starts.append(off + 1)  # 1-based, matches SQL substring
                    lens.append(len(chunk))
                    md5s.append(hashlib.md5(chunk.encode("utf-8")).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_start": pd.Series(starts, dtype="int64"),
                    "frame_len": pd.Series(lens, dtype="int64"),
                    "frame_md5": pd.Series(md5s, dtype="object"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(batches, FRAME_SCHEMA)


# ------------------------------------------------------------------
# Resize planning (image-shaped payloads)

RESIZE_FIT = 128  # fit into a 128x128 box, aspect preserved

RESIZE_SCHEMA = "doc_id bigint, src_w bigint, src_h bigint, dst_w bigint, dst_h bigint"


def plan_resize(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    fit: int = RESIZE_FIT,
) -> DataFrame:
    """mapInPandas resize planner: fake-decode dims, then compute the
    aspect-preserving fit into a ``fit`` x ``fit`` box.

    A real implementation decodes pixels and interpolates; the stub
    stops at the dimension plan (all-integer arithmetic so the oracle
    agrees bit-for-bit). Degenerate dims (0-width/height fakes) yield
    NULL targets rather than a divide-by-zero.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"doc_id": [], "src_w": [], "src_h": [], "dst_w": [], "dst_h": []}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                m = decode_image_meta(payload, fake=True)
                w, h = m["fake_width"], m["fake_height"]
                if w == 0 or h == 0:
                    dw = dh = None
                elif w >= h:
                    dw, dh = fit, (h * fit) // w
                else:
                    dw, dh = (w * fit) // h, fit
                rows["doc_id"].append(doc_id)
                rows["src_w"].append(w)
                rows["src_h"].append(h)
                rows["dst_w"].append(dw)
                rows["dst_h"].append(dh)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    "src_w": pd.Series(rows["src_w"], dtype="int64"),
                    "src_h": pd.Series(rows["src_h"], dtype="int64"),
                    "dst_w": pd.Series(rows["dst_w"], dtype="Int64"),
                    "dst_h": pd.Series(rows["dst_h"], dtype="Int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, RESIZE_SCHEMA)


# ------------------------------------------------------------------
# Feature extraction (embedding-shaped output)

N_FEATURES = 8
FEATURE_CHUNK = 64  # each feature hashes one 64-char slice

FEATURE_SCHEMA = "doc_id bigint, dim bigint, feature bigint"


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = N_FEATURES,
    chunk: int = FEATURE_CHUNK,
) -> DataFrame:
    """mapInPandas feature extractor: an ``n_features``-dim deterministic
    fake embedding (60-bit hash of each payload chunk), exploded to
    (doc_id, dim, feature) rows.

    A real extractor runs a vision/audio model per Arrow batch and
    yields float vectors; swap the per-chunk function, keep the batch
    plumbing and exploded layout (the layout every downstream
    similarity/centroid operator in this engine consumes).
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, dims, feats = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                for d in range(n_features):
                    piece = text[d * chunk : (d + 1) * chunk]
                    hx = hashlib.md5(piece.encode("utf-8")).hexdigest()
                    ids.append(doc_id)
                    dims.append(d)
                    feats.append(int(hx[:15], 16))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "dim": pd.Series(dims, dtype="int64"),
                    "feature": pd.Series(feats, dtype="int64"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(batches, FEATURE_SCHEMA)


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


# ---------------------------------------------- audio containers

AUDIO_FORMATS = ("wav", "aiff")
AUDIO_RATES = (8000, 16000, 22050, 44100)

AUDIO_HEADER_SCHEMA = (
    "doc_id bigint, fmt string, channels bigint, sample_rate bigint, "
    "n_frames bigint, byte_len bigint"
)


def _f80_encode(value: int) -> bytes:
    """IEEE 754 80-bit extended float of a positive integer — the
    sample-rate encoding the AIFF COMM chunk mandates."""
    if value <= 0:
        return b"\x00" * 10
    e = value.bit_length() - 1
    mantissa = value << (63 - e)
    return struct.pack(">HQ", 16383 + e, mantissa)


def _f80_decode(raw: bytes) -> int:
    exp, mantissa = struct.unpack(">HQ", raw)
    if exp == 0 and mantissa == 0:
        return 0
    shift = 63 - (exp - 16383)
    return mantissa >> shift if 0 <= shift < 64 else 0


def build_audio_payload(
    fmt: str, channels: int, sample_rate: int, n_frames: int, bits: int = 16
) -> bytes:
    """Serialize a minimal-but-valid audio container (headers only, no
    sample data beyond zero filler) per the published RIFF/WAVE and
    AIFF specs."""
    block_align = channels * bits // 8
    if fmt == "wav":
        data_len = n_frames * block_align
        fmt_chunk = b"fmt " + struct.pack(
            "<IHHIIHH",
            16,
            1,
            channels,
            sample_rate,
            sample_rate * block_align,
            block_align,
            bits,
        )
        data_chunk = b"data" + struct.pack("<I", data_len)
        body = b"WAVE" + fmt_chunk + data_chunk
        return b"RIFF" + struct.pack("<I", len(body) + data_len) + body
    if fmt == "aiff":
        comm = (
            b"COMM"
            + struct.pack(">I", 18)
            + struct.pack(">hIh", channels, n_frames, bits)
            + _f80_encode(sample_rate)
        )
        body = b"AIFF" + comm
        return b"FORM" + struct.pack(">I", len(body)) + body
    raise ValueError(f"unknown audio format {fmt!r}")


def parse_audio_header(payload: bytes) -> tuple[str, int, int, int] | None:
    """Decode (format, channels, sample_rate, n_frames) from a RIFF/
    WAVE or AIFF container — a REAL chunk-walking parser over the
    spec'd layouts (WAV: little-endian fmt/data chunks; AIFF:
    big-endian COMM with an 80-bit extended-float rate). Returns None
    on unrecognized/truncated bytes, never raises."""
    try:
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            i, channels, rate, block_align, data_len = 12, None, None, None, None
            while i + 8 <= len(payload):
                cid = payload[i : i + 4]
                clen = struct.unpack("<I", payload[i + 4 : i + 8])[0]
                if cid == b"fmt ":
                    _, channels, rate, _, block_align, _ = struct.unpack(
                        "<HHIIHH", payload[i + 8 : i + 24]
                    )
                elif cid == b"data":
                    data_len = clen
                    # header-only payloads may omit the sample bytes:
                    # the declared length is the contract
                    i += 8
                    continue
                i += 8 + clen
            if channels and rate and data_len is not None and block_align:
                return ("wav", channels, rate, data_len // block_align)
            return None
        if payload[:4] == b"FORM" and payload[8:12] == b"AIFF":
            i = 12
            while i + 8 <= len(payload):
                cid = payload[i : i + 4]
                clen = struct.unpack(">I", payload[i + 4 : i + 8])[0]
                if cid == b"COMM" and clen >= 18:
                    channels, n_frames, _bits = struct.unpack(
                        ">hIh", payload[i + 8 : i + 16]
                    )
                    rate = _f80_decode(payload[i + 16 : i + 26])
                    return ("aiff", channels, rate, n_frames)
                i += 8 + clen
    except (struct.error, IndexError):
        return None
    return None


def with_audio_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic REAL audio payload per row (format,
    channels, rate, and frame count are fixed functions of the id) so
    an oracle can recompute expected metadata arithmetically while
    Spark round-trips actual bytes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                payloads.append(
                    build_audio_payload(
                        AUDIO_FORMATS[d % 2],
                        1 + d % 2,
                        AUDIO_RATES[d % 4],
                        d % 1000 + 1,
                    )
                )
            out = pdf[[id_col]].copy()
            out["payload"] = payloads
            yield out

    return df.select(id_col).mapInPandas(
        batches, f"{id_col} bigint, payload binary"
    )


def decode_audio_headers(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """mapInPandas operator: audio container bytes -> decoded metadata
    via :func:`parse_audio_header`; corrupt payloads yield fmt=NULL
    rows, never batch failures."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parsed = [parse_audio_header(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "fmt": [p[0] if p else None for p in parsed],
                    "channels": [p[1] if p else None for p in parsed],
                    "sample_rate": [p[2] if p else None for p in parsed],
                    "n_frames": [p[3] if p else None for p in parsed],
                    "byte_len": [len(p) for p in pdf[payload_col]],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        batches, AUDIO_HEADER_SCHEMA
    )


# ------------------- full-payload pixel/sample decode (uncompressed)
#
# The container-limitation stub (decode_image_meta) covers formats
# whose pixel planes are entropy-coded (PNG/JPEG/GIF need inflate /
# Huffman / LZW). Uncompressed payloads need nothing beyond numpy:
# a 24bpp BMP raster and PCM16 WAV samples decode FOR REAL below —
# full byte layout in (headers, bottom-up padded rows, chunk walks),
# full numeric content out.

import math

import numpy as np

# Decompression-bomb guard shared by every pixel decoder: a corrupt
# or adversarial payload can DECLARE dimensions (PNG IHDR uint32, JPEG
# SOF uint16, GIF LSD uint16) wildly larger than the data it carries,
# and a crafted compressed stream can expand far beyond its wire size
# (zlib up to ~1032x, GIF LZW up to ~4096 bytes per 12-bit code). At
# crawl scale some payloads WILL be hostile, and the failure mode must
# be a NULL row — never an unbounded allocation (a 65535x65535 JPEG
# SOF would otherwise ask numpy for 3 x 34 GB planes and kill the
# executor with an uncaught MemoryError). Decoders reject any image
# declaring more than this many pixels, and bound every inflate to
# the size the declared dimensions imply.
MAX_DECODE_PIXELS = 1 << 24  # 16.7M px (~4096x4096) >> any test raster

# Deterministic raster: pixel k (top-down row-major) of document d has
# channels B=(d+k)%256, G=(d+k+85)%256, R=(d+k+170)%256 — chosen so a
# SQL oracle can regenerate every pixel with unnest(range(w*h)).
BMP_W_MOD, BMP_H_MOD = 16, 8
BMP_STATS_SCHEMA = (
    "doc_id bigint, width bigint, height bigint, n_pixels bigint, "
    "sum_b bigint, sum_g bigint, sum_r bigint, mean_gray_milli bigint"
)


def _round_half_up(x: float) -> int:
    """ROUND() as Spark/DuckDB do it for positive values (half away
    from zero); Python's round() is banker's and must not be used."""
    return int(math.floor(x + 0.5))


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


def _raster_stats(w: int, h: int, sums: tuple[int, int, int]) -> tuple:
    n = w * h
    mean_gray_milli = _round_half_up(1000.0 * float(sum(sums)) / (3 * n))
    return (w, h, n, sums[0], sums[1], sums[2], mean_gray_milli)


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


# Deterministic PCM: sample k of document d is
# ((d*31 + 7k) % 65536) - 32768, mono, 16-bit little-endian.
WAV_N_MOD = 500
WAV_STATS_SCHEMA = (
    "doc_id bigint, n_samples bigint, sum_abs bigint, peak bigint, rms_milli bigint"
)


def build_wav_pcm(doc_id: int) -> bytes:
    """Serialize a COMPLETE RIFF/WAVE file (fmt chunk: PCM, mono,
    16-bit; data chunk: the deterministic samples above)."""
    d = int(doc_id)
    n = d % WAV_N_MOD + 1
    k = np.arange(n, dtype=np.int64)
    data = (((d * 31 + 7 * k) % 65536) - 32768).astype("<i2").tobytes()
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav_pcm_stats(payload: bytes) -> tuple | None:
    """REAL numpy PCM decode: RIFF chunk walk to fmt/data, 16-bit
    little-endian sample recovery, then exact integer amplitude
    statistics and the half-up RMS. Returns None for anything that is
    not mono 16-bit PCM."""
    try:
        if bytes(payload[:4]) != b"RIFF" or bytes(payload[8:12]) != b"WAVE":
            return None
        i, fmt_ok, data = 12, False, None
        while i + 8 <= len(payload):
            cid = bytes(payload[i : i + 4])
            size = struct.unpack("<I", payload[i + 4 : i + 8])[0]
            body = payload[i + 8 : i + 8 + size]
            if cid == b"fmt " and size >= 16:
                audio_fmt, channels, _, _, _, bits = struct.unpack(
                    "<HHIIHH", body[:16]
                )
                fmt_ok = audio_fmt == 1 and channels == 1 and bits == 16
            elif cid == b"data":
                data = body
            i += 8 + size + (size & 1)  # RIFF chunks are word-aligned
        if not fmt_ok or data is None or len(data) % 2:
            return None
        x = np.frombuffer(data, dtype="<i2").astype(np.int64)
        n = int(x.size)
        if n == 0:
            return None
        sum_sq = int((x * x).sum())
        rms_milli = _round_half_up(1000.0 * math.sqrt(sum_sq / n))
        return (n, int(np.abs(x).sum()), int(np.abs(x).max()), rms_milli)
    except (struct.error, ValueError):
        return None


def with_wav_pcm(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach the deterministic full PCM WAV payload per row."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf[[id_col]].copy()
            out["payload"] = [build_wav_pcm(d) for d in pdf[id_col]]
            yield out

    return df.select(id_col).mapInPandas(batches, f"{id_col} bigint, payload binary")


def wav_sample_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """mapInPandas operator: full WAV payload -> per-clip amplitude
    statistics via :func:`decode_wav_pcm_stats`."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            stats = [decode_wav_pcm_stats(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_samples": [s[0] if s else None for s in stats],
                    "sum_abs": [s[1] if s else None for s in stats],
                    "peak": [s[2] if s else None for s in stats],
                    "rms_milli": [s[3] if s else None for s in stats],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, WAV_STATS_SCHEMA)


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


# ---------------------- REAL baseline JPEG decode (Huffman+DCT path)
#
# The last pixel plane: a baseline sequential JPEG codec for 8-bit
# grayscale. The DECODER is fully general for that class — marker
# walk, DQT/DHT parsing (canonical Huffman built from the stream, not
# hard-wired tables), entropy decode with 0xFF00 unstuffing, DC DPCM
# with EXTEND, AC run/size with EOB and ZRL, dequantization, exact
# float64 IDCT, level shift and clamp. The ENCODER writes legal
# streams two ways: per-block-constant images whose DC-only path is
# arithmetically EXACT (quant step 16 divides 16*delta — these carry
# the SQL oracle), and fully textured images through a real forward
# DCT + run-length AC Huffman (lossy by nature, certified by a
# reconstruction-error bound test instead of an oracle).

_JPEG_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)
_JPEG_QTABLE = (16,) * 64  # flat, legal; DC step 16 => exact DC path
_JPEG_DC_BITS = (0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
_JPEG_DC_VALS = tuple(range(12))
# EOB at length 1 for the DC-only builder; the textured builder uses
# a wider table (EOB len 2, ZRL len 9, all run/size codes len 16).
_JPEG_AC_BITS_EOB = (1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
_JPEG_AC_VALS_EOB = (0x00,)
_JPEG_AC_BITS_FULL = (0, 1, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 160)
_JPEG_AC_VALS_FULL = (0x00, 0xF0) + tuple(
    (r << 4) | s for r in range(16) for s in range(1, 11)
)

JPEG_STATS_SCHEMA = (
    "doc_id bigint, width bigint, height bigint, n_blocks bigint, "
    "sum_y bigint, mean_y_milli bigint"
)


def _jpeg_canonical(bits, vals):
    codes = {}
    code = k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _JpegBitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, width: int) -> None:
        for i in range(width - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        while self.n:
            self.put(1, 1)  # pad with 1-bits per spec
        return bytes(self.buf)

    def restart(self, k: int) -> None:
        """Pad to a byte boundary and emit RSTk (0xFFD0+k) — restart
        markers sit OUTSIDE the entropy stream, so no byte stuffing."""
        while self.n:
            self.put(1, 1)
        self.buf += bytes([0xFF, 0xD0 + (k & 7)])


class _JpegBitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.i = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.i >= len(self.data):
                raise ValueError("truncated entropy stream")
            b = self.data[self.i]
            self.i += 1
            if b == 0xFF:
                if self.i >= len(self.data) or self.data[self.i] != 0x00:
                    raise ValueError("marker inside entropy data")
                self.i += 1  # unstuff
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self, k: int) -> None:
        """Byte-align (discarding pad bits) and consume the expected
        RSTk marker; raises on a missing or out-of-sequence marker."""
        self.n = 0
        if (
            self.i + 2 > len(self.data)
            or self.data[self.i] != 0xFF
            or self.data[self.i + 1] != 0xD0 + (k & 7)
        ):
            raise ValueError("missing or out-of-sequence restart marker")
        self.i += 2


def _jpeg_decode_table(bits, vals):
    table = {}
    code = k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _jpeg_read_huff(br: _JpegBitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid huffman code")


def _jpeg_extend(v: int, t: int) -> int:
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _jpeg_cos_basis() -> np.ndarray:
    cu = np.array([1 / math.sqrt(2)] + [1.0] * 7)
    cos = np.array(
        [
            [math.cos((2 * i + 1) * u * math.pi / 16) for u in range(8)]
            for i in range(8)
        ]
    )
    return cos * cu


def _jpeg_idct2(coef: np.ndarray) -> np.ndarray:
    basis = _jpeg_cos_basis()
    return 0.25 * basis @ coef @ basis.T


def _jpeg_dct2(block: np.ndarray) -> np.ndarray:
    basis = _jpeg_cos_basis()
    return 0.25 * basis.T @ block @ basis


def _jpeg_segments(
    h: int, w: int, ac_bits, ac_vals, restart_interval: int = 0
) -> tuple[bytes, bytes]:
    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dri = (
        seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    )
    head = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0]) + bytes(_JPEG_QTABLE))
        + seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
        + seg(
            0xC4,
            bytes([0x00])
            + bytes(_JPEG_DC_BITS)
            + bytes(_JPEG_DC_VALS)
            + bytes([0x10])
            + bytes(ac_bits)
            + bytes(ac_vals),
        )
        + dri
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    )
    return head, b"\xff\xd9"


def build_jpeg_gray(doc_id: int) -> bytes:
    """Serialize a COMPLETE baseline JPEG whose 8x8 blocks are each a
    constant luma ``128 + 2*(((d + 7b) % 64) - 32)`` — even offsets,
    so the DC path (the only nonzero coefficients) quantizes EXACTLY
    and a SQL oracle can regenerate every pixel. Real DC DPCM Huffman
    coding, real byte stuffing, real markers."""
    d = int(doc_id)
    wb, hb = d % 3 + 1, d % 2 + 1
    dc_codes = _jpeg_canonical(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_canonical(_JPEG_AC_BITS_EOB, _JPEG_AC_VALS_EOB)
    bw = _JpegBitWriter()
    prev_dc = 0
    for b in range(wb * hb):
        dcq = ((d + 7 * b) % 64) - 32  # DC coeff 16*delta / Qstep 16
        diff = dcq - prev_dc
        prev_dc = dcq
        t = abs(diff).bit_length()
        code, ln = dc_codes[t]
        bw.put(code, ln)
        if t:
            bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
        code, ln = ac_codes[0x00]
        bw.put(code, ln)  # EOB: all AC zero
    head, tail = _jpeg_segments(8 * hb, 8 * wb, _JPEG_AC_BITS_EOB, _JPEG_AC_VALS_EOB)
    return head + bw.flush() + tail


def _jpeg_encode_block(
    bw: _JpegBitWriter, block: np.ndarray, prev_dc: int, dc_codes, ac_codes
) -> int:
    """Forward path for ONE level-shifted 8x8 block: float64 DCT, flat
    quantization, DC DPCM + AC run/size Huffman with EOB/ZRL. Returns
    the new DC predictor."""
    coef = _jpeg_dct2(block)
    zz = [
        _round_half_up(coef.flat[_JPEG_ZIGZAG[i]] / _JPEG_QTABLE[i])
        if coef.flat[_JPEG_ZIGZAG[i]] >= 0
        else -_round_half_up(-coef.flat[_JPEG_ZIGZAG[i]] / _JPEG_QTABLE[i])
        for i in range(64)
    ]
    diff = zz[0] - prev_dc
    t = abs(diff).bit_length()
    code, ln = dc_codes[t]
    bw.put(code, ln)
    if t:
        bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    k = 1
    while k < 64:
        run = 0
        while k < 64 and zz[k] == 0:
            run += 1
            k += 1
        if k == 64:
            code, ln = ac_codes[0x00]
            bw.put(code, ln)
            break
        while run >= 16:
            code, ln = ac_codes[0xF0]
            bw.put(code, ln)
            run -= 16
        v = zz[k]
        size = abs(v).bit_length()
        code, ln = ac_codes[(run << 4) | size]
        bw.put(code, ln)
        bw.put(v if v >= 0 else v + (1 << size) - 1, size)
        k += 1
    return zz[0]


def build_jpeg_textured(img: np.ndarray, restart_interval: int = 0) -> bytes:
    """Serialize an arbitrary 8-bit grayscale image (dims multiples of
    8) through the REAL forward path: level shift, float64 DCT, flat
    quantization, DC DPCM + AC run/size Huffman with EOB/ZRL, and —
    when ``restart_interval`` is nonzero — DRI/RSTn restart markers
    every that many MCUs (byte-aligned, DC predictor reset, cycling
    RST0..RST7), the resynchronization structure most camera JPEGs
    carry. Lossy like any JPEG; used by the reconstruction-bound
    tests."""
    h, w = img.shape
    wb, hb = w // 8, h // 8
    dc_codes = _jpeg_canonical(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_canonical(_JPEG_AC_BITS_FULL, _JPEG_AC_VALS_FULL)
    bw = _JpegBitWriter()
    prev_dc = 0
    mcu = 0
    rst = 0
    for by in range(hb):
        for bx in range(wb):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.restart(rst)
                rst = (rst + 1) % 8
                prev_dc = 0
            mcu += 1
            block = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(
                np.float64
            ) - 128
            prev_dc = _jpeg_encode_block(bw, block, prev_dc, dc_codes, ac_codes)
    head, tail = _jpeg_segments(
        h, w, _JPEG_AC_BITS_FULL, _JPEG_AC_VALS_FULL, restart_interval
    )
    return head + bw.flush() + tail


def decode_jpeg_baseline(payload: bytes) -> tuple | None:
    """REAL baseline JPEG decode for 8-bit images with 1x1 sampling
    (grayscale or 4:4:4 color): returns (width, height,
    n_blocks_per_component, [per-component float planes]) or None for
    anything outside that class (progressive, subsampled chroma,
    16-bit quant, corrupt). DRI/RSTn restart intervals are honored
    (byte-aligned resync, all DC predictors reset, RST0..7 sequence
    check)."""
    try:
        if bytes(payload[:2]) != b"\xff\xd8":
            return None
        i = 2
        qt: dict[int, list[int]] = {}
        dc_tabs: dict[int, dict] = {}
        ac_tabs: dict[int, dict] = {}
        w = h = None
        comp_qs: list[int] = []
        comp_ids: list[int] = []
        sels: dict[int, tuple[int, int]] = {}
        restart_interval = 0
        entropy_start = None
        while i + 4 <= len(payload):
            if payload[i] != 0xFF:
                return None
            marker = payload[i + 1]
            if marker == 0xD9:
                break
            (ln,) = struct.unpack(">H", payload[i + 2 : i + 4])
            body = bytes(payload[i + 4 : i + 2 + ln])
            if marker == 0xDB:
                j = 0
                while j < len(body):
                    if body[j] >> 4 != 0:
                        return None  # 16-bit tables unsupported
                    qt[body[j] & 15] = list(body[j + 1 : j + 65])
                    j += 65
            elif marker == 0xC0:
                prec, h, w, nc = struct.unpack(">BHHB", body[:6])
                if prec != 8 or nc not in (1, 3):
                    return None
                for c in range(nc):
                    cid, sampling, tq = body[6 + 3 * c : 9 + 3 * c]
                    if sampling != 0x11:
                        return None  # subsampled chroma unsupported
                    comp_ids.append(cid)
                    comp_qs.append(tq)
            elif marker in (0xC1, 0xC2, 0xC3):
                return None  # non-baseline SOF
            elif marker == 0xDD:
                restart_interval = struct.unpack(">H", body[:2])[0]
            elif marker == 0xC4:
                j = 0
                while j < len(body):
                    tc_th = body[j]
                    bits = list(body[j + 1 : j + 17])
                    nv = sum(bits)
                    vals = list(body[j + 17 : j + 17 + nv])
                    t = _jpeg_decode_table(bits, vals)
                    (dc_tabs if tc_th >> 4 == 0 else ac_tabs)[tc_th & 15] = t
                    j += 17 + nv
            elif marker == 0xDA:
                ns = body[0]
                for c in range(ns):
                    cs, sel = body[1 + 2 * c], body[2 + 2 * c]
                    sels[cs] = (sel >> 4, sel & 15)
                entropy_start = i + 2 + ln
                break
            i += 2 + ln
        if entropy_start is None or w is None or not comp_ids:
            return None
        if w == 0 or h == 0 or w * h > MAX_DECODE_PIXELS:
            # A 2-byte SOF field can declare 65535x65535: three ~34 GB
            # float64 planes. Reject before any allocation.
            return None
        if any(tq not in qt for tq in comp_qs) or any(
            cid not in sels for cid in comp_ids
        ):
            return None
        if any(
            sels[cid][0] not in dc_tabs or sels[cid][1] not in ac_tabs
            for cid in comp_ids
        ):
            # A corrupt SOS can select a huffman table no DHT defined
            # (fuzz-caught: KeyError escaped the except clause).
            return None
        j = entropy_start
        while j + 1 < len(payload) and not (
            payload[j] == 0xFF and payload[j + 1] == 0xD9
        ):
            j += 1
        br = _JpegBitReader(bytes(payload[entropy_start:j]))
        qs = [np.array(qt[tq], dtype=np.float64) for tq in comp_qs]
        wb, hb = (w + 7) // 8, (h + 7) // 8
        planes = [np.zeros((hb * 8, wb * 8)) for _ in comp_ids]
        prev_dc = [0] * len(comp_ids)
        mcu = 0
        rst = 0
        for by in range(hb):
            for bx in range(wb):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    br.sync_restart(rst)
                    rst = (rst + 1) % 8
                    prev_dc = [0] * len(comp_ids)
                mcu += 1
                for c, cid in enumerate(comp_ids):
                    dc_sel, ac_sel = sels[cid]
                    zz = [0] * 64
                    t = _jpeg_read_huff(br, dc_tabs[dc_sel])
                    if t:
                        prev_dc[c] += _jpeg_extend(br.bits(t), t)
                    zz[0] = prev_dc[c]
                    k = 1
                    while k < 64:
                        rs = _jpeg_read_huff(br, ac_tabs[ac_sel])
                        if rs == 0x00:
                            break  # EOB
                        if rs == 0xF0:
                            k += 16
                            continue  # ZRL
                        run, size = rs >> 4, rs & 15
                        k += run
                        if k > 63 or size == 0:
                            raise ValueError("bad AC symbol")
                        zz[k] = _jpeg_extend(br.bits(size), size)
                        k += 1
                    coef = np.zeros(64)
                    for idx in range(64):
                        coef[_JPEG_ZIGZAG[idx]] = zz[idx] * qs[c][idx]
                    planes[c][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                        _jpeg_idct2(coef.reshape(8, 8)) + 128
                    )
        return (w, h, wb * hb, [p[:h, :w] for p in planes])
    except (struct.error, ValueError, IndexError):
        return None


def decode_jpeg_gray(payload: bytes) -> tuple | None:
    """Single-component wrapper over :func:`decode_jpeg_baseline`:
    returns (width, height, n_blocks, int64 pixel ndarray)."""
    r = decode_jpeg_baseline(payload)
    if r is None or len(r[3]) != 1:
        return None
    w, h, nb, planes = r
    px = np.clip(np.floor(planes[0] + 0.5), 0, 255).astype(np.int64)
    return (w, h, nb, px)


def decode_jpeg_color(payload: bytes) -> tuple | None:
    """Three-component wrapper over :func:`decode_jpeg_baseline`:
    JFIF YCbCr -> RGB conversion, returns (width, height, (h, w, 3)
    int64 RGB array)."""
    r = decode_jpeg_baseline(payload)
    if r is None or len(r[3]) != 3:
        return None
    w, h, _, (y, cb, cr) = r
    red = y + 1.402 * (cr - 128)
    green = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    blue = y + 1.772 * (cb - 128)
    rgb = np.stack([red, green, blue], axis=2)
    return (w, h, np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.int64))


def decode_jpeg_pixel_stats(payload: bytes) -> tuple | None:
    """Per-image statistics over :func:`decode_jpeg_gray` output."""
    r = decode_jpeg_gray(payload)
    if r is None:
        return None
    w, h, nb, px = r
    s = int(px.sum())
    return (w, h, nb, s, _round_half_up(1000.0 * float(s) / (w * h)))


def with_jpeg_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach the deterministic DC-exact baseline JPEG per row."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf[[id_col]].copy()
            out["payload"] = [build_jpeg_gray(d) for d in pdf[id_col]]
            yield out

    return df.select(id_col).mapInPandas(batches, f"{id_col} bigint, payload binary")


def jpeg_pixel_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """mapInPandas operator: baseline JPEG payload -> per-image pixel
    statistics via the full Huffman+IDCT decode path."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            stats = [decode_jpeg_pixel_stats(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": [s[0] if s else None for s in stats],
                    "height": [s[1] if s else None for s in stats],
                    "n_blocks": [s[2] if s else None for s in stats],
                    "sum_y": [s[3] if s else None for s in stats],
                    "mean_y_milli": [s[4] if s else None for s in stats],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, JPEG_STATS_SCHEMA)


def build_aiff_pcm(doc_id: int) -> bytes:
    """Serialize a COMPLETE AIFF (FORM/AIFF, COMM with the 80-bit
    extended-float rate, SSND with offset/blocksize prefix) carrying
    the SAME deterministic PCM samples as :func:`build_wav_pcm`,
    big-endian as the AIFF spec mandates."""
    d = int(doc_id)
    n = d % WAV_N_MOD + 1
    k = np.arange(n, dtype=np.int64)
    data = (((d * 31 + 7 * k) % 65536) - 32768).astype(">i2").tobytes()
    comm = struct.pack(">hIh", 1, n, 16) + _f80_encode(8000)
    ssnd = struct.pack(">II", 0, 0) + data
    body = (
        b"AIFF"
        + b"COMM"
        + struct.pack(">I", len(comm))
        + comm
        + b"SSND"
        + struct.pack(">I", len(ssnd))
        + ssnd
    )
    return b"FORM" + struct.pack(">I", len(body)) + body


def decode_aiff_pcm_stats(payload: bytes) -> tuple | None:
    """REAL AIFF PCM decode — the big-endian twin of
    :func:`decode_wav_pcm_stats`: FORM/AIFF chunk walk to COMM/SSND,
    big-endian sample recovery, identical statistics tuple (so the
    two containers cross-certify on the shared sample function)."""
    try:
        if bytes(payload[:4]) != b"FORM" or bytes(payload[8:12]) != b"AIFF":
            return None
        i, comm_ok, data = 12, False, None
        while i + 8 <= len(payload):
            cid = bytes(payload[i : i + 4])
            size = struct.unpack(">I", payload[i + 4 : i + 8])[0]
            body = payload[i + 8 : i + 8 + size]
            if cid == b"COMM" and size >= 18:
                channels, _, bits = struct.unpack(">hIh", body[:8])
                comm_ok = channels == 1 and bits == 16
            elif cid == b"SSND" and size >= 8:
                data = body[8:]
            i += 8 + size + (size & 1)  # IFF chunks are word-aligned
        if not comm_ok or data is None or len(data) % 2:
            return None
        x = np.frombuffer(data, dtype=">i2").astype(np.int64)
        n = int(x.size)
        if n == 0:
            return None
        rms_milli = _round_half_up(1000.0 * math.sqrt(int((x * x).sum()) / n))
        return (n, int(np.abs(x).sum()), int(np.abs(x).max()), rms_milli)
    except (struct.error, ValueError):
        return None


def build_jpeg_color_textured(
    rgb: np.ndarray, restart_interval: int = 0
) -> bytes:
    """Serialize an arbitrary (h, w, 3) uint8 RGB image (dims
    multiples of 8) as a baseline 4:4:4 COLOR JPEG: JFIF RGB->YCbCr,
    per-component forward DCT + quantization, interleaved Y/Cb/Cr
    MCUs with separate DC predictors (all sharing the flat quant
    table and canonical Huffman tables — legal and simplest), plus
    optional DRI/RSTn restart structure. Lossy; certified by the
    color reconstruction-bound test."""
    h, w, _ = rgb.shape
    wb, hb = w // 8, h // 8
    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    planes = [y, cb, cr]
    dc_codes = _jpeg_canonical(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_canonical(_JPEG_AC_BITS_FULL, _JPEG_AC_VALS_FULL)
    bw = _JpegBitWriter()
    prev_dc = [0, 0, 0]
    mcu = 0
    rst = 0
    for by in range(hb):
        for bx in range(wb):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.restart(rst)
                rst = (rst + 1) % 8
                prev_dc = [0, 0, 0]
            mcu += 1
            for c, plane in enumerate(planes):
                block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128
                prev_dc[c] = _jpeg_encode_block(
                    bw, block, prev_dc[c], dc_codes, ac_codes
                )

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dri = (
        seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    )
    head = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0]) + bytes(_JPEG_QTABLE))
        + seg(
            0xC0,
            struct.pack(">BHHB", 8, h, w, 3)
            + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]),
        )
        + seg(
            0xC4,
            bytes([0x00])
            + bytes(_JPEG_DC_BITS)
            + bytes(_JPEG_DC_VALS)
            + bytes([0x10])
            + bytes(_JPEG_AC_BITS_FULL)
            + bytes(_JPEG_AC_VALS_FULL),
        )
        + dri
        + seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    )
    return head + bw.flush() + b"\xff\xd9"
