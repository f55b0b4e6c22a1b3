"""Generic multimodal plumbing: opaque ``binary`` columns with typed
metadata, Arrow-batched over ``mapInPandas`` — fake-decode stub, frame
sampling, resize planning, and feature extraction. The REAL per-format
codecs live in the sibling modules (images/audio/bmp/png/gif/jpeg).

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
