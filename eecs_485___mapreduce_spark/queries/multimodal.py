"""Multimodal query surface: binary-column metadata extraction.

The Spark side genuinely runs the Arrow/mapInPandas decode plumbing
(with the deterministic fake decoder — see ``multimodal`` package);
the oracle reproduces the same metadata arithmetic in SQL, so this is
a full value-hash check of the plumbing's output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..multimodal import (
    FEATURE_CHUNK,
    FRAME_CHARS,
    FRAME_STRIDE,
    N_FEATURES,
    RESIZE_FIT,
    extract_binary_meta,
    extract_features,
    plan_resize,
    sample_frames,
    with_binary_payload,
)
from ..registry import register
from ..sources import load_table


@register(
    "multimodal_binary_meta",
    tags=("multimodal", "udf"),
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           CAST(octet_length(encode(text)) % 640 AS BIGINT) AS fake_width,
           CAST(octet_length(encode(text)) % 480 AS BIGINT) AS fake_height,
           md5(text) AS payload_md5
    FROM documents
    """,
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text as an opaque binary payload -> typed metadata via
    the stubbed decoder over mapInPandas (Arrow batches).

    Note the md5 parity: DuckDB's md5(text) hashes the UTF-8 bytes,
    which is exactly the payload the Spark side hashes.
    """
    docs = load_table(spark, sf_dir, "documents")
    return extract_binary_meta(with_binary_payload(docs))


@register(
    "multimodal_frame_sample",
    bench=True,
    tags=("multimodal", "udf"),
    oracle=f"""
    WITH t AS (SELECT doc_id, text, length(text) AS n FROM documents),
    f AS (SELECT doc_id, text, n,
                 unnest(range(0, CAST(ceil(n / {FRAME_CHARS}.0) AS BIGINT),
                              {FRAME_STRIDE})) AS frame_idx
          FROM t)
    SELECT doc_id,
           frame_idx,
           frame_idx * {FRAME_CHARS} + 1 AS frame_start,
           least({FRAME_CHARS}, n - frame_idx * {FRAME_CHARS}) AS frame_len,
           md5(substring(text, frame_idx * {FRAME_CHARS} + 1, {FRAME_CHARS}))
               AS frame_md5
    FROM f
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: every {stride}-th fixed-size frame of
    each payload, fingerprinted — a 1→N mapInPandas fan-out (the decode
    itself is the deterministic fake; the row-explosion plumbing is
    real). Empty documents produce zero frames."""
    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(docs)


@register(
    "multimodal_resize_plan",
    tags=("multimodal", "udf"),
    oracle=f"""
    WITH m AS (SELECT doc_id,
                      octet_length(encode(text)) % 640 AS src_w,
                      octet_length(encode(text)) % 480 AS src_h
               FROM documents)
    SELECT doc_id,
           CAST(src_w AS BIGINT) AS src_w,
           CAST(src_h AS BIGINT) AS src_h,
           CAST(CASE WHEN src_w = 0 OR src_h = 0 THEN NULL
                     WHEN src_w >= src_h THEN {RESIZE_FIT}
                     ELSE src_w * {RESIZE_FIT} // src_h END AS BIGINT) AS dst_w,
           CAST(CASE WHEN src_w = 0 OR src_h = 0 THEN NULL
                     WHEN src_w >= src_h THEN src_h * {RESIZE_FIT} // src_w
                     ELSE {RESIZE_FIT} END AS BIGINT) AS dst_h
    FROM m
    """,
)
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize plan from fake-decoded dimensions
    (integer arithmetic only, so the oracle agrees bit-for-bit);
    degenerate dims yield NULL targets."""
    docs = load_table(spark, sf_dir, "documents")
    return plan_resize(with_binary_payload(docs))


@register(
    "multimodal_feature_extract",
    tags=("multimodal", "udf", "vector"),
    oracle=f"""
    SELECT doc_id, d AS dim,
           CAST(('0x' || substr(md5(substring(text, d * {FEATURE_CHUNK} + 1,
                                              {FEATURE_CHUNK})), 1, 15)) AS BIGINT)
               AS feature
    FROM documents
    CROSS JOIN (SELECT unnest(range(0, {N_FEATURES})) AS d)
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake feature vectors (60-bit hash per payload
    chunk) in the exploded (doc_id, dim, feature) layout the similarity
    and centroid operators consume."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(docs)
