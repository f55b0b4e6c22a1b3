"""Multimodal query surface: binary-column metadata extraction.

The Spark side genuinely runs the Arrow/mapInPandas decode plumbing
(with the deterministic fake decoder — see ``multimodal`` package);
the oracle reproduces the same metadata arithmetic in SQL, so this is
a full value-hash check of the plumbing's output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..multimodal import extract_binary_meta, with_binary_payload
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
