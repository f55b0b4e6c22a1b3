"""Streaming ingest of the documents table: the stream-static join
that runs incremental dedup at ingest time.

``queries.dedup.dedup_incremental_exact`` is the batch statement of
the semantics (and carries the DuckDB oracle); this module is the
production deployment shape — documents arrive as a file stream, and
each micro-batch LEFT-joins the STATIC historical key index to flag
content already seen. Stream-static joins are stateless on the stream
side (no watermark needed: the static side is a snapshot re-read per
micro-batch, or a broadcast if it fits), so state never grows with
stream volume — the property that makes ingest-time dedup viable on an
unbounded corpus.

At 100 TB the history index is a bucketed table on ``k`` (see
tests/test_bucketing.py::test_incremental_dedup_history_index_bucketed
_no_exchange): each micro-batch shuffles only ITS OWN rows to the
index's bucketing; the index itself is never re-shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import canonical_text

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_documents_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Stream the documents table (directory base path + glob filter,
    same convention as read_events_stream — production shape is a
    directory of arriving part files)."""
    reader = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(sf_dir)


def content_key(text_col="text") -> F.Column:
    """The 128-bit canonical-content key — IDENTICAL to the batch
    dedup's key (md5 of whitespace-canonicalized lowercased text), so
    an index built by either path serves both."""
    return F.md5(canonical_text(text_col))


def build_history_index(docs: DataFrame) -> DataFrame:
    """DISTINCT content-key index of a historical corpus — the static
    side of the ingest join. Production materializes this bucketed on
    ``k`` and appends each accepted batch's keys back to it."""
    return (
        docs.select(content_key().alias("k"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )


def incremental_dedup_stream(
    docs_stream: DataFrame, history_index: DataFrame
) -> DataFrame:
    """Stream-static LEFT join: flag each arriving document whose
    content key already exists in the historical index — the streaming
    twin of queries.dedup.dedup_incremental_exact (same key, same join,
    same flag semantics; the batch twin carries the oracle).

    The static side may be a plain DataFrame (re-planned per
    micro-batch, so an externally-appended index is picked up on the
    next trigger) — Spark broadcasts it when small, shuffles only the
    micro-batch when not.
    """
    batch = docs_stream.select("doc_id", content_key().alias("k"))
    return batch.join(history_index, "k", "left").select(
        "doc_id",
        F.coalesce("hit", F.lit(0)).cast("bigint").alias("is_dup_of_history"),
    )
