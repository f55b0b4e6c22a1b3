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


# ----------------------- streaming incremental MinHash near-dup

def doc_shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle-set) of any documents relation — identical
    shingling to queries.dedup's persisted relation (two-step
    projection so the tokenizer runs once per doc)."""
    from ..functions import shingles, tokens

    return docs.select("doc_id", tokens("text").alias("tok")).select(
        "doc_id", shingles(F.col("tok")).alias("sh")
    )


def build_minhash_history(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The TWO materialized relations a production near-dup ingest
    keeps for its historical corpus: the (band, k1, k2) LSH band index
    (bucket-join side of candidate generation — bucketed on the band
    key at scale) and the (doc_id, shingle-set) relation (exact-
    Jaccard verification side). Returns (bands, shingles)."""
    from ..queries.dedup import _minhash_bands

    sh = doc_shingles(docs)
    return _minhash_bands(sh), sh.withColumnRenamed("doc_id", "hist_id")


def minhash_flag_batch(
    batch_docs: DataFrame, hist_bands: DataFrame, hist_shingles: DataFrame
) -> DataFrame:
    """One ingest batch against the historical index: sketch the
    arriving documents, band-bucket equi-join the index, verify
    candidates by exact shingle Jaccard, and flag — semantics
    IDENTICAL to queries.dedup.dedup_incremental_minhash (which
    carries the DuckDB oracle); this is the shared per-micro-batch
    core of the streaming deployment below. Candidate work is
    proportional to band-bucket collisions, never |batch| x |history|.
    """
    from ..queries.dedup import MINHASH_JACCARD_THRESHOLD, _minhash_bands

    sh = doc_shingles(batch_docs)
    bands = _minhash_bands(sh)
    cand = (
        bands.alias("a")
        .join(
            hist_bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.k1") == F.col("b.k1"))
            & (F.col("a.k2") == F.col("b.k2")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.col("b.doc_id").alias("hist_id"),
        )
        .distinct()
    )
    ta = sh.select("doc_id", F.col("sh").alias("sh_a"))
    tb = hist_shingles.select("hist_id", F.col("sh").alias("sh_b"))
    jaccard = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(
        F.array_union("sh_a", "sh_b")
    )
    hits = (
        cand.join(ta, "doc_id")
        .join(tb, "hist_id")
        .filter(jaccard >= MINHASH_JACCARD_THRESHOLD)
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        batch_docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("hit", F.lit(0))
            .cast("bigint")
            .alias("is_neardup_of_history"),
        )
    )


def minhash_neardup_stream(
    docs_stream: DataFrame,
    hist_bands: DataFrame,
    hist_shingles: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
):
    """Continuous ingest-time NEAR-dup flagging: availableNow drain
    where each micro-batch runs :func:`minhash_flag_batch` inside
    foreachBatch (candidate generation needs joins+distinct, which
    append-mode streaming cannot express directly — and per-batch
    is the production shape anyway: flag, then append the accepted
    batch's bands back to the index for the next trigger). Results
    land partitioned by batch id, so a replayed batch overwrites only
    itself — the same exactly-once discipline as the other stores in
    streaming/sinks.py. State never grows with stream volume: the
    stream side is stateless; history lives in the two materialized
    relations."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        (
            minhash_flag_batch(batch, hist_bands, hist_shingles)
            .withColumn("batch_id", F.lit(batch_id))
            .repartition(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    return (
        docs_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
