"""Streaming upsert sink: ``foreachBatch`` + bucketed dynamic-partition
overwrite — exactly-once materialization of "latest row per key" onto
plain parquet, no table format required.

This is the streaming twin of the batch MERGE
(queries.mlprep.merge_upsert_orders) and the write-side complement of
dedup_latest_event (queries/tpch.py): the stream maintains, on disk,
what that query computes on demand.

Why this shape at 100 TB:

- **foreachBatch** turns each micro-batch into a deterministic batch
  MERGE. Structured Streaming may REPLAY a batch after a crash
  (foreachBatch is at-least-once), so the sink must be idempotent —
  and an upsert keyed on a stable business key is exactly that:
  re-merging the same batch is a no-op, which upgrades the pipeline to
  effectively exactly-once without any sink transaction log.
- **Hash-bucketed layout**: the table is partitioned by
  ``bucket = pmod(xxhash64(key), n_buckets)``. A micro-batch touches
  only the buckets its keys hash into, and dynamic partition overwrite
  (``partitionOverwriteMode=dynamic``) rewrites ONLY those directories
  — write amplification is (touched buckets / total), not the whole
  table, and the merge join reads only the touched buckets back.
  This is the plain-parquet approximation of what Delta/Iceberg
  MERGE + file pruning does, built from primitives Spark ships.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

UPSERT_KEYS = ("user_id", "event_type")
N_BUCKETS = 16


def _bucket(df: DataFrame) -> DataFrame:
    key = F.concat_ws("\x1f", *[F.col(k).cast("string") for k in UPSERT_KEYS])
    return df.withColumn("bucket", F.pmod(F.xxhash64(key), F.lit(N_BUCKETS)))


def upsert_batch(spark: SparkSession, batch: DataFrame, table_dir: str) -> None:
    """MERGE one (micro-)batch into the bucketed parquet table at
    ``table_dir``: per key keep the newest row by (ts, event_id) of
    {existing row, batch rows}. Idempotent: re-applying any already
    -merged batch leaves the table byte-stable (modulo file names).

    Only the buckets present in the batch are read back or rewritten:
    the existing table is pruned with a broadcast SEMI join against the
    batch's distinct bucket ids (a driver-side bucket list would work
    too, but the join keeps the package collect()-free and lets AQE
    turn it into partition pruning).
    """
    w = Window.partitionBy(*UPSERT_KEYS).orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    batch = _bucket(batch)
    try:
        existing = (
            spark.read.parquet(table_dir)
            .join(F.broadcast(batch.select("bucket").distinct()), "bucket", "semi")
            .select(*batch.columns)
        )
        merged = batch.unionByName(existing)
    except AnalysisException:  # first batch: table does not exist yet
        merged = batch
    latest = (
        merged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    (
        latest.repartition(1, "bucket")  # one output file per touched bucket
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(table_dir)
    )


def cms_sketch_batch(batch: DataFrame, table_dir: str, batch_id: int) -> None:
    """Write one micro-batch's count-min partial sketch as the
    ``batch_id`` partition of the sketch store.

    Exactly-once WITHOUT a transaction log: a sketch merge (cell-wise
    sum) is not idempotent, so the store never sums across batches at
    write time — each batch owns its partition (a fixed <=1024-row
    sketch), and a replayed batch dynamically overwrites ONLY its own
    partition. Merging happens on read (:func:`read_cms_sketch`),
    where summing each batch exactly once is structural.
    """
    from ..queries.quality import cms_sketch

    (
        cms_sketch(batch, "user_id")
        .withColumn("batch_id", F.lit(batch_id))
        .repartition(1)  # one file per batch partition: 1024-row sketch
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(table_dir)
    )


def cms_sketch_stream(events: DataFrame, table_dir: str, checkpoint_dir: str):
    """Maintain a streaming count-min sketch store over event user ids:
    availableNow drain writing one partial-sketch partition per
    micro-batch. The 100 TB shape: per-batch state is CONSTANT (<=
    4x256 counters) however large the batch, and any window of batches
    rolls up by cell-wise sum — the mergeable-sketch discipline of
    queries/quality.py applied to continuous ingest."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        cms_sketch_batch(batch, table_dir, batch_id)

    return (
        events.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_cms_sketch(spark: SparkSession, table_dir: str) -> DataFrame:
    """The merged sketch over every batch partition: cell-wise sum —
    each batch partial participates exactly once."""
    return (
        spark.read.parquet(table_dir)
        .groupBy("seed", "cell")
        .agg(F.sum("cnt").alias("cnt"))
    )


def upsert_events_stream(
    events: DataFrame, table_dir: str, checkpoint_dir: str
):
    """Materialize "latest event per (user_id, event_type)" continuously:
    availableNow drain of ``events`` through a foreachBatch upsert.
    Returns the started query (caller awaits termination)."""
    spark = events.sparkSession

    def handle(batch: DataFrame, _batch_id: int) -> None:
        upsert_batch(spark, batch, table_dir)

    return (
        events.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def sprt_partial_batch(batch: DataFrame, table_dir: str, batch_id: int) -> None:
    """Write one micro-batch's (variant, hour) trial/success partial
    counts as the ``batch_id`` partition of the experiment-monitor
    store. Same exactly-once discipline as the count-min store above:
    count merging is not idempotent, so each batch owns its partition
    and a replay dynamically overwrites only itself; merging happens
    on read (:func:`read_sprt_monitor`)."""
    from ..queries.inference import sprt_hourly_partial

    (
        sprt_hourly_partial(batch)
        .withColumn("batch_id", F.lit(batch_id))
        .repartition(1)  # one file per batch: |variants| x |hours| rows
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(table_dir)
    )


def sprt_monitor_stream(events: DataFrame, table_dir: str, checkpoint_dir: str):
    """Continuously maintain the group-sequential SPRT experiment
    monitor (queries/inference.py): availableNow drain writing one
    partial-count partition per micro-batch. The 100 TB shape:
    per-batch state is bounded by |variants| x |hours touched|, and
    the monitor itself (cumulative LLR + Wald crossing) is computed
    on read over the merged hourly relation — the streaming side
    never orders trials."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        sprt_partial_batch(batch, table_dir, batch_id)

    return (
        events.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_sprt_monitor(spark: SparkSession, table_dir: str) -> DataFrame:
    """The monitor readout over every batch partition: per-(variant,
    hour) counts merge by addition (each partial exactly once), then
    the shared cumulative-LLR / crossing logic runs over the merged
    hourly relation — byte-identical to the batch query on the same
    events."""
    from ..queries.inference import sprt_from_hourly

    hourly = (
        spark.read.parquet(table_dir)
        .groupBy("variant", "hour")
        .agg(F.sum("n").alias("n"), F.sum("s").cast("bigint").alias("s"))
    )
    return sprt_from_hourly(hourly)
