"""SparkSession factory.

Replaces the reference's entire control plane — Manager/Worker
processes, TCP/UDP registration, heartbeats, failure sweeps
(reference: mapreduce/manager/__main__.py, mapreduce/worker/__main__.py)
— with Spark's driver/executor machinery. Cluster lifecycle, worker
membership, heartbeat failure detection, and task re-execution are all
built into Spark; the only thing to configure is the session.

Scale notes (100 TB / 1000-executor design):
- AQE on: runtime partition coalescing, skew-join splitting, and
  dynamic join-strategy switching replace any static choice we could
  make at plan time.
- ``spark.sql.shuffle.partitions`` is a *local* default (match cores);
  on a real cluster AQE's coalescing makes the initial number mostly a
  ceiling — set it high (2-3x total cores) there.
- Arrow enabled so every pandas-UDF boundary is columnar batch
  transfer, never row pickling.
- Iterative operators truncate per-round lineage via
  ``functions.truncate_plan``: executor-local ``localCheckpoint`` by
  default (right for this per-round driver process); set
  ``SPARK_GRAFT_CHECKPOINT=reliable`` (+ ``SPARK_GRAFT_CHECKPOINT_DIR``
  on durable shared storage) on a real cluster so a mid-query executor
  loss replays from the checkpoint instead of failing the query.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(
    app_name: str = "eecs485-mapreduce-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession tuned for this engine.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` (driver contract) or
    ``local[*]``. An already-active session is reused as-is so tests,
    the driver harness, and bench share one JVM.
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        return active

    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "*")
    # Default shuffle partitions track the ACTUAL core count (the
    # driver re-runs the bench at lower core counts to measure
    # scaling; a constant 32 would hand an 8-core run 4x more, smaller
    # tasks than it has cores). Explicit SPARK_GRAFT_SHUFFLE wins.
    env_shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE")
    default_shuffle = int(cpus) if str(cpus).isdigit() else (os.cpu_count() or 32)
    n_shuffle = shuffle_partitions or (
        int(env_shuffle) if env_shuffle else default_shuffle
    )

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Bucketed-table warehouse (operators/sinks write_bucketed);
        # kept out of the repo tree.
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark-graft-warehouse"),
        )
        # events.parquet carries TIMESTAMP(NANOS) which Spark's parquet
        # reader rejects; read as long and convert in the catalog.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
