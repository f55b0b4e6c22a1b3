"""Parquet star-schema catalog over the driver test tables.

Columnar scans are where 100 TB efficiency starts: parquet gives
Catalyst column pruning (ReadSchema) and predicate pushdown
(PushedFilters) for free as long as queries stay declarative — every
query in this engine reads through here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# --------------------------------------------------------- scan fan-out
#
# A parquet file can only be split at row-group boundaries, and the
# test tables are written as ONE row group per table — so every scan
# stage (and everything fused before the first exchange: filters,
# partial aggregation, tokenize/shingle/minhash projections) runs as a
# single task regardless of core count. The standard remedy for an
# unsplittable input is to repartition immediately after the read; that
# adds one narrow-row exchange but lets the expression-heavy work run
# on every core.
#
# MEASURED, not assumed: a blanket fan-out of every scan REGRESSED the
# sf0.1 bench (17.4s -> 23.1s at flat calibration) — the extra exchange
# costs one more scheduled stage (~0.2-0.4s at this scale), which only
# pays for itself where the single-task expression work exceeds that
# (the shingle/minhash pipeline: 1.9s -> 1.2s; token stats: 0.40s ->
# 0.32s). So fan-out is an explicit CALL-SITE opt-in (``fanout=True``)
# at the measured compute-dense sites, not a default.
#
# The gate is scale-adaptive, never a local constant: fan out only when
# the file's row-group count is BELOW the cluster's default parallelism
# (at production scale files carry many row groups, the condition is
# false, and the plan is untouched) and the table is big enough for the
# extra exchange to pay for itself. ``SPARK_GRAFT_SCAN_FANOUT``
# overrides: ``off`` disables every site (plan-shape tests run this way
# so they keep asserting the production plan), ``auto`` fans out every
# eligible scan (the experiment mode the call-site list was measured
# with), an integer pins the partition count.
_FANOUT_MIN_ROWS = 1024
# path -> (mtime, num_rows, num_row_groups)
_SCAN_META_CACHE: dict[str, tuple[float, int, int]] = {}


def _scan_meta(path: str) -> tuple[int, int]:
    """(num_rows, num_row_groups) from the parquet footer, cached —
    one local footer read per (sf_dir, table) per process. Keyed on
    (path, mtime): a table file rewritten in-process (tests, fixture
    rebuilds) refreshes the decision instead of silently keeping a
    stale fan-out verdict (round-8 ADVICE)."""
    mtime = os.path.getmtime(path)
    meta = _SCAN_META_CACHE.get(path)
    if meta is None or meta[0] != mtime:
        import pyarrow.parquet as pq

        f = pq.ParquetFile(path)
        meta = (mtime, f.metadata.num_rows, f.metadata.num_row_groups)
        _SCAN_META_CACHE[path] = meta
    return meta[1], meta[2]


def _fanout_partitions(spark: SparkSession, path: str, requested: bool) -> int:
    """Partition count to fan an unsplittable scan out to, or 0 to
    leave the scan alone (disabled, already parallel enough, or too
    small for the extra exchange to pay)."""
    mode = os.environ.get("SPARK_GRAFT_SCAN_FANOUT", "")
    # Directory-layout inputs skip fan-out BY DESIGN, not by accident
    # (round-8 ADVICE asked for this to be explicit): a parquet
    # DIRECTORY is the many-files/many-row-groups production layout
    # whose scan is already splittable — the single-file gate below is
    # exactly the unsplittable case the fan-out exists for.
    if mode == "off" or not os.path.isfile(path):
        return 0
    if not requested and mode not in ("auto",) and not mode.isdigit():
        return 0
    rows, groups = _scan_meta(path)
    target = int(mode) if mode.isdigit() else spark.sparkContext.defaultParallelism
    if groups < target and rows >= _FANOUT_MIN_ROWS:
        return target
    return 0


def load_table(
    spark: SparkSession, sf_dir: str, name: str, fanout: bool = False
) -> DataFrame:
    """Scan one table. Plain ``read.parquet`` so pushdown/pruning apply.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark
    reads only as a nanos long (spark.sql.legacy.parquet.nanosAsLong);
    the values are microsecond-aligned, so converting ns->us is exact
    and matches DuckDB's reading of the same file.

    ``fanout=True`` (compute-dense call sites only — see the scan
    fan-out note above) spreads a single-row-group input across the
    cluster's cores right after the read; filters and column pruning
    still push through the round-robin exchange to the parquet scan.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    n = _fanout_partitions(spark, path, fanout)
    if n:
        df = df.repartition(n)
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register temp views so the SQL entry points mirror DataFrame ones."""
    for n, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)
