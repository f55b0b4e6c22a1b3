"""Parquet star-schema catalog over the driver test tables.

Columnar scans are where 100 TB efficiency starts: parquet gives
Catalyst column pruning (ReadSchema) and predicate pushdown
(PushedFilters) for free as long as queries stay declarative — every
query in this engine reads through here.
"""

from __future__ import annotations

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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Plain ``read.parquet`` so pushdown/pruning apply.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark
    reads only as a nanos long (spark.sql.legacy.parquet.nanosAsLong);
    the values are microsecond-aligned, so converting ns->us is exact
    and matches DuckDB's reading of the same file.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register temp views so the SQL entry points mirror DataFrame ones."""
    for n, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)
