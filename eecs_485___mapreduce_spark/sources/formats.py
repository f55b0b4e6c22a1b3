"""Row-format sources: CSV and JSON-lines scans.

The reference reads only raw text dirs; these complete the scan
surface (SURVEY.md section 2.B "Scans/sources"). Both readers take an
explicit schema by default — at 100 TB, schema inference is a full
extra pass over the data and is disabled here unless asked for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV scan. With an explicit ``schema`` this is a single streaming
    pass with column pruning; without one, Spark samples the file to
    infer types (fine for exploration, wrong for production pipelines —
    pass the schema).
    """
    reader = spark.read.option("header", str(header).lower())
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """JSON-lines scan (one object per line — the splittable layout;
    multi-line JSON cannot be split across executors). Same
    explicit-schema rule as CSV; malformed rows land in
    ``_corrupt_record`` under the default PERMISSIVE mode rather than
    failing the 100-TB job at hour nine.
    """
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(
    spark: SparkSession,
    path: str,
    **options: str,
) -> DataFrame:
    """ORC scan. Like parquet, ORC is a self-describing columnar format:
    Spark's vectorized ORC reader gives column pruning and predicate
    pushdown (including bloom-filter and min/max stripe skipping) with
    no schema argument needed.
    """
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.orc(path)
