"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``eecs_485___mapreduce_spark.registry``: every
operator the engine declares (SURVEY.md section 2) is one registry
entry with a Spark callable and, where SQL-expressible, a DuckDB
oracle. See the package for implementations.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from eecs_485___mapreduce_spark.registry import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: word count over the
    documents corpus (the reference's canonical program, Spark-first:
    scan -> explode -> partial agg -> shuffle -> final agg)."""
    from eecs_485___mapreduce_spark.queries.reference import wordcount

    return wordcount(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; queries
    without an oracle (approximate / LSH ops) get the driver's
    rows-only check."""
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
