"""Grep over a raw text directory — the reference's program #2.

Reference semantics (tests/testdata/exec/grep_map.py:12-29 +
grep_reduce.py:12-30): case-insensitive substring match (default query
"product"), emit the matching line verbatim. The reference's
integration test compares output order-sensitively after its
sort-based shuffle (tests/test_integration_00.py:34-38), so
``sort_output`` reproduces the globally sorted order.

Scale: a pure scan-filter — predicate evaluates inside the scan's
WholeStageCodegen, no shuffle unless the global sort is requested
(which range-partitions, the right global-sort strategy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import read_text_dir


def grep_text_dir(
    spark: SparkSession,
    input_dir: str,
    query: str = "product",
    sort_output: bool = True,
) -> DataFrame:
    """DataFrame[value: string] of lines containing ``query`` (case-insensitive)."""
    df = read_text_dir(spark, input_dir)
    out = df.filter(F.lower(F.col("value")).contains(query.lower()))
    return out.orderBy("value") if sort_output else out
