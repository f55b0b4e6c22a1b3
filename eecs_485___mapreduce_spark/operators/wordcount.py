r"""Word count over a raw text directory — the reference's program #1.

Reference semantics (tests/testdata/exec/wc_map.sh:12 +
wc_reduce.sh:14): lowercase, split on [ \t], count per word; the
pipeline `cat | tr A-Z a-z | tr '[ \t]' '\n'` emits an empty token for
every leading/consecutive separator, and those empty-string keys flow
through the whole reference pipeline (empty keys are legal —
tests/test_worker_05.py:122-133). ``keep_empty`` reproduces that quirk
for golden parity; the default drops empties.

Scale: Catalyst plans a partial count before the shuffle, so shuffle
bytes are O(distinct words per partition) — the combiner the reference
lacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import read_text_dir


def wordcount_text_dir(
    spark: SparkSession,
    input_dir: str,
    lowercase: bool = True,
    keep_empty: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """DataFrame[word: string, cnt: bigint] over every file in the dir."""
    df = read_text_dir(spark, input_dir, num_partitions=num_partitions)
    line = F.lower(F.col("value")) if lowercase else F.col("value")
    toks = F.split(line, "[ \t]")
    if not keep_empty:
        toks = F.filter(toks, lambda x: x != F.lit(""))
    return (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
