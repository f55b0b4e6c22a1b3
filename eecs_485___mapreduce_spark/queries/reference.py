"""Reference-parity queries: the reference's two canonical programs.

Word count (reference tests/testdata/exec/wc_map.sh + wc_reduce.sh:
tokenize, lowercase, count per word) and grep (tests/testdata/exec/
grep_map.py:12-29: case-insensitive substring filter, project the
line). Re-expressed over the ``documents`` table; the raw
text-directory variants live in ``operators.wordcount`` /
``operators.grep`` and are exercised by the golden-parity tests.

Scale notes: wordcount is scan -> explode -> hash agg. Catalyst plans
partial aggregation before the shuffle (the combiner the reference
lacks — its word\\t1 pairs cross the shuffle unaggregated, reference
tests/test_worker_05.py:122-133), so shuffle volume is O(distinct
words), not O(tokens). Grep is a pushdown-friendly scan-filter: only
matching rows leave the scan, no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import tokens
from ..registry import register
from ..sources import load_table

_TOKEN_SQL = r"""list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '')"""


@register(
    "wordcount",
    bench=True,
    tags=("reference", "agg", "string"),
    oracle=rf"""
    SELECT w AS word, COUNT(*) AS cnt
    FROM (SELECT unnest({_TOKEN_SQL}) AS w FROM documents)
    GROUP BY w
    """,
)
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: word count over documents.text."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "grep",
    tags=("reference", "filter"),
    oracle="""
    SELECT doc_id, text, lang
    FROM documents
    WHERE contains(lower(text), 'merge')
    """,
)
def grep(spark: SparkSession, sf_dir: str, query: str = "merge") -> DataFrame:
    """Case-insensitive substring grep (reference default query was
    'product'; 'merge' occurs in the documents corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.lower(F.col("text")).contains(query)).select("doc_id", "text", "lang")


@register(
    "grep_count_by_source",
    tags=("reference", "filter", "agg"),
    oracle="""
    SELECT source, COUNT(*) AS n_matches
    FROM documents
    WHERE contains(lower(text), 'merge')
    GROUP BY source
    """,
)
def grep_count_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grep + aggregate: matches per source (filter feeds a hash agg)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.lower(F.col("text")).contains("merge"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )


@register(
    "pipe_wordcount",
    tags=("reference", "pipe", "udf"),
    oracle=rf"""
    SELECT w AS word, COUNT(*) AS cnt
    FROM (SELECT unnest({_TOKEN_SQL}) AS w FROM documents)
    GROUP BY w
    """,
)
def pipe_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count through the EXEC-COMPAT layer: documents.text piped
    through the repo's Hadoop-streaming-contract mapper/reducer
    executables (``tests/fixtures/wc_map.py`` / ``wc_reduce.py``) via
    ``operators.pipe`` — the reference's defining feature (arbitrary
    executables as operators, reference worker ``__main__.py:134-139``
    map pipe, ``:185-194`` reduce pipe), oracle-checked against the
    same SQL as the native ``wordcount``.

    Scale: the pipe stages are opaque to Catalyst (no pushdown through
    them — documented limitation); the shuffle between them is the
    md5-partitioned sorted repartition the reference contract
    requires. Executable startup amortizes per partition, not per row.
    """
    import sys
    from pathlib import Path

    from ..operators import pipe_map, pipe_reduce

    fixtures = Path(__file__).resolve().parents[2] / "tests" / "fixtures"
    py = sys.executable
    docs = load_table(spark, sf_dir, "documents").select("text")
    mapped = pipe_map(docs, f"{py} {fixtures / 'wc_map.py'}")
    reduced = pipe_reduce(mapped, f"{py} {fixtures / 'wc_reduce.py'}", num_reducers=4)
    parts = F.split("value", "\t")
    return reduced.select(
        parts.getItem(0).alias("word"),
        parts.getItem(1).cast("bigint").alias("cnt"),
    )
