"""Native Python UDF surface: the engine's replacement for the
reference's arbitrary-executable operators.

The reference's defining feature is user code as streaming executables
(``mapreduce/worker/__main__.py:134-139`` pipes each input file through
the mapper binary; ``:185-194`` pipes the merged sorted stream through
the reducer). ``operators/pipe.py`` reproduces that contract verbatim
via ``rdd.pipe``; THIS module is the modern path the engine steers
users to instead — Arrow-batched pandas UDFs, which keep data columnar
across the JVM/Python boundary (~10-100x over row-at-a-time Python
UDFs) and stay inside the DataFrame planner.

One query per UDF shape:
- scalar ``pandas_udf``  (Series -> Series)         — vectorized map
- ``applyInPandas``      (grouped DataFrame -> DF)  — the reduce analog
- ``mapInPandas``        (batch iterator -> batches) — the map analog
- cogrouped ``applyInPandas`` (two grouped DFs -> DF) — the two-input
  reducer the reference's single-sorted-stream pipe cannot express
- GROUPED_AGG ``pandas_udf`` (Series -> scalar)     — custom aggregate
- ``@udf(useArrow=True)``    (row -> row, Arrow I/O) — the drop-in
  upgrade for unvectorizable row UDFs

Every output column is an integer so the DuckDB oracle compare is
exact (no float summation-order concerns at the Python boundary).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..registry import register
from ..sources import load_table


# ------------------------------------------------ scalar pandas UDF


@register(
    "udf_token_stats_arrow",
    tags=("udf", "text"),
    oracle="""
    SELECT doc_id,
           len(list_filter(string_split_regex(COALESCE(text, ''), '\\s+'),
                           x -> x <> '')) AS n_tokens,
           len(list_distinct(list_filter(string_split_regex(COALESCE(text, ''),
                                                            '\\s+'),
                                         x -> x <> ''))) AS n_unique
    FROM documents
    """,
)
def udf_token_stats_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token count + distinct-token count per document via a scalar
    ``pandas_udf`` (whitespace-run tokenization, empties dropped —
    the same rule as ``wc_map.py:6-9`` in the reference's word count).

    Null rule: null text counts as the empty document (0 tokens) —
    encoded identically in the oracle via ``COALESCE(text, '')``.
    Tokenization is the SAME ASCII ``\\s+`` class as the native
    ``tokens()`` helper and DuckDB's RE2 — Python's ``str.split()``
    (Unicode whitespace) would silently diverge on NBSP and friends.

    Scale: the UDF is stateless per-row and Arrow-batched, so it
    pipelines inside the scan stage — zero shuffles, and column pruning
    still reaches parquet (only doc_id+text are read). The same counts
    ARE expressible with built-ins (see ``text_token_stats``); this
    entry exists to pin the pandas-UDF contract itself.
    """
    ws = re.compile(r"[ \t\n\x0b\f\r]+")  # ASCII \s — matches Java/RE2, not Unicode

    @F.pandas_udf(LongType())
    def n_tokens(s: pd.Series) -> pd.Series:
        return (
            s.fillna("")
            .map(lambda t: sum(1 for x in ws.split(t) if x))
            .astype("int64")
        )

    @F.pandas_udf(LongType())
    def n_unique(s: pd.Series) -> pd.Series:
        return (
            s.fillna("")
            .map(lambda t: len({x for x in ws.split(t) if x}))
            .astype("int64")
        )

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        n_tokens(F.col("text")).alias("n_tokens"),
        n_unique(F.col("text")).alias("n_unique"),
    )


# -------------------------------------------------- applyInPandas


@register(
    "udf_grouped_rank_arrow",
    tags=("udf", "window"),
    oracle="""
    SELECT doc_id, lang,
           ROW_NUMBER() OVER (PARTITION BY lang
                              ORDER BY n_chars DESC, doc_id) AS size_rank
    FROM documents
    """,
)
def udf_grouped_rank_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language size rank of documents via ``applyInPandas`` — the
    engine's arbitrary-group-reduce: the whole group arrives as one
    pandas DataFrame, mirroring the reference reducer's contract of
    seeing all records of a key together (``grep_reduce.py:17-25``
    groups adjacent keys; here the group is materialized instead).

    Scale: one shuffle on the group key, group-at-a-time memory — fine
    while groups fit an executor (languages here; use the window-
    function form for mega-groups, see ``second_richest_per_nation``).
    Deterministic: sort inside the group by (n_chars desc, doc_id).
    """
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("lang", StringType()),
            StructField("size_rank", LongType()),
        ]
    )

    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_chars", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "lang": pdf["lang"],
                "size_rank": range(1, len(pdf) + 1),
            }
        )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return docs.groupBy("lang").applyInPandas(rank_group, schema=schema)


# --------------------------------------------------- mapInPandas


@register(
    "udf_mapinpandas_bytes",
    tags=("udf", "text"),
    oracle="""
    SELECT doc_id,
           strlen(COALESCE(text, '')) AS n_bytes,
           CASE WHEN length(COALESCE(text, '')) > 0 THEN 1 ELSE 0 END AS non_empty
    FROM documents
    """,
)
def udf_mapinpandas_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UTF-8 byte length per document via ``mapInPandas`` — the
    batch-iterator shape used for expensive per-batch setup (codec
    handles, model weights; see the multimodal module for the decode
    pipeline built on the same contract).

    Null rule: null text counts as the empty document (0 bytes) — the
    oracle encodes the same via ``COALESCE(text, '')``.

    Scale: streams Arrow batches through Python with O(batch) memory,
    no shuffle; prune-safe. The iterator form lets one-time setup
    amortize across batches, which a scalar UDF can't express.
    """
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("n_bytes", LongType()),
            StructField("non_empty", LongType()),
        ]
    )

    def batches(it):  # noqa: ANN001 - iterator of pandas DataFrames
        for pdf in it:
            text = pdf["text"].fillna("")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": text.str.encode("utf-8").map(len).astype("int64"),
                    "non_empty": (text.str.len() > 0).astype("int64"),
                }
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInPandas(batches, schema=schema)


# --------------------------------------------------- Python UDTF

_WS = r"[ \t\n\r\f\v]"  # explicit class: identical in Python re + RE2


@register(
    "udtf_split_sentences",
    tags=("udf", "udtf", "text", "lateral"),
    oracle=f"""
    WITH p AS (
      SELECT doc_id,
             list_filter(
               list_transform(
                 string_split_regex(COALESCE(text, ''), '[.!?]+'),
                 s -> regexp_replace(s, '^{_WS}+|{_WS}+$', '', 'g')),
               s -> s <> '') AS parts
      FROM documents
    )
    SELECT doc_id,
           CAST(i - 1 AS BIGINT) AS sent_idx,
           parts[i] AS sentence,
           CAST(length(parts[i]) AS BIGINT) AS n_chars
    FROM p, UNNEST(range(1, len(parts) + 1)) AS t(i)
    """,
)
def udtf_split_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation as a Python UDTF (Spark 4's user-defined
    TABLE function) applied per document with a LATERAL join — the
    one-row-in / many-rows-out user-code shape (the reference's
    streaming-mapper contract emits arbitrary records per input line;
    pipe layer cites mapreduce/worker/__main__.py:134-139 — this is
    the planner-integrated modern form).

    Split rule shared by both engines: break on runs of [.!?], strip
    an EXPLICIT whitespace class (never locale/unicode-dependent
    trim), drop empties; NULL text yields no rows.

    Scale: the UDTF streams Arrow batches through Python with
    O(batch) memory and no shuffle; the LATERAL correlation is
    per-row generation, not a join against a materialized side. The
    built-in-functions path (explode of a split) stays the fast lane
    — this query is the API-surface contract for user logic that
    genuinely needs imperative Python per row.
    """
    import re as _re

    from pyspark.sql.functions import udtf

    strip_re = _re.compile(f"^{_WS}+|{_WS}+$")

    @udtf(returnType="sent_idx: bigint, sentence: string, n_chars: bigint")
    class SplitSentences:
        def eval(self, text: str):  # noqa: ANN001
            i = 0
            for raw in _re.split(r"[.!?]+", text or ""):
                s = strip_re.sub("", raw)
                if s:
                    yield i, s, len(s)
                    i += 1

    spark.udtf.register("split_sentences", SplitSentences)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, s.sent_idx, s.sentence, s.n_chars "
        "FROM _udtf_docs d, LATERAL split_sentences(d.text) s"
    )


# ------------------------------------- cogrouped applyInPandas


@register(
    "udf_cogroup_merge_arrow",
    tags=("udf", "events", "join"),
    oracle="""
    WITH c AS (SELECT user_id, ts FROM events
               WHERE event_type = 'click' AND user_id IS NOT NULL),
    p AS (SELECT user_id, ts FROM events
          WHERE event_type = 'purchase' AND user_id IS NOT NULL),
    users AS (SELECT user_id FROM c UNION SELECT user_id FROM p),
    cagg AS (SELECT user_id, COUNT(*) AS n_clicks FROM c GROUP BY 1),
    pagg AS (SELECT user_id, COUNT(*) AS n_purchases,
                    MIN(ts) AS first_p FROM p GROUP BY 1),
    before AS (
      SELECT c.user_id, COUNT(*) AS n_before
      FROM c JOIN pagg ON pagg.user_id = c.user_id
      WHERE c.ts < pagg.first_p GROUP BY c.user_id
    )
    SELECT u.user_id,
           COALESCE(cagg.n_clicks, 0) AS n_clicks,
           COALESCE(pagg.n_purchases, 0) AS n_purchases,
           COALESCE(before.n_before, 0) AS clicks_before_first_purchase
    FROM users u
    LEFT JOIN cagg USING (user_id)
    LEFT JOIN pagg USING (user_id)
    LEFT JOIN before USING (user_id)
    """,
)
def udf_cogroup_merge_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped ``applyInPandas`` — the fourth pandas-UDF shape
    (``groupBy().cogroup()``: two relations, grouped on the same key,
    handed to Python as a pair of per-key pandas frames): each user's
    click and purchase histories arrive side by side, and the merge
    counts both streams plus the clicks that precede the first
    purchase. This is the custom two-input reducer the exec-pipe
    contract cannot express (the reference pipes exactly ONE sorted
    stream per reduce task, mapreduce/worker/__main__.py:185-194).

    Determinism: outputs are integer counts over exact timestamp
    comparisons — no float, no ordering sensitivity. NULL users are
    excluded on both sides (cogroup would give them a key group;
    the oracle's joins would not).

    Scale: cogroup shuffles each side ONCE on user_id (identical to a
    shuffle join) and streams Arrow batches per key; per-key state is
    the user's own history, the same bound as sessionization. The
    equivalent built-in plan (two filtered aggs + outer join) is
    preferred where it suffices — this entry exists because "custom
    merge logic over two aligned histories" is the shape that
    genuinely needs Python.
    """
    events = load_table(spark, sf_dir, "events")
    base = events.filter(F.col("user_id").isNotNull()).select(
        "user_id", "ts", "event_type"
    )
    clicks = base.filter(F.col("event_type") == "click").select("user_id", "ts")
    purchases = base.filter(F.col("event_type") == "purchase").select("user_id", "ts")

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_clicks", LongType()),
            StructField("n_purchases", LongType()),
            StructField("clicks_before_first_purchase", LongType()),
        ]
    )

    def merge(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        n_before = 0
        if len(right) and len(left):
            n_before = int((left["ts"] < right["ts"].min()).sum())
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_clicks": [len(left)],
                "n_purchases": [len(right)],
                "clicks_before_first_purchase": [n_before],
            }
        )

    return (
        clicks.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(merge, schema=out_schema)
    )


# ----------------------------------------- grouped-agg pandas UDAF


@register(
    "udf_grouped_mad_arrow",
    tags=("udf", "events", "stats"),
    oracle="""
    WITH m AS (
      SELECT event_type, MEDIAN(value) AS med
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           COUNT(*) AS n_events,
           CAST(FLOOR(1000000 * MEDIAN(ABS(e.value - m.med))) AS BIGINT)
             AS mad_micro
    FROM events e JOIN m ON m.event_type IS NOT DISTINCT FROM e.event_type
    GROUP BY e.event_type
    """,
)
def udf_grouped_mad_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDAF — the fifth pandas-UDF shape (a whole
    group's column arrives as one pandas Series; one scalar returns):
    median absolute deviation of event value per type, floored to
    micro-units. MAD is the UDAF poster child: it needs the full
    group in memory twice (median of deviations from the median), so
    it cannot be expressed as an algebraic partial aggregate —
    exactly when you reach for a custom aggregate instead of built-in
    F.* functions.

    Determinism: both engines interpolate even-count medians as the
    mean of the two middle doubles, and the floor-to-integer makes
    the compare exact (floor, not round: the engines' half-away vs
    banker's rounding disagree at .5 boundaries; floor never does).

    Scale: one shuffle on event_type; per-group state is the group's
    value vector — bounded for census-sized groups like these. For
    hot unbounded keys, the approx_percentiles_price sketch path is
    the fallback; this entry exists for the exact-MAD contract.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def mad_micro(v: pd.Series) -> int:
        v = v.dropna()
        if not len(v):
            return None
        med = v.median()
        return int(np.floor(1_000_000 * (v - med).abs().median()))

    # Spark refuses to mix GROUPED_AGG pandas UDFs with built-in
    # aggregates in one agg() (INVALID_PANDAS_UDF_PLACEMENT), so the
    # row count is a second tiny UDAF rather than F.count.
    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return len(v)

    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        n_rows("value").alias("n_events"),
        mad_micro("value").alias("mad_micro"),
    )


# ------------------------------------- Arrow-optimized Python UDF


@register(
    "udf_arrow_scalar_bucket",
    tags=("udf", "hash"),
    oracle="""
    SELECT doc_id,
           CAST(length(COALESCE(text, '')) % 16 AS BIGINT) AS len_bucket,
           CAST(CASE WHEN length(COALESCE(text, '')) = 0 THEN 0
                     ELSE (length(COALESCE(text, ''))
                           + strlen(COALESCE(text, ''))) % 64 END AS BIGINT)
             AS mix_bucket
    FROM documents
    """,
)
def udf_arrow_scalar_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Arrow-OPTIMIZED Python UDF (``@udf(useArrow=True)``) —
    same scalar row contract as a classic Python UDF, but the
    JVM<->Python hop rides Arrow batches instead of pickled rows.
    The engine's guidance stays "pandas_udf first" (it is vectorized
    end-to-end; this form still loops rows in Python), but the shape
    belongs in the surface because it is the drop-in upgrade for
    existing row UDFs that can't be vectorized — here a pair of
    deterministic char/byte-length bucket functions.

    Scale: stateless per-row, pipelined in the scan stage, zero
    shuffles; Arrow transfer removes the pickle tax that makes classic
    row UDFs the worst path at 100 TB (the hot paths in this package
    use built-ins or pandas UDFs regardless).
    """
    from pyspark.sql.functions import udf

    @udf("long", useArrow=True)
    def len_bucket(text: str) -> int:
        return len(text or "") % 16

    @udf("long", useArrow=True)
    def mix_bucket(text: str) -> int:
        t = text or ""
        if not t:
            return 0
        return (len(t) + len(t.encode("utf-8"))) % 64

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.select(
        "doc_id",
        len_bucket(F.col("text")).alias("len_bucket"),
        mix_bucket(F.col("text")).alias("mix_bucket"),
    )
