"""Scan-pruning and sketch-verified operators: a distributed Bloom
runtime filter feeding a semi-join, an exact bitmap-index audience
intersection, and Misra-Gries heavy hitters with an exact recount.

These are the three classic "make the big scan cheaper" moves a
warehouse applies before an expensive shuffle: (1) build a tiny Bloom
filter from the dimension side and drop non-matching fact rows at the
scan (Spark's own runtime-filter rule does this JVM-side; here the
filter is built, broadcast, and probed entirely with DataFrame
primitives so the mechanism itself is part of the engine's surface),
(2) replace COUNT(DISTINCT) intersection with bucketed-bitmap
arithmetic (exact, mergeable, constant bytes per bucket), and
(3) bound a full-vocabulary count with a fixed-memory sketch whose
candidates are then recounted exactly — the sketch can only ever
over-select, so the verified output is deterministic and exact.

Reference parity: none of these exist in the reference (its surface
is wordcount + grep, mapreduce/__init__.py); they extend SURVEY.md
section 2.B's committed aggregation/dedup families with the pruning
primitives a 100 TB deployment leans on.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table
from .text import _TOKS

# ------------------------------------------------- bloom semi-join

# 4 hash functions over a 65536-bit filter (1024 x 64-bit words).
# For the ~1-2% qualifying-customer key set this sits far below the
# 1-bit-per-key regime where FP rate would matter; FPs only cost a
# row passing to the exact verify join, never correctness.
_BLOOM_SEEDS = (0, 1, 2, 3)
_BLOOM_WORDS = 1024
_BLOOM_BITS = _BLOOM_WORDS * 64
_ACCTBAL_MIN = 9000.0


@register(
    "bloom_semi_join_orders",
    tags=("join", "prune", "orders", "customer"),
    oracle=f"""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer
                        WHERE c_acctbal > {_ACCTBAL_MIN})
    GROUP BY 1
    """,
)
def bloom_semi_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by priority for orders of high-balance customers, with
    the fact side pre-pruned by a distributed Bloom filter built from
    the qualifying customer keys.

    Mechanism (all DataFrame primitives, no driver materialization):
    the key set explodes into k = 4 positions p = xxhash64(key, seed)
    mod 65536; positions OR into <= 1024 64-bit words (one tiny
    aggregation); the words fold into a single-row map that is
    broadcast and probed per fact row with pure bit arithmetic. Rows
    passing all k bit tests — true matches plus a bounded FP residue —
    flow into an exact broadcast LEFT SEMI join, so the final answer
    is byte-identical to the plain semi-join oracle regardless of the
    filter's false positives. xxhash64 stays Spark-internal: the
    oracle only has to agree on the verified output.

    Scale: this is the manual form of Spark's runtime bloom-filter
    rule. On a 1000-executor cluster the 8 KiB filter prunes the
    100 TB fact scan BEFORE any shuffle or join build; the verify join
    broadcasts the dimension keys, so the fact table is never
    shuffled at all — the only Exchange in the plan is the final
    bounded groupBy (plan-pinned in tests/test_plans.py).
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    keys = customer.filter(F.col("c_acctbal") > _ACCTBAL_MIN).select("c_custkey")

    pos = keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(
                        F.xxhash64(F.col("c_custkey"), F.lit(s)), F.lit(_BLOOM_BITS)
                    )
                    for s in _BLOOM_SEEDS
                ]
            )
        ).alias("p")
    )
    words = pos.groupBy((F.col("p") / F.lit(64)).cast("long").alias("w")).agg(
        F.bit_or(F.expr("shiftleft(1L, cast(p % 64 as int))")).alias("bits")
    )
    bloom = words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("bloom")
    )

    tests = [
        f"(coalesce(element_at(bloom, cast(pmod(xxhash64(o_custkey, {s}), "
        f"{_BLOOM_BITS}) / 64 as bigint)), 0L)"
        f" & shiftleft(1L, cast(pmod(xxhash64(o_custkey, {s}), "
        f"{_BLOOM_BITS}) % 64 as int))) != 0L"
        for s in _BLOOM_SEEDS
    ]
    candidates = (
        orders.join(F.broadcast(bloom))
        .filter(F.expr(" AND ".join(tests)))
        .drop("bloom")
    )
    verified = candidates.join(
        F.broadcast(keys),
        F.col("o_custkey") == F.col("c_custkey"),
        "left_semi",
    )
    return verified.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


# ------------------------------------------- bitmap audience overlap


@register(
    "bitmap_audience_overlap",
    tags=("agg", "distinct", "events", "bitmap"),
    oracle="""
    WITH e AS (
      SELECT CAST(ts AS DATE) AS day, event_type, user_id
      FROM events
      WHERE event_type IN ('view', 'purchase') AND user_id IS NOT NULL
    ),
    v AS (SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_view
          FROM e WHERE event_type = 'view' GROUP BY 1),
    p AS (SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_purchase
          FROM e WHERE event_type = 'purchase' GROUP BY 1),
    u AS (SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_union
          FROM e GROUP BY 1)
    SELECT u.day,
           COALESCE(n_view, 0) AS n_view,
           COALESCE(n_purchase, 0) AS n_purchase,
           n_union,
           COALESCE(n_view, 0) + COALESCE(n_purchase, 0) - n_union AS n_both
    FROM u LEFT JOIN v USING (day) LEFT JOIN p USING (day)
    """,
)
def bitmap_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily audience intersection — users who both viewed AND
    purchased that day — computed exactly with Spark's bucketed-bitmap
    aggregates instead of COUNT(DISTINCT) joins.

    Mechanism: user ids map to (bitmap_bucket_number, bit position);
    per (day, bucket) a constant-size bitmap is OR-aggregated per
    audience and for the union, and |A intersect B| falls out of
    inclusion-exclusion per bucket: |A| + |B| - |A union B| — exact,
    no pairwise user join anywhere. The oracle states the same
    quantity as three COUNT(DISTINCT)s.

    Scale: each distinct aggregation is a partial+final agg whose
    state is one fixed-width bitmap per (day, bucket) — bytes
    proportional to the id-space density, not the event count, and
    mergeable across executors (this is the roaring-bitmap pattern
    warehouses use for audience segmentation). The three rollups and
    final left joins all operate on the bounded (day x bucket) grid.
    """
    base = (
        load_table(spark, sf_dir, "events")
        .filter(
            F.col("event_type").isin("view", "purchase")
            & F.col("user_id").isNotNull()
        )
        .select(
            F.to_date("ts").alias("day"),
            "event_type",
            F.expr("bitmap_bucket_number(user_id)").alias("bkt"),
            F.expr("bitmap_bit_position(user_id)").alias("pos"),
        )
    )

    def per_day(df: DataFrame, alias: str) -> DataFrame:
        return (
            df.groupBy("day", "bkt")
            .agg(F.expr("bitmap_count(bitmap_construct_agg(pos))").alias("c"))
            .groupBy("day")
            .agg(F.sum("c").cast("bigint").alias(alias))
        )

    views = per_day(base.filter(F.col("event_type") == "view"), "n_view")
    purchases = per_day(
        base.filter(F.col("event_type") == "purchase"), "n_purchase"
    )
    union = per_day(base, "n_union")
    return (
        union.join(views, "day", "left")
        .join(purchases, "day", "left")
        .select(
            "day",
            F.coalesce("n_view", F.lit(0)).cast("bigint").alias("n_view"),
            F.coalesce("n_purchase", F.lit(0)).cast("bigint").alias("n_purchase"),
            "n_union",
            (
                F.coalesce("n_view", F.lit(0))
                + F.coalesce("n_purchase", F.lit(0))
                - F.col("n_union")
            )
            .cast("bigint")
            .alias("n_both"),
        )
    )


# ------------------------------------------- verified heavy hitters

# Misra-Gries capacity: candidates ⊇ every token with global count
# > n/(_MG_CAPACITY+1). The final filter uses exact recounts, so the
# output is deterministic no matter how the sketch prunes.
_MG_CAPACITY = 199


def _mg_candidates(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Mergeable Misra-Gries over one partition's token stream.

    Per Arrow batch: add the batch's exact counts into the sketch,
    then if the sketch exceeds capacity subtract the (m+1)-th largest
    counter from every counter and drop the non-positives (the
    standard mergeable-summaries prune: each prune removes >= cut
    mass from >= m+1 counters, so total decrement <= n_p/(m+1) and
    any token with partition count above that threshold survives).
    """
    sketch = pd.Series(dtype="int64")
    for pdf in batches:
        counts = pdf["token"].value_counts()
        sketch = sketch.add(counts, fill_value=0)
        if len(sketch) > _MG_CAPACITY:
            cut = sketch.nlargest(_MG_CAPACITY + 1).iloc[-1]
            sketch = sketch.sub(cut)
            sketch = sketch[sketch > 0]
    yield pd.DataFrame({"token": sketch.index.astype(str)})


@register(
    "heavy_hitters_tokens",
    tags=("text", "agg", "sketch", "documents"),
    oracle=f"""
    WITH tok AS (SELECT unnest({_TOKS}) AS token FROM documents),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens FROM tok),
    c AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM tok GROUP BY 1)
    SELECT token, cnt, n_tokens
    FROM c, tot
    WHERE cnt * {_MG_CAPACITY + 1} > n_tokens
    """,
)
def heavy_hitters_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus tokens with frequency above n/200 — found with a
    fixed-memory Misra-Gries sketch per partition, then verified by
    an exact recount so the answer is deterministic and exact.

    Two-phase exact heavy hitters: (1) each partition keeps at most
    199 counters (Arrow-batched pandas, no per-row Python), emitting
    a candidate set that PROVABLY contains every global heavy hitter
    (a token with global count > n/200 must exceed n_p/200 in some
    partition, and Misra-Gries never evicts such a token); (2) the
    candidates broadcast into a LEFT SEMI join that filters the token
    stream, and survivors get exact partial+final counts. The filter
    cnt * 200 > n stays in integers — no floor() ambiguity across
    engines. The oracle computes the same set from the full exact
    counts.

    Scale: the full-vocabulary groupBy this replaces shuffles every
    distinct token (billions of keys at 100 TB); here the shuffle
    carries only candidate survivors — at most 199 tokens per
    partition — after map-side partial aggregation. The sketch is the
    memory-bounded first pass; correctness never depends on its error
    bound because of the recount.
    """
    tok = load_table(spark, sf_dir, "documents").select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != F.lit("")
            )
        ).alias("token")
    )
    candidates = tok.mapInPandas(_mg_candidates, "token string").distinct()
    totals = tok.agg(F.count(F.lit(1)).alias("n_tokens"))
    counted = (
        tok.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counted.join(F.broadcast(totals))
        .filter(F.col("cnt") * F.lit(_MG_CAPACITY + 1) > F.col("n_tokens"))
        .select("token", "cnt", "n_tokens")
    )
