"""Scan-pruning operators: bloom runtime-filter semi-join, bitmap
audience intersection, and sketch-verified heavy hitters.

Each query's cross-engine value hash is pinned by the oracle harness
(test_queries_oracle.py); these tests pin the parts the oracle can't
see — the bloom filter's superset property, the Misra-Gries survival
guarantee, the bitmap inclusion-exclusion identity against Spark's
own COUNT(DISTINCT), and the plan shapes the 100 TB design depends
on (no fact-side shuffle before the verify join)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from eecs_485___mapreduce_spark.plans import assert_no_cartesian, physical_plan
from eecs_485___mapreduce_spark.queries.pruning import (
    _MG_CAPACITY,
    _mg_candidates,
    bitmap_audience_overlap,
    bloom_semi_join_orders,
    heavy_hitters_tokens,
)
from eecs_485___mapreduce_spark.sources import load_table

from .conftest import SF_SMALL, normalize


# ------------------------------------------------------------- bloom


def test_bloom_semi_join_matches_plain_semi_join(spark):
    """The bloom pre-filter must be invisible in the result: false
    positives are removed by the verify join, and true matches can
    never be dropped (a present key sets all k bits by construction)."""
    got = bloom_semi_join_orders(spark, SF_SMALL)
    customer = load_table(spark, SF_SMALL, "customer")
    orders = load_table(spark, SF_SMALL, "orders")
    keys = customer.filter(F.col("c_acctbal") > 9000.0).select("c_custkey")
    want = (
        orders.join(keys, orders.o_custkey == keys.c_custkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )
    assert normalize([tuple(r) for r in got.collect()], got.columns) == normalize(
        [tuple(r) for r in want.collect()], want.columns
    )


def test_bloom_plan_single_fact_shuffle_and_broadcast_verify(spark):
    """The fact table must reach the final groupBy without ever being
    shuffled: the bloom probe is a broadcast of one map row, the
    verify join broadcasts the dimension keys. Only the bounded
    5-key aggregation may exchange."""
    df = bloom_semi_join_orders(spark, SF_SMALL)
    plan = physical_plan(df)
    assert_no_cartesian(df)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    data_exchanges = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "o_orderpriority" not in ln
    ]
    assert not data_exchanges, f"fact side shuffled: {data_exchanges}"


# ------------------------------------------------------------ bitmap


def test_bitmap_overlap_matches_count_distinct(spark):
    """Inclusion-exclusion over bucketed bitmaps must equal Spark's
    own COUNT(DISTINCT) — per day, for both audiences and the
    intersection."""
    got = bitmap_audience_overlap(spark, SF_SMALL)
    ev = (
        load_table(spark, SF_SMALL, "events")
        .filter(
            F.col("event_type").isin("view", "purchase")
            & F.col("user_id").isNotNull()
        )
        .select(F.to_date("ts").alias("day"), "event_type", "user_id")
    )
    both = (
        ev.groupBy("day", "user_id")
        .agg(F.count_distinct("event_type").alias("k"))
        .filter(F.col("k") == 2)
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_both_want"))
    )
    joined = got.join(both, "day", "left").fillna(0, ["n_both_want"])
    bad = joined.filter(F.col("n_both") != F.col("n_both_want")).count()
    assert bad == 0
    # audience sizes against countDistinct directly
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("nv_want"))
    )
    bad_v = (
        got.join(views, "day")
        .filter(F.col("n_view") != F.col("nv_want"))
        .count()
    )
    assert bad_v == 0


# ------------------------------------------------------ misra-gries


def test_mg_heavy_token_survives_adversarial_stream():
    """A token holding > 1/(m+1) of the partition mass must be in the
    emitted candidates, even when every other token is unique filler
    arriving after it (the worst case for decrement-based sketches)."""
    heavy = ["hot"] * 600
    filler = [f"w{i}" for i in range(100_000)]
    batches = [
        pd.DataFrame({"token": heavy[:300]}),
        pd.DataFrame({"token": filler[:50_000]}),
        pd.DataFrame({"token": heavy[300:]}),
        pd.DataFrame({"token": filler[50_000:]}),
    ]
    # total n = 100_600; threshold n/(m+1) = 503 < 600 -> must survive
    (out,) = list(_mg_candidates(iter(batches)))
    assert "hot" in set(out["token"])
    assert len(out) <= _MG_CAPACITY


def test_mg_sketch_is_bounded():
    filler = pd.DataFrame({"token": [f"u{i}" for i in range(10_000)]})
    (out,) = list(_mg_candidates(iter([filler])))
    assert len(out) <= _MG_CAPACITY


def test_heavy_hitters_match_exact_full_count(spark):
    """End-to-end: sketch+recount equals the all-pairs exact answer
    computed the expensive way (full-vocabulary groupBy)."""
    got = heavy_hitters_tokens(spark, SF_SMALL)
    tok = load_table(spark, SF_SMALL, "documents").select(
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != F.lit(""))
        ).alias("token")
    )
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = tok.agg(F.count(F.lit(1)).alias("n_tokens"))
    want = (
        counts.join(F.broadcast(total))
        .filter(F.col("cnt") * (_MG_CAPACITY + 1) > F.col("n_tokens"))
        .select("token", "cnt", "n_tokens")
    )
    assert normalize([tuple(r) for r in got.collect()], got.columns) == normalize(
        [tuple(r) for r in want.collect()], want.columns
    )
    assert got.count() > 0  # the zipf head must clear the threshold
