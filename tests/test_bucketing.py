"""Bucketed co-located joins: two tables bucketed on the join key must
join with no shuffle exchange on either side — the scan IS the
partitioning. This is the pre-partitioning scale tool SURVEY.md
section 2.B commits for big fact-fact joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from eecs_485___mapreduce_spark.plans import physical_plan
from eecs_485___mapreduce_spark.sinks import write_bucketed
from eecs_485___mapreduce_spark.sources import load_table

from .conftest import SF_SMALL


def test_incremental_dedup_history_index_bucketed_no_exchange(spark):
    """dedup_incremental_exact's 100 TB story: "with the index
    pre-bucketed on k the join is shuffle-free on the history side"
    (queries/dedup.py docstring). Materialize the DISTINCT key index
    with bucketBy(k) the way a production pipeline would, join a new
    batch against it, and assert the plan carries exactly ONE Exchange
    — the batch side reshuffling to the index's bucketing — while the
    history scan is bucket-aligned (no Exchange above it). Unbucketed,
    the same join needs two."""
    from eecs_485___mapreduce_spark.functions import canonical_text
    from eecs_485___mapreduce_spark.queries.dedup import INCREMENTAL_SPLIT

    docs = load_table(spark, SF_SMALL, "documents")
    key = F.md5(canonical_text("text"))
    hist = (
        docs.filter(F.col("doc_id") < INCREMENTAL_SPLIT)
        .select(key.alias("k"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    write_bucketed(hist, "b_dedup_hist_keys", ["k"], n_buckets=8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        hist_idx = spark.table("b_dedup_hist_keys")
        batch = docs.filter(F.col("doc_id") >= INCREMENTAL_SPLIT).select(
            "doc_id", key.alias("k")
        )
        flagged = batch.join(hist_idx, "k", "left").select(
            "doc_id",
            F.coalesce("hit", F.lit(0)).cast("bigint").alias("is_dup_of_history"),
        )
        plan = physical_plan(flagged)
        # formatted explain lists each node twice (tree + detail), so
        # count distinct Exchange node ids, not substring occurrences
        import re

        n_exchanges = len(set(re.findall(r"\((\d+)\) Exchange", plan)))
        assert n_exchanges == 1, plan
        assert "Bucketed: true" in plan, plan

        # semantics unchanged vs the registered (unbucketed) query
        from eecs_485___mapreduce_spark.queries.dedup import dedup_incremental_exact

        want = dedup_incremental_exact(spark, SF_SMALL)
        assert sorted(map(tuple, flagged.collect())) == sorted(
            map(tuple, want.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.sql("DROP TABLE IF EXISTS b_dedup_hist_keys")


def test_bucketed_join_has_no_shuffle(spark):
    li = load_table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, SF_SMALL, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    write_bucketed(li, "b_lineitem", ["l_orderkey"], n_buckets=8)
    write_bucketed(orders, "b_orders", ["o_orderkey"], n_buckets=8)

    a = spark.table("b_lineitem")
    b = spark.table("b_orders")
    # Force the shuffle-sensitive path: disable broadcast so the join
    # must be sort-merge — which bucketing then makes exchange-free.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, a.l_orderkey == b.o_orderkey).groupBy("l_orderkey").agg(
            F.sum("l_quantity").alias("q"), F.max("o_totalprice").alias("p")
        )
        plan = physical_plan(joined)
        assert "Exchange" not in plan, plan
        # sanity: result matches the unbucketed computation
        li2 = load_table(spark, SF_SMALL, "lineitem")
        o2 = load_table(spark, SF_SMALL, "orders")
        want = (
            li2.join(o2, li2.l_orderkey == o2.o_orderkey)
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("q"), F.max("o_totalprice").alias("p"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, want.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")
