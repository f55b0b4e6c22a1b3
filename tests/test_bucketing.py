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
