"""Physical-plan assertions: the 100 TB design criteria as tests —
filters pushed to the parquet scan, columns pruned, dims broadcast,
no accidental cartesian products."""

from __future__ import annotations

from eecs_485___mapreduce_spark.plans import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    codegen_stage_count,
    physical_plan,
)
from eecs_485___mapreduce_spark.queries.dedup import dedup_minhash_lsh
from eecs_485___mapreduce_spark.queries.reference import grep, wordcount
from eecs_485___mapreduce_spark.queries.relational import (
    q1_pricing_summary,
    q3_top_orders,
    q5_region_revenue,
    topk_per_group,
)

from .conftest import SF_SMALL


def test_q1_filter_pushed_to_scan(spark):
    df = q1_pricing_summary(spark, SF_SMALL)
    assert_pushed_filters(df, "l_shipdate")


def test_topk_per_group_pushes_event_type(spark):
    df = topk_per_group(spark, SF_SMALL)
    assert_pushed_filters(df, "event_type")


def test_wordcount_prunes_columns(spark):
    """The documents scan must read only `text` — a scan reading lang/
    source/n_chars for a words-only query is wrong at any scale."""
    plan = physical_plan(wordcount(spark, SF_SMALL))
    scan = plan[plan.index("ReadSchema") :].splitlines()[0]
    assert "text" in scan
    for unused in ("lang", "source", "n_chars"):
        assert unused not in scan, f"column {unused} not pruned: {scan}"


def test_joins_broadcast_dims(spark):
    assert_broadcast_join(q3_top_orders(spark, SF_SMALL), expect=1)
    assert_broadcast_join(q5_region_revenue(spark, SF_SMALL), expect=2)


def test_no_cartesian_products(spark):
    from eecs_485___mapreduce_spark.queries.advanced import (
        asof_join_purchase_click,
        correlated_subquery_q17,
        range_join_click_burst,
    )
    from eecs_485___mapreduce_spark.queries.dedup import dedup_embedding_cosine

    for q in (
        q3_top_orders,
        q5_region_revenue,
        dedup_minhash_lsh,
        correlated_subquery_q17,
        range_join_click_burst,
        dedup_embedding_cosine,
        asof_join_purchase_click,
    ):
        assert_no_cartesian(q(spark, SF_SMALL))


def test_asof_join_is_window_based(spark):
    """The as-of composition must plan as union + window — no join
    operator at all (a join+argmax formulation would materialize
    per-pair rows and die at scale)."""
    from eecs_485___mapreduce_spark.queries.advanced import asof_join_purchase_click

    plan = physical_plan(asof_join_purchase_click(spark, SF_SMALL))
    assert "Join" not in plan, plan
    assert "Window" in plan


def test_scan_agg_uses_codegen(spark):
    """Codegen subtrees are only visible pre-execution with AQE off
    (AQE hides them behind AdaptiveSparkPlan until runtime)."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        assert codegen_stage_count(q1_pricing_summary(spark, SF_SMALL)) >= 1
        assert codegen_stage_count(grep(spark, SF_SMALL)) >= 1
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
