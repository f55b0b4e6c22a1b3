"""Round-8 optimization regression gates (OPTIMIZATION_r08.md).

The iterative operators truncate lineage every round with
localCheckpoint; without it their logical plans nest exponentially in
the round count (kcore's final plan was 9,130 formatted lines / 922
Exchange nodes and ~30s of pure driver analysis per invocation).
These tests pin the truncated plan SIZE so a reintroduced lazy-persist
loop fails loudly, and pin the rewritten execution shapes of the pca
power loop (one dense-algebra batch, no per-hop windows) and the
consistent-hash ring audit (literal-array argmin, no join).
"""

from __future__ import annotations

import re

import pytest

from .conftest import SF_SMALL

pytestmark = pytest.mark.usefixtures("spark")


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.mark.parametrize(
    "name, max_exchanges",
    [
        ("sssp_weighted_coorder", 40),
        ("kcore_peel_coorder", 40),
        ("bfs_hops_part_coorder", 40),
        ("pagerank_customer_supplier", 40),
        ("greedy_coverage_selection", 40),
    ],
)
def test_iterative_plans_stay_truncated(spark, name, max_exchanges):
    from eecs_485___mapreduce_spark.registry import all_queries

    df = all_queries()[name].fn(spark, SF_SMALL)
    plan = _formatted(df)
    n = len(re.findall(r"\bExchange\b", plan))
    assert n <= max_exchanges, (
        f"{name}: {n} Exchange nodes — per-round lineage truncation "
        f"(localCheckpoint) has been lost; see OPTIMIZATION_r08.md"
    )
    # the checkpointed rounds surface as RDD scans, not nested lineage
    assert "Scan ExistingRDD" in plan, plan[:2000]


def test_reliable_checkpoint_switch_same_shape(spark, monkeypatch, tmp_path):
    """SPARK_GRAFT_CHECKPOINT=reliable (cluster deployments: rounds
    survive executor loss) must produce the SAME truncated plan shape
    as the local default — only the checkpoint storage differs
    (functions.truncate_plan)."""
    from eecs_485___mapreduce_spark.registry import all_queries

    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT", "reliable")
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", str(tmp_path / "ckpt"))
    df = all_queries()["pagerank_customer_supplier"].fn(spark, SF_SMALL)
    plan = _formatted(df)
    n = len(re.findall(r"\bExchange\b", plan))
    assert n <= 40, f"reliable-checkpoint plan not truncated: {n} exchanges"
    assert "Scan ExistingRDD" in plan, plan[:2000]


def test_pca_power_loop_is_one_arrow_batch(spark):
    from eecs_485___mapreduce_spark.registry import all_queries

    df = all_queries()["pca_top_component_power"].fn(spark, SF_SMALL)
    plan = _formatted(df)
    assert "MapInPandas" in plan, plan[:2000]
    # the 60 hops must NOT be unrolled as distributed stages
    assert "Window" not in plan, plan[:2000]
    assert len(re.findall(r"\bExchange\b", plan)) <= 8, plan[:2000]


def test_consistent_hash_ring_is_scan_side(spark):
    from eecs_485___mapreduce_spark.registry import all_queries

    df = all_queries()["consistent_hash_rebalance"].fn(spark, SF_SMALL)
    plan = _formatted(df)
    for join in ("BroadcastNestedLoopJoin", "SortMergeJoin", "BroadcastHashJoin",
                 "ShuffledHashJoin", "CartesianProduct"):
        assert join not in plan, f"ring audit regained a {join}\n{plan[:2000]}"
