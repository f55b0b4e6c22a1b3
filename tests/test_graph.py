"""Graph/sketch operator tests (queries/graph.py): PageRank mass
invariants beyond the oracle comparison, and accuracy + mergeability
pins for the HLL sketch query (which is rows-only at the driver, so
these tolerance checks ARE its correctness evidence)."""

from __future__ import annotations

from pyspark.sql import functions as F

from eecs_485___mapreduce_spark.queries.graph import (
    PAGERANK_BASE,
    approx_users_hll_mergeable,
    pagerank_customer_supplier,
)
from eecs_485___mapreduce_spark.sources import load_table

from .conftest import SF_SMALL


def test_pagerank_mass_conserved_and_positive(spark):
    """Symmetric graph + damping: total rank stays within integer
    floor-loss of N * BASE (each node sheds < deg + 100 micro-units
    per iteration to flooring), and every node keeps >= the damping
    floor 0.15 * BASE."""
    rows = pagerank_customer_supplier(spark, SF_SMALL).collect()
    n = len(rows)
    total = sum(r.rank_fixed for r in rows)
    assert 0.99 * n * PAGERANK_BASE < total <= n * PAGERANK_BASE
    floor = 15 * PAGERANK_BASE // 100
    assert all(r.rank_fixed >= floor for r in rows)


def test_pagerank_rank_concentrates_on_hubs(spark):
    """Suppliers are the high-degree side of the bipartite graph, so
    mean supplier rank must exceed mean customer rank — the point of
    running PageRank at all."""
    rows = pagerank_customer_supplier(spark, SF_SMALL).collect()
    sup = [r.rank_fixed for r in rows if r.node_id.startswith("s")]
    cus = [r.rank_fixed for r in rows if r.node_id.startswith("c")]
    assert sup and cus
    assert sum(sup) / len(sup) > sum(cus) / len(cus)


def test_hll_estimates_within_5pct_of_exact(spark):
    events = load_table(spark, SF_SMALL, "events")
    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact["ALL"] = events.select("user_id").distinct().count()
    got = {r.event_type: r.approx_users for r in approx_users_hll_mergeable(spark, SF_SMALL).collect()}
    assert set(got) == set(exact)
    for k, est in got.items():
        assert abs(est - exact[k]) <= max(1, 0.05 * exact[k]), (k, est, exact[k])


def test_hll_union_equals_direct_sketch(spark):
    """Mergeability: union of per-type sketches must estimate the same
    cardinality as one sketch built over all events directly — the
    property that lets 100 TB rollups run on stored sketch state."""
    events = load_table(spark, SF_SMALL, "events")
    direct = (
        events.agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("n"))
        .collect()[0]
        .n
    )
    merged = {
        r.event_type: r.approx_users
        for r in approx_users_hll_mergeable(spark, SF_SMALL).collect()
    }["ALL"]
    assert merged == direct
