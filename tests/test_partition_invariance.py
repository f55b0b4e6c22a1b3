"""Partition-count invariance sweep: a query's RESULT must be a pure
function of the data, not of the parallelism it ran under. On a
1000-executor cluster the shuffle fan-out and scan split count differ
wildly from local[32], so any result that leaks partitioning —
float sums reduced in partition order, rank/argmax ties broken by
arrival, per-partition seeds — is a correctness bug that the fixed-
config oracle gate can never see (it always runs one layout).

This sweep re-runs the most partitioning-sensitive registered queries
under three deliberately different layouts and requires bit-identical
normalized rows:

  - the session default (shuffle=32, AQE on, default splits);
  - LOW:  shuffle=3, AQE off (big partitions, no runtime re-plan);
  - HIGH: shuffle=97, 64 KB scan splits, AQE on (many tiny
    partitions, maximum reduction-order scrambling).

The engine's determinism discipline (decimal-exact or explicitly
rounded aggregates, total-order tie-breaks, quantized-integer
iterative means — functions/__init__.py docstring) is exactly what
this pins; the sketch estimators that are partition-dependent BY
CONSTRUCTION (percentile_approx GK, approx_count_distinct HLL++) are
deliberately absent.
"""

from __future__ import annotations

import pytest

from eecs_485___mapreduce_spark.functions import release_scope
from eecs_485___mapreduce_spark.registry import all_queries

from .conftest import SF_SMALL, normalize

# The riskiest determinism classes, one representative set each:
# iterative quantized-mean fits, ANN top-k with score ties, global
# sorts/ranks/medians, unrolled argmax loops, graph fixpoints,
# prefix-scan reductions, float-weighted windows and regressions.
SWEEP = [
    # iterative / ANN family (quantized-integer means, md5 planes)
    "kmeans_assign_cells",
    "kmeans_cell_profile",
    "dedup_semantic_cells",
    "similarity_topk_cosine",
    "similarity_topk_lsh",
    "similarity_topk_ivf",
    "similarity_topk_ivf_kmeans",
    "similarity_topk_pq",
    "pca_top_component_power",
    # global order statistics / ranks
    "global_sort_orders",
    "exact_median_twopass",
    "weighted_median_price_by_nation",
    "equidepth_buckets_orders",
    "ntile_price_bands",
    "decile_transition_matrix",
    "quantile_normalize_doclen",
    # unrolled argmax / greedy loops
    "greedy_coverage_selection",
    "bpe_learn_merges",
    "ucb1_variant_replay",
    # graph fixpoints
    "pagerank_customer_supplier",
    "lpa_communities_coorder",
    "kcore_peel_coorder",
    # staircase / prefix-scan joins
    "fifo_allocation_parts",
    "watermark_lateness_audit",
    # float-score top-k with ties
    "text_tfidf_top_terms",
    "dedup_minhash_lsh",
    "theilsen_monthly_revenue",
    "ewma_user_value_recent",
    "ddsketch_price_quantiles",
]

LOW = {
    "spark.sql.shuffle.partitions": "3",
    "spark.sql.adaptive.enabled": "false",
}
HIGH = {
    "spark.sql.shuffle.partitions": "97",
    "spark.sql.files.maxPartitionBytes": "65536",
    "spark.sql.adaptive.enabled": "true",
}


def _run(spark, name, conf):
    saved = {k: spark.conf.get(k) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    # Drop scoped persists so cached relations from a previous layout
    # cannot mask a partitioning leak in their producers.
    release_scope(SF_SMALL)
    try:
        df = all_queries()[name].fn(spark, SF_SMALL)
        return normalize(df.collect(), df.columns)
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
        release_scope(SF_SMALL)


@pytest.mark.parametrize("name", SWEEP)
def test_result_is_partitioning_invariant(spark, name):
    base = _run(spark, name, {})
    low = _run(spark, name, LOW)
    assert low == base, f"{name}: differs under shuffle=3/AQE-off"
    high = _run(spark, name, HIGH)
    assert high == base, f"{name}: differs under shuffle=97/64KB splits"
