"""Adversarial-input harness for the RELATIONAL families: every query
whose oracle reads only {orders, lineitem, customer} runs against its
own DuckDB oracle over an EDGE corpus planted with the cases the
synthetic TPC-H-ish tables essentially never produce:

- exact o_totalprice / l_extendedprice / c_acctbal TIES (rank, NTILE,
  decile, skyline, and top-k tiebreak discipline — the same
  data-coincidental-green class as the r6 session-window boundary);
- same (custkey, orderdate) duplicate orders (cadence gap = 0, twin
  screens, SCD-ish dedup);
- calendar boundaries: Dec 31 / Jan 1 straddles and 2021-01-01, which
  belongs to ISO week 53 of 2020 (iso-week/month/year bucketing);
- FK orphans both ways (an order whose customer does not exist, a
  lineitem whose order does not exist) and childless parents (a
  customer with no orders, an order with no lineitems);
- negative and zero monetary values (acctbal < 0 is legitimate
  TPC-H; a zero-price order stresses ratio/log guards);
- discount 0 and the max band edge; quantity ties.

Same discipline as tests/test_edge_corpus.py: every assertion is
engine-vs-oracle on identical data, so any mismatch is a genuine
semantics divergence, not a fixture expectation gone stale.
"""

from __future__ import annotations

import datetime
import os

import duckdb
import pytest

from eecs_485___mapreduce_spark.functions import release_scope
from eecs_485___mapreduce_spark.registry import all_queries

from .conftest import normalize


def _d(y, m, day):
    return datetime.date(y, m, day)


# c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
EDGE_CUSTOMER = [
    (1, "Customer#1", 0, 100.50, "BUILDING"),
    (2, "Customer#2", 0, 100.50, "BUILDING"),   # acctbal tie, same nation
    (3, "Customer#3", 1, 100.50, "MACHINERY"),  # acctbal tie, other nation
    (4, "Customer#4", 1, -999.99, "MACHINERY"), # negative balance
    (5, "Customer#5", 2, 0.00, "AUTOMOBILE"),   # zero balance
    (6, "Customer#6", 2, 5000.00, "AUTOMOBILE"),
    (7, "Customer#7", 3, 5000.00, "HOUSEHOLD"), # cross-nation tie (max tie)
    (8, "Customer#8", 3, 42.42, "HOUSEHOLD"),   # childless: no orders
]

# o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
# o_orderpriority
EDGE_ORDERS = [
    # exact totalprice TIES across statuses and customers
    (101, 1, "O", 1000.00, _d(2024, 1, 10), "1-URGENT"),
    (102, 2, "O", 1000.00, _d(2024, 1, 11), "2-HIGH"),
    (103, 3, "F", 1000.00, _d(2024, 1, 12), "3-MEDIUM"),
    # same (custkey, orderdate) duplicates — cadence gap 0, twin pair
    (104, 1, "F", 2000.00, _d(2024, 2, 1), "1-URGENT"),
    (105, 1, "F", 2000.00, _d(2024, 2, 1), "1-URGENT"),
    # year boundary straddle
    (106, 4, "O", 300.25, _d(2023, 12, 31), "4-NOT SPECIFIED"),
    (107, 4, "P", 300.25, _d(2024, 1, 1), "4-NOT SPECIFIED"),
    # 2021-01-01 is ISO week 53 of ISO-year 2020
    (108, 5, "O", 750.75, _d(2021, 1, 1), "5-LOW"),
    (109, 5, "F", 751.75, _d(2021, 1, 4), "5-LOW"),  # ISO week 1 starts
    # zero-price order
    (110, 6, "O", 0.00, _d(2024, 3, 15), "2-HIGH"),
    # FK orphan: customer 999 does not exist
    (111, 999, "O", 123.45, _d(2024, 3, 16), "3-MEDIUM"),
    # childless: no lineitems
    (112, 6, "F", 9999.99, _d(2024, 3, 17), "1-URGENT"),
    # month boundary pair for cadence / monthly rollups
    (113, 7, "O", 500.00, _d(2024, 4, 30), "2-HIGH"),
    (114, 7, "O", 500.00, _d(2024, 5, 1), "2-HIGH"),
]

# l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
# l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
# l_shipdate
EDGE_LINEITEM = [
    # multi-line order with extendedprice TIES and quantity ties
    (101, 11, 21, 1, 10.0, 500.00, 0.00, 0.00, "N", "O", _d(2024, 1, 15)),
    (101, 12, 22, 2, 10.0, 500.00, 0.05, 0.04, "N", "O", _d(2024, 1, 16)),
    (102, 11, 21, 1, 5.0, 250.25, 0.10, 0.08, "N", "O", _d(2024, 1, 17)),
    # shared part pairs for co-order graphs (11 with 12, 11 with 13)
    (103, 11, 23, 1, 7.0, 700.00, 0.02, 0.00, "R", "F", _d(2024, 1, 20)),
    (103, 13, 23, 2, 7.0, 700.00, 0.02, 0.00, "R", "F", _d(2024, 1, 20)),
    (104, 12, 21, 1, 1.0, 99.99, 0.00, 0.00, "A", "F", _d(2024, 2, 5)),
    (105, 13, 22, 1, 1.0, 99.99, 0.00, 0.00, "A", "F", _d(2024, 2, 5)),
    # zero-quantity-adjacent edges: min quantity, max discount band
    (106, 14, 24, 1, 1.0, 10.00, 0.10, 0.00, "N", "O", _d(2023, 12, 31)),
    (107, 14, 24, 1, 50.0, 5000.00, 0.00, 0.08, "N", "F", _d(2024, 1, 1)),
    (108, 15, 25, 1, 25.0, 1250.00, 0.05, 0.05, "R", "F", _d(2021, 1, 1)),
    (109, 15, 25, 1, 25.0, 1250.00, 0.05, 0.05, "N", "O", _d(2021, 1, 4)),
    (110, 16, 26, 1, 3.0, 0.00, 0.00, 0.00, "N", "O", _d(2024, 3, 15)),
    (111, 16, 26, 1, 2.0, 61.72, 0.01, 0.01, "N", "O", _d(2024, 3, 18)),
    # FK orphan: order 888 does not exist
    (888, 17, 27, 1, 4.0, 444.44, 0.03, 0.02, "R", "F", _d(2024, 3, 20)),
    (113, 11, 21, 1, 6.0, 333.33, 0.04, 0.03, "N", "O", _d(2024, 5, 2)),
    (114, 12, 22, 1, 6.0, 333.33, 0.04, 0.03, "N", "O", _d(2024, 5, 3)),
]

# Queries whose oracles read ONLY {orders, lineitem, customer}. Kept
# as an explicit list (like EDGE_QUERIES in test_edge_corpus.py) so a
# failing enrollment is a conscious decision, not a silent drop.
EDGE_RELATIONAL_QUERIES = [
    "cube_orders",
    "pivot_status_by_priority",
    "sql_q6_discount_revenue",
    "q18_large_orders",
    "unpivot_lineitem_measures",
    "ntile_price_bands",
    "param_sql_high_value_orders",
    "order_cadence_gaps",
    "skyline_orders_price_date",
    "basket_part_lift",
    "dq_constraints_orders",
    "twin_invoice_screen",
    "revenue_reconciliation_audit",
    "fifo_allocation_parts",
    "outlier_orders_robust_z",
    "pagerank_customer_supplier",
    "bfs_hops_part_coorder",
    "order_chain_recursive_cte",
    "sssp_weighted_coorder",
    "coorder_degree_powerlaw",
    "chi2_returnflag_linestatus",
    "anova_order_value_by_segment",
    "welch_ttest_building_machinery",
    "theilsen_monthly_revenue",
    "kaplan_meier_reorder_gaps",
    "pareto_revenue_parts",
    "laspeyres_price_index_monthly",
    "mix_shift_avg_order_value",
    "bootstrap_ci_order_value",
    "did_order_value_building",
    "rfm_customer_segments",
    "triangle_parts_coorder",
    "consistent_hash_rebalance",
    "pseudonymize_linkage",
    "k_anonymity_audit",
    "l_diversity_audit",
    "t_closeness_audit",
    "target_encode_mktsegment",
    "bloom_semi_join_orders",
    "benford_first_digit",
    "integrity_checksum_orders",
    "equidepth_buckets_orders",
    "trimmed_mean_price_by_status",
    "theil_decomposition_revenue",
    "ddsketch_price_quantiles",
    "exact_median_twopass",
    "merkle_bucket_diff_orders",
    "ddsketch_merge_by_source",
    "winsorized_mean_price_by_status",
    "q1_pricing_summary",
    "q3_top_orders",
    "topk_customers",
    "semi_anti_join",
    "set_ops_custkeys",
    "date_agg_orders",
    "math_lineitem",
    "agg_distinct_stats",
    "rollup_orders",
    "percentiles_lineitem",
    "profile_orders_columns",
    "global_sort_orders",
    "orders_iso_week_profile",
    "cusum_changepoint_daily",
    "decile_transition_matrix",
    "peak_open_orders",
    "backlog_lindley_daily",
    "q4_order_priority",
    "q13_order_distribution",
    "q22_idle_customers",
    "set_ops_multiset",
    "grouping_sets_revenue",
    "stats_quantity_price",
    "histogram_totalprice",
    "second_richest_per_nation",
    "window_rank_suite",
    "q11_important_parts",
    "q12_delay_priority",
    "trending_parts_7d",
    "ivm_agg_retraction_daily",
    "lpa_communities_coorder",
    "kcore_peel_coorder",
    "zorder_orders_locality",
    "zonemap_skipping_audit",
    "ivm_join_orders_customers",
    # ACID-layer queries: derive scratch txnlog tables from the edge
    # orders, so DML replay and time travel run over the tie/orphan
    # corpus too
    "txnlog_dml_snapshot",
    "txnlog_cdf_type_counts",
    "txnlog_time_travel_counts",
    "merge_upsert_orders",
]


@pytest.fixture(scope="module")
def edge_rel_dir(spark, tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp("edge-relational"))
    (
        spark.createDataFrame(
            EDGE_CUSTOMER,
            "c_custkey long, c_name string, c_nationkey long, "
            "c_acctbal double, c_mktsegment string",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(d, "customer.parquet"))
    )
    (
        spark.createDataFrame(
            EDGE_ORDERS,
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate date, o_orderpriority string",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(d, "orders.parquet"))
    )
    (
        spark.createDataFrame(
            EDGE_LINEITEM,
            "l_orderkey long, l_partkey long, l_suppkey long, "
            "l_linenumber long, l_quantity double, l_extendedprice double, "
            "l_discount double, l_tax double, l_returnflag string, "
            "l_linestatus string, l_shipdate date",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(d, "lineitem.parquet"))
    )
    yield d
    release_scope(d)


@pytest.fixture(scope="module")
def edge_rel_duck(edge_rel_dir):
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{edge_rel_dir}/{t}.parquet/*.parquet')"
        )
    return con


@pytest.mark.parametrize("name", EDGE_RELATIONAL_QUERIES)
def test_relational_query_matches_oracle_on_edge_corpus(
    name, spark, edge_rel_dir, edge_rel_duck
):
    q = all_queries()[name]
    sdf = q.fn(spark, edge_rel_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    res = edge_rel_duck.execute(q.oracle)
    o_cols = [d[0] for d in res.description]
    o_rows = res.fetchall()
    assert sorted(sdf.columns) == sorted(o_cols), f"{name}: column names differ"
    assert len(s_rows) == len(o_rows), f"{name}: row counts differ"
    assert normalize(s_rows, sdf.columns) == normalize(o_rows, o_cols), (
        f"{name}: values differ on the edge relational corpus"
    )
