"""Adversarial-input harness for the RELATIONAL families — the TIE
AND THRESHOLD-BOUNDARY complement to the star-schema extremes corpus
in tests/test_edge_corpus.py (_EDGE_STAR targets referential damage:
dangling keys, NULL segments, empty regions, zero prices; THIS corpus
targets exact-equality seams, the r7 boundary-audit class). Every
query whose oracle reads the TPC-H-shaped tables runs against its
own DuckDB oracle over an EDGE corpus planted with the cases the
synthetic tables essentially never produce:

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
    (9, "Customer#9", 4, 123.00, "BUILDING"),   # the only region-2 buyer
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

# The TPC-H-shaped queries window on 1996-1999 dates, so a block of
# edge rows lives INSIDE those windows (ties, returned items, promo
# parts, multi-supplier parts) — otherwise the date filters would
# reduce every multi-table query to a vacuous 0==0 pass.
EDGE_ORDERS += [
    (201, 1, "F", 4000.00, _d(1996, 3, 10), "1-URGENT"),
    (202, 2, "O", 4000.00, _d(1996, 3, 10), "2-HIGH"),   # tie + same day
    (203, 3, "F", 1500.50, _d(1996, 12, 31), "3-MEDIUM"),
    (204, 4, "O", 1500.50, _d(1997, 1, 1), "5-LOW"),     # year straddle
    (205, 5, "F", 800.00, _d(1997, 2, 14), "4-NOT SPECIFIED"),
    (206, 6, "O", 800.00, _d(1997, 3, 31), "1-URGENT"),  # month edge
    (207, 7, "F", 12345.67, _d(1997, 6, 30), "2-HIGH"),
    # q8: the region-2 customer's two orders, one per market-share year
    (208, 9, "O", 2500.00, _d(1996, 6, 1), "1-URGENT"),
    (209, 9, "F", 2600.00, _d(1997, 6, 1), "2-HIGH"),
    # q21: multi-supplier order with lateness at the exact +60d edge
    (210, 1, "F", 700.00, _d(1996, 8, 1), "3-MEDIUM"),
    # twin-invoice screen: same customer, same cents, exactly
    # TWIN_MAX_DAY_GAP (3) days apart -> twin (<= is inclusive);
    # the third copy at +4 days pairs with neither... only with the
    # middle one (1 day gap) — exercising both sides of the edge
    (211, 2, "O", 777.77, _d(1996, 9, 1), "2-HIGH"),
    (212, 2, "F", 777.77, _d(1996, 9, 4), "3-MEDIUM"),
    (213, 2, "O", 777.77, _d(1996, 9, 5), "4-NOT SPECIFIED"),
]

EDGE_LINEITEM += [
    # q10 wants R-flag items inside 1997H1; ties across orders
    (201, 11, 21, 1, 20.0, 2000.00, 0.05, 0.04, "R", "F", _d(1996, 4, 1)),
    (201, 18, 22, 2, 20.0, 2000.00, 0.05, 0.04, "N", "O", _d(1996, 4, 2)),
    (202, 18, 23, 1, 8.0, 2000.00, 0.06, 0.05, "R", "F", _d(1996, 4, 1)),
    # promo part inside q14's 1997-03 window; same part two suppliers
    # (q2/q20 min-offer and dominant-supplier shapes)
    (203, 19, 21, 1, 12.0, 600.00, 0.00, 0.00, "N", "O", _d(1997, 3, 5)),
    (204, 19, 22, 1, 12.0, 600.00, 0.00, 0.00, "N", "O", _d(1997, 3, 15)),
    (205, 20, 23, 1, 30.0, 3000.00, 0.10, 0.08, "R", "F", _d(1997, 1, 1)),
    (206, 20, 24, 1, 30.0, 3000.00, 0.10, 0.08, "A", "F", _d(1997, 3, 31)),
    (207, 11, 25, 1, 2.0, 150.00, 0.01, 0.00, "N", "O", _d(1997, 7, 1)),
    # q8 market share: 1996 splits the region-2 customer's volume
    # 50/50 between a region-2 and a region-0 supplier (share exactly
    # 0.5); 1997 is all region-2 (share exactly 1.0)
    (208, 11, 28, 1, 10.0, 1000.00, 0.00, 0.00, "N", "O", _d(1996, 6, 5)),
    (208, 12, 21, 2, 10.0, 1000.00, 0.00, 0.00, "N", "O", _d(1996, 6, 6)),
    (209, 13, 29, 1, 5.0, 500.00, 0.00, 0.00, "N", "O", _d(1997, 6, 5)),
    # q2 min-offer: part 29 (STANDARD, size exactly <= 5 edge) offered
    # by TWO EUROPE suppliers at the SAME minimum — both rows emit
    (205, 29, 25, 2, 4.0, 80.00, 0.00, 0.00, "N", "O", _d(1997, 1, 10)),
    (206, 29, 26, 2, 4.0, 80.00, 0.00, 0.00, "N", "O", _d(1997, 2, 10)),
    # q20 dominance: part 30 ('small...') qty 70 vs 10 — 70*8 > 80
    # dominates, 10*8 == 80 sits EXACTLY on the strict > boundary and
    # must NOT dominate
    (207, 30, 25, 2, 70.0, 4200.00, 0.00, 0.00, "N", "O", _d(1997, 7, 2)),
    (210, 30, 26, 1, 10.0, 600.00, 0.00, 0.00, "N", "O", _d(1996, 8, 5)),
    # q21 lateness: order 210 (1996-08-01) has three suppliers — one
    # on time, one shipping EXACTLY +60 days (1996-09-30, strict >
    # means NOT late), one at +61 (late) -> n_late is exactly 1
    (210, 15, 27, 2, 3.0, 150.00, 0.00, 0.00, "N", "F", _d(1996, 10, 1)),
    (210, 16, 21, 3, 3.0, 150.00, 0.00, 0.00, "N", "F", _d(1996, 9, 30)),
]

# r_regionkey, r_name
EDGE_REGION = [(0, "AMERICA"), (1, "EUROPE"), (2, "ASIA")]

# n_nationkey, n_name, n_regionkey — nation 3 belongs to EUROPE and
# has customers but NO suppliers (full-outer / anti-join shapes);
# nations 4/5 are ASIA (the q8 market-share region)
EDGE_NATION = [
    (0, "BRAZIL", 0),
    (1, "CANADA", 0),
    (2, "FRANCE", 1),
    (3, "GERMANY", 1),
    (4, "JAPAN", 2),
    (5, "INDIA", 2),
]

# s_suppkey, s_name, s_nationkey, s_acctbal — acctbal ties, a name
# nearly colliding with a customer name (fuzzy match), suppliers
# concentrated so some nations have none
EDGE_SUPPLIER = [
    (21, "Supplier#21", 0, 500.00, ),
    (22, "Supplier#22", 0, 500.00, ),   # tie, same nation
    (23, "Supplier#23", 1, 500.00, ),   # tie, other nation
    (24, "Customer#4", 1, -42.00, ),    # name collides with a customer
    (25, "Supplier#25", 2, 0.00, ),
    (26, "Supplier#26", 2, 9000.00, ),
    (27, "Supplier#27", 2, 9000.00, ),  # max tie
    (28, "Supplier#28", 4, 777.77, ),   # region-2 (q8 numerator)
    (29, "Supplier#29", 5, 777.77, ),   # region-2, balance tie
]

# p_partkey, p_name, p_brand, p_type, p_size, p_retailprice — brand
# and retailprice ties, near-duplicate names, a PROMO type (q14), a
# part no lineitem ever references (28)
EDGE_PART = [
    (11, "ivory linen rose navajo khaki", "Brand#11", "STANDARD PLATED TIN", 10, 100.00),
    (12, "ivory linen rose navajo peach", "Brand#11", "SMALL POLISHED COPPER", 10, 100.00),
    (13, "blue chiffon midnight slate", "Brand#12", "STANDARD PLATED TIN", 20, 100.00),
    (14, "blue chiffon midnight slates", "Brand#12", "LARGE BRUSHED STEEL", 20, 250.25),
    (15, "red ghost turquoise honeydew", "Brand#13", "MEDIUM ANODIZED BRASS", 5, 50.00),
    (16, "red ghost turquoise honeydew", "Brand#14", "MEDIUM ANODIZED BRASS", 5, 50.00),
    (17, "orphan order part cobalt", "Brand#15", "SMALL BURNISHED NICKEL", 15, 75.75),
    (18, "tie price part almond forest", "Brand#11", "STANDARD PLATED TIN", 10, 100.00),
    (19, "promo part lavender metallic", "Brand#16", "PROMO BRUSHED COPPER", 25, 300.00),
    (20, "dominant pair part smoke", "Brand#16", "ECONOMY PLATED ZINC", 25, 300.00),
    (28, "never ordered part void", "Brand#17", "LARGE POLISHED JUMBO", 50, 999.99),
    # q2: type exactly 'STANDARD' at the size <= 5 boundary
    (29, "standard tiny boundary part", "Brand#18", "STANDARD", 5, 80.00),
    # q20: name LIKE 'small%'
    (30, "small dominant share part", "Brand#18", "ECONOMY BURNISHED TIN", 30, 60.00),
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
    # multi-table queries over the dims (region/nation/supplier/part):
    # ties inside the 1996-1997 TPC-H date windows, nations with
    # customers but no suppliers, colliding names, promo parts,
    # never-ordered parts, FK orphans in both fact directions
    "itemcf_topk_similar_parts",
    "q17_small_quantity_revenue",
    "correlated_subquery_q17",
    "exists_high_value_parts",
    "full_outer_nation_activity",
    "fk_integrity_audit",
    "fuzzy_match_customer_supplier",
    "regr_qty_price_by_nation",
    "hits_customer_part",
    "fuzzy_join_part_names",
    "join_cardinality_estimate",
    "gini_revenue_by_nation",
    "weighted_median_price_by_nation",
    "q5_region_revenue",
    "string_part_stats",
    "revenue_share_region_nation",
    "listagg_parts_by_brand",
    "q7_nation_volume",
    "q8_market_share",
    "q10_returned_items",
    "q14_promo_revenue",
    "q16_supplier_variety",
    "q19_disjunctive_revenue",
    "q15_top_supplier",
    "q2_min_offer_supplier",
    "q9_nation_profit",
    "q20_dominant_suppliers",
    "q21_waiting_suppliers",
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
    (
        spark.createDataFrame(EDGE_REGION, "r_regionkey long, r_name string")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(d, "region.parquet"))
    )
    (
        spark.createDataFrame(
            EDGE_NATION, "n_nationkey long, n_name string, n_regionkey long"
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(d, "nation.parquet"))
    )
    (
        spark.createDataFrame(
            EDGE_SUPPLIER,
            "s_suppkey long, s_name string, s_nationkey long, s_acctbal double",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(d, "supplier.parquet"))
    )
    (
        spark.createDataFrame(
            EDGE_PART,
            "p_partkey long, p_name string, p_brand string, p_type string, "
            "p_size long, p_retailprice double",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(d, "part.parquet"))
    )
    yield d
    release_scope(d)


@pytest.fixture(scope="module")
def edge_rel_duck(edge_rel_dir):
    con = duckdb.connect()
    for t in (
        "customer", "orders", "lineitem", "region", "nation", "supplier",
        "part",
    ):
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


# ------------------------------------------- combined cross-family dir

# The handful of queries whose oracles span table FAMILIES (events x
# customers, documents x orders, documents x embeddings, the
# ten-table catalog census) need every edge table in ONE directory —
# composed from this module's relational fixtures plus the
# events/documents/embeddings rows of tests/test_edge_corpus.py, so
# cross-family joins see ties, orphans, NULL users, empty text, and
# zero-norm vectors simultaneously.
CROSS_FAMILY_QUERIES = [
    "catalog_table_stats",
    "functional_dependency_audit",
    "rtbf_delete_audit",
    "skew_salted_join_events",
    "join_skew_profile",
    "ir_rrf_hybrid_topk",
    "encoding_advisor",
]


@pytest.fixture(scope="module")
def edge_all_dir(spark, edge_rel_dir, tmp_path_factory) -> str:
    import shutil

    from .test_edge_corpus import EDGE_EMBEDDINGS, EDGE_EVENTS, EDGE_ROWS

    d = str(tmp_path_factory.mktemp("edge-all"))
    for t in (
        "customer", "orders", "lineitem", "region", "nation", "supplier",
        "part",
    ):
        shutil.copytree(
            os.path.join(edge_rel_dir, f"{t}.parquet"),
            os.path.join(d, f"{t}.parquet"),
        )
    (
        spark.createDataFrame(
            EDGE_ROWS,
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(d, "documents.parquet"))
    )
    (
        spark.createDataFrame(
            EDGE_EVENTS,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(d, "events.parquet"))
    )
    (
        spark.createDataFrame(
            EDGE_EMBEDDINGS, "vec_id long, embedding array<float>, label int"
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(d, "embeddings.parquet"))
    )
    yield d
    release_scope(d)


@pytest.fixture(scope="module")
def edge_all_duck(edge_all_dir):
    con = duckdb.connect()
    for t in (
        "customer", "orders", "lineitem", "region", "nation", "supplier",
        "part", "documents", "events", "embeddings",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{edge_all_dir}/{t}.parquet/*.parquet')"
        )
    return con


@pytest.mark.parametrize("name", CROSS_FAMILY_QUERIES)
def test_cross_family_query_matches_oracle_on_edge_corpus(
    name, spark, edge_all_dir, edge_all_duck
):
    q = all_queries()[name]
    sdf = q.fn(spark, edge_all_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    res = edge_all_duck.execute(q.oracle)
    o_cols = [d[0] for d in res.description]
    o_rows = res.fetchall()
    assert sorted(sdf.columns) == sorted(o_cols), f"{name}: column names differ"
    assert len(s_rows) == len(o_rows), f"{name}: row counts differ"
    assert normalize(s_rows, sdf.columns) == normalize(o_rows, o_cols), (
        f"{name}: values differ on the combined edge corpus"
    )
