"""Accounting identities for the privacy family (queries/privacy.py):
pseudonymized linkage must reproduce the natural-key join exactly,
k-anonymity bands must conserve the customer population, and
l-diversity must conserve the joined order stream."""

from __future__ import annotations

from pyspark.sql import functions as F

from eecs_485___mapreduce_spark.queries.privacy import (
    k_anonymity_audit,
    l_diversity_audit,
    pseudonymize_linkage,
)
from eecs_485___mapreduce_spark.sources import load_table

from .conftest import SF_SMALL


def test_pseudonymized_linkage_equals_natural_key_join(spark):
    got = {
        r["c_nationkey"]: (r["n_customers"], r["n_distinct_sk"], r["n_orders_linked"])
        for r in pseudonymize_linkage(spark, SF_SMALL).collect()
    }
    cust = load_table(spark, SF_SMALL, "customer")
    orders = load_table(spark, SF_SMALL, "orders")
    want = {
        r["c_nationkey"]: (r["n_customers"], r["n_orders"])
        for r in cust.join(
            orders, F.col("o_custkey") == F.col("c_custkey"), "left"
        )
        .groupBy("c_nationkey")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.count("o_orderkey").alias("n_orders"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for nk, (n_cust, n_sk, n_linked) in got.items():
        # surrogate keys collide for nobody at this scale, and the
        # pseudonymized join reaches exactly the natural join's orders
        assert n_sk == n_cust
        assert (n_cust, n_linked) == want[nk]


def test_k_anonymity_bands_conserve_population(spark):
    out = k_anonymity_audit(spark, SF_SMALL).collect()
    n_total = load_table(spark, SF_SMALL, "customer").count()
    assert sum(r["n_rows"] for r in out) == n_total
    assert all(r["n_groups"] >= 1 for r in out)
    bands = {r["risk_band"] for r in out}
    assert bands <= {"k=1 unique", "2<=k<5", "5<=k<20", "k>=20"}


def test_l_diversity_conserves_joined_orders(spark):
    out = l_diversity_audit(spark, SF_SMALL).collect()
    cust = load_table(spark, SF_SMALL, "customer")
    orders = load_table(spark, SF_SMALL, "orders")
    n_joined = orders.join(
        cust, F.col("o_custkey") == F.col("c_custkey")
    ).count()
    assert sum(r["n_orders"] for r in out) == n_joined
    # l is bounded by the sensitive attribute's domain
    n_prio = orders.select("o_orderpriority").distinct().count()
    assert all(1 <= r["l"] <= n_prio for r in out)
