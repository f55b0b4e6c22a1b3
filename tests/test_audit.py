"""Audit-operator tests (queries/audit.py): plan shape for the
bucketed interval join and the skyline scan, and behavioral invariants
beyond the oracle hash (skyline anti-chain property, FK audit
accounting identity, sequence-detection monotonicity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from eecs_485___mapreduce_spark.plans import assert_no_cartesian, physical_plan
from eecs_485___mapreduce_spark.queries.audit import (
    FK_EDGES,
    fk_integrity_audit,
    seq_pattern_conversion,
    session_overlap_topk,
    skyline_orders_price_date,
)

from .conftest import SF_SMALL


def test_fk_audit_covers_all_edges_with_consistent_accounting(spark):
    rows = {r.relationship: r for r in fk_integrity_audit(spark, SF_SMALL).collect()}
    assert len(rows) == len(FK_EDGES)
    for r in rows.values():
        # every child row is matched, orphaned, or NULL-keyed
        assert r.n_matched + r.n_orphans + r.n_null_fk == r.n_child, r
    # the synthetic star schema is referentially intact
    assert all(r.n_orphans == 0 for r in rows.values())


def test_skyline_is_an_antichain(spark):
    """No skyline point may dominate another (higher price AND earlier
    date) — the defining property, checked pairwise per segment."""
    rows = skyline_orders_price_date(spark, SF_SMALL).collect()
    assert rows
    by_seg: dict[str, list] = {}
    for r in rows:
        by_seg.setdefault(r.segment, []).append((r.price_dollar, r.min_date))
    for seg, pts in by_seg.items():
        pts.sort(reverse=True)  # price descending
        for (p1, d1), (p2, d2) in zip(pts, pts[1:]):
            assert p1 > p2, (seg, p1, p2)  # dollar grouping collapses ties
            assert d2 < d1, (seg, pts)  # lower price must win on date


def test_skyline_plans_single_window_no_cartesian(spark):
    df = skyline_orders_price_date(spark, SF_SMALL)
    assert_no_cartesian(df)
    plan = physical_plan(df)
    # the dominance check is a window scan, not a self-join
    assert plan.count("SortMergeJoin") == 0, plan
    assert "Window" in plan, plan


def test_seq_pattern_counts_are_nested(spark):
    rows = seq_pattern_conversion(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 <= r.hour_of_day <= 23
        assert 0 <= r.n_converted <= r.n_click_10m <= r.n_views, r


def test_session_overlap_is_bucketed_equijoin(spark):
    """Candidate generation must be an equi-join on the hour bucket —
    never a cartesian/NL interval join."""
    df = session_overlap_topk(spark, SF_SMALL)
    assert_no_cartesian(df)
    rows = df.collect()
    assert rows
    for r in rows:
        assert r.user_a < r.user_b
        assert r.overlap_s > 0
        assert r.n_overlaps >= 1
    vals = [r.overlap_s for r in rows]
    assert vals == sorted(vals, reverse=True)


def test_session_overlap_symmetric_under_user_swap(spark):
    """Pair canonicalization: re-deriving overlaps from the b<a side
    must give the same totals — guards the user_a < user_b filter."""
    rows = session_overlap_topk(spark, SF_SMALL).collect()
    seen = {(r.user_a, r.user_b) for r in rows}
    assert all(a < b for a, b in seen)
    assert len(seen) == len(rows)  # no duplicate pairs


def test_basket_lift_is_equijoin_with_support_floor(spark):
    from eecs_485___mapreduce_spark.queries.audit import (
        BASKET_MIN_SUPPORT,
        basket_part_lift,
    )

    df = basket_part_lift(spark, SF_SMALL)
    assert_no_cartesian(df)
    plan = physical_plan(df)
    assert "TakeOrdered" in plan, plan
    rows = df.collect()
    assert rows
    assert all(r.n_both >= BASKET_MIN_SUPPORT for r in rows)
    assert all(r.part_a < r.part_b for r in rows)
    vals = [r.lift_milli for r in rows]
    assert vals == sorted(vals, reverse=True)


def test_survivorship_conserves_documents(spark):
    from eecs_485___mapreduce_spark.queries.dedup import dedup_survivorship
    from eecs_485___mapreduce_spark.sources import load_table

    rows = dedup_survivorship(spark, SF_SMALL).collect()
    total = load_table(spark, SF_SMALL, "documents").count()
    assert sum(r.n_docs for r in rows) == total
    for r in rows:
        assert r.n_survivors + r.n_dropped == r.n_docs, r
        assert r.n_survivors >= 1


def test_twin_invoice_screen_finds_planted_twins(spark):
    """The corpus's continuous prices yield 0 twins at every SF, so
    the oracle row only certifies the zero; THIS pins the nonzero
    semantics: planted twins match, and each decoy class (other
    customer, other amount, too-far dates) does not."""
    import datetime

    from eecs_485___mapreduce_spark.queries.audit import twin_pairs

    d = datetime.datetime
    rows = [
        # twin pair: same customer, same cents, 2 days apart
        (1, 7, "O", 100.00, d(1995, 1, 1), "1-URGENT"),
        (2, 7, "O", 100.00, d(1995, 1, 3), "1-URGENT"),
        # decoy: same amount+dates, DIFFERENT customer
        (3, 8, "O", 100.00, d(1995, 1, 2), "1-URGENT"),
        # decoy: same customer+dates, different cents (off by one)
        (4, 7, "O", 100.01, d(1995, 1, 2), "1-URGENT"),
        # decoy: same customer+amount, 4 days apart (> gap)
        (5, 7, "O", 100.00, d(1995, 1, 7), "1-URGENT"),
        # second twin pair at gap boundary (exactly 3 days)
        (6, 9, "F", 55.55, d(1996, 6, 1), "5-LOW"),
        (7, 9, "F", 55.55, d(1996, 6, 4), "5-LOW"),
    ]
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    got = sorted(
        (r.orderkey_a, r.orderkey_b, r.custkey, r.cents, r.day_gap)
        for r in twin_pairs(orders).collect()
    )
    assert got == [(1, 2, 7, 10000, 2), (6, 7, 9, 5555, 3)]


def test_fifo_allocation_matches_sequential_simulator(spark):
    """The set-wise cumulative-interval formulation must equal a plain
    sequential FIFO simulation lot-by-lot, and the allocation
    invariants must hold: matched = min(supply, demand) (so at least
    one of unfilled/unused is zero) and the staircase pair count is
    linear (n_pairs <= n_supply + n_demand per part)."""
    from collections import defaultdict

    import pyspark.sql.functions as F

    from eecs_485___mapreduce_spark.queries.audit import fifo_allocation_parts
    from eecs_485___mapreduce_spark.sources import load_table

    got = {r.l_partkey: r for r in fifo_allocation_parts(spark, SF_SMALL).collect()}
    assert got, "census must be non-empty"

    li = (
        load_table(spark, SF_SMALL, "lineitem")
        .where(F.col("l_returnflag").isin("R", "N"))
        .select(
            "l_partkey", "l_returnflag",
            F.col("l_quantity").cast("long").alias("qty"),
            "l_shipdate", "l_orderkey", "l_linenumber",
        )
        .collect()
    )
    supply = defaultdict(list)
    demand = defaultdict(list)
    lots = defaultdict(int)
    for r in sorted(li, key=lambda r: (r.l_shipdate, r.l_orderkey, r.l_linenumber)):
        (supply if r.l_returnflag == "R" else demand)[r.l_partkey].append(r.qty)
    for pk, row in got.items():
        s, d = supply[pk][:], demand[pk][:]
        n_s, n_d = len(s), len(d)
        matched = pairs = 0
        i = 0
        for need in d:
            while need and i < len(s):
                take = min(need, s[i])
                if take:
                    matched += take
                    pairs += 1
                need -= take
                s[i] -= take
                if s[i] == 0:
                    i += 1
        lots[pk] = pairs
        assert row.matched_units == matched, pk
        assert row.unfilled_units == sum(demand[pk]) - matched
        assert row.unused_units == sum(supply[pk]) - matched
        assert min(row.unfilled_units, row.unused_units) == 0
        assert row.n_pairs <= n_s + n_d
        assert row.n_pairs == pairs, pk
