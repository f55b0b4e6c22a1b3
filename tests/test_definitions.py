"""Definition-level checks for this round's statistics/sketch
operators: the DuckDB oracle proves ENGINE PARITY (both sides evaluate
the same expression tree), so each operator whose math could be
transcribed wrong in BOTH places gets an independent check against
the textbook definition or a brute-force recomputation (the
Mann-Whitney U_a/U_b swap was caught exactly this way)."""

from __future__ import annotations

from collections import defaultdict

import pyspark.sql.functions as F

from eecs_485___mapreduce_spark.sources import load_table

from .conftest import SF_SMALL


def test_cohens_kappa_matches_confusion_matrix_definition(spark):
    from eecs_485___mapreduce_spark.queries.text import (
        cohens_kappa_langid,
        text_lang_id,
    )

    preds = text_lang_id(spark, SF_SMALL).select("lang", "pred_lang").collect()
    n = len(preds)
    agree = sum(1 for r in preds if r.lang == r.pred_lang)
    row_m, col_m = defaultdict(int), defaultdict(int)
    for r in preds:
        row_m[r.lang] += 1
        col_m[r.pred_lang] += 1
    pe_num = sum(row_m[c] * col_m.get(c, 0) for c in row_m)
    po, pe = agree / n, pe_num / (n * n)
    want = round(1_000_000 * (po - pe) / (1 - pe))

    got = cohens_kappa_langid(spark, SF_SMALL).collect()[0]
    assert (got.n_docs, got.n_agree) == (n, agree)
    assert got.kappa_micro == want


def test_bootstrap_ci_brackets_point_estimate(spark):
    from eecs_485___mapreduce_spark.queries.mining import bootstrap_ci_order_value

    r = bootstrap_ci_order_value(spark, SF_SMALL).collect()[0]
    assert r.ci_lo_cents < r.ci_hi_cents
    assert r.ci_lo_cents <= r.mean_cents <= r.ci_hi_cents
    assert r.n_replicates == 32


def test_ddsketch_bucket_contains_true_quantile(spark):
    """The DDSketch guarantee: the reported bucket [lo, hi] must
    contain the EXACT q-quantile value (rank ceil(q*n) in sorted
    order) for every reported percentile."""
    from eecs_485___mapreduce_spark.queries.quality_sketch import ddsketch_price_quantiles

    orders = load_table(spark, SF_SMALL, "orders")
    cents = sorted(
        r.c
        for r in orders.where(F.col("o_totalprice") >= 0.01)
        .select(F.round(F.col("o_totalprice") * 100).cast("long").alias("c"))
        .collect()
    )
    n = len(cents)
    for r in ddsketch_price_quantiles(spark, SF_SMALL).collect():
        true_q = cents[-(-r.pct * n // 100) - 1]  # value at rank ceil(p*n/100)
        assert r.lo_cents <= true_q <= r.hi_cents, (r, true_q)
        # relative-accuracy guarantee of the 3-sub-bit bucket layout
        assert (r.hi_cents - r.lo_cents) <= max(1, r.lo_cents) / 8 + 1


def test_interval_union_matches_bruteforce_sets(spark):
    from eecs_485___mapreduce_spark.queries.temporal import (
        _COVER_WINDOW_S,
        interval_union_coverage,
    )

    ev = (
        load_table(spark, SF_SMALL, "events")
        .where(F.col("user_id").isNotNull())
        .select("user_id", F.unix_timestamp("ts").alias("s"))
        .collect()
    )
    covered = defaultdict(set)
    for r in ev:
        covered[r.user_id].update(range(r.s, r.s + _COVER_WINDOW_S))
    got = {r.user_id: r.covered_s for r in interval_union_coverage(spark, SF_SMALL).collect()}
    assert got == {u: len(s) for u, s in covered.items()}


def test_apportionment_sums_to_budget_and_is_proportional(spark):
    from eecs_485___mapreduce_spark.queries.curation import (
        _APPORTION_BUDGET,
        budget_apportion_sources,
    )

    rows = budget_apportion_sources(spark, SF_SMALL).collect()
    assert sum(r.alloc_tokens for r in rows) == _APPORTION_BUDGET
    total = sum(r.n_tokens for r in rows)
    for r in rows:
        exact = r.n_tokens * _APPORTION_BUDGET / total
        # largest-remainder never deviates more than 1 from the quota
        assert abs(r.alloc_tokens - exact) < 1.0, (r, exact)


def test_consistent_hash_movement_properties(spark):
    """mod-N must move ~(N)/(N+1) of keys; the ring must move a small
    fraction (~1/(N+1) in expectation; generous ceiling here)."""
    from eecs_485___mapreduce_spark.queries.mlprep import consistent_hash_rebalance

    rows = {r.strategy: r for r in consistent_hash_rebalance(spark, SF_SMALL).collect()}
    assert rows["mod_n"].moved_per_100k > 90_000
    assert rows["consistent_ring"].moved_per_100k < 20_000
    assert rows["mod_n"].n_keys == rows["consistent_ring"].n_keys


def test_merkle_diff_counts_match_direct_drift(spark):
    from eecs_485___mapreduce_spark.queries.quality_sketch import (
        _MK_DEL_EVERY,
        _MK_MOD_EVERY,
        _MK_N_LEAVES,
        merkle_bucket_diff_orders,
    )

    keys = [
        r.o_orderkey
        for r in load_table(spark, SF_SMALL, "orders").select("o_orderkey").collect()
    ]
    drifted = {
        k for k in keys if k % _MK_MOD_EVERY == 0 or k % _MK_DEL_EVERY == 0
    }
    want_leaves = {k % _MK_N_LEAVES for k in drifted}
    got = {r.level: r for r in merkle_bucket_diff_orders(spark, SF_SMALL).collect()}
    assert got["leaf"].n_mismatched == len(want_leaves)
    assert got["group"].n_mismatched == len(
        {l // (_MK_N_LEAVES // 16) for l in want_leaves}
    )
    # repair narrows: leaf-level resync never exceeds group-level
    assert got["leaf"].rows_to_resync <= got["group"].rows_to_resync


def test_join_cardinality_estimate_matches_real_join_counts(spark):
    """The histogram product must equal the ACTUAL row count of each
    predicted join — the whole point of the estimator is exactness."""
    from eecs_485___mapreduce_spark.queries.pipeline import join_cardinality_estimate

    got = {r.join_name: r for r in join_cardinality_estimate(spark, SF_SMALL).collect()}
    li = load_table(spark, SF_SMALL, "lineitem")
    orders = load_table(spark, SF_SMALL, "orders")
    part = load_table(spark, SF_SMALL, "part")
    customer = load_table(spark, SF_SMALL, "customer")
    real = {
        "lineitem*orders@orderkey": li.join(
            orders, li.l_orderkey == orders.o_orderkey
        ).count(),
        "lineitem*part@partkey": li.join(part, li.l_partkey == part.p_partkey).count(),
        "orders*customer@custkey": orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).count(),
    }
    assert {k: v.out_rows for k, v in got.items()} == real
    for r in got.values():
        assert r.max_key_out <= r.out_rows
        assert r.amplification_pct == r.out_rows * 100 // r.left_matched_rows


def test_listagg_is_sorted_prefix_of_distinct_types(spark):
    from eecs_485___mapreduce_spark.queries.relational import listagg_parts_by_brand

    part = load_table(spark, SF_SMALL, "part")
    want = defaultdict(set)
    for r in part.select("p_brand", "p_type").collect():
        want[r.p_brand].add(r.p_type)
    for r in listagg_parts_by_brand(spark, SF_SMALL).collect():
        assert r.n_types == len(want[r.p_brand])
        assert r.top_types == ",".join(sorted(want[r.p_brand])[:5])


def test_negative_pairs_are_cross_source_and_deterministic(spark):
    from eecs_485___mapreduce_spark.queries.mlprep_supervised import (
        NEG_K,
        NEG_N_ANCHORS,
        negative_pair_mining,
    )

    rows = negative_pair_mining(spark, SF_SMALL).collect()
    src = {
        r.doc_id: r.source
        for r in load_table(spark, SF_SMALL, "documents").select("doc_id", "source").collect()
    }
    per_anchor = defaultdict(list)
    for r in rows:
        per_anchor[r.doc_id].append(r)
        assert r.neg_source == src[r.neg_doc_id]
        assert r.neg_source != src[r.doc_id]  # cross-source negatives only
        assert r.neg_doc_id != r.doc_id
    assert len(per_anchor) <= NEG_N_ANCHORS
    for negs in per_anchor.values():
        assert len(negs) <= NEG_K
        assert [r.neg_rank for r in sorted(negs, key=lambda r: r.neg_rank)] == list(
            range(1, len(negs) + 1)
        )
    # determinism: a second evaluation reproduces the identical pair set
    again = negative_pair_mining(spark, SF_SMALL).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_brier_decomposition_matches_textbook():
    """Recompute BS, REL, RES, WBV, UNC directly from per-doc
    (p, o) pairs with the textbook formulas; the oracle's quantized
    components must match within per-bin rounding (<= 10 micro) and
    satisfy the exact 4-term identity BS = REL - RES + UNC + WBV."""
    import duckdb

    import eecs_485___mapreduce_spark.queries.text  # noqa: F401
    from eecs_485___mapreduce_spark.registry import REGISTRY

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{SF_SMALL}/documents.parquet')"
    )
    pairs = con.execute("""
        SELECT CASE WHEN length(text) = 0 THEN 0
                    ELSE length(regexp_replace(text, '[^\\x00-\\x7f]', '', 'g'))
                         * 100 // length(text) END,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END
        FROM documents
    """).fetchall()
    n = len(pairs)
    bins: dict[int, list[tuple[int, int]]] = {}
    for p, o in pairs:
        bins.setdefault(min(p * 10 // 100, 9), []).append((p, o))
    obar = sum(o for _, o in pairs) / n
    bs = sum((p / 100 - o) ** 2 for p, o in pairs) / n
    rel = res = wbv = 0.0
    for members in bins.values():
        nk = len(members)
        pbar = sum(p for p, _ in members) / nk / 100
        ok = sum(o for _, o in members) / nk
        rel += nk * (pbar - ok) ** 2 / n
        res += nk * (ok - obar) ** 2 / n
        wbv += sum((p / 100 - pbar) ** 2 for p, _ in members) / n
    unc = obar * (1 - obar)

    [row] = con.execute(
        REGISTRY["brier_decomposition_langid"].oracle
    ).fetchall()
    got = dict(zip(("n_docs", "bs", "rel", "res", "wbv", "unc"), row))
    assert got["n_docs"] == n
    for name, want in (("bs", bs), ("rel", rel), ("res", res),
                       ("wbv", wbv), ("unc", unc)):
        assert abs(got[name] - round(want * 1e6)) <= 10, (name, got[name], want)
    assert abs(bs - (rel - res + unc + wbv)) < 1e-12  # exact identity
