"""Definition-level checks for the curation/statistics batch:
balanced k-fold, curriculum interleave, difference-in-differences,
winsorized mean, degree power-law MLE, and the bigram-LM perplexity
score. Each is re-derived brute-force in Python (or pinned by its
textbook invariant), independent of BOTH the Spark and the DuckDB
expression trees."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pyspark.sql.functions as F

from eecs_485___mapreduce_spark.sources import load_table

from .conftest import SF_SMALL


def test_kfold_balanced_and_complete(spark):
    from eecs_485___mapreduce_spark.queries.curation import (
        KFOLD_K,
        stratified_kfold_assignment,
    )

    rows = stratified_kfold_assignment(spark, SF_SMALL).collect()
    docs = load_table(spark, SF_SMALL, "documents")
    per_source = {
        r.source: r.n for r in docs.groupBy("source").agg(
            F.count(F.lit(1)).alias("n")).collect()
    }
    by_source = defaultdict(list)
    for r in rows:
        by_source[r.source].append(r)
    assert set(by_source) == set(per_source)
    for source, folds in by_source.items():
        assert sorted(f.fold for f in folds) == list(range(KFOLD_K))
        sizes = [f.n_docs for f in folds]
        assert max(sizes) - min(sizes) <= 1, (source, sizes)
        assert sum(sizes) == per_source[source]


def test_curriculum_positions_encode_decile_round_robin(spark):
    from eecs_485___mapreduce_spark.queries.curation import (
        curriculum_interleave_order,
    )

    rows = curriculum_interleave_order(spark, SF_SMALL).collect()
    assert rows, "head of schedule must be non-empty"
    seen = set()
    for r in rows:
        # the interleave law: position mod 10 recovers the decile
        assert r.pos % 10 == r.decile
        assert (r.source, r.pos) not in seen
        seen.add((r.source, r.pos))


def test_did_effect_recomputed_from_cells(spark):
    from eecs_485___mapreduce_spark.queries.mining import (
        did_order_value_building,
    )

    rows = {(r.grp, r.period): r for r in
            did_order_value_building(spark, SF_SMALL).collect()}
    assert len(rows) == 5
    # reconstruct the four cell means from the base rows' exact pieces
    orders = load_table(spark, SF_SMALL, "orders")
    cust = load_table(spark, SF_SMALL, "customer")
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        F.when(F.col("c_mktsegment") == "BUILDING", "treat")
        .otherwise("control").alias("grp"),
        F.when(F.col("o_orderdate") < F.lit("1998-01-01").cast("date"), "pre")
        .otherwise("post").alias("period"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    ).collect()
    sums, ns = Counter(), Counter()
    for r in joined:
        sums[(r.grp, r.period)] += r.cents
        ns[(r.grp, r.period)] += 1
    mean = {k: sums[k] / ns[k] for k in sums}
    want = round(10.0 * (
        mean[("treat", "post")] - mean[("treat", "pre")]
        - mean[("control", "post")] + mean[("control", "pre")]
    ))
    assert rows[("did", "effect")].mean_cents_milli == want
    for cell in (("treat", "pre"), ("treat", "post"),
                 ("control", "pre"), ("control", "post")):
        assert rows[cell].n_orders == ns[cell]
        assert rows[cell].mean_cents_milli == round(10.0 * mean[cell])


def test_winsorized_mean_brute_force(spark):
    from eecs_485___mapreduce_spark.queries.quality_sketch import (
        WINSOR_PCT,
        winsorized_mean_price_by_status,
    )

    got = {r.o_orderstatus: r for r in
           winsorized_mean_price_by_status(spark, SF_SMALL).collect()}
    orders = load_table(spark, SF_SMALL, "orders").select(
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    ).collect()
    by_status = defaultdict(list)
    for r in orders:
        by_status[r.o_orderstatus].append(r.cents)
    assert set(got) == set(by_status)
    for status, vals in by_status.items():
        vals.sort()
        n = len(vals)
        k = n // WINSOR_PCT
        lo, hi = vals[k], vals[n - k - 1]
        clamped = [min(max(v, lo), hi) for v in vals]
        r = got[status]
        assert (r.n_orders, r.lo_cents, r.hi_cents) == (n, lo, hi)
        assert r.winsor_mean_milli == round(10.0 * sum(clamped) / n)


def test_powerlaw_alpha_matches_csn_estimator(spark):
    from eecs_485___mapreduce_spark.queries.graph import (
        POWERLAW_DMIN,
        coorder_degree_powerlaw,
    )
    from eecs_485___mapreduce_spark.queries.mining_graph import coorder_pairs

    r = coorder_degree_powerlaw(spark, SF_SMALL).collect()[0]
    pairs = coorder_pairs(spark, SF_SMALL).collect()
    deg = Counter()
    for p in pairs:
        deg[p.u] += 1
        deg[p.v] += 1
    tail = [d for d in deg.values() if d >= POWERLAW_DMIN]
    sum_lnq = sum(
        round(1_000_000 * math.log(d / (POWERLAW_DMIN - 0.5))) for d in tail
    )
    assert r.n_nodes == len(deg)
    assert r.n_edges == len(pairs)
    assert r.n_tail == len(tail)
    assert r.max_degree == max(deg.values())
    assert r.sum_ln_micro == sum_lnq
    assert r.alpha_milli == round(
        1000 * (1.0 + len(tail) * 1_000_000.0 / sum_lnq)
    )


def test_bigram_lm_surprisal_brute_force(spark):
    from eecs_485___mapreduce_spark.queries.mlprep import (
        bigram_lm_doc_perplexity,
    )

    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "text").collect()
    toks = {
        r.doc_id: [t for t in re.split(r"\s+", r.text.lower()) if t != ""]
        for r in docs
    }
    bigrams = {
        d: list(zip(ts, ts[1:])) for d, ts in toks.items() if len(ts) >= 2
    }
    pair_c, uni_c, succ = Counter(), Counter(), set()
    for bs in bigrams.values():
        for w1, w2 in bs:
            pair_c[(w1, w2)] += 1
            uni_c[w1] += 1
            succ.add(w2)
    v = len(succ)
    per_doc = {}
    for d, bs in bigrams.items():
        s = sum(
            round(1000 * math.log((uni_c[w1] + v) / (pair_c[(w1, w2)] + 1)))
            for w1, w2 in bs
        )
        per_doc[d] = (len(bs), s, round(s / len(bs), 3))
    want = sorted(
        ((m, d) for d, (_, _, m) in per_doc.items()),
        key=lambda t: (-t[0], t[1]),
    )[:50]
    got = bigram_lm_doc_perplexity(spark, SF_SMALL).collect()
    assert [(r.mean_surprisal_mnat, r.doc_id) for r in got] == want
    for r in got:
        n, s, m = per_doc[r.doc_id]
        assert (r.n_bigrams, r.sum_surprisal_mnat) == (n, s)
