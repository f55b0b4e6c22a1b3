"""IR operator tests (queries/ir.py): plan shape (TakeOrdered top-k,
no cartesian candidate generation, broadcast query terms) plus
behavioral invariants the oracle hash can't express (posting-list
ordering, BM25 monotonicity, PMI on a hand-computable corpus)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from eecs_485___mapreduce_spark.plans import assert_no_cartesian, physical_plan
from eecs_485___mapreduce_spark.queries.ir import (
    BM25_QUERY_TERMS,
    ir_bm25_topk,
    ir_inverted_index,
    ir_pmi_collocations,
    pmi_relation,
)

from .conftest import SF_SMALL


def test_inverted_index_topk_is_takeordered(spark):
    """Top-k terms must plan TakeOrdered, never a global Sort — a full
    sort of the term dictionary is wrong at vocabulary scale."""
    plan = physical_plan(ir_inverted_index(spark, SF_SMALL))
    assert "TakeOrdered" in plan, plan
    assert_no_cartesian(ir_inverted_index(spark, SF_SMALL))


def test_inverted_index_postings_sorted_and_capped(spark):
    rows = ir_inverted_index(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        ids = [int(x) for x in r.postings_head.split(",")]
        assert ids == sorted(ids), r.term
        assert len(ids) <= 20
        assert r.df >= len(ids) if r.df < 20 else len(ids) == 20


def test_bm25_broadcasts_query_terms_no_cartesian(spark):
    df = ir_bm25_topk(spark, SF_SMALL)
    assert_no_cartesian(df)
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "TakeOrdered" in plan, plan


def test_bm25_scores_descending_and_terms_bounded(spark):
    rows = ir_bm25_topk(spark, SF_SMALL).collect()
    assert rows
    scores = [r.score_fixed for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(1 <= r.n_terms_hit <= len(BM25_QUERY_TERMS) for r in rows)
    assert all(r.score_fixed > 0 for r in rows)


def test_pmi_matches_hand_computation(spark):
    """PMI on a corpus small enough to compute by hand: 'a b' always
    co-occurs, 'a c' never does. Uses the same token/bigram pipeline
    via a temp documents table."""
    docs = spark.createDataFrame(
        [(i, "a b a b a b a b a b a b a b a b a b a b") for i in range(5)],
        "doc_id long, text string",
    )
    toks = docs.select(F.split(F.lower("text"), r"\s+").alias("t"))
    # 20 tokens/doc, 19 bigrams/doc: c(a)=c(b)=50, T=100,
    # c('a b')=50, c('b a')=45, B=95.
    t_total, b_total, c_ab, c_a, c_b = 100, 95, 50, 50, 50
    want = round(math.log(c_ab * t_total * t_total / (b_total * c_a * c_b)) * 1000)
    assert toks.count() == 5  # fixture sanity
    got = {r.bigram: r.pmi_millinats for r in pmi_relation(docs).collect()}
    assert got["a b"] == want


def test_pmi_output_respects_min_count(spark):
    rows = ir_pmi_collocations(spark, SF_SMALL).collect()
    assert rows
    assert all(r.c_xy >= 20 for r in rows)
    vals = [r.pmi_millinats for r in rows]
    assert vals == sorted(vals, reverse=True)
