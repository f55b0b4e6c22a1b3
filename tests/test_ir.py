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


def test_ndcg_penalizes_crowded_out_relevant_doc(spark, tmp_path):
    """Fixture where BM25's top-10 is NOT relevance-ideal: ten short
    high-tf rel-2 docs crowd out one very long rel-3 doc (length
    normalization crushes its score). NDCG must (a) drop below 1.0 and
    (b) equal a pure-Python recompute of DCG/IDCG from the engine's
    own BM25 ordering and the token sets."""
    from eecs_485___mapreduce_spark.queries.ir import (
        _NDCG_DISCOUNT,
        BM25_QUERY_TERMS,
        NDCG_K,
        ir_bm25_topk,
        ir_ndcg_bm25_eval,
    )

    rows = []
    for i in range(10):  # rel-2 crowd: short, saturated tf
        rows.append((i, "spark scan " * 5, "en", "s", 0))
    # rel-3 straggler: all three terms once, buried in filler
    rows.append((100, "spark scan window " + "filler " * 400, "en", "s", 0))
    for i in range(200, 230):  # background docs, no query terms
        rows.append((i, "lorem ipsum dolor sit amet", "en", "s", 0))
    d = str(tmp_path / "fixture")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    [got] = ir_ndcg_bm25_eval(spark, d).collect()
    assert got.ndcg_milli < 1000  # the rel-3 doc was crowded out

    rel = {}
    for doc_id, text, *_ in rows:
        r = sum(1 for t in BM25_QUERY_TERMS if t in text.split())
        if r:
            rel[doc_id] = r
    order = [
        r.doc_id
        for r in ir_bm25_topk(spark, d)
        .orderBy("score_fixed", ascending=False)
        .collect()
    ][:NDCG_K]
    dcg = sum(rel.get(doc, 0) * d_ for doc, d_ in zip(order, _NDCG_DISCOUNT))
    ideal = sorted(rel.values(), reverse=True)[:NDCG_K]
    idcg = sum(r * d_ for r, d_ in zip(ideal, _NDCG_DISCOUNT))
    assert (got.dcg_units, got.idcg_units) == (dcg, idcg)
    assert got.ndcg_milli == round(1000.0 * dcg / idcg)
