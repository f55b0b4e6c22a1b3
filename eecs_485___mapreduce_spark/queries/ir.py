r"""Information-retrieval operators: inverted-index construction, BM25
ranking, and PMI collocation mining.

These are the search-side primitives a corpus platform needs next to
its curation pipeline (SURVEY.md section 2.B, training-pipeline row):
the inverted index is the physical structure behind keyword search and
the n-gram decontamination index (queries/pipeline.py builds a
transient one; this query materializes it as a first-class artifact),
BM25 is the standard lexical relevance ranking, and PMI collocations
are the statistical phrase detector used for tokenizer-vocabulary and
boilerplate analysis.

Cross-engine determinism follows the package discipline (SCALE.md):
every log-derived score is quantized to integer micro-/milli-units
BEFORE any aggregation or ranking, so bigint sums are exact under any
partitioning and both engines rank identically. Inputs to ``ln`` are
exact (integer counts and sub-2^53 integer ratios), so Java ``log``
and DuckDB ``ln`` agree to the last ulp for the same double input; the
1-ulp worst case is ~10 orders of magnitude below the quantization
step.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import VALID_VEC_SQL, scoped_persist, tokens
from ..registry import register
from ..sources import load_table

_TOKS = r"list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '')"

# ------------------------------------------------- inverted index

POSTINGS_CAP = 20  # doc ids materialized per term in the audit output
INDEX_TOP_TERMS = 50


@register(
    "ir_inverted_index",
    tags=("text", "agg", "topk", "search"),
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    tf AS (
      SELECT doc_id, unnest(toks) AS term FROM t
    ),
    per_doc AS (
      SELECT term, doc_id, COUNT(*) AS tf
      FROM tf GROUP BY term, doc_id
    )
    SELECT term,
           COUNT(*) AS df,
           CAST(SUM(tf) AS BIGINT) AS tf_total,
           array_to_string(
             (list_sort(list(doc_id)))[1:{POSTINGS_CAP}], ',') AS postings_head
    FROM per_doc
    GROUP BY term
    ORDER BY df DESC, term
    LIMIT {INDEX_TOP_TERMS}
    """,
)
def ir_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized inverted index: for the {n} highest-df terms, the
    document frequency, total term frequency, and the head of the
    sorted posting list (first {cap} doc ids, comma-joined — arrays are
    reduced to a canonical string so the result is value-hashable).

    Scale (100 TB): the canonical build-an-index shuffle — tokenize
    array-side (no join), partial-agg (term, doc) counts map-side,
    ONE shuffle on the term key. Posting lists are capped per term
    ({cap} ids) so no reducer materializes an unbounded hot-term list
    in this audit form; a full index build would instead write the
    (term, doc, tf) relation bucketed by term (sinks.py bucketed
    writer) and never collect postings into a single row. Top-k terms
    plan TakeOrdered, never a global sort.
    """.format(n=INDEX_TOP_TERMS, cap=POSTINGS_CAP)
    docs = load_table(spark, sf_dir, "documents")
    per_doc = (
        docs.select("doc_id", F.explode(tokens("text")).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return (
        per_doc.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("tf_total"),
            F.array_join(
                F.transform(
                    F.slice(F.array_sort(F.collect_list("doc_id")), 1, POSTINGS_CAP),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings_head"),
        )
        .orderBy(F.col("df").desc(), "term")
        .limit(INDEX_TOP_TERMS)
    )


# ------------------------------------------------------------- BM25

BM25_QUERY_TERMS = ("spark", "scan", "window")
BM25_K1_X10 = 12  # k1 = 1.2
BM25_B_X100 = 75  # b = 0.75
BM25_TOPK = 20
_SCALE = 1_000_000  # score micro-units


def _bm25_oracle() -> str:
    terms = ", ".join(f"('{t}')" for t in BM25_QUERY_TERMS)
    return f"""
    WITH q(term) AS (VALUES {terms}),
    t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    dl AS (SELECT doc_id, len(toks) AS doclen FROM t),
    stats AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(doclen) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ),
    tf AS (
      SELECT doc_id, unnest(toks) AS term FROM t
    ),
    dtf AS (
      SELECT tf.doc_id, tf.term, COUNT(*) AS tf
      FROM tf JOIN q USING (term)
      GROUP BY tf.doc_id, tf.term
    ),
    df AS (SELECT term, COUNT(*) AS df FROM dtf GROUP BY term),
    scored AS (
      SELECT dtf.doc_id,
             CAST(ROUND(
               ln(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
               * (dtf.tf * (1.0 + {BM25_K1_X10} / 10.0))
               / (dtf.tf + ({BM25_K1_X10} / 10.0)
                  * (1.0 - {BM25_B_X100} / 100.0
                     + ({BM25_B_X100} / 100.0) * dl.doclen / stats.avgdl))
               * {_SCALE}, 0) AS BIGINT) AS term_score
      FROM dtf
      JOIN df USING (term)
      JOIN dl USING (doc_id)
      CROSS JOIN stats
    )
    SELECT doc_id,
           COUNT(*) AS n_terms_hit,
           CAST(SUM(term_score) AS BIGINT) AS score_fixed
    FROM scored
    GROUP BY doc_id
    ORDER BY score_fixed DESC, doc_id
    LIMIT {BM25_TOPK}
    """


@register(
    "ir_bm25_topk",
    tags=("text", "join", "topk", "search"),
    oracle=_bm25_oracle(),
)
def ir_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (k1=1.2, b=0.75) top-{k} documents for a fixed keyword
    query — standard lexical relevance over the corpus.

    Determinism: each (doc, term) partial score is quantized to
    integer micro-units BEFORE the per-doc sum, so the bigint total is
    partition-order independent and both engines rank identically
    (module docstring covers the ln ulp argument).

    Scale (100 TB): the query-term relation is tiny and broadcast; the
    corpus tokenizes once (persisted token relation shared with the
    doc-length side), the semi-join to query terms prunes the exploded
    stream BEFORE the (doc, term) shuffle, and corpus stats (N, avgdl)
    are a constant-size agg broadcast back. Top-k plans TakeOrdered.
    At index-backed scale this would instead probe the bucketed
    inverted index (ir_inverted_index) — same join shape, no re-scan
    of raw text.
    """.format(k=BM25_TOPK)
    docs = load_table(spark, sf_dir, "documents")
    q = spark.createDataFrame([(t,) for t in BM25_QUERY_TERMS], "term string")
    base = scoped_persist(
        ("ir.bm25.toks", sf_dir),
        docs.select("doc_id", tokens("text").alias("toks")),
    )
    dl = base.select("doc_id", F.size("toks").alias("doclen"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("doclen").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    dtf = (
        base.select("doc_id", F.explode("toks").alias("term"))
        .join(F.broadcast(q), "term")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_rel = dtf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    k1 = BM25_K1_X10 / 10.0
    b = BM25_B_X100 / 100.0
    scored = (
        dtf.join(F.broadcast(df_rel), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(
                F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * (F.col("tf") * (1.0 + k1))
                / (F.col("tf") + k1 * (1.0 - b + b * F.col("doclen") / F.col("avgdl")))
                * _SCALE,
                0,
            )
            .cast("bigint")
            .alias("term_score"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms_hit"),
            F.sum("term_score").alias("score_fixed"),
        )
        .orderBy(F.col("score_fixed").desc(), "doc_id")
        .limit(BM25_TOPK)
    )


# ------------------------------------ hybrid retrieval (RRF fusion)

RRF_K = 60  # the standard reciprocal-rank-fusion damping constant
RRF_LIST_K = 50  # depth of each input ranking
RRF_OUT_K = 20
RRF_QUERY_VEC = 0  # semantic query: embedding vec_id (doc_id-aligned)
RRF_SCALE = 1_000_000

_COS_SQL = (
    "list_dot_product(qe, ce) / "
    "(sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce)))"
)


def _rrf_oracle() -> str:
    terms = ", ".join(f"('{t}')" for t in BM25_QUERY_TERMS)
    return f"""
    WITH q(term) AS (VALUES {terms}),
    t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    dl AS (SELECT doc_id, len(toks) AS doclen FROM t),
    stats AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(doclen) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ),
    tf AS (SELECT doc_id, unnest(toks) AS term FROM t),
    dtf AS (
      SELECT tf.doc_id, tf.term, COUNT(*) AS tf
      FROM tf JOIN q USING (term)
      GROUP BY tf.doc_id, tf.term
    ),
    df AS (SELECT term, COUNT(*) AS df FROM dtf GROUP BY term),
    bm AS (
      SELECT dtf.doc_id,
             CAST(SUM(CAST(ROUND(
               ln(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
               * (dtf.tf * (1.0 + {BM25_K1_X10} / 10.0))
               / (dtf.tf + ({BM25_K1_X10} / 10.0)
                  * (1.0 - {BM25_B_X100} / 100.0
                     + ({BM25_B_X100} / 100.0) * dl.doclen / stats.avgdl))
               * {_SCALE}, 0) AS BIGINT)) AS BIGINT) AS score_fixed
      FROM dtf
      JOIN df USING (term)
      JOIN dl USING (doc_id)
      CROSS JOIN stats
      GROUP BY dtf.doc_id
    ),
    lex AS (
      SELECT doc_id, rk_lex FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY score_fixed DESC, doc_id) AS rk_lex
        FROM bm)
      WHERE rk_lex <= {RRF_LIST_K}
    ),
    qv AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings
           WHERE vec_id = {RRF_QUERY_VEC} AND {VALID_VEC_SQL}),
    cv AS (SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS ce
           FROM embeddings WHERE vec_id <> {RRF_QUERY_VEC} AND {VALID_VEC_SQL}),
    sem AS (
      SELECT nid AS doc_id, rk_sem FROM (
        SELECT nid,
               ROW_NUMBER() OVER (ORDER BY round({_COS_SQL}, 6) DESC, nid)
                 AS rk_sem
        FROM cv CROSS JOIN qv)
      WHERE rk_sem <= {RRF_LIST_K}
    ),
    fused AS (
      SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
             lex.rk_lex, sem.rk_sem,
             CAST(COALESCE({RRF_SCALE} // ({RRF_K} + lex.rk_lex), 0)
                + COALESCE({RRF_SCALE} // ({RRF_K} + sem.rk_sem), 0)
                AS BIGINT) AS rrf_fixed
      FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
    )
    SELECT doc_id, rk_lex, rk_sem, rrf_fixed FROM fused
    ORDER BY rrf_fixed DESC, doc_id
    LIMIT {RRF_OUT_K}
    """


@register(
    "ir_rrf_hybrid_topk",
    tags=("text", "join", "topk", "search", "vector"),
    oracle=_rrf_oracle(),
)
def ir_rrf_hybrid_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by reciprocal-rank fusion: the lexical BM25
    ranking (same query terms and scoring as ir_bm25_topk) fused with
    a semantic cosine ranking (corpus embeddings vs query vector
    {qv}, doc_id-aligned) — score = sum over lists of
    1e6/(60 + rank), the standard no-tuning hybrid-search combiner an
    LLM retrieval stack runs over its sparse+dense indexes.

    Determinism: both input ranks tiebreak on doc id; each reciprocal
    term is the exact integer division 1e6 div (60+rank), so the
    fused score is an exact BIGINT — no float fusion anywhere.

    Scale (100 TB): each ranking is top-{lk} via TakeOrdered /
    window over its own scale-safe pipeline (BM25: broadcast query
    terms prune the token stream before the (doc,term) shuffle;
    cosine: bounded query side broadcasts, corpus streams through one
    scan). The fusion then FULL-OUTER-joins two {lk}-row relations —
    constant-size work. Deeper corpora swap the exact cosine leg for
    the LSH/IVF ANN variants (queries/similarity.py) with the same
    fusion unchanged.

    Reference parity: none; committed search family (SURVEY.md
    section 2.B) composing the IR and similarity modules.
    """.format(qv=RRF_QUERY_VEC, lk=RRF_LIST_K)
    from ..functions import as_double_array, cosine, valid_vector

    docs = load_table(spark, sf_dir, "documents")
    q = spark.createDataFrame([(t,) for t in BM25_QUERY_TERMS], "term string")
    base = scoped_persist(
        ("ir.bm25.toks", sf_dir),
        docs.select("doc_id", tokens("text").alias("toks")),
    )
    dl = base.select("doc_id", F.size("toks").alias("doclen"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("doclen").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    dtf = (
        base.select("doc_id", F.explode("toks").alias("term"))
        .join(F.broadcast(q), "term")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_rel = dtf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    k1 = BM25_K1_X10 / 10.0
    b = BM25_B_X100 / 100.0
    bm = (
        dtf.join(F.broadcast(df_rel), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (1.0 + k1))
                / (F.col("tf") + k1 * (1.0 - b + b * F.col("doclen") / F.col("avgdl")))
                * _SCALE,
                0,
            )
            .cast("bigint")
            .alias("term_score"),
        )
        .groupBy("doc_id")
        .agg(F.sum("term_score").alias("score_fixed"))
    )
    # top-k FIRST (TakeOrdered — never a global window sort), then
    # rank the k surviving rows; identical ranks to a global
    # row_number but the window runs over k rows, not the corpus
    lex = (
        bm.orderBy(F.col("score_fixed").desc(), "doc_id")
        .limit(RRF_LIST_K)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("score_fixed").desc(), "doc_id"))
            .alias("rk_lex"),
        )
    )

    emb = load_table(spark, sf_dir, "embeddings").filter(
        valid_vector(as_double_array("embedding"))
    )
    qv = emb.filter(F.col("vec_id") == RRF_QUERY_VEC).select(
        as_double_array("embedding").alias("qe")
    )
    cv = emb.filter(F.col("vec_id") != RRF_QUERY_VEC).select(
        F.col("vec_id").alias("nid"), as_double_array("embedding").alias("ce")
    )
    sem = (
        cv.crossJoin(F.broadcast(qv))
        .select(
            F.col("nid").alias("doc_id"),
            F.round(cosine(F.col("qe"), F.col("ce")), 6).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), "doc_id")
        .limit(RRF_LIST_K)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("sim").desc(), "doc_id"))
            .alias("rk_sem"),
        )
    )
    lexd = lex.withColumnRenamed("doc_id", "lex_doc")
    semd = sem.withColumnRenamed("doc_id", "sem_doc")
    fused = lexd.join(
        semd, lexd.lex_doc == semd.sem_doc, "full_outer"
    ).select(
        F.coalesce(F.col("lex_doc"), F.col("sem_doc")).alias("doc_id"),
        F.col("rk_lex").cast("long").alias("rk_lex"),
        F.col("rk_sem").cast("long").alias("rk_sem"),
        (
            F.coalesce(
                F.expr(f"{RRF_SCALE} div ({RRF_K} + rk_lex)"), F.lit(0)
            )
            + F.coalesce(
                F.expr(f"{RRF_SCALE} div ({RRF_K} + rk_sem)"), F.lit(0)
            )
        )
        .cast("long")
        .alias("rrf_fixed"),
    )
    return fused.orderBy(F.col("rrf_fixed").desc(), "doc_id").limit(RRF_OUT_K)


# ----------------------------------------------- PMI collocations

PMI_MIN_COUNT = 20
PMI_TOPK = 30


def _pmi_oracle() -> str:
    return f"""
    WITH t AS (SELECT {_TOKS} AS toks FROM documents),
    uni AS (
      SELECT unnest(toks) AS term FROM t
    ),
    ucnt AS (SELECT term, COUNT(*) AS c FROM uni GROUP BY term),
    utot AS (SELECT CAST(SUM(c) AS BIGINT) AS t_total FROM ucnt),
    bg AS (
      SELECT unnest(list_transform(range(1, len(toks)),
                                   i -> concat(toks[i], ' ', toks[i+1]))) AS bigram
      FROM t WHERE len(toks) >= 2
    ),
    bcnt AS (SELECT bigram, COUNT(*) AS c_xy FROM bg GROUP BY bigram
             HAVING COUNT(*) >= {PMI_MIN_COUNT}),
    btot AS (SELECT CAST(COUNT(*) AS BIGINT) AS b_total FROM bg)
    SELECT b.bigram,
           b.c_xy,
           CAST(ROUND(ln(
             (CAST(b.c_xy AS DOUBLE) * utot.t_total * utot.t_total)
             / (CAST(btot.b_total AS DOUBLE) * x.c * y.c)
           ) * 1000, 0) AS BIGINT) AS pmi_millinats
    FROM bcnt b
    JOIN ucnt x ON x.term = split_part(b.bigram, ' ', 1)
    JOIN ucnt y ON y.term = split_part(b.bigram, ' ', 2)
    CROSS JOIN utot CROSS JOIN btot
    ORDER BY pmi_millinats DESC, bigram
    LIMIT {PMI_TOPK}
    """


def pmi_relation(docs: DataFrame, min_count: int = 1) -> DataFrame:
    """(bigram, c_xy, pmi_millinats) over a documents relation — the
    shared body of ir_pmi_collocations, factored out so tests can run
    it over hand-computable in-memory corpora."""
    base = docs.select(tokens("text").alias("toks"))
    toks = F.col("toks")
    uni = base.select(F.explode(toks).alias("term"))
    ucnt = uni.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    utot = ucnt.agg(F.sum("c").alias("t_total"))
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = base.select(F.explode(bigrams).alias("bigram"))
    bcnt = (
        bg.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .filter(F.col("c_xy") >= min_count)
    )
    btot = bg.agg(F.count(F.lit(1)).alias("b_total"))
    x = ucnt.select(F.col("term").alias("term_x"), F.col("c").alias("c_x"))
    y = ucnt.select(F.col("term").alias("term_y"), F.col("c").alias("c_y"))
    return (
        bcnt.withColumn("term_x", F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)))
        .withColumn("term_y", F.split_part(F.col("bigram"), F.lit(" "), F.lit(2)))
        .join(x, "term_x")
        .join(y, "term_y")
        .crossJoin(F.broadcast(utot))
        .crossJoin(F.broadcast(btot))
        .select(
            "bigram",
            "c_xy",
            F.round(
                F.log(
                    (F.col("c_xy").cast("double") * F.col("t_total") * F.col("t_total"))
                    / (F.col("b_total").cast("double") * F.col("c_x") * F.col("c_y"))
                )
                * 1000,
                0,
            )
            .cast("bigint")
            .alias("pmi_millinats"),
        )
    )


@register(
    "ir_pmi_collocations",
    tags=("text", "agg", "topk", "search"),
    oracle=_pmi_oracle(),
)
def ir_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} bigram collocations by pointwise mutual information
    (min count {m}) — the statistical phrase detector: PMI(x,y) =
    ln(p(xy) / (p(x) p(y))), here computed as an exact integer ratio
    ln(c_xy * T^2 / (B * c_x * c_y)) quantized to millinats.

    Scale (100 TB): unigram and bigram counts are two partial-agg
    shuffles over array-generated streams (no joins in generation);
    the surviving >={m}-count bigram relation is small and its two
    unigram lookups join against the unigram count relation (AQE
    broadcasts it when small; shuffle-join otherwise). The scalar
    totals broadcast. Everything downstream of the count filter is
    tiny.
    """.format(k=PMI_TOPK, m=PMI_MIN_COUNT)
    docs = load_table(spark, sf_dir, "documents")
    return (
        pmi_relation(docs, min_count=PMI_MIN_COUNT)
        .orderBy(F.col("pmi_millinats").desc(), "bigram")
        .limit(PMI_TOPK)
    )


# ----------------------- NDCG@k evaluation of the BM25 ranking

NDCG_K = 10
# discount constants round(1e6 / log2(rank+1)) precomputed once in
# Python and embedded IDENTICALLY in both engines (the package's
# shared-constant discipline) — no per-row libm anywhere.
_NDCG_DISCOUNT = tuple(
    round(1_000_000 / math.log2(i + 1)) for i in range(1, NDCG_K + 1)
)


def _ndcg_oracle() -> str:
    terms = ", ".join(f"('{t}')" for t in BM25_QUERY_TERMS)
    disc = ", ".join(f"({i + 1}, {d})" for i, d in enumerate(_NDCG_DISCOUNT))
    return f"""
    WITH q(term) AS (VALUES {terms}),
    disc(rk, d) AS (VALUES {disc}),
    rel AS (
      SELECT doc_id, CAST(COUNT(DISTINCT term) AS BIGINT) AS rel
      FROM (SELECT doc_id, unnest({_TOKS}) AS term FROM documents) tok
      JOIN q USING (term) GROUP BY doc_id
    ),
    bm25 AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score_fixed DESC, doc_id)
                 AS rk
      FROM ({_bm25_oracle().replace("LIMIT " + str(BM25_TOPK),
                                     f"LIMIT {NDCG_K}")})
    ),
    dcg AS (
      SELECT CAST(SUM(rel.rel * disc.d) AS BIGINT) AS dcg_units
      FROM bm25 JOIN rel USING (doc_id) JOIN disc USING (rk)
    ),
    ideal AS (
      SELECT ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id) AS rk, rel
      FROM rel ORDER BY rel DESC, doc_id LIMIT {NDCG_K}
    ),
    idcg AS (
      SELECT CAST(SUM(ideal.rel * disc.d) AS BIGINT) AS idcg_units
      FROM ideal JOIN disc USING (rk)
    )
    SELECT CAST({NDCG_K} AS BIGINT) AS k,
           dcg.dcg_units,
           idcg.idcg_units,
           CAST(ROUND(1000.0 * dcg.dcg_units / idcg.idcg_units) AS BIGINT)
               AS ndcg_milli
    FROM dcg, idcg
    """


@register(
    "ir_ndcg_bm25_eval",
    tags=("text", "window", "stats"),
    oracle=_ndcg_oracle(),
)
def ir_ndcg_bm25_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@{k} of the BM25 top-{k} against graded term-coverage
    relevance (rel = distinct query terms present, 0..{nq}) — the
    retrieval-quality eval loop: DCG follows BM25's rank order, IDCG
    re-ranks the WHOLE corpus by relevance (so BM25 is penalized for
    every relevant doc it leaves outside the top {k}).

    Determinism lane: relevance grades and rank discounts are
    integers (discounts are {k} shared precomputed constants), so
    DCG/IDCG are exact BIGINT dot products; the single double is the
    final ratio rounded to milli.

    Scale (100 TB): relevance touches only docs containing a query
    term (semi-join on the 3-term broadcast); both rankings are
    top-{k} TakeOrdered/limit plans, never a global sort
    materialization; the {k}-row discount relation broadcasts.
    Reference parity: none; SURVEY.md section 2.B IR family.
    """.format(k=NDCG_K, nq=len(BM25_QUERY_TERMS))
    docs = load_table(spark, sf_dir, "documents")
    q = spark.createDataFrame(
        [(t,) for t in BM25_QUERY_TERMS], "term string"
    )
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    rel = (
        tok.join(F.broadcast(q), "term")
        .groupBy("doc_id")
        .agg(F.countDistinct("term").cast("bigint").alias("rel"))
    )
    disc = spark.createDataFrame(
        [(i + 1, d) for i, d in enumerate(_NDCG_DISCOUNT)], "rk long, d long"
    )
    top = (
        ir_bm25_topk(spark, sf_dir)
        .orderBy(F.col("score_fixed").desc(), "doc_id")
        .limit(NDCG_K)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("score_fixed").desc(), "doc_id"))
            .alias("rk"),
        )
    )
    dcg = (
        top.join(rel, "doc_id")
        .join(F.broadcast(disc), "rk")
        .agg(F.sum(F.col("rel") * F.col("d")).cast("bigint").alias("dcg_units"))
    )
    ideal = (
        rel.orderBy(F.col("rel").desc(), "doc_id")
        .limit(NDCG_K)
        .select(
            "rel",
            F.row_number()
            .over(Window.orderBy(F.col("rel").desc(), F.col("doc_id")))
            .alias("rk"),
        )
        .join(F.broadcast(disc), "rk")
        .agg(F.sum(F.col("rel") * F.col("d")).cast("bigint").alias("idcg_units"))
    )
    return (
        dcg.crossJoin(F.broadcast(ideal))
        .select(
            F.lit(NDCG_K).cast("bigint").alias("k"),
            "dcg_units",
            "idcg_units",
            F.round(1000.0 * F.col("dcg_units") / F.col("idcg_units"))
            .cast("bigint")
            .alias("ndcg_milli"),
        )
    )


# --------------------------- sparse tf-idf doc-doc cosine top-k

DOC_COS_DF_CAP = 64  # similarity subspace: informative terms only
DOC_COS_TOPK = 30


@register(
    "ir_doc_cosine_topk",
    tags=("ir", "similarity", "join", "topk"),
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    dfreq AS (
      SELECT term, COUNT(*) AS df FROM tf
      GROUP BY 1
      HAVING COUNT(*) <= GREATEST({DOC_COS_DF_CAP},
                                  (SELECT n_docs FROM n) // 8)
    ),
    w AS (
      SELECT doc_id, term,
             CAST(ROUND(tf * ln((n_docs + 1.0) / (df + 1.0)) * 1000000, 0)
                  AS BIGINT) AS w
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    ),
    norms AS (SELECT doc_id, CAST(SUM(w * w) AS BIGINT) AS n2
              FROM w GROUP BY 1),
    dots AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2,
             CAST(SUM(a.w * b.w) AS BIGINT) AS dot
      FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT d1, d2, dot,
           CAST(ROUND(1000.0 * dot / (sqrt(CAST(x.n2 AS DOUBLE))
                                      * sqrt(CAST(y.n2 AS DOUBLE))), 0)
                AS BIGINT) AS cos_milli
    FROM dots JOIN norms x ON d1 = x.doc_id JOIN norms y ON d2 = y.doc_id
    ORDER BY cos_milli DESC, d1, d2
    LIMIT {DOC_COS_TOPK}
    """,
)
def ir_doc_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} most similar document PAIRS by sparse TF-IDF cosine over
    the inverted index — the lexical doc-doc similarity complementing
    the dense embedding path (queries/similarity.py) and the set-based
    Jaccard/containment paths (queries/mining.py): weighted sparse
    vectors catch topical near-duplication that survives paraphrase.

    The similarity space is restricted to informative terms
    (df <= max({cap}, N/8) — the relative leg keeps the subspace
    non-degenerate on fixed-vocabulary corpora where every term's df
    grows with N; production corpora with open vocabularies tune the
    absolute leg) on BOTH the dot products and the norms — the
    standard stopword-pruned sparse all-pairs setup (Bayardo et al.,
    WWW'07 "Scaling Up All Pairs Similarity Search" prunes by exactly
    this high-df/low-weight mass): dropping ubiquitous terms bounds
    every posting list, and with them each term's pair fan-out, at
    {cap}^2.

    Determinism: weights are quantized to integer micro-units BEFORE
    any pairing, so dots and norms are exact bigint sums under any
    partitioning; the final cosine is one double expression both
    engines evaluate on identical integers (sqrt is IEEE
    correctly-rounded), rounded to milli-units; the top-k orders on
    the unique (cos_milli, d1, d2).

    Scale (100 TB): tf is the corpus's (doc, term) rollup (shared
    scoped-persist with text_tfidf_top_terms — one tokenize+agg pass
    feeds both queries); the pair join fans out only within df-capped
    posting lists (candidates ~ sum_t df_t^2 over RARE terms, never
    all-pairs — the same no-n^2 discipline the dedup family pins); the
    weight relation persists once and feeds norms and both join sides.
    """.format(k=DOC_COS_TOPK, cap=DOC_COS_DF_CAP)
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = scoped_persist(
        ("tfidf_tf", sf_dir),
        tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf")),
    )
    dfreq = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .where(
            F.col("df")
            <= F.greatest(F.lit(DOC_COS_DF_CAP), F.expr("n_docs div 8"))
        )
        .drop("n_docs")
    )
    w = scoped_persist(
        ("doccos_w", sf_dir),
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
                * F.lit(1_000_000.0),
                0,
            )
            .cast("long")
            .alias("w"),
        ),
    )
    norms = w.groupBy("doc_id").agg(F.sum(F.col("w") * F.col("w")).alias("n2"))
    a = w.select(F.col("doc_id").alias("d1"), "term", F.col("w").alias("w1"))
    b = w.select(F.col("doc_id").alias("d2"), "term", F.col("w").alias("w2"))
    dots = (
        a.join(b, "term")
        .where(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.sum(F.col("w1") * F.col("w2")).alias("dot"))
    )
    n1 = norms.select(F.col("doc_id").alias("d1"), F.col("n2").alias("n2_1"))
    n2r = norms.select(F.col("doc_id").alias("d2"), F.col("n2").alias("n2_2"))
    return (
        dots.join(n1, "d1")
        .join(n2r, "d2")
        .select(
            "d1",
            "d2",
            "dot",
            F.round(
                F.lit(1000.0)
                * F.col("dot")
                / (
                    F.sqrt(F.col("n2_1").cast("double"))
                    * F.sqrt(F.col("n2_2").cast("double"))
                ),
                0,
            )
            .cast("long")
            .alias("cos_milli"),
        )
        .orderBy(F.col("cos_milli").desc(), "d1", "d2")
        .limit(DOC_COS_TOPK)
    )


# ------------------------- stored-query matching (reverse search)

# Alert/routing rules: conjunctive keyword queries stored AS DATA and
# matched in bulk against every arriving document (the "percolator"
# direction — queries are the index, documents are the probes).
STORED_RULES: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("join-hash", ("join", "hash")),
    ("scan-filter", ("scan", "filter")),
    ("sort-merge-order", ("sort", "merge", "order")),
    ("window", ("window",)),
    ("column-batch", ("column", "batch")),
    ("slow-join-scan", ("slow", "join", "scan")),
)


def _rules_values_sql() -> str:
    rows = ", ".join(
        f"('{rid}', '{t}')" for rid, terms in STORED_RULES for t in terms
    )
    return f"rules(rule_id, term) AS (VALUES {rows})"


@register(
    "stored_query_matches",
    tags=("ir", "search", "join", "agg"),
    oracle=f"""
    WITH {_rules_values_sql()},
    rsz AS (SELECT rule_id, COUNT(*) AS n_terms FROM rules GROUP BY 1),
    tok AS (
      SELECT DISTINCT doc_id, term FROM (
        SELECT doc_id, unnest({_TOKS}) AS term FROM documents)
    ),
    hits AS (
      SELECT t.doc_id, r.rule_id
      FROM tok t JOIN rules r ON t.term = r.term
      JOIN rsz ON rsz.rule_id = r.rule_id
      GROUP BY t.doc_id, r.rule_id, rsz.n_terms
      HAVING COUNT(*) = rsz.n_terms
    )
    SELECT rsz.rule_id, COUNT(hits.doc_id) AS n_docs,
           CAST(COALESCE(SUM(hits.doc_id), 0) AS BIGINT) AS sum_doc_id
    FROM rsz LEFT JOIN hits ON rsz.rule_id = hits.rule_id
    GROUP BY 1
    """,
)
def stored_query_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reverse search (percolator): a catalog of stored conjunctive
    keyword rules is matched against the whole corpus in one pass —
    the alerting/routing primitive (Elasticsearch percolate queries,
    CEP rule engines) that inverts BM25's direction: here the QUERIES
    are data and every document is a probe. A rule matches when the
    document's distinct token set covers ALL the rule's terms.

    Census per rule: matched-document count + id checksum, zero rows
    kept (a silent rule is an alerting bug worth seeing).

    Scale (100 TB): the rule relation is broadcast-tiny (rules x
    terms); matching is ONE equi-join of the distinct (doc, term)
    stream against it — the token stream is filtered to rule terms AT
    THE JOIN, so virtually the whole corpus short-circuits; the
    AND-coverage check is a (doc, rule)-keyed partial count compared
    to the rule size. Adding rules never adds corpus passes — the
    standard stored-query fan-in, opposite of running each rule as
    its own scan.
    """
    docs = load_table(spark, sf_dir, "documents")
    rules = spark.createDataFrame(
        [
            (rid, t, len(terms))
            for rid, terms in STORED_RULES
            for t in terms
        ],
        "rule_id string, term string, n_terms int",
    )
    rule_ids = spark.createDataFrame(
        [(rid, len(terms)) for rid, terms in STORED_RULES],
        "rule_id string, n_terms int",
    )
    tok = (
        docs.select("doc_id", F.explode(tokens("text")).alias("term"))
        .distinct()
    )
    hits = (
        tok.join(F.broadcast(rules), "term")
        .groupBy("doc_id", "rule_id", "n_terms")
        .agg(F.count(F.lit(1)).alias("hit"))
        .where(F.col("hit") == F.col("n_terms"))
        .select("doc_id", "rule_id")
    )
    return (
        F.broadcast(rule_ids)
        .join(hits, "rule_id", "left")
        .groupBy("rule_id")
        .agg(
            F.count("doc_id").alias("n_docs"),
            F.coalesce(F.sum("doc_id"), F.lit(0)).cast("long").alias("sum_doc_id"),
        )
    )
