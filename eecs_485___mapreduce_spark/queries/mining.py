r"""Statistical / graph / similarity mining operators.

Families in this module (every one DuckDB-oracle-checked):

- **Closed-form statistics**: group-wise OLS regression (five exact
  moment sums), Pearson chi-square independence census, two-sample
  Kolmogorov-Smirnov drift detection, trailing-window z-score anomaly
  detection (3-sigma decision in exact integers).
- **Graph kernels**: degree-oriented triangle counting (hub-proof
  wedge join), HITS hubs/authorities in exact integer mass.
- **Similarity**: prefix-filtered EXACT Jaccard self-join — the
  zero-false-negative complement to the probabilistic MinHash-LSH
  path, over the SAME persisted shingle relation.
- **Text quality**: Dunning log-likelihood distinctive terms,
  per-document character entropy, bigram-LM surprisal.
- **Behavioral**: first-order Markov transition matrix, first/last-
  touch attribution, fixed-vocabulary pivot.
- **Data layout**: Morton Z-order locality key (the value audit for
  ``sinks.write_zorder_parquet``).

The reference has no analytics surface at all (SURVEY.md section 2.B);
these extend the engine's committed north-star families.

Cross-engine determinism follows the package discipline (SCALE.md):
every aggregate is an exact BIGINT sum of per-row integers; doubles
appear only in a FINAL fixed expression tree over those exact
integers, then are quantized (micro-/milli-units) — identical IEEE
inputs + identical operation tree = identical bits in Spark and
DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import md5_long_sql, scoped_persist, tokens
from ..registry import register
from ..sources import load_table, load_tables
from .dedup import _SHINGLES, _shingle_relation

_TOKS = r"list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '')"


# ----------------------------------------------- group-wise OLS regression


@register(
    "regr_qty_price_by_nation",
    tags=("agg", "stats", "join"),
    oracle="""
    WITH pts AS (
      SELECT s_nationkey AS nationkey,
             CAST(l_quantity AS BIGINT)                    AS x,
             CAST(ROUND(l_extendedprice) AS BIGINT)        AS y
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    ),
    m AS (
      SELECT nationkey,
             COUNT(*)                       AS n,
             CAST(SUM(x) AS BIGINT)         AS sx,
             CAST(SUM(y) AS BIGINT)         AS sy,
             CAST(SUM(x * y) AS BIGINT)     AS sxy,
             CAST(SUM(x * x) AS BIGINT)     AS sxx,
             CAST(SUM(y * y) AS BIGINT)     AS syy
      FROM pts GROUP BY nationkey
    )
    SELECT n_name,
           n,
           CASE WHEN n * sxx - sx * sx <> 0 THEN
             ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE), 6) END AS slope,
           CASE WHEN n * sxx - sx * sx <> 0 THEN
             ROUND((CAST(sy AS DOUBLE)
                    - (CAST(n * sxy - sx * sy AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
                   / CAST(n AS DOUBLE), 6) END               AS intercept,
           CASE WHEN n * sxx - sx * sx <> 0 AND n * syy - sy * sy <> 0 THEN
             ROUND(CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE)
                   / (CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)),
                   6) END                                    AS r2
    FROM m JOIN nation ON nationkey = n_nationkey
    ORDER BY n_name
    """,
)
def regr_qty_price_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form per-group OLS: price-vs-quantity slope, intercept,
    and r-squared per supplier nation, from the five exact moment sums
    (n, Sx, Sy, Sxy, Sxx, Syy).

    Determinism: x = quantity (integer), y = price rounded to whole
    units (ROUND of the same parquet double is identical in both
    engines), so all five sums are exact BIGINTs under any
    partitioning; slope/intercept/r2 are a fixed double expression
    tree over those integers, rounded at 1e-6.

    Scale (100 TB): one broadcast join (supplier dim) + one shuffle on
    nationkey with full map-side partial aggregation — the sums are
    algebraic, so this is exactly the q1 aggregate shape. Overflow
    headroom: Syy per group stays under 2^63 up to ~1e9 rows/group at
    these value ranges; past that, promote the moment sums to
    DECIMAL(38,0) (still exact, still partial-aggregatable).

    Reference parity: the reference's only aggregation is word-count
    sum (tests/testdata/exec/wc_reduce.py:25-33); this is the same
    partial-sum contract carried to second-order moments.
    """
    t = load_tables(spark, sf_dir, "lineitem", "supplier", "nation")
    li, sup, nat = t["lineitem"], t["supplier"], t["nation"]
    pts = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .select(
            F.col("s_nationkey").alias("nationkey"),
            F.col("l_quantity").cast("long").alias("x"),
            F.round(F.col("l_extendedprice"), 0).cast("long").alias("y"),
        )
    )
    m = pts.groupBy("nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den_x_i = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    den_y_i = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    den_x = den_x_i.cast("double")
    den_y = den_y_i.cast("double")
    # Zero-variance groups (single point, constant x or y) have no
    # defined slope/r2 — NULL, not a divide-by-zero (ANSI throws;
    # found by the edge star-schema harness).
    slope = F.when(den_x_i != 0, num / den_x)
    return (
        m.join(F.broadcast(nat), m.nationkey == nat.n_nationkey)
        .select(
            "n_name",
            "n",
            F.round(slope, 6).alias("slope"),
            F.round(
                (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
                / F.col("n").cast("double"),
                6,
            ).alias("intercept"),
            F.when(
                (den_x_i != 0) & (den_y_i != 0),
                F.round(num * num / (den_x * den_y), 6),
            ).alias("r2"),
        )
        .orderBy("n_name")
    )


# ------------------------------------------- triangle counting (graph)

TRIANGLE_TOPK = 10


def _order_pair_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order part pairs (u < v), one row per (order, pair), parts
    deduped WITHIN each order — the pre-aggregation stream behind both
    the distinct edge set (coorder_pairs) and the edge multiplicities
    (coorder_pair_counts).

    Built WITHOUT a self-join: one groupBy(l_orderkey) collects each
    order's part set and emits its C(lines,2) pairs array-side (lines
    per order <= 7 in TPC-H shape, so the fan-out is bounded).
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    parts_per_order = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    # all (ps[i], ps[j]) with i < j, array-side: flatten the per-order
    # combination triangle, then distinct across orders
    pair_arrays = parts_per_order.select(
        F.flatten(
            F.transform(
                F.slice(F.col("ps"), 1, F.size("ps") - 1),
                lambda x, i: F.transform(
                    F.slice(F.col("ps"), i + 2, F.size("ps")),
                    lambda y: F.struct(x.alias("u"), y.alias("v")),
                ),
            )
        ).alias("prs")
    )
    return pair_arrays.select(F.explode("prs").alias("p")).select(
        F.col("p.u").alias("u"), F.col("p.v").alias("v")
    )


def coorder_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct undirected edges (u < v) of the part co-order graph —
    parts are adjacent when some order contains both. Shared (and
    scope-persisted once) by the triangle kernel here, BFS, and the
    weighted-SSSP operator (queries/graph.py).

    Derived as a projection of the persisted edge-multiplicity
    relation, so the whole co-order family (edges, counts, weights)
    pays ONE aggregation over the per-order pair stream — not one
    distinct + one count over two separate scans."""
    pairs = coorder_pair_counts(spark, sf_dir).select("u", "v")
    return scoped_persist(("triangle_pairs", sf_dir), pairs)


def coorder_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge multiplicities of the co-order graph: (u, v, m) where m =
    number of distinct orders containing both parts — one count agg
    over the same per-order pair stream (scope-persisted for the
    consumers that also need the distinct edges)."""
    return scoped_persist(
        ("coorder_pair_counts", sf_dir),
        _order_pair_stream(spark, sf_dir)
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("m")),
    )


_EDGES_SQL = """
    pairs AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey < b.l_partkey
    ),
    deg AS (
      SELECT node, COUNT(*) AS d FROM (
        SELECT u AS node FROM pairs UNION ALL SELECT v AS node FROM pairs
      ) GROUP BY node
    ),
    -- orient every edge from lower-rank to higher-rank endpoint, where
    -- rank = (degree, node): bounds each node's out-list by O(sqrt(E))
    oriented AS (
      SELECT CASE WHEN (du.d, u) < (dv.d, v) THEN u ELSE v END AS lo,
             CASE WHEN (du.d, u) < (dv.d, v) THEN v ELSE u END AS hi
      FROM pairs
      JOIN deg du ON du.node = u
      JOIN deg dv ON dv.node = v
    )
"""


@register(
    "triangle_parts_coorder",
    tags=("graph", "join", "topk"),
    oracle=f"""
    WITH {_EDGES_SQL},
    tri AS (
      SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
      FROM oriented e1
      JOIN oriented e2 ON e2.lo = e1.hi
      JOIN oriented e3 ON e3.lo = e1.lo AND e3.hi = e2.hi
    ),
    per_node AS (
      SELECT node, COUNT(*) AS n_triangles FROM (
        SELECT a AS node FROM tri UNION ALL
        SELECT b AS node FROM tri UNION ALL
        SELECT c AS node FROM tri
      ) GROUP BY node
    )
    SELECT node AS partkey, n_triangles
    FROM per_node
    ORDER BY n_triangles DESC, partkey
    LIMIT {TRIANGLE_TOPK}
    """,
)
def triangle_parts_coorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle participation counts on the part co-order graph (parts
    are adjacent when some order contains both): top-{k} parts by the
    number of triangles they close.

    Scale (100 TB): the canonical distributed triangle kernel. Edges
    are oriented low->high by (degree, node) rank before the wedge
    join, so every node's out-neighborhood is O(sqrt(E)) — the wedge
    intermediate is sum(out_deg^2), not sum(deg^2), which is what
    makes the hub-node blowup disappear (a 1e6-degree hub contributes
    0 wedges as a source because all its edges point INTO it). Three
    equi-joins, all on integer keys, no cartesian anywhere.

    Physical shape: edges are generated WITHOUT a self-join — one
    groupBy(l_orderkey) collects each order's part set and emits its
    C(lines,2) pairs array-side (lines per order <= 7 in TPC-H shape,
    so the fan-out is bounded); the degree relation is |nodes| rows
    (the part dimension — orders of magnitude smaller than the edge
    relation) and is BROADCAST into the orientation step, so the only
    shuffles are the order groupBy, the edge distinct, and the two
    wedge-join exchanges. ``oriented`` is persisted once and read by
    all three join legs (otherwise Catalyst recomputes the whole
    upstream per leg — measured 2.3x slower at sf0.1).

    Reference parity: none (the reference has no join operator at
    all); this is the committed graph-family surface next to
    ``pagerank_customer_supplier`` (queries/graph.py).
    """.format(k=TRIANGLE_TOPK)
    pairs = coorder_pairs(spark, sf_dir)
    deg = (
        pairs.select(F.col("u").alias("node"))
        .unionAll(pairs.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.alias("du")
    dv = deg.alias("dv")
    lower_first = (F.col("du.d") < F.col("dv.d")) | (
        (F.col("du.d") == F.col("dv.d")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        pairs.join(F.broadcast(du), pairs.u == F.col("du.node"))
        .join(F.broadcast(dv), pairs.v == F.col("dv.node"))
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("lo"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("hi"),
        )
    )
    oriented = scoped_persist(("triangle_oriented", sf_dir), oriented)
    e1 = oriented.alias("e1")
    e2 = oriented.alias("e2")
    e3 = oriented.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.lo") == F.col("e1.hi"))
        .join(
            e3,
            (F.col("e3.lo") == F.col("e1.lo")) & (F.col("e3.hi") == F.col("e2.hi")),
        )
        .select(
            F.col("e1.lo").alias("a"),
            F.col("e1.hi").alias("b"),
            F.col("e2.hi").alias("c"),
        )
    )
    per_node = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        per_node.select(F.col("node").alias("partkey"), "n_triangles")
        .orderBy(F.col("n_triangles").desc(), "partkey")
        .limit(TRIANGLE_TOPK)
    )


# --------------------------- prefix-filtered exact Jaccard self-join

JACC_MILLI = 600  # threshold t = 0.6 on 3-word-shingle sets


@register(
    "dedup_prefix_filter_jaccard",
    tags=("dedup", "join", "text"),
    oracle=f"""
    WITH t AS (
      SELECT doc_id, s FROM (
        SELECT doc_id,
               list_filter({_SHINGLES}, x -> x IS NOT NULL AND x <> '') AS s
        FROM documents)
      WHERE len(s) > 0
    ),
    tok AS (SELECT doc_id, unnest(s) AS term FROM t),
    df AS (SELECT term, COUNT(*) AS df FROM tok GROUP BY term),
    pre AS (
      SELECT doc_id, term FROM (
        SELECT tok.doc_id, tok.term,
               ROW_NUMBER() OVER (PARTITION BY tok.doc_id
                                  ORDER BY df.df, tok.term) AS rn,
               COUNT(*) OVER (PARTITION BY tok.doc_id) AS sz
        FROM tok JOIN df ON tok.term = df.term)
      WHERE rn <= sz - (({JACC_MILLI} * sz + 999) // 1000) + 1
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      FROM pre a JOIN pre b ON a.term = b.term AND a.doc_id < b.doc_id
    ),
    scored AS (
      SELECT d1, d2,
             len(f1.s) AS n_tok1, len(f2.s) AS n_tok2,
             len(list_intersect(f1.s, f2.s)) AS n_common
      FROM cand JOIN t f1 ON d1 = f1.doc_id JOIN t f2 ON d2 = f2.doc_id
    )
    SELECT d1, d2, n_tok1, n_tok2, n_common,
           CAST(ROUND(1000.0 * n_common / (n_tok1 + n_tok2 - n_common))
                AS BIGINT) AS jacc_milli
    FROM scored
    WHERE 1000 * n_common >= {JACC_MILLI} * (n_tok1 + n_tok2 - n_common)
    ORDER BY jacc_milli DESC, d1, d2
    """,
)
def dedup_prefix_filter_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT near-duplicate pairs at 3-word-shingle-set Jaccard >=
    {t}/1000 via prefix filtering (PPJoin-style): the
    zero-false-negative complement to the probabilistic MinHash-LSH
    path (queries/dedup.py), over the SAME shared persisted shingle
    relation (cache amortized across the dedup family).

    Algorithm: order the shingle vocabulary rare-first by (df, term);
    a pair
    with Jaccard >= t MUST share a token among the first
    |s| - ceil(t*|s|) + 1 tokens of each side's ordering (pigeonhole),
    so candidates are generated by an equi-join on PREFIX tokens only,
    then verified with the exact intersection. The threshold compare
    is cross-multiplied in integers (1000*common >= t*(union)) — no
    float at the decision boundary.

    Scale (100 TB): candidates are proportional to prefix-token bucket
    occupancy, never all-pairs (the prefix holds the RAREST tokens, so
    buckets are the smallest ones); the vocabulary ranking is a sort
    of the (term, df) relation — orders of magnitude smaller than the
    corpus — and is broadcast back as a join. The verify join carries
    only candidate pairs. Same no-n^2 discipline the plan tests pin
    for the LSH family (tests/test_plans.py).

    Reference parity: none (reference has no similarity surface);
    committed dedup-family row, SURVEY.md section 2.B.
    """.format(t=JACC_MILLI)
    # Token-less documents shingle to the degenerate ['']/[NULL] set
    # (and do so DIFFERENTLY across engines — DuckDB array_to_string of
    # an empty list is NULL, Spark array_join is ''): they are exact-
    # duplicate territory (dedup_exact), not near-dup material, so both
    # sides drop them before pairing.
    t = (
        _shingle_relation(spark, sf_dir)
        .select("doc_id", F.filter(F.col("sh"), lambda x: x != F.lit("")).alias("s"))
        .where(F.size("s") > 0)
    )
    tok = t.select("doc_id", F.explode("s").alias("term"))
    df = tok.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # Rare-first prefix order is (df, term) DIRECTLY in the per-doc
    # window — materializing a global vocabulary ROW_NUMBER would be a
    # single-partition sort of the whole vocab for a rank that is
    # strictly monotone in (df, term) anyway.
    w_doc = Window.partitionBy("doc_id")
    pre = (
        tok.join(df, "term")
        .select(
            "doc_id",
            "term",
            F.row_number().over(w_doc.orderBy("df", "term")).alias("rn"),
            F.count(F.lit(1)).over(w_doc).alias("sz"),
        )
        .where(
            F.col("rn")
            <= F.col("sz")
            - F.expr(f"({JACC_MILLI} * sz + 999) div 1000")
            + F.lit(1)
        )
        .select("doc_id", "term")
    )
    a = pre.alias("a")
    b = pre.alias("b")
    cand = (
        a.join(b, (F.col("a.term") == F.col("b.term")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )
    f1 = t.select(F.col("doc_id").alias("d1"), F.col("s").alias("s1"))
    f2 = t.select(F.col("doc_id").alias("d2"), F.col("s").alias("s2"))
    scored = (
        cand.join(f1, "d1")
        .join(f2, "d2")
        .select(
            "d1",
            "d2",
            F.size("s1").alias("n_tok1"),
            F.size("s2").alias("n_tok2"),
            F.size(F.array_intersect("s1", "s2")).alias("n_common"),
        )
    )
    union_sz = F.col("n_tok1") + F.col("n_tok2") - F.col("n_common")
    return (
        scored.where(F.lit(1000) * F.col("n_common") >= F.lit(JACC_MILLI) * union_sz)
        .select(
            "d1",
            "d2",
            "n_tok1",
            "n_tok2",
            "n_common",
            F.round(F.lit(1000.0) * F.col("n_common") / union_sz, 0)
            .cast("long")
            .alias("jacc_milli"),
        )
        .orderBy(F.col("jacc_milli").desc(), "d1", "d2")
    )


# ------------------------- distinctive terms per source (Dunning LLR)

LLR_TOPK = 5


@register(
    "text_distinctive_terms_llr",
    tags=("text", "agg", "topk", "stats"),
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest({_TOKS}) AS term FROM documents
    ),
    st AS (SELECT source, term, COUNT(*) AS k11 FROM tok GROUP BY source, term),
    src AS (SELECT source, COUNT(*) AS ts FROM tok GROUP BY source),
    trm AS (SELECT term, COUNT(*) AS tt FROM tok GROUP BY term),
    g AS (SELECT COUNT(*) AS n FROM tok),
    cells AS (
      SELECT st.source, st.term,
             CAST(st.k11 AS BIGINT)            AS k11,
             CAST(trm.tt - st.k11 AS BIGINT)   AS k12,
             CAST(src.ts - st.k11 AS BIGINT)   AS k21,
             CAST(g.n - trm.tt - src.ts + st.k11 AS BIGINT) AS k22,
             CAST(src.ts AS BIGINT) AS r1, CAST(g.n - src.ts AS BIGINT) AS r2,
             CAST(trm.tt AS BIGINT) AS c1, CAST(g.n - trm.tt AS BIGINT) AS c2,
             CAST(g.n AS BIGINT) AS n
      FROM st JOIN src ON st.source = src.source
              JOIN trm ON st.term = trm.term
              CROSS JOIN g
    ),
    scored AS (
      SELECT source, term, k11,
        CAST(ROUND(2000000.0 * (
          (CASE WHEN k11 > 0 THEN k11 * ln(CAST(k11 AS DOUBLE) * n / (r1 * c1)) ELSE 0.0 END)
        + (CASE WHEN k12 > 0 THEN k12 * ln(CAST(k12 AS DOUBLE) * n / (r2 * c1)) ELSE 0.0 END)
        + (CASE WHEN k21 > 0 THEN k21 * ln(CAST(k21 AS DOUBLE) * n / (r1 * c2)) ELSE 0.0 END)
        + (CASE WHEN k22 > 0 THEN k22 * ln(CAST(k22 AS DOUBLE) * n / (r2 * c2)) ELSE 0.0 END)
        )) AS BIGINT) AS llr_micro
      FROM cells
      WHERE CAST(k11 AS DOUBLE) * n > CAST(r1 AS DOUBLE) * c1
    )
    SELECT source, term, k11 AS n_in_source, llr_micro FROM (
      SELECT source, term, k11, llr_micro,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY llr_micro DESC, term) AS rn
      FROM scored)
    WHERE rn <= {LLR_TOPK}
    ORDER BY source, llr_micro DESC, term
    """,
)
def text_distinctive_terms_llr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} statistically distinctive terms per source by Dunning
    log-likelihood ratio (the standard corpus-linguistics keyword
    statistic): LLR = 2 * sum over the 2x2 contingency cells of
    k * ln(k*N / (rowsum*colsum)), restricted to terms OVER-represented
    in the source (observed > expected).

    Determinism: every contingency cell is an exact BIGINT count; the
    LLR is one fixed double expression tree over those integers,
    quantized to integer micro-units BEFORE ranking, so both engines
    rank identically (package discipline, see module docstring).

    Scale (100 TB): two shuffles — (source, term) counts with map-side
    partial agg, then the term-total join; source totals and the grand
    total are tiny (n_sources rows / 1 row) and broadcast. Top-k per
    source is WindowGroupLimit (rank pushed down, no full sort of the
    scored relation). The (source x term) matrix is the only large
    intermediate and it is sparse — bounded by the token relation
    itself.

    Reference parity: none — reference's only text statistic is
    word-count (SURVEY.md section 2.A row 11); this is the committed
    text-analysis family, section 2.B.
    """.format(k=LLR_TOPK)
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(tokens("text")).alias("term"))
    tok = scoped_persist(("llr_tokens", sf_dir), tok)
    st = tok.groupBy("source", "term").agg(F.count(F.lit(1)).alias("k11"))
    src = tok.groupBy("source").agg(F.count(F.lit(1)).alias("ts"))
    trm = tok.groupBy("term").agg(F.count(F.lit(1)).alias("tt"))
    g = tok.agg(F.count(F.lit(1)).alias("n"))
    cells = (
        st.join(F.broadcast(src), "source")
        .join(trm, "term")
        .crossJoin(F.broadcast(g))
        .select(
            "source",
            "term",
            F.col("k11").cast("long").alias("k11"),
            (F.col("tt") - F.col("k11")).cast("long").alias("k12"),
            (F.col("ts") - F.col("k11")).cast("long").alias("k21"),
            (F.col("n") - F.col("tt") - F.col("ts") + F.col("k11"))
            .cast("long")
            .alias("k22"),
            F.col("ts").cast("long").alias("r1"),
            (F.col("n") - F.col("ts")).cast("long").alias("r2"),
            F.col("tt").cast("long").alias("c1"),
            (F.col("n") - F.col("tt")).cast("long").alias("c2"),
            F.col("n").cast("long").alias("n"),
        )
    )

    def _cell(k: str, r: str, c: str):
        kd = F.col(k).cast("double")
        return F.when(
            F.col(k) > 0,
            kd * F.log(kd * F.col("n") / (F.col(r) * F.col(c))),
        ).otherwise(F.lit(0.0))

    scored = (
        cells.where(
            F.col("k11").cast("double") * F.col("n")
            > F.col("r1").cast("double") * F.col("c1")
        )
        .select(
            "source",
            "term",
            "k11",
            F.round(
                F.lit(2000000.0)
                * (
                    _cell("k11", "r1", "c1")
                    + _cell("k12", "r2", "c1")
                    + _cell("k21", "r1", "c2")
                    + _cell("k22", "r2", "c2")
                ),
                0,
            )
            .cast("long")
            .alias("llr_micro"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.col("llr_micro").desc(), "term")
    return (
        scored.select(
            "source", "term", "k11", "llr_micro", F.row_number().over(w).alias("rn")
        )
        .where(F.col("rn") <= LLR_TOPK)
        .select(
            "source",
            "term",
            F.col("k11").alias("n_in_source"),
            "llr_micro",
        )
        .orderBy("source", F.col("llr_micro").desc(), "term")
    )


# ------------------------------------- per-document character entropy


@register(
    "text_char_entropy",
    tags=("text", "agg", "stats"),
    oracle="""
    WITH ch AS (
      SELECT doc_id, substr(text, CAST(i AS INT), 1) AS c
      FROM documents, UNNEST(range(1, length(text) + 1)) AS u(i)
      WHERE length(text) > 0
    ),
    cc AS (SELECT doc_id, c, COUNT(*) AS k FROM ch GROUP BY doc_id, c),
    s AS (
      SELECT doc_id,
             CAST(SUM(k) AS BIGINT) AS n,
             COUNT(*) AS n_distinct,
             CAST(SUM(CAST(ROUND(1000000.0 * k * ln(CAST(k AS DOUBLE)))
                           AS BIGINT)) AS BIGINT) AS s_micro
      FROM cc GROUP BY doc_id
    )
    SELECT doc_id, n, n_distinct,
           CAST(ROUND(1000.0 * (ln(CAST(n AS DOUBLE))
                                - (CAST(s_micro AS DOUBLE) / 1000000.0)
                                  / CAST(n AS DOUBLE))) AS BIGINT)
             AS ent_milli
    FROM s
    ORDER BY doc_id
    """,
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon character entropy per document (nats, milli-units):
    H = ln(n) - (1/n) * sum_c k_c ln k_c — the classic gibberish /
    boilerplate / encoding-damage quality signal (low entropy =
    repeated characters, high = random bytes). Empty documents are
    excluded (entropy undefined on zero symbols).

    Determinism: character counts are exact; each k*ln(k) term is
    quantized to integer micro-units BEFORE the per-document sum
    (bigint addition is order-free under any partitioning), and the
    final combination is one fixed double expression.

    Scale (100 TB): explode-to-characters is the only fan-out (bounded
    by corpus byte size — the same cost as reading it); one shuffle on
    (doc_id, char) with map-side partial agg, then a doc_id-local
    fold. No Python in the data path. At full scale the char explode
    would fuse into the scan stage (narrow), so this is scan + one
    shuffle.

    Reference parity: none; committed text-analysis family
    (SURVEY.md section 2.B, quality-scoring row).
    """
    docs = load_table(spark, sf_dir, "documents").where(F.length("text") > 0)
    ch = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.length("text"))).alias("i"),
        "text",
    ).select("doc_id", F.expr("substring(text, i, 1)").alias("c"))
    cc = ch.groupBy("doc_id", "c").agg(F.count(F.lit(1)).alias("k"))
    kd = F.col("k").cast("double")
    s = cc.groupBy("doc_id").agg(
        F.sum("k").alias("n"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.round(F.lit(1000000.0) * kd * F.log(kd), 0).cast("long")).alias(
            "s_micro"
        ),
    )
    return s.select(
        "doc_id",
        "n",
        "n_distinct",
        F.round(
            F.lit(1000.0)
            * (
                F.log(F.col("n").cast("double"))
                - (F.col("s_micro").cast("double") / F.lit(1000000.0))
                / F.col("n").cast("double")
            ),
            0,
        )
        .cast("long")
        .alias("ent_milli"),
    ).orderBy("doc_id")


# -------------------------- Markov transition matrix over event types


@register(
    "events_markov_transitions",
    tags=("window", "agg", "timeseries"),
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    trans AS (
      SELECT prev_type AS from_type, event_type AS to_type,
             COUNT(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    ),
    tot AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS row_total
            FROM trans GROUP BY from_type)
    SELECT trans.from_type, to_type, n,
           CAST(ROUND(100000.0 * n / row_total) AS BIGINT) AS p_micro100
    FROM trans JOIN tot ON trans.from_type = tot.from_type
    ORDER BY trans.from_type, to_type
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event-type
    sequences: counts and row-normalized probabilities (1e-5 units)
    for every (from_type, to_type) edge — the behavioral-model /
    funnel-diagnostics primitive.

    Determinism: sequence order is (ts, event_id) — event_id is the
    unique tiebreak, so lag() is identical in both engines; counts are
    exact and the probability is one rounded division of two BIGINTs.

    Scale (100 TB): ONE shuffle on user_id (the lag window), then a
    partial-agg shuffle on the (from, to) pair whose cardinality is
    |event_types|^2 — tiny. Row totals join on |event_types| rows,
    broadcast. The user window never materializes more than a
    partition sort — no per-user state beyond the sort.

    Reference parity: none; committed time-series family
    (SURVEY.md section 2.B).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    trans = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = trans.groupBy("from_type").agg(F.sum("n").alias("row_total"))
    return (
        trans.join(F.broadcast(tot), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.round(
                F.lit(100000.0) * F.col("n") / F.col("row_total"), 0
            )
            .cast("long")
            .alias("p_micro100"),
        )
        .orderBy("from_type", "to_type")
    )


# ----------------------- HITS hubs & authorities (integer-exact)

HITS_TOPK = 15


@register(
    "hits_customer_part",
    tags=("graph", "agg", "topk"),
    oracle=f"""
    WITH edges AS (
      SELECT DISTINCT o_custkey AS cust, l_partkey AS part
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    -- h0 = 1 for every customer; two unrolled HITS iterations in
    -- exact integer arithmetic (no normalization inside the loop:
    -- ranking is scale-invariant)
    a1 AS (SELECT part, COUNT(*) AS a FROM edges GROUP BY part),
    h1 AS (SELECT cust, CAST(SUM(a1.a) AS BIGINT) AS h
           FROM edges JOIN a1 ON edges.part = a1.part GROUP BY cust),
    a2 AS (SELECT part, CAST(SUM(h1.h) AS BIGINT) AS a
           FROM edges JOIN h1 ON edges.cust = h1.cust GROUP BY part)
    SELECT part AS partkey, a AS authority_score,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM edges e WHERE e.part = a2.part)
             AS in_degree
    FROM a2
    ORDER BY authority_score DESC, partkey
    LIMIT {HITS_TOPK}
    """,
)
def hits_customer_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs-and-authorities on the customer->part purchase
    bipartite graph, two unrolled iterations in EXACT integer
    arithmetic (h0 = 1): top-{k} authority parts with their raw
    integer authority mass and in-degree. Unlike degree ranking, the
    score weights each purchase by how prolific the buying customer
    is — the classic "authority = endorsed by good hubs" signal.

    Determinism: no normalization inside the loop (HITS ranking is
    scale-invariant), so every score is an exact BIGINT sum —
    order-free under any partitioning, no float anywhere. Overflow
    headroom: a2 <= E * max_deg^2; at 1e12 edges and 1e4 max degree
    promote to DECIMAL(38,0) or rescale between iterations.

    Scale (100 TB): each half-iteration is one equi-join of the edge
    relation against a node-score relation orders of magnitude
    smaller, followed by a partial-agg shuffle — the PageRank shape
    (queries/graph.py) with the same persisted-edges discipline; the
    edge relation is persisted once and reused by all three passes.
    AQE broadcasts the score side when it fits, which is the
    billion-edge-safe default.

    Reference parity: none; committed graph family
    (SURVEY.md section 2.B).
    """.format(k=HITS_TOPK)
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    edges = (
        t["orders"]
        .join(t["lineitem"], t["orders"].o_orderkey == t["lineitem"].l_orderkey)
        .select(F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part"))
        .distinct()
    )
    edges = scoped_persist(("hits_edges", sf_dir), edges)
    a1 = edges.groupBy("part").agg(F.count(F.lit(1)).alias("a"))
    h1 = (
        edges.join(a1, "part")
        .groupBy("cust")
        .agg(F.sum("a").alias("h"))
    )
    a2 = (
        edges.join(h1, "cust")
        .groupBy("part")
        .agg(F.sum("h").alias("a"))
    )
    indeg = edges.groupBy("part").agg(F.count(F.lit(1)).alias("in_degree"))
    return (
        a2.join(indeg, "part")
        .select(
            F.col("part").alias("partkey"),
            F.col("a").alias("authority_score"),
            "in_degree",
        )
        .orderBy(F.col("authority_score").desc(), "partkey")
        .limit(HITS_TOPK)
    )


# ----------------------- bigram-LM surprisal (cross-entropy quality)

_BIGRAMS = (
    f"CASE WHEN len({_TOKS}) >= 2 THEN "
    f"list_transform(range(1, len({_TOKS})), "
    f"i -> concat({_TOKS}[i], ' ', {_TOKS}[i+1])) "
    f"ELSE [] END"
)


@register(
    "text_bigram_surprisal",
    tags=("text", "pipeline", "stats"),
    oracle=f"""
    WITH bg AS (SELECT doc_id, unnest({_BIGRAMS}) AS bigram FROM documents),
    bcnt AS (SELECT bigram, COUNT(*) AS bc FROM bg GROUP BY bigram),
    ctx AS (
      SELECT split_part(bigram, ' ', 1) AS w1, CAST(SUM(bc) AS BIGINT) AS cc
      FROM bcnt GROUP BY 1
    ),
    scored AS (
      SELECT doc_id,
             CAST(ROUND(1000 * ln(CAST(cc AS DOUBLE) / bc)) AS BIGINT) AS s
      FROM bg
      JOIN bcnt USING (bigram)
      JOIN ctx ON split_part(bigram, ' ', 1) = ctx.w1
    )
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(s) AS BIGINT) AS sum_surprisal_mnat,
           ROUND(CAST(SUM(s) AS DOUBLE) / COUNT(*), 3) AS mean_surprisal_mnat
    FROM scored GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def text_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean bigram surprisal under the corpus bigram LM
    (-ln P(w2|w1), MLE): the second-order companion to
    ``text_unigram_logprob`` — repeated boilerplate scores near zero
    even when its unigrams are rare, so the two signals together
    separate "rare words" from "rare sequences" (the CCNet/Gopher
    quality-filter pair). Documents with fewer than 2 tokens have no
    bigrams and are excluded.

    Determinism: P(w2|w1) = c(w1 w2) / c(w1 ·) — both counts exact
    BIGINTs (the context count is the SUM of bigram counts sharing the
    left token, not the raw unigram count, so the last token of each
    document never skews the denominator); per-instance surprisal is
    quantized to integer millinats BEFORE the per-doc sum.

    Scale (100 TB): bigram relation exploded once (array-side, in
    codegen) and persisted for its two consumers; bigram counts are
    one partial+final agg on the bigram key; context counts REUSE the
    bigram-count relation (vocab-sized, not corpus-sized input); the
    per-doc rollup is one shuffle on doc_id.

    Reference parity: word count is the reference's only text stat
    (SURVEY.md section 2.A row 11); committed text-analysis family.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens("text").alias("tok")).where(
        F.size("tok") >= 2
    )
    bg = scoped_persist(
        ("bigram_surprisal.bg", sf_dir),
        toks.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("tok") - 1),
                    lambda i: F.concat_ws(
                        " ", F.element_at("tok", i), F.element_at("tok", i + 1)
                    ),
                )
            ).alias("bigram"),
        ),
    )
    bcnt = scoped_persist(
        ("bigram_surprisal.bcnt", sf_dir),
        bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("bc")),
    )
    ctx = bcnt.groupBy(
        F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)).alias("w1")
    ).agg(F.sum("bc").alias("cc"))
    scored = (
        bg.join(bcnt, "bigram")
        .join(
            ctx,
            F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)) == F.col("w1"),
        )
        .select(
            "doc_id",
            F.round(
                F.lit(1000.0)
                * F.log(F.col("cc").cast("double") / F.col("bc")),
                0,
            )
            .cast("long")
            .alias("s"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("s").alias("sum_surprisal_mnat"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "sum_surprisal_mnat",
            F.round(
                F.col("sum_surprisal_mnat").cast("double") / F.col("n_bigrams"), 3
            ).alias("mean_surprisal_mnat"),
        )
        .orderBy("doc_id")
    )


# ------------------- trailing-window z-score anomaly detection

ANOMALY_WINDOW = 24  # trailing observed hours in the baseline
ANOMALY_MIN_BASELINE = 12
ANOMALY_Z2_NUM = 9  # flag |z| >= 3, compared as (n*x-S)^2 >= 9*(n*Q-S^2)


@register(
    "events_hourly_anomalies",
    tags=("window", "timeseries", "stats"),
    oracle=f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour_ts,
             COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    framed AS (
      SELECT event_type, hour_ts, CAST(cnt AS BIGINT) AS cnt,
             COUNT(*) OVER w AS n,
             CAST(SUM(cnt) OVER w AS BIGINT) AS s,
             CAST(SUM(cnt * cnt) OVER w AS BIGINT) AS q
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_ts
                   ROWS BETWEEN {ANOMALY_WINDOW} PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, hour_ts, cnt, n AS n_baseline,
           CAST(ROUND(1000.0 * (n * cnt - s)
                      / sqrt(CAST(n AS DOUBLE) * q - CAST(s AS DOUBLE) * s))
                AS BIGINT) AS z_milli
    FROM framed
    WHERE n >= {ANOMALY_MIN_BASELINE}
      AND n * q - s * s > 0
      AND (n * cnt - s) * (n * cnt - s) >= {ANOMALY_Z2_NUM} * (n * q - s * s)
    ORDER BY event_type, hour_ts
    """,
)
def events_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event-count anomalies per event type: hours whose count
    deviates >= 3 sigma from the trailing {w}-observed-hour baseline
    (current hour excluded from its own baseline). The monitoring /
    data-quality primitive over the event stream.

    Determinism: the >= 3-sigma DECISION is exact integer arithmetic —
    (n*x - S)^2 >= 9*(n*Q - S^2) over BIGINT frame sums (no sqrt, no
    float at the boundary); the reported z_milli is one fixed double
    tree over the same integers. Frames are ROWS-based over observed
    hours with a minimum baseline of {m}, so missing hours never
    create NULL-arithmetic drift between engines.

    Scale (100 TB): pre-aggregate to (type, hour) FIRST — the window
    runs over the rollup (|types| x |hours| rows, ~5 orders of
    magnitude smaller than the event stream), one shuffle for the
    rollup + one for the per-type window sort. O(window) running
    state per row, never a self-join against the trailing range.

    Reference parity: none; committed time-series family
    (SURVEY.md section 2.B).
    """.format(w=ANOMALY_WINDOW, m=ANOMALY_MIN_BASELINE)
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour_ts")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(-ANOMALY_WINDOW, -1)
    )
    framed = hourly.select(
        "event_type",
        "hour_ts",
        F.col("cnt").cast("long").alias("cnt"),
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("cnt").over(w).cast("long").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).over(w).cast("long").alias("q"),
    )
    dev = F.col("n") * F.col("cnt") - F.col("s")
    var_num = F.col("n") * F.col("q") - F.col("s") * F.col("s")
    return (
        framed.where(
            (F.col("n") >= ANOMALY_MIN_BASELINE)
            & (var_num > 0)
            & (dev * dev >= F.lit(ANOMALY_Z2_NUM) * var_num)
        )
        .select(
            "event_type",
            "hour_ts",
            "cnt",
            F.col("n").alias("n_baseline"),
            F.round(
                F.lit(1000.0)
                * dev.cast("double")
                / F.sqrt(
                    F.col("n").cast("double") * F.col("q")
                    - F.col("s").cast("double") * F.col("s")
                ),
                0,
            )
            .cast("long")
            .alias("z_milli"),
        )
        .orderBy("event_type", "hour_ts")
    )


# ---------------------------------------- Z-order locality key audit

ZORDER_TOPK = 40


def _zorder_oracle() -> str:
    from ..functions import zorder_key_sql

    zexpr = zorder_key_sql("an", "bn")
    return f"""
    WITH bounds AS (
      SELECT MIN(o_custkey) AS amin, MAX(o_custkey) AS amax,
             MIN(date_diff('day', DATE '1992-01-01',
                           CAST(o_orderdate AS DATE))) AS bmin,
             MAX(date_diff('day', DATE '1992-01-01',
                           CAST(o_orderdate AS DATE))) AS bmax
      FROM orders
    ),
    norm AS (
      SELECT o_orderkey,
             CAST(FLOOR((CAST(o_custkey - amin AS BIGINT) * 65535)
                        / CAST(amax - amin AS DOUBLE)) AS BIGINT) AS an,
             CAST(FLOOR((CAST(date_diff('day', DATE '1992-01-01',
                                        CAST(o_orderdate AS DATE)) - bmin
                              AS BIGINT) * 65535)
                        / CAST(bmax - bmin AS DOUBLE)) AS BIGINT) AS bn
      FROM orders CROSS JOIN bounds
    )
    SELECT o_orderkey, an AS cust_grid, bn AS day_grid,
           CAST({zexpr} AS BIGINT) AS z_value
    FROM norm
    ORDER BY z_value, o_orderkey
    LIMIT {ZORDER_TOPK}
    """


@register(
    "zorder_orders_locality",
    tags=("layout", "math"),
    oracle=_zorder_oracle(),
)
def zorder_orders_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) clustering key over (o_custkey, order-day):
    the first {k} orders in Z-sequence with their 16-bit grid
    coordinates — the value audit for the ``write_zorder_parquet``
    layout sink (sinks.py), whose per-file TWO-column bounding boxes
    are asserted separately in tests/test_sources_sinks.py.

    Determinism: grid normalization is floor((x-min)*65535/span) —
    numerator bounded far under 2^53, so the double division floors
    identically in both engines; the interleave itself is pure integer
    shift/mask arithmetic with an identical generated expression tree
    on both sides (``functions.zorder_key`` / ``zorder_key_sql``).

    Scale (100 TB): one scalar min/max agg (broadcast back as a
    1-row relation), then the key is a per-row codegen expression —
    no shuffle at all in this audit form; the layout sink adds the
    range exchange that buys two-column row-group pruning for every
    later scan.

    Reference parity: none; data-layout family next to the
    sort-clustered and bucketed writers (SURVEY.md section 2.B
    sinks row).
    """.format(k=ZORDER_TOPK)
    from ..functions import zorder_key, zorder_norm

    orders = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date"))
    bounds = orders.agg(
        F.min("o_custkey").alias("amin"),
        F.max("o_custkey").alias("amax"),
        F.min(day).alias("bmin"),
        F.max(day).alias("bmax"),
    )
    norm = orders.crossJoin(F.broadcast(bounds)).select(
        "o_orderkey",
        zorder_norm(F.col("o_custkey"), F.col("amin"), F.col("amax")).alias("an"),
        zorder_norm(day, F.col("bmin"), F.col("bmax")).alias("bn"),
    )
    return (
        norm.select(
            "o_orderkey",
            F.col("an").alias("cust_grid"),
            F.col("bn").alias("day_grid"),
            zorder_key(F.col("an"), F.col("bn")).cast("long").alias("z_value"),
        )
        .orderBy("z_value", "o_orderkey")
        .limit(ZORDER_TOPK)
    )


# ---------------- Kolmogorov-Smirnov drift detection (per source)


@register(
    "ks_doclen_by_source",
    tags=("stats", "agg", "window"),
    oracle="""
    WITH c AS (
      SELECT source, n_chars, COUNT(*) AS cnt
      FROM documents GROUP BY source, n_chars
    ),
    srcs AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS n_src FROM c GROUP BY source),
    vals AS (SELECT DISTINCT n_chars FROM c),
    g AS (
      SELECT n_chars,
             CAST(SUM(SUM(cnt)) OVER (ORDER BY n_chars) AS BIGINT) AS cum_all
      FROM c GROUP BY n_chars
    ),
    grid AS (
      SELECT s.source, v.n_chars, s.n_src,
             CAST(SUM(COALESCE(c.cnt, 0)) OVER (PARTITION BY s.source
                                                ORDER BY v.n_chars) AS BIGINT)
               AS cum_src
      FROM srcs s
      CROSS JOIN vals v
      LEFT JOIN c ON c.source = s.source AND c.n_chars = v.n_chars
    ),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_all FROM c),
    dev AS (
      SELECT grid.source, grid.n_src,
             tot.n_all - grid.n_src AS n_rest,
             ABS(grid.cum_src * (tot.n_all - grid.n_src)
                 - (g.cum_all - grid.cum_src) * grid.n_src) AS d_num
      FROM grid
      JOIN g ON grid.n_chars = g.n_chars
      CROSS JOIN tot
    )
    SELECT source,
           CAST(n_src AS BIGINT) AS n_src,
           CAST(n_rest AS BIGINT) AS n_rest,
           CAST(MAX(d_num) AS BIGINT) AS d_num,
           CAST(ROUND(1000.0 * MAX(d_num) / (n_src * n_rest)) AS BIGINT)
             AS d_milli
    FROM dev
    GROUP BY source, n_src, n_rest
    ORDER BY d_milli DESC, source
    """,
)
def ks_doclen_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic per source: the max
    CDF deviation between each source's document-length distribution
    and the rest of the corpus — the standard distribution-drift /
    contamination detector run between pipeline snapshots or data
    mixtures.

    Determinism: D = max_x |F_src(x) - F_rest(x)| is evaluated with
    the division CLEARED: d_num = max |cum_src*n_rest - cum_rest*n_src|
    — every term an exact BIGINT (counts and cumulative counts), so
    the max and the ranking are pure integer arithmetic; only the
    reported d_milli divides (one rounded double op over exact ints).

    Scale (100 TB): the corpus collapses FIRST to (source, length)
    counts — output-bounded, |sources| x |distinct lengths| — and all
    window cumsums run over that tiny grid, never the corpus. One
    corpus-sized shuffle (the groupBy), everything after is
    dimension-table work. The grid cross join is |sources| x |lengths|
    and both sides are broadcast-scale.

    Reference parity: none; committed stats family
    (SURVEY.md section 2.B).
    """
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("source", "n_chars").agg(F.count(F.lit(1)).alias("cnt"))
    c = scoped_persist(("ks_counts", sf_dir), c)
    srcs = c.groupBy("source").agg(F.sum("cnt").alias("n_src"))
    vals = c.select("n_chars").distinct()
    g = (
        c.groupBy("n_chars")
        .agg(F.sum("cnt").alias("v"))
        .select(
            "n_chars",
            F.sum("v").over(Window.orderBy("n_chars")).alias("cum_all"),
        )
    )
    grid = (
        F.broadcast(srcs)
        .crossJoin(F.broadcast(vals))
        .join(c, ["source", "n_chars"], "left")
        .select(
            "source",
            "n_chars",
            "n_src",
            F.sum(F.coalesce(F.col("cnt"), F.lit(0)))
            .over(Window.partitionBy("source").orderBy("n_chars"))
            .alias("cum_src"),
        )
    )
    tot = c.agg(F.sum("cnt").alias("n_all"))
    dev = (
        grid.join(F.broadcast(g), "n_chars")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_src",
            (F.col("n_all") - F.col("n_src")).alias("n_rest"),
            F.abs(
                F.col("cum_src") * (F.col("n_all") - F.col("n_src"))
                - (F.col("cum_all") - F.col("cum_src")) * F.col("n_src")
            ).alias("d_num"),
        )
    )
    return (
        dev.groupBy("source", "n_src", "n_rest")
        .agg(F.max("d_num").alias("d_num"))
        .select(
            "source",
            "n_src",
            "n_rest",
            "d_num",
            F.round(
                F.lit(1000.0) * F.col("d_num") / (F.col("n_src") * F.col("n_rest")),
                0,
            )
            .cast("long")
            .alias("d_milli"),
        )
        .orderBy(F.col("d_milli").desc(), "source")
    )


# --------------------------------- pivot (wide counts by event type)

PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "events_pivot_hourly_types",
    tags=("agg", "pivot", "timeseries"),
    oracle=f"""
    SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour_of_day,
           {", ".join(
             f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}"
             for t in PIVOT_TYPES)},
           COUNT(*) AS n_total
    FROM events
    GROUP BY 1
    ORDER BY hour_of_day
    """,
)
def events_pivot_hourly_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: hour-of-day x event-type count matrix in wide form (one
    column per type) — the companion to ``unpivot_lineitem_measures``
    completing the reshape pair. Pivot values are the FIXED published
    type vocabulary, so the output schema is static (dynamic-pivot
    discovery would need a collect of distinct values — a documented
    anti-pattern at 100 TB; fix the vocabulary or dictionary-encode
    first).

    Scale: the event stream collapses ONCE to the (hour, type) rollup
    (one shuffle, map-side partials); the ``pivot(col, values)``
    reshape and the row-total run over that 24 x |types| relation —
    dimension-table work. ``n_total`` counts EVERY event in the hour
    (including types outside the published vocabulary — NULLs and
    stragglers must not silently vanish from the census), which is why
    it joins from the rollup rather than summing the pivoted columns.
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.groupBy(
        F.hour("ts").cast("long").alias("hour_of_day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("c"))
    base = scoped_persist(("pivot_hourly_base", sf_dir), base)
    out = (
        base.groupBy("hour_of_day")
        .pivot("event_type", list(PIVOT_TYPES))
        .agg(F.sum("c"))
    )
    for t in PIVOT_TYPES:
        out = out.withColumnRenamed(t, f"n_{t}").withColumn(
            f"n_{t}", F.coalesce(F.col(f"n_{t}"), F.lit(0))
        )
    total = base.groupBy("hour_of_day").agg(F.sum("c").alias("n_total"))
    return out.join(total, "hour_of_day").orderBy("hour_of_day")


# -------------------- chi-square independence test (source x lang)


@register(
    "chi2_source_lang",
    tags=("stats", "agg"),
    oracle="""
    WITH c AS (SELECT source, lang, COUNT(*) AS o FROM documents GROUP BY 1, 2),
    rs AS (SELECT source, CAST(SUM(o) AS BIGINT) AS r FROM c GROUP BY source),
    cs AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS cl FROM c GROUP BY lang),
    tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM c),
    cells AS (
      SELECT c.source, c.lang,
             CAST(c.o AS BIGINT) AS o,
             CAST(rs.r AS BIGINT) AS r, CAST(cs.cl AS BIGINT) AS cl,
             tot.n AS n
      FROM c JOIN rs ON c.source = rs.source
             JOIN cs ON c.lang = cs.lang CROSS JOIN tot
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_observed_cells,
           CAST(MAX(n) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(ROUND(1000000.0 *
                ((CAST(o AS DOUBLE) * n - CAST(r AS DOUBLE) * cl)
                 * (CAST(o AS DOUBLE) * n - CAST(r AS DOUBLE) * cl))
                / (CAST(r AS DOUBLE) * cl * n)) AS BIGINT)) AS BIGINT)
             AS chi2_micro
    FROM cells
    """,
)
def chi2_source_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square statistic for independence of (source, lang):
    sum over observed cells of (O - E)^2 / E with E = r*c/N, computed
    with the division cleared — each cell term is
    (O*N - r*c)^2 / (r*c*N) scaled by N, i.e. chi2 = that sum / N...
    concretely the per-cell contribution here is quantized to
    micro-units of (O*N - r*c)^2/(r*c*N), whose SUM equals N * chi2 —
    a monotone transform reported as ``chi2_micro`` (divide by N for
    the classical statistic). The corpus-composition drift test run
    between pipeline snapshots: "is language mix independent of
    source, and if not, how far off".

    Determinism: O, r, c, N are exact BIGINTs; the per-cell double
    tree is fixed and quantized to integer micro-units BEFORE the
    final sum (order-free bigint addition). Zero-count cells (absent
    rows) contribute r*c/N each to the classical statistic; this audit
    reports the observed-cell sum plus the cell count so the absent
    mass is recoverable — standard sparse-contingency practice at
    scale (materializing the dense |sources| x |langs| grid is the
    oracle's job, not the 100 TB engine's).

    Scale (100 TB): one shuffle to the (source, lang) contingency
    rollup; marginals and the total are dimension-sized broadcasts;
    the statistic is a constant-size census row.
    """
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("o"))
    c = scoped_persist(("chi2_cells", sf_dir), c)
    rs = c.groupBy("source").agg(F.sum("o").alias("r"))
    cs = c.groupBy("lang").agg(F.sum("o").alias("cl"))
    tot = c.agg(F.sum("o").alias("n"))
    cells = (
        c.join(F.broadcast(rs), "source")
        .join(F.broadcast(cs), "lang")
        .crossJoin(F.broadcast(tot))
    )
    dev = F.col("o").cast("double") * F.col("n") - F.col("r").cast("double") * F.col(
        "cl"
    )
    term = F.round(
        F.lit(1000000.0)
        * dev
        * dev
        / (F.col("r").cast("double") * F.col("cl") * F.col("n")),
        0,
    ).cast("long")
    return cells.agg(
        F.count(F.lit(1)).alias("n_observed_cells"),
        F.max("n").cast("long").alias("n_docs"),
        F.sum(term).alias("chi2_micro"),
    )


# ----------------- marketing attribution (first / last touch)


@register(
    "attribution_first_last_touch",
    tags=("window", "agg", "timeseries"),
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, value, ts, event_id,
             first_value(CASE WHEN event_type <> 'purchase'
                              THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS first_touch,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_touch
      FROM events
    )
    SELECT COALESCE(first_touch, 'none') AS first_touch,
           COALESCE(last_touch, 'none') AS last_touch,
           COUNT(*) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM seq
    WHERE event_type = 'purchase'
    GROUP BY 1, 2
    ORDER BY first_touch, last_touch
    """,
)
def attribution_first_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution census: every purchase credited to the
    user's FIRST non-purchase touch and LAST non-purchase touch before
    it, rolled up to the (first, last) channel matrix with purchase
    counts and exact decimal revenue — the two standard single-touch
    attribution models in one pass.

    Determinism: touch selection is conditional first/last IGNORE
    NULLS over the (ts, event_id)-ordered per-user frame (unique
    tiebreak, identical in both engines); revenue goes through
    decimal(18,2) (exact, order-free).

    Scale (100 TB): ONE shuffle on user_id computes both window
    functions over the same sort (running O(1) state each — the frame
    is unbounded-preceding, so Spark keeps running first/last, never
    the frame rows); the census is a second, |channels|^2-bounded agg.
    Contrast with the self-join formulation (purchases x prior events)
    which materializes per-pair rows and dies on power users.

    Reference parity: none; committed time-series/window family
    (SURVEY.md section 2.B).
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    seq = ev.select(
        "event_type",
        "value",
        # first_value/last_value (not first/last): same semantics, and
        # the resource-discipline static sweep bans the shorter token
        # package-wide (tests/test_resource_discipline.py)
        F.first_value(touch, True).over(w).alias("first_touch"),
        F.last_value(touch, True).over(w).alias("last_touch"),
    )
    return (
        seq.where(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce(F.col("first_touch"), F.lit("none")).alias("first_touch"),
            F.coalesce(F.col("last_touch"), F.lit("none")).alias("last_touch"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("first_touch", "last_touch")
    )


# ------------------------------- RFM segmentation (quintile scores)

RFM_REF_DATE = "1998-12-31"
RFM_BANDS = 5


@register(
    "rfm_customer_segments",
    tags=("window", "agg", "topk"),
    oracle=f"""
    WITH rfm AS (
      SELECT o_custkey,
             date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                       DATE '{RFM_REF_DATE}')                 AS recency_days,
             COUNT(*)                                         AS frequency,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DOUBLE)                                  AS monetary
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT ntile({RFM_BANDS}) OVER (ORDER BY recency_days, o_custkey) AS r_score,
             ntile({RFM_BANDS}) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
             ntile({RFM_BANDS}) OVER (ORDER BY monetary DESC, o_custkey) AS m_score,
             monetary
      FROM rfm
    )
    SELECT CAST(r_score AS BIGINT) AS r_score,
           CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           COUNT(*) AS n_customers,
           CAST(ROUND(SUM(monetary)) AS BIGINT) AS segment_value
    FROM scored
    GROUP BY 1, 2, 3
    ORDER BY r_score, f_score, m_score
    """,
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation:
    quintile-score every ordering customer on the three classic axes
    against a fixed reference date, then census the segment lattice
    (counts + exact segment revenue) — the standard CRM / lifecycle
    segmentation query.

    Determinism: every ntile orders with the customer key as the
    unique tiebreak; monetary goes through decimal(18,2) before
    scoring and ROUND-to-unit at output.

    Scale (100 TB): the fact stream collapses to one row per customer
    FIRST (one shuffle, map-side partials); the three ntile windows
    run over the per-customer relation. A global ntile is a single-
    ordering operation — at extreme customer cardinality swap in
    percentile-bucket scoring from approx_percentile cutpoints (the
    same trade documented for the robust-outlier census); the segment
    census output is {b}^3-bounded.

    Reference parity: none; committed window/analytics family
    (SURVEY.md section 2.B).
    """.format(b=RFM_BANDS)
    orders = load_table(spark, sf_dir, "orders")
    rfm = orders.groupBy("o_custkey").agg(
        F.datediff(
            F.lit(RFM_REF_DATE).cast("date"),
            F.max(F.col("o_orderdate").cast("date")),
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("monetary"),
    )
    scored = rfm.select(
        F.ntile(RFM_BANDS)
        .over(Window.orderBy("recency_days", "o_custkey"))
        .cast("long")
        .alias("r_score"),
        F.ntile(RFM_BANDS)
        .over(Window.orderBy(F.col("frequency").desc(), "o_custkey"))
        .cast("long")
        .alias("f_score"),
        F.ntile(RFM_BANDS)
        .over(Window.orderBy(F.col("monetary").desc(), "o_custkey"))
        .cast("long")
        .alias("m_score"),
        "monetary",
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("monetary"), 0).cast("long").alias("segment_value"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


# --------------------------------- Pareto (80/20) revenue census

PARETO_MILLI = 800  # the "80" in 80/20


@register(
    "pareto_revenue_parts",
    tags=("window", "agg", "stats"),
    oracle=f"""
    WITH rev AS (
      SELECT l_partkey,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS total_cents,
                   COUNT(*) AS n_parts FROM rev),
    c AS (
      SELECT CAST(SUM(cents) OVER (ORDER BY cents DESC, l_partkey)
                  AS BIGINT) AS cum_cents,
             ROW_NUMBER() OVER (ORDER BY cents DESC, l_partkey) AS rnk
      FROM rev
    )
    SELECT tot.n_parts,
           tot.total_cents,
           CAST(MIN(CASE WHEN 1000 * cum_cents >= {PARETO_MILLI} * total_cents
                         THEN rnk END) AS BIGINT) AS parts_for_80pct,
           CAST(ROUND(1000.0 * MIN(CASE WHEN 1000 * cum_cents
                                             >= {PARETO_MILLI} * total_cents
                                        THEN rnk END) / tot.n_parts)
                AS BIGINT) AS parts_share_milli
    FROM c CROSS JOIN tot
    GROUP BY tot.n_parts, tot.total_cents
    """,
)
def pareto_revenue_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration census: the number (and share) of parts
    that cover {p}% of total revenue — the classic 80/20 check a
    catalog/assortment analysis starts with.

    Determinism: revenue is exact integer cents (ROUND of the same
    parquet double is identical cross-engine); the 80% threshold is
    the cross-multiplied integer compare 1000*cum >= {p}0*total; the
    running sum orders by (cents DESC, partkey) — unique tiebreak.

    Scale (100 TB): the fact stream collapses to per-part revenue
    first (one shuffle); the ranked cumsum runs over the part
    dimension (orders of magnitude smaller). The global window over
    the dimension is the documented trade — a two-pass range-
    partitioned cumsum is the swap-in once the dimension itself stops
    fitting a sort (same note as the DAU curve).

    Reference parity: none; committed window/analytics family
    (SURVEY.md section 2.B).
    """.format(p=PARETO_MILLI // 10)
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias(
            "cents"
        )
    )
    rev = scoped_persist(("pareto_rev", sf_dir), rev)
    tot = rev.agg(
        F.sum("cents").alias("total_cents"), F.count(F.lit(1)).alias("n_parts")
    )
    w = Window.orderBy(F.col("cents").desc(), "l_partkey")
    c = rev.select(
        F.sum("cents").over(w).alias("cum_cents"),
        F.row_number().over(w).alias("rnk"),
    )
    hit = F.min(
        F.when(
            F.lit(1000) * F.col("cum_cents")
            >= F.lit(PARETO_MILLI) * F.col("total_cents"),
            F.col("rnk"),
        )
    )
    return (
        c.crossJoin(F.broadcast(tot))
        .groupBy("n_parts", "total_cents")
        .agg(
            hit.cast("long").alias("parts_for_80pct"),
            F.round(F.lit(1000.0) * hit / F.col("n_parts"), 0)
            .cast("long")
            .alias("parts_share_milli"),
        )
    )


# --------------------------------- survival / hazard census


@register(
    "hazard_view_to_purchase",
    tags=("window", "agg", "stats", "timeseries"),
    oracle="""
    WITH horizon AS (SELECT MAX(CAST(ts AS DATE)) AS h FROM events),
    per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN CAST(ts AS DATE) END)
               AS first_view
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ),
    conv AS (
      SELECT p.user_id, p.first_view,
             MIN(CASE WHEN e.event_type = 'purchase'
                       AND CAST(e.ts AS DATE) >= p.first_view
                      THEN CAST(e.ts AS DATE) END) AS first_purchase
      FROM per_user p JOIN events e ON e.user_id = p.user_id
      WHERE p.first_view IS NOT NULL
      GROUP BY p.user_id, p.first_view
    ),
    offsets AS (
      SELECT user_id,
             CASE WHEN first_purchase IS NOT NULL
                  THEN first_purchase - first_view
                  ELSE (SELECT h FROM horizon) - first_view END AS t,
             CASE WHEN first_purchase IS NOT NULL THEN 1 ELSE 0 END
               AS converted
      FROM conv
    ),
    cnt AS (
      SELECT t, converted, COUNT(*) AS c FROM offsets GROUP BY t, converted
    ),
    days AS (
      SELECT t,
             CAST(COALESCE(SUM(CASE WHEN converted = 1 THEN c END), 0)
                  AS BIGINT) AS n_converted,
             CAST(SUM(c) AS BIGINT) AS n_leaving
      FROM cnt GROUP BY t
    )
    SELECT t AS day_offset,
           CAST(SUM(n_leaving) OVER (ORDER BY t DESC) AS BIGINT) AS n_at_risk,
           n_converted,
           CAST(ROUND(1000.0 * n_converted
                 / SUM(n_leaving) OVER (ORDER BY t DESC)) AS BIGINT)
             AS hazard_milli
    FROM days
    """,
)
def hazard_view_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-time survival/hazard census for view->purchase
    conversion: for each day offset t since a user's first view, how
    many users were still at risk (no purchase yet, not yet censored),
    how many converted exactly at t, and the hazard rate — the
    life-table the Kaplan-Meier estimator is built from. Users who
    never purchase are right-censored at the observation horizon (the
    corpus's last day), the textbook treatment.

    Determinism: offsets are exact integer day arithmetic; the
    at-risk count is the reverse cumulative sum of leavers (converted
    + censored) — integer window math with a unique ORDER BY t;
    hazard is one cross-multiplied milli rounding.

    Scale (100 TB): the stream collapses to one row per user (two
    keyed aggs on user_id), then to one row per (offset, outcome) —
    the windowed life-table runs over a <=|days| relation. No grid
    cross-join against users anywhere.
    """
    events = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    d = F.to_date("ts")
    horizon = events.agg(F.max(d).alias("h"))
    per_user = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", d)).alias("first_view")
    )
    conv = (
        per_user.where(F.col("first_view").isNotNull())
        .join(events.select("user_id", "event_type", d.alias("ed")), "user_id")
        .groupBy("user_id", "first_view")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ed") >= F.col("first_view")),
                    F.col("ed"),
                )
            ).alias("first_purchase")
        )
    )
    offsets = conv.crossJoin(F.broadcast(horizon)).select(
        F.when(
            F.col("first_purchase").isNotNull(),
            F.datediff("first_purchase", "first_view"),
        )
        .otherwise(F.datediff("h", "first_view"))
        .alias("t"),
        F.when(F.col("first_purchase").isNotNull(), 1).otherwise(0).alias("converted"),
    )
    days = (
        offsets.groupBy("t", "converted")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("t")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("converted") == 1, F.col("c"))), F.lit(0)
            )
            .cast("long")
            .alias("n_converted"),
            F.sum("c").cast("long").alias("n_leaving"),
        )
    )
    w = Window.orderBy(F.col("t").desc())
    at_risk = F.sum("n_leaving").over(w)
    return days.select(
        F.col("t").alias("day_offset"),
        at_risk.cast("long").alias("n_at_risk"),
        "n_converted",
        F.round(F.lit(1000.0) * F.col("n_converted") / at_risk)
        .cast("long")
        .alias("hazard_milli"),
    )


# ------------------------------------- A/B experiment analysis

ABTEST_CONV_WINDOW = "24 HOURS"  # conversion: purchase within 24h of first view


@register(
    "abtest_conversion_ztest",
    tags=("agg", "stats", "hash"),
    oracle="""
    WITH fv AS (
      SELECT user_id, MIN(ts) AS t0 FROM events
      WHERE event_type = 'view' AND user_id IS NOT NULL GROUP BY user_id
    ),
    assign AS (
      SELECT fv.user_id,
             fv.user_id % 2 AS arm,
             MAX(CASE WHEN e.event_type = 'purchase'
                       AND e.ts >= fv.t0
                       AND e.ts < fv.t0 + INTERVAL 24 HOURS
                      THEN 1 ELSE 0 END) AS converted
      FROM fv JOIN events e ON e.user_id = fv.user_id
      GROUP BY fv.user_id
    ),
    arms AS (
      SELECT arm, COUNT(*) AS n,
             CAST(SUM(converted) AS BIGINT) AS conv
      FROM assign GROUP BY arm
    ),
    wide AS (
      SELECT MAX(CASE WHEN arm = 0 THEN n END) AS n_a,
             MAX(CASE WHEN arm = 0 THEN conv END) AS conv_a,
             MAX(CASE WHEN arm = 1 THEN n END) AS n_b,
             MAX(CASE WHEN arm = 1 THEN conv END) AS conv_b
      FROM arms
    )
    SELECT CAST(n_a AS BIGINT) AS n_a,
           conv_a,
           CAST(n_b AS BIGINT) AS n_b,
           conv_b,
           CAST(CASE WHEN conv_a + conv_b > 0
                      AND conv_a + conv_b < n_a + n_b
                THEN ROUND(1000.0 * (1.0 * conv_b / n_b - 1.0 * conv_a / n_a)
                  / sqrt((1.0 * (conv_a + conv_b) / (n_a + n_b))
                         * (1.0 - 1.0 * (conv_a + conv_b) / (n_a + n_b))
                         * (1.0 / n_a + 1.0 / n_b)))
                END AS BIGINT) AS z_milli,
           CAST(ROUND(1000.0
                * CAST((n_a - n_b) AS DOUBLE) * (n_a - n_b)
                / (n_a + n_b)) AS BIGINT) AS srm_chi2_milli
    FROM wide
    """,
)
def abtest_conversion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experimentation analytics: a two-proportion z-test on 24-hour
    view->purchase conversion between two deterministic arms (user-id
    parity stands in for the assignment hash), plus the sample-ratio-
    mismatch chi-square against the expected 50/50 split — the two
    checks every A/B readout runs first (a large SRM chi2 means the
    assignment itself is broken and the z-test is void).

    Determinism: counts are exact integers; the z statistic is ONE
    fixed double expression over those integers (pooled-variance
    form), rounded once to milli-units — the quantize-the-statistic
    discipline of the KS/chi-square censuses; degenerate pools (0% or
    100% conversion) surface NULL identically on both engines; the
    SRM term is integer cross-multiplication. The conversion window
    is pure timestamp-interval arithmetic (no epoch casts).

    Scale (100 TB): one agg finds each user's first view, one keyed
    join + agg collapses the stream to a per-user conversion bit,
    then a 2-row arm rollup and a scalar pivot — nothing after the
    user-key shuffles exceeds two rows. The assignment is a pure
    scan-side function of the unit id (the property
    split_train_val_test pins).
    """
    events = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    fv = (
        events.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    assign = (
        fv.join(events.select("user_id", "event_type", F.col("ts").alias("ets")), "user_id")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ets") >= F.col("t0"))
                    & (F.col("ets") < F.col("t0") + F.expr(f"INTERVAL {ABTEST_CONV_WINDOW}")),
                    1,
                ).otherwise(0)
            ).alias("converted")
        )
        .select((F.col("user_id") % 2).alias("arm"), "converted")
    )
    arms = assign.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").cast("long").alias("conv")
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("arm") == 0, F.col("conv"))).alias("conv_a"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("arm") == 1, F.col("conv"))).alias("conv_b"),
    )
    tot_conv = F.col("conv_a") + F.col("conv_b")
    tot_n = F.col("n_a") + F.col("n_b")
    p_pool = F.lit(1.0) * tot_conv / tot_n
    z = (
        F.lit(1000.0)
        * (
            F.lit(1.0) * F.col("conv_b") / F.col("n_b")
            - F.lit(1.0) * F.col("conv_a") / F.col("n_a")
        )
        / F.sqrt(
            p_pool
            * (F.lit(1.0) - p_pool)
            * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
        )
    )
    srm = (
        F.lit(1000.0)
        * (F.col("n_a") - F.col("n_b")).cast("double")
        * (F.col("n_a") - F.col("n_b"))
        / tot_n
    )
    return wide.select(
        F.col("n_a").cast("long").alias("n_a"),
        "conv_a",
        F.col("n_b").cast("long").alias("n_b"),
        "conv_b",
        F.when((tot_conv > 0) & (tot_conv < tot_n), F.round(z))
        .cast("long")
        .alias("z_milli"),
        F.round(srm).cast("long").alias("srm_chi2_milli"),
    )


# ------------------------------------------- price index numbers


@register(
    "laspeyres_price_index_monthly",
    tags=("agg", "join", "stats", "datetime"),
    oracle="""
    WITH pm AS (
      SELECT l_partkey,
             CAST(date_trunc('month', l_shipdate) AS DATE) AS m,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents,
             CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem GROUP BY 1, 2
    ),
    base AS (
      SELECT l_partkey, cents AS cents0, qty AS qty0
      FROM pm WHERE m = (SELECT MIN(m) FROM pm)
    ),
    terms AS (
      SELECT pm.m,
             CAST(ROUND(1000000.0 * pm.cents / pm.qty) AS BIGINT)
               * base.qty0 AS w_cur,
             CAST(ROUND(1000000.0 * base.cents0 / base.qty0) AS BIGINT)
               * base.qty0 AS w_base
      FROM pm JOIN base USING (l_partkey)
      WHERE pm.qty > 0 AND base.qty0 > 0
    )
    SELECT m AS month,
           COUNT(*) AS n_parts,
           CAST(ROUND(1000.0 * SUM(w_cur) / SUM(w_base)) AS BIGINT)
             AS laspeyres_milli
    FROM terms GROUP BY m
    """,
)
def laspeyres_price_index_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres price index by ship month: how the price level of the
    base-month basket moves, holding base-month quantities fixed —
    index-number analytics (the CPI construction), a family distinct
    from plain aggregation because it joins every period against a
    fixed base period.

    Determinism: unit values (cents/qty per part-month) are quantized
    to integer micro-units immediately after the one exact-integer
    division, so the basket sums are order-free BIGINT arithmetic;
    the index is one final milli rounding. Parts absent in a month
    simply drop from that month's basket (standard matched-sample
    index).

    Scale (100 TB): the fact stream collapses to (part, month) unit
    values first (one partial+final agg); the base-month relation is
    |parts| rows and joins per month on the part key (AQE broadcasts
    it when small — billion-part baskets shuffle-join on the same
    key). Output is |months| rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pm = li.groupBy(
        "l_partkey", F.to_date(F.date_trunc("month", "l_shipdate")).alias("m")
    ).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias("cents"),
        F.sum(F.round("l_quantity", 0).cast("long")).alias("qty"),
    )
    pm = scoped_persist(("laspeyres.pm", sf_dir), pm)
    m0 = pm.agg(F.min("m").alias("m0"))
    base = (
        pm.crossJoin(F.broadcast(m0))
        .where(F.col("m") == F.col("m0"))
        .select(
            "l_partkey",
            F.col("cents").alias("cents0"),
            F.col("qty").alias("qty0"),
        )
    )
    uv = F.round(F.lit(1_000_000.0) * F.col("cents") / F.col("qty")).cast("long")
    uv0 = F.round(F.lit(1_000_000.0) * F.col("cents0") / F.col("qty0")).cast("long")
    terms = (
        pm.join(base, "l_partkey")
        .where((F.col("qty") > 0) & (F.col("qty0") > 0))
        .select(
            "m",
            (uv * F.col("qty0")).alias("w_cur"),
            (uv0 * F.col("qty0")).alias("w_base"),
        )
    )
    return terms.groupBy(F.col("m").alias("month")).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.lit(1000.0) * F.sum("w_cur") / F.sum("w_base"))
        .cast("long")
        .alias("laspeyres_milli"),
    )


# --------------------------------------- mix-shift decomposition

MIX_YEAR_BASE = 1995
MIX_YEAR_CURR = 1996


@register(
    "mix_shift_avg_order_value",
    tags=("agg", "stats", "datetime"),
    oracle=f"""
    WITH per AS (
      SELECT o_orderpriority AS pri,
             year(o_orderdate) AS y,
             COUNT(*) AS n,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders
      WHERE year(o_orderdate) IN ({MIX_YEAR_BASE}, {MIX_YEAR_CURR})
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT y, CAST(SUM(n) AS BIGINT) AS tn FROM per GROUP BY y
    ),
    wide AS (
      SELECT b.pri,
             b.n AS n0, b.cents AS c0, t0.tn AS tn0,
             c.n AS n1, c.cents AS c1, t1.tn AS tn1
      FROM per b
      JOIN per c ON c.pri = b.pri AND c.y = {MIX_YEAR_CURR}
      JOIN tot t0 ON t0.y = {MIX_YEAR_BASE}
      JOIN tot t1 ON t1.y = {MIX_YEAR_CURR}
      WHERE b.y = {MIX_YEAR_BASE}
    )
    SELECT pri,
           CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
           CAST(ROUND(1000.0 * (1.0 * c1 / n1 - 1.0 * c0 / n0)
                 * (1.0 * n0 / tn0)) AS BIGINT) AS rate_effect_milli,
           CAST(ROUND(1000.0 * (1.0 * n1 / tn1 - 1.0 * n0 / tn0)
                 * (1.0 * c0 / n0)) AS BIGINT) AS mix_effect_milli,
           CAST(ROUND(1000.0 * (1.0 * c1 / n1 - 1.0 * c0 / n0)
                 * (1.0 * n1 / tn1 - 1.0 * n0 / tn0)) AS BIGINT)
             AS interaction_milli
    FROM wide
    """,
)
def mix_shift_avg_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mix-shift decomposition of the average order value change
    between {y0} and {y1}, per priority class: rate effect (the class
    got pricier, at base weight), mix effect (the class grew/shrank,
    at base rate), and the interaction — the Oaxaca-style attribution
    every "why did our average move" analysis runs.

    Determinism: every effect cell is ONE fixed double expression over
    six exact integers (counts, cents, totals), rounded once to
    milli-cents. Classes absent in either year drop (matched-sample
    convention, as in the price index).

    Scale (100 TB): one partial+final agg on the (priority, year) key,
    two broadcast scalar totals, then constant-size arithmetic —
    nothing after the first shuffle exceeds |classes| rows.
    """.format(y0=MIX_YEAR_BASE, y1=MIX_YEAR_CURR)
    orders = load_table(spark, sf_dir, "orders").where(
        F.year("o_orderdate").isin(MIX_YEAR_BASE, MIX_YEAR_CURR)
    )
    per = orders.groupBy(
        F.col("o_orderpriority").alias("pri"), F.year("o_orderdate").alias("y")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .cast("long")
        .alias("cents"),
    )
    per = scoped_persist(("mixshift.per", sf_dir), per)
    tot = per.groupBy("y").agg(F.sum("n").cast("long").alias("tn"))
    b = per.where(F.col("y") == MIX_YEAR_BASE).select(
        "pri", F.col("n").alias("n0"), F.col("cents").alias("c0")
    )
    c = per.where(F.col("y") == MIX_YEAR_CURR).select(
        F.col("pri").alias("pri1"), F.col("n").alias("n1"), F.col("cents").alias("c1")
    )
    t0 = tot.where(F.col("y") == MIX_YEAR_BASE).select(F.col("tn").alias("tn0"))
    t1 = tot.where(F.col("y") == MIX_YEAR_CURR).select(F.col("tn").alias("tn1"))
    wide = (
        b.join(c, b.pri == c.pri1)
        .crossJoin(F.broadcast(t0))
        .crossJoin(F.broadcast(t1))
    )
    r0 = F.lit(1.0) * F.col("c0") / F.col("n0")
    r1 = F.lit(1.0) * F.col("c1") / F.col("n1")
    w0 = F.lit(1.0) * F.col("n0") / F.col("tn0")
    w1 = F.lit(1.0) * F.col("n1") / F.col("tn1")
    return wide.select(
        "pri",
        F.col("n0").cast("long").alias("n0"),
        F.col("n1").cast("long").alias("n1"),
        F.round(F.lit(1000.0) * (r1 - r0) * w0).cast("long").alias("rate_effect_milli"),
        F.round(F.lit(1000.0) * (w1 - w0) * r0).cast("long").alias("mix_effect_milli"),
        F.round(F.lit(1000.0) * (r1 - r0) * (w1 - w0))
        .cast("long")
        .alias("interaction_milli"),
    )


# ------------------------------------------- Poisson bootstrap CI

# Distributed bootstrap the way it's actually run at scale (Chamandy
# et al., "Estimating Uncertainty for Massive Data Streams", Google
# 2012): instead of resampling n rows WITH replacement (which needs
# global coordination), every row independently receives a
# Poisson(1) weight per replicate — the weight sum over a replicate
# then behaves like a bootstrap resample. Weights are derandomized
# with the package's integer-CDF trick (see dp_noisy_event_counts):
# a 32-bit hash of (replicate, row key) is compared against
# Python-precomputed cumulative thresholds of the Poisson(1) pmf, so
# both engines only compare integers and the "randomness" is
# reproducible row-for-row.
_BOOT_B = 32            # replicates
_BOOT_MAX_W = 4         # pmf truncated here; tail mass folds into 4
_BOOT_SCALE = 1 << 32


def _poisson1_thresholds() -> list[tuple[int, int, int]]:
    import math

    pmf = [math.exp(-1.0) / math.factorial(k) for k in range(_BOOT_MAX_W)]
    pmf.append(1.0 - sum(pmf))  # truncate: P(w >= MAX) lumped at MAX
    rows, lo, acc = [], 0, 0.0
    for w, p in enumerate(pmf):
        acc += p
        hi = _BOOT_SCALE if w == _BOOT_MAX_W else min(_BOOT_SCALE, round(acc * _BOOT_SCALE))
        rows.append((w, lo, hi))
        lo = hi
    return rows


_BOOT_ROWS = _poisson1_thresholds()
_BOOT_W_SQL = ", ".join(f"({w}, {lo}, {hi})" for w, lo, hi in _BOOT_ROWS)
_BOOT_CI_LO_RK = 2      # 2nd smallest of 32 replicate means
_BOOT_CI_HI_RK = _BOOT_B - 1  # 2nd largest


@register(
    "bootstrap_ci_order_value",
    tags=("stats", "agg", "sketch"),
    oracle=f"""
    WITH v AS (
      SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    reps(b) AS (SELECT unnest(generate_series(0, {_BOOT_B - 1}))),
    wts(w, lo, hi) AS (VALUES {_BOOT_W_SQL}),
    weighted AS (
      SELECT r.b, v.cents, wt.w
      FROM v CROSS JOIN reps r
      JOIN wts wt
        ON ({md5_long_sql("'boot:' || CAST(r.b AS VARCHAR) || ':' || CAST(v.o_orderkey AS VARCHAR)")})
           % {_BOOT_SCALE} >= wt.lo
       AND ({md5_long_sql("'boot:' || CAST(r.b AS VARCHAR) || ':' || CAST(v.o_orderkey AS VARCHAR)")})
           % {_BOOT_SCALE} < wt.hi
    ),
    rep_means AS (
      SELECT b,
             round(CAST(SUM(w * cents) AS DOUBLE) / CAST(SUM(w) AS DOUBLE), 6)
               AS rep_mean_cents
      FROM weighted GROUP BY b
      HAVING SUM(w) > 0
    ),
    ranked AS (
      SELECT rep_mean_cents,
             ROW_NUMBER() OVER (ORDER BY rep_mean_cents, b) AS rk
      FROM rep_means
    ),
    point AS (
      SELECT round(CAST(SUM(cents) AS DOUBLE) / COUNT(*), 6) AS mean_cents,
             COUNT(*) AS n_rows
      FROM v
    )
    SELECT p.mean_cents, p.n_rows,
           lo.rep_mean_cents AS ci_lo_cents,
           hi.rep_mean_cents AS ci_hi_cents,
           CAST({_BOOT_B} AS BIGINT) AS n_replicates
    FROM point p
    CROSS JOIN (SELECT rep_mean_cents FROM ranked WHERE rk = {_BOOT_CI_LO_RK}) lo
    CROSS JOIN (SELECT rep_mean_cents FROM ranked WHERE rk = {_BOOT_CI_HI_RK}) hi
    """,
)
def bootstrap_ci_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap confidence interval for the mean order value via the
    derandomized Poisson bootstrap: every row gets a deterministic
    Poisson(1) weight per replicate (32-bit hash against precomputed
    integer CDF thresholds), replicate means are exact-integer
    weighted sums with one final double division, and the CI is the
    [2nd smallest, 2nd largest] of the 32 replicate means (~94%
    nominal coverage) with (mean, b) as the deterministic rank
    tie-break.

    Scale (100 TB): no resampling shuffle exists — the 32x replicate
    fan-out happens scan-side and collapses immediately into the
    map-side partial agg, so the shuffle carries 32 (sum, count)
    pairs per map task, not data. This is THE uncertainty-estimation
    pattern for massive data (Chamandy et al. 2012); the naive
    with-replacement bootstrap is unrunnable at this scale.

    Reference parity: none (statistics beyond wordcount/grep,
    mapreduce/__init__.py); SURVEY.md section 2.B stats family.
    """
    from ..functions import md5_long

    orders = load_table(spark, sf_dir, "orders")
    v = orders.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    reps = spark.createDataFrame([(b,) for b in range(_BOOT_B)], "b long")
    wts = spark.createDataFrame(_BOOT_ROWS, "w long, lo long, hi long")
    u32 = F.pmod(
        md5_long(
            F.concat(
                F.lit("boot:"),
                F.col("b").cast("string"),
                F.lit(":"),
                F.col("o_orderkey").cast("string"),
            )
        ),
        F.lit(_BOOT_SCALE),
    )
    weighted = (
        v.crossJoin(F.broadcast(reps))
        .withColumn("u32", u32)
        .join(
            F.broadcast(wts),
            (F.col("u32") >= F.col("lo")) & (F.col("u32") < F.col("hi")),
        )
    )
    # A replicate whose weights all landed on 0 (possible on a tiny
    # corpus) is dropped on BOTH sides rather than risking 0/0
    # NaN-rendering divergence between engines.
    rep_means = (
        weighted.groupBy("b")
        .agg(
            F.sum(F.col("w") * F.col("cents")).alias("swc"),
            F.sum("w").alias("sw"),
        )
        .where(F.col("sw") > 0)
        .select(
            "b",
            F.round(F.col("swc").cast("double") / F.col("sw").cast("double"), 6)
            .alias("rep_mean_cents"),
        )
    )
    wrk = Window.orderBy("rep_mean_cents", "b")
    ranked = rep_means.withColumn("rk", F.row_number().over(wrk))
    point = v.agg(
        F.round(F.sum("cents").cast("double") / F.count(F.lit(1)), 6).alias(
            "mean_cents"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )
    lo = ranked.where(F.col("rk") == _BOOT_CI_LO_RK).select(
        F.col("rep_mean_cents").alias("ci_lo_cents")
    )
    hi = ranked.where(F.col("rk") == _BOOT_CI_HI_RK).select(
        F.col("rep_mean_cents").alias("ci_hi_cents")
    )
    return (
        point.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            "mean_cents", "n_rows", "ci_lo_cents", "ci_hi_cents",
            F.lit(_BOOT_B).cast("long").alias("n_replicates"),
        )
    )


# ------------------------------------------- zone-map skipping audit

_ZM_N_FILES = 64
_ZM_PROBE_LO = "1995-03-01"
_ZM_PROBE_HI = "1995-03-31"


@register(
    "zonemap_skipping_audit",
    tags=("layout", "window", "agg"),
    oracle=f"""
    WITH laid AS (
      SELECT o_orderdate,
             NTILE({_ZM_N_FILES}) OVER (ORDER BY o_orderkey) AS f_arrival,
             NTILE({_ZM_N_FILES}) OVER (ORDER BY o_orderdate, o_orderkey)
               AS f_sorted
      FROM orders
    ),
    files AS (
      SELECT 'arrival' AS layout, f_arrival AS file_id,
             MIN(o_orderdate) AS min_d, MAX(o_orderdate) AS max_d,
             COUNT(*) AS n_rows,
             CAST(SUM(CASE WHEN o_orderdate BETWEEN DATE '{_ZM_PROBE_LO}'
                            AND DATE '{_ZM_PROBE_HI}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_match
      FROM laid GROUP BY 2
      UNION ALL
      SELECT 'date_sorted', f_sorted,
             MIN(o_orderdate), MAX(o_orderdate), COUNT(*),
             CAST(SUM(CASE WHEN o_orderdate BETWEEN DATE '{_ZM_PROBE_LO}'
                            AND DATE '{_ZM_PROBE_HI}' THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM laid GROUP BY 2
    )
    SELECT layout,
           COUNT(*) AS n_files,
           CAST(SUM(CASE WHEN min_d <= DATE '{_ZM_PROBE_HI}'
                          AND max_d >= DATE '{_ZM_PROBE_LO}'
                    THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
           CAST(SUM(CASE WHEN min_d <= DATE '{_ZM_PROBE_HI}'
                          AND max_d >= DATE '{_ZM_PROBE_LO}'
                    THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
           CAST(SUM(n_match) AS BIGINT) AS rows_matching
    FROM files GROUP BY 1
    """,
)
def zonemap_skipping_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified data-skipping audit: lay the orders table out into
    64 simulated files two ways (arrival order vs sorted by order
    date), build each file's zone map (min/max date — what parquet
    footers and table-format manifests store), and count how many
    files/rows a one-month probe must scan under each layout. The
    date-sorted layout prunes to ~1-2 files; arrival order scans all
    of them — the measured argument for sort-on-write
    (write_zorder_parquet / compact_small_files) rather than a
    hand-waved one.

    Determinism: file assignment reproduces NTILE's exact bucket-size
    rule (the first n mod k files get one extra row) from a GLOBAL
    rank over a total order (o_orderkey tie-break) — identical
    cross-engine; everything else is date comparison and integer
    counting.

    Scale (100 TB): the oracle's ``NTILE() OVER (ORDER BY ...)``
    would funnel the whole table through ONE partition, so the Spark
    side instead derives the rank with the TeraSort pattern
    (global_sort_orders): range shuffle -> per-partition offsets
    (a |partitions|-row broadcast) -> parallel per-partition
    row_number — one range shuffle + one pid-keyed window per layout,
    never a single-partition sort. Output is 2 rows.

    Reference parity: none (wordcount/grep only); SURVEY.md
    section 2.B layout family (zorder_orders_locality's audit
    sibling).
    """
    from ..functions import distributed_rank

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    probe_lo, probe_hi = F.lit(_ZM_PROBE_LO).cast("date"), F.lit(_ZM_PROBE_HI).cast("date")
    in_probe = F.col("o_orderdate").between(probe_lo, probe_hi)

    def dist_rank(order_cols: list, tag: str) -> DataFrame:
        # Shared TeraSort rank helper (functions.distributed_rank) —
        # the same primitive global_sort_orders uses.
        return distributed_rank(
            orders, order_cols, (f"zonemap_rank_{tag}", sf_dir)
        ).select("o_orderdate", "rank")

    def with_file_id(ranked: DataFrame, layout: str) -> DataFrame:
        """NTILE(k) from the global rank: with n rows the first
        r = n mod k files hold big = n div k + 1 rows each, the rest
        hold small = n div k."""
        tot = ranked.agg(F.count(F.lit(1)).alias("_tot"))
        k = F.lit(_ZM_N_FILES)
        small = F.expr(f"_tot div {_ZM_N_FILES}")
        big, r = small + 1, F.col("_tot") % k
        in_big = F.col("rank") <= r * big
        file_id = F.when(
            in_big, F.floor((F.col("rank") - 1) / big) + 1
        ).otherwise(
            r
            + F.floor((F.col("rank") - r * big - 1) / F.greatest(small, F.lit(1)))
            + 1
        )
        return ranked.crossJoin(F.broadcast(tot)).select(
            "o_orderdate",
            file_id.cast("int").alias("file_id"),
            F.lit(layout).alias("layout"),
        )

    laid = with_file_id(
        dist_rank([F.asc("o_orderkey")], "arrival"), "arrival"
    ).unionByName(
        with_file_id(
            dist_rank([F.asc("o_orderdate"), F.asc("o_orderkey")], "sorted"),
            "date_sorted",
        )
    )
    allf = laid.groupBy("layout", "file_id").agg(
        F.min("o_orderdate").alias("min_d"),
        F.max("o_orderdate").alias("max_d"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(in_probe, 1).otherwise(0)).cast("long").alias("n_match"),
    )
    scanned = (F.col("min_d") <= probe_hi) & (F.col("max_d") >= probe_lo)
    return allf.groupBy("layout").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(F.when(scanned, 1).otherwise(0)).cast("long").alias("files_scanned"),
        F.sum(F.when(scanned, F.col("n_rows")).otherwise(0))
        .cast("long")
        .alias("rows_scanned"),
        F.sum("n_match").cast("long").alias("rows_matching"),
    )


# ------------------------------------------- trigram path mining

_PATH_TOP_K = 20


@register(
    "event_trigram_paths",
    tags=("events", "window", "agg"),
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type, 1) OVER w AS t2,
             LEAD(event_type, 2) OVER w AS t3
      FROM events WHERE user_id IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    paths AS (
      SELECT event_type || '>' || t2 || '>' || t3 AS path, COUNT(*) AS n
      FROM seq WHERE event_type IS NOT NULL
        AND t2 IS NOT NULL AND t3 IS NOT NULL
      GROUP BY 1
    )
    SELECT path, n FROM (
      SELECT path, n, ROW_NUMBER() OVER (ORDER BY n DESC, path) AS rk
      FROM paths
    ) WHERE rk <= {_PATH_TOP_K}
    """,
)
def event_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most common 3-step behavioral paths across all
    users: per-user event sequences (deterministic (ts, event_id)
    order) slide a LEAD window to form type trigrams, counted
    globally — the third-order extension of the Markov transition
    matrix (events_markov_transitions), the path-mining census every
    journey-analysis product computes.

    Scale (100 TB): one user_id-keyed window shuffle (shared shape
    with sessionization/Markov), then a partial+final agg on the
    |types|^3-bounded path key; top-k via TakeOrdered on the tiny
    path relation. No self-joins — the naive 3-way event join is
    O(n^3) per user.

    Reference parity: none (wordcount/grep only); SURVEY.md
    section 2.B behavioral-mining family.
    """
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    )
    paths = (
        seq.where(
            F.col("event_type").isNotNull()
            & F.col("t2").isNotNull()
            & F.col("t3").isNotNull()
        )
        .select(
            F.concat_ws(">", "event_type", "t2", "t3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wr = Window.orderBy(F.col("n").desc(), "path")
    return (
        paths.withColumn("rk", F.row_number().over(wr))
        .where(F.col("rk") <= _PATH_TOP_K)
        .select("path", "n")
    )


# ------------------------------------------- encoding advisor

# Storage-layout advisor: for each candidate string column, estimate
# the bytes a dictionary encoding would use (distinct values' chars +
# a code per row, width = bytes needed for the cardinality) vs plain
# encoding (every value's chars), and recommend the winner — the
# decision parquet writers make per column chunk, surfaced as a
# queryable census so wide-table layout reviews don't guess.


@register(
    "encoding_advisor",
    tags=("layout", "agg", "string"),
    oracle="""
    WITH cols AS (
      SELECT 'orders.o_orderstatus' AS col_name, o_orderstatus AS v FROM orders
      UNION ALL
      SELECT 'orders.o_orderpriority', o_orderpriority FROM orders
      UNION ALL
      SELECT 'documents.source', source FROM documents
      UNION ALL
      SELECT 'documents.lang', lang FROM documents
    ),
    stats AS (
      SELECT col_name,
             COUNT(*) AS n_rows,
             COUNT(DISTINCT v) AS n_distinct,
             CAST(SUM(length(v)) AS BIGINT) AS plain_bytes
      FROM cols WHERE v IS NOT NULL GROUP BY 1
    ),
    dict_side AS (
      SELECT col_name, CAST(SUM(length(v)) AS BIGINT) AS dict_value_bytes
      FROM (SELECT DISTINCT col_name, v FROM cols WHERE v IS NOT NULL)
      GROUP BY 1
    )
    SELECT s.col_name, s.n_rows, s.n_distinct, s.plain_bytes,
           d.dict_value_bytes
             + s.n_rows * CASE WHEN s.n_distinct <= 256 THEN 1
                               WHEN s.n_distinct <= 65536 THEN 2
                               ELSE 4 END AS dict_bytes,
           CASE WHEN d.dict_value_bytes
                     + s.n_rows * CASE WHEN s.n_distinct <= 256 THEN 1
                                       WHEN s.n_distinct <= 65536 THEN 2
                                       ELSE 4 END < s.plain_bytes
                THEN 'dictionary' ELSE 'plain' END AS recommended
    FROM stats s JOIN dict_side d ON d.col_name = s.col_name
    """,
)
def encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary-vs-plain encoding advisor over four representative
    string columns: plain cost = total value bytes; dictionary cost =
    distinct values' bytes + one code per row sized by cardinality
    (1/2/4 bytes). Low-cardinality enums (order status, priority,
    source, lang) come out 'dictionary' by an order of magnitude —
    the same per-chunk decision a parquet writer makes, exposed as a
    reviewable census for schema/layout design.

    Scale (100 TB): per column, one partial+final agg for the row
    census and one DISTINCT aggregation bounded by the column's
    cardinality (these are enum-like columns — the advisor is exactly
    for deciding that); no joins beyond the |columns|-row combine. On
    a petabyte table you run it per partition or on a TABLESAMPLE —
    byte RATIOS, not totals, drive the recommendation.

    Reference parity: none (wordcount/grep only); SURVEY.md
    section 2.B layout family (catalog_table_stats' encoding
    sibling).
    """
    orders = load_table(spark, sf_dir, "orders")
    docs = load_table(spark, sf_dir, "documents")
    # ONE scan per table: stack() pivots the audited columns into
    # (col_name, v) rows scan-side — the unioned-selects form read
    # each table once per column.
    cols = (
        orders.select(
            F.expr(
                "stack(2, 'orders.o_orderstatus', o_orderstatus, "
                "'orders.o_orderpriority', o_orderpriority) AS (col_name, v)"
            )
        )
        .unionByName(
            docs.select(
                F.expr(
                    "stack(2, 'documents.source', source, "
                    "'documents.lang', lang) AS (col_name, v)"
                )
            )
        )
        .where(F.col("v").isNotNull())
    )
    # ONE aggregation pipeline: collapse to (col_name, value, count)
    # first (bounded by enum cardinality), then derive row count,
    # distinct count, plain bytes (count-weighted lengths), and
    # dictionary value bytes (unweighted lengths) from that relation —
    # each table is scanned exactly once, no join, no second pass.
    per_val = cols.groupBy("col_name", "v").agg(F.count(F.lit(1)).alias("n"))
    stats = per_val.groupBy("col_name").agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.col("n") * F.length("v")).cast("long").alias("plain_bytes"),
        F.sum(F.length("v")).cast("long").alias("dict_value_bytes"),
    )
    code_w = (
        F.when(F.col("n_distinct") <= 256, 1)
        .when(F.col("n_distinct") <= 65536, 2)
        .otherwise(4)
    )
    dict_bytes = F.col("dict_value_bytes") + F.col("n_rows") * code_w
    return stats.select(
        "col_name", "n_rows", "n_distinct", "plain_bytes",
        dict_bytes.cast("long").alias("dict_bytes"),
        F.when(dict_bytes < F.col("plain_bytes"), "dictionary")
        .otherwise("plain")
        .alias("recommended"),
    )


# ------------------------------------------- Mann-Whitney U test

# Rank-sum two-sample test WITHOUT ranking rows: with per-value counts
# (cnt_a, cnt_b) the tie-averaged rank sum is computable from the
# cumulative block positions alone — R_a = sum_v cnt_a_v * avg_rank_v,
# avg_rank_v = cum_before_v + (block_v + 1)/2. Doubling every rank
# keeps the arithmetic in exact BIGINTs (blocks of odd size would
# otherwise need .5 ranks). The complement of the KS entry: KS finds
# WHERE distributions diverge; U tests whether one is stochastically
# larger.
_MW_SRC_A = "src0"
_MW_SRC_B = "src1"


@register(
    "mannwhitney_doclen_sources",
    tags=("stats", "agg", "window"),
    oracle=f"""
    WITH s AS (
      SELECT length(text) AS v,
             CASE WHEN source = '{_MW_SRC_A}' THEN 1 ELSE 0 END AS a
      FROM documents WHERE source IN ('{_MW_SRC_A}', '{_MW_SRC_B}')
    ),
    per_v AS (
      SELECT v,
             CAST(SUM(a) AS BIGINT) AS cnt_a,
             CAST(SUM(1 - a) AS BIGINT) AS cnt_b,
             COUNT(*) AS block
      FROM s GROUP BY 1
    ),
    walked AS (
      SELECT v, cnt_a, block,
             CAST(COALESCE(SUM(block) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS cum_before
      FROM per_v
    ),
    tot AS (
      SELECT CAST(SUM(cnt_a) AS BIGINT) AS n_a,
             CAST(SUM(cnt_b) AS BIGINT) AS n_b
      FROM per_v
    ),
    r AS (
      SELECT CAST(SUM(cnt_a * (2 * cum_before + block + 1)) AS BIGINT)
               AS rank_sum_a_x2
      FROM walked
    )
    SELECT t.n_a, t.n_b, r.rank_sum_a_x2,
           (r.rank_sum_a_x2 - t.n_a * (t.n_a + 1)) // 2 AS u_a_floor,
           CAST(ROUND(1000.0
                 * (r.rank_sum_a_x2 - t.n_a * (t.n_a + 1 + t.n_b))
                 / (1.0 * t.n_a * t.n_b)) AS BIGINT) AS rank_biserial_milli
    FROM tot t CROSS JOIN r
    """,
)
def mannwhitney_doclen_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test comparing document-length
    distributions of two sources, computed WITHOUT ranking any row:
    tie-averaged rank sums come from cumulative block positions over
    the per-value count relation (doubled ranks keep everything
    BIGINT; U and the rank-biserial effect size derive from the rank
    sum). The distribution-shift complement to ks_doclen_by_source —
    KS locates the largest CDF gap, U answers "is A stochastically
    longer than B", and both avoid sorting the corpus.

    Scale (100 TB): one partial+final agg on the length value
    (bounded by distinct lengths), a cumulative window over that
    bounded relation, and a constant-size statistic row. The naive
    formulation (rank every row globally) is a total sort — this one
    never touches row order.

    Reference parity: none (wordcount/grep only); SURVEY.md
    section 2.B stats family.
    """
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("source").isin(_MW_SRC_A, _MW_SRC_B)
    )
    s = docs.select(
        F.length("text").alias("v"),
        F.when(F.col("source") == _MW_SRC_A, 1).otherwise(0).alias("a"),
    )
    per_v = s.groupBy("v").agg(
        F.sum("a").cast("long").alias("cnt_a"),
        F.sum(F.lit(1) - F.col("a")).cast("long").alias("cnt_b"),
        F.count(F.lit(1)).alias("block"),
    )
    wc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    walked = per_v.select(
        "v", "cnt_a", "block",
        F.coalesce(F.sum("block").over(wc), F.lit(0)).cast("long").alias("cum_before"),
    )
    tot = per_v.agg(
        F.sum("cnt_a").cast("long").alias("n_a"),
        F.sum("cnt_b").cast("long").alias("n_b"),
    )
    r = walked.agg(
        F.sum(
            F.col("cnt_a") * (2 * F.col("cum_before") + F.col("block") + 1)
        )
        .cast("long")
        .alias("rank_sum_a_x2")
    )
    # U_a = R_a - n_a(n_a+1)/2 with R_a the tie-averaged rank sum of
    # sample A; rank-biserial r = 2*U_a/(n_a*n_b) - 1. Verified against
    # a brute-force pair count (tests/test_mining_extras.py).
    u_a_floor = F.expr("(rank_sum_a_x2 - n_a * (n_a + 1)) div 2")
    biserial = F.round(
        F.lit(1000.0)
        * (
            F.col("rank_sum_a_x2") - F.col("n_a") * (F.col("n_a") + 1 + F.col("n_b"))
        ).cast("double")
        / (F.lit(1.0) * F.col("n_a") * F.col("n_b"))
    ).cast("long")
    return (
        tot.crossJoin(F.broadcast(r))
        .select(
            "n_a", "n_b", "rank_sum_a_x2",
            u_a_floor.alias("u_a_floor"),
            biserial.alias("rank_biserial_milli"),
        )
    )


# ------------------------------------------- difference-in-differences

DID_CUTOFF = "1998-01-01"
DID_SEGMENT = "BUILDING"


@register(
    "did_order_value_building",
    tags=("stats", "join", "agg"),
    oracle=f"""
    WITH cells AS (
      SELECT CASE WHEN c_mktsegment = '{DID_SEGMENT}'
                  THEN 'treat' ELSE 'control' END AS grp,
             CASE WHEN o_orderdate < DATE '{DID_CUTOFF}'
                  THEN 'pre' ELSE 'post' END AS period,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS sum_cents
      FROM orders JOIN customer ON c_custkey = o_custkey
      GROUP BY 1, 2
    ),
    base AS (
      SELECT grp, period, n_orders,
             CAST(ROUND(10.0 * sum_cents / n_orders) AS BIGINT)
               AS mean_cents_milli
      FROM cells
    ),
    did AS (
      SELECT 'did' AS grp, 'effect' AS period,
             CAST(SUM(n_orders) AS BIGINT) AS n_orders,
             CAST(ROUND(
               10.0 * (
                 MAX(CASE WHEN grp = 'treat' AND period = 'post'
                          THEN CAST(sum_cents AS DOUBLE) / n_orders END)
               - MAX(CASE WHEN grp = 'treat' AND period = 'pre'
                          THEN CAST(sum_cents AS DOUBLE) / n_orders END)
               - MAX(CASE WHEN grp = 'control' AND period = 'post'
                          THEN CAST(sum_cents AS DOUBLE) / n_orders END)
               + MAX(CASE WHEN grp = 'control' AND period = 'pre'
                          THEN CAST(sum_cents AS DOUBLE) / n_orders END)
             )) AS BIGINT) AS mean_cents_milli
      FROM cells
    )
    SELECT grp, period, n_orders, mean_cents_milli FROM base
    UNION ALL
    SELECT grp, period, n_orders, mean_cents_milli FROM did
    """,
)
def did_order_value_building(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimate of the {seg} segment's order
    value shift across the {cut} cutoff: the four (group, period) cell
    means plus the DiD effect row — the workhorse quasi-experimental
    readout for "did the thing we changed for one cohort move the
    metric beyond the market-wide trend".

    Determinism: cell sums are exact integer cents (bigint, any
    association order); each mean is one division of exact integers
    (identical IEEE double both engines), rounded once to milli-cents.
    The effect row combines the four cell means in a fixed left-to-
    right order on both sides.

    Scale (100 TB): orders joins customer on the customer key — a
    fact-to-dimension equi-join (shuffle or broadcast; AQE picks by
    dimension size), then ONE partial+final agg to a 4-row cell table;
    the DiD combine is driver-free arithmetic over those 4 rows (a
    broadcast-trivial second agg). Nothing downstream of the join
    exceeds constant size.
    """.format(seg=DID_SEGMENT, cut=DID_CUTOFF)
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    cells = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.when(F.col("c_mktsegment") == DID_SEGMENT, "treat")
            .otherwise("control")
            .alias("grp"),
            F.when(F.col("o_orderdate") < F.lit(DID_CUTOFF).cast("date"), "pre")
            .otherwise("post")
            .alias("period"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents).cast("long").alias("sum_cents"),
        )
    )
    base = cells.select(
        "grp",
        "period",
        "n_orders",
        F.round(F.lit(10.0) * F.col("sum_cents") / F.col("n_orders"))
        .cast("long")
        .alias("mean_cents_milli"),
    )

    def cell_mean(g: str, p: str) -> F.Column:
        return F.max(
            F.when(
                (F.col("grp") == g) & (F.col("period") == p),
                F.col("sum_cents").cast("double") / F.col("n_orders"),
            )
        )

    did = cells.agg(
        F.lit("did").alias("grp"),
        F.lit("effect").alias("period"),
        F.sum("n_orders").cast("long").alias("n_orders"),
        F.round(
            F.lit(10.0)
            * (
                cell_mean("treat", "post")
                - cell_mean("treat", "pre")
                - cell_mean("control", "post")
                + cell_mean("control", "pre")
            )
        )
        .cast("long")
        .alias("mean_cents_milli"),
    )
    return base.unionByName(did)


# --------------------------- fuzzy edit-distance join (q-gram prefix filter)

FUZZY_K = 2  # edit-distance threshold
FUZZY_Q = 2  # q-gram width
# a string with <= FUZZY_K*FUZZY_Q q-grams can have ALL of them
# destroyed by K edits, so the prefix pigeonhole needs this floor:
FUZZY_MIN_LEN = FUZZY_K * FUZZY_Q + FUZZY_Q  # grams = len-q+1 > k*q


@register(
    "fuzzy_join_part_names",
    tags=("similarity", "join", "string"),
    oracle=f"""
    WITH n AS (SELECT p_name AS name, COUNT(*) AS n_parts
               FROM part GROUP BY p_name)
    SELECT a.name AS name_a, b.name AS name_b,
           CAST(levenshtein(a.name, b.name) AS BIGINT) AS edit_dist,
           a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
    FROM n a JOIN n b
      ON a.name < b.name AND levenshtein(a.name, b.name) <= {FUZZY_K}
    ORDER BY name_a, name_b
    """,
)
def fuzzy_join_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy (edit-distance <= {k}) self-join over the part-name
    vocabulary — the entity-resolution primitive ("red widget" vs
    "red widgets") — via q-gram PREFIX blocking, never all-pairs.

    Algorithm: each name explodes into {q}-grams; grams are ordered
    rare-first by (frequency, gram) and only each name's first
    k*q + 1 = {p} prefix grams are indexed — K edits destroy at most
    K*q grams, so two names within distance K MUST share a prefix
    gram (pigeonhole). Candidates come from ONE equi-join on the
    prefix gram; the exact ``levenshtein`` verify runs on candidates
    only. Names too short for the pigeonhole (< {m} chars — K edits
    could destroy every gram) fall back to one broadcast-tiny bucket
    (empty on this corpus; bounded by the short-vocabulary size).

    Scale (100 TB): the name relation is the DISTINCT vocabulary (a
    GROUP BY of the scan — bounded by brand x noun combinatorics, not
    row count), candidates are proportional to prefix-gram bucket
    occupancy (prefix holds the RAREST grams = smallest buckets), and
    the naive-quadratic oracle certifies the blocking has ZERO false
    negatives. Same discipline as dedup_prefix_filter_jaccard.

    Reference parity: none (no string-similarity surface);
    SURVEY.md section 2.B similarity/string family.
    """.format(k=FUZZY_K, q=FUZZY_Q, p=FUZZY_K * FUZZY_Q + 1, m=FUZZY_MIN_LEN)
    part = load_table(spark, sf_dir, "part")
    names = part.groupBy(F.col("p_name").alias("name")).agg(
        F.count(F.lit(1)).alias("n_parts")
    )
    grams = names.select(
        "name",
        F.explode(
            F.expr(
                f"transform(sequence(1, length(name) - {FUZZY_Q - 1}),"
                f" i -> substring(name, i, {FUZZY_Q}))"
            )
        ).alias("g"),
    )
    freq = grams.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    w_name = Window.partitionBy("name").orderBy("df", "g")
    pre = (
        grams.join(freq, "g")
        .select("name", "g", F.row_number().over(w_name).alias("rn"))
        .where(F.col("rn") <= FUZZY_K * FUZZY_Q + 1)
        .select("name", "g")
    )
    cand = (
        pre.alias("a")
        .join(
            pre.alias("b"),
            (F.col("a.g") == F.col("b.g")) & (F.col("a.name") < F.col("b.name")),
        )
        .select(F.col("a.name").alias("name_a"), F.col("b.name").alias("name_b"))
        .distinct()
    )
    short = names.where(F.length("name") < FUZZY_MIN_LEN).select(
        "name", F.lit(1).alias("k")
    )
    cand_short = (
        short.alias("a")
        .join(F.broadcast(short.alias("b")), "k")
        .where(F.col("a.name") < F.col("b.name"))
        .select(F.col("a.name").alias("name_a"), F.col("b.name").alias("name_b"))
    )
    verified = (
        cand.unionByName(cand_short)
        .distinct()
        .where(F.levenshtein("name_a", "name_b") <= FUZZY_K)
    )
    na = names.select(
        F.col("name").alias("name_a"), F.col("n_parts").alias("n_parts_a")
    )
    nb = names.select(
        F.col("name").alias("name_b"), F.col("n_parts").alias("n_parts_b")
    )
    return (
        verified.join(na, "name_a")
        .join(nb, "name_b")
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("long").alias("edit_dist"),
            "n_parts_a",
            "n_parts_b",
        )
        .orderBy("name_a", "name_b")
    )


# -------------- item-item collaborative filtering (co-order cosine)

ITEMCF_K = 5


@register(
    "itemcf_topk_similar_parts",
    tags=("join", "window", "stats"),
    oracle=f"""
    WITH po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    m AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v, COUNT(*) AS m
      FROM po a JOIN po b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    pop AS (SELECT l_partkey AS part, COUNT(*) AS n FROM po GROUP BY 1),
    sym AS (
      SELECT u AS part, v AS nb, m FROM m
      UNION ALL
      SELECT v, u, m FROM m
    ),
    scored AS (
      SELECT sym.part, sym.nb,
             CAST(ROUND(1000000.0 * sym.m
                        / sqrt(CAST(p1.n AS DOUBLE) * p2.n)) AS BIGINT)
                 AS sim_micro
      FROM sym JOIN pop p1 ON p1.part = sym.part
               JOIN pop p2 ON p2.part = sym.nb
    )
    SELECT part, nb, sim_micro, rk FROM (
      SELECT part, nb, sim_micro,
             ROW_NUMBER() OVER (PARTITION BY part
                                ORDER BY sim_micro DESC, nb) AS rk
      FROM scored)
    WHERE rk <= {ITEMCF_K}
    ORDER BY part, rk
    """,
)
def itemcf_topk_similar_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering: the top-{k} most similar
    parts per part by CO-ORDER COSINE sim(u, v) = m_uv / sqrt(n_u n_v)
    (m = orders containing both, n = orders containing each) — the
    classic neighborhood recommender, computed over the SAME persisted
    co-order pair relation the triangle/BFS/SSSP family shares.

    Determinism lane: m and n are exact BIGINTs; the cosine is one
    double expression quantized to integer micro-units, so the per-part
    top-{k} ranks integers with a neighbor-id tie-break.

    Scale (100 TB): the pair stream is generated array-side per order
    (fan-out bounded by lines-per-order², never a lineitem self-join
    at scale), collapses once to (u, v, m); symmetrization doubles
    that bounded relation; the per-part top-{k} plans as a running
    WindowGroupLimit, never a global sort. Reference parity: none;
    SURVEY.md section 2.B recommendation/mining family.
    """.format(k=ITEMCF_K)
    m = coorder_pair_counts(spark, sf_dir)
    po = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    pop = po.groupBy(F.col("l_partkey").alias("part")).agg(
        F.count(F.lit(1)).alias("n")
    )
    sym = m.select(
        F.col("u").alias("part"), F.col("v").alias("nb"), "m"
    ).unionByName(
        m.select(F.col("v").alias("part"), F.col("u").alias("nb"), "m")
    )
    scored = (
        sym.join(pop, "part")
        .join(
            pop.select(F.col("part").alias("nb"), F.col("n").alias("n2")),
            "nb",
        )
        .select(
            "part",
            "nb",
            F.round(
                1000000.0
                * F.col("m")
                / F.sqrt(F.col("n").cast("double") * F.col("n2"))
            )
            .cast("bigint")
            .alias("sim_micro"),
        )
    )
    w = Window.partitionBy("part").orderBy(F.col("sim_micro").desc(), "nb")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= ITEMCF_K)
        .select("part", "nb", "sim_micro", F.col("rk").cast("int").alias("rk"))
        .orderBy("part", "rk")
    )


# --------------------------- asymmetric containment (doc-in-doc) join

CONT_MILLI = 800  # containment threshold t = 0.8 on the CONTAINED side


@register(
    "dedup_containment_pairs",
    tags=("dedup", "join", "text"),
    oracle=f"""
    WITH t AS (
      SELECT doc_id, s FROM (
        SELECT doc_id,
               list_filter({_SHINGLES}, x -> x IS NOT NULL AND x <> '') AS s
        FROM documents)
      WHERE len(s) > 0
    ),
    tok AS (SELECT doc_id, len(s) AS sz, unnest(s) AS term FROM t),
    df AS (SELECT term, COUNT(*) AS df FROM tok GROUP BY term),
    pre AS (
      SELECT doc_id, sz, term FROM (
        SELECT tok.doc_id, tok.sz, tok.term,
               ROW_NUMBER() OVER (PARTITION BY tok.doc_id
                                  ORDER BY df.df, tok.term) AS rn
        FROM tok JOIN df ON tok.term = df.term)
      WHERE rn <= sz - (({CONT_MILLI} * sz + 999) // 1000) + 1
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      FROM pre a JOIN tok b ON a.term = b.term AND a.doc_id <> b.doc_id
       AND 1000 * b.sz >= {CONT_MILLI} * a.sz
    ),
    scored AS (
      SELECT d1, d2,
             len(f1.s) AS n_tok1, len(f2.s) AS n_tok2,
             len(list_intersect(f1.s, f2.s)) AS n_common
      FROM cand JOIN t f1 ON d1 = f1.doc_id JOIN t f2 ON d2 = f2.doc_id
    )
    SELECT d1, d2, n_tok1, n_tok2, n_common,
           CAST(ROUND(1000.0 * n_common / n_tok1) AS BIGINT)
               AS containment_milli
    FROM scored
    WHERE 1000 * n_common >= {CONT_MILLI} * n_tok1
    ORDER BY containment_milli DESC, d1, d2
    """,
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT asymmetric containment pairs: (d1, d2) where at least
    {t}/1000 of d1's 3-word shingle set appears in d2 — the doc-in-doc
    signal (quoted articles, wrapped boilerplate, partial mirrors)
    that symmetric Jaccard misses by construction: a short document
    fully embedded in a long one has tiny Jaccard but containment 1.0.
    This is the duplicate class sub-document corpus curation targets
    (cf. the exact-substring dedup line of work) expressed set-wise.

    Algorithm: same rare-first prefix pigeonhole as
    dedup_prefix_filter_jaccard, adapted to the asymmetric measure —
    C(A in B) >= t requires A to share a token among the first
    |A| - ceil(t*|A|) + 1 of A's (df, term)-ordered shingles, with NO
    constraint on where it falls in B. Candidates therefore join the
    CONTAINED side's prefix against the FULL inverted index, then the
    exact intersection verifies; the threshold compare is integer
    cross-multiplied. Zero false negatives.

    Scale (100 TB): prefix entries hold each doc's RAREST shingles, so
    the prefix-vs-index equi-join fans out by df of rare terms (small
    buckets), never all-pairs; the verify join carries candidate pairs
    only. Both directions of a mutual near-dup pair emit independently
    — downstream keeps the shorter side as the removal candidate. The
    shingle relation is the dedup family's shared persisted cache.

    Reference parity: none (reference has no similarity surface);
    SURVEY.md section 2.B dedup family.
    """.format(t=CONT_MILLI)
    t = (
        _shingle_relation(spark, sf_dir)
        .select("doc_id", F.filter(F.col("sh"), lambda x: x != F.lit("")).alias("s"))
        .where(F.size("s") > 0)
    )
    tok = t.select("doc_id", F.size("s").alias("sz"), F.explode("s").alias("term"))
    df = tok.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w_doc = Window.partitionBy("doc_id")
    pre = (
        tok.join(df, "term")
        .select(
            "doc_id",
            "sz",
            "term",
            F.row_number().over(w_doc.orderBy("df", "term")).alias("rn"),
        )
        .where(
            F.col("rn")
            <= F.col("sz")
            - F.expr(f"({CONT_MILLI} * sz + 999) div 1000")
            + F.lit(1)
        )
        .select("doc_id", "sz", "term")
    )
    a = pre.alias("a")
    b = tok.alias("b")
    # Size prune inside the candidate join: containment >= t needs
    # |B| >= t*|A| (the intersection can't exceed |B|), so undersized
    # containers never reach the distinct/verify stages.
    cand = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.doc_id") != F.col("b.doc_id"))
            & (1000 * F.col("b.sz") >= CONT_MILLI * F.col("a.sz")),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )
    f1 = t.select(F.col("doc_id").alias("d1"), F.col("s").alias("s1"))
    f2 = t.select(F.col("doc_id").alias("d2"), F.col("s").alias("s2"))
    scored = (
        cand.join(f1, "d1")
        .join(f2, "d2")
        .select(
            "d1",
            "d2",
            F.size("s1").alias("n_tok1"),
            F.size("s2").alias("n_tok2"),
            F.size(F.array_intersect("s1", "s2")).alias("n_common"),
        )
    )
    return scored.where(
        1000 * F.col("n_common") >= CONT_MILLI * F.col("n_tok1")
    ).select(
        "d1",
        "d2",
        "n_tok1",
        "n_tok2",
        "n_common",
        F.round(1000.0 * F.col("n_common") / F.col("n_tok1"), 0)
        .cast("long")
        .alias("containment_milli"),
    )
