"""Graph-kernel mining over the co-order graph (split from mining.py
along its docstring family lines, round 5): the shared co-order pair
stream, degree-oriented triangle counting (hub-proof wedge join), HITS
hubs/authorities in exact integer mass, and item-item collaborative
filtering (co-order cosine).

The co-order helpers here (``coorder_pairs`` / ``coorder_pair_counts``)
are the edge source for the whole graph family (queries/graph.py BFS /
SSSP / LPA / k-core).

The reference has no analytics surface at all (SURVEY.md section 2.B);
these extend the engine's committed north-star families.

Cross-engine determinism follows the package discipline (SCALE.md):
every aggregate is an exact BIGINT sum of per-row integers; doubles
appear only in a FINAL fixed expression tree over those exact
integers, then are quantized (micro-/milli-units).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..functions import scoped_persist
from ..sources import load_table, load_tables


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


