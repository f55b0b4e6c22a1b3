"""Graph and mergeable-sketch operators: integer-exact PageRank over
the customer-supplier interaction graph, and re-aggregatable
HyperLogLog sketch state.

PageRank joins k-means (queries/similarity.py) and connected components
(queries/dedup.py) as the engine's third iterative algorithm — but
unlike those two, its fixed-iteration form is fully SQL-expressible
(unrolled CTEs), so it gets a real DuckDB oracle, not a rows-only
check.

Determinism: classic PageRank sums double contributions, which is
association-order dependent and would flake the driver's value hash.
Here ALL rank mass is integer micro-units: contributions are exact
integer divisions (``rank div degree``), damping is integer
(``(15*BASE + 85*sum) div 100``), and bigint sums are exact in any
order. The fixed point of the integer recurrence differs from float
PageRank by < 1 micro-unit per hop — irrelevant for ranking, decisive
for reproducibility (the same argument as the surprisal millinats in
queries/mlprep.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import scoped_persist, truncate_plan
from ..registry import register
from ..sources import load_table

PAGERANK_BASE = 1_000_000  # rank micro-units per node
PAGERANK_ITERS = 3


def _pagerank_oracle() -> str:
    base = PAGERANK_BASE
    sql = f"""
    WITH pairs AS MATERIALIZED (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                      's' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    bi AS MATERIALIZED (
      SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs
    ),
    deg AS MATERIALIZED (SELECT src AS node, COUNT(*) AS deg FROM bi GROUP BY 1),
    r0 AS MATERIALIZED (SELECT node, CAST({base} AS BIGINT) AS r FROM deg)
    """
    prev = "r0"
    for i in range(1, PAGERANK_ITERS + 1):
        sql += f""",
    s{i} AS MATERIALIZED (
      SELECT b.dst AS node, CAST(SUM(r.r // d.deg) AS BIGINT) AS s
      FROM bi b
      JOIN {prev} r ON b.src = r.node
      JOIN deg d ON b.src = d.node
      GROUP BY 1
    ),
    r{i} AS MATERIALIZED (SELECT node, (15 * {base} + 85 * s) // 100 AS r FROM s{i})
        """
        prev = f"r{i}"
    sql += f"""
    SELECT r.node AS node_id, r.r AS rank_fixed, d.deg AS degree
    FROM {prev} r JOIN deg d USING (node)
    """
    return sql


@register(
    "pagerank_customer_supplier",
    tags=("graph", "join", "iterative"),
    oracle=_pagerank_oracle(),
)
def pagerank_customer_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, {iters} fixed iterations) over the
    bipartite customer-supplier graph induced by orders x lineitem —
    "which suppliers sit at the center of the purchase network". The
    graph is symmetrized (both edge directions) so rank circulates.

    Scale (100 TB): the edge list is built by ONE fact-fact equi-join,
    deduplicated, persisted, and reused across iterations; each
    iteration is an equi-join of the current rank vector against the
    edge list plus one partial+final agg on the destination key — the
    same join-agg loop as connected components (dedup.py), with edges
    partitioned once and rank vectors (|nodes| rows, tiny next to
    |edges|) flowing to the edges. No driver-side state, no cartesian
    anything; each iteration localCheckpoints its rank vector (the
    dedup_clusters discipline) so the unrolled plan stays one
    join+agg deep regardless of iteration count.
    Integer rank mass makes the result bit-reproducible under any
    partitioning (see module docstring).
    """.format(iters=PAGERANK_ITERS)
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    bi = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # Both working relations are persisted: the rank seed and the final
    # degree join hang off `deg`, and every iteration scans `edges` —
    # without the caches each consumer would recompute the
    # orders x lineitem join + distinct from the parquet scan.
    deg = scoped_persist(
        ("pagerank.deg", sf_dir),
        bi.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("deg")),
    )
    edges = scoped_persist(
        ("pagerank.edges", sf_dir),
        bi.join(deg, bi.src == deg.node).select("src", "dst", "deg"),
    )

    ranks = deg.select("node", F.lit(PAGERANK_BASE).cast("bigint").alias("r"))
    for _ in range(PAGERANK_ITERS):
        # Equi-join rank vector to edges, partial-agg contributions on
        # dst — AQE broadcasts the (|nodes|-row) rank side when small
        # enough and shuffle-joins otherwise, which is exactly the
        # billion-node-safe default. (An explicit broadcast() hint here
        # measured 5-10x SLOWER on local[32]: each hop's broadcast
        # build serializes the whole prior lineage through the driver,
        # defeating the cached edge relation — measured, not guessed.)
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .select(F.col("dst"), F.expr("r div deg").alias("c"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("s"))
        )
        ranks = contrib.select(
            "node",
            F.expr(f"(15 * {PAGERANK_BASE} + 85 * s) div 100").alias("r"),
        ).transform(truncate_plan)  # truncate per-iteration lineage (see kcore)
    return ranks.join(deg.withColumnRenamed("node", "n2"), ranks.node == F.col("n2")).select(
        F.col("node").alias("node_id"),
        F.col("r").alias("rank_fixed"),
        F.col("deg").alias("degree"),
    )


BFS_HOPS = 3


def _bfs_oracle() -> str:
    sql = """
    WITH pairs AS MATERIALIZED (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey < b.l_partkey
    ),
    sym AS MATERIALIZED (
      SELECT u AS src, v AS dst FROM pairs
      UNION ALL SELECT v, u FROM pairs
    ),
    f0 AS MATERIALIZED (SELECT MIN(u) AS node FROM pairs),
    vis0 AS MATERIALIZED (SELECT node FROM f0)
    """
    for i in range(1, BFS_HOPS + 1):
        sql += f""",
    f{i} AS MATERIALIZED (
      SELECT DISTINCT s.dst AS node
      FROM sym s JOIN f{i - 1} f ON s.src = f.node
      WHERE s.dst NOT IN (SELECT node FROM vis{i - 1})
    ),
    vis{i} AS MATERIALIZED (SELECT node FROM vis{i - 1} UNION SELECT node FROM f{i})
        """
    sql += "\n" + "\n    UNION ALL ".join(
        f"SELECT {i} AS hop, COUNT(*) AS n_nodes, "
        f"CAST(SUM(node) AS BIGINT) AS sum_node FROM f{i}"
        for i in range(BFS_HOPS + 1)
    )
    return sql


@register(
    "bfs_hops_part_coorder",
    tags=("graph", "join", "iterative"),
    oracle=_bfs_oracle(),
)
def bfs_hops_part_coorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breadth-first search over the part co-order graph (shared edge
    relation with the triangle kernel, queries/mining.py): frontier
    size and an integer checksum per hop, {hops} hops out from the
    lowest-numbered part — the reachability/shortest-path primitive
    next to PageRank (rank), connected components (clustering), and
    HITS (authority).

    Determinism: frontiers are exact distinct node sets, the per-hop
    census is (COUNT, SUM) of BIGINT keys — order-free.

    Scale (100 TB): textbook distributed BFS. The symmetrized edge
    list is built once (array-side pair generation, no self-join —
    see coorder_pairs) and persisted; each hop is ONE equi-join of
    the frontier against the edge list, a distinct, and one anti-join
    against the visited set — all shuffle-on-key shapes whose cost
    tracks frontier-adjacent edges, never |V|x|V|. Frontier and
    visited relations stay distributed (no driver sets); AQE
    broadcasts small frontiers automatically — the billion-node-safe
    default (same rationale as the PageRank hop join above). Each
    level localCheckpoints frontier and visited (the dedup_clusters
    discipline), so the unrolled plan stays one hop deep no matter
    how far the search runs.

    Reference parity: none (the reference has no join operator);
    committed graph family, SURVEY.md section 2.B.
    """.format(hops=BFS_HOPS)
    from .mining_graph import coorder_pairs

    pairs = coorder_pairs(spark, sf_dir)
    sym = scoped_persist(
        ("bfs.sym", sf_dir),
        pairs.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionByName(
            pairs.select(F.col("v").alias("src"), F.col("u").alias("dst"))
        ),
    )
    frontier = pairs.agg(F.min("u").alias("node"))
    visited = frontier
    censuses = [
        frontier.agg(
            F.lit(0).alias("hop"),
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("node").cast("bigint").alias("sum_node"),
        )
    ]
    for hop in range(1, BFS_HOPS + 1):
        frontier = (
            sym.join(frontier, sym.src == frontier.node)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
        )
        # Each hop's frontier feeds THREE consumers (next expansion,
        # visited union, census) and visited two — localCheckpoint
        # truncates the logical plan each hop so those fan-outs never
        # nest (a lazy persist leaves the full lineage in every
        # consumer's plan: Catalyst re-analysis of the exponentially
        # nested trees measured ~28s cold at sf0.01, ~2s checkpointed).
        frontier = frontier.transform(truncate_plan)
        visited = visited.unionByName(frontier).distinct().transform(truncate_plan)
        censuses.append(
            frontier.agg(
                F.lit(hop).alias("hop"),
                F.count(F.lit(1)).alias("n_nodes"),
                F.sum("node").cast("bigint").alias("sum_node"),
            )
        )
    out = censuses[0]
    for c in censuses[1:]:
        out = out.unionByName(c)
    return out


@register("approx_users_hll_mergeable", tags=("agg", "approx", "sketch"), oracle=None)
def approx_users_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable distinct-user sketches: one Apache DataSketches
    HLL per event_type, plus the ALL row computed by MERGING the
    per-type sketches (``hll_union_agg``) — never by re-scanning the
    raw events.

    This is the 100 TB cardinality pattern `approx_count_distinct`
    alone can't give you: persist a sketch per (partition, group) at
    ingest, then answer any coarser rollup by unioning sketches —
    distinct counts become algebraically mergeable state, the same
    state-vs-delta discipline as events_incremental_hourly_merge
    (queries/curation.py). No oracle: sketch estimates are
    engine-specific (the driver records rows-only); the unit test pins
    <5% relative error vs exact counts AND that the merged ALL row
    equals a sketch built directly over all users.
    """
    events = load_table(spark, sf_dir, "events")
    per_type = events.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count(F.lit(1)).alias("n_events"),
    )
    per_type = scoped_persist(("hll.per_type", sf_dir), per_type)
    typed = per_type.select(
        "event_type",
        F.hll_sketch_estimate("sk").cast("bigint").alias("approx_users"),
        "n_events",
    )
    merged = per_type.agg(
        F.hll_union_agg("sk").alias("sk"), F.sum("n_events").alias("n_events")
    ).select(
        F.lit("ALL").alias("event_type"),
        F.hll_sketch_estimate("sk").cast("bigint").alias("approx_users"),
        F.col("n_events").cast("bigint").alias("n_events"),
    )
    return typed.unionByName(merged)


# ---------------------- native recursive CTE (Spark 4 UnionLoop)


# The SAME ANSI text runs on both engines: a linked-list walk over each
# customer's date-ordered order chain. The successor relation is
# precomputed with LEAD (one window over custkey), so the recursion is
# LINEAR — total recursive rows == |orders|, depth == max orders per
# customer — the shape that keeps native recursion safe at any scale
# (an unconstrained graph recursion under UNION ALL semantics diverges
# on cycles; Spark 4 rejects UNION inside recursive CTEs).
_ORDER_CHAIN_SQL = """
    WITH RECURSIVE edges AS (
      SELECT o_orderkey,
             LEAD(o_orderkey) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey)
               AS next_key,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ),
    walk(o_orderkey, next_key, depth) AS (
      SELECT o_orderkey, next_key, 1 FROM edges WHERE rn = 1
      UNION ALL
      SELECT e.o_orderkey, e.next_key, w.depth + 1
      FROM walk w JOIN edges e ON e.o_orderkey = w.next_key
    )
    SELECT depth,
           COUNT(*) AS n_customers,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum
    FROM walk
    GROUP BY depth
    ORDER BY depth
"""


@register(
    "order_chain_recursive_cte",
    tags=("graph", "iterative", "sql"),
    oracle=_ORDER_CHAIN_SQL,
)
def order_chain_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order-chain walk through Spark 4's NATIVE recursive
    CTE (``WITH RECURSIVE`` -> UnionLoop execution): depth d counts the
    customers with at least d orders, with an exact key checksum per
    depth. The identical SQL string is the DuckDB oracle, pinning the
    recursive-CTE semantics cross-engine — the engine's unrolled-CTE
    iteratives (PageRank/BFS) now have a native-recursion counterpart.

    Scale (100 TB): the successor edge is ONE window over
    hashpartitioning(o_custkey); the recursion is linear (each row has
    at most one successor), so total recursive work is |orders| rows
    across max-chain-length iterations, each iteration an equi-join of
    the live frontier against the edge relation. Guard rails for
    deeper data: ``spark.sql.cteRecursionLevelLimit`` (default 100
    levels) and ``spark.sql.cteRecursionRowLimit`` (default 1e6 rows)
    — raise both knobs for clusters where customers exceed 100 orders
    or chains exceed the row budget; the depth census output stays
    |max-depth| rows regardless.

    Reference parity: none possible — the reference's two-phase
    map/reduce cannot iterate at all (SURVEY.md section 3); this is
    the declarative end of the committed iterative family.
    """
    from ..sources import register_views

    register_views(spark, sf_dir, "orders")
    return spark.sql(_ORDER_CHAIN_SQL)


# -------------------------------------- weighted single-source paths

SSSP_ROUNDS = 4

# Co-order multiplicity -> integer edge length: frequently co-ordered
# parts are "close". Shared literal between the Spark plan and the
# oracle so neither engine re-derives it.
_SSSP_WEIGHT_SQL = "CASE WHEN m >= 3 THEN 1 WHEN m = 2 THEN 5 ELSE 10 END"


def _sssp_oracle() -> str:
    sql = f"""
    WITH ppo AS MATERIALIZED (
      SELECT DISTINCT a.l_orderkey, a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey < b.l_partkey
    ),
    pc AS MATERIALIZED (SELECT u, v, COUNT(*) AS m FROM ppo GROUP BY u, v),
    wts AS MATERIALIZED (SELECT u, v, {_SSSP_WEIGHT_SQL} AS w FROM pc),
    sym AS MATERIALIZED (SELECT u AS src, v AS dst, w FROM wts
            UNION ALL SELECT v, u, w FROM wts),
    d0 AS MATERIALIZED (SELECT MIN(u) AS node, 0 AS dist FROM wts)"""
    for i in range(1, SSSP_ROUNDS + 1):
        sql += f""",
    d{i} AS MATERIALIZED (
      SELECT node, MIN(dist) AS dist FROM (
        SELECT node, dist FROM d{i - 1}
        UNION ALL
        SELECT s.dst AS node, d.dist + s.w AS dist
        FROM sym s JOIN d{i - 1} d ON s.src = d.node
      ) GROUP BY node
    )"""
    sql += "\n" + "\n    UNION ALL ".join(
        f"SELECT {i} AS hop, COUNT(*) AS n_reached, "
        f"CAST(SUM(dist) AS BIGINT) AS sum_dist, "
        f"CAST(MAX(dist) AS BIGINT) AS max_dist FROM d{i}"
        for i in range(SSSP_ROUNDS + 1)
    )
    return sql


@register(
    "sssp_weighted_coorder",
    tags=("graph", "iterative", "join"),
    oracle=_sssp_oracle(),
)
def sssp_weighted_coorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source shortest paths (Bellman-Ford) over the
    part co-order graph, edge length from co-order multiplicity
    (tighter ties are shorter), {rounds} relaxation rounds from the
    lowest-numbered part; census per round = (nodes reached, exact
    total and max distance). Where BFS (bfs_hops_part_coorder) counts
    hops, this relaxes WEIGHTED distances — a node's dist can keep
    falling after first discovery through a cheaper longer route.

    Determinism: weights and distances are integers; each round's
    relation is an exact per-node MIN, so the census is order-free.

    Scale (100 TB): textbook distributed Bellman-Ford. The weighted
    edge relation derives from the SAME persisted multiplicity
    aggregation as the triangle/BFS kernels (one pair-stream shuffle
    for the whole family); each round is ONE equi-join of the current
    distance vector against the edges plus ONE min-agg — cost tracks
    |edges touched by the frontier|, never |V|^2. AQE broadcasts the
    early (tiny) distance vectors automatically, the billion-node-safe
    default (same rationale as the PageRank hop join). Each round
    localCheckpoints the distance vector (the dedup_clusters
    discipline), so census branches read materialized rounds instead
    of re-deriving the whole relaxation chain.

    Reference parity: none (the reference cannot iterate); committed
    graph family, SURVEY.md section 2.B.
    """.format(rounds=SSSP_ROUNDS)
    from .mining_graph import coorder_pair_counts

    counts = coorder_pair_counts(spark, sf_dir)
    wts = counts.select(
        "u",
        "v",
        F.when(F.col("m") >= 3, 1)
        .when(F.col("m") == 2, 5)
        .otherwise(10)
        .cast("bigint")
        .alias("w"),
    )
    sym = scoped_persist(
        ("sssp.sym", sf_dir),
        wts.select(F.col("u").alias("src"), F.col("v").alias("dst"), "w").unionByName(
            wts.select(F.col("v").alias("src"), F.col("u").alias("dst"), "w")
        ),
    )
    dist = wts.agg(F.min("u").alias("node")).select(
        "node", F.lit(0).cast("bigint").alias("dist")
    )

    def census(d: DataFrame, hop: int) -> DataFrame:
        return d.agg(
            F.lit(hop).alias("hop"),
            F.count(F.lit(1)).alias("n_reached"),
            F.sum("dist").alias("sum_dist"),
            F.max("dist").alias("max_dist"),
        )

    out = census(dist, 0)
    for i in range(1, SSSP_ROUNDS + 1):
        cand = sym.join(dist, sym.src == dist.node).select(
            F.col("dst").alias("node"), (F.col("dist") + F.col("w")).alias("dist")
        )
        dist = (
            dist.unionByName(cand).groupBy("node").agg(F.min("dist").alias("dist"))
        )
        # Truncate lineage every round (the dedup_clusters discipline):
        # each round's vector feeds BOTH the census branch and the next
        # relaxation, so without the checkpoint the unrolled plan embeds
        # round i-1's whole chain once per consumer — quadratic
        # recomputation that measured 67s at sf0.01; checkpointed, each
        # round is one join+agg over the persisted edges (13s).
        dist = dist.transform(truncate_plan)
        out = out.unionByName(census(dist, i))
    return out


# ------------------------------------------- degree power-law fit

POWERLAW_DMIN = 2


@register(
    "coorder_degree_powerlaw",
    tags=("graph", "stats", "agg"),
    oracle=f"""
    WITH pairs AS MATERIALIZED (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey < b.l_partkey
    ),
    deg AS MATERIALIZED (
      SELECT node, COUNT(*) AS d FROM (
        SELECT u AS node FROM pairs UNION ALL SELECT v AS node FROM pairs
      ) GROUP BY node
    ),
    tail AS MATERIALIZED (
      SELECT d,
             CAST(ROUND(1000000 * ln(CAST(d AS DOUBLE)
                                     / {POWERLAW_DMIN - 0.5})) AS BIGINT) AS lnq
      FROM deg WHERE d >= {POWERLAW_DMIN}
    )
    SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM pairs) AS BIGINT) AS n_edges,
           CAST(COUNT(*) AS BIGINT) AS n_tail,
           CAST(MAX(d) AS BIGINT) AS max_degree,
           CAST(SUM(lnq) AS BIGINT) AS sum_ln_micro,
           CAST(ROUND(1000 * (1.0 + COUNT(*) * 1000000.0 / SUM(lnq)))
                AS BIGINT) AS alpha_milli
    FROM tail
    """,
)
def coorder_degree_powerlaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-MLE power-law fit of the part co-order graph's degree
    distribution (Clauset-Shalizi-Newman estimator with the standard
    half-integer correction): alpha = 1 + n / sum(ln(d / (dmin - 1/2)))
    over nodes with degree >= dmin = {dmin}. One scalar audit row —
    node/edge counts, max degree, and alpha in milli-units — the
    heavy-tail check run before choosing skew mitigations (a fitted
    alpha near 2 means a few hub parts dominate the join fan-out and
    the salting path in operators/skew.py is worth its cost).

    Determinism: degrees are exact integers; each node's log term is
    quantized to integer micro-nats before the bigint sum (same
    argument as PageRank's micro-units above); alpha is one division
    of exact integers, rounded once to milli-units. dmin - 1/2 = {half}
    is exactly representable in binary, so both engines divide the
    same doubles.

    Scale (100 TB): reuses the scope-persisted distinct edge relation
    (queries/mining.py coorder_pairs — built array-side per order, no
    lineitem self-join shuffle); degrees are ONE partial+final agg on
    the node key; the fit itself is a second agg to a single row. No
    sort, no window, nothing driver-side.
    """.format(dmin=POWERLAW_DMIN, half=POWERLAW_DMIN - 0.5)
    from .mining_graph import coorder_pairs

    pairs = coorder_pairs(spark, sf_dir)
    nodes = pairs.select(F.col("u").alias("node")).unionAll(
        pairs.select(F.col("v").alias("node"))
    )
    deg = scoped_persist(
        ("coorder_degrees", sf_dir),
        nodes.groupBy("node").agg(F.count(F.lit(1)).alias("d")),
    )
    tail = deg.where(F.col("d") >= POWERLAW_DMIN).select(
        "d",
        F.round(
            1_000_000
            * F.log(F.col("d").cast("double") / (POWERLAW_DMIN - 0.5))
        )
        .cast("bigint")
        .alias("lnq"),
    )
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    n_edges = pairs.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        tail.agg(
            F.count(F.lit(1)).alias("n_tail"),
            F.max("d").cast("bigint").alias("max_degree"),
            F.sum("lnq").cast("bigint").alias("sum_ln_micro"),
            F.round(
                1000
                * (
                    F.lit(1.0)
                    + F.count(F.lit(1)) * F.lit(1_000_000.0) / F.sum("lnq")
                )
            )
            .cast("bigint")
            .alias("alpha_milli"),
        )
        .crossJoin(F.broadcast(n_nodes))
        .crossJoin(F.broadcast(n_edges))
        .select(
            F.col("n_nodes").cast("bigint").alias("n_nodes"),
            F.col("n_edges").cast("bigint").alias("n_edges"),
            "n_tail",
            "max_degree",
            "sum_ln_micro",
            "alpha_milli",
        )
    )


# -------------------------------------- label propagation communities

LPA_ITERS = 2
LPA_TOPK = 25

_LPA_PAIRS_SQL = """
    pairs AS MATERIALIZED (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey < b.l_partkey
    ),
    sym AS MATERIALIZED (
      SELECT u AS src, v AS dst FROM pairs
      UNION ALL SELECT v, u FROM pairs
    ),
    nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM sym),
    l0 AS MATERIALIZED (SELECT node, node AS lbl FROM nodes)
"""


def _lpa_oracle() -> str:
    sql = "WITH " + _LPA_PAIRS_SQL
    for i in range(1, LPA_ITERS + 1):
        sql += f""",
    c{i} AS MATERIALIZED (
      SELECT s.src AS node, l.lbl, COUNT(*) AS cnt
      FROM sym s JOIN l{i - 1} l ON s.dst = l.node
      GROUP BY 1, 2
    ),
    l{i} AS MATERIALIZED (
      SELECT node, lbl FROM (
        SELECT node, lbl,
               ROW_NUMBER() OVER (PARTITION BY node
                                  ORDER BY cnt DESC, lbl) AS rk
        FROM c{i}) WHERE rk = 1
    )"""
    sql += f"""
    SELECT lbl AS community, COUNT(*) AS n_nodes,
           CAST(SUM(node) AS BIGINT) AS sum_node
    FROM l{LPA_ITERS}
    GROUP BY 1
    ORDER BY n_nodes DESC, community
    LIMIT {LPA_TOPK}
    """
    return sql


@register(
    "lpa_communities_coorder",
    tags=("graph", "join", "iterative"),
    oracle=_lpa_oracle(),
)
def lpa_communities_coorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation communities over the part
    co-order graph (Raghavan et al. 2007), {iters} unrolled
    iterations: every node starts as its own label and repeatedly
    adopts the most frequent label among its neighbors — the
    clustering primitive between connected components (pure
    reachability) and modularity methods. Output: the {k} largest
    communities with an integer membership checksum.

    Determinism: synchronous updates (no update-order dependence) and
    an exact tie-break — most frequent label, then SMALLEST — make
    every iteration a pure function of the edge set, so the unrolled
    DuckDB CTEs replay it value-for-value.

    Scale (100 TB): each iteration is ONE equi-join of the persisted
    symmetric edge list against the |V|-row label relation, a
    (node, label) partial+final count, and a per-node running top-1
    (WindowGroupLimit — never a full per-node sort). Cost per
    iteration tracks |E|, the label relations persist per hop, and the
    fixed unroll keeps the plan static — the same discipline as the
    BFS/SSSP/PageRank family sharing this edge relation.

    Reference parity: none (the reference has no join operator);
    committed graph family, SURVEY.md section 2.B.
    """.format(iters=LPA_ITERS, k=LPA_TOPK)
    from .mining_graph import coorder_pairs

    pairs = coorder_pairs(spark, sf_dir)
    sym = scoped_persist(
        ("lpa.sym", sf_dir),
        pairs.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionByName(
            pairs.select(F.col("v").alias("src"), F.col("u").alias("dst"))
        ),
    )
    labels = sym.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    w = Window.partitionBy("node").orderBy(F.col("cnt").desc(), "lbl")
    for i in range(1, LPA_ITERS + 1):
        counts = (
            sym.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"), "lbl")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        labels = scoped_persist(
            (f"lpa.l{i}", sf_dir),
            counts.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .select("node", "lbl"),
        )
    return (
        labels.groupBy(F.col("lbl").alias("community"))
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("node").cast("bigint").alias("sum_node"),
        )
        .orderBy(F.col("n_nodes").desc(), "community")
        .limit(LPA_TOPK)
    )


# ------------------------------------ k-core peeling (graph cohesion)

KCORE_K = 100
KCORE_ROUNDS = 4

_KCORE_PAIRS_SQL = """
    pairs AS MATERIALIZED (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey < b.l_partkey
    ),
    e0 AS MATERIALIZED (
      SELECT u AS src, v AS dst FROM pairs
      UNION ALL SELECT v, u FROM pairs
    )
"""


def _kcore_oracle() -> str:
    sql = "WITH " + _KCORE_PAIRS_SQL
    for i in range(1, KCORE_ROUNDS + 1):
        sql += f""",
    d{i} AS MATERIALIZED (SELECT src AS node, COUNT(*) AS deg FROM e{i - 1} GROUP BY 1),
    k{i} AS MATERIALIZED (SELECT node FROM d{i} WHERE deg >= {KCORE_K}),
    e{i} AS MATERIALIZED (
      SELECT s.src, s.dst FROM e{i - 1} s
      JOIN k{i} a ON s.src = a.node
      JOIN k{i} b ON s.dst = b.node
    )"""
    sql += "\n" + "\n    UNION ALL ".join(
        f"SELECT {i} AS round, "
        f"(SELECT COUNT(*) FROM k{i}) AS n_nodes, "
        f"(SELECT COUNT(*) // 2 FROM e{i}) AS n_edges, "
        f"(SELECT CAST(COALESCE(SUM(node), 0) AS BIGINT) FROM k{i}) "
        f"AS sum_node"
        for i in range(1, KCORE_ROUNDS + 1)
    )
    return sql


@register(
    "kcore_peel_coorder",
    tags=("graph", "join", "iterative"),
    oracle=_kcore_oracle(),
)
def kcore_peel_coorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{k}-core peeling over the part co-order graph: repeatedly drop
    nodes with fewer than {k} surviving neighbors ({r} unrolled
    rounds) — the graph-cohesion primitive (dense-subgraph extraction,
    spam/bot ring detection, community cores) complementing reach
    (BFS/CC), centrality (PageRank/HITS), clustering (LPA), and local
    density (triangles) in the shared co-order family. Census per
    round: surviving nodes, surviving undirected edges, membership
    checksum — the trajectory either stabilizes (a true {k}-core) or
    collapses to empty, both meaningful.

    Determinism: peeling is a pure function of the edge set (no
    tie-breaks needed — the degree threshold keeps or drops every node
    independently), so the unrolled CTEs replay it exactly.

    Scale (100 TB): each round is one degree aggregation (partial agg
    on the node key) plus one edge semi-filter via two equi-joins on
    the shrinking survivor set (AQE broadcasts it as it shrinks) —
    cost tracks surviving edges, monotonically non-increasing; the
    per-round localCheckpoint truncates lineage exactly like the
    BFS/SSSP siblings sharing this edge relation.
    """.format(k=KCORE_K, r=KCORE_ROUNDS)
    from .mining_graph import coorder_pairs

    pairs = coorder_pairs(spark, sf_dir)
    edges = scoped_persist(
        ("kcore.e0", sf_dir),
        pairs.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionByName(
            pairs.select(F.col("v").alias("src"), F.col("u").alias("dst"))
        ),
    )
    censuses = []
    for i in range(1, KCORE_ROUNDS + 1):
        # localCheckpoint, not scoped_persist: each round's survivor set
        # feeds THREE consumers (both join sides + the census) and the
        # edge relation two, so a cached-but-unbroken LOGICAL plan
        # doubles in size every round — Catalyst's cache matching and
        # re-analysis over those exponentially nested trees cost ~30s
        # of pure driver time per invocation at sf0.01 (measured 54s
        # cold / 31s warm; checkpointed: ~3s). The checkpoint truncates
        # the logical plan to an RDD scan, same discipline as
        # dedup_clusters.
        keep = (
            edges.groupBy(F.col("src").alias("node"))
            .agg(F.count(F.lit(1)).alias("deg"))
            .where(F.col("deg") >= KCORE_K)
            .select("node")
            .transform(truncate_plan)
        )
        edges = (
            edges.join(keep.withColumnRenamed("node", "src"), "src")
            .join(keep.withColumnRenamed("node", "dst"), "dst")
            .transform(truncate_plan)
        )
        n_nodes = keep.agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.coalesce(F.sum("node"), F.lit(0)).cast("long").alias("sum_node"),
        )
        n_edges = edges.agg(
            (F.count(F.lit(1)) / 2).cast("long").alias("n_edges")
        )
        censuses.append(
            n_nodes.crossJoin(n_edges).select(
                F.lit(i).cast("long").alias("round"),
                "n_nodes",
                "n_edges",
                "sum_node",
            )
        )
    out = censuses[0]
    for c in censuses[1:]:
        out = out.unionByName(c)
    return out
