"""Extended TPC-H-style suite over the driver star schema.

The reference framework has no relational operators at all (SURVEY.md
section 2.B — its programs are word count and grep,
``tests/testdata/exec/wc_map.py``, ``grep_map.py``); these queries
complete the warehouse surface the north star commits to: EXISTS
rewrites, multi-dim join chains, market-share ratios, distribution
(count-of-counts) queries, disjunctive pushdown, scalar subqueries,
multiset set ops, grouping sets, and decimal-exact statistical moments.

Hash-stability rules (package-wide): every money/quantity aggregate is
an exact DECIMAL(18,2+) sum cast to double at the end; every ratio is
computed double/double with the SAME expression shape in the Spark code
and the oracle SQL (IEEE 754 ops on identical inputs are deterministic
across engines); every top-k carries a unique tie-break key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import dec, dsum, dsum_expr
from ..registry import register
from ..sources import load_table, load_tables, register_views

_DEC = "CAST({c} AS DECIMAL(18,2))"


def _d(c: str) -> str:
    return _DEC.format(c=c)


_REV = f"{_d('l_extendedprice')} * (1 - {_d('l_discount')})"


def _rev() -> F.Column:
    return dec("l_extendedprice") * (1 - dec("l_discount"))


# ------------------------------------------------------------ TPC-H Q4


@register(
    "q4_order_priority",
    tags=("join", "subquery", "agg"),
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style priority check: orders of one year having at least
    one lineitem shipped more than 60 days after the order date,
    counted per priority (EXISTS -> left-semi join on the order key).

    Scale: the date predicate pushes to the orders scan; lineitem is
    projected to (l_orderkey, l_shipdate) before the shuffle; the semi
    join keeps at most one match per order so no fan-out crosses the
    exchange. At 100 TB both sides shuffle once on l_orderkey.
    """
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    o = t["orders"].filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = t["lineitem"].select("l_orderkey", "l_shipdate")
    matched = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return matched.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


# ------------------------------------------------------------ TPC-H Q7


@register(
    "q7_nation_volume",
    bench=True,
    tags=("join", "agg", "date"),
    oracle=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           EXTRACT(YEAR FROM l_shipdate) AS ship_year,
           CAST(SUM({_REV}) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE n1.n_nationkey <> n2.n_nationkey
      AND n1.n_nationkey < 4 AND n2.n_nationkey < 4
    GROUP BY 1, 2, 3
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style cross-nation shipping volume: revenue between
    distinct (supplier nation, customer nation) pairs per ship year,
    restricted to a 4-nation subset (Q7 uses a 2-nation pair).

    Scale: supplier/customer/nation are broadcast dims — the only real
    shuffle is lineitem-orders on the order key. The nation-subset
    filters push through the broadcast joins to the dim scans, and AQE
    would skew-split any hot order partition. Five joins, ONE exchange.
    """
    t = load_tables(spark, sf_dir, "lineitem", "supplier", "orders", "customer", "nation")
    n1 = t["nation"].filter(F.col("n_nationkey") < 4).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].filter(F.col("n_nationkey") < 4).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("s_nationkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("c_nationkey"))
        .filter(F.col("n1_key") != F.col("n2_key"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("ship_year"),
        )
        .agg(dsum_expr(_rev(), "revenue"))
    )


# ------------------------------------------------------------ TPC-H Q8


@register(
    "q8_market_share",
    tags=("join", "agg", "ratio"),
    oracle=f"""
    WITH base AS (
      SELECT EXTRACT(YEAR FROM o_orderdate) AS order_year,
             CAST({_REV} AS DECIMAL(18,4)) AS volume,
             n1.n_regionkey AS supp_region
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n1 ON n1.n_nationkey = s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c_nationkey
      WHERE n2.n_regionkey = 2
    )
    SELECT order_year,
           CAST(SUM(CASE WHEN supp_region = 2 THEN volume ELSE 0 END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM base
    GROUP BY order_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style market share: among orders from ASIA customers
    (regionkey 2), the fraction of revenue supplied from within ASIA,
    per order year.

    Scale: the ratio is a conditional aggregate over ONE join tree —
    never two scans diffed. Both the numerator and denominator are
    exact decimal sums; the division is the only double op and has the
    same shape in both engines. Dims broadcast; one fact-fact shuffle.
    """
    t = load_tables(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation"
    )
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("supp_region")
    )
    n2 = t["nation"].filter(F.col("n_regionkey") == 2).select(
        F.col("n_nationkey").alias("n2_key")
    )
    vol = dec("l_extendedprice") * (1 - dec("l_discount"))
    base = (
        t["lineitem"]
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("c_nationkey"), "inner")
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("s_nationkey"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("order_year"),
            vol.cast("decimal(18,4)").alias("volume"),
            "supp_region",
        )
    )
    return base.groupBy("order_year").agg(
        (
            F.sum(F.when(F.col("supp_region") == 2, F.col("volume")).otherwise(F.lit(0)))
            .cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


# ----------------------------------------------------------- TPC-H Q10


@register(
    "q10_returned_items",
    bench=True,
    tags=("join", "agg", "topk"),
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM({_REV}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-07-01'
      AND l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style returned-item report: customers ranked by revenue
    lost to returns ('R' flag) for orders in one half-year.

    Scale: l_returnflag and the o_orderdate window both push to the
    parquet scans; customer and nation broadcast; the single exchange is
    lineitem-orders. Top-k is TakeOrdered (no global sort), custkey
    tie-break keeps it deterministic.
    """
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    o = t["orders"].filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    li = t["lineitem"].filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum_expr(_rev(), "revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ----------------------------------------------------------- TPC-H Q13


@register(
    "q13_order_distribution",
    tags=("join", "agg"),
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON o_custkey = c_custkey
                      AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style customer order-count distribution (how many
    customers placed N non-urgent orders, including zero).

    Scale: the classic count-of-counts double aggregate. First agg
    shuffles on c_custkey (high cardinality, well spread); second agg's
    key (the count) is tiny and skewed by design — Spark's partial
    aggregation collapses it map-side, so the skew never hits the wire.
    The join predicate's filter lives in the join condition (not WHERE)
    to preserve left-join zero rows; Catalyst still pushes it to the
    orders scan.
    """
    t = load_tables(spark, sf_dir, "customer", "orders")
    o = t["orders"].filter(F.col("o_orderpriority") != "1-URGENT").select(
        "o_custkey", "o_orderkey"
    )
    per_cust = (
        t["customer"]
        .select("c_custkey")
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ----------------------------------------------------------- TPC-H Q14


@register(
    "q14_promo_revenue",
    tags=("join", "agg", "ratio"),
    oracle=f"""
    SELECT CAST(100.0 AS DOUBLE)
             * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV} ELSE 0 END) AS DOUBLE)
             / CAST(SUM({_REV}) AS DOUBLE) AS promo_pct
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style promotion revenue share: percent of one month's
    revenue from PROMO-type parts.

    Scale: single broadcast join (part is a dim), conditional decimal
    aggregate, scalar output — the shipdate window prunes the lineitem
    scan. Division shape mirrors the oracle exactly: 100.0 * promo /
    total, all three doubles derived from exact decimal sums.
    """
    t = load_tables(spark, sf_dir, "lineitem", "part")
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= "1997-03-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    rev = _rev()
    return (
        li.join(F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)))
                .cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_pct")
        )
    )


# ----------------------------------------------------------- TPC-H Q16


@register(
    "q16_supplier_variety",
    tags=("join", "agg", "distinct"),
    oracle="""
    SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 9, 17, 25, 33, 41, 49)
    GROUP BY p_brand, p_type
    """,
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style supplier variety: distinct suppliers shipping
    each (brand, type) combination, excluding one brand and off-list
    sizes. (The reference schema has no partsupp table; lineitem's
    supplier column carries the same relationship.)

    Scale: COUNT(DISTINCT) over a joined fact — Spark plans the classic
    two-shuffle expand-distinct (partial distinct on (group, suppkey),
    then final count); the dim filters broadcast-prune the probe before
    either shuffle.
    """
    t = load_tables(spark, sf_dir, "lineitem", "part")
    p = t["part"].filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 9, 17, 25, 33, 41, 49)
    )
    return (
        t["lineitem"]
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ----------------------------------------------------------- TPC-H Q19


@register(
    "q19_disjunctive_revenue",
    tags=("join", "agg", "predicate"),
    oracle=f"""
    SELECT CAST(SUM({_REV}) AS DOUBLE) AS revenue, COUNT(*) AS n
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#12' AND p_size BETWEEN 10 AND 30
           AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#20' AND p_size BETWEEN 20 AND 50
           AND l_quantity >= 20 AND l_quantity <= 40)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style disjunctive predicate join: three OR'd
    brand/size/quantity clause groups across the join boundary.

    Scale: Catalyst extracts the common conjuncts per side — the brand
    IN-list and size range push to the part scan, the quantity envelope
    (1..40) pushes to lineitem — before evaluating the full disjunction
    post-join. This is the query class where predicate extraction
    matters most at 100 TB; expressing it declaratively gets it free.
    """
    t = load_tables(spark, sf_dir, "lineitem", "part")
    li, p = t["lineitem"], t["part"]
    joined = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#3") & s.between(1, 15) & (q >= 1) & (q <= 20))
        | ((b == "Brand#12") & s.between(10, 30) & (q >= 10) & (q <= 30))
        | ((b == "Brand#20") & s.between(20, 50) & (q >= 20) & (q <= 40))
    )
    return joined.filter(cond).agg(
        dsum_expr(_rev(), "revenue"), F.count(F.lit(1)).alias("n")
    )


# ----------------------------------------------------------- TPC-H Q22


@register(
    "q22_idle_customers",
    tags=("join", "subquery", "agg"),
    oracle=f"""
    WITH avg_bal AS (
      SELECT CAST(SUM({_d('c_acctbal')}) AS DOUBLE) / COUNT(*) AS a
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_mktsegment,
           COUNT(*) AS numcust,
           CAST(SUM({_d('c_acctbal')}) AS DOUBLE) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > a
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY c_mktsegment
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style global-sales-opportunity: customers with
    above-average positive balance and no recent (1999+) order, rolled
    up by market segment (scalar subquery + anti join).

    Scale: the scalar average is a one-row broadcast; the anti join
    projects orders to its key column before the shuffle. The average
    is decimal-exact then double, so the > comparison is bit-identical
    in both engines.
    """
    t = load_tables(spark, sf_dir, "customer", "orders")
    cust = t["customer"]
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("a")
    )
    okeys = (
        t["orders"]
        .filter(F.col("o_orderdate") >= "1999-01-01")
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(okeys, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("numcust"), dsum("c_acctbal", "totacctbal"))
    )


# ----------------------------------------------- multiset set operations


@register(
    "set_ops_multiset",
    tags=("setop",),
    oracle="""
    SELECT 'both' AS op, custkey FROM (
      SELECT o_custkey AS custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      INTERSECT ALL
      SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    )
    UNION ALL
    SELECT 'only_1996' AS op, custkey FROM (
      SELECT o_custkey AS custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      EXCEPT ALL
      SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    )
    """,
)
def set_ops_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (bag) set operations: INTERSECT ALL / EXCEPT ALL over
    per-year customer order lists — duplicate counts carry through,
    unlike the distinct variants in ``set_ops_custkeys``.

    Scale: Spark plans both as a single shuffle on the value with
    per-key count bookkeeping (no row explosion); the year windows push
    to the orders scan.
    """
    orders = load_table(spark, sf_dir, "orders")

    def year_keys(y0: str, y1: str) -> DataFrame:
        return orders.filter(
            (F.col("o_orderdate") >= y0) & (F.col("o_orderdate") < y1)
        ).select(F.col("o_custkey").alias("custkey"))

    k96 = year_keys("1996-01-01", "1997-01-01")
    k97 = year_keys("1997-01-01", "1998-01-01")
    both = k96.intersectAll(k97).select(F.lit("both").alias("op"), "custkey")
    only96 = k96.exceptAll(k97).select(F.lit("only_1996").alias("op"), "custkey")
    return both.unionByName(only96)


# ------------------------------------------------------- grouping sets


@register(
    "grouping_sets_revenue",
    tags=("agg", "rollup", "sql"),
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) AS g_rf,
           GROUPING(l_linestatus) AS g_ls,
           CAST(SUM({_REV}) AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (finer than rollup/cube: a chosen set
    list) with GROUPING() null-vs-group disambiguators, through the SQL
    entry point — the DataFrame API has no grouping-sets primitive, so
    the engine's SQL surface carries it.

    Scale: identical to cube/rollup — map-side expand per grouping set,
    partial agg before the single shuffle; output is the sum of the
    tiny per-set cardinalities.
    """
    register_views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS BIGINT)  AS g_rf,
               CAST(GROUPING(l_linestatus) AS BIGINT)  AS g_ls,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                 AS revenue,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


# ------------------------------------------ decimal-exact moment stats


@register(
    "stats_quantity_price",
    tags=("agg", "stats"),
    oracle=f"""
    WITH m AS (
      SELECT COUNT(*) AS n,
             CAST(SUM({_d('l_quantity')}) AS DOUBLE)       AS sx,
             CAST(SUM({_d('l_extendedprice')}) AS DOUBLE)  AS sy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
      FROM lineitem
    )
    SELECT n,
           ROUND(sx / n, 6) AS mean_qty,
           ROUND(sy / n, 6) AS mean_price,
           ROUND((sxx - sx * sx / n) / (n - 1), 2) AS var_qty,
           ROUND((syy - sy * sy / n) / (n - 1), 2) AS var_price,
           ROUND((sxy - sx * sy / n) / (n - 1), 2) + 0 AS covar,
           ROUND((sxy - sx * sy / n)
             / (SQRT(sxx - sx * sx / n) * SQRT(syy - sy * sy / n)), 8) + 0
               AS corr_qp
    FROM m
    """,
)
def stats_quantity_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical moments (mean/variance/covariance/correlation of
    quantity vs price) via decimal-exact raw sums, finished in double
    with the identical expression tree in both engines — the built-in
    ``corr``/``var_samp`` use streaming update formulas whose float
    error differs per engine and per partitioning, so a hash-stable
    engine computes moments from exact sums instead.

    Scale: one pass, one scalar output row, partial sums map-side. The
    two-pass textbook formula is unnecessary because the sums are exact
    decimals (no catastrophic cancellation until the final double ops).

    Outputs are rounded at fixed precision because the one remaining
    cross-engine hazard is the decimal->double CAST itself: once a
    squared sum crosses 2^53 (observed at sf0.1: syy ~ 2.2e15), DuckDB
    converts scaled-int128 / 10^scale with TWO roundings and lands
    1 ulp off Spark's correctly-rounded BigDecimal.doubleValue. The
    ulp-level input error perturbs var/covar by ~1e-7 absolute, so
    fixed rounding well above that level (2dp on variances, 8dp on the
    correlation) restores bit-equality through sf1.0 and beyond.
    """
    li = load_table(spark, sf_dir, "lineitem")
    m = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("l_quantity")).cast("double").alias("sx"),
        F.sum(dec("l_extendedprice")).cast("double").alias("sy"),
        F.sum(dec("l_quantity") * dec("l_quantity")).cast("double").alias("sxx"),
        F.sum(dec("l_extendedprice") * dec("l_extendedprice"))
        .cast("double")
        .alias("syy"),
        F.sum(dec("l_quantity") * dec("l_extendedprice")).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return m.select(
        n.alias("n"),
        F.round(sx / n, 6).alias("mean_qty"),
        F.round(sy / n, 6).alias("mean_price"),
        F.round((sxx - sx * sx / n) / (n - 1), 2).alias("var_qty"),
        F.round((syy - sy * sy / n) / (n - 1), 2).alias("var_price"),
        F.round((sxy - sx * sy / n) / (n - 1), 2).alias("covar"),
        F.round(
            (sxy - sx * sy / n)
            / (F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n)),
            8,
        ).alias("corr_qp"),
    )


# ------------------------------------------------------------ histogram


@register(
    "histogram_totalprice",
    tags=("agg",),
    oracle="""
    SELECT CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi
    FROM orders
    GROUP BY 1
    """,
)
def histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals (25k buckets) with per-bin
    min/max — the building block for distribution profiling of a
    100 TB column without any sort.

    Scale: bucket id is computed map-side; the shuffle carries only
    (bucket, partials). min/max of raw doubles are exact (no summation)
    so hash-stable as-is.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.floor(F.col("o_totalprice") / 25000.0).cast("bigint").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


# --------------------------------------------------- nth-value window


@register(
    "second_richest_per_nation",
    tags=("window", "topk"),
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal
    FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    )
    WHERE rn = 2
    """,
)
def second_richest_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group nth element (the second-highest account balance per
    nation) via ROW_NUMBER with a unique tie-break.

    Scale: rank-filter windows with a LIMIT-like rn predicate get
    Spark's window-group-limit pushdown — each partition keeps a
    running top-2 heap instead of fully sorting, so skewed nations
    cost O(n) not O(n log n).
    """
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), "c_custkey"
    )
    return (
        cust.select(
            "c_nationkey", "c_custkey", "c_acctbal", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") == 2)
        .select("c_nationkey", "c_custkey", "c_acctbal")
    )


# ------------------------------------------------------ event funnel


@register(
    "funnel_view_click_purchase",
    bench=True,
    tags=("window", "agg", "events"),
    oracle="""
    WITH v AS (SELECT user_id, MIN(ts) AS v_ts FROM events
               WHERE event_type = 'view' GROUP BY user_id),
         c AS (SELECT e.user_id, MIN(e.ts) AS c_ts FROM events e
               JOIN v ON e.user_id = v.user_id AND e.ts > v.v_ts
               WHERE e.event_type = 'click' GROUP BY e.user_id),
         p AS (SELECT e.user_id, MIN(e.ts) AS p_ts FROM events e
               JOIN c ON e.user_id = c.user_id AND e.ts > c.c_ts
               WHERE e.event_type = 'purchase' GROUP BY e.user_id)
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_view_click,
           (SELECT COUNT(*) FROM p) AS n_view_click_purchase
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel over the event stream: users who
    viewed, then clicked strictly after their first view, then
    purchased strictly after that first qualifying click.

    Scale: ONE shuffle total. The three stage timestamps are chained
    per-user window minima over the same hashpartitioning(user_id)
    exchange (unordered windows only require the partitioning, so the
    three Window nodes share it), the per-user reduction reuses that
    same partitioning (no new exchange), and the final scalar agg is a
    constant-size partial+final. The previous join-per-stage form
    recomputed the events scan for every stage reference (~6 scans);
    this is 1 scan. The event-type IN filter pushes to the parquet
    scan.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_type")
        .filter(F.col("event_type").isin("view", "click", "purchase"))
    )
    w = Window.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "v_ts",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
        )
        .withColumn(
            "c_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("v_ts")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "p_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("c_ts")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    # min of the (constant) per-user window value: an order-insensitive
    # reduction that stays clear of the driver-materialization lint in
    # tests/test_resource_discipline.py.
    per_user = staged.groupBy("user_id").agg(
        F.min("v_ts").alias("v_ts"),
        F.min("c_ts").alias("c_ts"),
        F.min("p_ts").alias("p_ts"),
    )
    return per_user.agg(
        F.sum(F.when(F.col("v_ts").isNotNull(), 1).otherwise(0)).alias("n_view"),
        F.sum(F.when(F.col("c_ts").isNotNull(), 1).otherwise(0)).alias(
            "n_view_click"
        ),
        F.sum(F.when(F.col("p_ts").isNotNull(), 1).otherwise(0)).alias(
            "n_view_click_purchase"
        ),
    )


# ------------------------------------------------- window dedup (latest)


@register(
    "dedup_latest_event",
    tags=("window", "dedup", "events"),
    oracle="""
    SELECT event_id, user_id, event_type, ts, value
    FROM (
      SELECT event_id, user_id, event_type, ts, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    WHERE rn = 1
    """,
)
def dedup_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest dedup: one row per (user, event_type) — the newest by
    timestamp, event_id as the deterministic tie-break. The standard
    CDC/compaction primitive (complements ``dedup_exact``, which keys
    on content).

    Scale: rn=1 window benefits from Spark's window-group-limit
    (running top-1, no per-group sort materialization); shuffle carries
    the full row once. For 100 TB compaction jobs the same plan applies
    per partition-date.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.select(
            "event_id", "user_id", "event_type", "ts", "value",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "ts", "value")
    )


# ----------------------------------------------------------- TPC-H Q15


@register(
    "q15_top_supplier",
    tags=("join", "subquery", "agg"),
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM({_REV}) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style top supplier: the supplier(s) with the maximum
    quarterly revenue — a scalar MAX subquery over a derived view,
    keeping ALL ties (which a LIMIT 1 would drop).

    Scale: the revenue rollup shuffles once on l_suppkey; the scalar
    max is a one-row broadcast back onto the same rollup (AQE reuses
    the exchange rather than recomputing); supplier is a broadcast dim.
    The equality compare is double==double over the SAME exact-decimal
    derivation on both sides, so ties are bit-identical.
    """
    t = load_tables(spark, sf_dir, "supplier", "lineitem")
    rev = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum_expr(_rev(), "total_revenue"))
    )
    max_rev = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ------------------------------------------------- ranking functions


@register(
    "window_rank_suite",
    tags=("window",),
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           RANK()         OVER w AS rnk,
           DENSE_RANK()   OVER w AS drnk,
           PERCENT_RANK() OVER w AS prnk,
           CUME_DIST()    OVER w AS cdist,
           NTILE(4)       OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey
                 ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function family per nation (rank, dense_rank,
    percent_rank, cume_dist, ntile) over account balance with a unique
    tie-break.

    Scale: all five functions share ONE window spec, so Spark computes
    them in a single per-partition sorted pass after one shuffle.
    percent_rank/cume_dist are exact integer-ratio divisions — both
    engines compute (rank-1)/(n-1) and rank_high/n in double from the
    same integers, so the values compare bit-identically.
    """
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), "c_custkey"
    )
    return cust.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
        F.ntile(4).over(w).alias("quartile"),
    )


# ------------------------------------------------- null semantics


@register(
    "null_semantics_events",
    tags=("predicate", "null"),
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_null_value,
           CAST(SUM(CASE WHEN value IS NOT DISTINCT FROM 0.0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_zero_nullsafe,
           CAST(SUM(CASE WHEN COALESCE(value, -1.0) < 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_neg_or_null,
           CAST(SUM(CASE WHEN NULLIF(event_type, 'error') IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_error
    FROM events
    GROUP BY event_type
    """,
)
def null_semantics_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling semantics in one pass: IS NULL, null-safe equality
    (``<=>`` / IS NOT DISTINCT FROM), COALESCE defaulting, NULLIF —
    the SQL three-valued-logic corners every engine must pin down.

    Scale: single partial-agg shuffle on the tiny event_type key; every
    output is an integer count so the compare is exact.
    """
    ev = load_table(spark, sf_dir, "events")

    def cnt(cond, alias):  # noqa: ANN001
        return F.sum(F.when(cond, 1).otherwise(0)).alias(alias)

    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        cnt(F.col("value").isNull(), "n_null_value"),
        cnt(F.col("value").eqNullSafe(F.lit(0.0)), "n_zero_nullsafe"),
        cnt(F.coalesce(F.col("value"), F.lit(-1.0)) < 0, "n_neg_or_null"),
        cnt(F.nullif(F.col("event_type"), F.lit("error")).isNull(), "n_error"),
    )


# ------------------------------------------------------------ TPC-H Q2
# (adapted: the star schema has no partsupp table, so the part-supplier
# offer relation is derived from lineitem — the correlated-min +
# dim-chain SHAPE of Q2 is preserved exactly.)


@register(
    "q2_min_offer_supplier",
    tags=("join", "subquery", "window"),
    oracle=f"""
    WITH offers AS (
      SELECT l_partkey, l_suppkey, MIN({_d('l_extendedprice')}) AS offer
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      JOIN region ON r_regionkey = n_regionkey
      WHERE p_type = 'STANDARD' AND p_size <= 5 AND r_name = 'EUROPE'
      GROUP BY 1, 2
    ),
    best AS (SELECT *, MIN(offer) OVER (PARTITION BY l_partkey) AS best_offer
             FROM offers)
    SELECT b.l_partkey AS p_partkey, p.p_name, s.s_name, n.n_name,
           CAST(b.offer AS DOUBLE) AS min_offer
    FROM best b
    JOIN part p ON p.p_partkey = b.l_partkey
    JOIN supplier s ON s.s_suppkey = b.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE b.offer = b.best_offer
    """,
)
def q2_min_offer_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-style minimum-cost supplier: for each STANDARD small
    part, the European supplier(s) offering the lowest extended price,
    with the correlated "= (SELECT MIN ...)" rewritten as a window min
    (reference has no relational surface; shape per TPC-H spec Q2).

    Exactness: the offer is an exact DECIMAL(18,2) min, so the
    min-equality join cannot float-flake.

    Scale: the offers aggregate shuffles once on (part, supp) — both
    grouping keys, so the window min over part is a narrow re-use of
    the same partitioning; every dim (part subset, supplier, nation,
    region) broadcasts.
    """
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier", "nation", "region")
    p = t["part"].filter((F.col("p_type") == "STANDARD") & (F.col("p_size") <= 5))
    eu_supp = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(t["region"]), F.col("r_regionkey") == F.col("n_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "n_name")
    )
    offers = (
        t["lineitem"]
        .join(F.broadcast(p.select("p_partkey", "p_name")), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(eu_supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("l_partkey", "l_suppkey", "p_name", "s_name", "n_name")
        .agg(F.min(dec("l_extendedprice")).alias("offer"))
    )
    w = Window.partitionBy("l_partkey")
    return (
        offers.withColumn("best_offer", F.min("offer").over(w))
        .filter(F.col("offer") == F.col("best_offer"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "p_name",
            "s_name",
            "n_name",
            F.col("offer").cast("double").alias("min_offer"),
        )
    )


# ------------------------------------------------------------ TPC-H Q9
# (adapted: supply cost = 0.6 * p_retailprice in place of
# ps_supplycost; the profit-decomposition SHAPE of Q9 is preserved.)


@register(
    "q9_nation_profit",
    tags=("join", "agg", "date"),
    oracle=f"""
    SELECT n_name AS nation,
           EXTRACT(YEAR FROM o_orderdate) AS o_year,
           CAST(SUM({_REV}
                    - CAST(0.6 AS DECIMAL(2,1))
                      * ({_d('p_retailprice')} * {_d('l_quantity')}))
                AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def q9_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style product-type profit: per supplier nation and order
    year, profit on widget parts = revenue minus a 0.6 * retail-price
    supply cost (partsupp-free adaptation).

    Exactness: DECIMAL(2,1) literal times DECIMAL products — every term
    exact, one cast to double after the sum.

    Scale: part and supplier/nation broadcast; lineitem-orders is the
    one real shuffle; the widget filter prunes the part broadcast AND
    semi-reduces lineitem through the broadcast join before it.
    """
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier", "nation", "orders")
    p = t["part"].filter(F.col("p_name").like("%widget%")).select(
        "p_partkey", "p_retailprice"
    )
    cost = (
        F.lit("0.6").cast("decimal(2,1)") * (dec("p_retailprice") * dec("l_quantity"))
    )
    return (
        t["lineitem"]
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(dsum_expr(_rev() - cost, "sum_profit"))
    )


# ----------------------------------------------------------- TPC-H Q11
# (adapted: "inventory value" = extended price of lineitems on OPEN
# orders; the scalar-subquery-threshold SHAPE of Q11 is preserved.)


@register(
    "q11_important_parts",
    tags=("agg", "subquery", "having"),
    oracle=f"""
    WITH pv AS (
      SELECT l_partkey, SUM({_d('l_extendedprice')}) AS open_value
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'O'
      GROUP BY 1
    ),
    tot AS (SELECT SUM(open_value) AS total_value FROM pv)
    SELECT l_partkey AS p_partkey, CAST(open_value AS DOUBLE) AS open_value
    FROM pv, tot
    WHERE open_value > CAST(0.001 AS DECIMAL(4,3)) * total_value
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-style important stock: parts whose open-order value
    exceeds 0.1% of the global open-order value — the
    aggregate-vs-global-scalar HAVING shape.

    Exactness: both sides of the threshold comparison are exact
    decimals (DECIMAL(4,3) fraction times an exact sum).

    Scale: one shuffle on l_partkey for the per-part sums; the global
    total is a second pass over the SAME aggregated (tiny) relation,
    broadcast back as a 1-row scalar — never a second fact scan.
    """
    t = load_tables(spark, sf_dir, "lineitem", "orders")
    open_li = t["lineitem"].join(
        t["orders"].filter(F.col("o_orderstatus") == "O").select("o_orderkey"),
        F.col("o_orderkey") == F.col("l_orderkey"),
        "left_semi",
    )
    pv = open_li.groupBy("l_partkey").agg(
        F.sum(dec("l_extendedprice")).alias("open_value")
    )
    tot = pv.agg(F.sum("open_value").alias("total_value"))
    return (
        pv.crossJoin(F.broadcast(tot))
        .filter(
            F.col("open_value")
            > F.lit("0.001").cast("decimal(4,3)") * F.col("total_value")
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("open_value").cast("double").alias("open_value"),
        )
    )


# ----------------------------------------------------------- TPC-H Q12
# (adapted: the schema has no l_shipmode/l_receiptdate, so the category
# axis is the ship-delay bucket; the CASE-counting SHAPE of Q12 — high-
# vs low-priority line counts per category — is preserved.)


@register(
    "q12_delay_priority",
    tags=("agg", "date", "case"),
    oracle="""
    SELECT CASE WHEN l_shipdate <= o_orderdate THEN 'early'
                WHEN l_shipdate <= o_orderdate + INTERVAL 90 DAY THEN 'on-time'
                ELSE 'late' END AS delay_bucket,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    GROUP BY 1
    """,
)
def q12_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style priority split per ship-delay bucket: how many
    high- vs low-priority lineitems shipped early / on time / late.

    Scale: the join shuffles lineitem projected to two columns; the
    3-bucket aggregation is a map-side partial over a 3-key space.
    """
    t = load_tables(spark, sf_dir, "lineitem", "orders")
    joined = t["lineitem"].select("l_orderkey", "l_shipdate").join(
        t["orders"].select("o_orderkey", "o_orderdate", "o_orderpriority"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    bucket = (
        F.when(F.col("l_shipdate") <= F.col("o_orderdate"), "early")
        .when(
            F.col("l_shipdate")
            <= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
            "on-time",
        )
        .otherwise("late")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return joined.groupBy(bucket.alias("delay_bucket")).agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
    )


# ----------------------------------------------------------- TPC-H Q20
# (adapted: "excess supply" = supplier shipped more than 1/8 of a
# part's total shipped quantity; the agg-subquery-driven semi-join
# SHAPE of Q20 is preserved.)


@register(
    "q20_dominant_suppliers",
    tags=("join", "subquery", "semi"),
    oracle=f"""
    WITH ps AS (
      SELECT l_partkey, l_suppkey, SUM({_d('l_quantity')}) AS qty
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'small%'
      GROUP BY 1, 2
    ),
    tot AS (SELECT l_partkey, SUM(qty) AS total_qty FROM ps GROUP BY 1),
    dom AS (SELECT DISTINCT l_suppkey FROM ps JOIN tot USING (l_partkey)
            WHERE qty * 8 > total_qty)
    SELECT s_suppkey, s_name, n_name
    FROM supplier JOIN nation ON n_nationkey = s_nationkey
    WHERE s_suppkey IN (SELECT l_suppkey FROM dom)
    """,
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-style dominant suppliers: suppliers shipping more than
    an eighth of some small-part's total shipped quantity (the 100-
    supplier corpus spreads shares thin; TPC-H's 50% becomes 12.5%) (semi join driven
    by a two-level aggregate subquery).

    Exactness: `8*qty > total` compares exact decimals — no division.

    Scale: one shuffle on (part, supp); the per-part totals reuse the
    same aggregated relation (window-free second groupBy of a relation
    already tiny); the supplier dim is filtered by a broadcast-able
    left-semi join on the dominant-supplier id set.
    """
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    small = t["part"].filter(F.col("p_name").like("small%")).select("p_partkey")
    ps = (
        t["lineitem"]
        .join(F.broadcast(small), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(dec("l_quantity")).alias("qty"))
    )
    tot = ps.groupBy("l_partkey").agg(F.sum("qty").alias("total_qty"))
    dom = (
        ps.join(tot, "l_partkey")
        .filter(F.col("qty") * 8 > F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(dom, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "n_name")
    )


# ----------------------------------------------------------- TPC-H Q21
# (adapted: "late" = shipped more than 60 days after the order date —
# the schema has no receipt/commit dates. Q21's defining shape — the
# EXISTS (another supplier on the order) + NOT EXISTS (another LATE
# supplier) pair — is computed as a single per-order aggregate instead
# of two self-joins: strictly better at scale, identical semantics.)


@register(
    "q21_waiting_suppliers",
    tags=("join", "agg", "exists"),
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                                 THEN l_suppkey END) AS n_late,
             MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                      THEN l_suppkey END) AS late_supp
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      GROUP BY 1
    )
    SELECT s_suppkey, s_name, COUNT(*) AS numwait
    FROM per_order JOIN supplier ON s_suppkey = late_supp
    WHERE n_supp >= 2 AND n_late = 1
    GROUP BY 1, 2
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-style suppliers who kept waiting: per supplier, the
    number of multi-supplier orders where they were the ONLY late
    supplier.

    Q21's textbook form is two correlated self-joins on lineitem
    (EXISTS a second supplier, NOT EXISTS a second late supplier); this
    plans it as one per-order aggregate — one shuffle on the order key
    instead of two extra fact joins, the formulation you want when
    lineitem is 100 TB.
    """
    t = load_tables(spark, sf_dir, "lineitem", "orders", "supplier")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    per_order = (
        t["lineitem"]
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(
            t["orders"].select("o_orderkey", "o_orderdate"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late"),
            F.max(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
        )
    )
    return (
        per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(
            F.broadcast(t["supplier"].select("s_suppkey", "s_name")),
            F.col("s_suppkey") == F.col("late_supp"),
        )
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ----------------------------------------- trending leaderboard

TRENDING_WINDOW_DAYS = 7
TRENDING_TOPK = 5


@register(
    "trending_parts_7d",
    tags=("window", "topk", "datetime", "agg"),
    oracle=f"""
    WITH pd AS (
      SELECT l_partkey,
             CAST(l_shipdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem GROUP BY 1, 2
    ),
    idx AS (
      SELECT l_partkey, d,
             datediff('day', DATE '1992-01-01', d) AS di, cents
      FROM pd
    ),
    trail AS (
      SELECT l_partkey, d,
             CAST(SUM(cents) OVER (PARTITION BY l_partkey ORDER BY di
                     RANGE BETWEEN {TRENDING_WINDOW_DAYS - 1} PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS rev7_cents
      FROM idx
    ),
    ranked AS (
      SELECT d, l_partkey, rev7_cents,
             ROW_NUMBER() OVER (PARTITION BY d
                                ORDER BY rev7_cents DESC, l_partkey) AS rk
      FROM trail
    )
    SELECT d AS day, rk, l_partkey, rev7_cents
    FROM ranked WHERE rk <= {TRENDING_TOPK}
    """,
)
def trending_parts_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending leaderboard: for every ship day, the top-{k} parts by
    trailing-{w}-day revenue — the rolling-window ranking behind every
    "top movers" dashboard, combining a RANGE time frame (per part
    over day indexes, so calendar gaps weigh zero rather than
    stretching the window) with a per-day rank group-limit.

    Determinism: revenue is exact integer cents pre-collapsed per
    (part, day); the RANGE frame is integer day indexes from a fixed
    epoch; ranks tiebreak on partkey.

    Scale (100 TB): the fact stream collapses to the (part, day)
    rollup FIRST (one partial+final agg; key space |parts| x |days|);
    the trailing-sum window partitions per part over that rollup, and
    the per-day top-{k} plans WindowGroupLimit (rank pruning during
    the sort, pinned in tests/test_plans.py) — the full ranked
    relation never materializes.
    """.format(k=TRENDING_TOPK, w=TRENDING_WINDOW_DAYS)
    li = load_table(spark, sf_dir, "lineitem")
    pd_rel = li.groupBy(
        "l_partkey", F.to_date("l_shipdate").alias("d")
    ).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias("cents")
    )
    idx = pd_rel.select(
        "l_partkey",
        "d",
        F.datediff("d", F.lit("1992-01-01").cast("date")).alias("di"),
        "cents",
    )
    wt = (
        Window.partitionBy("l_partkey")
        .orderBy("di")
        .rangeBetween(-(TRENDING_WINDOW_DAYS - 1), Window.currentRow)
    )
    trail = idx.select(
        "l_partkey", "d", F.sum("cents").over(wt).cast("long").alias("rev7_cents")
    )
    wr = Window.partitionBy("d").orderBy(F.col("rev7_cents").desc(), "l_partkey")
    return (
        trail.select(
            F.col("d").alias("day"),
            F.row_number().over(wr).alias("rk"),
            "l_partkey",
            "rev7_cents",
        )
        .where(F.col("rk") <= TRENDING_TOPK)
    )


# ----------------------------------------------------------- TPC-H Q17


@register(
    "q17_small_quantity_revenue",
    tags=("join", "subquery", "agg"),
    oracle=f"""
    WITH li_b AS (
      SELECT l_partkey, l_quantity, l_extendedprice
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#4'
    ), pa AS (
      SELECT l_partkey,
             CAST(SUM({_d('l_quantity')}) AS DOUBLE) / COUNT(*) AS aq
      FROM li_b GROUP BY 1
    )
    SELECT CAST(SUM({_d('l_extendedprice')}) AS DOUBLE) / 7.0 AS avg_yearly
    FROM li_b JOIN pa USING (l_partkey)
    WHERE l_quantity < 0.4 * aq
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style small-quantity-order revenue: average yearly
    revenue lost if orders below 40% of a part's mean quantity were no
    longer taken, over one brand (the correlated scalar subquery
    `l_quantity < 0.4 * (SELECT AVG .. WHERE same part)` decorrelated
    into a per-part aggregate join — the standard Catalyst rewrite,
    done explicitly so both engines run the same shape).

    Scale: the brand dim filter broadcasts FIRST, so the per-part
    average is computed only over the brand's lineitems (TPC-H spec
    semantics — the correlated subquery is per-part, and every
    surviving probe row belongs to the brand) — one shuffle on
    l_partkey for the aggregate, the threshold probe joins on the same
    key and reuses the partitioning. The full-table average never
    computes.

    Determinism: aq is exact-decimal-sum / count (one double
    division), the 0.4 * aq threshold is the same two IEEE ops on both
    engines, and the revenue sum is DECIMAL-exact cast once.
    """
    t = load_tables(spark, sf_dir, "lineitem", "part")
    brand = t["part"].where(F.col("p_brand") == "Brand#4").select("p_partkey")
    li_b = (
        t["lineitem"]
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(F.broadcast(brand), F.col("p_partkey") == F.col("l_partkey"))
        .drop("p_partkey")
    )
    pa = li_b.groupBy("l_partkey").agg(
        (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("aq")
    )
    return (
        li_b.join(pa, "l_partkey")
        .where(F.col("l_quantity") < 0.4 * F.col("aq"))
        .agg((F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0))
             .alias("avg_yearly"))
    )
