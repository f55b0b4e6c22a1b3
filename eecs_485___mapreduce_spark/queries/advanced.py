"""Advanced relational surface: correlated subqueries, CUBE/grouping
sets, pivot, as-of join, and range (interval) join.

None of these exist in the reference (SURVEY.md section 2.B — it has no
joins at all); they complete the engine surface a warehouse user
expects. The as-of and range joins are the two "operators Spark lacks
as a single primitive" — both are expressed as compositions of
built-in ops (union + window; bucketed equi-join + inequality) rather
than UDFs, so Catalyst still prunes/pushes/reorders around them.

Hash-stability follows the package rules: decimal-exact money sums,
integer domains wherever possible, deterministic tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import dec, dsum, dsum_expr
from ..registry import register
from ..sources import load_table, load_tables

_DEC = "CAST({c} AS DECIMAL(18,2))"


def _d(c: str) -> str:
    return _DEC.format(c=c)


# ------------------------------------------------- correlated subquery


@register(
    "correlated_subquery_q17",
    tags=("join", "subquery", "agg"),
    oracle=f"""
    WITH avg_qty AS (
      SELECT l_partkey AS ap_partkey,
             CAST(SUM({_d('l_quantity')}) AS DOUBLE) / COUNT(*) AS avg_q
      FROM lineitem GROUP BY l_partkey
    )
    SELECT p_brand,
           COUNT(*) AS n_small,
           CAST(SUM({_d('l_extendedprice')}) AS DOUBLE) AS small_revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN avg_qty ON ap_partkey = l_partkey
    WHERE l_quantity < 0.9 * avg_q
    GROUP BY p_brand
    """,
)
def correlated_subquery_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style correlated aggregate subquery (lineitems below
    90% of their part's average quantity), decorrelated into a join
    against a per-part aggregate — the rewrite Catalyst itself applies
    to correlated scalar subqueries.

    Scale: both the aggregate and the probe shuffle on l_partkey, so
    AQE plans them as one exchange reused twice; part is a broadcast
    dim. The 0.9*avg threshold compares double-to-double identically in
    both engines (single multiply of an exactly-derived average).
    """
    t = load_tables(spark, sf_dir, "lineitem", "part")
    li = t["lineitem"]
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_q")
    )
    return (
        li.join(avg_qty, li.l_partkey == avg_qty.ap_partkey)
        .filter(F.col("l_quantity") < 0.9 * F.col("avg_q"))
        .join(F.broadcast(t["part"]), li.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_small"),
            dsum("l_extendedprice", "small_revenue"),
        )
    )


@register(
    "exists_high_value_parts",
    tags=("join", "subquery"),
    oracle="""
    SELECT p_partkey, p_name
    FROM part
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_partkey = p_partkey AND l_extendedprice > 90000)
      AND NOT EXISTS (SELECT 1 FROM lineitem
                      WHERE l_partkey = p_partkey AND l_discount > 0.09)
    """,
)
def exists_high_value_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS / NOT EXISTS correlated predicates as semi/anti joins
    (parts with a >90k lineitem but never discounted above 9%).

    Scale: both probe sides are projected to the join key before the
    shuffle; the semi/anti pair shares the lineitem scan.
    """
    t = load_tables(spark, sf_dir, "part", "lineitem")
    li = t["lineitem"]
    high = li.filter(F.col("l_extendedprice") > 90000).select("l_partkey")
    disc = li.filter(F.col("l_discount") > 0.09).select("l_partkey")
    return (
        t["part"]
        .join(high, F.col("p_partkey") == high.l_partkey, "left_semi")
        .join(disc, F.col("p_partkey") == disc.l_partkey, "left_anti")
        .select("p_partkey", "p_name")
    )


# --------------------------------------------------------- cube / pivot


@register(
    "cube_orders",
    tags=("agg", "rollup"),
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM({_d('o_totalprice')}) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 4 grouping sets in one pass.

    Scale: Spark expands the cube map-side and partial-aggregates each
    grouping set before the single shuffle — output cardinality is the
    sum of the tiny per-set cardinalities regardless of input size.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), dsum("o_totalprice", "total")
    )


@register(
    "pivot_status_by_priority",
    tags=("agg", "pivot"),
    oracle=f"""
    SELECT o_orderstatus,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                         THEN {_d('o_totalprice')} END) AS DOUBLE) AS urgent,
           CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH'
                         THEN {_d('o_totalprice')} END) AS DOUBLE) AS high,
           CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM'
                         THEN {_d('o_totalprice')} END) AS DOUBLE) AS medium,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN
                         ('1-URGENT', '2-HIGH', '3-MEDIUM')
                         THEN {_d('o_totalprice')} END) AS DOUBLE) AS other
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot priorities into columns (explicit value list, so the plan
    is a single-pass conditional aggregation — never the two-pass
    distinct-value discovery of an open-ended pivot).

    Scale: identical to any groupBy agg — one shuffle on the tiny
    status key; each pivot column is a conditional partial sum.
    """
    orders = load_table(spark, sf_dir, "orders")
    pri = F.col("o_orderpriority")

    def bucket(cond, alias):  # noqa: ANN001
        return F.sum(F.when(cond, dec("o_totalprice"))).cast("double").alias(alias)

    return orders.groupBy("o_orderstatus").agg(
        bucket(pri == "1-URGENT", "urgent"),
        bucket(pri == "2-HIGH", "high"),
        bucket(pri == "3-MEDIUM", "medium"),
        bucket(~pri.isin("1-URGENT", "2-HIGH", "3-MEDIUM"), "other"),
    )


@register(
    "unpivot_lineitem_measures",
    tags=("agg", "pivot"),
    oracle="""
    WITH m AS (
      SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS val
      FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
    )
    SELECT l_returnflag, measure,
           COUNT(*) AS n,
           CAST(SUM(CAST(val AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM m GROUP BY 1, 2
    """,
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): widen-to-long of the lineitem measures, then a
    per-(flag, measure) rollup — the inverse of pivot_status_by_priority
    and the shape feeding any generic "metric name/value" store.

    Scale: Spark plans unpivot as a single-scan Expand (one output row
    per measure per input row, same operator as cube/rollup) — NOT the
    oracle's 3-scan UNION ALL; one shuffle on the tiny (flag, measure)
    key space with partial aggs doing the heavy lifting map-side.
    """
    li = load_table(spark, sf_dir, "lineitem")
    melted = li.select(
        "l_returnflag", "l_quantity", "l_extendedprice", "l_discount"
    ).unpivot(
        "l_returnflag",
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "val",
    )
    return melted.groupBy("l_returnflag", "measure").agg(
        F.count(F.lit(1)).alias("n"), dsum("val", "total")
    )


# ------------------------------------------------------- as-of join


@register(
    "asof_join_purchase_click",
    bench=True,
    tags=("join", "asof", "window"),
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts, MAX(value) AS click_value
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, ts
    ),
    purchases AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts, p.value,
           c.ts AS click_ts, c.click_value
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts > c.ts
    """,
)
def asof_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent
    *strictly earlier* click (ties on click ts collapsed to max value
    first, so the match is deterministic). Spark has no ASOF JOIN
    primitive; this is the standard union + last-value-over-window
    composition — one shuffle on user_id, no range join, no UDF.

    Scale: the union sorts once per user partition; state per row is
    O(1) (the running last click). This beats the join+filter+argmax
    formulation (which shuffles pairs) and is exactly how as-of joins
    are done on tick data at scale. Skewed users split fine because the
    window is per-user but the running frame never materializes pairs.
    The tie collapse needs no pre-aggregation shuffle: ordering equal-ts
    clicks by value makes ``last()`` pick the max, so the whole operator
    is ONE exchange on user_id.
    """
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("ev_ts"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
        F.lit(0).alias("is_purchase"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("ev_ts"),
        "event_id",
        "value",
        F.lit(None).cast("timestamp").alias("click_ts"),
        F.lit(None).cast("double").alias("click_value"),
        F.lit(1).alias("is_purchase"),
    )
    unioned = clicks.unionByName(purchases)
    # Sort order encodes the strict as-of semantics: purchases BEFORE
    # clicks at equal ts (is_purchase desc), so a same-instant click is
    # outside the purchase's frame (p.ts > c.ts is strict); among the
    # clicks of one instant, value ascending makes last() = max value
    # (the oracle's GROUP BY ... MAX(value) tie collapse).
    w = (
        Window.partitionBy("user_id")
        .orderBy("ev_ts", F.col("is_purchase").desc(), "click_value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.select(
            "event_id",
            "user_id",
            F.col("ev_ts").alias("ts"),
            "value",
            "is_purchase",
            F.last("click_ts", ignorenulls=True).over(w).alias("click_ts"),
            F.last("click_value", ignorenulls=True).over(w).alias("click_value"),
        )
        .filter(F.col("is_purchase") == 1)
        .select("event_id", "user_id", "ts", "value", "click_ts", "click_value")
    )


# ------------------------------------------------------- range join


@register(
    "range_join_click_burst",
    tags=("join", "range", "agg"),
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id, p.ts,
           COUNT(c.ts) AS n_clicks_30m
    FROM p LEFT JOIN c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL 30 MINUTE
     AND c.ts < p.ts
    GROUP BY p.event_id, p.user_id, p.ts
    """,
)
def range_join_click_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: clicks in the 30 minutes before each
    purchase, counted per purchase.

    Expressed as an equi-join on user_id plus the time-interval
    predicate. Scale: the equi key carries the shuffle; within a user
    the inequality filters pairs. For heavy per-user volumes the scale
    refinement is bucketing both sides by time_bucket(30m) and joining
    on (user, bucket) IN (b, b-1) — same results, bounded pair fan-out;
    at the test volumes Catalyst's single equi-join plan is already
    optimal.
    """
    events = load_table(spark, sf_dir, "events")
    p = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    c = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    joined = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("c_ts") < F.col("ts")),
        "left",
    )
    return joined.groupBy("event_id", "user_id", "ts").agg(
        F.count("c_ts").alias("n_clicks_30m")
    )


# ------------------------------------------------- SQL entry point


@register(
    "sql_q6_discount_revenue",
    tags=("agg", "sql"),
    oracle=f"""
    SELECT CAST(SUM({_d('l_extendedprice')} * {_d('l_discount')}) AS DOUBLE)
               AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.02 AND 0.04
      AND l_quantity < 25
    """,
)
def sql_q6_discount_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style forecast-revenue query, expressed through the
    engine's SQL entry point (``register_views`` + ``spark.sql``) —
    proving the surface is reachable from ANSI SQL, not only the
    DataFrame API. Catalyst produces the identical plan either way:
    all four predicates push to the parquet scan, one scalar aggregate,
    no shuffle beyond the final partial-merge.
    """
    from ..sources import register_views

    register_views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               COUNT(*) AS n
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.02 AND 0.04
          AND l_quantity < 25
        """
    )


@register(
    "q18_large_orders",
    tags=("join", "subquery", "agg", "topk"),
    oracle=f"""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           CAST(SUM({_d('l_quantity')}) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM({_d('l_quantity')}) > 300
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 20
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style large-volume-order lookup: IN over a HAVING
    aggregate subquery, as a semi-join against the per-order rollup.

    Scale: the HAVING aggregate and the outer sum share the lineitem
    shuffle key (l_orderkey), so AQE reuses one exchange; customer
    broadcasts; top-k is TakeOrdered.
    """
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    li = t["lineitem"]
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "bk"),
                F.col("l_orderkey") == F.col("bk"), "left_semi")
        .join(t["orders"], F.col("l_orderkey") == t["orders"].o_orderkey)
        .join(F.broadcast(t["customer"]), t["orders"].o_custkey == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate")
        .agg(dsum("l_quantity", "total_qty"))
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
        .limit(20)
    )


# ------------------------------------------------- full outer join


@register(
    "full_outer_nation_activity",
    tags=("join", "agg"),
    oracle=f"""
    WITH cust AS (
      SELECT c_nationkey AS nk, COUNT(*) AS n_customers
      FROM customer GROUP BY 1
    ),
    supp AS (
      SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers,
             CAST(SUM({_d('s_acctbal')}) AS DOUBLE) AS supp_balance
      FROM supplier GROUP BY 1
    )
    SELECT COALESCE(cust.nk, supp.nk) AS nationkey,
           COALESCE(n_customers, 0) AS n_customers,
           COALESCE(n_suppliers, 0) AS n_suppliers,
           supp_balance
    FROM cust FULL OUTER JOIN supp ON cust.nk = supp.nk
    """,
)
def full_outer_nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of per-nation customer and supplier rollups
    (nations present on either side survive; missing side zero-filled).

    Scale: both inputs aggregate to nation cardinality before the join,
    so the full-outer is over two tiny relations regardless of fact
    size.
    """
    t = load_tables(spark, sf_dir, "customer", "supplier")
    cust = t["customer"].groupBy(F.col("c_nationkey").alias("c_nk")).agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    supp = t["supplier"].groupBy(F.col("s_nationkey").alias("s_nk")).agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        dsum("s_acctbal", "supp_balance"),
    )
    return (
        cust.join(supp, cust.c_nk == supp.s_nk, "full_outer")
        .select(
            F.coalesce("c_nk", "s_nk").alias("nationkey"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
            "supp_balance",
        )
    )


@register(
    "ntile_price_bands",
    tags=("window", "agg"),
    oracle="""
    WITH banded AS (
      SELECT o_totalprice,
             NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS band
      FROM orders
    )
    SELECT band,
           COUNT(*) AS n,
           CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS lo,
           CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS hi,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM banded GROUP BY band
    """,
)
def ntile_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram via NTILE(10): decile bands of order value
    with per-band envelopes — complements histogram_totalprice
    (equi-WIDTH, queries/tpch.py). The (price, orderkey) order key is a
    total order, so band membership is deterministic under ties.

    Scale: NTILE over an unpartitioned window is a global sort — fine
    at dimension scale, NOT on a 100 TB fact (range-partitioned sort =
    one full shuffle). There, swap to approx_percentile band EDGES
    (approx_percentiles_price is the registered sketch path) and
    assign bands scan-side against the broadcast edges; this exact
    form is the oracle that certifies the sketch's bands.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        orders.select(
            dec("o_totalprice").alias("p"), F.ntile(10).over(w).alias("band")
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("p").cast("double").alias("lo"),
            F.max("p").cast("double").alias("hi"),
            F.sum("p").cast("double").alias("total"),
        )
    )


# -------------------------------------------- parameterized SQL

PARAM_PRICE_FLOOR = 150_000.0
PARAM_STATUSES = ("O", "F")


@register(
    "param_sql_high_value_orders",
    tags=("agg", "sql"),
    oracle=f"""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_value
    FROM orders
    WHERE o_totalprice >= {PARAM_PRICE_FLOOR}
      AND o_orderstatus IN ('O', 'F')
    GROUP BY o_orderstatus
    """,
)
def param_sql_high_value_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 PARAMETERIZED SQL (``spark.sql(query, args=...)``):
    the filter threshold and status list bind as named parameters, not
    string interpolation — the injection-safe API a SQL surface needs
    before anyone templates user input into it. The oracle pins the
    identical literals, so parameter binding provably changes nothing
    about the result.

    Scale: Catalyst folds the bound parameters into the plan exactly
    as literals — both predicates push to the parquet scan, then one
    partial+final agg on the 3-value status key.
    """
    from ..sources import register_views

    register_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_value
        FROM orders
        WHERE o_totalprice >= :floor
          AND array_contains(:statuses, o_orderstatus)
        GROUP BY o_orderstatus
        """,
        args={"floor": PARAM_PRICE_FLOOR, "statuses": list(PARAM_STATUSES)},
    )
