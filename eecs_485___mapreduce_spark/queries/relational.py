"""Relational suite over the star schema: joins, aggregations, windows,
top-k, set ops, date/string/math/json functions.

The reference has none of these (SURVEY.md section 2.B — its only
"relational" ops are the grep filter and wc projection), but they are
the committed engine surface per the north star. All Catalyst-native.

Hash-stability: every money/qty aggregate goes through decimal(18,2)
(exact, order-independent) and is cast to double at the end — see
``functions`` module docstring. Every top-k has a deterministic
tiebreak key.

Scale notes per query are on the docstrings: the recurring themes are
broadcast joins for dims (region/nation/customer/supplier/part all
broadcast at 100 TB — fact tables shuffle once on their join key),
partial aggregation before every shuffle, and TakeOrdered for top-k
(no global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import davg, dec, dsum, dsum_expr
from ..registry import register
from ..sources import load_table, load_tables

_DEC = "CAST({c} AS DECIMAL(18,2))"


def _d(c: str) -> str:
    return _DEC.format(c=c)


# --------------------------------------------------------------- TPC-H Q1


@register(
    "q1_pricing_summary",
    bench=True,
    tags=("agg",),
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM({_d('l_quantity')}) AS DOUBLE)                         AS sum_qty,
           CAST(SUM({_d('l_extendedprice')}) AS DOUBLE)                    AS sum_base_price,
           CAST(SUM({_d('l_extendedprice')} * (1 - {_d('l_discount')})) AS DOUBLE)
                                                                           AS sum_disc_price,
           CAST(SUM({_d('l_extendedprice')} * (1 - {_d('l_discount')})
                    * (1 + {_d('l_tax')})) AS DOUBLE)                      AS sum_charge,
           CAST(SUM({_d('l_quantity')}) AS DOUBLE) / COUNT(*)              AS avg_qty,
           CAST(SUM({_d('l_extendedprice')}) AS DOUBLE) / COUNT(*)         AS avg_price,
           CAST(SUM({_d('l_discount')}) AS DOUBLE) / COUNT(*)              AS avg_disc,
           COUNT(*)                                                        AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary.

    Scale: single scan with shipdate pushed to parquet, partial hash agg
    map-side, 4-group shuffle. No other strategy needed at any SF.
    fanout=True: the decimal partial aggregation is the dominant cost
    and otherwise runs inside the single scan task on unsplittable
    input (measured 1.05s -> 0.78s at sf0.1); join-shaped consumers of
    lineitem deliberately do NOT opt in — the fan-out exchange there
    duplicates the join shuffle (measured 1.3-1.6x slower).
    """
    li = load_table(spark, sf_dir, "lineitem", fanout=True).filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    charge = disc_price * (F.lit(1) + dec("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_base_price"),
        dsum_expr(disc_price, "sum_disc_price"),
        dsum_expr(charge, "sum_charge"),
        davg("l_quantity", "avg_qty"),
        davg("l_extendedprice", "avg_price"),
        davg("l_discount", "avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ---------------------------------------------------------- join pipeline


@register(
    "q3_top_orders",
    bench=True,
    tags=("join", "topk"),
    oracle=f"""
    SELECT l_orderkey,
           CAST(SUM({_d('l_extendedprice')} * (1 - {_d('l_discount')})) AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'FURNITURE'
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate  > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: segment filter -> 3-way join -> agg -> top-k.

    Scale: customer (filtered) broadcasts; orders/lineitem join
    shuffles on orderkey only. Top-k via orderBy+limit plans
    TakeOrderedAndProject — no global sort materialization.
    """
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    cust = t["customer"].filter(F.col("c_mktsegment") == "FURNITURE")
    orders = t["orders"].filter(F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp"))
    li = t["lineitem"].filter(F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp"))
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum_expr(revenue, "revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


@register(
    "q5_region_revenue",
    bench=True,
    tags=("join", "agg"),
    oracle=f"""
    SELECT n_name,
           CAST(SUM({_d('l_extendedprice')} * (1 - {_d('l_discount')})) AS DOUBLE) AS revenue
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style 6-way join.

    Scale: region/nation/customer/supplier broadcast (dims); the only
    shuffle is orders-lineitem on orderkey. The s_nationkey=c_nationkey
    local-supplier condition rides the broadcast join for free.
    """
    t = load_tables(
        spark, sf_dir, "region", "nation", "customer", "orders", "lineitem", "supplier"
    )
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    dims = (
        t["region"]
        .filter(F.col("r_name") == "ASIA")
        .join(t["nation"], t["nation"].n_regionkey == t["region"].r_regionkey)
        .join(t["customer"], t["customer"].c_nationkey == t["nation"].n_nationkey)
    )
    return (
        t["lineitem"]
        .join(t["orders"], t["lineitem"].l_orderkey == t["orders"].o_orderkey)
        .join(F.broadcast(dims), t["orders"].o_custkey == dims.c_custkey)
        .join(
            F.broadcast(t["supplier"]),
            (t["supplier"].s_suppkey == t["lineitem"].l_suppkey)
            & (t["supplier"].s_nationkey == dims.c_nationkey),
        )
        .groupBy("n_name")
        .agg(dsum_expr(revenue, "revenue"))
    )


@register(
    "topk_customers",
    tags=("join", "topk", "agg"),
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(SUM({_d('o_totalprice')}) AS DOUBLE) AS total_spent,
           COUNT(*) AS n_orders
    FROM orders JOIN customer ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    ORDER BY total_spent DESC, c_custkey
    LIMIT 10
    """,
)
def topk_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 customers by lifetime spend (agg -> broadcast join -> top-k)."""
    t = load_tables(spark, sf_dir, "orders", "customer")
    per_cust = t["orders"].groupBy("o_custkey").agg(
        dsum("o_totalprice", "total_spent"), F.count(F.lit(1)).alias("n_orders")
    )
    return (
        per_cust.join(F.broadcast(t["customer"]), per_cust.o_custkey == F.col("c_custkey"))
        .select("c_custkey", "c_name", "total_spent", "n_orders")
        .orderBy(F.col("total_spent").desc(), "c_custkey")
        .limit(10)
    )


@register(
    "semi_anti_join",
    tags=("join",),
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
    """,
)
def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS / NOT EXISTS as left-semi + left-anti joins.

    Scale: both sides reduce to distinct custkeys before the join
    (Catalyst rewrites IN to semi-join with build-side dedup); the
    filtered orders projections broadcast.
    """
    t = load_tables(spark, sf_dir, "customer", "orders")
    f_cust = t["orders"].filter(F.col("o_orderstatus") == "F").select("o_custkey")
    p_cust = t["orders"].filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return (
        t["customer"]
        .join(f_cust, F.col("c_custkey") == f_cust.o_custkey, "left_semi")
        .join(p_cust, F.col("c_custkey") == p_cust.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


# ------------------------------------------------------------- set ops


@register(
    "set_ops_custkeys",
    tags=("setops",),
    oracle="""
    (
      (SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
       INTERSECT
       SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O')
      UNION
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
    )
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 450000
    """,
)
def set_ops_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / UNION / EXCEPT over custkey sets."""
    orders = load_table(spark, sf_dir, "orders")

    def keys(pred):  # noqa: ANN001 - Column predicate
        return orders.filter(pred).select(F.col("o_custkey").alias("custkey"))

    both = keys(F.col("o_orderstatus") == "F").intersect(keys(F.col("o_orderstatus") == "O"))
    with_p = both.union(keys(F.col("o_orderstatus") == "P"))
    return with_p.subtract(keys(F.col("o_totalprice") > 450000))


# ------------------------------------------------------------- windows


@register(
    "window_events",
    tags=("window",),
    oracle=f"""
    SELECT event_id, user_id, ts, value,
           ROW_NUMBER() OVER w AS rn,
           LAG(value) OVER w AS prev_value,
           CAST(SUM({_d('value')}) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking, lag, and a running sum per user over the event stream.

    The running sum is decimal-exact so the incremental (Spark) and
    segment-tree (DuckDB) accumulation orders cannot diverge.
    Scale: one shuffle on user_id; frames evaluate within partitions.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.row_number().over(w).alias("rn"),
        F.lag("value").over(w).alias("prev_value"),
        F.sum(dec("value")).over(running).cast("double").alias("running_value"),
    )


@register(
    "topk_per_group",
    tags=("window", "topk"),
    oracle="""
    SELECT user_id, event_id, value, rk
    FROM (
      SELECT user_id, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rk
      FROM events WHERE event_type = 'purchase'
    )
    WHERE rk <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 purchases per user — the canonical window top-k pattern.

    Scale: predicate pushdown on event_type, then one user_id shuffle;
    row_number truncates groups early under WholeStageCodegen.
    """
    events = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), "event_id")
    return (
        events.select("user_id", "event_id", "value", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 3)
    )


# ----------------------------------------------------- scalar functions


@register(
    "date_agg_orders",
    tags=("datetime", "agg"),
    oracle=f"""
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
           COUNT(*) AS n_orders,
           CAST(SUM({_d('o_totalprice')}) AS DOUBLE) AS month_total,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders
    GROUP BY 1
    """,
)
def date_agg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly order rollup (date_trunc + count/sum/distinct)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(F.date_trunc("month", "o_orderdate").alias("order_month")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "month_total"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


@register(
    "json_events",
    tags=("json", "agg"),
    oracle="""
    WITH e AS (
      SELECT event_type,
             CASE WHEN json_valid(props)
                  THEN CAST(json_extract(props, '$.k') AS INTEGER) END AS k
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           ROUND(CAST(SUM(k) AS DOUBLE) / COUNT(*), 6) AS avg_k
    FROM e
    GROUP BY event_type
    """,
)
def json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props payload column.

    Malformed/NULL payloads extract as NULL on both sides: Spark's
    get_json_object is forgiving by design; the oracle needs an
    explicit json_valid guard because DuckDB's json_extract THROWS on
    malformed input (edge-corpus harness finding)."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.round(F.sum(k).cast("double") / F.count(F.lit(1)), 6).alias("avg_k"),
    )


@register(
    "variant_props_stats",
    tags=("json", "variant", "agg"),
    oracle="""
    WITH e AS (
      SELECT event_type,
             CASE WHEN json_valid(props)
                  THEN CAST(json_extract(props, '$.k') AS INTEGER) END AS k
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n,
           MIN(k) AS min_k,
           MAX(k) AS max_k,
           COUNT(DISTINCT k) AS n_distinct_k,
           CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_missing_k
    FROM e
    GROUP BY event_type
    """,
)
def variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payloads through Spark 4's VARIANT type:
    ``parse_json`` once into the binary variant encoding, then typed
    ``try_variant_get`` extraction (returns NULL on missing/mistyped
    paths instead of failing the job — the posture ingest needs).

    Why VARIANT and not ``get_json_object`` (which json_events uses):
    variant decodes the JSON text ONCE into a binary form that every
    downstream extraction reuses, where repeated get_json_object calls
    re-parse the string per path — on a 100 TB event log with several
    extracted fields that is a multiple of the scan cost. This is the
    parse-once/shred-many pattern; at rest the same column would be
    stored as parquet VARIANT and field extraction pushes into the
    reader.
    """
    events = load_table(spark, sf_dir, "events")
    # try_parse_json: malformed payloads become NULL variants instead
    # of failing the job (plain parse_json is FAILFAST) — guaranteed to
    # matter on a 100 TB event log.
    k = F.try_variant_get(F.try_parse_json("props"), "$.k", "int")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.countDistinct(k).alias("n_distinct_k"),
        F.sum(F.when(k.isNull(), 1).otherwise(0)).cast("bigint").alias("n_missing_k"),
    )


@register(
    "string_part_stats",
    tags=("string", "agg"),
    oracle="""
    SELECT p_brand,
           COUNT(*) AS n_parts,
           COUNT(DISTINCT p_type) AS n_types,
           ROUND(CAST(SUM(length(p_name)) AS DOUBLE) / COUNT(*), 6) AS avg_name_len,
           MAX(upper(p_type)) AS max_type,
           CAST(SUM(CASE WHEN p_name LIKE '%widget%' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_widgets
    FROM part
    GROUP BY p_brand
    """,
)
def string_part_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions (length/upper/like) feeding aggregates."""
    part = load_table(spark, sf_dir, "part")
    return part.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.countDistinct("p_type").alias("n_types"),
        F.round(
            F.sum(F.length("p_name")).cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_name_len"),
        F.max(F.upper("p_type")).alias("max_type"),
        F.sum(F.when(F.col("p_name").like("%widget%"), 1).otherwise(0)).alias("n_widgets"),
    )


@register(
    "math_lineitem",
    tags=("math", "agg"),
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(l_orderkey % 97) AS BIGINT) AS sum_mod,
           CAST(SUM(abs(l_partkey - l_suppkey)) AS BIGINT) AS sum_absdiff,
           CAST(SUM(greatest(l_partkey, l_suppkey) - least(l_partkey, l_suppkey)) AS BIGINT)
               AS sum_range,
           CAST(MAX(floor(l_quantity)) AS BIGINT) AS max_floor_qty,
           CAST(MIN(ceil(l_quantity)) AS BIGINT) AS min_ceil_qty
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def math_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar functions (mod/abs/greatest/least/floor/ceil) on exact
    integer domains so both engines agree bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.sum(F.col("l_orderkey") % 97).alias("sum_mod"),
        F.sum(F.abs(F.col("l_partkey") - F.col("l_suppkey"))).alias("sum_absdiff"),
        F.sum(
            F.greatest("l_partkey", "l_suppkey") - F.least("l_partkey", "l_suppkey")
        ).alias("sum_range"),
        F.max(F.floor("l_quantity")).alias("max_floor_qty"),
        F.min(F.ceil("l_quantity")).alias("min_ceil_qty"),
    )


@register(
    "agg_distinct_stats",
    tags=("agg",),
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           COUNT(DISTINCT l_partkey) AS n_parts,
           MIN(l_shipdate) AS first_ship,
           MAX(l_shipdate) AS last_ship
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count / countDistinct / min / max over the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


@register("approx_distinct_parts", tags=("agg", "approx"), oracle=None)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct estimate — the 100 TB path for cardinality
    (no exact-distinct shuffle). No oracle: HLL estimates are
    engine-specific; the driver records a rows-only check, and the unit
    test asserts <5% relative error against the exact count."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.01).alias("approx_orders"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "rollup_orders",
    tags=("agg", "rollup"),
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM({_d('o_totalprice')}) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (status -> priority -> grand total)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), dsum("o_totalprice", "total")
    )


@register(
    "percentiles_lineitem",
    tags=("agg", "stats"),
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def percentiles_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (median/p90/p99 of extended price per return
    flag). Spark's ``percentile`` and DuckDB's ``quantile_cont`` both
    use linear interpolation between closest ranks, so rounded values
    agree.

    Scale note: exact percentiles sort each group; at 100 TB use
    ``approx_percentile`` (t-digest, mergeable sketch, one pass) and
    accept the epsilon — the exact form here is the correctness anchor
    the approximate one is validated against.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("l_extendedprice", F.lit(0.99)), 4).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "profile_orders_columns",
    tags=("agg", "profiling"),
    oracle="""
    SELECT 'o_orderkey' AS col, COUNT(*) AS n,
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null,
           COUNT(DISTINCT o_orderkey) AS n_distinct,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_s,
           CAST(MAX(o_orderkey) AS VARCHAR) AS max_s
    FROM orders
    UNION ALL
    SELECT 'o_custkey', COUNT(*),
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT o_custkey),
           CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(*),
           CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT o_totalprice),
           CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR),
           CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*),
           CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT o_orderstatus),
           MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', COUNT(*),
           CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT o_orderpriority),
           MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
    """,
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (the data-catalog/discovery op): per column of
    the orders table — row count, null count, exact distinct count, and
    min/max rendered canonically (money through decimal(18,2) so both
    engines print identical strings).

    Scale: ONE scan computes every per-column aggregate in a single
    agg row (Spark fuses the 5 x 4 aggregates into one partial+final
    pass — the oracle's UNION ALL form scans 5 times); the profile is
    then unpivoted with ``stack``. At 100 TB swap COUNT(DISTINCT) for
    approx_count_distinct per column and this stays a one-pass job;
    exact distinct forces one extra expand-style aggregation but the
    output is still 5 rows.
    """
    orders = load_table(spark, sf_dir, "orders")

    def prof(c, min_expr, max_expr):  # noqa: ANN001
        return [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"{c}__n_null"),
            F.countDistinct(c).alias(f"{c}__n_distinct"),
            min_expr.alias(f"{c}__min_s"),
            max_expr.alias(f"{c}__max_s"),
        ]

    aggs = []
    for c in ("o_orderkey", "o_custkey"):
        aggs += prof(c, F.min(c).cast("string"), F.max(c).cast("string"))
    aggs += prof(
        "o_totalprice",
        F.min(dec("o_totalprice")).cast("string"),
        F.max(dec("o_totalprice")).cast("string"),
    )
    for c in ("o_orderstatus", "o_orderpriority"):
        aggs += prof(c, F.min(c), F.max(c))
    one = orders.agg(*aggs)
    cols = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus", "o_orderpriority"]
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__n_null, {c}__n_distinct, {c}__min_s, {c}__max_s"
        for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (col, n, n_null, n_distinct, min_s, max_s)"
        )
    )


# ----------------------------------------------- XML round-trip


@register(
    "xml_roundtrip_events",
    tags=("xml", "string", "agg"),
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents,
           CAST(MAX(event_id) AS BIGINT) AS max_event_id
    FROM events
    WHERE event_type IS NOT NULL AND value IS NOT NULL
    GROUP BY event_type
    """,
)
def xml_roundtrip_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML serialization round-trip: each event renders to an XML
    record (``to_xml`` over a struct), the XML string is parsed back
    (``from_xml`` with an explicit schema), and the census runs over
    the PARSED fields — Spark 4's native XML surface (the third
    semi-structured codec next to JSON and VARIANT). The oracle
    computes the same census from the raw columns, so value-hash
    equality certifies the serialize->parse identity, not just that
    the query runs.

    Scale (100 TB): both codec directions are scan-side codegen
    expressions — no shuffle beyond the final census agg. The
    explicit parse schema (never ``schema_of_xml`` over the data)
    keeps the plan static and the scan single-pass.
    """
    events = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isNotNull() & F.col("value").isNotNull()
    )
    xml = events.select(
        F.to_xml(
            F.struct(
                F.col("event_id"), F.col("event_type"), F.col("value")
            ),
            {"rootTag": "ev"},
        ).alias("x")
    )
    parsed = xml.select(
        F.from_xml(
            "x", "event_id BIGINT, event_type STRING, value DOUBLE"
        ).alias("r")
    )
    return parsed.groupBy(F.col("r.event_type").alias("event_type")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("r.value") * 100, 0).cast("long"))
        .cast("long")
        .alias("sum_cents"),
        F.max("r.event_id").cast("long").alias("max_event_id"),
    )


# ------------------------------------- hierarchical revenue shares


@register(
    "revenue_share_region_nation",
    tags=("join", "window", "agg"),
    oracle="""
    WITH rev AS (
      SELECT r.r_name, n.n_name,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY r.r_name, n.n_name
    )
    SELECT r_name, n_name, cents,
           CAST(ROUND(1000000.0 * cents
                 / SUM(cents) OVER (PARTITION BY r_name)) AS BIGINT)
             AS share_of_region_micro,
           CAST(ROUND(1000000.0 * cents
                 / SUM(cents) OVER ()) AS BIGINT) AS share_of_total_micro
    FROM rev
    """,
)
def revenue_share_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent at two hierarchy levels: each nation's
    revenue as a share of its region and of the world — the
    ratio-to-report windows every drill-down dashboard computes.

    Determinism: exact integer cents collapsed per (region, nation)
    BEFORE any window; both shares are single micro roundings over
    BIGINT window sums.

    Scale (100 TB): the fact stream pays one partial+final agg on a
    |regions| x |nations| key (dims broadcast into the join); both
    percent-of-parent windows then run over that constant-size rollup
    — a window over raw orders would be the classic mistake here.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    rev = (
        orders.join(
            customer.select("c_custkey", "c_nationkey"),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    wr = Window.partitionBy("r_name")
    wall = Window.partitionBy()
    return rev.select(
        "r_name",
        "n_name",
        "cents",
        F.round(F.lit(1_000_000.0) * F.col("cents") / F.sum("cents").over(wr))
        .cast("long")
        .alias("share_of_region_micro"),
        F.round(F.lit(1_000_000.0) * F.col("cents") / F.sum("cents").over(wall))
        .cast("long")
        .alias("share_of_total_micro"),
    )


# ------------------------------------------------ global total-order sort


@register(
    "global_sort_orders",
    tags=("sort", "layout"),
    oracle="""
    SELECT o_orderkey,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
           ROW_NUMBER() OVER (
             ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT) DESC,
                      o_orderkey
           ) AS global_rank
    FROM orders
    """,
)
def global_sort_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-order sort with exact global rank — the TeraSort pattern.

    A naive ``row_number() OVER (ORDER BY ...)`` funnels the whole
    relation through ONE partition; this implementation keeps the rank
    computation fully parallel:

    1. ``repartitionByRange`` range-partitions on the sort key
       (sampled boundaries — Spark's TeraSort primitive), pinned with
       a scoped persist so both consumers below see ONE boundary
       sampling.
    2. Per-partition counts (a constant-size aggregate, one row per
       partition) are turned into exclusive prefix offsets; the window
       that does this runs over at most `#partitions` rows.
    3. Each row's global rank = partition offset (broadcast-joined on
       partition id) + its row_number WITHIN its range partition — a
       window partitioned by partition id, so every partition ranks in
       parallel.

    Correctness does not depend on where the sampled boundaries fall
    (any range-consistent split yields the same offset+local ranks);
    the persist only guarantees the two branches observe the SAME
    split. Ties are impossible: (price_cents DESC, o_orderkey ASC) is
    a total order over the primary key.

    Scale (100 TB): one range shuffle + one pid-keyed window shuffle;
    the offset relation is |partitions| rows, broadcast. This is the
    sort every ORDER-BY-heavy export and the packed-shard /
    Z-order writers (sinks.py) build on.

    Reference parity: the reference sorts each partition's lines in
    memory before reduce (mapreduce/worker/__main__.py sort step,
    SURVEY.md section 2.A row 5) but has no global order across
    partitions; this supplies the missing total order.
    """
    from ..functions import distributed_rank

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("price_cents"),
    )
    ranked = distributed_rank(
        orders,
        [F.desc("price_cents"), F.asc("o_orderkey")],
        ("global_sort_orders", sf_dir),
        rank_alias="global_rank",
    )
    return ranked.select("o_orderkey", "price_cents", "global_rank")


# ----------------------------------------------- ISO week calendar


@register(
    "orders_iso_week_profile",
    tags=("datetime", "agg"),
    oracle="""
    SELECT CAST(isoyear(o_orderdate) AS INTEGER) AS iso_year,
           CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_value
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY 1, 2
    """,
)
def orders_iso_week_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly order profile on the ISO-8601 calendar — with the ISO
    YEAR, not the calendar year. The distinction is the classic
    year-boundary bug: 1996-12-30 belongs to ISO week 1 of ISO year
    1997, and grouping by calendar year instead silently splits that
    week into two phantom rows. Spark's EXTRACT(YEAROFWEEK) and
    DuckDB's isoyear() pin the same ISO semantics cross-engine (both
    follow ISO 8601: week 1 = the week containing the first
    Thursday).

    Scale: pushdown-filtered scan, two codegen date functions, one
    shuffle on the ~104-key week grid — the q1 shape.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy(
            F.expr("EXTRACT(YEAROFWEEK FROM o_orderdate)")
            .cast("int")
            .alias("iso_year"),
            F.weekofyear("o_orderdate").alias("iso_week"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec("o_totalprice")).cast("double").alias("total_value"),
        )
    )


# ------------------------------------------- ordered string aggregation


@register(
    "listagg_parts_by_brand",
    tags=("agg", "string"),
    oracle="""
    WITH d AS (SELECT DISTINCT p_brand, p_type FROM part),
    r AS (
      SELECT p_brand, p_type,
             ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_type) AS rn
      FROM d
    )
    SELECT p_brand,
           COUNT(*) AS n_types,
           string_agg(p_type, ',' ORDER BY p_type)
             FILTER (WHERE rn <= 5)      AS top_types
    FROM r GROUP BY p_brand ORDER BY p_brand
    """,
)
def listagg_parts_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG / string_agg with deterministic ordering: per brand, the
    distinct part-type count and the five lexicographically-first
    types joined into one comma string. Unordered collect is a
    correctness trap (any shuffle reorder changes the output); the
    contract here is collect -> array_sort -> slice -> join, which is
    partitioning-independent.

    Determinism: the aggregated set is DISTINCT and the join order is
    a total lexicographic order on ASCII strings — identical in Spark
    (array_sort, UTF-8 byte order) and DuckDB (binary collation).

    Scale (100 TB): one shuffle on (brand, type) for the DISTINCT,
    then a per-brand collect bounded by the type-domain size (150 in
    TPC-H), never by fact rows — collect_set state stays KBs per
    group. A group whose domain is unbounded should switch to the
    group-limit form (row_number <= 5) BEFORE collecting; the slice
    here caps output, not state, and is safe only because the domain
    is a dimension attribute.

    Reference parity: the reference's reducer concatenation is the
    sorted-merge contract of wc_reduce.py (tests/testdata/exec/
    wc_reduce.py:25-33); this is the same sorted-fold as a first-class
    aggregate. SURVEY.md section 2.B string-function family.
    """
    part = load_table(spark, sf_dir, "part")
    d = part.select("p_brand", "p_type").distinct()
    return (
        d.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_types"),
            F.array_join(
                F.slice(F.array_sort(F.collect_list("p_type")), 1, 5), ","
            ).alias("top_types"),
        )
        .orderBy("p_brand")
    )
