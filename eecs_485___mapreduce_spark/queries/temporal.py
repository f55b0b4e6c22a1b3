"""Temporal-analytics operators: autocorrelation (seasonality
detection), CUSUM changepoint location, event-sequence regex matching
(a MATCH_RECOGNIZE-lite), and a year-over-year decile transition
matrix.

These are the time-structure diagnostics a warehouse runs over an
event stream and an order history: "is there a daily cycle?" (ACF at
lag 24 h), "where did the level shift?" (CUSUM argmax), "which
behavioral patterns occur?" (regex over per-user event-type
sequences), and "how do customers move between spend tiers?"
(decile transition). All four follow the package's shared discipline:
collapse the fact stream to a bounded rollup FIRST, integer-exact
arithmetic with deterministic tie-breaks so the DuckDB oracle matches
value-for-value, and no Python in the data path.

Reference parity: none of these exist in the reference (its query
surface is wordcount + grep, mapreduce/__init__.py); they extend
SURVEY.md section 2.B's committed time-series/window family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import dec, truncate_plan
from ..registry import register
from ..sources import load_table

# ---------------------------------------------------- autocorrelation

_ACF_LAGS = (1, 24)


@register(
    "acf_hourly_events",
    tags=("datetime", "stats", "events", "window"),
    oracle=f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hr, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    b AS (SELECT date_trunc('hour', MIN(ts)) AS lo,
                 date_trunc('hour', MAX(ts)) AS hi FROM events),
    spine AS (SELECT t.event_type, s.hr
              FROM (SELECT DISTINCT event_type FROM events) t,
                   (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
                    FROM b) s),
    dense AS (
      SELECT s.event_type, s.hr, COALESCE(h.n, 0) AS x
      FROM spine s LEFT JOIN hourly h
        ON h.event_type = s.event_type AND h.hr = s.hr
    ),
    lagged AS (
      SELECT event_type, lag, x, y FROM (
        SELECT event_type, l.lag, x,
               lead(x, l.lag) OVER (PARTITION BY event_type, l.lag
                                    ORDER BY hr) AS y
        FROM dense, (VALUES {", ".join(f"({lg})" for lg in _ACF_LAGS)}) AS l(lag)
      ) WHERE y IS NOT NULL
    ),
    m AS (
      SELECT event_type, lag,
             COUNT(*) AS n_pairs,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM lagged GROUP BY 1, 2
    )
    SELECT event_type, lag, n_pairs,
           ROUND(CAST(n_pairs * sxy - sx * sy AS DOUBLE)
                 / NULLIF(sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE))
                          * sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE)), 0.0),
                 6) + 0 AS acf
    FROM m
    """,
)
def acf_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the hourly event-count series per event type
    at lags 1 h and 24 h — the seasonality screen (a strong lag-24
    ACF means a daily cycle).

    Semantics: the series is the DENSE hourly count (missing hours are
    true zeros — a sparse series would silently splice non-adjacent
    hours together at every gap and shift all lag alignment). Pearson
    r over (x_t, x_{{t+L}}) pairs from exact integer moment sums:
    r = (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2) (n*Syy - Sy^2)).

    Cross-engine determinism: every moment is a BIGINT sum of
    integers; both engines then evaluate the identical double
    expression from identical integers and round at 6 dp. NULLIF
    guards the constant-series denominator on both sides.

    Scale: one shuffle collapses the stream to a (type x hour) rollup
    whose size is CALENDAR-bounded (30 days -> 720 rows/type at any
    corpus size); the spine cross join, lag windows, and moment aggs
    all run over that bounded relation. The lag fan-out is
    len(_ACF_LAGS) x rollup, not x stream.
    """
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(F.count(F.lit(1)).alias("n"))
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("hr")
    )
    types = events.select("event_type").distinct()
    # NO truncate_plan here (round-9, measured): the two lag branches
    # do replay this lineage, but cutting it regressed the interleaved
    # A/B (warm min 1.16-1.41 s -> 1.37-1.40 s) — the eager checkpoint
    # job costs more than the two cheap replays save, and the
    # checkpointed relation loses the stats the downstream join
    # planning uses. haar_energy_hourly (8 replays, aggregation-only
    # consumers) is the shape where the same cut wins.
    dense = (
        types.crossJoin(F.broadcast(spine))
        .join(hourly, ["event_type", "hr"], "left")
        .select("event_type", "hr", F.coalesce("n", F.lit(0)).alias("x"))
    )
    per_lag = []
    for lag in _ACF_LAGS:
        w = Window.partitionBy("event_type").orderBy("hr")
        per_lag.append(
            dense.select(
                "event_type",
                F.lit(lag).alias("lag"),
                F.col("x"),
                F.lead("x", lag).over(w).alias("y"),
            ).filter(F.col("y").isNotNull())
        )
    lagged = per_lag[0]
    for df in per_lag[1:]:
        lagged = lagged.unionByName(df)
    m = lagged.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n_pairs"), F.col("sx"), F.col("sy")
    num = (n * F.col("sxy") - sx * sy).cast("double")
    den = F.sqrt((n * F.col("sxx") - sx * sx).cast("double")) * F.sqrt(
        (n * F.col("syy") - sy * sy).cast("double")
    )
    return m.select(
        "event_type",
        "lag",
        "n_pairs",
        F.round(num / F.nullif(den, F.lit(0.0)), 6).alias("acf"),
    )


# ------------------------------------------------- CUSUM changepoint


@register(
    "cusum_changepoint_daily",
    tags=("datetime", "stats", "window"),
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority,
             CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS d,
             COUNT(*) AS x
      FROM orders GROUP BY 1, 2
    ),
    walk AS (
      SELECT o_orderpriority, d, x,
             CAST(SUM(x) OVER w AS BIGINT) AS cum,
             ROW_NUMBER() OVER w AS k,
             CAST(COUNT(*) OVER (PARTITION BY o_orderpriority) AS BIGINT)
               AS n_days,
             CAST(SUM(x) OVER (PARTITION BY o_orderpriority) AS BIGINT)
               AS total
      FROM daily
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY d)
    ),
    scored AS (
      SELECT o_orderpriority, d, n_days, total,
             abs(n_days * cum - k * total) AS abs_c,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY abs(n_days * cum - k * total) DESC, d)
               AS rn
      FROM walk
    )
    SELECT o_orderpriority, d AS cp_day, abs_c AS cusum_scaled,
           n_days, total AS total_orders
    FROM scored WHERE rn = 1
    """,
)
def cusum_changepoint_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint location per order priority: the observed day
    k* maximizing |n*CumSum_k - k*Total| — the integer-scaled form of
    the classic cumulative-deviation-from-mean statistic
    CUSUM_k = sum_{d<=k}(x_d - mean), scaled by n to stay in exact
    BIGINT arithmetic (ties broken to the earliest day).

    Scale: one shuffle collapses orders to a (priority x day) rollup
    (calendar-bounded: ~2,400 days x 5 priorities at any corpus
    size); the cumulative walk and the argmax are windows over that
    bounded relation, and the argmax compiles to a WindowGroupLimit
    running top-1 — no per-priority sort materializes.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        "o_orderpriority", F.date_trunc("day", F.col("o_orderdate")).alias("d")
    ).agg(F.count(F.lit(1)).alias("x"))
    w = Window.partitionBy("o_orderpriority").orderBy("d")
    wp = Window.partitionBy("o_orderpriority")
    walk = daily.select(
        "o_orderpriority",
        "d",
        F.sum("x").over(w).alias("cum"),
        F.row_number().over(w).alias("k"),
        F.count(F.lit(1)).over(wp).alias("n_days"),
        F.sum("x").over(wp).alias("total"),
    )
    abs_c = F.abs(F.col("n_days") * F.col("cum") - F.col("k") * F.col("total"))
    scored = walk.select(
        "o_orderpriority",
        "d",
        "n_days",
        F.col("total").alias("total_orders"),
        abs_c.alias("abs_c"),
        F.row_number()
        .over(Window.partitionBy("o_orderpriority").orderBy(abs_c.desc(), F.col("d")))
        .alias("rn"),
    )
    return scored.filter(F.col("rn") == 1).select(
        "o_orderpriority",
        F.col("d").alias("cp_day"),
        F.col("abs_c").alias("cusum_scaled"),
        "n_days",
        "total_orders",
    )


# ------------------------------------- event-sequence regex matching

# Pattern -> regex over per-user event-initial strings
# (v=view c=click p=purchase s=signup e=error). Character classes and
# greedy * only: identical non-overlapping leftmost-match semantics in
# Java regex (Spark) and RE2 (DuckDB) — no \\b, no lookaround, no lazy
# quantifiers (the engines diverge at those edges).
SEQ_PATTERNS: dict[str, str] = {
    "view_to_purchase": "v[^p]*p",
    "click_streak": "ccc+",
    "error_then_buy": "e[vcs]*p",
}


@register(
    "event_seq_regex",
    tags=("events", "string", "window"),
    oracle=f"""
    WITH seq AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS seq
      FROM events GROUP BY user_id
    ),
    counted AS (
      SELECT p.pattern, p.rx,
             len(regexp_extract_all(s.seq, p.rx)) AS n
      FROM seq s,
           (VALUES {", ".join(f"('{name}', '{rx}')" for name, rx in SEQ_PATTERNS.items())})
             AS p(pattern, rx)
    )
    SELECT pattern,
           CAST(SUM(n) AS BIGINT) AS n_matches,
           CAST(SUM(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_users
    FROM counted GROUP BY pattern
    """,
)
def event_seq_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-lite: collapse each user's event history to a
    string of event-type initials in strict (ts, event_id) order, then
    count regex matches of behavioral patterns (view->eventual
    purchase, triple-click streaks, error-then-recovery-to-purchase).

    Sequence determinism: Spark builds the string via
    array_sort(collect_list(struct(ts, event_id, ch))) — struct order
    (ts, then unique event_id) is a total order, so the aggregated
    string is partition-independent and equals DuckDB's ordered
    string_agg. Match counts use non-overlapping leftmost semantics,
    identical across Java regex and RE2 for the restricted pattern
    grammar above.

    Scale: one shuffle on user_id builds per-user sequences (state =
    one string per user, bounded by per-user activity); the pattern
    fan-out is |patterns| columns computed in one codegen pass, then a
    constant-size census agg. The regexes never see the raw stream.
    """
    events = load_table(spark, sf_dir, "events")
    ch = F.substring("event_type", 1, 1)
    seq = events.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("ts"), F.col("event_id"), ch.alias("ch")))
                ),
                lambda s: s["ch"],
            ),
            "",
        ).alias("seq")
    )
    counts = seq.select(
        *[
            F.regexp_count("seq", F.lit(rx)).alias(name)
            for name, rx in SEQ_PATTERNS.items()
        ]
    )
    stacked = counts.select(
        F.expr(
            "stack({n}, {args}) AS (pattern, n)".format(
                n=len(SEQ_PATTERNS),
                args=", ".join(f"'{name}', {name}" for name in SEQ_PATTERNS),
            )
        )
    )
    return stacked.groupBy("pattern").agg(
        F.sum("n").alias("n_matches"),
        F.sum(F.when(F.col("n") > 0, 1).otherwise(0)).alias("n_users"),
    )


# --------------------------------------- decile transition matrix


@register(
    "decile_transition_matrix",
    tags=("window", "agg", "orders"),
    oracle="""
    WITH y1 AS (
      SELECT o_custkey,
             NTILE(10) OVER (ORDER BY SUM(CAST(o_totalprice AS DECIMAL(18,2))) DESC,
                             o_custkey) AS from_decile
      FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                    AND o_orderdate <  TIMESTAMP '1997-01-01'
      GROUP BY o_custkey
    ),
    y2 AS (
      SELECT o_custkey,
             NTILE(10) OVER (ORDER BY SUM(CAST(o_totalprice AS DECIMAL(18,2))) DESC,
                             o_custkey) AS to_decile
      FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
                    AND o_orderdate <  TIMESTAMP '1998-01-01'
      GROUP BY o_custkey
    )
    SELECT from_decile, to_decile, COUNT(*) AS n_customers
    FROM y1 JOIN y2 USING (o_custkey)
    GROUP BY 1, 2
    """,
)
def decile_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year customer mobility: each customer's 1996 spend
    decile vs their 1997 spend decile, as a (from, to) -> count
    matrix (<=100 cells). Decile = NTILE(10) over exact-decimal spend
    with o_custkey tie-break, so the total order — and therefore every
    decile boundary — is identical across engines.

    Scale: the fact stream collapses to per-customer year totals FIRST
    (one shuffle each), so the NTILE windows run over a
    dimension-sized relation, the package's collapse-then-window
    discipline (same argument as gini_revenue_by_nation). For a
    customer dimension too large for one window partition, swap the
    NTILE for the TeraSort-style distributed rank
    (global_sort_orders): range shuffle + per-partition offsets gives
    the same total order without a single-partition window.
    """
    orders = load_table(spark, sf_dir, "orders")

    def year_deciles(y0: str, y1: str, out: str) -> DataFrame:
        spend = (
            orders.filter(
                (F.col("o_orderdate") >= F.lit(y0).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(y1).cast("timestamp"))
            )
            .groupBy("o_custkey")
            .agg(F.sum(dec("o_totalprice")).alias("spend"))
        )
        w = Window.orderBy(F.col("spend").desc(), F.col("o_custkey"))
        return spend.select("o_custkey", F.ntile(10).over(w).alias(out))

    y1 = year_deciles("1996-01-01", "1997-01-01", "from_decile")
    y2 = year_deciles("1997-01-01", "1998-01-01", "to_decile")
    return (
        y1.join(y2, "o_custkey")
        .groupBy("from_decile", "to_decile")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# ------------------------------------------- sweep-line concurrency


@register(
    "peak_open_orders",
    tags=("window", "datetime", "orders"),
    oracle="""
    WITH iv AS (
      SELECT o.o_orderdate AS open_ts, x.close_ts
      FROM orders o
      JOIN (SELECT l_orderkey, MAX(l_shipdate) AS close_ts
            FROM lineitem GROUP BY 1) x
        ON x.l_orderkey = o.o_orderkey
    ),
    deltas AS (
      SELECT ts, CAST(SUM(d) AS BIGINT) AS d
      FROM (SELECT open_ts AS ts, 1 AS d FROM iv
            UNION ALL
            SELECT close_ts AS ts, -1 AS d FROM iv)
      GROUP BY ts
    ),
    walk AS (
      SELECT ts, CAST(SUM(d) OVER (ORDER BY ts) AS BIGINT) AS c
      FROM deltas
    ),
    ranked AS (
      SELECT CAST(EXTRACT(year FROM ts) AS INTEGER) AS yr, ts, c,
             ROW_NUMBER() OVER (PARTITION BY EXTRACT(year FROM ts)
                                ORDER BY c DESC, ts) AS rn
      FROM walk
    )
    SELECT yr, c AS peak_open, ts AS peak_at
    FROM ranked WHERE rn = 1
    """,
)
def peak_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line interval concurrency: how many orders were "in
    flight" (placed but not yet fully shipped) at once, per year —
    peak value and the first instant it was reached. The classic
    +1/-1 endpoint walk: c(t) = #opens<=t - #closes<=t, with closes
    processed end-exclusively by netting both endpoint kinds per
    DISTINCT timestamp before the running sum (so equal-timestamp
    ordering can never change any observed prefix value).

    Scale: the interval relation is one shuffle (per-order max
    shipdate) joined to orders; endpoints collapse to <=2 rows per
    distinct timestamp. The running sum does NOT use a global window:
    each year's walk runs in its own partition seeded with a carry-in
    offset (the summed deltas of all prior years, a |years|-row
    relation cumulated and joined back) — the same
    offsets-not-global-sort pattern as global_sort_orders, so the
    sweep parallelizes across however the calendar is bucketed. The
    oracle uses the plain global window; the carry-in algebra is
    exactly equal.
    """
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    closes = lineitem.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("close_ts"))
    iv = orders.join(closes, F.col("l_orderkey") == F.col("o_orderkey")).select(
        F.col("o_orderdate").alias("open_ts"), "close_ts"
    )
    deltas = (
        iv.select(F.col("open_ts").alias("ts"), F.lit(1).alias("d"))
        .unionAll(iv.select(F.col("close_ts").alias("ts"), F.lit(-1).alias("d")))
        .groupBy("ts")
        .agg(F.sum("d").alias("d"))
        .withColumn("yr", F.year("ts"))
    )
    per_year = deltas.groupBy("yr").agg(F.sum("d").alias("year_total"))
    w_years = (
        Window.orderBy("yr").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = per_year.select(
        "yr", (F.sum("year_total").over(w_years) - F.col("year_total")).alias("carry_in")
    )
    w_in_year = (
        Window.partitionBy("yr")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    walk = deltas.join(F.broadcast(offsets), "yr").select(
        "yr", "ts", (F.col("carry_in") + F.sum("d").over(w_in_year)).alias("c")
    )
    ranked = walk.select(
        "yr",
        "ts",
        "c",
        F.row_number()
        .over(Window.partitionBy("yr").orderBy(F.col("c").desc(), F.col("ts")))
        .alias("rn"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "yr", F.col("c").alias("peak_open"), F.col("ts").alias("peak_at")
    )


# ------------------------------------------ Lindley backlog walk


@register(
    "backlog_lindley_daily",
    tags=("window", "datetime", "stats"),
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority,
             CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS d,
             CAST(COUNT(*) AS BIGINT) AS placed
      FROM orders GROUP BY 1, 2
    ),
    rate AS (
      SELECT o_orderpriority,
             CAST(SUM(placed) // COUNT(*) AS BIGINT) AS c
      FROM daily GROUP BY 1
    ),
    cums AS (
      SELECT daily.o_orderpriority, d, rate.c,
             CAST(SUM(placed - rate.c) OVER (
               PARTITION BY daily.o_orderpriority ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum
      FROM daily JOIN rate USING (o_orderpriority)
    ),
    walk AS (
      SELECT o_orderpriority, d, c, cum,
             CAST(MIN(cum) OVER (
               PARTITION BY o_orderpriority ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS prefix_min
      FROM cums
    ),
    b AS (
      SELECT o_orderpriority, d, c,
             cum - LEAST(prefix_min, 0) AS backlog
      FROM walk
    )
    SELECT o_orderpriority,
           MAX(c) AS service_rate,
           CAST(MAX(backlog) AS BIGINT) AS peak_backlog,
           CAST(SUM(CASE WHEN backlog > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS days_with_backlog,
           COUNT(*) AS n_days
    FROM b GROUP BY o_orderpriority
    """,
)
def backlog_lindley_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Queueing backlog reconstruction per order priority: daily order
    inflow against a constant service rate c (the priority's exact
    mean daily placements, floored), evolving by the Lindley
    recursion B_d = max(0, B_{d-1} + placed_d - c). The recursion is
    NONLINEAR (the max clamps at empty queue), which normally forces
    row-at-a-time state — but its closed form
    B_k = cum_k - min(0, min_{j<=k} cum_j) (cum = running sum of the
    net flow) turns it into two stacked window aggregates, fully
    distributed and exact in BIGINT.

    Scale: orders collapse to a calendar-bounded (priority x day)
    rollup first; the walk is a per-priority window pass (a running
    sum and a running min of it); the census is 5 rows. The closed
    form is the general template for max(0, state + x) recursions
    (queue depth, battery charge, credit balance) at any scale.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        "o_orderpriority", F.date_trunc("day", F.col("o_orderdate")).alias("d")
    ).agg(F.count(F.lit(1)).alias("placed"))
    rate = daily.groupBy("o_orderpriority").agg(
        F.expr("sum(placed) div count(*)").alias("c")
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    walk = (
        daily.join(rate, "o_orderpriority")
        .withColumn("cum", F.sum(F.col("placed") - F.col("c")).over(w))
        .withColumn("prefix_min", F.min("cum").over(w))
    )
    b = walk.select(
        "o_orderpriority",
        "c",
        (F.col("cum") - F.least(F.col("prefix_min"), F.lit(0))).alias("backlog"),
    )
    return b.groupBy("o_orderpriority").agg(
        F.max("c").alias("service_rate"),
        F.max("backlog").cast("bigint").alias("peak_backlog"),
        F.sum(F.when(F.col("backlog") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("days_with_backlog"),
        F.count(F.lit(1)).alias("n_days"),
    )


# ------------------------------------------- interval union coverage

_COVER_WINDOW_S = 900  # each event opens a 15-minute activity interval


@register(
    "interval_union_coverage",
    tags=("datetime", "window", "events"),
    oracle=f"""
    WITH iv AS (
      SELECT user_id, event_id,
             epoch_us(ts) // 1000000 AS s,
             epoch_us(ts) // 1000000 + {_COVER_WINDOW_S} AS e
      FROM events WHERE user_id IS NOT NULL
    ),
    flagged AS (
      SELECT user_id, s, e,
             CASE WHEN s > COALESCE(MAX(e) OVER (
                    PARTITION BY user_id ORDER BY s, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS new_island,
             event_id
      FROM iv
    ),
    islands AS (
      SELECT user_id, s, e,
             CAST(SUM(new_island) OVER (
                    PARTITION BY user_id ORDER BY s, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS island_id
      FROM flagged
    ),
    spans AS (
      SELECT user_id, island_id, MAX(e) - MIN(s) AS covered
      FROM islands GROUP BY 1, 2
    )
    SELECT user_id,
           COUNT(*) AS n_islands,
           CAST(SUM(covered) AS BIGINT) AS covered_s,
           CAST(MAX(covered) AS BIGINT) AS longest_covered_s
    FROM spans GROUP BY 1
    """,
)
def interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union length of overlapping per-user activity intervals: every
    event opens a 15-minute interval; the answer per user is how many
    distinct seconds the UNION of those intervals covers, in how many
    disjoint islands, and the longest island — the interval-set-algebra
    sibling of ``peak_open_orders`` (which measures concurrency, not
    coverage) and the billing/uptime/engagement-minutes primitive.

    Algorithm: classic single-pass sweep — an interval starts a new
    island iff its start exceeds the running max end of all earlier
    intervals (ROWS ... 1 PRECEDING running max); islands are numbered
    by a running sum of the flag; union length = sum over islands of
    (max end - min start). Epoch-second integers end to end, unique
    event_id as the deterministic tie-break, so the DuckDB oracle
    matches exactly.

    Scale (100 TB): one shuffle on user_id, then two sequential
    window passes and one grouped agg INSIDE each user partition — no
    self-join (the naive interval-overlap formulation is O(n^2) per
    user). Output is user-count-bounded. Skewed users stay single-
    partition by semantics; a hot user would be handled by splitting
    on (user_id, day) with boundary stitching, the documented pattern
    for the sessionization family.

    Reference parity: none (events analytics beyond wordcount/grep);
    SURVEY.md section 2.B window/time-series family.
    """
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    s = F.unix_timestamp("ts")
    iv = ev.select(
        "user_id", "event_id", s.alias("s"), (s + _COVER_WINDOW_S).alias("e")
    )
    order = [F.col("s"), F.col("event_id")]
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = iv.select(
        "user_id", "s", "e", "event_id",
        F.when(
            F.col("s") > F.coalesce(F.max("e").over(w_prev), F.lit(-1)), 1
        ).otherwise(0).alias("new_island"),
    )
    islands = flagged.select(
        "user_id", "s", "e",
        F.sum("new_island").over(w_run).cast("long").alias("island_id"),
    )
    spans = islands.groupBy("user_id", "island_id").agg(
        (F.max("e") - F.min("s")).alias("covered")
    )
    return spans.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("covered").cast("long").alias("covered_s"),
        F.max("covered").cast("long").alias("longest_covered_s"),
    )


# ------------------------------------------ seasonal decomposition

_SEAS_HALF = 12  # centered 25-hour moving average window


@register(
    "seasonal_decompose_hourly",
    tags=("datetime", "stats", "window", "events"),
    oracle=f"""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hr, COUNT(*) AS n
      FROM events GROUP BY 1
    ),
    trended AS (
      SELECT hr, n,
             CAST(SUM(n) OVER w AS BIGINT) * 40 AS trend_milli,
             COUNT(*) OVER w AS w_n
      FROM hourly
      WINDOW w AS (ORDER BY hr
                   ROWS BETWEEN {_SEAS_HALF} PRECEDING
                            AND {_SEAS_HALF} FOLLOWING)
    ),
    dev AS (
      SELECT CAST(EXTRACT(hour FROM hr) AS BIGINT) AS hod,
             n * 1000 - trend_milli AS dev_milli
      FROM trended WHERE w_n = {2 * _SEAS_HALF + 1}
    )
    SELECT hod,
           COUNT(*) AS n_points,
           round(CAST(CAST(SUM(dev_milli) AS BIGINT) AS DOUBLE)
                 / (1000.0 * COUNT(*)), 3) + 0 AS seasonal_dev
    FROM dev GROUP BY 1
    """,
)
def seasonal_decompose_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-lite seasonal decomposition of the hourly event series:
    trend = centered 25-hour moving average (full windows only),
    seasonal component = mean detrended deviation per hour-of-day —
    the additive decomposition behind every "is traffic at 3am
    actually low, or is the day just trending down?" dashboard, and
    the principled input to anomaly thresholds (compare residual, not
    raw count). Complements acf_hourly_events (which only DETECTS the
    daily cycle; this one MEASURES its shape).

    Determinism: the 25-point mean is exact integer milli-units
    (sum * 40 == sum * 1000/25); deviations stay integer until ONE
    final rounded double division — identical IEEE ops cross-engine.

    Scale (100 TB): the fact stream collapses to the hourly rollup
    first (one partial+final agg); the moving-average window and the
    24-key seasonal agg run over that calendar-bounded relation
    (8.8k rows/year), the same constant-size-rollup pattern as
    acf/CUSUM. The un-partitioned window is over that tiny rollup,
    never the events.

    Reference parity: none (wordcount/grep only); SURVEY.md
    section 2.B time-series family.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hr")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = (
        Window.orderBy("hr")
        .rowsBetween(-_SEAS_HALF, _SEAS_HALF)
    )
    trended = hourly.select(
        "hr",
        "n",
        (F.sum("n").over(w).cast("long") * 40).alias("trend_milli"),
        F.count(F.lit(1)).over(w).alias("w_n"),
    )
    dev = trended.where(F.col("w_n") == 2 * _SEAS_HALF + 1).select(
        F.hour("hr").cast("long").alias("hod"),
        (F.col("n") * 1000 - F.col("trend_milli")).alias("dev_milli"),
    )
    return dev.groupBy("hod").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(
            F.sum("dev_milli").cast("long").cast("double")
            / (F.lit(1000.0) * F.count(F.lit(1))),
            3,
        ).alias("seasonal_dev"),
    )


# ------------------------------- Haar wavelet energy signature

# 256 leaf hours -> 8 dyadic levels. The transform is the UNNORMALIZED
# Haar (pair sums and differences, no 1/sqrt2), so every coefficient
# is an exact integer and per-level energies are exact bigint sums in
# any association order.
_HAAR_N = 256
_HAAR_LEVELS = 8


def _haar_oracle() -> str:
    parts = [
        f"""
    WITH hrs AS (
      SELECT epoch_us(ts) // 1000000 // 3600 AS eh FROM events
    ),
    base AS (
      SELECT eh - (SELECT MIN(eh) FROM hrs) AS idx FROM hrs
    ),
    l0 AS (
      SELECT g.i AS idx, CAST(COALESCE(c.n, 0) AS BIGINT) AS a,
             CAST(0 AS BIGINT) AS d
      FROM (SELECT unnest(range(0, {_HAAR_N})) AS i) g
      LEFT JOIN (SELECT idx, COUNT(*) AS n FROM base
                 WHERE idx BETWEEN 0 AND {_HAAR_N - 1} GROUP BY 1) c
        ON c.idx = g.i
    )"""
    ]
    for lvl in range(1, _HAAR_LEVELS + 1):
        parts.append(
            f""",
    l{lvl} AS (
      SELECT idx // 2 AS idx,
             CAST(SUM(a) AS BIGINT) AS a,
             CAST(SUM(CASE WHEN idx % 2 = 0 THEN a ELSE -a END) AS BIGINT) AS d
      FROM l{lvl - 1} GROUP BY 1
    )"""
        )
    selects = [
        f"""
    SELECT CAST({lvl} AS BIGINT) AS level, COUNT(*) AS n_coeffs,
           CAST(SUM(d * d) AS BIGINT) AS detail_energy,
           CAST(MAX(ABS(d)) AS BIGINT) AS max_abs_detail
    FROM l{lvl}"""
        for lvl in range(1, _HAAR_LEVELS + 1)
    ]
    return "".join(parts) + "\n    UNION ALL".join(selects)


@register(
    "haar_energy_hourly",
    tags=("timeseries", "stats", "window"),
    oracle=_haar_oracle(),
)
def haar_energy_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haar wavelet energy signature of the hourly event-count series
    (first {n} hours from the stream's start, missing hours zero):
    per dyadic level, the number of detail coefficients, their total
    energy, and the largest coefficient magnitude — the multi-scale
    burstiness fingerprint that separates fast jitter (energy in the
    fine levels) from diurnal/weekly structure (energy in the coarse
    levels), complementing the single-scale ACF screen above.

    Transform: the UNNORMALIZED Haar — level l pairs adjacent level
    l-1 approximations into sum (a) and difference (d) — so every
    coefficient is an exact integer and the per-level energy is an
    exact bigint sum in any order. No floats anywhere. (At hourly
    counts beyond ~3e9 the d^2 lane should widen to DECIMAL(38,0) on
    both engines, same exact result.)

    Scale (100 TB): events collapse to the {n}-hour count grid in one
    partial+final agg; all {m} pyramid levels run over that bounded
    relation (<= {n} rows, halving per level) — constant work at any
    event volume.

    Reference parity: none (wordcount/grep only); SURVEY.md
    section 2.B timeseries/stats family.
    """.format(n=_HAAR_N, m=_HAAR_LEVELS)
    events = load_table(spark, sf_dir, "events")
    hrs = events.select(F.expr("unix_timestamp(ts) div 3600").alias("eh"))
    # scalar min as a broadcast cross join (never a global window over
    # the event scan)
    mn = hrs.agg(F.min("eh").alias("mn"))
    base = hrs.crossJoin(F.broadcast(mn)).select(
        (F.col("eh") - F.col("mn")).alias("idx")
    )
    counts = (
        base.where((F.col("idx") >= 0) & (F.col("idx") <= _HAAR_N - 1))
        .groupBy("idx")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # truncate_plan (round-9): the final UNION has one branch per
    # level and each branch replays its whole lineage — without the
    # cut, the events scan + hour rollup ran 8 times (once per level).
    # The grid is a bounded 256-row relation; cutting here makes every
    # branch read it instead of the stream. Same rows, same integers.
    grid = (
        spark.range(_HAAR_N)
        .select(F.col("id").alias("idx"))
        .join(F.broadcast(counts), "idx", "left")
        .select("idx", F.coalesce("n", F.lit(0)).cast("bigint").alias("a"))
        .transform(truncate_plan)
    )
    levels = []
    cur = grid
    for lvl in range(1, _HAAR_LEVELS + 1):
        cur = cur.groupBy(F.expr("idx div 2").alias("idx")).agg(
            F.sum("a").cast("bigint").alias("a"),
            F.sum(
                F.when(F.col("idx") % 2 == 0, F.col("a")).otherwise(-F.col("a"))
            )
            .cast("bigint")
            .alias("d"),
        )
        levels.append(
            cur.agg(
                F.lit(lvl).cast("bigint").alias("level"),
                F.count(F.lit(1)).alias("n_coeffs"),
                F.sum(F.col("d") * F.col("d")).cast("bigint").alias("detail_energy"),
                F.max(F.abs("d")).cast("bigint").alias("max_abs_detail"),
            )
        )
    out = levels[0]
    for df in levels[1:]:
        out = out.unionAll(df)
    return out


# ------------------- forecast backtest: MASE of the seasonal naive


MASE_PERIOD = 24  # seasonal lag, hours


@register(
    "mase_seasonal_naive_hourly",
    tags=("stats", "window", "timeseries"),
    oracle=f"""
    WITH c AS (
      SELECT event_type,
             epoch_us(ts) // 1000000 // 3600 AS hi,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ),
    err AS (
      SELECT t.event_type,
             CASE WHEN p1.cnt IS NOT NULL THEN abs(t.cnt - p1.cnt) END AS e1,
             CASE WHEN pm.cnt IS NOT NULL THEN abs(t.cnt - pm.cnt) END AS em
      FROM c t
      LEFT JOIN c p1 ON p1.event_type = t.event_type AND p1.hi = t.hi - 1
      LEFT JOIN c pm ON pm.event_type = t.event_type
                    AND pm.hi = t.hi - {MASE_PERIOD}
    )
    SELECT event_type,
           CAST(COUNT(e1) AS BIGINT)           AS n_naive,
           CAST(SUM(e1)   AS BIGINT)           AS abs_err_naive,
           CAST(COUNT(em) AS BIGINT)           AS n_seasonal,
           CAST(SUM(em)   AS BIGINT)           AS abs_err_seasonal,
           CAST(ROUND(1000.0 * SUM(em) * COUNT(e1)
                      / (COUNT(em) * SUM(e1))) AS BIGINT) AS mase_milli
    FROM err GROUP BY event_type
    ORDER BY event_type
    """,
)
def mase_seasonal_naive_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast backtest: MASE (mean absolute scaled error) of the
    {m}-hour seasonal-naive forecast ``y_hat(t) = y(t-{m})`` per event
    type, scaled by the one-step naive ``y(t-1)`` — the standard
    scale-free answer to "does this series have exploitable daily
    seasonality" (MASE < 1000 milli => the seasonal forecast beats
    last-hour-carried-forward). Grid gaps are handled by equi-joining
    each hour to hour-1 and hour-{m} DIRECTLY (never a row-offset lag,
    which both fabricates comparisons across gaps and misaligns every
    row after one), so a missing hour removes exactly its own
    comparisons.

    Determinism lane: counts and absolute errors are exact BIGINTs;
    the only double is the final cross-multiplied ratio, rounded to
    integer milli-units.

    Scale (100 TB): events collapse to the CALENDAR-bounded
    (type x hour) rollup in one partial+final agg; the two lag equi-joins and
    the MASE census run over that rollup (|types| x span rows), never
    the raw stream — the same bounded-grain discipline as the
    ACF/CUSUM family above. Reference parity: none;
    SURVEY.md section 2.B timeseries family.
    """.format(m=MASE_PERIOD)
    events = load_table(spark, sf_dir, "events")
    # truncate_plan (round-9): c self-joins twice below (the hour-1
    # and hour-PERIOD shifts), so without the cut the events scan +
    # rollup ran three times per invocation. c is calendar-bounded.
    c = (
        events.groupBy(
            "event_type",
            F.expr("unix_timestamp(ts) div 3600").alias("hi"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .transform(truncate_plan)
    )
    p1 = c.select(
        "event_type", (F.col("hi") + 1).alias("hi"), F.col("cnt").alias("c1")
    )
    pm = c.select(
        "event_type",
        (F.col("hi") + MASE_PERIOD).alias("hi"),
        F.col("cnt").alias("cm"),
    )
    err = (
        c.join(p1, ["event_type", "hi"], "left")
        .join(pm, ["event_type", "hi"], "left")
        .select(
            "event_type",
            F.when(
                F.col("c1").isNotNull(), F.abs(F.col("cnt") - F.col("c1"))
            ).alias("e1"),
            F.when(
                F.col("cm").isNotNull(), F.abs(F.col("cnt") - F.col("cm"))
            ).alias("em"),
        )
    )
    return (
        err.groupBy("event_type")
        .agg(
            F.count("e1").cast("bigint").alias("n_naive"),
            F.sum("e1").cast("bigint").alias("abs_err_naive"),
            F.count("em").cast("bigint").alias("n_seasonal"),
            F.sum("em").cast("bigint").alias("abs_err_seasonal"),
            F.round(
                1000.0
                * F.sum("em")
                * F.count("e1")
                / (F.count("em") * F.sum("e1"))
            )
            .cast("bigint")
            .alias("mase_milli"),
        )
        .orderBy("event_type")
    )


# ------------- cross-correlation between event-type series (CCF)

_CCF_LAGS = (-24, -1, 0, 1, 24)


@register(
    "ccf_event_types_hourly",
    tags=("datetime", "stats", "events", "join"),
    oracle=f"""
    WITH hourly AS (
      SELECT event_type, epoch_us(date_trunc('hour', ts)) // 3600000000 AS hi,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    b AS (SELECT epoch_us(date_trunc('hour', MIN(ts))) // 3600000000 AS lo,
                 epoch_us(date_trunc('hour', MAX(ts))) // 3600000000 AS hi
          FROM events),
    spine AS (SELECT t.event_type, s.hi
              FROM (SELECT DISTINCT event_type FROM events) t,
                   (SELECT unnest(generate_series(lo, hi)) AS hi FROM b) s),
    dense AS (
      SELECT s.event_type, s.hi, COALESCE(h.n, 0) AS x
      FROM spine s LEFT JOIN hourly h
        ON h.event_type = s.event_type AND h.hi = s.hi
    ),
    pairs AS (
      SELECT a.event_type AS type_a, c.event_type AS type_b, l.lag,
             a.x AS x, c.x AS y
      FROM dense a
      JOIN (VALUES {", ".join(f"({lg})" for lg in _CCF_LAGS)}) AS l(lag)
        ON TRUE
      JOIN dense c
        ON c.hi = a.hi + l.lag AND a.event_type < c.event_type
    ),
    m AS (
      SELECT type_a, type_b, lag,
             COUNT(*) AS n_pairs,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM pairs GROUP BY 1, 2, 3
    )
    SELECT type_a, type_b, lag, n_pairs,
           ROUND(CAST(n_pairs * sxy - sx * sy AS DOUBLE)
                 / NULLIF(sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE))
                          * sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE)), 0.0),
                 6) + 0 AS ccf
    FROM m ORDER BY type_a, type_b, lag
    """,
)
def ccf_event_types_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation function between every PAIR of event-type
    hourly series at lags {lags} — does one behavior lead another
    (views at hour t vs purchases at t+1), the pairwise companion to
    the per-series ACF above. ccf(a, b, L) = Pearson r of
    (x_a(t), x_b(t+L)) over the DENSE hourly grid (missing hours are
    true zeros, exactly the ACF densification rule).

    Determinism lane: identical to ACF — exact BIGINT moment sums,
    then one fixed double expression rounded at 6 dp; NULLIF guards
    constant series.

    Scale (100 TB): the stream collapses once to the calendar-bounded
    (type x hour) rollup; the lag alignment is an EQUI-join on the
    hour index (types_a < types_b keeps each unordered pair once,
    negative lags cover "b leads a"), so the pair relation is
    |type pairs| x span x |lags| — bounded by calendar and the enum
    domain, independent of event volume. Reference parity: none;
    SURVEY.md section 2.B timeseries family.
    """.format(lags=_CCF_LAGS)
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type",
        F.expr("unix_timestamp(date_trunc('hour', ts)) div 3600").alias("hi"),
    ).agg(F.count(F.lit(1)).alias("n"))
    bounds = events.agg(
        F.expr("unix_timestamp(date_trunc('hour', min(ts))) div 3600").alias("lo"),
        F.expr("unix_timestamp(date_trunc('hour', max(ts))) div 3600").alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("hi")
    )
    types = events.select("event_type").distinct()
    # NO truncate_plan here (round-9, measured): cutting the two-sided
    # replay regressed the A/B outright (warm min 0.96-1.05 s ->
    # 1.28-1.49 s) — the checkpointed grid loses the stats the pair
    # join plans with. See acf_hourly_events for the full reasoning.
    dense = (
        types.crossJoin(F.broadcast(spine))
        .join(hourly, ["event_type", "hi"], "left")
        .select("event_type", "hi", F.coalesce("n", F.lit(0)).alias("x"))
    )
    lags = spark.range(1).select(
        F.explode(F.array(*[F.lit(lg) for lg in _CCF_LAGS])).alias("lag")
    )
    a = dense.alias("a").crossJoin(F.broadcast(lags))
    c = dense.select(
        F.col("event_type").alias("type_b"),
        F.col("hi").alias("hi_b"),
        F.col("x").alias("y"),
    )
    pairs = a.join(
        c,
        (F.col("hi_b") == F.col("a.hi") + F.col("lag"))
        & (F.col("a.event_type") < F.col("type_b")),
    ).select(
        F.col("a.event_type").alias("type_a"),
        "type_b",
        "lag",
        F.col("a.x").alias("x"),
        "y",
    )
    m = pairs.groupBy("type_a", "type_b", "lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n_pairs"), F.col("sx"), F.col("sy")
    num = (n * F.col("sxy") - sx * sy).cast("double")
    den = F.sqrt((n * F.col("sxx") - sx * sx).cast("double")) * F.sqrt(
        (n * F.col("syy") - sy * sy).cast("double")
    )
    return m.select(
        "type_a",
        "type_b",
        "lag",
        "n_pairs",
        F.round(num / F.nullif(den, F.lit(0.0)), 6).alias("ccf"),
    ).orderBy("type_a", "type_b", "lag")


# -------- partial autocorrelation (Durbin-Levinson, lags 1..3)


@register(
    "pacf_hourly_events",
    tags=("datetime", "stats", "events", "window"),
    oracle=f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hr, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    b AS (SELECT date_trunc('hour', MIN(ts)) AS lo,
                 date_trunc('hour', MAX(ts)) AS hi FROM events),
    spine AS (SELECT t.event_type, s.hr
              FROM (SELECT DISTINCT event_type FROM events) t,
                   (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
                    FROM b) s),
    dense AS (
      SELECT s.event_type, s.hr, COALESCE(h.n, 0) AS x
      FROM spine s LEFT JOIN hourly h
        ON h.event_type = s.event_type AND h.hr = s.hr
    ),
    lagged AS (
      SELECT event_type, lag, x, y FROM (
        SELECT event_type, l.lag, x,
               lead(x, l.lag) OVER (PARTITION BY event_type, l.lag
                                    ORDER BY hr) AS y
        FROM dense, (VALUES (1), (2), (3)) AS l(lag)
      ) WHERE y IS NOT NULL
    ),
    m AS (
      SELECT event_type, lag, COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM lagged GROUP BY 1, 2
    ),
    acf AS (
      SELECT event_type, lag,
             ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                   / NULLIF(sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                            * sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 0.0),
                   6) AS r
      FROM m
    ),
    piv AS (
      SELECT event_type,
             MAX(CASE WHEN lag = 1 THEN r END) AS r1,
             MAX(CASE WHEN lag = 2 THEN r END) AS r2,
             MAX(CASE WHEN lag = 3 THEN r END) AS r3
      FROM acf GROUP BY event_type
    ),
    lev AS (
      SELECT event_type, r1, r2, r3,
             (r2 - r1 * r1) / NULLIF(1.0 - r1 * r1, 0.0) AS p22
      FROM piv
    )
    SELECT event_type,
           ROUND(r1, 6) + 0 AS pacf1,
           ROUND(p22, 6) + 0 AS pacf2,
           ROUND((r3 - (r1 - p22 * r1) * r2 - p22 * r1)
                 / NULLIF((1.0 - r1 * r1) * (1.0 - p22 * p22), 0.0), 6) + 0
               AS pacf3
    FROM lev ORDER BY event_type
    """,
)
def pacf_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of the dense hourly event-count series
    per type at lags 1-3 via the unrolled Durbin-Levinson recursion —
    the Box-Jenkins AR-order screen the plain ACF can't give (an AR(1)
    process has geometric ACF at every lag but PACF that CUTS OFF
    after lag 1).

    Determinism lane: the three ACF inputs are the package's exact
    integer moment form ROUNDED AT 6 dp (a quantization barrier), and
    the recursion on those quantized values is one identical double
    expression tree per engine — φ22 = (r2−r1²)/(1−r1²), φ33 =
    (r3 − φ21 r2 − φ22 r1)/((1−r1²)(1−φ22²)) with φ21 = r1(1−φ22).

    Scale (100 TB): identical to the ACF — everything runs over the
    calendar-bounded dense (type x hour) rollup; the recursion is
    |types|-row arithmetic. Reference parity: none;
    SURVEY.md section 2.B timeseries family.
    """
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(F.count(F.lit(1)).alias("n"))
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("hr")
    )
    types = events.select("event_type").distinct()
    # NO truncate_plan here (round-9, measured): same call as
    # acf_hourly_events — the cut regressed the A/B (warm min
    # 1.26-1.46 s -> 1.51-1.72 s) despite the three-branch replay.
    dense = (
        types.crossJoin(F.broadcast(spine))
        .join(hourly, ["event_type", "hr"], "left")
        .select("event_type", "hr", F.coalesce("n", F.lit(0)).alias("x"))
    )
    per_lag = []
    for lag in (1, 2, 3):
        w = Window.partitionBy("event_type").orderBy("hr")
        per_lag.append(
            dense.select(
                "event_type",
                F.lit(lag).alias("lag"),
                F.col("x"),
                F.lead("x", lag).over(w).alias("y"),
            ).filter(F.col("y").isNotNull())
        )
    lagged = per_lag[0].unionByName(per_lag[1]).unionByName(per_lag[2])
    m = lagged.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    num = (n * F.col("sxy") - sx * sy).cast("double")
    den = F.sqrt((n * F.col("sxx") - sx * sx).cast("double")) * F.sqrt(
        (n * F.col("syy") - sy * sy).cast("double")
    )
    acf = m.select(
        "event_type",
        "lag",
        F.round(num / F.nullif(den, F.lit(0.0)), 6).alias("r"),
    )
    piv = acf.groupBy("event_type").agg(
        F.max(F.when(F.col("lag") == 1, F.col("r"))).alias("r1"),
        F.max(F.when(F.col("lag") == 2, F.col("r"))).alias("r2"),
        F.max(F.when(F.col("lag") == 3, F.col("r"))).alias("r3"),
    )
    r1, r2, r3 = F.col("r1"), F.col("r2"), F.col("r3")
    p22 = (r2 - r1 * r1) / F.nullif(F.lit(1.0) - r1 * r1, F.lit(0.0))
    lev = piv.select("event_type", "r1", "r2", "r3", p22.alias("p22"))
    p22c = F.col("p22")
    return lev.select(
        "event_type",
        F.round(r1, 6).alias("pacf1"),
        F.round(p22c, 6).alias("pacf2"),
        F.round(
            (r3 - (r1 - p22c * r1) * r2 - p22c * r1)
            / F.nullif(
                (F.lit(1.0) - r1 * r1) * (F.lit(1.0) - p22c * p22c),
                F.lit(0.0),
            ),
            6,
        ).alias("pacf3"),
    ).orderBy("event_type")


# ------------- Hurst exponent (rescaled-range analysis, R/S)

_HURST_SIZES = (8, 16, 32, 64)  # log2 sizes 3..6


@register(
    "hurst_rs_hourly",
    tags=("datetime", "stats", "events", "window"),
    oracle=f"""
    WITH hrs AS (
      SELECT event_type, epoch_us(ts) // 1000000 // 3600 AS eh FROM events
    ),
    mn AS (SELECT event_type, MIN(eh) AS lo, MAX(eh) AS hi
           FROM hrs GROUP BY 1),
    counts AS (
      SELECT event_type, eh, COUNT(*) AS n FROM hrs GROUP BY 1, 2
    ),
    spine AS (
      SELECT event_type, lo,
             unnest(generate_series(0, hi - lo)) AS idx
      FROM mn
    ),
    dense AS (
      SELECT sp.event_type, sp.idx, COALESCE(c.n, 0) AS x
      FROM spine sp LEFT JOIN counts c
        ON c.event_type = sp.event_type AND c.eh = sp.lo + sp.idx
    ),
    win AS (
      SELECT d.event_type, s.s, d.idx // s.s AS w,
             ROW_NUMBER() OVER (PARTITION BY d.event_type, s.s, d.idx // s.s
                                ORDER BY d.idx) AS j,
             SUM(d.x) OVER (PARTITION BY d.event_type, s.s, d.idx // s.s
                            ORDER BY d.idx) AS p,
             SUM(d.x) OVER (PARTITION BY d.event_type, s.s, d.idx // s.s)
                 AS total,
             SUM(d.x * d.x) OVER (PARTITION BY d.event_type, s.s,
                                  d.idx // s.s) AS sxx,
             COUNT(*) OVER (PARTITION BY d.event_type, s.s, d.idx // s.s)
                 AS wn
      FROM dense d,
           (VALUES {", ".join(f"({s})" for s in _HURST_SIZES)}) AS s(s)
    ),
    wstat AS (
      SELECT event_type, s, w,
             CAST(MAX(s * p - j * total) - MIN(s * p - j * total) AS BIGINT)
                 AS r_scaled,
             CAST(MAX(s * sxx - total * total) AS BIGINT) AS s2_scaled
      FROM win WHERE wn = s
      GROUP BY 1, 2, 3
    ),
    wlog AS (
      SELECT event_type, s,
             CAST(ROUND(1000000.0 * ln(r_scaled
                                       / sqrt(CAST(s2_scaled AS DOUBLE)))
                        / ln(2.0)) AS BIGINT) AS log2rs_micro
      FROM wstat WHERE s2_scaled > 0 AND r_scaled > 0
    ),
    bysize AS (
      SELECT event_type, s,
             CAST(ROUND(AVG(CAST(log2rs_micro AS DOUBLE))) AS BIGINT)
                 AS m_micro
      FROM wlog GROUP BY 1, 2
    ),
    piv AS (
      SELECT event_type,
             MAX(CASE WHEN s = 8  THEN m_micro END) AS y3,
             MAX(CASE WHEN s = 16 THEN m_micro END) AS y4,
             MAX(CASE WHEN s = 32 THEN m_micro END) AS y5,
             MAX(CASE WHEN s = 64 THEN m_micro END) AS y6
      FROM bysize GROUP BY 1
    )
    SELECT event_type, y3 AS m8_micro, y4 AS m16_micro,
           y5 AS m32_micro, y6 AS m64_micro,
           CAST(ROUND((-3.0 * y3 - y4 + y5 + 3.0 * y6) / 10000.0) AS BIGINT)
               AS hurst_milli
    FROM piv ORDER BY event_type
    """,
)
def hurst_rs_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of the hourly event-count series per type via
    classical rescaled-range (R/S) analysis over window sizes
    {sizes}: H ≈ 0.5 for memoryless arrivals, > 0.5 for long-range
    persistence (the burstiness diagnostic that decides whether
    capacity planning can assume Poisson).

    Determinism lane: within each window, the cumulative deviation is
    kept EXACTLY integer by scaling through the window size
    (c_j = s·prefix_j − j·total, R_scaled = max−min; s²·var =
    s·Σx² − (Σx)² likewise), so the only libm is one
    ln(R_scaled/√S²_scaled) per window, quantized to micro before
    averaging; the final slope over the four (log2 s, mean) points is
    the closed-form OLS (−3y₃−y₄+y₅+3y₆)/10 on exact integers.

    Scale (100 TB): the stream collapses once to the calendar-bounded
    dense grid; the 4-size fan-out multiplies the GRID, not the
    stream; every window partition is ≤ 64 rows. Reference parity:
    none; SURVEY.md section 2.B timeseries family.
    """.format(sizes=_HURST_SIZES)
    events = load_table(spark, sf_dir, "events")
    hrs = events.select(
        "event_type", F.expr("unix_timestamp(ts) div 3600").alias("eh")
    )
    mn = hrs.groupBy("event_type").agg(
        F.min("eh").alias("lo"), F.max("eh").alias("hi")
    )
    counts = hrs.groupBy("event_type", "eh").agg(F.count(F.lit(1)).alias("n"))
    dense = (
        mn.select(
            "event_type",
            "lo",
            F.explode(F.sequence(F.lit(0), F.col("hi") - F.col("lo"))).alias(
                "idx"
            ),
        )
        .join(
            counts.select(
                "event_type", F.col("eh").alias("abs_eh"), "n"
            ),
            (F.col("abs_eh") == F.col("lo") + F.col("idx"))
            & (counts["event_type"] == mn["event_type"]),
            "left",
        )
        .select(
            mn["event_type"].alias("event_type"),
            "idx",
            F.coalesce("n", F.lit(0)).alias("x"),
        )
        # NO truncate_plan here (round-9, measured): dense has exactly
        # ONE consumer (the size fan-out below), so there is no branch
        # replay to cut — the eager checkpoint only added its own job
        # (A/B warm min 1.03 -> 1.94 s, strictly worse).
    )
    sizes = spark.range(1).select(
        F.explode(F.array(*[F.lit(s) for s in _HURST_SIZES])).alias("s")
    )
    fan = dense.crossJoin(F.broadcast(sizes)).withColumn(
        "w", F.expr("idx div s")
    )
    wp = Window.partitionBy("event_type", "s", "w")
    wo = wp.orderBy("idx")
    win = fan.select(
        "event_type",
        "s",
        "w",
        F.row_number().over(wo).alias("j"),
        F.sum("x").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias("p"),
        F.sum("x").over(wp).alias("total"),
        F.sum(F.col("x") * F.col("x")).over(wp).alias("sxx"),
        F.count(F.lit(1)).over(wp).alias("wn"),
    ).where(F.col("wn") == F.col("s"))
    c = F.col("s") * F.col("p") - F.col("j") * F.col("total")
    wstat = win.groupBy("event_type", "s", "w").agg(
        (F.max(c) - F.min(c)).cast("bigint").alias("r_scaled"),
        F.max(F.col("s") * F.col("sxx") - F.col("total") * F.col("total"))
        .cast("bigint")
        .alias("s2_scaled"),
    )
    wlog = wstat.where(
        (F.col("s2_scaled") > 0) & (F.col("r_scaled") > 0)
    ).select(
        "event_type",
        "s",
        F.round(
            1000000.0
            * F.log(
                F.col("r_scaled")
                / F.sqrt(F.col("s2_scaled").cast("double"))
            )
            / F.log(F.lit(2.0))
        )
        .cast("bigint")
        .alias("log2rs_micro"),
    )
    bysize = wlog.groupBy("event_type", "s").agg(
        F.round(F.avg(F.col("log2rs_micro").cast("double")))
        .cast("bigint")
        .alias("m_micro")
    )
    piv = bysize.groupBy("event_type").agg(
        F.max(F.when(F.col("s") == 8, F.col("m_micro"))).alias("y3"),
        F.max(F.when(F.col("s") == 16, F.col("m_micro"))).alias("y4"),
        F.max(F.when(F.col("s") == 32, F.col("m_micro"))).alias("y5"),
        F.max(F.when(F.col("s") == 64, F.col("m_micro"))).alias("y6"),
    )
    return piv.select(
        "event_type",
        F.col("y3").alias("m8_micro"),
        F.col("y4").alias("m16_micro"),
        F.col("y5").alias("m32_micro"),
        F.col("y6").alias("m64_micro"),
        F.round(
            (
                -3.0 * F.col("y3")
                - F.col("y4")
                + F.col("y5")
                + 3.0 * F.col("y6")
            )
            / 10000.0
        )
        .cast("bigint")
        .alias("hurst_milli"),
    ).orderBy("event_type")
