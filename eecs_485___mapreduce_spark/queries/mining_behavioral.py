"""Behavioral / sequence mining over the events stream (split from
mining.py along its docstring family lines, round 5): first-order
Markov transition matrix, first/last-touch attribution,
fixed-vocabulary pivot, RFM quintile segmentation, and trigram path
mining.

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
from ..sources import load_table


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


