r"""Closed-form statistical mining (the statistics family of the
former monolithic mining.py — split along its docstring family lines
in round 5; the graph / text-similarity / behavioral / data-layout
families now live in mining_graph.py, mining_text.py,
mining_behavioral.py, mining_layout.py):

- group-wise OLS regression (five exact moment sums),
- Pearson chi-square independence census,
- two-sample Kolmogorov-Smirnov drift detection,
- trailing-window z-score anomaly detection (3-sigma in exact
  integers; the streaming twin imports its constants),
- Mann-Whitney U, difference-in-differences, Poisson bootstrap CI,
- A/B conversion z-test, survival/hazard census,
- Laspeyres price index, mix-shift decomposition,
- Pareto (80/20) revenue census.

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

from ..functions import md5_long_sql, scoped_persist
from ..registry import register
from ..sources import load_table, load_tables


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
                   / CAST(n * sxx - sx * sx AS DOUBLE), 6) + 0 END AS slope,
           CASE WHEN n * sxx - sx * sx <> 0 THEN
             ROUND((CAST(sy AS DOUBLE)
                    - (CAST(n * sxy - sx * sy AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
                   / CAST(n AS DOUBLE), 6) + 0 END           AS intercept,
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
    # Replicate fan-out as a scan-side Generate and the Poisson(1)
    # weight as a constant fold (round-9, guide-standard "no
    # accidental nested-loop joins"): the CDF thresholds are known at
    # plan time, and the buckets are contiguous [lo, hi) starting at
    # 0, so bucket membership == counting the upper boundaries at or
    # below u32 — w = sum_k(u32 >= hi_k) over the first MAX_W bucket
    # bounds (an empty bucket, hi_k == hi_{k+1}, is skipped by both
    # formulations identically; u32 past every bound lands on the
    # lumped MAX_W bucket). This replaces a 32-row BNLJ fan-out plus
    # an INEQUALITY BNLJ against the threshold table (~9 predicate
    # evaluations per fanned row, off codegen) with two projections —
    # same rows, exact integer math, oracle replays its own range
    # join unchanged.
    bounds = [hi for _w, _lo, hi in _BOOT_ROWS[:-1]]
    w_expr = sum(
        (F.col("u32") >= F.lit(bk)).cast("long") for bk in bounds
    )
    weighted = (
        v.select(
            "o_orderkey",
            "cents",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.lit(_BOOT_B - 1).cast("long"))
            ).alias("b"),
        )
        .withColumn("u32", u32)
        .withColumn("w", w_expr)
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
           CASE WHEN t.n_a * t.n_b > 0
                THEN CAST(ROUND(1000.0
                      * (r.rank_sum_a_x2 - t.n_a * (t.n_a + 1 + t.n_b))
                      / (1.0 * t.n_a * t.n_b)) AS BIGINT)
                ELSE NULL END AS rank_biserial_milli
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
    # Effect size is undefined when EITHER sample is empty: explicit
    # NULL on both engines — when only ONE tested source exists, n_a
    # or n_b is 0 (not NULL), so the old unguarded division threw
    # DIVIDE_BY_ZERO under ANSI where DuckDB quietly NULLed (caught by
    # the r7 edge corpus gaining a src0 doc with no src1).
    u_a_floor = F.expr("(rank_sum_a_x2 - n_a * (n_a + 1)) div 2")
    biserial = F.when(
        F.col("n_a") * F.col("n_b") > 0,
        F.round(
            F.lit(1000.0)
            * (
                F.col("rank_sum_a_x2")
                - F.col("n_a") * (F.col("n_a") + 1 + F.col("n_b"))
            ).cast("double")
            / (F.lit(1.0) * F.col("n_a") * F.col("n_b"))
        ).cast("long"),
    )
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


