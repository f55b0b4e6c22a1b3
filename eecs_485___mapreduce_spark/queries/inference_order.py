"""Order-statistic and sequential-decision inference: Theil-Sen
robust trend (median of pairwise slopes), Kaplan-Meier survival of
inter-order gaps, split-conformal prediction intervals, Wasserstein-1
distance, exact Spearman rank correlation, Benjamini-Hochberg FDR over
the KS drift matrix, and the deterministic UCB1 bandit replay.

Split out of queries/inference.py along its docstring family lines
(the hypothesis-test half stays there); same shared discipline: every
float is a ratio of exact integers through one deterministic libm
call, quantized BEFORE aggregation, so sums are exact bigint
arithmetic in any association order.

Reference parity: none of these exist in the reference (its query
surface is wordcount + grep, mapreduce/__init__.py); they are
committed statistics families from SURVEY.md section 2.B.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import md5_long, md5_long_sql, tokens
from ..registry import register
from ..sources import load_table

# The whitespace tokenizer and the KS census this module's FDR query
# builds on live with the hypothesis-test half.
from .inference import _TOKS, ks_doclen_sources

# ------------------------------- Theil-Sen robust trend (median of slopes)


@register(
    "theilsen_monthly_revenue",
    tags=("stats", "window", "agg"),
    oracle="""
    WITH m AS (
      SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS mi,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS rev_cents
      FROM orders GROUP BY 1
    ),
    m0 AS (SELECT mi - MIN(mi) OVER () AS x, rev_cents FROM m),
    sl AS (
      SELECT CAST(ROUND(1000000.0 * (b.rev_cents - a.rev_cents)
                        / (b.x - a.x)) AS BIGINT) AS s
      FROM m0 a JOIN m0 b ON a.x < b.x
    ),
    rs AS (SELECT s, ROW_NUMBER() OVER (ORDER BY s) AS rn,
                  COUNT(*) OVER () AS n FROM sl),
    med AS (SELECT CAST(SUM(CASE WHEN rn IN ((n + 1) // 2, (n + 2) // 2)
                               THEN s END) AS BIGINT) AS s2,
                   MAX(n) AS n_pairs
            FROM rs),
    resid AS (
      SELECT 1000000.0 * m0.rev_cents
               - (CAST(med.s2 AS DOUBLE) / 2.0) * m0.x AS r
      FROM m0, med
    ),
    rr AS (SELECT r, ROW_NUMBER() OVER (ORDER BY r) AS rn,
                  COUNT(*) OVER () AS n FROM resid)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM m0)   AS n_months,
           (SELECT n_pairs FROM med)                   AS n_pairs,
           (SELECT s2 FROM med)                        AS slope_micro_x2,
           CAST(ROUND(SUM(CASE WHEN rn IN ((n + 1) // 2, (n + 2) // 2)
                            THEN r END)) AS BIGINT)    AS icept_micro_x2
    FROM rr
    """,
)
def theilsen_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of monthly revenue: the MEDIAN of all
    pairwise slopes (and the median-residual intercept) — the
    breakdown-point-29% complement to mining.py's least-squares OLS,
    immune to the outlier months that pull a mean-based fit.

    Determinism lane: revenue is exact integer cents; each pairwise
    slope is quantized to integer micro-cents/month BEFORE ranking, so
    the median selection compares BIGINTs; the only doubles are the
    final fixed expression tree (sum of the two middle values / 2,
    residuals against a 0-based month index so every product stays
    < 2^53 — exactly representable).

    Scale (100 TB): orders collapse to the CALENDAR-bounded month
    relation first (one partial+final agg); the pairwise self-join and
    both median windows run over months^2/2 rows (3.2k here, bounded
    by calendar span squared, independent of row count) — the
    bounded-relation global-window pattern every temporal statistic in
    this package uses. Reference parity: none (no stats surface);
    SURVEY.md section 2.B statistics family.
    """
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("bigint")
        .alias("mi")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev_cents")
    )
    w_all = Window.partitionBy()
    m0 = m.select(
        (F.col("mi") - F.min("mi").over(w_all)).alias("x"), "rev_cents"
    )
    a, b = m0.alias("a"), m0.alias("b")
    sl = a.join(b, F.col("a.x") < F.col("b.x")).select(
        F.round(
            1000000.0
            * (F.col("b.rev_cents") - F.col("a.rev_cents"))
            / (F.col("b.x") - F.col("a.x"))
        )
        .cast("bigint")
        .alias("s")
    )
    rs = sl.select(
        "s",
        F.row_number().over(Window.orderBy("s")).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    med = rs.agg(
        F.sum(
            F.when(
                (F.col("rn") == F.expr("(n + 1) div 2"))
                | (F.col("rn") == F.expr("(n + 2) div 2")),
                F.col("s"),
            )
        )
        .cast("bigint")
        .alias("s2"),
        F.max("n").cast("bigint").alias("n_pairs"),
    )
    resid = m0.crossJoin(F.broadcast(med)).select(
        (
            1000000.0 * F.col("rev_cents")
            - (F.col("s2").cast("double") / 2.0) * F.col("x")
        ).alias("r"),
        "n_pairs",
        "s2",
    )
    rr = resid.select(
        "r",
        "n_pairs",
        "s2",
        F.row_number().over(Window.orderBy("r")).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    return rr.agg(
        F.max("n").cast("bigint").alias("n_months"),
        F.max("n_pairs").alias("n_pairs"),
        F.max("s2").alias("slope_micro_x2"),
        F.round(
            F.sum(
                F.when(
                    (F.col("rn") == F.expr("(n + 1) div 2"))
                    | (F.col("rn") == F.expr("(n + 2) div 2")),
                    F.col("r"),
                )
            )
        )
        .cast("bigint")
        .alias("icept_micro_x2"),
    )


# --------------------- Kaplan-Meier survival of inter-order gaps


@register(
    "kaplan_meier_reorder_gaps",
    tags=("stats", "window", "datetime"),
    oracle="""
    WITH d AS (
      SELECT o_custkey, epoch_us(o_orderdate) // 86400000000 AS day
      FROM orders
    ),
    mx AS (SELECT MAX(day) AS horizon FROM d),
    seq AS (
      SELECT o_custkey, day,
             LEAD(day) OVER (PARTITION BY o_custkey ORDER BY day, o_custkey)
                 AS nxt
      FROM (SELECT DISTINCT o_custkey, day FROM d)
    ),
    dur AS (
      SELECT CASE WHEN nxt IS NULL THEN (SELECT horizon FROM mx) - day
                  ELSE nxt - day END AS gap_days,
             CASE WHEN nxt IS NULL THEN 0 ELSE 1 END AS ev
      FROM seq
    ),
    census AS (
      SELECT gap_days,
             CAST(SUM(ev) AS BIGINT)     AS n_events,
             CAST(SUM(1 - ev) AS BIGINT) AS n_censored
      FROM dur GROUP BY gap_days
    ),
    risk AS (
      SELECT gap_days, n_events, n_censored,
             CAST(SUM(n_events + n_censored)
                  OVER (ORDER BY gap_days DESC) AS BIGINT) AS n_risk
      FROM census
    ),
    terms AS (
      SELECT gap_days, n_events, n_censored, n_risk,
             CASE WHEN n_events < n_risk
                  THEN CAST(ROUND(1000000 * ln(1.0 - CAST(n_events AS DOUBLE)
                                                     / n_risk)) AS BIGINT)
             END AS t_micro,
             CASE WHEN n_events >= n_risk THEN 1 ELSE 0 END AS dead
      FROM risk WHERE n_events > 0
    )
    SELECT gap_days, n_risk, n_events, n_censored,
           CASE WHEN SUM(dead) OVER w > 0 THEN 0
                ELSE CAST(ROUND(1000000 * exp(CAST(SUM(t_micro) OVER w
                                                   AS DOUBLE) / 1000000))
                          AS BIGINT)
           END AS surv_micro
    FROM terms
    WINDOW w AS (ORDER BY gap_days ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW)
    ORDER BY gap_days
    """,
)
def kaplan_meier_reorder_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of the customer REORDER gap: how
    long until a customer orders again, with each customer's final gap
    (last order -> dataset horizon) right-CENSORED rather than
    dropped — the churn/retention estimator naive gap averages get
    wrong. S(t) = prod over event times <= t of (1 - d_i / n_i), with
    n_i the at-risk count (gaps, censored included, of length >= t_i).

    Determinism lane: risk/event counts are exact BIGINTs (the risk
    set is a DESCENDING cumulative sum over the gap census, never a
    per-gap rank); each factor's log is quantized to integer
    MICRO-nats before the cumulative sum, so the product is one
    deterministic exp over an exact integer; a d_i = n_i terminal
    event pins survival to exactly 0 past it.

    Scale (100 TB): orders collapse to per-customer ordered days (one
    shuffle on the customer key), gaps to a census keyed by gap LENGTH
    (bounded by the calendar span in days); every window runs over
    that bounded census. Reference parity: none;
    SURVEY.md section 2.B statistics family.
    """
    orders = load_table(spark, sf_dir, "orders")
    d = orders.select(
        "o_custkey", F.expr("unix_timestamp(o_orderdate) div 86400").alias("day")
    ).distinct()
    mx = d.agg(F.max("day").alias("horizon"))
    w_cust = Window.partitionBy("o_custkey").orderBy("day", "o_custkey")
    seq = d.select(
        "o_custkey", "day", F.lead("day").over(w_cust).alias("nxt")
    )
    dur = seq.crossJoin(F.broadcast(mx)).select(
        F.when(F.col("nxt").isNull(), F.col("horizon") - F.col("day"))
        .otherwise(F.col("nxt") - F.col("day"))
        .alias("gap_days"),
        F.when(F.col("nxt").isNull(), F.lit(0)).otherwise(F.lit(1)).alias("ev"),
    )
    census = dur.groupBy("gap_days").agg(
        F.sum("ev").cast("bigint").alias("n_events"),
        F.sum(1 - F.col("ev")).cast("bigint").alias("n_censored"),
    )
    w_desc = Window.orderBy(F.col("gap_days").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = census.select(
        "gap_days",
        "n_events",
        "n_censored",
        F.sum(F.col("n_events") + F.col("n_censored"))
        .over(w_desc)
        .cast("bigint")
        .alias("n_risk"),
    )
    terms = risk.where(F.col("n_events") > 0).select(
        "gap_days",
        "n_events",
        "n_censored",
        "n_risk",
        F.when(
            F.col("n_events") < F.col("n_risk"),
            F.round(
                1000000
                * F.log(
                    1.0 - F.col("n_events").cast("double") / F.col("n_risk")
                )
            ).cast("bigint"),
        ).alias("t_micro"),
        F.when(F.col("n_events") >= F.col("n_risk"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("dead"),
    )
    w_asc = Window.orderBy("gap_days").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return terms.select(
        "gap_days",
        "n_risk",
        "n_events",
        "n_censored",
        F.when(F.sum("dead").over(w_asc) > 0, F.lit(0).cast("bigint"))
        .otherwise(
            F.round(
                1000000
                * F.exp(F.sum("t_micro").over(w_asc).cast("double") / 1000000)
            ).cast("bigint")
        )
        .alias("surv_micro"),
    ).orderBy("gap_days")


# ---------------- split-conformal interval for token-count prediction

CONF_ALPHA_PCT = 10  # 90% target coverage


@register(
    "conformal_token_interval",
    tags=("stats", "text", "agg"),
    oracle=f"""
    WITH d AS (
      SELECT CAST(len({_TOKS}) AS BIGINT) AS y,
             CAST(length(text) AS BIGINT) AS x,
             {md5_long_sql("'conf:' || CAST(doc_id AS VARCHAR)")} % 2 = 0
                 AS is_calib
      FROM documents
    ),
    fit AS (
      SELECT CAST(ROUND(1000000.0 * SUM(y) / SUM(x)) AS BIGINT) AS slope_micro
      FROM d WHERE is_calib
    ),
    resid AS (
      SELECT d.is_calib,
             abs(d.y - CAST(ROUND(CAST(fit.slope_micro AS DOUBLE) * d.x
                                  / 1000000.0) AS BIGINT)) AS r
      FROM d, fit
    ),
    calib AS (SELECT r, COUNT(*) AS cnt FROM resid WHERE is_calib GROUP BY r),
    ranked AS (
      SELECT r, SUM(cnt) OVER (ORDER BY r) AS cum,
             SUM(cnt) OVER () AS n_calib
      FROM calib
    ),
    q AS (
      SELECT MIN(r) AS q_resid, CAST(MAX(n_calib) AS BIGINT) AS n_calib
      FROM ranked
      WHERE cum >= CAST(ceil((n_calib + 1) * (100 - {CONF_ALPHA_PCT}) / 100.0)
                        AS BIGINT)
    )
    SELECT q.n_calib,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           q.q_resid,
           CAST(SUM(CASE WHEN resid.r <= q.q_resid THEN 1 ELSE 0 END)
                AS BIGINT) AS covered,
           CAST(ROUND(1000.0 * SUM(CASE WHEN resid.r <= q.q_resid
                                        THEN 1 ELSE 0 END)
                      / COUNT(*)) AS BIGINT) AS coverage_milli
    FROM resid, q WHERE NOT resid.is_calib
    GROUP BY q.n_calib, q.q_resid
    """,
)
def conformal_token_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval for the token count of a
    document predicted from its character length: fit one global ratio
    on the 50% md5 calibration split, take the
    ceil((n+1)(1−α))-smallest absolute residual as the interval
    half-width q, and report held-out coverage — the
    distribution-free finite-sample UQ recipe (marginal coverage
    ≥ 1−α for exchangeable data), α = {a}%.

    Determinism lane: residuals are exact integers (the only double is
    the micro-quantized ratio fit); the conformal quantile is a
    cumulative walk over the residual CENSUS (bounded by the residual
    value domain, like every doc-length census here) — never a global
    per-row rank; coverage cells are BIGINTs.

    Scale (100 TB): one scan computes (y, x, split); the fit and the
    census are partial+final aggs; the quantile walk and the coverage
    join run over the bounded census + a 1-row broadcast. Reference
    parity: none; SURVEY.md section 2.B statistics family.
    """.format(a=CONF_ALPHA_PCT)
    docs = load_table(spark, sf_dir, "documents").select(
        F.size(tokens("text")).cast("bigint").alias("y"),
        F.length("text").cast("bigint").alias("x"),
        (
            F.pmod(
                md5_long(
                    F.concat(F.lit("conf:"), F.col("doc_id").cast("string"))
                ),
                F.lit(2),
            )
            == 0
        ).alias("is_calib"),
    )
    fit = docs.where("is_calib").agg(
        F.round(1000000.0 * F.sum("y") / F.sum("x"))
        .cast("bigint")
        .alias("slope_micro")
    )
    resid = docs.crossJoin(F.broadcast(fit)).select(
        "is_calib",
        F.abs(
            F.col("y")
            - F.round(
                F.col("slope_micro").cast("double") * F.col("x") / 1000000.0
            ).cast("bigint")
        ).alias("r"),
    )
    calib = resid.where("is_calib").groupBy("r").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_walk = Window.orderBy("r").rowsBetween(Window.unboundedPreceding, 0)
    ranked = calib.select(
        "r",
        F.sum("cnt").over(w_walk).alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).alias("n_calib"),
    )
    q = ranked.where(
        F.col("cum")
        >= F.ceil(
            (F.col("n_calib") + 1) * (100 - CONF_ALPHA_PCT) / 100.0
        ).cast("bigint")
    ).agg(F.min("r").alias("q_resid"), F.max("n_calib").alias("n_calib"))
    test = resid.where(~F.col("is_calib")).crossJoin(F.broadcast(q))
    return test.groupBy("n_calib", "q_resid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.sum(F.when(F.col("r") <= F.col("q_resid"), 1).otherwise(0))
        .cast("bigint")
        .alias("covered"),
        F.round(
            1000.0
            * F.sum(F.when(F.col("r") <= F.col("q_resid"), 1).otherwise(0))
            / F.count(F.lit(1))
        )
        .cast("bigint")
        .alias("coverage_milli"),
    ).select("n_calib", "n_test", "q_resid", "covered", "coverage_milli")


# ------------- Wasserstein-1 (earth mover) distance between sources


@register(
    "wasserstein_doclen_sources",
    tags=("stats", "window", "join", "eval"),
    oracle="""
    WITH vals AS (
      SELECT source, n_chars AS val, COUNT(*) AS cnt
      FROM documents GROUP BY 1, 2
    ),
    tot AS (
      SELECT source, CAST(SUM(cnt) AS BIGINT) AS t FROM vals GROUP BY 1
    ),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b
      FROM tot a JOIN tot b ON a.source < b.source
    ),
    support AS (
      SELECT DISTINCT source_a, source_b, val FROM (
        SELECT p.source_a, p.source_b, v.val
        FROM pairs p JOIN vals v ON v.source = p.source_a
        UNION ALL
        SELECT p.source_a, p.source_b, v.val
        FROM pairs p JOIN vals v ON v.source = p.source_b
      )
    ),
    cum AS (
      SELECT s.source_a, s.source_b, s.val,
             SUM(COALESCE(va.cnt, 0)) OVER w AS ca,
             SUM(COALESCE(vb.cnt, 0)) OVER w AS cb,
             LEAD(s.val) OVER (PARTITION BY s.source_a, s.source_b
                               ORDER BY s.val) AS nxt
      FROM support s
      LEFT JOIN vals va ON va.source = s.source_a AND va.val = s.val
      LEFT JOIN vals vb ON vb.source = s.source_b AND vb.val = s.val
      WINDOW w AS (PARTITION BY s.source_a, s.source_b ORDER BY s.val)
    )
    SELECT c.source_a, c.source_b,
           CAST(ta.t AS BIGINT) AS n_a,
           CAST(tb.t AS BIGINT) AS n_b,
           CAST(SUM(ABS(c.ca * tb.t - c.cb * ta.t) * (c.nxt - c.val))
                * 1000 // (ta.t * tb.t) AS BIGINT) AS w1_milli
    FROM cum c
    JOIN tot ta ON ta.source = c.source_a
    JOIN tot tb ON tb.source = c.source_b
    WHERE c.nxt IS NOT NULL
    GROUP BY c.source_a, c.source_b, ta.t, tb.t
    """,
)
def wasserstein_doclen_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wasserstein-1 (earth mover) distance between every PAIR of
    sources' document-length distributions: W1 = ∫|F_a − F_b| dx,
    the INTEGRAL companion to ks_doclen_sources' max gap — KS flags
    the worst single point, W1 prices the total probability mass that
    must move (in characters), which is what a mixture-rebalancing
    decision actually costs.

    Determinism: entirely integer — the CDF gap at each support step
    is cross-multiplied (``|ca*Tb − cb*Ta|``), weighted by the exact
    step width to the next support value, SUMMED in BIGINT, and
    floor-divided to milli-characters once at the end. No libm, no
    doubles. Headroom: Σ gap·Δx ≤ Ta·Tb·range — int64 to ~1e5-doc
    sources at 1e5-char range; past that swap to DECIMAL(38,0).

    Scale (100 TB): identical shape to the KS matrix — (source, value)
    grain, S² pair fan-out over the census, pair-partitioned cumulative
    windows with |support|-bounded occupancy. Reference parity: none;
    SURVEY.md section 2.B eval/stats family.
    """
    docs = load_table(spark, sf_dir, "documents")
    vals = docs.groupBy("source", F.col("n_chars").alias("val")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = vals.groupBy("source").agg(F.sum("cnt").cast("bigint").alias("t"))
    ta = tot.select(F.col("source").alias("source_a"), F.col("t").alias("t_a"))
    tb = tot.select(F.col("source").alias("source_b"), F.col("t").alias("t_b"))
    pairs = ta.join(
        F.broadcast(tb), F.col("source_a") < F.col("source_b")
    ).select("source_a", "source_b")
    va = vals.select(
        F.col("source").alias("source_a"), "val", F.col("cnt").alias("cnt_a")
    )
    vb = vals.select(
        F.col("source").alias("source_b"),
        F.col("val").alias("val_b"),
        F.col("cnt").alias("cnt_b"),
    )
    support = (
        pairs.join(va.drop("cnt_a"), "source_a")
        .select("source_a", "source_b", "val")
        .unionAll(
            pairs.join(vb.drop("cnt_b"), "source_b").select(
                "source_a", "source_b", F.col("val_b").alias("val")
            )
        )
        .distinct()
    )
    wp = Window.partitionBy("source_a", "source_b").orderBy("val")
    w = wp.rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        support.join(va, ["source_a", "val"], "left")
        .join(vb.withColumnRenamed("val_b", "val"), ["source_b", "val"], "left")
        .select(
            "source_a",
            "source_b",
            "val",
            F.sum(F.coalesce("cnt_a", F.lit(0))).over(w).alias("ca"),
            F.sum(F.coalesce("cnt_b", F.lit(0))).over(w).alias("cb"),
            F.lead("val").over(wp).alias("nxt"),
        )
    )
    return (
        cum.where(F.col("nxt").isNotNull())
        .join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .groupBy("source_a", "source_b", "t_a", "t_b")
        .agg(
            F.sum(
                F.abs(F.col("ca") * F.col("t_b") - F.col("cb") * F.col("t_a"))
                * (F.col("nxt") - F.col("val"))
            ).alias("m_scaled")
        )
        .select(
            "source_a",
            "source_b",
            F.col("t_a").alias("n_a"),
            F.col("t_b").alias("n_b"),
            F.expr("m_scaled * 1000 div (t_a * t_b)")
            .cast("bigint")
            .alias("w1_milli"),
        )
    )


# ----------------- exact Spearman rank correlation (census mid-ranks)


@register(
    "spearman_chars_tokens",
    tags=("stats", "window", "join"),
    oracle=f"""
    WITH d AS (
      SELECT CAST(length(text) AS BIGINT) AS x,
             CAST(len({_TOKS}) AS BIGINT) AS y
      FROM documents
    ),
    cx AS (SELECT x, COUNT(*) AS cnt FROM d GROUP BY x),
    rx AS (
      SELECT x, 2 * (SUM(cnt) OVER (ORDER BY x) - cnt) + cnt + 1 AS r2
      FROM cx
    ),
    cy AS (SELECT y, COUNT(*) AS cnt FROM d GROUP BY y),
    ry AS (
      SELECT y, 2 * (SUM(cnt) OVER (ORDER BY y) - cnt) + cnt + 1 AS r2
      FROM cy
    ),
    ranked AS (
      SELECT CAST(rx.r2 AS BIGINT) AS a, CAST(ry.r2 AS BIGINT) AS b
      FROM d JOIN rx USING (x) JOIN ry USING (y)
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(a) AS BIGINT) AS sa, CAST(SUM(b) AS BIGINT) AS sb,
             CAST(SUM(a * b) AS BIGINT) AS sab,
             CAST(SUM(a * a) AS BIGINT) AS saa,
             CAST(SUM(b * b) AS BIGINT) AS sbb
      FROM ranked
    )
    SELECT n,
           ROUND(CAST(n * sab - sa * sb AS DOUBLE)
                 / NULLIF(sqrt(CAST(n * saa - sa * sa AS DOUBLE))
                          * sqrt(CAST(n * sbb - sb * sb AS DOUBLE)), 0.0),
                 6) + 0 AS spearman_rho
    FROM m
    """,
)
def spearman_chars_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Spearman rank correlation between document length in
    characters and in tokens — the monotone-association companion to
    the Pearson moments elsewhere (robust to the heavy length tails
    that distort Pearson).

    The trick that makes exact tie-averaged ranks distributed: a
    row's mid-rank depends only on its VALUE, so ranks come from the
    bounded value CENSUS (cum-before + (cnt+1)/2, doubled to stay
    integer) and broadcast back by an equi-join on the value key —
    never a global per-row ranking. Pearson over the doubled ranks is
    then exact BIGINT moment sums with one final double expression
    (the shared ACF/CCF form).

    Scale (100 TB): two value-census aggs (bounded by distinct
    lengths), two census windows, two value-key joins back to the
    scan, one moment agg. Reference parity: none;
    SURVEY.md section 2.B statistics family.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        F.length("text").cast("bigint").alias("x"),
        F.size(tokens("text")).cast("bigint").alias("y"),
    )

    def rank2(col):
        census = docs.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
        return census.select(
            col,
            (2 * (F.sum("cnt").over(w) - F.col("cnt")) + F.col("cnt") + 1)
            .cast("bigint")
            .alias("r2"),
        )

    ranked = (
        docs.join(rank2("x").withColumnRenamed("r2", "a"), "x")
        .join(rank2("y").withColumnRenamed("r2", "b"), "y")
        .select("a", "b")
    )
    m = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("a").cast("bigint").alias("sa"),
        F.sum("b").cast("bigint").alias("sb"),
        F.sum(F.col("a") * F.col("b")).cast("bigint").alias("sab"),
        F.sum(F.col("a") * F.col("a")).cast("bigint").alias("saa"),
        F.sum(F.col("b") * F.col("b")).cast("bigint").alias("sbb"),
    )
    n, sa, sb = F.col("n"), F.col("sa"), F.col("sb")
    num = (n * F.col("sab") - sa * sb).cast("double")
    den = F.sqrt((n * F.col("saa") - sa * sa).cast("double")) * F.sqrt(
        (n * F.col("sbb") - sb * sb).cast("double")
    )
    return m.select(
        "n", F.round(num / F.nullif(den, F.lit(0.0)), 6).alias("spearman_rho")
    )


# -------- Benjamini-Hochberg FDR over the pairwise KS drift matrix

FDR_Q_PCT = 5  # target false-discovery rate


@register(
    "fdr_drift_decisions",
    tags=("stats", "window", "eval"),
    oracle=f"""
    WITH ks AS ({{KS}}),
    p AS (
      SELECT source_a, source_b,
             CAST(ROUND(1000000 * LEAST(1.0,
                 2.0 * exp(-2.0 * (ks_micro / 1000000.0)
                               * (ks_micro / 1000000.0)
                               * (CAST(n_a AS DOUBLE) * n_b / (n_a + n_b)))))
                  AS BIGINT) AS p_micro
      FROM ks
    ),
    ranked AS (
      SELECT source_a, source_b, p_micro,
             ROW_NUMBER() OVER (ORDER BY p_micro, source_a, source_b)
                 AS rk,
             COUNT(*) OVER () AS m
      FROM p
    ),
    thresh AS (
      SELECT COALESCE(MAX(rk), 0) AS k_max FROM ranked
      WHERE p_micro * m * 100 <= rk * {FDR_Q_PCT} * 1000000
    )
    SELECT r.source_a, r.source_b, r.p_micro,
           CAST(r.rk AS BIGINT) AS rk,
           CAST(CASE WHEN r.rk <= t.k_max THEN 1 ELSE 0 END AS BIGINT)
               AS is_drifted
    FROM ranked r, thresh t
    ORDER BY r.rk
    """,
)
def fdr_drift_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR decisions over the pairwise KS drift
    matrix: each pair's asymptotic two-sample KS p-value (one-term
    ``2·exp(−2·D²·n_eff)``, n_eff = n_a·n_b/(n_a+n_b)) is ranked and
    the standard step-up rule keeps every pair with
    p_(k) ≤ k·q/m at q = {q}% — turning 190 drift NUMBERS into
    multiple-testing-corrected drift DECISIONS (the raw per-pair 5%
    cutoff would expect ~10 false alarms on a null matrix).

    Determinism lane: the p-value is one fixed double tree over the
    already-quantized integer ks_micro and exact counts, rounded to
    micro; the BH comparison is cross-multiplied in integers
    (``p·m·100 ≤ k·q·1e6``); ties rank by pair name.

    Scale (100 TB): everything downstream of the KS matrix runs on the
    S²/2-row pair relation (190 rows here — bounded by the source
    enum, not the corpus); the matrix itself keeps the bounded
    (source, value) census shape documented at ks_doclen_sources.
    Reference parity: none; SURVEY.md section 2.B eval/stats family.
    """.format(q=FDR_Q_PCT)
    ks = ks_doclen_sources(spark, sf_dir)
    n_eff = F.col("n_a").cast("double") * F.col("n_b") / (
        F.col("n_a") + F.col("n_b")
    )
    d = F.col("ks_micro") / 1000000.0
    p = ks.select(
        "source_a",
        "source_b",
        F.round(
            1000000
            * F.least(F.lit(1.0), 2.0 * F.exp(-2.0 * d * d * n_eff))
        )
        .cast("bigint")
        .alias("p_micro"),
    )
    w = Window.orderBy("p_micro", "source_a", "source_b")
    ranked = p.select(
        "source_a",
        "source_b",
        "p_micro",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("m"),
    )
    thresh = ranked.where(
        F.col("p_micro") * F.col("m") * 100
        <= F.col("rk") * FDR_Q_PCT * 1000000
    ).agg(F.coalesce(F.max("rk"), F.lit(0)).alias("k_max"))
    return (
        ranked.crossJoin(F.broadcast(thresh))
        .select(
            "source_a",
            "source_b",
            "p_micro",
            F.col("rk").cast("bigint").alias("rk"),
            F.when(F.col("rk") <= F.col("k_max"), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("is_drifted"),
        )
        .orderBy("rk")
    )


# fdr_drift_decisions reuses the ks_doclen_sources oracle verbatim as
# its KS CTE (one source of truth for the matrix definition).
from ..registry import REGISTRY as _REG  # noqa: E402

_REG["fdr_drift_decisions"].oracle = _REG["fdr_drift_decisions"].oracle.replace(
    "{KS}", _REG["ks_doclen_sources"].oracle
)


# ------------------------- UCB1 bandit replay (deterministic audit)

UCB_ARMS = 3


@register(
    "ucb1_variant_replay",
    tags=("inference", "window", "decision"),
    oracle=f"""
    WITH e AS (
      SELECT CAST(epoch_us(ts) // 1000000 // 86400 AS BIGINT) AS day,
             (CASE WHEN json_valid(props)
                   THEN CAST(json_extract(props, '$.k') AS INTEGER) END)
               % {UCB_ARMS} AS arm,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS reward
      FROM events
    ),
    cells AS (
      SELECT day, arm, COUNT(*) AS n, SUM(reward) AS r
      FROM e WHERE arm IS NOT NULL GROUP BY 1, 2
    ),
    days AS (SELECT DISTINCT day FROM cells),
    arms AS (SELECT DISTINCT arm FROM cells),
    grid AS (
      SELECT days.day, arms.arm,
             COALESCE(cells.n, 0) AS n, COALESCE(cells.r, 0) AS r
      FROM days CROSS JOIN arms
      LEFT JOIN cells ON cells.day = days.day AND cells.arm = arms.arm
    ),
    cum AS (
      SELECT day, arm,
             SUM(n) OVER (PARTITION BY arm ORDER BY day) AS n_cum,
             SUM(r) OVER (PARTITION BY arm ORDER BY day) AS r_cum
      FROM grid
    ),
    daytot AS (
      SELECT day, CAST(SUM(n_cum) AS BIGINT) AS big_n
      FROM cum GROUP BY 1
    ),
    scored AS (
      SELECT c.day, c.arm, c.n_cum, c.r_cum,
             CASE WHEN c.n_cum > 0 THEN
               CAST(ROUND(1000.0 * (CAST(c.r_cum AS DOUBLE) / c.n_cum
                    + sqrt(2.0 * ln(CAST(d.big_n AS DOUBLE)) / c.n_cum)),
                    0) AS BIGINT)
             END AS ucb_milli
      FROM cum c JOIN daytot d ON c.day = d.day
    ),
    ranked AS (
      SELECT day, arm, n_cum, r_cum, ucb_milli,
             ROW_NUMBER() OVER (PARTITION BY day
                                ORDER BY ucb_milli DESC, arm) AS rk
      FROM scored WHERE ucb_milli IS NOT NULL
    )
    SELECT CAST(day AS BIGINT) AS day, CAST(arm AS BIGINT) AS arm,
           CAST(n_cum AS BIGINT) AS n_pulls,
           CAST(r_cum AS BIGINT) AS n_rewards, ucb_milli
    FROM ranked WHERE rk = 1
    """,
)
def ucb1_variant_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UCB1 bandit replay: for every day, which experiment arm the
    UCB1 policy (mean reward + sqrt(2 ln N / n) exploration bonus,
    Auer et al. 2002) would pick next, replayed deterministically over
    the event log — the offline policy audit run before wiring a live
    bandit: it shows when the policy would have locked onto the best
    arm and how often exploration flips the choice. Arms = props.k mod
    {a}; reward = purchase.

    Determinism: pulls/rewards are exact integer cumsums over the
    dense (day, arm) grid (missing cells zero-filled by construction,
    so cumulative alignment can't drift); the score is one double
    expression on exact integers (ln/sqrt agree cross-engine on
    identical inputs — package ln-ulp argument), quantized to milli
    with the arm id as total tie-break.

    Scale (100 TB): the event stream collapses to the (day, arm) cell
    grid FIRST (one shuffle, map-side partial agg); everything after —
    grid fill, per-arm cumsums, per-day totals, argmax — runs on the
    |days| x |arms| relation. The ranked pick plans WindowGroupLimit.
    """.format(a=UCB_ARMS)
    e = load_table(spark, sf_dir, "events").select(
        F.expr("unix_timestamp(ts) div 86400").alias("day"),
        (F.get_json_object("props", "$.k").cast("int") % UCB_ARMS).alias("arm"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("reward"),
    )
    cells = (
        e.where(F.col("arm").isNotNull())
        .groupBy("day", "arm")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("reward").alias("r"))
    )
    from ..functions import scoped_persist

    cells = scoped_persist(("ucb.cells", sf_dir), cells)
    grid = (
        cells.select("day").distinct()
        .crossJoin(F.broadcast(cells.select("arm").distinct()))
        .join(cells, ["day", "arm"], "left")
        .select(
            "day", "arm",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            F.coalesce(F.col("r"), F.lit(0)).alias("r"),
        )
    )
    wa = Window.partitionBy("arm").orderBy("day")
    cum = grid.select(
        "day", "arm",
        F.sum("n").over(wa).alias("n_cum"),
        F.sum("r").over(wa).alias("r_cum"),
    )
    daytot = cum.groupBy("day").agg(F.sum("n_cum").cast("long").alias("big_n"))
    ucb = F.when(
        F.col("n_cum") > 0,
        F.round(
            F.lit(1000.0)
            * (
                F.col("r_cum").cast("double") / F.col("n_cum")
                + F.sqrt(
                    F.lit(2.0)
                    * F.log(F.col("big_n").cast("double"))
                    / F.col("n_cum")
                )
            ),
            0,
        ).cast("long"),
    )
    scored = cum.join(daytot, "day").select(
        "day", "arm", "n_cum", "r_cum", ucb.alias("ucb_milli")
    )
    wd = Window.partitionBy("day").orderBy(F.col("ucb_milli").desc(), "arm")
    return (
        scored.where(F.col("ucb_milli").isNotNull())
        .withColumn("rk", F.row_number().over(wd))
        .where(F.col("rk") == 1)
        .select(
            F.col("day").cast("long").alias("day"),
            F.col("arm").cast("long").alias("arm"),
            F.col("n_cum").cast("long").alias("n_pulls"),
            F.col("r_cum").cast("long").alias("n_rewards"),
            "ucb_milli",
        )
    )
