"""Statistical-inference operators: isotonic calibration (PAVA),
chi-square independence with Cramér's V, a group-sequential SPRT
monitor, and Jensen-Shannon divergence between corpus sources.

These are the hypothesis-testing / distribution-distance companions to
the census statistics in queries/quality.py — the questions a data
team asks AFTER the census: is the scorer calibrated (isotonic fit),
are two categoricals independent (chi-square), has the experiment
decided yet (SPRT), and how far apart are two corpus slices
(Jensen-Shannon). Shared discipline: every floating-point term is
either a ratio of exact integers fed through one deterministic libm
call and quantized to integer units BEFORE any aggregation, or a
constant precomputed in Python and embedded identically in the Spark
code and the DuckDB oracle — sums are then exact bigint arithmetic in
any association order.

Reference parity: none of these exist in the reference (its query
surface is wordcount + grep, mapreduce/__init__.py); they are
committed statistics families from SURVEY.md section 2.B.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import md5_long, md5_long_sql, tokens, truncate_plan
from ..registry import register
from ..sources import load_table

# Same whitespace tokenizer as text_unigram_logprob / wordcount
# (mirrors the reference's wc_map.sh token rule minus its empty-token
# quirk; see functions.tokens).
_TOKS = r"list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '')"


# ---------------------------------------- isotonic calibration (PAVA)

_ISO_N_BINS = 10
# The scorer: per-mille share of the nine most frequent English
# letters (etaoinshr) — a crude "looks like English" signal with real
# spread across the synthetic corpus (sf0.1 range ~400-627 per-mille).
# Bin edges are fixed constants calibrated once against that corpus
# (the SURPRISAL_*_MNAT practice in queries/mlprep.py): the [LO,
# LO+SPAN) band maps linearly onto the 10 bins, clamped at the ends.
_ISO_LO_PERMILLE = 400
_ISO_SPAN_PERMILLE = 200


@register(
    "isotonic_calibration_langid",
    tags=("stats", "agg", "eval", "window"),
    oracle=f"""
    WITH scored AS (
      SELECT CASE WHEN length(text) = 0 THEN 0
                  ELSE length(regexp_replace(lower(text), '[^etaoinshr]', '', 'g'))
                       * 1000 // length(text)
             END AS score_pm,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en
      FROM documents
    ),
    bins AS (
      SELECT LEAST(GREATEST((score_pm - {_ISO_LO_PERMILLE}) * {_ISO_N_BINS}
                            // {_ISO_SPAN_PERMILLE}, 0), {_ISO_N_BINS - 1}) AS bin,
             COUNT(*) AS n, CAST(SUM(is_en) AS BIGINT) AS s
      FROM scored GROUP BY 1
    ),
    pre AS (
      SELECT bin, n, s,
             SUM(n) OVER w - n AS pn, SUM(s) OVER w - s AS ps,
             SUM(n) OVER w AS cn, SUM(s) OVER w AS cs
      FROM bins WINDOW w AS (ORDER BY bin)
    ),
    jk AS (
      SELECT j.bin AS bin_j, k.bin AS bin_k,
             CAST(k.cs - j.ps AS DOUBLE) / (k.cn - j.pn) AS mean_jk
      FROM pre j JOIN pre k ON j.bin <= k.bin
    ),
    mins AS (
      SELECT i.bin, i.n, i.s, jk.bin_j, MIN(jk.mean_jk) AS min_mean
      FROM pre i JOIN jk ON jk.bin_j <= i.bin AND jk.bin_k >= i.bin
      GROUP BY 1, 2, 3, 4
    )
    SELECT bin,
           CAST(n AS BIGINT) AS n_docs,
           s * 1000 // n AS observed_rate_milli,
           CAST(ROUND(1000 * MAX(min_mean)) AS BIGINT) AS fitted_rate_milli
    FROM mins GROUP BY 1, 2, 3
    """,
)
def isotonic_calibration_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (monotone nondecreasing) calibration of a
    deterministic "looks like English" scorer (per-mille share of the
    nine most frequent English letters — finer-grained than the ASCII
    share behind calibration_bins_langid, spreading the corpus across
    all 10 bins so the fit genuinely pools violators): the per-bin
    observed English rates are replaced by the weighted
    least-squares monotone fit — pool-adjacent-violators via its
    closed form ``fitted_i = max_{{j<=i}} min_{{k>=i}} mean(y[j..k])``
    — the standard post-hoc calibration map (Zadrozny-Elkan) a scorer
    is wrapped in before its outputs are treated as probabilities.

    The closed form turns the sequential PAVA sweep into bounded
    relational algebra: with B = {_ISO_N_BINS} bins, prefix sums over
    the bin census give every interval mean ``(cs_k - ps_j) /
    (cn_k - pn_j)`` as one ratio of exact integers, and the max-min
    runs over at most B^3 (i, j, k) triples — a few hundred rows.

    Determinism: interval means are single divisions of exact BIGINTs
    (identical IEEE doubles both engines); MIN/MAX are comparisons;
    one ROUND at the end. No libm at all.

    Scale (100 TB): the only data-scale work is the scan-side scoring
    projection and one partial+final agg onto the {_ISO_N_BINS}-value
    bin key (the calibration_bins_langid shape); everything after is
    arithmetic over a ≤{_ISO_N_BINS}-row relation (broadcast-tiny
    joins, constant cost at any corpus size).

    Reference parity: none (wordcount/grep only); SURVEY.md
    section 2.B eval/stats family.
    """
    docs = load_table(spark, sf_dir, "documents")
    score = F.when(F.length("text") == 0, 0).otherwise(
        F.expr(
            "length(regexp_replace(lower(text), '[^etaoinshr]', '')) * 1000"
            " div length(text)"
        )
    )
    scored = docs.select(
        score.alias("score_pm"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("is_en"),
    )
    # Negative pre-clamp values floor in DuckDB (//) but truncate in
    # Spark (div); GREATEST/LEAST clamping absorbs the difference.
    bin_col = F.least(
        F.greatest(
            F.expr(
                f"(score_pm - {_ISO_LO_PERMILLE}) * {_ISO_N_BINS}"
                f" div {_ISO_SPAN_PERMILLE}"
            ),
            F.lit(0),
        ),
        F.lit(_ISO_N_BINS - 1),
    )
    bins = (
        scored.select(bin_col.alias("bin"), "is_en")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("is_en").cast("bigint").alias("s"),
        )
    )
    # Prefix sums over the <=10-row bin census: a single-partition
    # window over a bounded relation (constant size at any corpus
    # scale), the same pattern as the other bounded-key statistics.
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    pre = bins.select(
        "bin",
        "n",
        "s",
        (F.sum("n").over(w) - F.col("n")).alias("pn"),
        (F.sum("s").over(w) - F.col("s")).alias("ps"),
        F.sum("n").over(w).alias("cn"),
        F.sum("s").over(w).alias("cs"),
    ).transform(truncate_plan, eager=False)
    j = pre.select(
        F.col("bin").alias("bin_j"), F.col("pn").alias("pn_j"), F.col("ps").alias("ps_j")
    )
    k = pre.select(
        F.col("bin").alias("bin_k"), F.col("cn").alias("cn_k"), F.col("cs").alias("cs_k")
    )
    jk = j.join(F.broadcast(k), F.col("bin_j") <= F.col("bin_k")).select(
        "bin_j",
        "bin_k",
        (
            (F.col("cs_k") - F.col("ps_j")).cast("double")
            / (F.col("cn_k") - F.col("pn_j"))
        ).alias("mean_jk"),
    )
    i = pre.select("bin", "n", "s")
    mins = (
        i.join(
            F.broadcast(jk),
            (F.col("bin_j") <= F.col("bin")) & (F.col("bin_k") >= F.col("bin")),
        )
        .groupBy("bin", "n", "s", "bin_j")
        .agg(F.min("mean_jk").alias("min_mean"))
    )
    return mins.groupBy("bin", "n", "s").agg(
        F.max("min_mean").alias("fitted")
    ).select(
        "bin",
        F.col("n").cast("bigint").alias("n_docs"),
        F.expr("s * 1000 div n").alias("observed_rate_milli"),
        F.round(F.col("fitted") * 1000).cast("bigint").alias("fitted_rate_milli"),
    )


# ------------------------------- chi-square independence / Cramér's V


@register(
    "chi2_returnflag_linestatus",
    tags=("stats", "agg", "eval"),
    oracle="""
    WITH cells AS (
      SELECT l_returnflag AS flag, l_linestatus AS status,
             COUNT(*) AS o
      FROM lineitem GROUP BY 1, 2
    ),
    expected AS (
      SELECT flag, status, o,
             SUM(o) OVER (PARTITION BY flag) AS r,
             SUM(o) OVER (PARTITION BY status) AS c,
             SUM(o) OVER () AS n
      FROM cells
    ),
    terms AS (
      SELECT o, r, c, n,
             CAST(ROUND(
               1000000 * (o - CAST(r * c AS DOUBLE) / n)
                       * (o - CAST(r * c AS DOUBLE) / n)
                       / (CAST(r * c AS DOUBLE) / n)
             ) AS BIGINT) AS term_micro,
             flag, status
      FROM expected
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_total,
           COUNT(*) AS n_cells,
           CAST((COUNT(DISTINCT flag) - 1) * (COUNT(DISTINCT status) - 1)
                AS BIGINT) AS dof,
           CAST(SUM(term_micro) AS BIGINT) AS chi2_micro,
           CAST(ROUND(1000 * sqrt(
             (CAST(SUM(term_micro) AS DOUBLE) / 1000000)
             / (MAX(n) * (LEAST(COUNT(DISTINCT flag),
                                COUNT(DISTINCT status)) - 1))
           )) AS BIGINT) AS cramers_v_milli
    FROM terms
    """,
)
def chi2_returnflag_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between lineitem's return flag
    and line status, with Cramér's V as the normalized effect size —
    the categorical-association screen a profiler runs before trusting
    (or pruning) a pair of enum columns as independent features. One
    scalar audit row: N, cell count, degrees of freedom, the chi-square
    statistic in micro-units, and V in milli-units. Complements
    ``chi2_source_lang`` (queries/mining.py), which reports the
    N-scaled sparse-contingency transform for the corpus-composition
    drift use case: this one reports the CLASSICAL statistic plus dof
    and the effect size, on a dense bounded enum grid where that is
    exact.

    Determinism: observed counts and the r*c marginal products are
    exact BIGINTs; each cell's (O-E)^2/E is computed from identical
    integer-derived doubles in the same operation order on both
    engines and quantized to micro-units BEFORE the (6-cell) sum; the
    final sqrt sees one identical double.

    Scale (100 TB): one partial+final agg onto the (flag, status) key
    — bounded by the enum cross product (6 cells for TPC-H), so the
    windows and the final rollup run over a constant-size relation.
    The scan shuffles only the cell counters (the q1 shape).

    Reference parity: none (wordcount/grep only); SURVEY.md
    section 2.B eval/stats family.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        F.col("l_returnflag").alias("flag"), F.col("l_linestatus").alias("status")
    ).agg(F.count(F.lit(1)).alias("o"))
    wf = Window.partitionBy("flag")
    ws = Window.partitionBy("status")
    wa = Window.partitionBy()
    e = (F.col("r") * F.col("c")).cast("double") / F.col("n")
    expected = cells.select(
        "flag",
        "status",
        "o",
        F.sum("o").over(wf).alias("r"),
        F.sum("o").over(ws).alias("c"),
        F.sum("o").over(wa).alias("n"),
    )
    terms = expected.select(
        "flag",
        "status",
        "o",
        "n",
        F.round(F.lit(1000000) * (F.col("o") - e) * (F.col("o") - e) / e)
        .cast("bigint")
        .alias("term_micro"),
    )
    return terms.agg(
        F.max("n").cast("bigint").alias("n_total"),
        F.count(F.lit(1)).alias("n_cells"),
        (
            (F.countDistinct("flag") - 1) * (F.countDistinct("status") - 1)
        ).cast("bigint").alias("dof"),
        F.sum("term_micro").cast("bigint").alias("chi2_micro"),
        F.round(
            F.lit(1000)
            * F.sqrt(
                (F.sum("term_micro").cast("double") / 1000000)
                / (
                    F.max("n")
                    * (F.least(F.countDistinct("flag"), F.countDistinct("status")) - 1)
                )
            )
        )
        .cast("bigint")
        .alias("cramers_v_milli"),
    )


# --------------------------------- group-sequential SPRT (conversion)

# Wald SPRT for a Bernoulli conversion rate, H0: p = P0 vs H1: p = P1,
# alpha = beta = 0.05. The per-trial log-likelihood-ratio increments
# and the decision boundaries ln((1-beta)/alpha), ln(beta/(1-alpha))
# are constants precomputed here in micro-nats and embedded in both
# engines, so the cumulative LLR is exact bigint arithmetic.
SPRT_P0 = 0.19
SPRT_P1 = 0.21
SPRT_ALPHA = 0.05
SPRT_BETA = 0.05
SPRT_L1_MICRO = round(1_000_000 * math.log(SPRT_P1 / SPRT_P0))
SPRT_L0_MICRO = round(1_000_000 * math.log((1 - SPRT_P1) / (1 - SPRT_P0)))
SPRT_A_MICRO = round(1_000_000 * math.log((1 - SPRT_BETA) / SPRT_ALPHA))
SPRT_B_MICRO = round(1_000_000 * math.log(SPRT_BETA / (1 - SPRT_ALPHA)))


@register(
    "sprt_conversion_hourly",
    tags=("stats", "datetime", "window", "eval"),
    oracle=f"""
    WITH trials AS (
      SELECT {md5_long_sql("'ab:' || CAST(user_id AS VARCHAR)")} % 2 AS variant,
             CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS hit
      FROM events
    ),
    hourly AS (
      SELECT variant, hour, COUNT(*) AS n, CAST(SUM(hit) AS BIGINT) AS s
      FROM trials GROUP BY 1, 2
    ),
    cum AS (
      SELECT variant, hour, n, s,
             SUM(s * {SPRT_L1_MICRO} + (n - s) * ({SPRT_L0_MICRO})) OVER (
               PARTITION BY variant ORDER BY hour) AS llr_micro
      FROM hourly
    ),
    crossings AS (
      SELECT variant, MIN(hour) AS first_cross_hour,
             arg_min(CASE WHEN llr_micro >= {SPRT_A_MICRO}
                          THEN 'accept_h1' ELSE 'accept_h0' END,
                     hour) AS decision
      FROM cum
      WHERE llr_micro >= {SPRT_A_MICRO} OR llr_micro <= {SPRT_B_MICRO}
      GROUP BY 1
    )
    SELECT variant,
           COUNT(*) AS n_hours,
           CAST(SUM(c.n) AS BIGINT) AS n_trials,
           CAST(SUM(c.s) AS BIGINT) AS n_success,
           CAST(SUM(c.s * {SPRT_L1_MICRO}
                    + (c.n - c.s) * ({SPRT_L0_MICRO})) AS BIGINT)
             AS llr_final_micro,
           COALESCE(MIN(x.first_cross_hour),
                    TIMESTAMP '1970-01-01 00:00:00') AS first_cross_hour,
           COALESCE(MIN(x.decision), 'continue') AS decision
    FROM cum c LEFT JOIN crossings x USING (variant)
    GROUP BY 1
    """,
)
def sprt_conversion_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-sequential Wald SPRT monitoring each A/B variant's
    purchase-conversion rate (H0: p={SPRT_P0} vs H1: p={SPRT_P1},
    alpha=beta=0.05): per variant, the cumulative log-likelihood ratio
    over hourly batches, the first hour (if any) it crossed a Wald
    boundary, and the decision standing at that crossing — the
    always-valid "can we stop the experiment yet" readout, evaluated
    at the hour grain the way production experiment platforms batch
    it. Variants are a deterministic salted-md5 hash split of users.
    Sequential companion to the fixed-horizon two-proportion z-test
    (``abtest_conversion_ztest``, queries/mining.py): that one answers
    "is the final difference significant", this one answers "when
    could we have stopped".

    Determinism: LLR increments and boundaries are integer micro-nat
    constants precomputed once in Python and embedded in both engines,
    so every cumulative sum is exact bigint arithmetic; first-crossing
    selection is MIN/arg_min over unique hours.

    Scale (100 TB): trials collapse to the (variant, hour) grain in
    one partial+final agg (the group-sequential formulation exists
    precisely so no per-trial global ordering is ever needed); the
    cumulative window runs over the bounded hours-per-variant
    relation; the crossing census is a 2-row join.

    Reference parity: none (wordcount/grep only); SURVEY.md
    section 2.B eval/stats family.
    """
    return sprt_from_hourly(sprt_hourly_partial(load_table(spark, sf_dir, "events")))


def sprt_hourly_partial(events: DataFrame) -> DataFrame:
    """(variant, hour) -> (n trials, s successes) for any slice of the
    events relation. Counts are mergeable by plain addition, which is
    what lets the streaming store (streaming/sinks.py) keep one
    partial per micro-batch and merge on read."""
    variant = (
        md5_long(F.concat(F.lit("ab:"), F.col("user_id").cast("string"))) % 2
    ).alias("variant")
    trials = events.select(
        variant,
        F.date_trunc("hour", "ts").alias("hour"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("hit"),
    )
    return trials.groupBy("variant", "hour").agg(
        F.count(F.lit(1)).alias("n"), F.sum("hit").cast("bigint").alias("s")
    )


def sprt_from_hourly(hourly: DataFrame) -> DataFrame:
    """The monitor readout (cumulative LLR, first boundary crossing,
    decision) over an hourly (variant, hour, n, s) relation — shared
    by the batch query above and the streaming store's read side."""
    llr = F.col("s") * SPRT_L1_MICRO + (F.col("n") - F.col("s")) * SPRT_L0_MICRO
    cum = hourly.select(
        "variant",
        "hour",
        "n",
        "s",
        F.sum(llr)
        .over(Window.partitionBy("variant").orderBy("hour"))
        .alias("llr_micro"),
    )
    crossings = (
        cum.where(
            (F.col("llr_micro") >= SPRT_A_MICRO)
            | (F.col("llr_micro") <= SPRT_B_MICRO)
        )
        .groupBy("variant")
        .agg(
            F.min("hour").alias("first_cross_hour"),
            F.min_by(
                F.when(F.col("llr_micro") >= SPRT_A_MICRO, "accept_h1").otherwise(
                    "accept_h0"
                ),
                "hour",
            ).alias("decision"),
        )
    )
    base = cum.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("n").cast("bigint").alias("n_trials"),
        F.sum("s").cast("bigint").alias("n_success"),
        F.sum(llr).cast("bigint").alias("llr_final_micro"),
    )
    joined = base.join(F.broadcast(crossings), "variant", "left")
    # events.ts reads as TIMESTAMP or TIMESTAMP_NTZ depending on the
    # parquet flavor (sources.catalog docstring); the no-crossing
    # sentinel literal must match whichever this file produced.
    hour_type = dict(joined.dtypes)["first_cross_hour"]
    return joined.select(
        "variant",
        "n_hours",
        "n_trials",
        "n_success",
        "llr_final_micro",
        F.coalesce(
            F.col("first_cross_hour"),
            F.lit("1970-01-01 00:00:00").cast(hour_type),
        ).alias("first_cross_hour"),
        F.coalesce(F.col("decision"), F.lit("continue")).alias("decision"),
    )


# ----------------------------- one-way ANOVA (order value x segment)

# Sums of squares are quantized to units of 1e6 cents^2 after exact
# accumulation: per-group raw moments (n, sum cents, sum cents^2) are
# exact integers (the squares sum in DECIMAL/HUGEINT lanes), each
# group's SS term is one fixed double tree rounded to a bigint, and
# the cross-group additions are then order-free integer sums.
_SS_UNIT = 1_000_000.0


@register(
    "anova_order_value_by_segment",
    tags=("stats", "agg", "join", "eval"),
    oracle=f"""
    WITH g AS (
      SELECT c.c_mktsegment AS seg,
             COUNT(*) AS n,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS s,
             SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
                 * CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS q
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1
    ),
    terms AS (
      SELECT seg, n, s,
             CAST(ROUND(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n
                        / {_SS_UNIT!r}) AS BIGINT) AS t_between,
             CAST(ROUND((CAST(q AS DOUBLE)
                         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                        / {_SS_UNIT!r}) AS BIGINT) AS u_within
      FROM g
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(n) AS BIGINT) AS n_total,
           CAST(SUM(t_between)
                - CAST(ROUND(CAST(SUM(s) AS DOUBLE) * CAST(SUM(s) AS DOUBLE)
                             / SUM(n) / {_SS_UNIT!r}) AS BIGINT)
                AS BIGINT) AS ssb_unit,
           CAST(SUM(u_within) AS BIGINT) AS ssw_unit,
           CAST(ROUND(1000 *
             ((CAST(SUM(t_between) AS DOUBLE)
               - ROUND(CAST(SUM(s) AS DOUBLE) * CAST(SUM(s) AS DOUBLE)
                       / SUM(n) / {_SS_UNIT!r})) / (COUNT(*) - 1))
             / (CAST(SUM(u_within) AS DOUBLE) / (SUM(n) - COUNT(*)))
           ) AS BIGINT) AS f_milli
    FROM terms
    """,
)
def anova_order_value_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of order value (exact integer cents) across the
    five customer market segments: between/within sums of squares and
    the F statistic — the "does the group mean differ anywhere" screen
    run before pairwise tests (its two-group special case is the
    Welch query below). One scalar audit row.

    Determinism: per-group raw moments are exact (counts and cent sums
    in BIGINT, squared cents summed through a DECIMAL(38)/HUGEINT lane
    — every term < 2^53 so the final cast to double is the identical
    correctly-rounded value on both engines); each group's SS term is
    one fixed double tree quantized to {_SS_UNIT:.0e} cents^2 units
    BEFORE the cross-group sum, so group addition order cannot matter;
    F divides the two integer SS totals once.

    Scale (100 TB): one fact-to-dimension equi-join (AQE
    broadcast-sized dimension) and ONE partial+final agg onto the
    5-value segment key; everything downstream is arithmetic over a
    5-row relation. The raw-moment formulation is exactly what makes
    ANOVA single-pass and mergeable — no per-group mean subtraction
    pass, no second scan.

    Reference parity: none (wordcount/grep only); SURVEY.md
    section 2.B eval/stats family.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    joined = orders.join(
        cust, orders["o_custkey"] == cust["c_custkey"]
    ).select(F.col("c_mktsegment").alias("seg"), cents.alias("cents"))
    g = joined.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum((F.col("cents") * F.col("cents")).cast("decimal(38,0)")).alias("q"),
    )
    terms = g.select(
        "seg",
        "n",
        "s",
        F.expr(
            f"CAST(ROUND(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n"
            f" / {_SS_UNIT!r}) AS BIGINT)"
        ).alias("t_between"),
        F.expr(
            f"CAST(ROUND((CAST(q AS DOUBLE)"
            f" - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)"
            f" / {_SS_UNIT!r}) AS BIGINT)"
        ).alias("u_within"),
    )
    return terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum("n").cast("bigint").alias("n_total"),
        F.expr(
            f"CAST(SUM(t_between)"
            f" - CAST(ROUND(CAST(SUM(s) AS DOUBLE) * CAST(SUM(s) AS DOUBLE)"
            f" / SUM(n) / {_SS_UNIT!r}) AS BIGINT) AS BIGINT)"
        ).alias("ssb_unit"),
        F.sum("u_within").cast("bigint").alias("ssw_unit"),
        F.expr(
            f"CAST(ROUND(1000 *"
            f" ((CAST(SUM(t_between) AS DOUBLE)"
            f" - ROUND(CAST(SUM(s) AS DOUBLE) * CAST(SUM(s) AS DOUBLE)"
            f" / SUM(n) / {_SS_UNIT!r})) / (COUNT(1) - 1))"
            f" / (CAST(SUM(u_within) AS DOUBLE) / (SUM(n) - COUNT(1)))"
            f") AS BIGINT)"
        ).alias("f_milli"),
    )


# ------------------------- Welch's t-test (two unequal-variance arms)

WELCH_SEG_A = "BUILDING"
WELCH_SEG_B = "MACHINERY"


@register(
    "welch_ttest_building_machinery",
    tags=("stats", "agg", "join", "eval"),
    oracle=f"""
    WITH g AS (
      SELECT c.c_mktsegment AS seg,
             COUNT(*) AS n,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS s,
             SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
                 * CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS q
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment IN ('{WELCH_SEG_A}', '{WELCH_SEG_B}')
      GROUP BY 1
    ),
    w AS (
      SELECT
        MAX(CASE WHEN seg = '{WELCH_SEG_A}' THEN n END) AS n1,
        MAX(CASE WHEN seg = '{WELCH_SEG_A}' THEN s END) AS s1,
        MAX(CASE WHEN seg = '{WELCH_SEG_A}' THEN CAST(q AS DOUBLE) END) AS q1,
        MAX(CASE WHEN seg = '{WELCH_SEG_B}' THEN n END) AS n2,
        MAX(CASE WHEN seg = '{WELCH_SEG_B}' THEN s END) AS s2,
        MAX(CASE WHEN seg = '{WELCH_SEG_B}' THEN CAST(q AS DOUBLE) END) AS q2
      FROM g
    )
    SELECT CAST(n1 AS BIGINT) AS n_a, CAST(n2 AS BIGINT) AS n_b,
           CAST(ROUND(1000 * CAST(s1 AS DOUBLE) / n1) AS BIGINT) AS mean_a_milli,
           CAST(ROUND(1000 * CAST(s2 AS DOUBLE) / n2) AS BIGINT) AS mean_b_milli,
           CAST(ROUND(1000 *
             (CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
             / sqrt(((q1 - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1)
                     / (n1 - 1)) / n1
                    + ((q2 - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n2)
                       / (n2 - 1)) / n2)
           ) AS BIGINT) AS t_milli,
           CAST(ROUND(1000 *
             ((((q1 - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1)
                / (n1 - 1)) / n1
               + ((q2 - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n2)
                  / (n2 - 1)) / n2)
              * (((q1 - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1)
                  / (n1 - 1)) / n1
                 + ((q2 - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n2)
                    / (n2 - 1)) / n2))
             / ((((q1 - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1)
                  / (n1 - 1)) / n1)
                * (((q1 - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1)
                    / (n1 - 1)) / n1) / (n1 - 1)
                + (((q2 - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n2)
                    / (n2 - 1)) / n2)
                  * (((q2 - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n2)
                      / (n2 - 1)) / n2) / (n2 - 1))
           ) AS BIGINT) AS welch_df_milli
    FROM w
    """,
)
def welch_ttest_building_machinery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t-test of order value
    between the {a} and {b} customer segments: means, the t statistic,
    and the Welch-Satterthwaite effective degrees of freedom — the
    pairwise follow-up to the ANOVA screen above, in the form robust
    to unequal group variances (the default two-sample test in every
    modern stats text). One scalar audit row.

    Determinism: the same exact raw-moment lane as the ANOVA (cent
    sums BIGINT, squared-cent sums DECIMAL/HUGEINT, each < 2^53-exact
    per term and identically rounded at the one cast to double); t and
    df are each ONE fixed double expression tree over those six exact
    numbers, rounded once to milli-units. The standard-error terms
    are written out in full on both engines so the operation order is
    textually identical.

    Scale (100 TB): the segment filter reaches the dimension scan
    (pushed predicate), the join is fact-to-broadcast-dimension, and
    the two-arm moments are ONE partial+final agg; the statistic is a
    2-row pivot. Raw moments make the test single-pass and mergeable
    across shards.

    Reference parity: none (wordcount/grep only); SURVEY.md
    section 2.B eval/stats family.
    """.format(a=WELCH_SEG_A, b=WELCH_SEG_B)
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    joined = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .where(F.col("c_mktsegment").isin(WELCH_SEG_A, WELCH_SEG_B))
        .select(F.col("c_mktsegment").alias("seg"), cents.alias("cents"))
    )
    g = joined.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum((F.col("cents") * F.col("cents")).cast("decimal(38,0)")).alias("q"),
    )
    w = g.agg(
        F.expr(f"MAX(CASE WHEN seg = '{WELCH_SEG_A}' THEN n END)").alias("n1"),
        F.expr(f"MAX(CASE WHEN seg = '{WELCH_SEG_A}' THEN s END)").alias("s1"),
        F.expr(
            f"MAX(CASE WHEN seg = '{WELCH_SEG_A}' THEN CAST(q AS DOUBLE) END)"
        ).alias("q1"),
        F.expr(f"MAX(CASE WHEN seg = '{WELCH_SEG_B}' THEN n END)").alias("n2"),
        F.expr(f"MAX(CASE WHEN seg = '{WELCH_SEG_B}' THEN s END)").alias("s2"),
        F.expr(
            f"MAX(CASE WHEN seg = '{WELCH_SEG_B}' THEN CAST(q AS DOUBLE) END)"
        ).alias("q2"),
    )
    va = "((q1 - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1) / (n1 - 1)) / n1"
    vb = "((q2 - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n2) / (n2 - 1)) / n2"
    return w.select(
        F.expr("CAST(n1 AS BIGINT)").alias("n_a"),
        F.expr("CAST(n2 AS BIGINT)").alias("n_b"),
        F.expr("CAST(ROUND(1000 * CAST(s1 AS DOUBLE) / n1) AS BIGINT)").alias(
            "mean_a_milli"
        ),
        F.expr("CAST(ROUND(1000 * CAST(s2 AS DOUBLE) / n2) AS BIGINT)").alias(
            "mean_b_milli"
        ),
        F.expr(
            f"CAST(ROUND(1000 * (CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)"
            f" / sqrt({va} + {vb})) AS BIGINT)"
        ).alias("t_milli"),
        F.expr(
            f"CAST(ROUND(1000 * (({va} + {vb}) * ({va} + {vb}))"
            f" / (({va}) * ({va}) / (n1 - 1) + ({vb}) * ({vb}) / (n2 - 1)))"
            f" AS BIGINT)"
        ).alias("welch_df_milli"),
    )


# ------------------------- two-sample Kolmogorov-Smirnov (doc length)


@register(
    "ks_doclen_sources",
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
             SUM(COALESCE(vb.cnt, 0)) OVER w AS cb
      FROM support s
      LEFT JOIN vals va ON va.source = s.source_a AND va.val = s.val
      LEFT JOIN vals vb ON vb.source = s.source_b AND vb.val = s.val
      WINDOW w AS (PARTITION BY s.source_a, s.source_b ORDER BY s.val)
    )
    SELECT c.source_a, c.source_b,
           CAST(ta.t AS BIGINT) AS n_a,
           CAST(tb.t AS BIGINT) AS n_b,
           CAST(MAX(ABS(c.ca * tb.t - c.cb * ta.t)) * 1000000
                // (ta.t * tb.t) AS BIGINT) AS ks_micro
    FROM cum c
    JOIN tot ta ON ta.source = c.source_a
    JOIN tot tb ON tb.source = c.source_b
    GROUP BY c.source_a, c.source_b, ta.t, tb.t
    """,
)
def ks_doclen_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between every PAIR of
    sources' document-length distributions: D = max |F_a(x) - F_b(x)|
    over the union support — the pairwise drift MATRIX a curation
    pipeline consults to decide which two corpus slices can be pooled.
    Pairwise companion to ``ks_doclen_by_source`` (queries/mining.py),
    which screens each source against the rest of the corpus: the
    one-vs-rest view flags THAT a source drifts, this view says from
    WHICH others (the same one-vs-rest / pairwise split as
    source_overlap_matrix vs the dedup censuses).

    Determinism: ENTIRELY integer arithmetic — the CDF gap at each
    support point is cross-multiplied, ``|ca*Tb - cb*Ta|``, so no
    division happens until the final floor-division to micro-units;
    MAX over exact BIGINTs. No libm, no doubles anywhere. Headroom:
    the cross-product gap is bounded by Ta*Tb, so int64 holds to
    ~3e9-document sources at the gap and ~3e6 at the final x1e6
    scaling — past that, swap the last line to DECIMAL(38,0) on both
    engines (same exact result, wider lane).

    Scale (100 TB): lengths collapse to the (source, value) grain in
    one partial+final agg (support is bounded by distinct lengths, not
    documents); the pair fan-out is S^2 over the source census; the
    cumulative window partitions on the pair key with bounded
    occupancy (|support|); totals are an S-row broadcast.

    Reference parity: none (wordcount/grep only); SURVEY.md
    section 2.B eval/stats family.
    """
    docs = load_table(spark, sf_dir, "documents")
    vals = docs.groupBy(
        "source", F.col("n_chars").alias("val")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    tot = vals.groupBy("source").agg(F.sum("cnt").cast("bigint").alias("t"))
    ta = tot.select(F.col("source").alias("source_a"), F.col("t").alias("t_a"))
    tb = tot.select(F.col("source").alias("source_b"), F.col("t").alias("t_b"))
    pairs = ta.join(
        F.broadcast(tb), F.col("source_a") < F.col("source_b")
    ).select("source_a", "source_b")
    va = vals.select(F.col("source").alias("source_a"), "val", F.col("cnt").alias("cnt_a"))
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
    w = (
        Window.partitionBy("source_a", "source_b")
        .orderBy("val")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        support.join(va, ["source_a", "val"], "left")
        .join(
            vb.withColumnRenamed("val_b", "val"),
            ["source_b", "val"],
            "left",
        )
        .select(
            "source_a",
            "source_b",
            "val",
            F.sum(F.coalesce("cnt_a", F.lit(0))).over(w).alias("ca"),
            F.sum(F.coalesce("cnt_b", F.lit(0))).over(w).alias("cb"),
        )
    )
    return (
        cum.join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .groupBy("source_a", "source_b", "t_a", "t_b")
        .agg(
            F.max(F.abs(F.col("ca") * F.col("t_b") - F.col("cb") * F.col("t_a"))).alias(
                "d_scaled"
            )
        )
        .select(
            "source_a",
            "source_b",
            F.col("t_a").alias("n_a"),
            F.col("t_b").alias("n_b"),
            F.expr("d_scaled * 1000000 div (t_a * t_b)").cast("bigint").alias("ks_micro"),
        )
    )


# ------------------------------ Jensen-Shannon divergence of sources

# 0.5 * ln 2 in nano-nats: the per-token contribution of mass that one
# side of a pair holds on tokens the other side lacks (p*ln(2p/p) =
# p*ln 2 summed over the disjoint support).
_HALF_LN2_NANO = 0.5 * math.log(2.0) * 1_000_000_000


@register(
    "jsd_source_unigrams",
    tags=("text", "stats", "join", "eval"),
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest({_TOKS}) AS term FROM documents
    ),
    cnt AS (
      SELECT source, term, COUNT(*) AS c FROM tok GROUP BY 1, 2
    ),
    tot AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS t FROM cnt GROUP BY 1
    ),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             a.t AS t1, b.t AS t2
      FROM tot a JOIN tot b ON a.source < b.source
    ),
    pairterms AS (
      SELECT a.source AS source_a, b.source AS source_b,
             a.c AS c1, b.c AS c2,
             CAST(ROUND(500000000 * (
               CAST(a.c AS DOUBLE) / ta.t
                 * ln(CAST(2 * a.c * tb.t AS DOUBLE)
                      / (a.c * tb.t + b.c * ta.t))
               + CAST(b.c AS DOUBLE) / tb.t
                 * ln(CAST(2 * b.c * ta.t AS DOUBLE)
                      / (a.c * tb.t + b.c * ta.t))
             )) AS BIGINT) AS contrib_nano
      FROM cnt a JOIN cnt b ON a.term = b.term AND a.source < b.source
      JOIN tot ta ON ta.source = a.source
      JOIN tot tb ON tb.source = b.source
    ),
    agg AS (
      SELECT source_a, source_b, COUNT(*) AS n_shared,
             SUM(contrib_nano) AS sum_nano,
             SUM(c1) AS sc1, SUM(c2) AS sc2
      FROM pairterms GROUP BY 1, 2
    )
    SELECT p.source_a, p.source_b,
           CAST(COALESCE(g.n_shared, 0) AS BIGINT) AS n_shared_terms,
           CAST((COALESCE(g.sum_nano, 0)
                 + CAST(ROUND({_HALF_LN2_NANO!r}
                              * (CAST(p.t1 - COALESCE(g.sc1, 0) AS DOUBLE) / p.t1
                                 + CAST(p.t2 - COALESCE(g.sc2, 0) AS DOUBLE) / p.t2))
                        AS BIGINT)
                ) // 1000 AS BIGINT) AS jsd_micro
    FROM pairs p LEFT JOIN agg g USING (source_a, source_b)
    """,
)
def jsd_source_unigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between every pair of corpus
    sources' unigram token distributions — the symmetric, bounded
    (0..ln 2) distribution distance curation teams track to detect
    mixture drift between corpus slices (and to pick which sources to
    down-weight when two are near-duplicates of each other). One row
    per unordered source pair.

    Decomposition: the per-token JS integrand is summed over the
    SHARED vocabulary only (an inner equi-join on term); mass each
    side holds on tokens the other lacks contributes exactly
    ``0.5 * ln2 * missing_mass`` per side, added in closed form from
    the pair's shared-mass totals — no full-outer join, no NULL
    handling.

    Determinism: per-token contributions see ln() of ratios of exact
    integer products (identical IEEE doubles both engines, same
    operation order) and are quantized to nano-nats BEFORE the bigint
    sum; the two disjoint-support corrections round once per pair.

    Scale (100 TB): token counts are one partial+final agg on
    (source, term); the pair fan-out joins counts to counts on the
    term key (an equi-join whose output is bounded by shared-vocab
    size x S^2 for S curated sources — S is a handful, and the join
    never materializes the token-level corpus twice); per-source
    totals are an S-row broadcast. Nothing is ever compared all-pairs
    at the document level.

    Reference parity: none (wordcount/grep only); SURVEY.md
    section 2.B text/eval family.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(tokens("text")).alias("term"))
    cnt = tok.groupBy("source", "term").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("source").agg(F.sum("c").cast("bigint").alias("t"))
    a = cnt.select(
        F.col("source").alias("source_a"), "term", F.col("c").alias("c1")
    )
    b = cnt.select(
        F.col("source").alias("source_b"),
        F.col("term").alias("term_b"),
        F.col("c").alias("c2"),
    )
    ta = tot.select(F.col("source").alias("source_a"), F.col("t").alias("t1"))
    tb = tot.select(F.col("source").alias("source_b"), F.col("t").alias("t2"))
    denom = F.col("c1") * F.col("t2") + F.col("c2") * F.col("t1")
    contrib = (
        F.col("c1").cast("double")
        / F.col("t1")
        * F.log((2 * F.col("c1") * F.col("t2")).cast("double") / denom)
        + F.col("c2").cast("double")
        / F.col("t2")
        * F.log((2 * F.col("c2") * F.col("t1")).cast("double") / denom)
    )
    pairs = ta.join(F.broadcast(tb), F.col("source_a") < F.col("source_b")).select(
        "source_a", "source_b", "t1", "t2"
    )
    pairterms = (
        a.join(b, (F.col("term") == F.col("term_b")) & (F.col("source_a") < F.col("source_b")))
        .join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .select(
            "source_a",
            "source_b",
            "c1",
            "c2",
            F.round(F.lit(500000000.0) * contrib).cast("bigint").alias("contrib_nano"),
        )
    )
    agg = pairterms.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("n_shared"),
        F.sum("contrib_nano").alias("sum_nano"),
        F.sum("c1").alias("sc1"),
        F.sum("c2").alias("sc2"),
    )
    # Pairs with an empty shared vocabulary still get a row: every
    # term is disjoint-support mass, so JSD degrades to exactly ln 2.
    corr = F.round(
        F.lit(_HALF_LN2_NANO)
        * (
            (F.col("t1") - F.coalesce("sc1", F.lit(0))).cast("double") / F.col("t1")
            + (F.col("t2") - F.coalesce("sc2", F.lit(0))).cast("double") / F.col("t2")
        )
    ).cast("bigint")
    return (
        pairs.join(agg, ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            F.coalesce("n_shared", F.lit(0)).cast("bigint").alias("n_shared_terms"),
            (F.coalesce("sum_nano", F.lit(0)) + corr).alias("_tot"),
        )
        .select(
            "source_a",
            "source_b",
            "n_shared_terms",
            F.expr("_tot div 1000").cast("bigint").alias("jsd_micro"),
        )
    )


