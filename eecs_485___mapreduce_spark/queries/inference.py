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

from ..functions import md5_long, md5_long_sql, tokens
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
    ).localCheckpoint(eager=False)
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
                 6) AS spearman_rho
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
