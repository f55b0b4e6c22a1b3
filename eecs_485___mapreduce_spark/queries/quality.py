"""Statistical data-quality census operators: Benford first-digit
audit, Gini concentration, weighted median, a mergeable count-min
sketch, and exponentially-weighted moving averages.

These are the distribution-level checks a warehouse runs ON an
analytics engine's tables — fraud/anomaly screens (Benford),
inequality/concentration measures (Gini), robust centers under skew
(weighted median), sublinear frequency summaries (count-min), and
recency-weighted user scores (EWMA). Everything follows the package's
shared discipline: integer-exact arithmetic with deterministic
tiebreaks so the DuckDB oracle matches value-for-value, partial-agg /
equi-join shapes only, no Python in the data path.

Reference parity: none of these exist in the reference (its whole
query surface is wordcount + grep, mapreduce/__init__.py); they are
committed analytics/sketch families from SURVEY.md section 2.B.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import md5_long, md5_long_sql
from ..registry import register
from ..sources import load_table

# ------------------------------------------------ Benford first digit

# Expected Benford shares log10(1 + 1/d) in integer micro-units.
# Computed ONCE here and embedded as the same literal in the Spark
# plan and the oracle SQL, so no engine ever evaluates log10 — the
# cross-engine float risk is gone by construction.
BENFORD_MICRO = {d: round(math.log10(1.0 + 1.0 / d) * 1_000_000) for d in range(1, 10)}

_BENFORD_VALUES_SQL = ", ".join(f"({d}, {m})" for d, m in BENFORD_MICRO.items())


@register(
    "benford_first_digit",
    tags=("agg", "stats", "string"),
    oracle=f"""
    WITH expected(digit, expected_micro) AS (VALUES {_BENFORD_VALUES_SQL}),
    obs AS (
      SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR),
                         1, 1) AS BIGINT) AS digit,
             COUNT(*) AS n_orders
      FROM orders WHERE o_totalprice >= 1 GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(n_orders) AS BIGINT) AS total FROM obs)
    SELECT e.digit,
           COALESCE(obs.n_orders, 0) AS n_orders,
           e.expected_micro,
           CAST(ROUND(1000.0
                 * CAST(COALESCE(obs.n_orders, 0) * 1000000
                        - tot.total * e.expected_micro AS DOUBLE)
                 * CAST(COALESCE(obs.n_orders, 0) * 1000000
                        - tot.total * e.expected_micro AS DOUBLE)
                 / (1000000.0 * tot.total * e.expected_micro))
                AS BIGINT) AS chi2_milli
    FROM expected e LEFT JOIN obs ON obs.digit = e.digit
    CROSS JOIN tot
    """,
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals: observed
    count per leading digit vs the log10(1+1/d) expectation, with the
    per-digit chi-square contribution — the classic fabricated-data /
    corruption screen for financial columns.

    Determinism: expected shares are Python-computed integer
    micro-unit literals shared by both plans (neither engine evaluates
    log10); the chi-square numerator ``n*1e6 - total*expected_micro``
    is exact BIGINT arithmetic (|.| < 2^53, so the cast to DOUBLE for
    squaring is exact and the subsequent IEEE ops are identical
    cross-engine); output is rounded milli-units.

    Scale (100 TB): one partial+final agg on a 9-value key — the
    digit is a scan-side string projection in codegen. The expected
    table is a 9-row literal broadcast. Output is constant-size.
    """
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") >= 1)
    obs = orders.groupBy(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    expected = spark.createDataFrame(
        [(d, m) for d, m in BENFORD_MICRO.items()], "digit long, expected_micro long"
    )
    tot = obs.agg(F.sum("n_orders").cast("long").alias("total"))
    num = (
        F.coalesce(F.col("n_orders"), F.lit(0)) * F.lit(1_000_000)
        - F.col("total") * F.col("expected_micro")
    ).cast("double")
    return (
        expected.join(F.broadcast(obs), "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
            "expected_micro",
            F.round(
                F.lit(1000.0)
                * num
                * num
                / (F.lit(1_000_000.0) * F.col("total") * F.col("expected_micro"))
            )
            .cast("long")
            .alias("chi2_milli"),
        )
    )


# ------------------------------------------------- Gini concentration


@register(
    "gini_revenue_by_nation",
    tags=("window", "agg", "stats", "join"),
    oracle="""
    WITH rev AS (
      SELECT o.o_custkey,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders o GROUP BY 1
    ),
    ranked AS (
      SELECT c.c_nationkey, rev.cents,
             ROW_NUMBER() OVER (PARTITION BY c.c_nationkey
                                ORDER BY rev.cents, rev.o_custkey) AS i
      FROM rev JOIN customer c ON c.c_custkey = rev.o_custkey
    )
    SELECT n.n_name,
           COUNT(*) AS n_customers,
           CAST(SUM(r.cents) AS BIGINT) AS total_cents,
           CAST(ROUND(1000.0
                 * (2 * SUM(r.i * r.cents) - (COUNT(*) + 1) * SUM(r.cents))
                 / (COUNT(*) * SUM(r.cents))) AS BIGINT) AS gini_milli
    FROM ranked r JOIN nation n ON n.n_nationkey = r.c_nationkey
    GROUP BY n.n_name
    """,
)
def gini_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue within each nation — the
    standard inequality/concentration measure (0 = equal spend, ->1 =
    one whale), via the rank formula
    ``G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x))`` over ascending
    per-customer revenue.

    Determinism: revenue is exact integer cents; ranks order by
    (cents, custkey) — a unique tiebreak; all sums are BIGINT-exact
    and only the final ratio is a rounded milli-unit.

    Scale (100 TB): orders collapse to per-customer revenue first
    (one partial+final agg shuffle on custkey), then equi-join the
    customer dim on the same key; the rank window partitions by
    nation over the CUSTOMER dimension (not the fact table) — per-
    nation partitions of dimension size, orders of magnitude below the
    fact stream. Nation name attaches via broadcast.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("cents")
    )
    ranked = rev.join(
        customer.select("c_custkey", "c_nationkey"),
        rev.o_custkey == customer.c_custkey,
    ).select(
        "c_nationkey",
        "cents",
        F.row_number()
        .over(
            Window.partitionBy("c_nationkey").orderBy("cents", "o_custkey")
        )
        .alias("i"),
    )
    n = F.count(F.lit(1))
    s = F.sum("cents")
    s1 = F.sum(F.col("i") * F.col("cents"))
    return (
        ranked.join(F.broadcast(nation), ranked.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            n.alias("n_customers"),
            s.cast("long").alias("total_cents"),
            F.round(
                F.lit(1000.0) * (2 * s1 - (n + 1) * s) / (n * s)
            )
            .cast("long")
            .alias("gini_milli"),
        )
    )


# --------------------------------------------------- weighted median


@register(
    "weighted_median_price_by_nation",
    tags=("window", "agg", "stats", "join"),
    oracle="""
    WITH pw AS (
      SELECT s.s_nationkey,
             CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS price_cents,
             CAST(SUM(CAST(ROUND(l.l_quantity) AS BIGINT)) AS BIGINT) AS w
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY 1, 2
    ),
    c AS (
      SELECT s_nationkey, price_cents,
             SUM(w) OVER (PARTITION BY s_nationkey ORDER BY price_cents) AS cumw,
             SUM(w) OVER (PARTITION BY s_nationkey) AS totw
      FROM pw
    )
    SELECT n.n_name,
           CAST(MAX(c.totw) AS BIGINT) AS total_weight,
           CAST(MIN(CASE WHEN 2 * c.cumw >= c.totw THEN c.price_cents END)
                AS BIGINT) AS wmedian_cents
    FROM c JOIN nation n ON n.n_nationkey = c.s_nationkey
    GROUP BY n.n_name
    """,
)
def weighted_median_price_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median line price per supplier nation — the
    robust center a pricing audit uses where skewed outliers make the
    mean useless (lower weighted median: smallest price whose
    cumulative weight reaches half the total).

    Determinism: prices are exact integer cents, weights exact BIGINT
    quantities; the threshold is the cross-multiplied integer compare
    ``2*cumw >= totw``; the cumsum orders by price_cents, which is
    UNIQUE within a nation after the pre-collapse — no tiebreak
    needed.

    Scale (100 TB): the fact stream first collapses to
    (nation, price_cents) weight sums — one partial+final agg shuffle
    whose key space is bounded by |nations| x |distinct prices|, NOT
    the row count. The median window then runs over that collapsed
    relation (thousands of rows per nation), never over raw lineitem.
    Supplier attaches via broadcast before the collapse.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    pw = (
        li.join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            li.l_suppkey == supplier.s_suppkey,
        )
        .groupBy(
            "s_nationkey",
            F.round(F.col("l_extendedprice") * 100, 0)
            .cast("long")
            .alias("price_cents"),
        )
        .agg(F.sum(F.round("l_quantity", 0).cast("long")).alias("w"))
    )
    wp = Window.partitionBy("s_nationkey")
    c = pw.select(
        "s_nationkey",
        "price_cents",
        F.sum("w").over(wp.orderBy("price_cents")).alias("cumw"),
        F.sum("w").over(wp).alias("totw"),
    )
    return (
        c.join(F.broadcast(nation), c.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.max("totw").cast("long").alias("total_weight"),
            F.min(
                F.when(2 * F.col("cumw") >= F.col("totw"), F.col("price_cents"))
            )
            .cast("long")
            .alias("wmedian_cents"),
        )
    )


# ------------------------------------------------- count-min sketch

CMS_DEPTH = 4
CMS_WIDTH = 256
CMS_TOPK = 10


def cms_cell_sql(seed_expr: str, key_expr: str) -> str:
    """DuckDB rendering of :func:`cms_cell` for the oracle —
    ``seed_expr`` and ``key_expr`` are SQL fragments (a literal int or
    a column reference both work)."""
    salted = (
        f"'cms' || CAST({seed_expr} AS VARCHAR) || ':' "
        f"|| CAST({key_expr} AS VARCHAR)"
    )
    return f"({md5_long_sql(salted)} % {CMS_WIDTH})"


def cms_cell(seed, key) -> F.Column:
    """The row's counter index in the seed-th sketch row: one md5 per
    (seed, key), reduced mod the sketch width."""
    seed_col = F.lit(seed) if isinstance(seed, int) else seed
    col = F.col(key) if isinstance(key, str) else key
    return F.pmod(
        md5_long(
            F.concat(
                F.lit("cms"), seed_col.cast("string"), F.lit(":"), col.cast("string")
            )
        ),
        F.lit(CMS_WIDTH),
    )


def cms_sketch(df: DataFrame, key: str) -> DataFrame:
    """The count-min sketch of ``df[key]`` as a (seed, cell, cnt)
    relation — CMS_DEPTH x CMS_WIDTH counters.

    This IS the mergeable state: sketches of two row-sets union by
    summing counts per (seed, cell) (pinned by
    tests/test_quality.py::test_cms_sketch_mergeable), which is what
    makes it a per-partition / per-day / per-shard rollup at 100 TB —
    each partial is a fixed 1024 counters regardless of input size.
    """
    seeds = F.explode(F.array(*[F.lit(s) for s in range(CMS_DEPTH)])).alias("seed")
    return (
        df.select(F.col(key), seeds)
        .select("seed", cms_cell(F.col("seed"), key).alias("cell"))
        .groupBy("seed", "cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


_CMS_SKETCH_SQL = " UNION ALL ".join(
    f"SELECT {s} AS seed, {cms_cell_sql(str(s), 'user_id')} AS cell, "
    f"COUNT(*) AS cnt FROM events GROUP BY 2"
    for s in range(CMS_DEPTH)
)


@register(
    "sketch_cms_user_counts",
    tags=("sketch", "agg", "hash", "topk"),
    oracle=f"""
    WITH sketch AS ({_CMS_SKETCH_SQL}),
    exact AS (
      SELECT user_id, COUNT(*) AS n_exact FROM events GROUP BY 1
    ),
    top AS (
      SELECT user_id, n_exact FROM exact
      ORDER BY n_exact DESC, user_id LIMIT {CMS_TOPK}
    ),
    probes AS (
      SELECT t.user_id, t.n_exact, s.seed,
             {cms_cell_sql('s.seed', 't.user_id')} AS cell
      FROM top t CROSS JOIN (SELECT DISTINCT seed FROM sketch) s
    )
    SELECT p.user_id,
           CAST(p.n_exact AS BIGINT) AS n_exact,
           CAST(MIN(sk.cnt) AS BIGINT) AS n_cms_est
    FROM probes p
    JOIN sketch sk ON sk.seed = p.seed AND sk.cell = p.cell
    GROUP BY p.user_id, p.n_exact
    """,
)
def sketch_cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation: build a 4x256 counter
    sketch over event user ids, then report the top-10 heaviest users
    with exact count vs the sketch's min-over-rows estimate (always
    >= exact — the CMS one-sided error, pinned by
    tests/test_quality.py).

    Determinism: cells come from the engine's md5 hash family (same
    literal formula in the oracle), counts are exact integers, and the
    top-k orders by (count DESC, user_id) — a unique tiebreak.

    Scale (100 TB): the sketch is the whole point — the groupBy
    (seed, cell) partial-aggregates each partition down to at most
    4x256 = 1024 counters before the shuffle, so
    sketch cost is constant memory per partition and a 1024-row
    shuffle regardless of event count, and sketches MERGE by cell-wise
    sum (tested). The probe side joins the 1024-row sketch via
    broadcast. The exact top-k here exists only to certify estimates
    at test scale; production keeps the sketch alone.
    """
    events = load_table(spark, sf_dir, "events")
    sketch = cms_sketch(events, "user_id")
    exact = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_exact"))
    top = exact.orderBy(F.col("n_exact").desc(), "user_id").limit(CMS_TOPK)
    seeds = spark.range(CMS_DEPTH).select(F.col("id").alias("seed"))
    probes = top.crossJoin(F.broadcast(seeds)).select(
        "user_id",
        "n_exact",
        "seed",
        cms_cell(F.col("seed"), "user_id").alias("cell"),
    )
    return (
        probes.join(F.broadcast(sketch), ["seed", "cell"])
        .groupBy("user_id", "n_exact")
        .agg(F.min("cnt").cast("long").alias("n_cms_est"))
        .select("user_id", F.col("n_exact").cast("long").alias("n_exact"), "n_cms_est")
    )


# ------------------------------------- population stability index

PSI_BINS = 10
PSI_BIN_CENTS = 2000  # 20.00-unit value bins


@register(
    "psi_value_drift_by_type",
    tags=("agg", "stats", "join"),
    oracle=f"""
    WITH v AS (
      SELECT event_type,
             event_id % 2 AS cohort,
             LEAST({PSI_BINS - 1}, GREATEST(0,
               CAST(ROUND(value * 100) AS BIGINT) // {PSI_BIN_CENTS})) AS bin
      FROM events WHERE value IS NOT NULL
    ),
    grid AS (
      SELECT t.event_type, b.bin
      FROM (SELECT DISTINCT event_type FROM v) t
      CROSS JOIN (SELECT unnest(range({PSI_BINS})) AS bin) b
    ),
    counts AS (
      SELECT g.event_type, g.bin,
             CAST(COALESCE(SUM(CASE WHEN v.cohort = 0 THEN 1 END), 0)
                  AS BIGINT) AS a,
             CAST(COALESCE(SUM(CASE WHEN v.cohort = 1 THEN 1 END), 0)
                  AS BIGINT) AS b
      FROM grid g LEFT JOIN v
        ON v.event_type IS NOT DISTINCT FROM g.event_type AND v.bin = g.bin
      GROUP BY g.event_type, g.bin
    ),
    tot AS (
      SELECT event_type, CAST(SUM(a) AS BIGINT) AS ta,
             CAST(SUM(b) AS BIGINT) AS tb
      FROM counts GROUP BY event_type
    ),
    terms AS (
      SELECT c.event_type, t.ta, t.tb,
             CAST(ROUND(1000000.0
               * ((c.a + 1.0) / (t.ta + {PSI_BINS})
                  - (c.b + 1.0) / (t.tb + {PSI_BINS}))
               * ln(((c.a + 1.0) / (t.ta + {PSI_BINS}))
                    / ((c.b + 1.0) / (t.tb + {PSI_BINS}))))
              AS BIGINT) AS term_micro
      FROM counts c JOIN tot t
        ON t.event_type IS NOT DISTINCT FROM c.event_type
    )
    SELECT event_type, ta AS n_base, tb AS n_current,
           CAST(SUM(term_micro) AS BIGINT) AS psi_micro
    FROM terms GROUP BY event_type, ta, tb
    """,
)
def psi_value_drift_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index of the event-value distribution,
    baseline cohort vs current cohort, per event type — the standard
    model-monitoring drift score (PSI < 0.1 stable, > 0.25 shifted):
    ``PSI = sum over bins (p_i - q_i) * ln(p_i / q_i)`` with
    Laplace-smoothed bin shares so empty bins stay finite. Cohorts
    here split deterministically by event-id parity; production swaps
    in a reference-window predicate.

    Determinism: bins are exact integer cents divided by a constant
    width; every count is BIGINT; each bin's PSI term is one fixed
    double expression over those integers, quantized to integer
    micro-units BEFORE the order-free sum (package discipline — same
    shape as the LLR keyword statistic).

    Scale (100 TB): the event stream collapses to (type, cohort, bin)
    counts in ONE partial+final agg — key space |types| x 2 x 10,
    constant-size regardless of stream length. The bin grid, totals,
    and PSI terms all run over that constant-size relation; the grid
    completion join is broadcast. This is the shape that lets drift
    run per-hour over a 100 TB/day stream: the rollup IS the state.
    """
    events = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    cents = F.round(F.col("value") * 100, 0).cast("long")
    v = events.select(
        "event_type",
        (F.col("event_id") % 2).alias("cohort"),
        F.least(
            F.lit(PSI_BINS - 1),
            F.greatest(F.lit(0), (cents / PSI_BIN_CENTS).cast("long")),
        ).alias("bin"),
    )
    counts0 = v.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("cohort") == 0, 1)).alias("a0"),
        F.sum(F.when(F.col("cohort") == 1, 1)).alias("b0"),
    )
    types = v.select("event_type").distinct()
    bins = spark.range(PSI_BINS).select(F.col("id").alias("bin"))
    grid = types.crossJoin(F.broadcast(bins))
    counts = (
        grid.join(
            counts0,
            [
                grid.event_type.eqNullSafe(counts0.event_type),
                grid.bin == counts0.bin,
            ],
            "left",
        )
        .select(
            grid.event_type,
            grid.bin,
            F.coalesce(F.col("a0"), F.lit(0)).cast("long").alias("a"),
            F.coalesce(F.col("b0"), F.lit(0)).cast("long").alias("b"),
        )
    )
    wt = Window.partitionBy("event_type")
    p = (F.col("a") + 1.0) / (F.col("ta") + PSI_BINS)
    q = (F.col("b") + 1.0) / (F.col("tb") + PSI_BINS)
    terms = counts.select(
        "event_type",
        F.sum("a").over(wt).alias("ta"),
        F.sum("b").over(wt).alias("tb"),
        "a",
        "b",
    ).select(
        "event_type",
        "ta",
        "tb",
        F.round(F.lit(1_000_000.0) * (p - q) * F.log(p / q), 0)
        .cast("long")
        .alias("term_micro"),
    )
    return terms.groupBy("event_type", "ta", "tb").agg(
        F.sum("term_micro").cast("long").alias("psi_micro")
    ).select(
        "event_type",
        F.col("ta").alias("n_base"),
        F.col("tb").alias("n_current"),
        "psi_micro",
    )


# ------------------------------------------------------------- EWMA

EWMA_RECENT_K = 20  # alpha = 1/2 over the K most recent events


@register(
    "ewma_user_value_recent",
    tags=("window", "timeseries", "stats"),
    oracle=f"""
    WITH recent AS (
      SELECT user_id,
             CAST(ROUND(value * 100) AS BIGINT) AS cents,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) - 1 AS age
      FROM events
    ),
    kept AS (SELECT * FROM recent WHERE age < {EWMA_RECENT_K})
    SELECT user_id,
           COUNT(*) AS n_recent,
           CAST(ROUND(10.0
                 * SUM(cents * (CAST(1 AS BIGINT) << ({EWMA_RECENT_K - 1} - age)))
                 / SUM(CAST(1 AS BIGINT) << ({EWMA_RECENT_K - 1} - age)))
                AS BIGINT) AS ewma_value_milli
    FROM kept GROUP BY user_id
    """,
)
def ewma_user_value_recent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (alpha = 1/2) of each
    user's event value over their {K} most recent events — the
    recency-weighted engagement score a ranking/abuse system keeps per
    user.

    Determinism: weights are exact powers of two built by bit-shift
    (never float pow), values are exact integer cents, recency ranks
    by (ts DESC, event_id DESC) — unique tiebreak; numerator and
    denominator are BIGINT-exact and only the final normalized ratio
    is a rounded milli-unit.

    Scale (100 TB): one shuffle on user_id; the rank window is
    per-user (bounded partitions), and WindowGroupLimit prunes each
    partition to its top {K} rows before the weighted sums. State per
    user is K rows — this is exactly the bounded-state shape the
    streaming twin keeps with applyInPandasWithState.
    """.format(K=EWMA_RECENT_K)
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    # filter on the RAW row_number (not the derived age): Spark's
    # WindowGroupLimit rule only recognizes rank-predicate pruning on
    # the window function's own output, and it prunes each user's
    # partition to K rows during the sort instead of after
    kept = (
        events.select(
            "user_id",
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= EWMA_RECENT_K)
        .select("user_id", "cents", (F.col("rn") - 1).alias("age"))
    )
    # pyspark's shiftleft() only takes a literal shift count; the SQL
    # form accepts an expression, and stays an exact integer power of
    # two (never float pow).
    weight = F.expr(f"shiftleft(cast(1 as bigint), {EWMA_RECENT_K - 1} - age)")
    return kept.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_recent"),
        F.round(F.lit(10.0) * F.sum(F.col("cents") * weight) / F.sum(weight))
        .cast("long")
        .alias("ewma_value_milli"),
    )


# -------------------------------------------- activity bitmap index


@register(
    "bitmap_user_activity_days",
    tags=("agg", "sketch", "bitwise"),
    oracle="""
    SELECT user_id,
           CAST(bit_or(CAST(1 AS BIGINT) << (day(ts) - 1)) AS BIGINT)
             AS day_bitmap,
           CAST(bit_count(bit_or(CAST(1 AS BIGINT) << (day(ts) - 1)))
                AS BIGINT) AS n_active_days,
           COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    """,
)
def bitmap_user_activity_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user day-of-month activity bitmap: one BIGINT whose bit
    (d-1) is set iff the user was active on day d, plus its popcount —
    the bitmap-index encoding engagement systems keep because set
    algebra on users becomes bitwise AND/OR on fixed-width integers.

    Determinism: pure integer bit algebra — bit_or is associative and
    commutative, so the aggregate is partition-order free by
    construction (no quantization needed anywhere).

    Scale (100 TB): the bitmap IS mergeable state — per-partition
    partial bit_or collapses each partition to one long per user
    before the single shuffle, and coarser rollups (weekly, monthly,
    per-cohort) OR the stored bitmaps without re-scanning events
    (pinned by tests/test_quality.py::test_activity_bitmap_mergeable).
    Constant 8 bytes of state per (user, month) at any event volume.
    """
    events = load_table(spark, sf_dir, "events")
    # pyspark's shiftleft() only takes a literal count; the SQL form
    # accepts the day expression (same note as the EWMA weights)
    day_bit = F.expr("shiftleft(cast(1 as bigint), day(ts) - 1)")
    bmp = F.bit_or(day_bit)
    return events.groupBy("user_id").agg(
        bmp.cast("long").alias("day_bitmap"),
        F.bit_count(bmp).cast("long").alias("n_active_days"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ------------------------------------------ anti-entropy checksum


@register(
    "integrity_checksum_orders",
    tags=("agg", "hash", "audit"),
    oracle=f"""
    SELECT o_orderstatus,
           COUNT(*) AS n_rows,
           CAST(bit_xor({md5_long_sql(
               "'ck:' || CAST(o_orderkey AS VARCHAR) || ':' "
               "|| CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR) "
               "|| ':' || CAST(o_custkey AS VARCHAR)"
           )}) AS BIGINT) AS xor_fingerprint
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def integrity_checksum_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table fingerprint per order status: XOR of a
    per-row md5 over the row's canonical key fields — the anti-entropy
    check two replicas (or a source and its migrated copy) exchange to
    prove they hold the same rows WITHOUT moving data: equal
    fingerprints + equal counts per group localize any divergence to a
    group.

    Determinism: the canonical string is explicit integer casts (key,
    exact cents, custkey) — no float or locale rendering; bit_xor is
    associative, commutative, and self-inverse, so the aggregate is
    partition-order free and verification composes: XOR of group
    fingerprints is the table fingerprint.

    Scale (100 TB): scan-side hash in codegen + one partial+final agg
    on a tiny key — each partition collapses to |groups| longs before
    the shuffle. The self-inverse property is the production win:
    after replicating a delta, the expected new fingerprint is
    old XOR delta — O(1) incremental maintenance, no re-scan
    (pinned by tests/test_quality.py::test_checksum_self_inverse).
    """
    orders = load_table(spark, sf_dir, "orders")
    row_hash = md5_long(
        F.concat(
            F.lit("ck:"),
            F.col("o_orderkey").cast("string"),
            F.lit(":"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long").cast("string"),
            F.lit(":"),
            F.col("o_custkey").cast("string"),
        )
    )
    return orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.bit_xor(row_hash).cast("long").alias("xor_fingerprint"),
    )


# ------------------------------------- rolling distinct (exact)

ROLLING_DISTINCT_DAYS = 7


@register(
    "rolling_7d_distinct_users",
    tags=("window", "timeseries", "agg"),
    oracle=f"""
    WITH active AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
      WHERE user_id IS NOT NULL
    ),
    covered AS (
      SELECT DISTINCT user_id, d + CAST(o.o AS INTEGER) AS cover_day
      FROM active, UNNEST(range({ROLLING_DISTINCT_DAYS})) AS o(o)
    ),
    days AS (SELECT DISTINCT CAST(ts AS DATE) AS cover_day FROM events)
    SELECT c.cover_day AS day,
           COUNT(*) AS n_distinct_users_7d
    FROM covered c JOIN days USING (cover_day)
    GROUP BY 1
    """,
)
def rolling_7d_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT trailing-{w}-day distinct active users per day — the
    rolling-retention denominator. Rolling COUNT(DISTINCT) has no
    window form in any engine; the scale-safe identity used here: a
    user active on day d is distinct-active for every window ending
    on d..d+{w1}, so explode each (user, active_day) to its {w} covered
    end-days, dedup (user, end_day), and the per-day count IS the
    rolling distinct count. Days outside the observed range are
    clipped by joining back to real event days.

    Determinism: pure integer/date set algebra — no approximation, no
    ordering anywhere.

    Scale (100 TB): the event stream first collapses to DISTINCT
    (user, day) — one partial+final agg bounded by |users| x |days|,
    orders of magnitude under the event count; the {w}-way explode and
    second dedup stay on that collapsed relation. Compare the HLL
    route (approx_users_hll_mergeable): sketches trade exactness for
    O(1) state — this is the exact complement when the
    user x day relation fits (it does: 8 bytes x users x days).
    """.format(w=ROLLING_DISTINCT_DAYS, w1=ROLLING_DISTINCT_DAYS - 1)
    events = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    active = events.select("user_id", F.to_date("ts").alias("d")).distinct()
    covered = (
        active.select(
            "user_id",
            "d",
            F.explode(
                F.sequence(F.lit(0), F.lit(ROLLING_DISTINCT_DAYS - 1))
            ).alias("o"),
        )
        .select("user_id", F.date_add(F.col("d"), F.col("o")).alias("cover_day"))
        .distinct()
    )
    days = events.select(F.to_date("ts").alias("cover_day")).distinct()
    return (
        covered.join(days, "cover_day")
        .groupBy(F.col("cover_day").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_distinct_users_7d"))
    )


# --------------------------------------- equi-depth range buckets

EQUIDEPTH_BUCKETS = 10


@register(
    "equidepth_buckets_orders",
    tags=("window", "agg", "stats", "layout"),
    oracle=f"""
    WITH v AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders
    ),
    d AS (SELECT cents, COUNT(*) AS c FROM v GROUP BY 1),
    n AS (SELECT CAST(SUM(c) AS BIGINT) AS nn FROM d),
    cum AS (SELECT cents, SUM(c) OVER (ORDER BY cents) AS cc FROM d),
    ks AS (SELECT unnest(range(1, {EQUIDEPTH_BUCKETS})) AS k),
    bd AS (
      SELECT ks.k, MIN(cum.cents) AS b
      FROM ks CROSS JOIN cum CROSS JOIN n
      WHERE {EQUIDEPTH_BUCKETS} * cum.cc >= ks.k * n.nn
      GROUP BY ks.k
    ),
    arr AS (SELECT list_sort(list(b)) AS bs FROM bd)
    SELECT CAST(1 + len(list_filter(arr.bs, x -> x < v.cents)) AS BIGINT)
             AS bucket,
           COUNT(*) AS n_orders,
           CAST(MIN(v.cents) AS BIGINT) AS min_cents,
           CAST(MAX(v.cents) AS BIGINT) AS max_cents
    FROM v CROSS JOIN arr
    GROUP BY 1
    """,
)
def equidepth_buckets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-frequency) bucketing of order totals: exact
    decile boundaries, then a census of each bucket's population and
    value range. This is the range-partitioner primitive — the split
    computation behind sorted-table layout, range shuffles, and
    equi-depth histograms for optimizer statistics (distinct from the
    equal-WIDTH histogram_totalprice).

    Determinism: boundaries are exact order statistics — boundary k is
    the smallest cents value whose cumulative count reaches
    ceil(k*n/{B}), decided by the cross-multiplied integer compare
    {B}*cum >= k*n; assignment counts boundaries strictly below the
    value. No floats anywhere.

    Scale (100 TB): the fact stream collapses to (distinct value,
    count) FIRST — one partial+final agg bounded by the value domain,
    not the row count; the ranked cumsum runs over that collapsed
    relation (same documented trade as the weighted median); the 9
    boundaries collapse to ONE broadcast array row, and assignment is
    a scan-side array filter in codegen — the fact table is never
    shuffled. Production range partitioners sample instead of exact-
    count; this exact form doubles as their correctness oracle.
    """.format(B=EQUIDEPTH_BUCKETS)
    orders = load_table(spark, sf_dir, "orders")
    v = orders.select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents")
    )
    d = v.groupBy("cents").agg(F.count(F.lit(1)).alias("c"))
    cum = d.select(
        "cents",
        F.sum("c").over(Window.orderBy("cents")).alias("cc"),
        F.sum("c").over(Window.partitionBy()).alias("nn"),
    )
    # Boundary pick as a crossing predicate (round-9, the ddsketch
    # percentile-probe pattern): boundary k is the FIRST row whose
    # cumulative count satisfies B*cc >= k*nn, and kmax = (B*cc) div nn
    # is nondecreasing in cents — so each row is the boundary for
    # exactly the ks in (kmax(prev), kmax(row)], emitted by one lag +
    # explode over the already-present single-partition ordering.
    # Algebraically identical to the old ks-crossJoin + per-k MIN
    # (min over a monotone-satisfier set IS the first crossing row),
    # but the k x |value domain| nested-loop fan-out on the collapsed
    # relation is gone — B-1 rows are emitted, total, at any scale.
    wo = Window.orderBy("cents")
    kmax = F.least(
        F.lit(EQUIDEPTH_BUCKETS - 1),
        F.expr(f"({EQUIDEPTH_BUCKETS} * cc) div nn"),
    )
    bd = (
        cum.select("cents", kmax.alias("kmax"))
        .withColumn(
            "kprev", F.coalesce(F.lag("kmax").over(wo), F.lit(0).cast("long"))
        )
        .where(F.col("kmax") > F.col("kprev"))
        .select(
            F.explode(
                F.sequence(F.col("kprev") + 1, F.col("kmax"))
            ).alias("k"),
            F.col("cents").alias("b"),
        )
    )
    arr = bd.agg(F.sort_array(F.collect_list("b")).alias("bs"))
    bucket = F.lit(1) + F.size(
        F.filter(F.col("bs"), lambda x: x < F.col("cents"))
    )
    return (
        v.crossJoin(F.broadcast(arr))
        .groupBy(bucket.cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("cents").cast("long").alias("min_cents"),
            F.max("cents").cast("long").alias("max_cents"),
        )
    )


# ------------------------------------------------- trimmed mean

TRIM_PCT = 10  # two-sided trim: drop floor(n/10) rows at each end


@register(
    "trimmed_mean_price_by_status",
    tags=("window", "agg", "stats"),
    oracle=f"""
    WITH v AS (
      SELECT o_orderstatus,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                ORDER BY CAST(ROUND(o_totalprice * 100)
                                              AS BIGINT), o_orderkey) AS rk,
             COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
      FROM orders
    )
    SELECT o_orderstatus,
           CAST(MAX(n) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN rk > n // {TRIM_PCT}
                          AND rk <= n - n // {TRIM_PCT}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(ROUND(10.0
                 * SUM(CASE WHEN rk > n // {TRIM_PCT}
                             AND rk <= n - n // {TRIM_PCT}
                            THEN cents END)
                 / SUM(CASE WHEN rk > n // {TRIM_PCT}
                             AND rk <= n - n // {TRIM_PCT}
                            THEN 1 END)) AS BIGINT) AS trimmed_mean_milli
    FROM v GROUP BY o_orderstatus
    """,
)
def trimmed_mean_price_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided {p}% trimmed mean of order totals per status — the
    robust center between the mean (outlier-dragged) and the median
    (throws away most of the data): drop the floor(n/{p}) smallest and
    largest rows, average the rest.

    Determinism: exact integer cents ranked with a unique
    (cents, orderkey) tiebreak; the trim bounds are integer floor
    division; sums are BIGINT-exact and only the final mean rounds to
    milli-units.

    Scale (100 TB): one shuffle on the status key; rank and count
    share a single window spec (one sorted pass), then one partial+
    final agg. The per-group sort is the documented trade for EXACT
    trimming — the approximate swap-in is percentile_approx bounds +
    a scan-side BETWEEN filter, same downstream agg.
    """.format(p=TRIM_PCT)
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    wp = Window.partitionBy("o_orderstatus")
    v = orders.select(
        "o_orderstatus",
        cents.alias("cents"),
        F.row_number().over(wp.orderBy(cents, "o_orderkey")).alias("rk"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    k = (F.col("n") / TRIM_PCT).cast("long")
    kept = F.when((F.col("rk") > k) & (F.col("rk") <= F.col("n") - k), 1)
    return v.groupBy("o_orderstatus").agg(
        F.max("n").cast("long").alias("n_orders"),
        F.sum(F.coalesce(kept, F.lit(0))).cast("long").alias("n_kept"),
        F.round(
            F.lit(10.0)
            * F.sum(F.when(kept.isNotNull(), F.col("cents")))
            / F.sum(kept)
        )
        .cast("long")
        .alias("trimmed_mean_milli"),
    )


# ------------------------------------------------ Fano dispersion


@register(
    "fano_burstiness_by_type",
    tags=("agg", "stats", "timeseries"),
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             date_trunc('hour', ts) AS h,
             COUNT(*) AS c
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           COUNT(*) AS n_hours,
           CAST(SUM(c) AS BIGINT) AS n_events,
           CAST(ROUND(1000.0
                 * (COUNT(*) * SUM(c * c) - SUM(c) * SUM(c))
                 / (COUNT(*) * SUM(c))) AS BIGINT) AS fano_milli
    FROM hourly GROUP BY event_type
    """,
)
def fano_burstiness_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (variance-to-mean ratio of hourly counts) per event
    type — the standard burstiness index: 1000 milli = Poisson-like
    arrivals, above = bursty, below = regular. The dispersion
    complement to the 3-sigma anomaly detectors (which flag WHICH
    hours deviate; this scores HOW dispersed a stream is overall).

    Determinism: hourly counts are exact integers; variance/mean
    collapses algebraically to (n*sum(c^2) - sum(c)^2) / (n*sum(c)) —
    one integer expression, rounded once to milli-units (population
    variance, consistent cross-engine).

    Scale (100 TB): the stream collapses to (type, hour) counts first
    (one partial+final agg; key space |types| x |hours|), then a
    |types|-sized moment aggregation — the same rollup-first
    discipline as the Markov/anomaly/KS family.
    """
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("c"))
    n = F.count(F.lit(1))
    s = F.sum("c")
    s2 = F.sum(F.col("c") * F.col("c"))
    return hourly.groupBy("event_type").agg(
        n.alias("n_hours"),
        s.cast("long").alias("n_events"),
        F.round(F.lit(1000.0) * (n * s2 - s * s) / (n * s))
        .cast("long")
        .alias("fano_milli"),
    )


# ------------------------------------------------ rate-limit audit

BOT_RATE_TOPK = 20


@register(
    "bot_rate_audit",
    tags=("agg", "timeseries", "topk"),
    oracle=f"""
    WITH per_min AS (
      SELECT user_id, date_trunc('minute', ts) AS m, COUNT(*) AS c
      FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2
    ),
    per_user AS (
      SELECT user_id,
             CAST(MAX(c) AS BIGINT) AS max_per_min,
             COUNT(*) AS n_active_minutes,
             CAST(SUM(c) AS BIGINT) AS n_events,
             CAST(ROUND(1000.0 * SUM(c) / COUNT(*)) AS BIGINT)
               AS events_per_min_milli
      FROM per_min GROUP BY user_id
    )
    SELECT * FROM per_user
    ORDER BY max_per_min DESC, user_id
    LIMIT {BOT_RATE_TOPK}
    """,
)
def bot_rate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Abuse/rate-limit audit: the top-{k} users by peak per-minute
    event rate, with their active-minute count and mean in-activity
    rate — the burst profile a bot screen thresholds on (a human's
    max_per_min is small; a scraper's is its request loop).

    Determinism: per-minute counts are exact (timestamp truncation is
    identical cross-engine); the top-k tiebreaks on user_id; the mean
    rate is one milli rounding.

    Scale (100 TB): the stream collapses to (user, minute) counts —
    one partial+final agg — then to one row per user; top-k plans
    TakeOrdered. This is the same rollup the streaming anomaly
    detector keeps as state, here as the batch forensic view.
    """.format(k=BOT_RATE_TOPK)
    events = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    per_min = events.groupBy(
        "user_id", F.date_trunc("minute", "ts").alias("m")
    ).agg(F.count(F.lit(1)).alias("c"))
    per_user = per_min.groupBy("user_id").agg(
        F.max("c").cast("long").alias("max_per_min"),
        F.count(F.lit(1)).alias("n_active_minutes"),
        F.sum("c").cast("long").alias("n_events"),
        F.round(F.lit(1000.0) * F.sum("c") / F.count(F.lit(1)))
        .cast("long")
        .alias("events_per_min_milli"),
    )
    return per_user.orderBy(F.col("max_per_min").desc(), "user_id").limit(
        BOT_RATE_TOPK
    )


# ------------------------------------------ Theil inequality decomposition


@register(
    "theil_decomposition_revenue",
    tags=("stats", "agg", "join"),
    oracle="""
    WITH cr AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS r
      FROM orders GROUP BY o_custkey
    ),
    j AS (
      SELECT c.c_nationkey, cr.o_custkey, cr.r
      FROM cr JOIN customer c ON c.c_custkey = cr.o_custkey
    ),
    nat AS (
      SELECT c_nationkey, SUM(r) AS tg, COUNT(*) AS ng FROM j GROUP BY 1
    ),
    tot AS (SELECT SUM(tg) AS t, CAST(SUM(ng) AS BIGINT) AS n FROM nat),
    within_terms AS (
      SELECT j.c_nationkey,
             CAST(ROUND(1000000000.0
                   * (CAST(j.r AS DOUBLE) / CAST(tot.t AS DOUBLE))
                   * ln(CAST(j.r AS DOUBLE) * nat.ng / CAST(nat.tg AS DOUBLE)))
                  AS BIGINT) AS w_nano
      FROM j JOIN nat ON nat.c_nationkey = j.c_nationkey, tot
    ),
    within AS (
      SELECT c_nationkey, CAST(SUM(w_nano) AS BIGINT) AS within_nano
      FROM within_terms GROUP BY 1
    )
    SELECT nat.c_nationkey,
           CAST(nat.ng AS BIGINT) AS n_customers,
           CAST(ROUND(1000000000.0
                 * (CAST(nat.tg AS DOUBLE) / CAST(tot.t AS DOUBLE))
                 * ln((CAST(nat.tg AS DOUBLE) / CAST(tot.t AS DOUBLE))
                      * (tot.n / CAST(nat.ng AS DOUBLE))))
                AS BIGINT) AS between_nano,
           within.within_nano
    FROM nat JOIN within USING (c_nationkey), tot
    """,
)
def theil_decomposition_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T inequality decomposition of customer revenue by nation:
    per nation, the BETWEEN-group term (tg/T)*ln((tg/T)/(ng/N)) and
    the summed WITHIN-group contributions (r_i/T)*ln(r_i*ng/tg) —
    total inequality = sum(between) + sum(within), the additive
    decomposition Gini famously lacks (and why national statistics
    offices report Theil next to it; gini_revenue_by_nation above).

    Determinism: revenue collapses to exact decimals first; each log
    term is ONE double expression evaluated identically by both
    engines from identical exact inputs, quantized to nano-units
    before the order-free BIGINT sum (the package's LLR/entropy
    pattern).

    Scale: fact stream -> per-customer collapse (one shuffle), dim
    join, |nations|-row group relation; the global scalars broadcast
    back via a 1-row cross join. Nothing larger than the customer
    dimension is ever windowed or re-scanned.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    cr = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("r")
    )
    j = cr.join(
        customer.select("c_custkey", "c_nationkey"),
        F.col("c_custkey") == F.col("o_custkey"),
    ).select("c_nationkey", "o_custkey", "r")
    nat = j.groupBy("c_nationkey").agg(
        F.sum("r").alias("tg"), F.count(F.lit(1)).alias("ng")
    )
    tot = nat.agg(F.sum("tg").alias("t"), F.sum("ng").alias("n"))
    rd, td = F.col("r").cast("double"), F.col("t").cast("double")
    tgd = F.col("tg").cast("double")
    within = (
        j.join(nat, "c_nationkey")
        .crossJoin(F.broadcast(tot))
        .select(
            "c_nationkey",
            F.round(
                F.lit(1000000000.0)
                * (rd / td)
                * F.log(rd * F.col("ng") / tgd)
            )
            .cast("bigint")
            .alias("w_nano"),
        )
        .groupBy("c_nationkey")
        .agg(F.sum("w_nano").alias("within_nano"))
    )
    share = tgd / td
    return (
        nat.crossJoin(F.broadcast(tot))
        .select(
            "c_nationkey",
            F.col("ng").alias("n_customers"),
            F.round(
                F.lit(1000000000.0)
                * share
                * F.log(share * (F.col("n") / F.col("ng").cast("double")))
            )
            .cast("bigint")
            .alias("between_nano"),
        )
        .join(within, "c_nationkey")
    )


