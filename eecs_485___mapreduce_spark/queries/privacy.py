"""Privacy-engineering operators: deterministic pseudonymization with
a referential-consistency census, a k-anonymity risk audit, and an
l-diversity audit over quasi-identifier groups.

A training-data pipeline that handles user data needs these alongside
PII scrubbing (queries/pipeline.py) and right-to-be-forgotten
cascades (rtbf_delete_audit): replace natural keys with surrogate
keys WITHOUT breaking joins, then measure how re-identifiable the
remaining quasi-identifiers leave each row (k-anonymity) and how much
the sensitive attribute still varies inside each group (l-diversity).

Shared discipline: surrogate keys come from the package's cross-engine
md5_long (the same 60-bit hash the dedup family uses), every census is
a scan-side projection into a bounded agg, and all outputs are
integers so the DuckDB oracle matches value-for-value.

Reference parity: none of this exists in the reference (wordcount +
grep only); extends SURVEY.md section 2.B's training-pipeline family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import md5_long, md5_long_sql
from ..registry import register
from ..sources import load_table, load_tables

# ------------------------------------------------- pseudonymization

# Domain-separated surrogate key: hashing 'cust:<id>' rather than the
# bare id means customer 7 and supplier 7 can never collide into the
# same pseudonym space.
_SK_PREFIX = "cust:"


def _surrogate(c: Column) -> Column:
    return md5_long(F.concat(F.lit(_SK_PREFIX), c.cast("string")))


_SK_SQL = md5_long_sql(f"'{_SK_PREFIX}' || CAST({{c}} AS VARCHAR)")


@register(
    "pseudonymize_linkage",
    tags=("privacy", "join", "agg"),
    oracle=f"""
    WITH pc AS (
      SELECT c_nationkey,
             {_SK_SQL.format(c="c_custkey")} AS sk
      FROM customer
    ),
    po AS (
      SELECT sk, COUNT(*) AS n_orders FROM (
        SELECT {_SK_SQL.format(c="o_custkey")} AS sk
        FROM orders
      ) GROUP BY sk
    )
    SELECT c_nationkey,
           COUNT(*) AS n_customers,
           COUNT(DISTINCT pc.sk) AS n_distinct_sk,
           CAST(SUM(COALESCE(po.n_orders, 0)) AS BIGINT) AS n_orders_linked
    FROM pc LEFT JOIN po ON po.sk = pc.sk
    GROUP BY c_nationkey
    """,
)
def pseudonymize_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudonymize the customer key on BOTH sides of the
    customer->orders relationship with the same deterministic
    surrogate (md5 of a domain-separated string), then prove the
    linkage survives: per nation, customers, distinct surrogates
    (collisions show up as n_distinct_sk < n_customers), and orders
    still reachable through the surrogate join.

    Scale: the surrogate is a pure hash — no lookup table to build,
    distribute, or protect; re-keying 100 TB is a map-only pass. The
    census joins the per-surrogate order counts (one shuffle on the
    60-bit key, same cost as the natural-key join) onto the customer
    side, then collapses to a |nations|-row report.
    """
    t = load_tables(spark, sf_dir, "customer", "orders")
    pc = t["customer"].select(
        "c_nationkey", _surrogate(F.col("c_custkey")).alias("sk")
    )
    po = (
        t["orders"]
        .select(_surrogate(F.col("o_custkey")).alias("sk"))
        .groupBy("sk")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        pc.join(po, "sk", "left")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.countDistinct("sk").alias("n_distinct_sk"),
            F.sum(F.coalesce("n_orders", F.lit(0))).alias("n_orders_linked"),
        )
    )


# ------------------------------------------------- k-anonymity audit

_KA_BANDS_SQL = """
    CASE WHEN k = 1 THEN 'k=1 unique'
         WHEN k < 5 THEN '2<=k<5'
         WHEN k < 20 THEN '5<=k<20'
         ELSE 'k>=20' END
"""


@register(
    "k_anonymity_audit",
    tags=("privacy", "agg"),
    oracle=f"""
    WITH groups AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
             COUNT(*) AS k
      FROM customer
      GROUP BY 1, 2, 3
    )
    SELECT {_KA_BANDS_SQL} AS risk_band,
           COUNT(*) AS n_groups,
           CAST(SUM(k) AS BIGINT) AS n_rows
    FROM groups
    GROUP BY 1
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity census over the quasi-identifier tuple
    (nation, market segment, account-balance kilo-band): how many
    rows sit in groups of size 1 (fully re-identifiable), 2-4, 5-19,
    and >=20. The release decision ("suppress or generalize every
    k<5 group") reads straight off this report.

    Scale: one shuffle on the QI tuple builds the group sizes
    (map-side partial agg), then a 4-row band census — the fact
    stream never leaves the scan stage unaggregated. Banding
    thresholds are integer comparisons on exact counts.
    """
    cust = load_table(spark, sf_dir, "customer")
    groups = cust.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("bigint").alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("k"))
    band = (
        F.when(F.col("k") == 1, "k=1 unique")
        .when(F.col("k") < 5, "2<=k<5")
        .when(F.col("k") < 20, "5<=k<20")
        .otherwise("k>=20")
    )
    return groups.groupBy(band.alias("risk_band")).agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("k").alias("n_rows"),
    )


# ------------------------------------------------- l-diversity audit


@register(
    "l_diversity_audit",
    tags=("privacy", "join", "agg"),
    oracle="""
    WITH joined AS (
      SELECT c.c_nationkey, c.c_mktsegment, o.o_orderpriority
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    ),
    groups AS (
      SELECT c_nationkey, c_mktsegment,
             COUNT(DISTINCT o_orderpriority) AS l,
             COUNT(*) AS n_orders
      FROM joined GROUP BY 1, 2
    )
    SELECT l,
           COUNT(*) AS n_groups,
           CAST(SUM(n_orders) AS BIGINT) AS n_orders
    FROM groups GROUP BY l
    """,
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity census: for each quasi-identifier group
    (nation, market segment), how many DISTINCT values of the
    sensitive attribute (order priority) appear — a group that is
    k-anonymous but shows a single priority still leaks it to anyone
    who can place a customer in the group. Report = distribution of
    l over groups.

    Scale: fact side joins the broadcast-size customer projection
    (AQE broadcasts the dim), one shuffle on the QI tuple with a
    distinct-aggregate expansion, then a <=|priorities|-row census.
    """
    t = load_tables(spark, sf_dir, "customer", "orders")
    joined = t["orders"].join(
        t["customer"].select("c_custkey", "c_nationkey", "c_mktsegment"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    groups = joined.groupBy("c_nationkey", "c_mktsegment").agg(
        F.countDistinct("o_orderpriority").alias("l"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return groups.groupBy("l").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("n_orders").alias("n_orders"),
    )


# ------------------------------------- differential privacy (geometric)

# Two-sided geometric mechanism (Ghosh-Roughgarden-Sundararajan, the
# discrete analogue of Laplace; epsilon-DP for sensitivity-1 counts):
# P(noise = k) ∝ alpha^|k| with alpha = exp(-epsilon). Sampling is
# derandomized the way every stochastic operator here is (k-means
# seeds, stratified sampling): a 32-bit hash of the scope key is
# looked up in a CUMULATIVE-CDF threshold table precomputed ONCE in
# Python and embedded as the same integer literals in both plans —
# neither engine ever evaluates exp()/ln(), so the cross-engine float
# risk is gone by construction, and re-running the query yields the
# SAME noise per scope (the "sticky noise" everyone needs so repeated
# queries can't average the noise away).
_DP_EPS_MILLI = 500  # epsilon = 0.5
_DP_MAX_K = 32
_DP_SCALE = 1 << 32


def _dp_thresholds() -> list[tuple[int, int, int]]:
    import math

    alpha = math.exp(-_DP_EPS_MILLI / 1000.0)
    ks = list(range(-_DP_MAX_K, _DP_MAX_K + 1))
    weights = [alpha ** abs(k) for k in ks]
    total = sum(weights)
    rows, lo, acc = [], 0, 0.0
    for k in ks:
        acc += weights[ks.index(k)] / total
        hi = _DP_SCALE if k == _DP_MAX_K else min(_DP_SCALE, round(acc * _DP_SCALE))
        rows.append((k, lo, hi))
        lo = hi
    return rows


_DP_ROWS = _dp_thresholds()
_DP_VALUES_SQL = ", ".join(f"({k}, {lo}, {hi})" for k, lo, hi in _DP_ROWS)


@register(
    "dp_noisy_event_counts",
    tags=("privacy", "agg", "sketch"),
    oracle=f"""
    WITH counts AS (
      SELECT event_type AS scope, COUNT(*) AS n_true
      FROM events WHERE event_type IS NOT NULL GROUP BY 1
    ),
    noise(k, lo, hi) AS (VALUES {_DP_VALUES_SQL}),
    u AS (
      SELECT scope, n_true,
             {md5_long_sql("'dp:' || scope")} % {_DP_SCALE} AS u32
      FROM counts
    )
    SELECT u.scope, u.n_true, CAST(n.k AS BIGINT) AS noise,
           u.n_true + n.k AS n_noisy,
           CAST({_DP_EPS_MILLI} AS BIGINT) AS eps_milli
    FROM u JOIN noise n ON u.u32 >= n.lo AND u.u32 < n.hi
    """,
)
def dp_noisy_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epsilon-differentially-private event-type counts via the
    two-sided geometric mechanism with DETERMINISTIC (sticky) noise:
    each scope's noise is fixed by a 32-bit hash of the scope key
    looked up in a precomputed integer CDF table, so the same query
    always returns the same noisy answer — re-query averaging cannot
    strip the protection — and the DuckDB oracle matches exactly
    because both engines only compare integers (exp() runs once, in
    Python, at import).

    Scale (100 TB): one partial+final count agg on event_type; the
    65-row threshold table is a broadcast literal and the range lookup
    a broadcast nested loop over the handful of scope rows. Adding
    per-(type, day) scopes keeps the same shape — noise lookup stays
    a constant-size broadcast.

    Reference parity: none (privacy family beyond wordcount/grep,
    mapreduce/__init__.py); SURVEY.md section 2.B training-pipeline row.
    """
    ev = load_table(spark, sf_dir, "events").where(F.col("event_type").isNotNull())
    counts = ev.groupBy(F.col("event_type").alias("scope")).agg(
        F.count(F.lit(1)).alias("n_true")
    )
    noise = spark.createDataFrame(_DP_ROWS, "k long, lo long, hi long")
    u32 = F.pmod(
        md5_long(F.concat(F.lit("dp:"), F.col("scope"))), F.lit(_DP_SCALE)
    ).alias("u32")
    u = counts.select("scope", "n_true", u32)
    return (
        u.join(
            F.broadcast(noise),
            (F.col("u32") >= F.col("lo")) & (F.col("u32") < F.col("hi")),
        )
        .select(
            "scope",
            "n_true",
            F.col("k").cast("long").alias("noise"),
            (F.col("n_true") + F.col("k")).alias("n_noisy"),
            F.lit(_DP_EPS_MILLI).cast("long").alias("eps_milli"),
        )
    )


# ------------------------------------------------- t-closeness audit

T_CLOSENESS_MILLI = 250  # release gate: EMD(group, global) <= 0.25


@register(
    "t_closeness_audit",
    tags=("privacy", "join", "agg", "window"),
    oracle=f"""
    WITH j AS (
      SELECT c_nationkey, c_mktsegment, o_orderpriority AS p
      FROM customer JOIN orders ON o_custkey = c_custkey
    ),
    cats AS (SELECT DISTINCT p FROM j),
    grps AS (SELECT c_nationkey, c_mktsegment, COUNT(*) AS n_g
             FROM j GROUP BY 1, 2),
    cellc AS (SELECT c_nationkey, c_mktsegment, p, COUNT(*) AS c
              FROM j GROUP BY 1, 2, 3),
    grid AS (
      SELECT g.c_nationkey, g.c_mktsegment, g.n_g, cats.p,
             COALESCE(cellc.c, 0) AS c
      FROM grps g CROSS JOIN cats
      LEFT JOIN cellc USING (c_nationkey, c_mktsegment, p)
    ),
    gcum AS (
      SELECT c_nationkey, c_mktsegment, n_g, p,
             SUM(c) OVER (PARTITION BY c_nationkey, c_mktsegment
                          ORDER BY p) AS cum
      FROM grid
    ),
    gall AS (SELECT p, COUNT(*) AS gc FROM j GROUP BY 1),
    globcum AS (SELECT p, SUM(gc) OVER (ORDER BY p) AS gcum_v FROM gall),
    tot AS (SELECT COUNT(*) AS n_tot,
                   CAST(COUNT(DISTINCT p) AS BIGINT) AS m FROM j),
    scored AS (
      SELECT c_nationkey, c_mktsegment, n_g,
             SUM(ABS(cum * n_tot - gcum_v * n_g)) AS emd_num,
             MAX(n_tot) AS n_tot, MAX(m) AS m
      FROM gcum JOIN globcum USING (p) CROSS JOIN tot
      WHERE p < (SELECT MAX(p) FROM cats)
      GROUP BY 1, 2, 3
    )
    SELECT c_nationkey, c_mktsegment, CAST(n_g AS BIGINT) AS n_g,
           CAST(ROUND(1000.0 * emd_num / (n_g * n_tot * (m - 1)), 0)
                AS BIGINT) AS emd_milli,
           ROUND(1000.0 * emd_num / (n_g * n_tot * (m - 1)), 0)
               > {T_CLOSENESS_MILLI} AS t_breach
    FROM scored
    """,
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness census completing the k-anonymity / l-diversity /
    t-closeness release-audit trio: per quasi-identifier group
    (nation, market segment), the Earth Mover's Distance between the
    group's sensitive-attribute distribution (order priority — an
    ordinal 5-point scale) and the global one. A group whose
    distribution diverges beyond t leaks the sensitive attribute even
    when k and l pass (Li, Li & Venkatasubramanian, ICDE 2007).

    Ordered-categorical EMD = mean absolute cumulative-distribution
    gap over the m-1 category boundaries. The division is CLEARED
    before any aggregation: per boundary the gap is the exact bigint
    |cum_g * N - cum_global * n_g|, summed order-free, with ONE double
    division + milli rounding at the end — the same cross-multiplied
    discipline as the KS/Wasserstein queries.

    Scale (100 TB): one shuffle builds the (QI, sensitive) cell counts
    (map-side partial agg); everything after operates on the
    |groups| x m dense grid — QI-bounded, never row-bounded. The dense
    grid (groups CROSS JOIN categories) is what keeps missing cells
    aligned at zero on both engines.
    """
    t = load_tables(spark, sf_dir, "customer", "orders")
    j = t["customer"].join(
        t["orders"], F.col("o_custkey") == F.col("c_custkey")
    ).select("c_nationkey", "c_mktsegment", F.col("o_orderpriority").alias("p"))
    cats = j.select("p").distinct()
    grps = j.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_g")
    )
    cellc = j.groupBy("c_nationkey", "c_mktsegment", "p").agg(
        F.count(F.lit(1)).alias("c")
    )
    grid = (
        grps.crossJoin(F.broadcast(cats))
        .join(cellc, ["c_nationkey", "c_mktsegment", "p"], "left")
        .select(
            "c_nationkey", "c_mktsegment", "n_g", "p",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
        )
    )
    from pyspark.sql import Window

    wg = Window.partitionBy("c_nationkey", "c_mktsegment").orderBy("p")
    gcum = grid.select(
        "c_nationkey", "c_mktsegment", "n_g", "p",
        F.sum("c").over(wg).alias("cum"),
    )
    glob = j.groupBy("p").agg(F.count(F.lit(1)).alias("gc"))
    globcum = glob.select(
        "p", F.sum("gc").over(Window.orderBy("p")).alias("gcum_v")
    )
    tot = j.agg(
        F.count(F.lit(1)).alias("n_tot"),
        F.countDistinct("p").alias("m"),
        F.max("p").alias("p_max"),
    )
    scored = (
        gcum.join(globcum, "p")
        .crossJoin(F.broadcast(tot))
        .where(F.col("p") < F.col("p_max"))
        .groupBy("c_nationkey", "c_mktsegment", "n_g")
        .agg(
            F.sum(
                F.abs(
                    F.col("cum") * F.col("n_tot")
                    - F.col("gcum_v") * F.col("n_g")
                )
            ).alias("emd_num"),
            F.max("n_tot").alias("n_tot"),
            F.max("m").alias("m"),
        )
    )
    emd = F.round(
        F.lit(1000.0)
        * F.col("emd_num")
        / (F.col("n_g") * F.col("n_tot") * (F.col("m") - 1)),
        0,
    )
    return scored.select(
        "c_nationkey",
        "c_mktsegment",
        F.col("n_g").cast("long").alias("n_g"),
        emd.cast("long").alias("emd_milli"),
        (emd > T_CLOSENESS_MILLI).alias("t_breach"),
    )
