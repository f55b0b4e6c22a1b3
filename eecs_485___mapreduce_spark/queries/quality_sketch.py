"""Mergeable-sketch and robust-order-statistic audits: the KMV
(k-minimum-values) distinct sketch, DDSketch-style log-bucket
quantiles with a merge==direct mergeability census, the two-pass
exact median, the Merkle bucket-diff reconciliation audit, and the
winsorized mean.

Split out of queries/quality.py along its docstring family lines (the
distribution-census half stays there); same shared discipline:
integer-exact arithmetic with deterministic tiebreaks so the DuckDB
oracle matches value-for-value, partial-agg / equi-join shapes only.

Reference parity: none of these exist in the reference (its whole
query surface is wordcount + grep, mapreduce/__init__.py); they are
committed analytics/sketch families from SURVEY.md section 2.B.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import md5_long, md5_long_sql, scoped_persist
from ..registry import register
from ..sources import load_table

# --------------------------------------------- KMV distinct sketch

KMV_K = 256
# 52-bit hashes (13 md5 hex digits): chosen so the estimator numerator
# (K-1) * 2^52 still fits BIGINT exactly — both engines then evaluate
# the SAME exact integer floor-division, with no double rounding and
# no int128 promotion asymmetry (Spark has no HUGEINT; 255 * 2^60
# would silently wrap). 52 bits is collision-free in practice for any
# per-group distinct count the sketch is useful at (k=256 accuracy
# breaks down long before 2^26 birthday territory).
KMV_DOMAIN = 1 << 52
_KMV_NUMER = (KMV_K - 1) * KMV_DOMAIN


@register(
    "approx_users_kmv_mergeable",
    tags=("sketch", "agg", "events"),
    oracle=f"""
    WITH uh AS (
      SELECT DISTINCT event_type,
             CAST(('0x' || substr(md5('u:' || CAST(user_id AS VARCHAR)), 1, 13))
                  AS BIGINT) AS h
      FROM events WHERE user_id IS NOT NULL
    ),
    ranked AS (
      SELECT event_type, h,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM uh
    ),
    kept AS (SELECT event_type, h, rn FROM ranked WHERE rn <= {KMV_K}),
    per_type AS (
      SELECT event_type AS scope,
             COUNT(*) AS n_exact,
             SUM(CASE WHEN rn <= {KMV_K} THEN 1 ELSE 0 END) AS n_kept,
             MAX(CASE WHEN rn <= {KMV_K} THEN h END) AS kth
      FROM ranked GROUP BY event_type
    ),
    merged_ranked AS (
      SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
      FROM (SELECT DISTINCT h FROM kept)
    ),
    merged AS (
      SELECT '__all__' AS scope,
             (SELECT COUNT(DISTINCT h) FROM uh) AS n_exact,
             COUNT(*) AS n_kept, MAX(h) AS kth
      FROM merged_ranked WHERE rn <= {KMV_K}
    ),
    both_scopes AS (SELECT * FROM per_type UNION ALL SELECT * FROM merged)
    SELECT scope, CAST(n_exact AS BIGINT) AS n_exact,
           CAST(CASE WHEN n_kept < {KMV_K} THEN n_kept
                ELSE {_KMV_NUMER} // kth END AS BIGINT)
             AS kmv_estimate
    FROM both_scopes
    """,
)
def approx_users_kmv_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-user sketch per event type plus
    the MERGED all-types sketch built only from the per-type sketches
    — the mergeable-sketch contract (union = re-minimize the union of
    kept hashes; never re-scan raw data), with estimate
    (k-1) * domain / kth_min_hash in exact integer division.

    Unlike the HLL entry (approx_users_hll_mergeable, rows-only:
    Spark's HLL bytes aren't reproducible in SQL), KMV is built from
    the package's cross-engine md5 hash, so BOTH the sketch and its
    estimate are deterministic and fully value-hash oracle-checked —
    a sketch whose driver row is as strong as any exact query's.

    Scale: one shuffle dedups (type, hash); the k-smallest selection
    is a WindowGroupLimit running top-k per type (no per-type sort
    materializes); the merge touches <= |types| * k rows. Exact
    distinct counts ride the same shuffled relation for the
    accuracy-vs-exact columns.
    """
    events = load_table(spark, sf_dir, "events")
    # NULL users hash to NULL, and the engines disagree on NULL sort
    # placement (Spark NULLS FIRST vs DuckDB NULLS LAST) — they are
    # not users, so they are excluded on BOTH sides.
    uh = (
        events.filter(F.col("user_id").isNotNull())
        .select(
            "event_type",
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("u:"), F.col("user_id").cast("string"))), 1, 13
                ),
                16,
                10,
            )
            .cast("bigint")
            .alias("h"),
        )
        .distinct()
    )
    w = Window.partitionBy("event_type").orderBy("h")
    ranked = uh.select("event_type", "h", F.row_number().over(w).alias("rn"))
    kept = ranked.filter(F.col("rn") <= KMV_K)
    # ONE grouped pass yields sketch and exact side by side — a join
    # on event_type here would silently drop a NULL-type scope (NULL
    # never equi-joins), which the oracle's correlated count keeps.
    per_type = ranked.groupBy(F.col("event_type").alias("scope")).agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.sum(F.when(F.col("rn") <= KMV_K, 1).otherwise(0)).alias("n_kept"),
        F.max(F.when(F.col("rn") <= KMV_K, F.col("h"))).alias("kth"),
    )
    merged_pool = kept.select("h").distinct()
    wm = Window.orderBy("h")
    merged = (
        merged_pool.select("h", F.row_number().over(wm).alias("rn"))
        .filter(F.col("rn") <= KMV_K)
        .agg(F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("kth"))
        .crossJoin(
            F.broadcast(
                uh.select("h").distinct().agg(F.count(F.lit(1)).alias("n_exact"))
            )
        )
        .select(F.lit("__all__").alias("scope"), "n_exact", "n_kept", "kth")
    )
    both = per_type.unionByName(merged)
    est = F.when(F.col("n_kept") < KMV_K, F.col("n_kept")).otherwise(
        F.expr(f"{_KMV_NUMER}L div kth")
    )
    return both.select(
        "scope",
        F.col("n_exact").cast("bigint").alias("n_exact"),
        est.cast("bigint").alias("kmv_estimate"),
    )


# ------------------------------------------ DDSketch-style log buckets

# Relative-accuracy quantile sketch in the DDSketch family (Masson,
# Rim & Lee, VLDB 2019): values hash to logarithmic buckets, bucket
# counts are mergeable by plain addition, and any quantile is answered
# from the cumulative bucket histogram with a bounded RELATIVE error.
# Instead of gamma-log buckets (whose floor(log_gamma(x)) is float and
# can flip at bucket edges between engines), buckets here are
# base-2-with-3-subdivision: exponent = bit length of the integer cent
# value (exact via length(bin(x)) in BOTH engines), sub-bucket = the
# next 3 bits. Bucket width / bucket floor <= 1/8, so the midpoint
# estimate has <= ~6.7% relative error — and every op is integer.
_DDSKETCH_PCTS = (50, 90, 99)
_DDSKETCH_PCTS_SQL = ", ".join(f"({p})" for p in _DDSKETCH_PCTS)


@register(
    "ddsketch_price_quantiles",
    bench=True,
    tags=("agg", "stats", "sketch", "window"),
    oracle=f"""
    WITH v AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_totalprice >= 0.01
    ),
    b AS (
      SELECT CASE WHEN length(bin(cents)) <= 3 THEN cents
                  ELSE length(bin(cents)) * 8
                       + (cents >> (length(bin(cents)) - 4)) - 8
             END AS bucket_id
      FROM v
    ),
    h AS (SELECT bucket_id, COUNT(*) AS bucket_n FROM b GROUP BY 1),
    c AS (
      SELECT bucket_id, bucket_n,
             CAST(SUM(bucket_n) OVER (ORDER BY bucket_id) AS BIGINT) AS cum_n
      FROM h
    ),
    tot AS (SELECT CAST(SUM(bucket_n) AS BIGINT) AS total_n FROM h),
    pcts(pct) AS (VALUES {_DDSKETCH_PCTS_SQL}),
    hit AS (
      SELECT p.pct, c.bucket_id, c.bucket_n, c.cum_n, t.total_n,
             ROW_NUMBER() OVER (PARTITION BY p.pct ORDER BY c.bucket_id) AS rk
      FROM pcts p CROSS JOIN tot t
      JOIN c ON c.cum_n >= (p.pct * t.total_n + 99) // 100
    )
    SELECT CAST(pct AS BIGINT) AS pct, bucket_id, bucket_n, cum_n, total_n,
           CASE WHEN bucket_id < 8 THEN bucket_id
                ELSE (8 + bucket_id % 8) << (bucket_id // 8 - 4)
           END AS lo_cents,
           CASE WHEN bucket_id < 8 THEN bucket_id
                ELSE ((9 + bucket_id % 8) << (bucket_id // 8 - 4)) - 1
           END AS hi_cents
    FROM hit WHERE rk = 1
    """,
)
def ddsketch_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDSketch-style relative-accuracy quantiles (p50/p90/p99) of
    order totals from a mergeable log-bucket histogram.

    Bucketing: cents -> exponent e = bit length (exact integer via
    ``length(bin(cents))``), sub-bucket = next 3 bits, so bucket_id =
    8e + sub with width/floor <= 1/8 (<= ~6.7% midpoint relative
    error, the DDSketch guarantee shape); cents < 8 get exact
    singleton buckets. The quantile answer is the first bucket whose
    cumulative count reaches ceil(p * total / 100) — every comparison
    is integer, so the DuckDB oracle matches bit-for-bit.

    Determinism: no log()/pow() anywhere — bit length and shifts only.

    Scale (100 TB): the sketch is ONE partial+final aggregation on a
    few-hundred-value key (bucket ids for 64-bit cents max out at
    8*64+7 = 519); the cumulative walk and percentile probe run on
    that constant-size histogram. Counts merge by addition, so
    per-partition / per-day sketches roll up without rescanning —
    the same mergeability contract as the HLL/KMV/CMS entries.

    Reference parity: none (sketch family beyond wordcount/grep,
    mapreduce/__init__.py); SURVEY.md section 2.B sketch row.
    """
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    v = orders.where(F.col("o_totalprice") >= 0.01).select(cents.alias("cents"))
    e = F.length(F.bin("cents"))
    bucket = (
        F.when(e <= 3, F.col("cents"))
        .otherwise(e * 8 + F.expr("shiftright(cents, length(bin(cents)) - 4)") - 8)
        .cast("long")
    )
    h = v.select(bucket.alias("bucket_id")).groupBy("bucket_id").agg(
        F.count(F.lit(1)).alias("bucket_n")
    )
    # The histogram is constant-size; the cumulative window over it is
    # a single tiny task, not a data-scale sort. total_n rides the SAME
    # single-partition window as cum_n (unbounded-following frame), so
    # the histogram subtree is planned once — the former separate
    # ``tot`` aggregate + crossJoin re-planned the scan+agg branch and
    # cost three extra exchanges for a value the window already knows.
    wb = Window.orderBy("bucket_id")
    wc = wb.rowsBetween(Window.unboundedPreceding, 0)
    wt = wb.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    c = h.select(
        "bucket_id",
        "bucket_n",
        F.sum("bucket_n").over(wc).cast("long").alias("cum_n"),
        F.sum("bucket_n").over(wt).cast("long").alias("total_n"),
    )
    # The percentile probe needs no join and no second window: cum_n is
    # strictly increasing in bucket_id (bucket_n >= 1), so "the first
    # bucket whose cumulative count reaches target_p" is exactly the
    # row where cum_n crosses target_p — cum_n >= target_p and the
    # previous cumulative (cum_n - bucket_n) still below it. Exploding
    # the constant pct list and filtering on that crossing predicate
    # yields the identical row set as the former pcts-join + row_number
    # pick (oracle-verified), for three fewer plan stages.
    # Exact BIGINT ceil-division — a double quotient would round across
    # an integer boundary once pct*total_n exceeds 2^53 (the 100 TB
    # regime) and pick a different bucket than the oracle's // form.
    probe = c.select(
        F.explode(F.array(*[F.lit(p).cast("long") for p in _DDSKETCH_PCTS])).alias(
            "pct"
        ),
        "bucket_id", "bucket_n", "cum_n", "total_n",
    )
    target = F.expr("(pct * total_n + 99) div 100")
    lo = F.when(F.col("bucket_id") < 8, F.col("bucket_id")).otherwise(
        F.expr("shiftleft(8 + bucket_id % 8, cast(bucket_id / 8 as int) - 4)")
    )
    hi = F.when(F.col("bucket_id") < 8, F.col("bucket_id")).otherwise(
        F.expr("shiftleft(9 + bucket_id % 8, cast(bucket_id / 8 as int) - 4) - 1")
    )
    return (
        probe.where((F.col("cum_n") >= target) & (F.col("cum_n") - F.col("bucket_n") < target))
        .select(
            "pct", "bucket_id", "bucket_n", "cum_n", "total_n",
            lo.cast("long").alias("lo_cents"), hi.cast("long").alias("hi_cents"),
        )
    )


# ------------------------------------------- two-pass exact median

# Exact order statistics at scale: a full sort (or a single-partition
# percentile window) is unrunnable over 100 TB, but an EXACT median
# needs only (1) a bounded histogram pass to locate the bucket that
# contains the target rank, then (2) a ranked scan of THAT bucket's
# rows alone — the classic two-pass selection algorithm
# (Munro-Paterson family), here per group.
_MED_BUCKET_CENTS = 100_000  # $1,000-wide histogram buckets


@register(
    "exact_median_twopass",
    tags=("agg", "stats", "window"),
    oracle="""
    WITH v AS (
      SELECT o_orderstatus AS status,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderkey
      FROM orders
    ),
    ranked AS (
      SELECT status, cents,
             ROW_NUMBER() OVER (PARTITION BY status
                                ORDER BY cents, o_orderkey) AS rk,
             CAST(COUNT(*) OVER (PARTITION BY status) AS BIGINT) AS n_rows
      FROM v
    )
    SELECT status, n_rows, cents AS median_cents
    FROM ranked WHERE rk = (n_rows + 1) // 2
    """,
)
def exact_median_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-status median order value computed with the two-pass
    selection algorithm: pass 1 builds a $1,000-bucket histogram and
    locates, per status, the bucket containing rank (n+1) div 2; pass
    2 ranks ONLY that bucket's rows and picks the residual rank. The
    oracle computes the same median the direct way (global ranked
    window), so the driver row certifies the bucket-localization
    algebra exactly.

    Scale (100 TB): the oracle's form needs a per-group total sort;
    the engine's form needs one bounded-key histogram aggregation
    (≤ ~500 buckets per status), a 3-row broadcast of the located
    buckets, and a ranked window over a single bucket's occupancy
    (~n/buckets rows — with finer buckets, arbitrarily small). This
    is how exact medians/percentiles are actually computed over data
    that cannot be sorted, and the exact complement to the
    approx_percentiles / ddsketch entries.

    Reference parity: none (wordcount/grep only); SURVEY.md
    section 2.B stats family.
    """
    orders = load_table(spark, sf_dir, "orders")
    v = orders.select(
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderkey",
    )
    b = F.expr(f"cents div {_MED_BUCKET_CENTS}")
    hist = v.groupBy("status", b.alias("b")).agg(F.count(F.lit(1)).alias("n_b"))
    tot = hist.groupBy("status").agg(F.sum("n_b").cast("long").alias("n_rows"))
    wcum = (
        Window.partitionBy("status")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.select(
        "status", "b", "n_b", F.sum("n_b").over(wcum).cast("long").alias("cum")
    )
    r = F.expr("(n_rows + 1) div 2")
    wfirst = Window.partitionBy("status").orderBy("b")
    target = (
        cum.join(F.broadcast(tot), "status")
        .withColumn("r", r)
        .where(F.col("cum") >= F.col("r"))
        .withColumn("first", F.row_number().over(wfirst))
        .where(F.col("first") == 1)
        .select(
            F.col("status").alias("t_status"),
            F.col("b").alias("t_b"),
            "n_rows",
            (F.col("r") - (F.col("cum") - F.col("n_b"))).alias("resid_rk"),
        )
    )
    sel = v.join(
        F.broadcast(target),
        (F.col("status") == F.col("t_status")) & (b == F.col("t_b")),
    ).select("status", "cents", "o_orderkey", "n_rows", "resid_rk")
    wr = Window.partitionBy("status").orderBy("cents", "o_orderkey")
    return (
        sel.withColumn("rk", F.row_number().over(wr))
        .where(F.col("rk") == F.col("resid_rk"))
        .select("status", "n_rows", F.col("cents").alias("median_cents"))
    )


# ------------------------------------------- Merkle bucket diff

# Anti-entropy repair the way replicated stores do it (Dynamo/
# Cassandra Merkle trees): both replicas summarize key ranges into a
# small tree of order-independent bucket hashes; comparing trees
# top-down localizes drift to a few leaf buckets, and only THOSE
# buckets' rows are resynced — O(buckets) comparison + O(drifted
# rows) transfer instead of a full-table diff. The "replica" here is
# a deterministic simulated drift of the orders table.
_MK_N_LEAVES = 256
_MK_N_GROUPS = 16
_MK_MOD_EVERY = 997    # ~0.1% of keys get a price drift
_MK_DEL_EVERY = 1009   # ~0.1% of keys are missing on the replica

_MK_ROW_HASH = (
    "'mk:' || CAST(o_orderkey AS VARCHAR) || ':' || CAST(cents AS VARCHAR)"
)


@register(
    "merkle_bucket_diff_orders",
    tags=("hash", "audit", "agg"),
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    replica AS (
      SELECT o_orderkey,
             cents + CASE WHEN o_orderkey % {_MK_MOD_EVERY} = 0
                          THEN 100 ELSE 0 END AS cents
      FROM base WHERE o_orderkey % {_MK_DEL_EVERY} <> 0
    ),
    bh AS (
      SELECT o_orderkey % {_MK_N_LEAVES} AS leaf,
             (o_orderkey % {_MK_N_LEAVES}) // {_MK_N_LEAVES // _MK_N_GROUPS}
               AS grp,
             {md5_long_sql(_MK_ROW_HASH)} AS h, 1 AS n
      FROM base
    ),
    rh AS (
      SELECT o_orderkey % {_MK_N_LEAVES} AS leaf,
             (o_orderkey % {_MK_N_LEAVES}) // {_MK_N_LEAVES // _MK_N_GROUPS}
               AS grp,
             {md5_long_sql(_MK_ROW_HASH)} AS h, 1 AS n
      FROM replica
    ),
    leaves AS (
      SELECT COALESCE(b.leaf, r.leaf) AS leaf,
             COALESCE(b.grp, r.grp) AS grp,
             COALESCE(b.n_rows, 0) AS base_rows,
             b.hash IS DISTINCT FROM r.hash AS leaf_diff
      FROM (SELECT leaf, grp, bit_xor(h) AS hash,
                   CAST(SUM(n) AS BIGINT) AS n_rows
            FROM bh GROUP BY 1, 2) b
      FULL OUTER JOIN
           (SELECT leaf, grp, bit_xor(h) AS hash FROM rh GROUP BY 1, 2) r
        ON b.leaf = r.leaf
    ),
    grp_diff AS (
      SELECT grp, MAX(CASE WHEN leaf_diff THEN 1 ELSE 0 END) AS g_diff,
             CAST(SUM(base_rows) AS BIGINT) AS g_rows
      FROM leaves GROUP BY 1
    )
    SELECT 'group' AS level,
           CAST({_MK_N_GROUPS} AS BIGINT) AS n_buckets,
           CAST(SUM(g_diff) AS BIGINT) AS n_mismatched,
           CAST(SUM(CASE WHEN g_diff = 1 THEN g_rows ELSE 0 END) AS BIGINT)
             AS rows_to_resync
    FROM grp_diff
    UNION ALL
    SELECT 'leaf',
           CAST({_MK_N_LEAVES} AS BIGINT),
           CAST(SUM(CASE WHEN leaf_diff THEN 1 ELSE 0 END) AS BIGINT),
           CAST(SUM(CASE WHEN leaf_diff THEN base_rows ELSE 0 END) AS BIGINT)
    FROM leaves
    """,
)
def merkle_bucket_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level Merkle-tree anti-entropy diff against a simulated
    drifted replica (~0.1% of keys price-shifted, ~0.1% missing):
    per-leaf XOR hashes localize exactly which of 256 key buckets
    drifted, the 16-group level shows how the tree's coarser tier
    narrows before descending, and rows_to_resync quantifies the
    payoff — repair transfers only mismatched-bucket rows, not the
    table.

    Determinism: bucket hashes are XORs of 60-bit md5 row hashes —
    order- and partitioning-independent on both engines; presence
    asymmetries surface through the FULL OUTER join's
    IS DISTINCT FROM.

    Scale (100 TB): each side is ONE scan into a 256-key partial-agg
    (the tree fits in a driver page; levels deepen logarithmically
    for narrower localization); the tree comparison is a 256-row
    full outer join. This is the repair primitive behind
    integrity_checksum_orders' per-status fingerprint.

    Reference parity: none (wordcount/grep only); SURVEY.md
    section 2.B audit/sketch family.
    """
    sub = _MK_N_LEAVES // _MK_N_GROUPS
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    replica = base.where(F.col("o_orderkey") % _MK_DEL_EVERY != 0).select(
        "o_orderkey",
        (
            F.col("cents")
            + F.when(F.col("o_orderkey") % _MK_MOD_EVERY == 0, 100).otherwise(0)
        ).alias("cents"),
    )

    def tree(df: DataFrame, with_rows: bool) -> DataFrame:
        h = md5_long(
            F.concat(
                F.lit("mk:"),
                F.col("o_orderkey").cast("string"),
                F.lit(":"),
                F.col("cents").cast("string"),
            )
        )
        leaf = (F.col("o_orderkey") % _MK_N_LEAVES).alias("leaf")
        rows = df.select(leaf, h.alias("h"))
        aggs = [F.bit_xor("h").alias("hash")]
        if with_rows:
            aggs.append(F.count(F.lit(1)).alias("n_rows"))
        return rows.groupBy("leaf").agg(*aggs)

    b = tree(base, True)
    r = tree(replica, False).select(
        F.col("leaf").alias("r_leaf"), F.col("hash").alias("r_hash")
    )
    leaves = b.join(r, b["leaf"] == r["r_leaf"], "full_outer").select(
        F.coalesce("leaf", "r_leaf").alias("leaf"),
        F.coalesce("n_rows", F.lit(0)).alias("base_rows"),
        F.expr("hash IS DISTINCT FROM r_hash").alias("leaf_diff"),
    ).withColumn("grp", F.expr(f"leaf div {sub}"))

    grp = leaves.groupBy("grp").agg(
        F.max(F.when(F.col("leaf_diff"), 1).otherwise(0)).alias("g_diff"),
        F.sum("base_rows").cast("long").alias("g_rows"),
    )
    g_row = grp.agg(
        F.lit("group").alias("level"),
        F.lit(_MK_N_GROUPS).cast("long").alias("n_buckets"),
        F.sum("g_diff").cast("long").alias("n_mismatched"),
        F.sum(F.when(F.col("g_diff") == 1, F.col("g_rows")).otherwise(0))
        .cast("long")
        .alias("rows_to_resync"),
    )
    l_row = leaves.agg(
        F.lit("leaf").alias("level"),
        F.lit(_MK_N_LEAVES).cast("long").alias("n_buckets"),
        F.sum(F.when(F.col("leaf_diff"), 1).otherwise(0))
        .cast("long")
        .alias("n_mismatched"),
        F.sum(F.when(F.col("leaf_diff"), F.col("base_rows")).otherwise(0))
        .cast("long")
        .alias("rows_to_resync"),
    )
    return g_row.unionByName(l_row)


# ------------------------------------- DDSketch mergeability census


@register(
    "ddsketch_merge_by_source",
    tags=("agg", "stats", "sketch"),
    oracle=f"""
    WITH v AS (
      SELECT o_orderkey % 4 AS src,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_totalprice >= 0.01
    ),
    b AS (
      SELECT src,
             CASE WHEN length(bin(cents)) <= 3 THEN cents
                  ELSE length(bin(cents)) * 8
                       + (cents >> (length(bin(cents)) - 4)) - 8
             END AS bucket_id
      FROM v
    ),
    partials AS (
      SELECT src, bucket_id, COUNT(*) AS n FROM b GROUP BY 1, 2
    ),
    merged AS (
      SELECT bucket_id, CAST(SUM(n) AS BIGINT) AS bucket_n
      FROM partials GROUP BY 1
    ),
    direct AS (
      SELECT bucket_id, COUNT(*) AS bucket_n FROM b GROUP BY 1
    )
    SELECT m.bucket_id,
           m.bucket_n AS merged_n,
           d.bucket_n AS direct_n,
           CAST(m.bucket_n = d.bucket_n AS BOOLEAN) AS merge_exact
    FROM merged m JOIN direct d ON d.bucket_id = m.bucket_id
    """,
)
def ddsketch_merge_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeability certification for the DDSketch histogram: four
    per-shard sketches (orders split by key mod 4 — standing in for
    per-day / per-partition sketches) merged by bucket-count addition
    must equal the sketch built directly over the union, bucket for
    bucket. This is the property that lets 100 TB quantile monitoring
    store small per-partition sketches and roll them up on read
    (the same store-partials/merge-on-read contract as the HLL, KMV,
    and CMS entries — but with a full value-hash oracle because the
    sketch state is plain integers).

    Scale: the partial relation is (shards x buckets) rows; the merge
    is one bounded-key aggregation. The certification join compares
    two constant-size histograms.

    Reference parity: none (wordcount/grep only); SURVEY.md
    section 2.B sketch family.
    """
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    v = orders.where(F.col("o_totalprice") >= 0.01).select(
        (F.col("o_orderkey") % 4).alias("src"), cents.alias("cents")
    )
    e = F.length(F.bin("cents"))
    bucket = (
        F.when(e <= 3, F.col("cents"))
        .otherwise(e * 8 + F.expr("shiftright(cents, length(bin(cents)) - 4)") - 8)
        .cast("long")
    )
    b = v.select("src", bucket.alias("bucket_id"))
    partials = b.groupBy("src", "bucket_id").agg(F.count(F.lit(1)).alias("n"))
    merged = partials.groupBy("bucket_id").agg(
        F.sum("n").cast("long").alias("merged_n")
    )
    direct = b.groupBy("bucket_id").agg(F.count(F.lit(1)).alias("direct_n"))
    return merged.join(direct, "bucket_id").select(
        "bucket_id",
        "merged_n",
        "direct_n",
        (F.col("merged_n") == F.col("direct_n")).alias("merge_exact"),
    )


# ------------------------------------------------ winsorized mean

WINSOR_PCT = 20  # clamp floor(n/20) = 5% from each tail


@register(
    "winsorized_mean_price_by_status",
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
    ),
    b AS (
      SELECT o_orderstatus,
             MAX(n) AS n,
             MAX(CASE WHEN rk = n // {WINSOR_PCT} + 1 THEN cents END) AS lo,
             MAX(CASE WHEN rk = n - n // {WINSOR_PCT} THEN cents END) AS hi
      FROM v GROUP BY o_orderstatus
    )
    SELECT v.o_orderstatus,
           CAST(MAX(b.n) AS BIGINT) AS n_orders,
           CAST(MAX(b.lo) AS BIGINT) AS lo_cents,
           CAST(MAX(b.hi) AS BIGINT) AS hi_cents,
           CAST(ROUND(10.0 * SUM(LEAST(GREATEST(v.cents, b.lo), b.hi))
                      / MAX(b.n)) AS BIGINT) AS winsor_mean_milli
    FROM v JOIN b USING (o_orderstatus)
    GROUP BY v.o_orderstatus
    """,
)
def winsorized_mean_price_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided 5% winsorized mean of order totals per status: the
    floor(n/{p}) smallest and largest values are CLAMPED to the tail
    boundary values (ranks k+1 and n-k) rather than dropped — the
    robust-center companion to trimmed_mean_price_by_status that keeps
    n constant (so downstream variance math stays comparable across
    groups of different sizes). Boundaries are reported for audit.

    Determinism: exact integer cents with a unique (cents, orderkey)
    rank tiebreak; the clamp bounds are values AT exact integer ranks;
    sums of clamped cents are bigint-exact; only the final mean rounds
    to milli-units (one division of exact integers).

    Scale (100 TB): one shuffle on the status key; rank and count
    share one window sort; the bounds relation is one row per status
    (broadcast joined back); then one partial+final agg. Same
    documented trade as the trimmed mean: exact tail ranks cost the
    per-group sort, and the approximate swap-in is percentile_approx
    bounds applied scan-side with the identical clamp+agg downstream.
    """.format(p=WINSOR_PCT)
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    wp = Window.partitionBy("o_orderstatus")
    v = orders.select(
        "o_orderstatus",
        cents.alias("cents"),
        F.row_number().over(wp.orderBy(cents, "o_orderkey")).alias("rk"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    k = F.expr("n div {p}".format(p=WINSOR_PCT))
    b = v.groupBy("o_orderstatus").agg(
        F.max("n").alias("n"),
        F.max(F.when(F.col("rk") == k + 1, F.col("cents"))).alias("lo"),
        F.max(F.when(F.col("rk") == F.col("n") - k, F.col("cents"))).alias("hi"),
    )
    clamped = F.least(F.greatest(F.col("cents"), F.col("lo")), F.col("hi"))
    return (
        v.select("o_orderstatus", "cents")
        .join(
            F.broadcast(
                b.select("o_orderstatus", F.col("n").alias("n_grp"), "lo", "hi")
            ),
            "o_orderstatus",
        )
        .groupBy("o_orderstatus")
        .agg(
            F.max("n_grp").cast("long").alias("n_orders"),
            F.max("lo").cast("long").alias("lo_cents"),
            F.max("hi").cast("long").alias("hi_cents"),
            F.round(F.lit(10.0) * F.sum(clamped) / F.max("n_grp"))
            .cast("long")
            .alias("winsor_mean_milli"),
        )
    )


# ------------------------------------ deterministic HyperLogLog census

# Cross-engine HLL built from the package md5 hash, p = 9 (m = 512
# registers). The 60-bit hash splits into 9 bucket bits and a 51-bit
# tail; rho = leading zeros of the tail + 1 = 52 - bitlength(tail)
# (52 when the tail is all zeros), so every register is exact integer
# arithmetic both engines reproduce bit-for-bit — `bin()` gives the
# bitlength without float log2 rounding hazards. The harmonic-mean
# denominator is carried as the exact integer
# S = sum_hit 2^(52-rho) + (512 - m_hit) * 2^52  (<= 2^61, BIGINT-safe)
# so the only float steps are one division and one ln(), written as
# the identical expression on both engines.
HLL_P = 9
HLL_M = 1 << HLL_P
_HLL_TAIL_BITS = 60 - HLL_P  # 51
_HLL_TAIL_MASK = (1 << _HLL_TAIL_BITS) - 1
_HLL_RHO_CAP = _HLL_TAIL_BITS + 1  # 52
_HLL_POW_CAP = 1 << _HLL_RHO_CAP
# alpha_m * m^2 * 2^52 folded to ONE double literal shared by both
# engines, so the estimate is a single deterministic division.
_HLL_ALPHA_NUM = 0.7213 / (1.0 + 1.079 / HLL_M) * HLL_M * HLL_M * float(_HLL_POW_CAP)
_HLL_LC_CUTOFF = 2.5 * HLL_M  # linear-counting switchover (classic HLL)

_HLL_EST_SQL = f"""CAST(FLOOR(CASE
        WHEN {_HLL_ALPHA_NUM!r} / CAST(s_scaled AS DOUBLE) <= {_HLL_LC_CUTOFF!r}
             AND m_nonzero < {HLL_M}
        THEN {float(HLL_M)!r}
             * ln({float(HLL_M)!r}
                  / CAST(GREATEST({HLL_M} - m_nonzero, 1) AS DOUBLE))
        ELSE {_HLL_ALPHA_NUM!r} / CAST(s_scaled AS DOUBLE)
      END) AS BIGINT)"""


@register(
    "hll_register_census_users",
    tags=("sketch", "agg", "events"),
    oracle=f"""
    WITH rh AS (
      SELECT event_type,
             {md5_long_sql("'hll:' || CAST(user_id AS VARCHAR)")} AS h
      FROM events WHERE user_id IS NOT NULL
    ),
    regs AS (
      SELECT event_type, h >> {_HLL_TAIL_BITS} AS bucket,
             MAX(CASE WHEN (h & {_HLL_TAIL_MASK}) = 0 THEN {_HLL_RHO_CAP}
                      ELSE {_HLL_RHO_CAP} - length(bin(h & {_HLL_TAIL_MASK}))
                 END) AS rho
      FROM rh GROUP BY event_type, h >> {_HLL_TAIL_BITS}
    ),
    scoped AS (
      SELECT event_type AS scope, bucket, rho FROM regs
      UNION ALL
      SELECT '__all__' AS scope, bucket, MAX(rho) AS rho
      FROM regs GROUP BY bucket
    ),
    stats AS (
      SELECT scope, COUNT(*) AS m_nonzero,
             CAST(SUM(rho) AS BIGINT) AS reg_sum,
             CAST(SUM(CAST(1 AS BIGINT) << ({_HLL_RHO_CAP} - rho)) AS BIGINT)
               + ({HLL_M} - COUNT(*)) * CAST({_HLL_POW_CAP} AS BIGINT) AS s_scaled
      FROM scoped GROUP BY scope
    )
    SELECT scope, CAST(m_nonzero AS BIGINT) AS m_nonzero, reg_sum,
           CAST(s_scaled AS BIGINT) AS s_scaled,
           {_HLL_EST_SQL} AS est_users
    FROM stats
    """,
)
def hll_register_census_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HyperLogLog distinct-user census per event type
    plus the MERGED all-types row built only from the per-type
    registers (register-wise max — union of user sets by construction,
    never a raw-data re-scan).

    This is the hash-green companion to approx_users_hll_mergeable /
    approx_distinct_parts (Spark-native DataSketches HLL, rows-only:
    those sketch bytes are engine-internal): same algorithm — md5 ->
    bucket/rho registers -> harmonic mean with the classic
    linear-counting small-range correction — but built from the
    package's cross-engine hash, so the full register STATE (m_nonzero,
    reg_sum, s_scaled) and the estimate are value-hash oracle-checked
    against DuckDB computing the identical integer arithmetic.

    Scale: register build is one partial-aggregating shuffle on
    (event_type, bucket) — at most |types| * 512 rows survive the
    map-side combine regardless of input size; the merge touches only
    those. The state columns are exactly what a 100 TB rollup would
    persist per (partition, group) for algebraic re-aggregation.
    """
    events = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    h = md5_long(F.concat(F.lit("hll:"), F.col("user_id").cast("string")))
    tail = h.bitwiseAND(F.lit(_HLL_TAIL_MASK))
    rho = F.when(tail == 0, F.lit(_HLL_RHO_CAP)).otherwise(
        F.lit(_HLL_RHO_CAP) - F.length(F.bin(tail))
    )
    regs = (
        events.select(
            "event_type",
            F.shiftright(h, _HLL_TAIL_BITS).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    regs = scoped_persist(("hll_census.regs", sf_dir), regs)
    typed = regs.select(F.col("event_type").alias("scope"), "bucket", "rho")
    merged = (
        regs.groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
        .select(F.lit("__all__").alias("scope"), "bucket", "rho")
    )
    stats = (
        typed.unionByName(merged)
        .groupBy("scope")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("m_nonzero"),
            F.sum("rho").cast("bigint").alias("reg_sum"),
            (
                F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_RHO_CAP} - rho)"))
                + (F.lit(HLL_M) - F.count(F.lit(1))) * F.lit(_HLL_POW_CAP)
            )
            .cast("bigint")
            .alias("s_scaled"),
        )
    )
    return stats.select(
        "scope", "m_nonzero", "reg_sum", "s_scaled",
        F.expr(_HLL_EST_SQL).alias("est_users"),
    )
