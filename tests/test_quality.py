"""Invariant tests for the statistical quality module — the
properties the oracle equality check can't see: sketch mergeability,
CMS one-sided error, Gini bounds, Benford mass conservation, and
weighted-median bracketing."""

from __future__ import annotations

from pyspark.sql import functions as F

from eecs_485___mapreduce_spark.queries.quality import (
    BENFORD_MICRO,
    CMS_DEPTH,
    CMS_WIDTH,
    EWMA_RECENT_K,
    benford_first_digit,
    cms_sketch,
    ewma_user_value_recent,
    gini_revenue_by_nation,
    sketch_cms_user_counts,
    weighted_median_price_by_nation,
)
from eecs_485___mapreduce_spark.sources import load_table

from .conftest import SF_SMALL


def test_cms_sketch_mergeable(spark):
    """The 100 TB contract: sketching two disjoint halves and summing
    counts per (seed, cell) must equal sketching the whole — that
    cell-wise sum is exactly how per-shard partials roll up."""
    events = load_table(spark, SF_SMALL, "events")
    whole = cms_sketch(events, "user_id")
    lo = cms_sketch(events.where(F.col("event_id") % 2 == 0), "user_id")
    hi = cms_sketch(events.where(F.col("event_id") % 2 == 1), "user_id")
    merged = (
        lo.unionByName(hi)
        .groupBy("seed", "cell")
        .agg(F.sum("cnt").alias("cnt"))
    )
    diff = whole.join(merged, ["seed", "cell"], "full").where(
        ~(whole.cnt.eqNullSafe(merged.cnt))
    )
    assert diff.count() == 0


def test_cms_sketch_bounded(spark):
    events = load_table(spark, SF_SMALL, "events")
    sk = cms_sketch(events, "user_id").collect()
    assert len(sk) <= CMS_DEPTH * CMS_WIDTH
    assert {r.seed for r in sk} == set(range(CMS_DEPTH))
    assert all(0 <= r.cell < CMS_WIDTH and r.cnt > 0 for r in sk)


def test_cms_estimate_one_sided(spark):
    """CMS never undercounts: min-over-rows >= true frequency."""
    rows = sketch_cms_user_counts(spark, SF_SMALL).collect()
    assert rows
    assert all(r.n_cms_est >= r.n_exact for r in rows)


def test_gini_bounds_and_mass(spark):
    rows = gini_revenue_by_nation(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 <= r.gini_milli < 1000, r
        assert r.total_cents > 0 and r.n_customers > 0


def test_benford_mass_conserved(spark):
    rows = benford_first_digit(spark, SF_SMALL).collect()
    assert {r.digit for r in rows} == set(range(1, 10))
    assert {r.digit: r.expected_micro for r in rows} == BENFORD_MICRO
    orders = load_table(spark, SF_SMALL, "orders")
    n = orders.where(F.col("o_totalprice") >= 1).count()
    assert sum(r.n_orders for r in rows) == n
    assert all(r.chi2_milli >= 0 for r in rows)


def test_weighted_median_bracketed(spark):
    """The weighted median is an actual observed price, inside the
    per-nation [min, max] price range."""
    li = load_table(spark, SF_SMALL, "lineitem")
    sup = load_table(spark, SF_SMALL, "supplier")
    nat = load_table(spark, SF_SMALL, "nation")
    bounds = {
        r.n_name: (r.lo, r.hi)
        for r in li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(nat, sup.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.min(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias("lo"),
            F.max(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias("hi"),
        )
        .collect()
    }
    for r in weighted_median_price_by_nation(spark, SF_SMALL).collect():
        lo, hi = bounds[r.n_name]
        assert lo <= r.wmedian_cents <= hi, r


def test_ewma_bracketed_and_bounded(spark):
    """EWMA is a convex combination of the recent values: bounded by
    the per-user [min, max] of the kept window, never more than K
    events deep."""
    events = load_table(spark, SF_SMALL, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    kept = (
        events.select(
            "user_id",
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= EWMA_RECENT_K)
        .groupBy("user_id")
        .agg(F.min("cents").alias("lo"), F.max("cents").alias("hi"))
    )
    bounds = {r.user_id: (r.lo, r.hi) for r in kept.collect()}
    rows = ewma_user_value_recent(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_recent <= EWMA_RECENT_K
        lo, hi = bounds[r.user_id]
        # milli-cents: the rounded combination can poke out by < 1 unit
        assert lo * 10 - 1 <= r.ewma_value_milli <= hi * 10 + 1, r


def test_activity_bitmap_mergeable(spark):
    """The bitmap contract at 100 TB: OR of two disjoint halves'
    bitmaps equals the whole-input bitmap — bit_or is the mergeable
    rollup (weekly/monthly/cohort unions without re-scanning)."""
    from eecs_485___mapreduce_spark.queries.quality import bitmap_user_activity_days

    events = load_table(spark, SF_SMALL, "events")
    day_bit = F.expr("shiftleft(cast(1 as bigint), day(ts) - 1)")

    def bitmap(df):
        return df.groupBy("user_id").agg(F.bit_or(day_bit).alias("b"))

    lo = bitmap(events.where(F.col("event_id") % 2 == 0)).withColumnRenamed("b", "lo")
    hi = bitmap(events.where(F.col("event_id") % 2 == 1)).withColumnRenamed("b", "hi")
    merged = {
        r.user_id: r.m
        for r in lo.join(hi, "user_id", "full")
        .select(
            "user_id",
            (
                F.coalesce(F.col("lo"), F.lit(0)).bitwiseOR(
                    F.coalesce(F.col("hi"), F.lit(0))
                )
            ).alias("m"),
        )
        .collect()
    }
    whole = {
        r.user_id: r.day_bitmap
        for r in bitmap_user_activity_days(spark, SF_SMALL).collect()
    }
    assert merged == whole
    rows = bitmap_user_activity_days(spark, SF_SMALL).collect()
    for r in rows:
        # popcount consistent, active days bounded by event count and 31
        assert 1 <= r.n_active_days <= min(r.n_events, 31), r


def test_time_weighted_average_bracketed(spark):
    """TWA is a convex combination of held values: bounded by the
    per-user [min, max] cents over NON-terminal readings."""
    from eecs_485___mapreduce_spark.queries.timeseries import (
        time_weighted_value_per_user,
    )
    from pyspark.sql import Window

    events = load_table(spark, SF_SMALL, "events").where(F.col("value").isNotNull())
    w = Window.partitionBy("user_id").orderBy(
        F.unix_timestamp("ts"), "event_id"
    )
    held = (
        events.select(
            "user_id",
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
            F.lead(F.unix_timestamp("ts")).over(w).alias("nxt"),
        )
        .where(F.col("nxt").isNotNull())
        .groupBy("user_id")
        .agg(F.min("cents").alias("lo"), F.max("cents").alias("hi"))
    )
    bounds = {r.user_id: (r.lo, r.hi) for r in held.collect()}
    for r in time_weighted_value_per_user(spark, SF_SMALL).collect():
        if r.twa_value_milli is None:
            assert r.user_id not in bounds or r.span_s in (0, None)
            continue
        lo, hi = bounds[r.user_id]
        assert lo * 10 - 1 <= r.twa_value_milli <= hi * 10 + 1, r


def test_checksum_self_inverse(spark):
    """The anti-entropy contract: fingerprints compose by XOR — the
    whole-table fingerprint equals XOR of any disjoint split's
    fingerprints, so a replica can verify a delta as old XOR delta
    with no re-scan."""
    from eecs_485___mapreduce_spark.queries.quality import integrity_checksum_orders
    from eecs_485___mapreduce_spark.functions import md5_long

    orders = load_table(spark, SF_SMALL, "orders")
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

    def fp(df):
        return {
            r.o_orderstatus: (r.n, r.x)
            for r in df.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"), F.bit_xor(row_hash).alias("x"))
            .collect()
        }

    lo = fp(orders.where(F.col("o_orderkey") % 2 == 0))
    hi = fp(orders.where(F.col("o_orderkey") % 2 == 1))
    whole = {
        r.o_orderstatus: (r.n_rows, r.xor_fingerprint)
        for r in integrity_checksum_orders(spark, SF_SMALL).collect()
    }
    for status, (n, x) in whole.items():
        nl, xl = lo.get(status, (0, 0))
        nh, xh = hi.get(status, (0, 0))
        assert nl + nh == n
        assert xl ^ xh == x, status


def test_rolling_distinct_equals_bruteforce(spark):
    """Coverage-explosion identity vs the direct definition: for every
    day, count distinct users with >=1 event in the trailing 7 days."""
    import datetime

    from eecs_485___mapreduce_spark.queries.quality import (
        ROLLING_DISTINCT_DAYS,
        rolling_7d_distinct_users,
    )

    events = load_table(spark, SF_SMALL, "events").where(
        F.col("user_id").isNotNull()
    )
    pairs = {
        (r.user_id, r.d)
        for r in events.select(
            "user_id", F.to_date("ts").alias("d")
        ).distinct().collect()
    }
    days = sorted({d for _, d in pairs})
    brute = {}
    for day in days:
        lo = day - datetime.timedelta(days=ROLLING_DISTINCT_DAYS - 1)
        brute[day] = len({u for (u, d) in pairs if lo <= d <= day})
    got = {
        r.day: r.n_distinct_users_7d
        for r in rolling_7d_distinct_users(spark, SF_SMALL).collect()
    }
    assert got == brute


def test_equidepth_buckets_partition_the_table(spark):
    """Bucket ranges must be ordered and non-overlapping, cover every
    row, and be roughly equal-depth (within the slack value ties
    force)."""
    from eecs_485___mapreduce_spark.queries.quality import (
        EQUIDEPTH_BUCKETS,
        equidepth_buckets_orders,
    )

    rows = sorted(
        equidepth_buckets_orders(spark, SF_SMALL).collect(), key=lambda r: r.bucket
    )
    n = load_table(spark, SF_SMALL, "orders").count()
    assert sum(r.n_orders for r in rows) == n
    assert [r.bucket for r in rows] == list(range(1, len(rows) + 1))
    for a, b in zip(rows, rows[1:]):
        assert a.max_cents < b.min_cents  # disjoint, ordered ranges
    # equal depth within 20% of the ideal on this (nearly tie-free)
    # column
    ideal = n / EQUIDEPTH_BUCKETS
    for r in rows:
        assert 0.8 * ideal <= r.n_orders <= 1.2 * ideal, r


def test_theil_decomposition_identity(spark):
    """sum(between) + sum(within) must equal the directly-computed
    total Theil-T index (within quantization slack: one nano-unit per
    summed term)."""
    import math

    from eecs_485___mapreduce_spark.queries.quality import (
        theil_decomposition_revenue,
    )

    out = theil_decomposition_revenue(spark, SF_SMALL).collect()
    got = sum(r["between_nano"] + r["within_nano"] for r in out) / 1e9

    orders = load_table(spark, SF_SMALL, "orders")
    revs = [
        float(r["r"])
        for r in orders.groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("r"))
        .collect()
    ]
    t = sum(revs)
    n = len(revs)
    want = sum((x / t) * math.log(x * n / t) for x in revs)
    n_terms = n + 2 * len(out)
    assert abs(got - want) <= n_terms * 1e-9 + 1e-6
    assert want > 0  # revenue is unequal; Theil must see it


def test_kmv_estimate_accuracy_and_small_group_exactness(spark):
    """KMV contract: scopes with fewer than K distinct users report the
    EXACT count; saturated scopes estimate within the standard
    ~1/sqrt(K) relative-error envelope (3 sigma)."""
    from eecs_485___mapreduce_spark.queries.quality_sketch import (
        KMV_K,
        approx_users_kmv_mergeable,
    )

    rows = approx_users_kmv_mergeable(spark, SF_SMALL).collect()
    assert {r["scope"] for r in rows} >= {"__all__"}
    tol = 3.0 / (KMV_K ** 0.5)  # ~18.75% at K=256
    for r in rows:
        if r["n_exact"] < KMV_K:
            assert r["kmv_estimate"] == r["n_exact"], r
        else:
            rel = abs(r["kmv_estimate"] - r["n_exact"]) / r["n_exact"]
            assert rel <= tol, (r, rel)


def _hll_reference(user_ids):
    """Textbook recompute of the deterministic-HLL register state in
    pure Python (hashlib md5), independent of both engines."""
    import hashlib
    import math

    from eecs_485___mapreduce_spark.queries.quality_sketch import (
        HLL_M,
        _HLL_ALPHA_NUM,
        _HLL_LC_CUTOFF,
        _HLL_POW_CAP,
        _HLL_RHO_CAP,
        _HLL_TAIL_BITS,
        _HLL_TAIL_MASK,
    )

    regs: dict[int, int] = {}
    for u in user_ids:
        h = int(hashlib.md5(f"hll:{u}".encode()).hexdigest()[:15], 16)
        bucket, tail = h >> _HLL_TAIL_BITS, h & _HLL_TAIL_MASK
        rho = _HLL_RHO_CAP if tail == 0 else _HLL_RHO_CAP - tail.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rho)
    m_nonzero = len(regs)
    s_scaled = sum(1 << (_HLL_RHO_CAP - r) for r in regs.values()) + (
        HLL_M - m_nonzero
    ) * _HLL_POW_CAP
    raw = _HLL_ALPHA_NUM / float(s_scaled)
    if raw <= _HLL_LC_CUTOFF and m_nonzero < HLL_M:
        est = HLL_M * math.log(HLL_M / float(max(HLL_M - m_nonzero, 1)))
    else:
        est = raw
    return {
        "m_nonzero": m_nonzero,
        "reg_sum": sum(regs.values()),
        "s_scaled": s_scaled,
        "est_users": int(math.floor(est)),
    }


def test_hll_census_state_matches_python_recompute(spark):
    """Every scope's register state AND estimate must equal a pure
    hashlib/math recompute — the engine, the oracle, and the textbook
    algorithm agree bit-for-bit (merge row included, so register-wise
    max over per-type sketches == sketch of the unioned user set)."""
    from eecs_485___mapreduce_spark.queries.quality_sketch import (
        hll_register_census_users,
    )

    got = {r["scope"]: r for r in hll_register_census_users(spark, SF_SMALL).collect()}
    events = load_table(spark, SF_SMALL, "events").where(F.col("user_id").isNotNull())
    by_type: dict[str, set] = {}
    for r in events.select("event_type", "user_id").distinct().collect():
        by_type.setdefault(r["event_type"], set()).add(r["user_id"])
    by_type["__all__"] = set().union(*by_type.values())
    assert set(got) == set(by_type)
    for scope, users in by_type.items():
        want = _hll_reference(users)
        have = {k: got[scope][k] for k in want}
        assert have == want, (scope, have, want)


def test_hll_census_estimate_accuracy(spark):
    """Estimates stay inside the classic HLL envelope: 3 * 1.04/sqrt(m)
    relative error (linear-counting scopes are far tighter)."""
    from eecs_485___mapreduce_spark.queries.quality_sketch import (
        HLL_M,
        hll_register_census_users,
    )

    rows = hll_register_census_users(spark, SF_SMALL).collect()
    events = load_table(spark, SF_SMALL, "events").where(F.col("user_id").isNotNull())
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact["__all__"] = events.select("user_id").distinct().count()
    tol = 3 * 1.04 / HLL_M ** 0.5
    for r in rows:
        n = exact[r["scope"]]
        assert abs(r["est_users"] - n) <= max(tol * n, 2.0), (r, n)
