"""Skew operators must be result-identical to their naive forms —
salting changes the physical distribution, never the answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from eecs_485___mapreduce_spark.operators.skew import salted_join, two_phase_distinct
from eecs_485___mapreduce_spark.sources import load_table

from .conftest import SF_SMALL


def test_salted_join_equals_plain_join(spark):
    li = load_table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF_SMALL, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    plain = li.join(orders, "l_orderkey").select(
        "l_orderkey", "l_quantity", "o_orderstatus"
    )
    salted = salted_join(li, orders, on="l_orderkey", n_salts=8).select(
        "l_orderkey", "l_quantity", "o_orderstatus"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_spreads_hot_key(spark):
    """A 100%-skewed large side (every row the same key) must land in
    more than one shuffle partition after salting."""
    hot = spark.range(10_000).select(
        F.lit(42).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.createDataFrame([(42, "x")], "k bigint, name string")
    out = salted_join(hot, dim, on="k", n_salts=8)
    assert out.count() == 10_000
    # the salt column spread the rows across multiple groups
    n_salt_groups = (
        hot.withColumn(
            "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in hot.columns]), F.lit(8))
        )
        .select("_salt")
        .distinct()
        .count()
    )
    assert n_salt_groups > 1


def test_two_phase_distinct_equals_count_distinct(spark):
    li = load_table(spark, SF_SMALL, "lineitem")
    want = {
        (r.key, r.n)
        for r in li.groupBy(F.col("l_returnflag").alias("key"))
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    got = {
        (r.key, r.n_distinct)
        for r in two_phase_distinct(li, "l_returnflag", "l_orderkey").collect()
    }
    assert got == want


def test_aqe_splits_skewed_join_partitions(spark):
    """Runtime skew evidence: AQE's OptimizeSkewedJoin must split a hot
    join partition into sub-partitions (SortMergeJoin(skew=true) +
    'AQEShuffleRead skewed' in the final adaptive plan). This is the
    no-code-change half of the engine's skew story — the salted-join
    operator (operators/skew.py) is the explicit half for aggregations
    and key-preserving joins where AQE can't help. Thresholds are
    lowered to make a local[32]-sized hot key cross the skew bar; on a
    real cluster the stock thresholds fire on genuinely large
    partitions."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # key 0 holds half of 200k padded rows -> one hot partition
        left = spark.range(200000).select(
            F.when(F.col("id") % 2 == 0, 0).otherwise(F.col("id") % 1000).alias("k"),
            F.col("id").alias("v"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        right = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("w")
        )
        j = left.join(right, "k").select(F.sum("v").alias("s"))
        [row] = j.collect()  # AQE decides skew handling at runtime
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
        assert "AQEShuffleRead skewed" in plan, plan
        # correctness unaffected by the split
        assert row.s == sum(i for i in range(200000))
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_join_equivalence_sweep(spark):
    """Random-config equivalence: salted_join must equal the plain
    inner join for ANY data — duplicate keys on BOTH sides (the
    replicated small side must not multiply results beyond the true
    row pairing), keys present on only one side, NULL-free domains of
    varying skew, and n_salts from degenerate 1 to more salts than
    rows."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from eecs_485___mapreduce_spark.operators.skew import salted_join

    @given(
        left=st.lists(
            st.tuples(
                st.one_of(st.integers(0, 4), st.none()),  # NULL keys drop
                st.integers(0, 9),
            ),
            min_size=1,
            max_size=30,
        ),
        right=st.lists(
            st.tuples(
                st.one_of(st.integers(0, 6), st.none()),
                st.integers(0, 9),
            ),
            min_size=1,
            max_size=10,
        ),
        n_salts=st.sampled_from([1, 2, 8, 64]),
    )
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def check(left, right, n_salts):
        ldf = spark.createDataFrame(left, "k int, lv int")
        rdf = spark.createDataFrame(right, "k int, rv int")
        plain = sorted(
            map(tuple, ldf.join(rdf, "k").select("k", "lv", "rv").collect())
        )
        salted = sorted(
            map(
                tuple,
                salted_join(ldf, rdf, on="k", n_salts=n_salts)
                .select("k", "lv", "rv")
                .collect(),
            )
        )
        assert salted == plain

    check()


def test_two_phase_distinct_equivalence_sweep(spark):
    """two_phase_distinct must equal groupBy().countDistinct() — and a
    pure-Python recompute — for random data including NULL values
    (countDistinct ignores NULLs; the distinct-then-count form must
    not count the NULL group) and single-value keys."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from eecs_485___mapreduce_spark.operators.skew import two_phase_distinct

    @given(
        rows=st.lists(
            st.tuples(
                st.integers(0, 4),
                st.one_of(st.integers(0, 5), st.none()),
            ),
            min_size=1,
            max_size=40,
        )
    )
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def check(rows):
        df = spark.createDataFrame(rows, "k int, v int")
        got = {
            r.key: r.n_distinct
            for r in two_phase_distinct(df, "k", "v").collect()
        }
        want_engine = {
            r.k: r.n
            for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
        }
        want_py: dict[int, set] = {}
        for k, v in rows:
            want_py.setdefault(k, set())
            if v is not None:
                want_py[k].add(v)
        assert got == want_engine == {k: len(s) for k, s in want_py.items()}

    check()
