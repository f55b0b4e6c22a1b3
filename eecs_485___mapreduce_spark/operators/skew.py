"""Skew-mitigation operators: salted join and two-phase distinct.

AQE's skew-join splitting (on in this engine's session) handles
moderate skew at runtime; these explicit forms are for the cases AQE
can't fix — a join key where ONE value carries a double-digit share of
the rows (AQE can split the partition but every split still probes the
same build rows), and a global/grouped COUNT(DISTINCT) whose single
final reducer becomes the bottleneck.

Both are pure DataFrame compositions — no UDFs, no RNG (salts derive
from xxhash64 of the row, so plans stay deterministic and re-runnable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``large.on`` is heavily skewed: the large side
    gets a deterministic salt in [0, n_salts), the small side is
    replicated n_salts times, and the join key becomes (on, salt) — so
    the hot key's rows spread over ``n_salts`` reducers instead of one.

    Cost model: replicates the small side n_salts x (only viable when
    small is dim-sized) in exchange for n_salts-way parallelism on the
    hot key. With a broadcastable small side prefer plain broadcast —
    salting is for the mid-size build side that neither broadcasts nor
    survives single-reducer skew.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(n_salts))
    salted_large = large.withColumn("_salt", salt)
    salts = large.sparkSession.range(n_salts).select(
        F.col("id").cast("int").alias("_salt")
    )
    replicated_small = small.crossJoin(salts)
    out = salted_large.join(replicated_small, on=[on, "_salt"], how=how)
    return out.drop("_salt")


def two_phase_distinct(
    df: DataFrame, group_key: str | Column, distinct_col: str | Column
) -> DataFrame:
    """Exact COUNT(DISTINCT) without a hot final reducer: phase 1
    dedups (key, value) pairs across the full width of the cluster,
    phase 2 counts per key. Identical result to
    ``groupBy(key).agg(countDistinct(col))``; the difference is that
    phase 1's shuffle key includes the value, so a key with a billion
    distinct values still spreads over every reducer.

    (Catalyst plans countDistinct as an expand + two-phase agg itself;
    this explicit form is for layering under further aggregation or
    joining, where the intermediate deduped relation is reused.)

    Returns ``DataFrame[key, n_distinct]``.
    """
    key = F.col(group_key) if isinstance(group_key, str) else group_key
    val = F.col(distinct_col) if isinstance(distinct_col, str) else distinct_col
    deduped = df.select(key.alias("key"), val.alias("val")).distinct()
    # count("val"), not count(*): countDistinct ignores NULLs, so the
    # surviving (key, NULL) row must contribute 0 — count(*) counted
    # it and over-reported every NULL-carrying key by one (keys with
    # ONLY NULLs reported 1 instead of 0). Caught by the equivalence
    # sweep in tests/test_skew.py.
    return deduped.groupBy("key").agg(F.count("val").alias("n_distinct"))
