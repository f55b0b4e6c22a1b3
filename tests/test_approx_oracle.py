"""Cross-engine tolerance checks for the approximate sketches: the
driver records rows-only for these (HLL and GK/t-digest estimates are
engine-specific, so no value-hash oracle is possible), so the bounded
relative error vs DuckDB's OWN approximate functions is pinned here
instead — two independent sketch implementations agreeing within their
published error envelopes is strong evidence both are wired correctly.
"""

from __future__ import annotations

import duckdb
import pytest

from eecs_485___mapreduce_spark.queries.relational import approx_distinct_parts
from eecs_485___mapreduce_spark.queries.timeseries import approx_percentiles_price

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS "
        f"SELECT * FROM read_parquet('{SF_SMALL}/lineitem.parquet')"
    )
    yield con
    con.close()


def test_hll_distinct_vs_duckdb_approx(spark, duck):
    """Spark HLL++ (rsd=0.01) vs DuckDB approx_count_distinct (HLL):
    both estimate the same cardinalities; at these scales each is
    within ~5% of truth, so they sit within 10% of each other."""
    ours = {r.l_returnflag: r.approx_orders for r in approx_distinct_parts(spark, SF_SMALL).collect()}
    theirs = {
        flag: est
        for flag, est in duck.execute(
            "SELECT l_returnflag, approx_count_distinct(l_orderkey) "
            "FROM lineitem GROUP BY 1"
        ).fetchall()
    }
    assert set(ours) == set(theirs)
    for flag in ours:
        rel = abs(ours[flag] - theirs[flag]) / theirs[flag]
        assert rel < 0.10, f"{flag}: spark {ours[flag]} vs duckdb {theirs[flag]}"


def test_gk_percentiles_vs_duckdb_approx_quantile(spark, duck):
    """Spark Greenwald-Khanna (accuracy 10000 => eps 1e-4 in rank) vs
    DuckDB t-digest approx_quantile: different sketches, same
    distribution — values must agree within 2% relative error (the
    distribution has no atoms wide enough to separate them more)."""
    row = approx_percentiles_price(spark, SF_SMALL).collect()[0]
    ours = {"p50": row.p50_approx, "p95": row.p95_approx, "p99": row.p99_approx}
    theirs = dict(
        zip(
            ("p50", "p95", "p99"),
            duck.execute(
                "SELECT approx_quantile(l_extendedprice, 0.5), "
                "approx_quantile(l_extendedprice, 0.95), "
                "approx_quantile(l_extendedprice, 0.99) FROM lineitem"
            ).fetchone(),
        )
    )
    for p in ours:
        rel = abs(float(ours[p]) - float(theirs[p])) / float(theirs[p])
        assert rel < 0.02, f"{p}: spark {ours[p]} vs duckdb {theirs[p]} ({rel:.4f})"
