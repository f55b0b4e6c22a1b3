"""Every registered query vs its DuckDB oracle at sf0.001 — the same
check the driver runs at sf0.01 (mirrors the reference's golden-output
integration layer, SURVEY.md section 5.1)."""

from __future__ import annotations

import pytest

from eecs_485___mapreduce_spark.registry import all_queries

from .conftest import SF_SMALL, normalize

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    q = QUERIES[name]
    sdf = q.fn(spark, SF_SMALL)
    s_rows = [tuple(r) for r in sdf.collect()]
    s_cols = sdf.columns
    if q.oracle is None:
        assert len(s_rows) >= 0  # rows-only contract: runs, stable schema
        assert s_cols
        return
    res = duck.execute(q.oracle)
    o_cols = [d[0] for d in res.description]
    o_rows = res.fetchall()
    assert sorted(s_cols) == sorted(o_cols), f"{name}: column names differ"
    assert len(s_rows) == len(o_rows), f"{name}: row counts differ"
    assert normalize(s_rows, s_cols) == normalize(o_rows, o_cols), (
        f"{name}: values differ"
    )


# DuckDB types SUM(<integer>) as HUGEINT (int128); the round driver's
# hasher canonicalizes HUGEINT differently than BIGINT, so an oracle
# that leaks HUGEINT (or DECIMAL) fails the driver's value-hash even
# when every value matches — exactly what red-flagged 4 queries in
# rounds 1-2. Lint every oracle's *static* output type instead of
# waiting for the driver to find it.
_DRIVER_SAFE_TYPES = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT",
    "VARCHAR", "DATE", "TIMESTAMP", "BOOLEAN",
}


@pytest.mark.parametrize(
    "name", sorted(n for n, q in QUERIES.items() if q.oracle is not None)
)
def test_oracle_types_driver_safe(name, duck):
    rel = duck.sql(QUERIES[name].oracle)
    for col, typ in zip(rel.columns, rel.types):
        t = str(typ)
        base = t.split("(")[0]
        assert base in _DRIVER_SAFE_TYPES, (
            f"{name}: oracle column {col!r} has driver-unsafe type {t} "
            f"(DuckDB SUM(int) yields HUGEINT — wrap in CAST(... AS BIGINT))"
        )
