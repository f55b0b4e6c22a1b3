"""Within-engine reproducibility for the rows-only queries.

Queries without a DuckDB oracle (iterative / approximate by design) get
only a row-count check from the round driver, so VALUE-level
nondeterminism could hide there: an unpersisted range partitioning, an
RNG seed, a tie broken by partition order, summation-order float
drift. This suite runs every rows-only query TWICE in the same session
and requires bit-identical normalized output — the same canonical form
the driver hashes — so "rows-only" never becomes "unreproducible".

(The SQL-expressible queries get this for free: the driver's
value-hash against DuckDB would flake on any nondeterminism, and
tests/test_queries_oracle.py re-checks them every run.)
"""

from __future__ import annotations

import pytest

from eecs_485___mapreduce_spark.registry import all_queries

from .conftest import SF_SMALL, normalize

_ROWS_ONLY = [n for n, q in all_queries().items() if q.oracle is None]


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_query_is_reproducible(spark, name):
    q = all_queries()[name]
    df1 = q.fn(spark, SF_SMALL)
    first = normalize([tuple(r) for r in df1.collect()], df1.columns)
    # Release every cached scope so the second run rebuilds shared
    # relations from scratch — reproducibility must not depend on the
    # cache warmed by the first run.
    from eecs_485___mapreduce_spark.functions import release_scope

    release_scope()
    df2 = q.fn(spark, SF_SMALL)
    second = normalize([tuple(r) for r in df2.collect()], df2.columns)
    assert first == second, f"{name}: two runs disagree"
    assert len(first) > 0, f"{name}: empty result"
    release_scope()
