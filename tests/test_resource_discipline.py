"""Resource-budget discipline: the analog of the reference's streaming
memory test (tests/test_worker_11.py:142-150 caps the worker at <1 MiB
heap over a 3.7 MB input — i.e. operators must STREAM, never
materialize the dataset in one process).

The Spark translation of that envelope: no query may pull the dataset
onto the driver. Two layers:

1. a static sweep — no driver-materializing call appears anywhere in
   the package source (the single allowed exception is the documented
   scalar ``count()`` convergence check in dedup_clusters);
2. a dynamic guard — constructing every registered query's DataFrame
   with collect/toPandas/take/head/first/toLocalIterator poisoned must
   succeed, proving no query needs driver data to BUILD its plan.
"""

from __future__ import annotations

import re
from pathlib import Path

import pytest
from pyspark.sql import DataFrame

import eecs_485___mapreduce_spark
from eecs_485___mapreduce_spark.registry import all_queries

from .conftest import SF_SMALL

_BANNED = ("collect", "toPandas", "toLocalIterator", "take", "head", "first")


def test_package_source_has_no_driver_materialization():
    pkg = Path(eecs_485___mapreduce_spark.__file__).parent
    pattern = re.compile(r"\.(?:" + "|".join(_BANNED) + r")\(")
    offenders = []
    for py in pkg.rglob("*.py"):
        for lineno, line in enumerate(py.read_text().splitlines(), 1):
            if pattern.search(line):
                offenders.append(f"{py.relative_to(pkg)}:{lineno}: {line.strip()}")
    assert not offenders, "driver materialization in package source:\n" + "\n".join(
        offenders
    )


def test_all_queries_build_with_materialization_poisoned(spark, monkeypatch):
    """Every registered query must construct its DataFrame lazily —
    a query that needs collect()/toPandas() to build its plan is not a
    distributed operator. The CC convergence loop's scalar count() is
    the one permitted driver value (a single long, mirroring the
    reference's in-envelope counters)."""

    def poisoned(name):
        def fn(self, *a, **k):  # noqa: ANN001
            raise AssertionError(
                f"DataFrame.{name}() called while building a query plan"
            )

        return fn

    for name in _BANNED:
        monkeypatch.setattr(DataFrame, name, poisoned(name))

    failures = []
    for name, q in all_queries().items():
        try:
            df = q.fn(spark, SF_SMALL)
            assert df is not None and df.schema is not None
        except AssertionError as ex:
            failures.append(f"{name}: {ex}")
        except Exception as ex:  # noqa: BLE001 - surface with query name
            pytest.fail(f"{name}: unexpected error during lazy build: {ex}")
    assert not failures, "\n".join(failures)
