"""Scan fan-out (sources/catalog.py): single-row-group parquet files
cannot be split below one task, so load_table repartitions big tables
across the cluster's cores right after the read — unless disabled, or
the scan is already parallel enough, or the table is tiny.

The suite runs with SPARK_GRAFT_SCAN_FANOUT=off (tests/conftest.py) so
plan-shape tests keep asserting the production plan; these tests flip
the knob locally and assert the three contract points: the fan-out
exchange appears exactly when it should, predicate pushdown and column
pruning still reach the parquet scan through it, and query results are
identical with it on and off.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eecs_485___mapreduce_spark.sources import load_table

from .conftest import SF_SMALL, SF_ORACLE, normalize

pytestmark = pytest.mark.usefixtures("spark")


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_fanout_off_leaves_scan_alone(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SCAN_FANOUT", "off")
    plan = _plan(load_table(spark, SF_ORACLE, "lineitem"))
    assert "RoundRobinPartitioning" not in plan
    # hard off also overrides a call-site opt-in
    plan = _plan(load_table(spark, SF_ORACLE, "lineitem", fanout=True))
    assert "RoundRobinPartitioning" not in plan


def test_fanout_default_is_call_site_opt_in(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_SCAN_FANOUT", raising=False)
    cores = spark.sparkContext.defaultParallelism
    plan = _plan(load_table(spark, SF_ORACLE, "lineitem"))
    assert "RoundRobinPartitioning" not in plan
    plan = _plan(load_table(spark, SF_ORACLE, "lineitem", fanout=True))
    assert f"RoundRobinPartitioning({cores})" in plan
    # below the row gate the opt-in is a no-op (documents sf0.01 = 500 rows)
    plan = _plan(load_table(spark, SF_ORACLE, "documents", fanout=True))
    assert "RoundRobinPartitioning" not in plan


def test_fanout_auto_fans_out_single_row_group_fact(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SCAN_FANOUT", "auto")
    cores = spark.sparkContext.defaultParallelism
    plan = _plan(load_table(spark, SF_ORACLE, "lineitem"))
    assert f"RoundRobinPartitioning({cores})" in plan


def test_fanout_skips_tiny_tables(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SCAN_FANOUT", "auto")
    plan = _plan(load_table(spark, SF_ORACLE, "nation"))
    assert "RoundRobinPartitioning" not in plan


def test_fanout_explicit_partition_count(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SCAN_FANOUT", "7")
    plan = _plan(load_table(spark, SF_ORACLE, "lineitem"))
    assert "RoundRobinPartitioning(7)" in plan


def test_pushdown_and_pruning_cross_the_fanout_exchange(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SCAN_FANOUT", "auto")
    df = (
        load_table(spark, SF_ORACLE, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .select("l_returnflag", "l_quantity")
    )
    plan = _plan(df)
    assert "RoundRobinPartitioning" in plan
    assert "LessThanOrEqual(l_shipdate" in plan  # PushedFilters at the scan
    # ReadSchema pruned to the used columns (+ the filter column)
    import re

    read_schema = re.search(r"ReadSchema: struct<([^>]*)>", plan).group(1)
    assert set(f.split(":")[0] for f in read_schema.split(",")) == {
        "l_returnflag",
        "l_quantity",
        "l_shipdate",
    }


def test_results_identical_fanout_on_and_off(spark, monkeypatch):
    from eecs_485___mapreduce_spark.registry import all_queries

    q = all_queries()["q1_pricing_summary"]
    out = {}
    for mode in ("off", "auto"):
        monkeypatch.setenv("SPARK_GRAFT_SCAN_FANOUT", mode)
        df = q.fn(spark, SF_SMALL)
        out[mode] = normalize(df.collect(), df.columns)
    assert out["off"] == out["auto"]
