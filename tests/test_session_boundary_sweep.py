"""Generative engine-vs-oracle sweep for the session family at the
EXACT-GAP boundary: random event corpora whose inter-event deltas are
drawn from {gap-1, gap, gap+1} for both session gaps — plus
same-second ties and MICROSECOND offsets either side of the boundary
— each written to parquet and run through the registered Spark query
AND its DuckDB oracle side by side.

The deterministic fixtures in tests/test_edge_corpus.py pin the known
boundary shapes; this sweep searches the NEIGHBORHOOD of the boundary
(bridges, chains of exactly-gap steps, error gaps interleaved with
default gaps, sub-second jitter) that hand-planted rows cannot
enumerate. It is the generative version of the gate that would have
caught the r6 inclusive-merge divergence on round one.
"""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from eecs_485___mapreduce_spark.queries.timeseries import (
    DYNGAP_DEFAULT_S,
    DYNGAP_ERROR_S,
)
from eecs_485___mapreduce_spark.registry import all_queries

from .conftest import normalize, sweep_examples

# deltas in MICROSECONDS: exact boundaries, one second and one
# microsecond either side, ties, and ordinary gaps
_DELTAS_US = [
    (DYNGAP_DEFAULT_S - 1) * 1_000_000,
    DYNGAP_DEFAULT_S * 1_000_000 - 1,
    DYNGAP_DEFAULT_S * 1_000_000,
    DYNGAP_DEFAULT_S * 1_000_000 + 1,
    (DYNGAP_DEFAULT_S + 1) * 1_000_000,
    (DYNGAP_ERROR_S - 1) * 1_000_000,
    DYNGAP_ERROR_S * 1_000_000,
    (DYNGAP_ERROR_S + 1) * 1_000_000,
    0,
    30 * 1_000_000,
    7200 * 1_000_000,
]

_BASE_US = 1_700_000_000 * 1_000_000

SESSION_QUERIES = [
    "events_session_window",
    "events_session_dynamic_gap",
    "events_session_boundary_fixture",
    "sessionize_users",
    "sessionize_two_level_stitch",
]

# The interval/as-of family shares the same boundary seams (strict vs
# inclusive edges of time windows); the corpus's purchase/click mix
# plus exact-gap deltas exercises their window edges generatively.
INTERVAL_QUERIES = [
    "asof_join_purchase_click",
    "range_join_click_burst",
    "seq_pattern_conversion",
    "session_overlap_topk",
    "interval_union_coverage",
]


@st.composite
def boundary_events(draw):
    rows = []
    eid = 0
    for uid in range(1, draw(st.integers(2, 3)) + 1):
        t_us = _BASE_US + draw(st.integers(0, 3600)) * 1_000_000
        for _ in range(draw(st.integers(2, 7))):
            rows.append(
                {
                    "event_id": eid,
                    "ts_us": t_us,
                    "user_id": uid,
                    "event_type": draw(
                        st.sampled_from(["click", "view", "purchase", "error"])
                    ),
                    "value": float(draw(st.integers(0, 20))),
                }
            )
            eid += 1
            t_us += draw(st.sampled_from(_DELTAS_US))
    return rows


def _write_events(tmpdir: str, rows) -> str:
    table = pa.table(
        {
            "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
            # tz-NAIVE like the shipped events.parquet (TESTDATA.md):
            # a tz-aware arrow type makes DuckDB render +00:00 strings
            # while Spark renders naive — a false rendering mismatch,
            # not a semantics one
            "ts": pa.array([r["ts_us"] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
            "event_type": pa.array(
                [r["event_type"] for r in rows], pa.string()
            ),
            "value": pa.array([r["value"] for r in rows], pa.float64()),
            "props": pa.array([None] * len(rows), pa.string()),
        }
    )
    d = os.path.join(tmpdir, "events.parquet")
    os.makedirs(d, exist_ok=True)
    pq.write_table(table, os.path.join(d, "part-0.parquet"))
    return tmpdir


@given(rows=boundary_events())
@settings(
    max_examples=sweep_examples(10, 3),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_session_family_matches_oracle_on_boundary_corpora(
    spark, tmp_path_factory, rows
):
    from eecs_485___mapreduce_spark.functions import release_scope

    sf_dir = _write_events(str(tmp_path_factory.mktemp("sessbnd")), rows)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    try:
        for name in SESSION_QUERIES:
            q = all_queries()[name]
            sdf = q.fn(spark, sf_dir)
            s_rows = [tuple(r) for r in sdf.collect()]
            res = con.execute(q.oracle)
            o_cols = [d[0] for d in res.description]
            o_rows = res.fetchall()
            assert sorted(sdf.columns) == sorted(o_cols), name
            assert len(s_rows) == len(o_rows), (
                f"{name}: {len(s_rows)} vs {len(o_rows)} rows"
            )
            assert normalize(s_rows, sdf.columns) == normalize(
                o_rows, o_cols
            ), f"{name}: values differ on a boundary corpus"
    finally:
        release_scope(sf_dir)


@given(rows=boundary_events())
@settings(
    max_examples=sweep_examples(10, 3),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_interval_family_matches_oracle_on_boundary_corpora(
    spark, tmp_path_factory, rows
):
    from eecs_485___mapreduce_spark.functions import release_scope

    sf_dir = _write_events(str(tmp_path_factory.mktemp("intbnd")), rows)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    try:
        for name in INTERVAL_QUERIES:
            q = all_queries()[name]
            sdf = q.fn(spark, sf_dir)
            s_rows = [tuple(r) for r in sdf.collect()]
            res = con.execute(q.oracle)
            o_cols = [d[0] for d in res.description]
            o_rows = res.fetchall()
            assert sorted(sdf.columns) == sorted(o_cols), name
            assert len(s_rows) == len(o_rows), (
                f"{name}: {len(s_rows)} vs {len(o_rows)} rows"
            )
            assert normalize(s_rows, sdf.columns) == normalize(
                o_rows, o_cols
            ), f"{name}: values differ on a boundary corpus"
    finally:
        release_scope(sf_dir)
