"""Generative engine-vs-oracle sweep for the RANGE-frame / trailing-
window family at its TIME EDGES: random event corpora whose
inter-event deltas land exactly ON the trailing-hour frame edge
(3599 s / 3600 s, one microsecond either side), on hour and day
bucket boundaries, and at sub-second jitter — run through every
events-only rolling/rollup query AND its DuckDB oracle side by side.

The seam: these operators floor timestamps to SECONDS before framing
(rolling_1h_user_value orders by unix_timestamp with RANGE 3599
PRECEDING) or bucket by hour/day truncation. An oracle written in raw
epoch_us — or a frame bound off by one second — diverges only when an
event pair straddles the floor, exactly the class of defect #11
(session_overlap_topk's microsecond-exact oracle vs floored-second
engine). Fourth instance of the boundary-sweep discipline
(sessions/intervals, dedup thresholds, rank ties, now RANGE frames).
"""

from __future__ import annotations

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from eecs_485___mapreduce_spark.registry import all_queries

from .conftest import normalize, sweep_examples
from .test_session_boundary_sweep import _write_events

ROLLING_QUERIES = [
    "rolling_1h_user_value",
    "time_weighted_value_per_user",
    "user_decay_score",
    "events_gapfill_ffill",
    "events_multires_rollup",
    "events_sliding_windows",
    "events_hourly",
    "events_dow_hour_profile",
]

_HOUR_US = 3600 * 1_000_000
# 1_700_000_000 is NOT hour-aligned; align so bucket-edge deltas land
# exactly on hour/day boundaries when start jitter is zero.
_BASE_US = (1_700_000_000 * 1_000_000 // (86400 * 1_000_000)) * (
    86400 * 1_000_000
)

# trailing-hour frame edge (3599 s inclusive / 3600 s exclusive on
# floored seconds), the microsecond neighborhood of both, bucket
# edges (hour, day), ties, and sub-second jitter
_DELTAS_US = [
    3599 * 1_000_000,
    3599 * 1_000_000 + 999_999,  # floors to 3599 -> still inside
    _HOUR_US - 1,
    _HOUR_US,
    _HOUR_US + 1,
    3601 * 1_000_000,
    86400 * 1_000_000 - 1,
    86400 * 1_000_000,
    0,
    1,
    999_999,
    1_000_000,
    500_000,
    90 * 1_000_000,
]


@st.composite
def edge_events(draw):
    rows = []
    eid = 0
    for uid in range(1, draw(st.integers(2, 3)) + 1):
        # start ON an hour edge, or a microsecond/half-second off it
        t_us = (
            _BASE_US
            + draw(st.integers(0, 5)) * _HOUR_US
            + draw(st.sampled_from([0, 1, -1, 500_000]))
        )
        for _ in range(draw(st.integers(3, 8))):
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


@given(rows=edge_events())
@settings(
    max_examples=sweep_examples(10, 3),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_rolling_family_matches_oracle_on_frame_edge_corpora(
    spark, tmp_path_factory, rows
):
    from eecs_485___mapreduce_spark.functions import release_scope

    sf_dir = _write_events(str(tmp_path_factory.mktemp("rngedge")), rows)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    try:
        for name in ROLLING_QUERIES:
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
            ), f"{name}: values differ on a frame-edge corpus"
    finally:
        release_scope(sf_dir)
