"""Executable TIME-UNIT convention for every timestamp-arithmetic
oracle — the class audit the r7 verdict ordered after defect #11
(session_overlap_topk's oracle split sessions on microsecond-exact
gaps while the engine floors to seconds; root cause: UNITS, not
comparison direction).

Convention (pinned here, enforced on a fixture): whenever an engine
expression floors event time to SECONDS (unix_timestamp) or DAYS
(date_trunc / to_date), its oracle must apply the SAME floor
(epoch_us // 1_000_000, // 86400) BEFORE any subtraction or
comparison. Raw-timestamp comparisons (a.ts <= b.ts on both sides)
are unit-safe and exempt.

Enforcement is two-part:
1. ENROLLMENT — every registered oracle that does epoch arithmetic
   is listed in EPOCH_ORACLES. A new timestamp oracle fails the audit
   until it is enrolled, forcing a conscious unit decision.
2. FIXTURE — each events-reading enrollee runs engine-vs-oracle on a
   deterministic corpus whose inter-event gaps sit one MICROSECOND
   either side of every unit constant in the engine (600, 900, 1800,
   300, 3600, 3599 s; hour and day edges), where a floored-second
   engine and a raw-epoch_us oracle provably disagree (that exact
   corpus shape reproduced defect #11 before its fix).
"""

from __future__ import annotations

import duckdb
import pytest

from eecs_485___mapreduce_spark.registry import all_queries

from .conftest import SF_SMALL, normalize
from .test_session_boundary_sweep import _write_events

# Every oracle doing epoch arithmetic, with its unit rule. Additions
# must be enrolled here (test_epoch_oracles_are_enrolled fails
# otherwise) and — if they read events — they join the jitter fixture
# run automatically.
EPOCH_ORACLES = {
    "ccf_event_types_hourly": "hour floor (// 3600)",
    "events_session_boundary_fixture": "second floor, inclusive gap",
    "events_session_window": "second floor, inclusive gap",
    "haar_energy_hourly": "hour floor",
    "hurst_rs_hourly": "hour floor",
    "interval_union_coverage": "second floor, 900 s interval arithmetic",
    "kaplan_meier_reorder_gaps": "DATE-only (// 86400 of a DATE; no "
    "sub-second seam exists)",
    "mase_seasonal_naive_hourly": "hour floor",
    "rolling_1h_user_value": "second floor, RANGE 3599 PRECEDING",
    "seq_pattern_conversion": "second floor, RANGE (1, 600/3600]",
    "session_overlap_topk": "second floor (defect #11's fix)",
    "time_weighted_value_per_user": "second floor deltas",
    "ucb1_variant_replay": "day floor (// 86400)",
    "watermark_lateness_audit": "second floor lateness deltas",
}

# enrollees that do not read the events table (documented above)
_NON_EVENTS = {"kaplan_meier_reorder_gaps"}

_BASE_US = ((1_700_000_000 // 86400) * 86400) * 1_000_000  # day-aligned

# every unit constant the engine expressions use, one microsecond
# either side, plus the floor-splitting sub-second offsets
_GAP_SECONDS = [300, 600, 900, 1800, 3599, 3600, 86400]
_JITTER_US = [-1, 0, 1, 500_000, 999_999]


def _jitter_fixture_rows():
    """Deterministic corpus: for every (gap, jitter) cell, a user
    whose consecutive events are exactly gap*1e6 + jitter µs apart —
    the flooring seam of every enrolled family, densely enumerated."""
    rows = []
    eid = 0
    uid = 0
    types = ["click", "view", "purchase", "error"]
    for gap_s in _GAP_SECONDS:
        for jit in _JITTER_US:
            uid += 1
            t_us = _BASE_US + (uid % 7) * 250_000  # sub-second phase
            for k in range(4):
                rows.append(
                    {
                        "event_id": eid,
                        "ts_us": t_us,
                        "user_id": uid,
                        "event_type": types[(eid + k) % 4],
                        "value": float((eid * 7) % 11),
                    }
                )
                eid += 1
                t_us += gap_s * 1_000_000 + jit
    return rows


def test_epoch_oracles_are_enrolled():
    got = sorted(
        n
        for n, q in all_queries().items()
        if q.oracle and ("epoch_us" in q.oracle or "epoch(" in q.oracle)
    )
    assert got == sorted(EPOCH_ORACLES), (
        "oracle set doing epoch arithmetic changed — enroll the new "
        "query in EPOCH_ORACLES with its unit rule (and it will join "
        "the sub-second jitter fixture run if it reads events)"
    )


@pytest.fixture(scope="module")
def jitter_dir(tmp_path_factory):
    return _write_events(
        str(tmp_path_factory.mktemp("unitjit")), _jitter_fixture_rows()
    )


@pytest.mark.parametrize(
    "name", sorted(set(EPOCH_ORACLES) - _NON_EVENTS)
)
def test_time_unit_convention_on_jitter_fixture(spark, jitter_dir, name):
    from eecs_485___mapreduce_spark.functions import release_scope

    q = all_queries()[name]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{jitter_dir}/events.parquet/*.parquet')"
    )
    try:
        sdf = q.fn(spark, jitter_dir)
        s_rows = [tuple(r) for r in sdf.collect()]
        res = con.execute(q.oracle)
        o_cols = [d[0] for d in res.description]
        o_rows = res.fetchall()
        assert sorted(sdf.columns) == sorted(o_cols), name
        assert len(s_rows) == len(o_rows), (
            f"{name}: {len(s_rows)} vs {len(o_rows)} rows on the "
            "sub-second jitter fixture — unit/floor divergence"
        )
        assert normalize(s_rows, sdf.columns) == normalize(o_rows, o_cols), (
            f"{name}: values differ on the sub-second jitter fixture — "
            "the oracle's time unit/floor does not match the engine's"
        )
    finally:
        release_scope(jitter_dir)


def test_non_events_enrollees_match_oracle_at_sf_small(spark):
    """The DATE-only enrollee has no sub-second seam; assert plain
    engine-vs-oracle equivalence on the shipped corpus instead."""
    import duckdb as _duck

    from eecs_485___mapreduce_spark.functions import release_scope

    con = _duck.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_SMALL}/{t}.parquet')"
        )
    try:
        for name in sorted(_NON_EVENTS):
            q = all_queries()[name]
            sdf = q.fn(spark, SF_SMALL)
            s_rows = [tuple(r) for r in sdf.collect()]
            res = con.execute(q.oracle)
            o_cols = [d[0] for d in res.description]
            o_rows = res.fetchall()
            assert sorted(sdf.columns) == sorted(o_cols), name
            assert normalize(s_rows, sdf.columns) == normalize(
                o_rows, o_cols
            ), name
    finally:
        release_scope(SF_SMALL)
