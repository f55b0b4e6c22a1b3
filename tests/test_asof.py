"""As-of join edge semantics on a hand-built fixture: strictly-earlier
matching (a click at the purchase's own instant must NOT match), max
tie collapse for simultaneous clicks, and no-match NULLs — cases the
synthetic corpus never exercises."""

from __future__ import annotations

import datetime as dt

from eecs_485___mapreduce_spark.queries import advanced  # noqa: F401


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, minute, 0)


def _asof_on(spark, rows):
    """Run the as-of composition on explicit event rows by monkeypatch-
    free injection: rebuild the same pipeline the query uses, but from
    a literal DataFrame."""
    from pyspark.sql import functions as F

    from eecs_485___mapreduce_spark.queries.advanced import asof_join_purchase_click

    events = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    )
    # Reuse the registered query's logic by substituting the table load.
    import eecs_485___mapreduce_spark.queries.advanced as adv

    orig = adv.load_table
    adv.load_table = lambda _s, _d, _n: events
    try:
        return asof_join_purchase_click(spark, "unused").collect()
    finally:
        adv.load_table = orig


def test_asof_strict_and_tie_semantics(spark):
    rows = [
        # user 1: click at 12:00 (v=5), clicks at 12:02 (v=1 and v=9,
        # simultaneous), purchase at 12:02 must NOT see same-instant
        # clicks -> matches 12:00; purchase at 12:05 matches the max
        # simultaneous click (v=9).
        (100, _ts(0), 1, "click", 5.0),
        (101, _ts(2), 1, "click", 1.0),
        (102, _ts(2), 1, "click", 9.0),
        (103, _ts(2), 1, "purchase", 50.0),
        (104, _ts(5), 1, "purchase", 60.0),
        # user 2: purchase with no prior click -> NULL match
        (200, _ts(3), 2, "purchase", 70.0),
        (201, _ts(4), 2, "click", 2.0),
    ]
    got = {r.event_id: (r.click_ts, r.click_value) for r in _asof_on(spark, rows)}
    assert got[103] == (_ts(0), 5.0)  # strict: same-instant clicks excluded
    assert got[104] == (_ts(2), 9.0)  # max of simultaneous clicks
    assert got[200] == (None, None)  # no prior click
    assert set(got) == {103, 104, 200}  # purchases only
