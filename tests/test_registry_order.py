"""Registry-order guards: the round driver oracle-checks only the
first 50 entries of queries(), so DRIVER_ORDER_FIRST must stay valid —
a typo'd name there would silently fall out of the checked window."""

from __future__ import annotations

from eecs_485___mapreduce_spark.registry import DRIVER_ORDER_FIRST, all_queries


def test_driver_order_names_exist():
    reg = all_queries()
    missing = [n for n in DRIVER_ORDER_FIRST if n not in reg]
    assert not missing, f"DRIVER_ORDER_FIRST names not in registry: {missing}"


def test_driver_order_fits_checked_window():
    assert len(DRIVER_ORDER_FIRST) <= 50, (
        f"{len(DRIVER_ORDER_FIRST)} priority names exceed the driver's "
        "50-query window — trim to the entries that need a fresh row"
    )
    assert len(set(DRIVER_ORDER_FIRST)) == len(DRIVER_ORDER_FIRST), "duplicates"

    # While a rotation backlog exists, every window slot must be spent:
    # an undersized window wastes a driver row a queued query needs.
    from eecs_485___mapreduce_spark.registry import ROTATION_QUEUE

    if ROTATION_QUEUE:
        assert len(DRIVER_ORDER_FIRST) == 50, (
            f"window has {len(DRIVER_ORDER_FIRST)} slots but "
            f"{len(ROTATION_QUEUE)} queries still queue for a driver row"
        )


def test_priority_entries_lead_the_dict():
    names = list(all_queries())
    k = len([n for n in DRIVER_ORDER_FIRST if n in set(names)])
    assert names[:k] == [n for n in DRIVER_ORDER_FIRST if n in set(names)]


def test_every_query_has_fn_and_distinct_name():
    reg = all_queries()
    assert len(reg) >= 80
    for name, q in reg.items():
        assert callable(q.fn), name
        assert q.name == name


def test_rotation_queue_covers_every_unrowed_query():
    """Driver-row bookkeeping closure: every registered query must be
    (a) in the current DRIVER_ORDER_FIRST window, (b) already green in
    a prior round's driver run (CORRECTNESS_r01/r02), or (c) queued in
    ROTATION_QUEUE for a future window — so no query can silently
    never earn a driver row. Queue entries must also resolve to real
    registry names (a typo here would mislead next round's curation)."""
    import glob
    import json
    import os

    from eecs_485___mapreduce_spark.registry import ROTATION_QUEUE

    reg = all_queries()
    bad = [n for n in ROTATION_QUEUE if n not in reg]
    assert not bad, f"ROTATION_QUEUE names not in registry: {bad}"
    assert len(set(ROTATION_QUEUE)) == len(ROTATION_QUEUE), "duplicates"

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rowed: set[str] = set()
    for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        rowed |= set(json.load(open(p)))
    uncovered = set(reg) - set(DRIVER_ORDER_FIRST) - rowed - set(ROTATION_QUEUE)
    assert not uncovered, (
        f"queries with no driver row, not windowed, not queued: "
        f"{sorted(uncovered)}"
    )
