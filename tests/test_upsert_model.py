"""Model-based sweep of the foreachBatch upsert sink: random batch
sequences with replays, out-of-order delivery, and (ts, event_id)
collisions, checked after EVERY merge against a sequential dict model
(per (user_id, event_type) keep the row with max (ts, event_id)).

The fixed-data test (test_streaming.py) covers ordered micro-batch
splits and a superset replay; this sweep drives the adversarial
orderings at-least-once delivery actually produces: a stale batch
re-arriving AFTER newer data landed, the same event redelivered in
three different batches, and distinct events colliding on
(key, ts) where the event_id tie-break decides the survivor.

Redelivery contract: a row is a pure function of its event_id (the
semantics of at-least-once replay — the same event may arrive twice,
never two payloads under one id), so every generated redelivery is
byte-identical, exactly like the real stream.
"""

from __future__ import annotations

import datetime
import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st

from .conftest import sweep_examples

from eecs_485___mapreduce_spark.streaming import upsert_batch

_T0 = datetime.datetime(2024, 3, 1, 0, 0, 0)
_POOL = 16  # event ids 0..15: small pool -> dense key/ts collisions


def _row(eid: int) -> tuple:
    """The unique row for event id ``eid``: 6 users x 2 types, ts
    quantized to 5 distinct seconds so DIFFERENT events collide on
    (key, ts) and the event_id tie-break matters."""
    return (
        eid,
        eid % 6,
        "view" if eid % 2 == 0 else "click",
        _T0 + datetime.timedelta(seconds=(eid * 7) % 5),
        eid * 1.5,
    )


COLS = ["event_id", "user_id", "event_type", "ts", "value"]


@settings(max_examples=sweep_examples(10, 3), deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=_POOL - 1),
                 min_size=1, max_size=8),
        min_size=1,
        max_size=4,
    ),
    st.data(),
)
def test_upsert_matches_sequential_model_under_replay(spark, batches, data):
    table = tempfile.mkdtemp(prefix="upsert-model-")

    # interleave organic batches with replays of earlier ones
    schedule: list[list[int]] = []
    for i, b in enumerate(batches):
        schedule.append(b)
        if i > 0 and data.draw(st.booleans()):
            schedule.append(batches[data.draw(
                st.integers(min_value=0, max_value=i - 1))])

    model: dict[tuple, tuple] = {}
    for batch_ids in schedule:
        rows = [_row(e) for e in batch_ids]
        df = spark.createDataFrame(
            rows,
            "event_id bigint, user_id bigint, event_type string, "
            "ts timestamp, value double",
        )
        upsert_batch(spark, df, table)
        for r in rows:
            k = (r[1], r[2])
            if k not in model or (r[3], r[0]) > (model[k][3], model[k][0]):
                model[k] = r
        got = sorted(
            tuple(x) for x in spark.read.parquet(table).select(*COLS).collect()
        )
        want = sorted(model.values())
        assert got == want, f"diverged after batch {batch_ids}"
