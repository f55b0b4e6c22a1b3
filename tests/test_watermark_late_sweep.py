"""Generative engine-vs-model sweep for WATERMARK EVICTION under
random LATE-ARRIVAL patterns: event corpora whose rows are displaced
across micro-batch boundaries (so genuinely late data exists), run
through the streaming operators and compared against a pure-Python
model of Spark's engine-true watermark rules.

The existing multibatch sweeps (tests/test_streaming_model.py) sort
corpora by event time, so the watermark never overtakes an arriving
row and the late-data path is never exercised. This sweep is that
path. The model encodes the rules pinned by engine probes on Spark
4.1 (availableNow file stream, maxFilesPerTrigger=1):

- ``wm_used(N)`` — the watermark REPORTED for batch N and used for
  state eviction — is ``max ts over batches 0..N-1, minus delay``
  (0 before any data).
- the LATE-ROW FILTER in batch N uses ``filter_wm(N) = wm_used(N-1)``
  — one batch BEHIND eviction (probed: a new key 6599 s below the
  reported watermark was still emitted in the first batch after the
  watermark jumped, and filtered in the next).
- dropDuplicatesWithinWatermark keeps a row iff ``ts > filter_wm``
  (equality DROPS — probed at exactly the boundary) and its key has
  not been emitted before; because filter_wm is monotone and replays
  carry the original ts, a key emits at most once, at the first
  batch where it appears with ts above that batch's filter_wm.
- windowed aggregation (update mode) keeps a row iff its window END
  is ``> filter_wm`` (equality DROPS — probed with the watermark
  landing exactly on an hour boundary). The one-batch filter lag can
  never resurrect evicted window state: eviction at the end of batch
  N-1 uses wm_used(N-1) == filter_wm(N), so any row passing the
  filter belongs to a window that was never evicted.

Why these rules bound state at 100 TB: eviction keys off wm_used, so
dedup state holds only keys within the delay horizon and agg state
only unexpired windows — the filter lag admits one extra batch of
late rows but never reopens closed state.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from .conftest import sweep_examples
from pyspark.sql import functions as F
from pyspark.sql import types as T

WM_DELAY_S = 600  # the streams' default "10 minutes"
_H = (1_700_000_000 // 3600) * 3600  # hour-aligned base

_name_seq = iter(range(10**9))


# ----------------------------------------------------------- corpus


@st.composite
def late_chunks(draw):
    """Chunks of events with genuine lateness: rows displaced to later
    chunks than their event-time order, deltas on the 600/3600-second
    grid so filter/eviction boundaries are hit exactly, plus same-ts
    replayed duplicates for the dedup stream."""
    n_chunks = draw(st.integers(3, 5))
    events = []
    eid = 0
    for uid in (1, 2):
        sec = _H + draw(st.integers(0, 2)) * 600
        for _ in range(draw(st.integers(3, 8))):
            events.append(
                {
                    "event_id": eid,
                    "sec": sec,
                    "user_id": uid,
                    "event_type": draw(
                        st.sampled_from(["click", "view", "purchase"])
                    ),
                    "value": float(draw(st.integers(0, 9))),
                }
            )
            eid += 1
            sec += draw(
                st.sampled_from([0, 1, 599, 600, 601, 3599, 3600, 7200])
            )
    events.sort(key=lambda e: (e["sec"], e["event_id"]))
    chunks: list[list[dict]] = [[] for _ in range(n_chunks)]
    for i, e in enumerate(events):
        base = i * n_chunks // len(events)
        disp = draw(st.sampled_from([0, 0, 0, 1, 2]))  # displaced = late
        chunks[min(base + disp, n_chunks - 1)].append(e)
    # same-ts duplicate replays, possibly many batches later
    for idx in sorted(draw(st.sets(st.integers(0, 199), max_size=4))):
        e = events[idx % len(events)]
        chunks[draw(st.integers(0, n_chunks - 1))].append(dict(e))
    return [c for c in chunks if c]


def _write_chunk_files(tmp_path, chunks) -> str:
    d = tmp_path / "stream_in"
    d.mkdir()
    for i, chunk in enumerate(chunks):
        table = pa.table(
            {
                "event_id": pa.array(
                    [e["event_id"] for e in chunk], pa.int64()
                ),
                "ts": pa.array(
                    [e["sec"] * 1_000_000 for e in chunk],
                    pa.timestamp("us", tz="UTC"),
                ),
                "user_id": pa.array([e["user_id"] for e in chunk], pa.int64()),
                "event_type": pa.array(
                    [e["event_type"] for e in chunk], pa.string()
                ),
                "value": pa.array([e["value"] for e in chunk], pa.float64()),
                "props": pa.array([None] * len(chunk), pa.string()),
            }
        )
        path = d / f"chunk{i:03d}.parquet"
        pq.write_table(table, path)
        os.utime(path, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
    return str(d)


def _read_chunked_stream(spark, path):
    from eecs_485___mapreduce_spark.streaming.events import _events_schema

    return (
        spark.readStream.schema(_events_schema(T.TimestampType()))
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(path)
    )


# ------------------------------------------------------------ model


def _filter_wms(chunks) -> list[int]:
    """filter_wm per batch: the watermark used for LATE-ROW filtering
    in batch N = the eviction watermark of batch N-1 = max event time
    through batch N-2, minus delay (floored at 'no watermark')."""
    maxes = []
    run = None
    for c in chunks:
        m = max(e["sec"] for e in c)
        run = m if run is None else max(run, m)
        maxes.append(run)
    out = []
    for n in range(len(chunks)):
        out.append(maxes[n - 2] - WM_DELAY_S if n >= 2 else None)
    return out


def _model_dedup(chunks):
    """Keys emitted by dropDuplicatesWithinWatermark: first batch
    containing the key, kept iff ts > that batch's filter_wm."""
    fwm = _filter_wms(chunks)
    emitted = {}
    seen = set()
    for n, c in enumerate(chunks):
        for e in c:
            if e["event_id"] in seen:
                continue
            seen.add(e["event_id"])
            if fwm[n] is None or e["sec"] > fwm[n]:
                emitted[e["event_id"]] = e["sec"]
    return emitted


def _model_windowed(chunks, width_s: int, slide_s: int):
    """(win_start, event_type) -> [n, total_value] over rows whose
    window END > the row's batch filter_wm (None = no watermark yet).
    Replayed duplicates are aggregated like any row — the agg stream
    has no dedup."""
    fwm = _filter_wms(chunks)
    agg: dict[tuple[int, str], list[float]] = {}
    for n, c in enumerate(chunks):
        for e in c:
            first_ws = ((e["sec"] - width_s) // slide_s + 1) * slide_s
            last_ws = (e["sec"] // slide_s) * slide_s
            for ws in range(first_ws, last_ws + 1, slide_s):
                if fwm[n] is not None and ws + width_s <= fwm[n]:
                    continue
                cell = agg.setdefault((ws, e["event_type"]), [0, 0.0])
                cell[0] += 1
                cell[1] += e["value"]
    return {k: (v[0], v[1]) for k, v in agg.items()}


def _last_emissions(spark, name, start_col):
    """Per (window, type): the emission with the highest n (update
    mode re-emits a key each time it grows; the last is the total)."""
    rows = (
        spark.table(name)
        .select(
            F.unix_timestamp(start_col).alias("ws"),
            "event_type",
            "n",
            "total_value",
        )
        .collect()
    )
    got = {}
    for r in rows:
        k = (r.ws, r.event_type)
        if k not in got or r.n > got[k][0]:
            got[k] = (r.n, r.total_value)
    return got


_SWEEP = settings(
    max_examples=sweep_examples(12, 3),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# the engine-probe scenarios, pinned: a 6599-s-late new key emitted
# under the one-batch filter lag, then boundary keys at exactly the
# filter watermark (dropped), one second below (dropped), one above
# (kept), plus a replay of an evicted key (never re-emitted).
_PIN_DEDUP = [
    [{"event_id": 1, "sec": _H, "user_id": 1, "event_type": "view",
      "value": 1.0},
     {"event_id": 2, "sec": _H + 7200, "user_id": 1, "event_type": "view",
      "value": 1.0}],
    [{"event_id": 9, "sec": _H + 1, "user_id": 1, "event_type": "view",
      "value": 1.0}],
    [{"event_id": 4, "sec": _H + 6599, "user_id": 1, "event_type": "view",
      "value": 1.0},
     {"event_id": 5, "sec": _H + 6600, "user_id": 1, "event_type": "view",
      "value": 1.0},
     {"event_id": 6, "sec": _H + 6601, "user_id": 1, "event_type": "view",
      "value": 1.0},
     {"event_id": 1, "sec": _H, "user_id": 1, "event_type": "view",
      "value": 1.0}],
]

# window END landing exactly on the filter watermark: dropped
_PIN_AGG = [
    [{"event_id": 1, "sec": _H, "user_id": 1, "event_type": "view",
      "value": 1.0},
     {"event_id": 2, "sec": _H + 4200, "user_id": 1, "event_type": "view",
      "value": 1.0}],
    [{"event_id": 3, "sec": _H + 4200, "user_id": 1, "event_type": "view",
      "value": 1.0}],
    [{"event_id": 4, "sec": _H + 3599, "user_id": 1, "event_type": "view",
      "value": 1.0}],
]


@given(chunks=late_chunks())
@example(chunks=_PIN_DEDUP)
@_SWEEP
def test_dedup_stream_late_arrivals_match_model(
    spark, tmp_path_factory, chunks
):
    from eecs_485___mapreduce_spark.streaming.events import (
        dedup_events_stream,
        run_stream_to_memory,
    )

    path = _write_chunk_files(tmp_path_factory.mktemp("wmlate"), chunks)
    name = f"wmlate_{next(_name_seq)}"
    run_stream_to_memory(
        dedup_events_stream(_read_chunked_stream(spark, path)),
        name,
        output_mode="append",
    )
    got = {
        r.event_id: int(r.ts.timestamp())
        for r in spark.table(name).select("event_id", "ts").collect()
    }
    assert got == _model_dedup(chunks)


@given(chunks=late_chunks())
@example(chunks=_PIN_AGG)
@_SWEEP
def test_hourly_rollup_late_arrivals_match_model(
    spark, tmp_path_factory, chunks
):
    from eecs_485___mapreduce_spark.streaming.events import (
        hourly_rollup_stream,
        run_stream_to_memory,
    )

    path = _write_chunk_files(tmp_path_factory.mktemp("wmlateh"), chunks)
    name = f"wmlateh_{next(_name_seq)}"
    run_stream_to_memory(
        hourly_rollup_stream(_read_chunked_stream(spark, path)),
        name,
        output_mode="update",
    )
    got = _last_emissions(spark, name, "hour")
    want = _model_windowed(chunks, 3600, 3600)
    assert got == want


@given(chunks=late_chunks())
@_SWEEP
def test_sliding_rollup_late_arrivals_match_model(
    spark, tmp_path_factory, chunks
):
    from eecs_485___mapreduce_spark.streaming.events import (
        run_stream_to_memory,
        sliding_rollup_stream,
    )

    path = _write_chunk_files(tmp_path_factory.mktemp("wmlates"), chunks)
    name = f"wmlates_{next(_name_seq)}"
    run_stream_to_memory(
        sliding_rollup_stream(_read_chunked_stream(spark, path)),
        name,
        output_mode="update",
    )
    got = _last_emissions(spark, name, "win_start")
    want = _model_windowed(chunks, 3600, 900)
    assert got == want
