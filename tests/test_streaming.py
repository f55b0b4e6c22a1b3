"""Structured Streaming: bounded availableNow drains must agree with
the batch twins (which carry the DuckDB oracles)."""

from __future__ import annotations

from eecs_485___mapreduce_spark.queries.timeseries import events_hourly
from eecs_485___mapreduce_spark.streaming import (
    dedup_events_stream,
    hourly_rollup_stream,
    read_events_stream,
    run_stream_to_memory,
)

from .conftest import SF_SMALL, normalize


def test_hourly_rollup_stream_equals_batch(spark):
    stream = read_events_stream(spark, SF_SMALL)
    rollup = hourly_rollup_stream(stream)
    run_stream_to_memory(rollup, "rollup_test", output_mode="complete")
    got = spark.sql("SELECT * FROM rollup_test")
    want = events_hourly(spark, SF_SMALL)
    assert sorted(got.columns) == sorted(want.columns)
    assert normalize([tuple(r) for r in got.collect()], got.columns) == normalize(
        [tuple(r) for r in want.collect()], want.columns
    )


def test_dedup_stream_within_watermark(spark):
    stream = read_events_stream(spark, SF_SMALL)
    deduped = dedup_events_stream(stream)
    run_stream_to_memory(deduped, "dedup_test", output_mode="append")
    got = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM dedup_test")
    row = got.collect()[0]
    # event_ids are unique in the source; dedup must be lossless here
    # and emit each id exactly once.
    assert row.n == row.d
    assert row.n == spark.read.parquet(f"{SF_SMALL}/events.parquet").count()
