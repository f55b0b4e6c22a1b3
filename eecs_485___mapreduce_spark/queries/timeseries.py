"""Event-stream queries (batch form): time-window rollups and
sessionization. The Structured Streaming versions of these live in
``streaming/``; these batch twins define the semantics and carry the
DuckDB oracles.

Scale: hourly rollup is a partial-agg shuffle on (hour, type) — tiny
output cardinality regardless of input size. Sessionization shuffles
once on user_id; the window frame then runs per-partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import dec, dsum
from ..registry import register
from ..sources import load_table

SESSION_GAP_S = 1800


@register(
    "events_sliding_windows",
    bench=True,
    tags=("datetime", "agg", "streaming-batch"),
    oracle="""
    WITH x AS (SELECT ts, event_type, value, unnest(range(0, 4)) AS k
               FROM events),
    w AS (SELECT time_bucket(INTERVAL 15 MINUTE, ts)
                   - TO_MICROSECONDS(k * 900000000) AS win_start,
                 event_type, value
          FROM x)
    SELECT CAST(win_start AS TIMESTAMP) AS win_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM w GROUP BY 1, 2
    """,
)
def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour windows every 15 minutes per event type (each
    event lands in 4 overlapping windows) — the batch twin of the
    streaming sliding aggregation.

    Scale: the window expansion is a 4x map-side explode of *keys*, not
    data (partial agg collapses before the shuffle); output cardinality
    is windows x types regardless of input size.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "total_value"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n", "total_value")
    )


@register(
    "events_hourly",
    bench=True,
    tags=("datetime", "agg", "streaming-batch"),
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour rollup per event type (batch twin of the
    streaming windowed aggregation in ``streaming.events``)."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), dsum("value", "total_value"))


@register(
    "sessionize_users",
    tags=("window", "streaming-batch"),
    oracle=f"""
    WITH g AS (
      SELECT user_id, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL THEN 0
                  WHEN date_diff('second', lag(ts) OVER w, ts) > {SESSION_GAP_S} THEN 1
                  ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(new_session) + 1 AS BIGINT) AS n_sessions,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM g
    GROUP BY user_id
    """,
)
def sessionize_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity splits a session):
    lag(ts) per user -> session-break flags -> per-user session counts.
    The second-granularity gap matches DuckDB's date_diff('second')
    boundary-count semantics (both floor to epoch seconds)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_session = (
        F.when(F.lag("ts").over(w).isNull(), 0)
        .when(gap_s > SESSION_GAP_S, 1)
        .otherwise(0)
    )
    return (
        events.select("user_id", "event_id", dec("value").alias("value_d"),
                      new_session.alias("new_session"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum("new_session") + 1).cast("bigint").alias("n_sessions"),
            F.sum("value_d").cast("double").alias("total_value"),
        )
    )
