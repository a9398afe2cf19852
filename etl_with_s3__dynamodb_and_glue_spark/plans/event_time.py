"""Event-time queries over the events fact: gap sessionization and
tumbling-window aggregation — the batch twins of the streaming
operators (streaming/stateful.py, streaming/file_pipeline.py), so the
DuckDB oracle can value-check the semantics the streaming paths share.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.sessions import sessionize
from ..sources.readers import read_events


def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-min-gap sessions per user (declarative batch path)."""
    return sessionize(read_events(spark, sf_dir), gap_seconds=1800).orderBy(
        "user_id", "session_seq"
    )


USER_SESSIONS_SQL = """
WITH o AS (
  SELECT user_id, ts, event_id, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
m AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                   OR epoch_us(ts) - epoch_us(prev_ts) > 1800 * 1000000
                 THEN 1 ELSE 0 END AS is_new
  FROM o
),
s AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM m
)
SELECT user_id,
       CAST(session_seq AS INTEGER) AS session_seq,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 6) AS total_value
FROM s
GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
"""


def events_daily_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-day tumbling event-time window per event_type — the exact
    grouping the streaming variant uses (``F.window`` is the same
    expression in batch and streaming plans)."""
    ev = read_events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("day", "event_type")
    )


EVENTS_DAILY_TUMBLING_SQL = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 6) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY day, event_type
"""


QUERIES = {
    "user_sessions": user_sessions,
    "events_daily_tumbling": events_daily_tumbling,
}

ORACLE = {
    "user_sessions": USER_SESSIONS_SQL,
    "events_daily_tumbling": EVENTS_DAILY_TUMBLING_SQL,
}
