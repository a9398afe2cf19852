"""Gap-based sessionization.

Not present in the reference (its only time bucketing is the derived
``date`` string, glue_job.py:59) — this is engine surface for the
events fact table: group a user's events into sessions separated by
more than ``gap`` of inactivity.

Two implementations with identical semantics:

- :func:`sessionize` — declarative batch: lag + running sum of
  session-start flags + groupBy. Whole-stage-codegen all the way; one
  shuffle on user_id (the window and the final groupBy share the
  partitioning, so Catalyst reuses the exchange).
- ``streaming.stateful.sessionize_stream`` — the streaming counterpart
  via ``applyInPandasWithState``.

Scale: the only shuffle key is ``user_id``; hot users are bounded by
per-user event counts, not table size, and AQE skew-join/salting never
applies because there is no join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

DEFAULT_GAP_SECONDS = 1800


def sessionize(
    events: DataFrame,
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Sessions per user: a new session starts when the gap since the
    previous event exceeds ``gap_seconds``.

    ``id_col`` breaks timestamp ties deterministically (SURVEY.md Q4
    discipline). Output: one row per (user, session_seq) with start,
    end, event count and summed value.

    Accepts TIMESTAMP or TIMESTAMP_NTZ input: ``unix_micros`` requires
    TIMESTAMP, so NTZ is cast first (value-preserving under the UTC
    session zone the readers pin) — the operator must not depend on
    which parquet timestamp flavor the source happened to use.
    """
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    order = [F.col(ts_col).asc(), F.col(id_col).asc()]
    w = Window.partitionBy(user_col).orderBy(*order)
    prev_us = F.lag(ts_us).over(w)
    is_new = (
        prev_us.isNull() | ((ts_us - prev_us) > gap_seconds * 1_000_000)
    ).cast("long")
    running = Window.partitionBy(user_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tagged = events.select(
        F.col(user_col),
        F.col(ts_col),
        F.col(id_col),
        F.col(value_col),
        F.sum(is_new).over(running).alias("session_seq"),
    )
    return (
        tagged.groupBy(user_col, "session_seq")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 6).alias("total_value"),
        )
        .withColumn("session_seq", F.col("session_seq").cast("int"))
    )
