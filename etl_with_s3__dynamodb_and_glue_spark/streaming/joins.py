"""Stream-stream interval join: correlate two live streams within a
bounded time window (clicks to the views that preceded them, errors to
retries, spans to their parents).

This is the one join shape Structured Streaming can run with BOUNDED
state: the equi-key plus a time-range predicate, with watermarks on
BOTH sides, lets the engine expire buffered rows once the watermark
passes the range bound — state is O(key-rate × window), independent of
stream age. Without the range predicate (or a watermark) the state
grows forever and the query is rejected or OOMs — which is why this
operator bakes both in rather than exposing a raw join.

Batch twin: the same predicate over static frames (operators/
temporal.py::range_join is the bucketed batch shape) — tests assert
stream-vs-batch parity on AvailableNow episodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    lookback: str = "10 minutes",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Rows of ``left`` joined to ``right`` rows with the same ``on``
    key whose ``right_time`` falls in [left_time − lookback,
    left_time]. Works on two streaming frames (bounded state via the
    two watermarks) and identically on static frames (the batch twin —
    watermarks are a no-op there).

    Column names must be disjoint apart from ``on``; the join key is
    emitted once.
    """
    l = left.withWatermark(left_time, watermark_delay).alias("l")
    r = right.withWatermark(right_time, watermark_delay).alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (
            F.col(f"r.{right_time}")
            >= F.col(f"l.{left_time}") - F.expr(f"INTERVAL {lookback}")
        )
        & (F.col(f"r.{right_time}") <= F.col(f"l.{left_time}"))
    )
    out_cols = [F.col(f"l.{on}").alias(on)]
    out_cols += [
        F.col(f"l.{c}") for c in left.columns if c != on
    ]
    out_cols += [
        F.col(f"r.{c}") for c in right.columns if c != on
    ]
    return l.join(r, cond, "inner").select(*out_cols)
