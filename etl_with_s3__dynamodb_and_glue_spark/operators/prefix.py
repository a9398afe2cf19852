"""Distributed prefix aggregation: global running sums without a
single-partition window.

``SUM(x) OVER (ORDER BY ts)`` with no PARTITION BY is the textbook
Spark scale trap: an un-partitioned window frame collapses the whole
table into ONE task — fine at 60k rows, fatal at 10¹¹. The standard
fix is the two-pass prefix-sum:

1. range-partition by the ordering key (a range exchange, the same
   shuffle a global sort pays — partitions are ordered BETWEEN each
   other, rows sorted WITHIN each);
2. per-partition running sum — a window keyed by the stamped
   physical partition id, evaluated in parallel across pids (the
   hash exchange on pid moves each partition wholesale, it never
   concentrates the data);
3. per-partition totals are a ``numPartitions``-row table; their
   exclusive running sum (the only truly sequential step) runs on
   this tiny table and broadcasts back as each partition's offset.

Total cost: one range shuffle + one pid shuffle + one tiny
broadcast — bounded-parallel at every step; no task ever holds more
than its partition. The per-partition totals window IS
single-partition, but over ``numPartitions`` rows, not the dataset.

Correctness subtlety: the range partitioner may split EQUAL ordering
keys across adjacent partitions, so the ordering columns must be a
total order (tie-break to uniqueness — the caller passes e.g.
``(ts, event_id)``). A non-unique order would make "running sum"
ill-defined under parallel evaluation anyway (same reason the
DuckDB oracle needs the tie-break to agree).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def running_sum(
    df: DataFrame,
    value_col: str,
    order_cols: list[str],
    out_col: str = "running_total",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``out_col`` = inclusive running sum of ``value_col`` in
    the global total order given by ``order_cols`` (which must be
    unique per row — tie-break to uniqueness)."""
    from ..caching import unpersist_on_release

    order = [F.col(c) for c in order_cols]
    if num_partitions:
        ranged = df.repartitionByRange(num_partitions, *order)
    else:
        ranged = df.repartitionByRange(*order)
    # PERSIST the pid-stamped frame: spark_partition_id() is only
    # meaningful relative to ONE materialized partitioning, and the
    # range partitioner samples its boundaries — re-evaluating the
    # exchange in the `local` and `totals` subtrees could stamp the
    # same row with different pids and silently corrupt the offsets.
    staged = ranged.withColumn("_pid", F.spark_partition_id()).persist()

    in_part = Window.partitionBy("_pid").orderBy(*order)
    local = staged.withColumn(
        "_local_sum", F.sum(value_col).over(in_part)
    )

    totals = staged.groupBy("_pid").agg(F.sum(value_col).alias("_part_total"))
    # exclusive prefix of the per-partition totals: tiny (numPartitions
    # rows), so the un-partitioned window is safe HERE and only here
    off_w = (
        Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "_pid",
        F.coalesce(F.sum("_part_total").over(off_w), F.lit(0)).alias("_offset"),
    )

    result = (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.col("_local_sum") + F.col("_offset"))
        .drop("_pid", "_local_sum", "_offset")
    )
    return unpersist_on_release(result, staged)


def sweep_concurrency(
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    id_cols: list[str],
    out_col: str = "n_concurrent",
) -> DataFrame:
    """Sweep-line concurrency: for every interval boundary, how many
    intervals are open just after it. The classic
    "peak concurrent sessions" primitive, built on the distributed
    ``running_sum`` (±1 deltas over boundary events) instead of a
    single-partition window.

    End-exclusive semantics: an interval ending at t and another
    starting at t do not overlap — the end event (-1) sorts BEFORE
    the start event (+1) at equal timestamps (delta ascending).

    Output: one row per boundary event with (ts, delta, ``out_col``),
    plus the id columns of the interval that generated the boundary.
    """
    starts = intervals.select(
        *[F.col(c) for c in id_cols],
        F.col(start_col).alias("ts"),
        F.lit(1).alias("delta"),
    )
    ends = intervals.select(
        *[F.col(c) for c in id_cols],
        F.col(end_col).alias("ts"),
        F.lit(-1).alias("delta"),
    )
    events = starts.unionByName(ends)
    # (ts, delta, ids) is a total order as long as (ids, start, end)
    # identify the interval — delta first so ends precede starts
    return running_sum(
        events,
        "delta",
        ["ts", "delta", *id_cols],
        out_col=out_col,
    )
