"""Bucketed-table layout: the shuffle-elimination tool for 100 TB.

A fact table bucketed (and sorted) by its join/aggregation key is
pre-shuffled ON DISK: every join against a table bucketed the same way
on the same key, and every groupBy on the bucket key, runs with NO
Exchange — at 100 TB that turns the single most expensive stage of a
star join into a map-side operation. This is the engine's answer to
SURVEY.md §7 phase 5 ("partition layout + bucketing on join keys");
the reference has no analog (its Glue job re-shuffles per run —
reference glue_job.py:65-100).

Design rules encoded here:

- Bucket count is fixed at write time and must match across tables
  that join together; choose it so one bucket of the LARGEST table at
  target scale fits an executor's memory (e.g. 100 TB fact / 4096
  buckets ≈ 25 GB per bucket before column pruning).
- ``sortBy`` the bucket key so sort-merge joins skip the sort too.
- Bucketed tables live in the session catalog (``saveAsTable`` — the
  bucketing metadata is catalog-side; a bare ``parquet(path)`` read
  would see plain files and lose the layout guarantee).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Materialize ``df`` as an external bucketed parquet table.

    ``sort_cols`` defaults to the bucket columns — sorted buckets let
    sort-merge joins skip their per-task sorts entirely.

    The pre-write ``repartition`` on the bucket key is load-bearing
    twice over: (1) without it every write task emits a file for every
    bucket it sees (tasks × buckets small files — at 1000 executors a
    catastrophe); (2) the planner only trusts ``sortBy`` order when a
    bucket is a single file, so multi-file buckets silently reinsert
    per-task Sorts under every sort-merge join.
    """
    writer = (
        df.repartition(n_buckets, *[df[c] for c in bucket_cols])
        .write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
    )
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table through the catalog (the only route that
    preserves the bucketing layout for the planner)."""
    return spark.table(table)


def cobucket_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed tables. With matching bucket counts and
    keys the physical plan is a zero-Exchange sort-merge join —
    asserted in tests/test_plan_shapes.py. Per-task Sorts remain
    unless ``spark.sql.legacy.bucketedTableScan.outputOrdering`` is
    enabled (Spark ≥3.0 ignores bucket sort metadata by default,
    SPARK-28595); they sort already-sorted single-bucket runs, so the
    cost is a linear scan, not the shuffle the layout eliminated."""
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), list(on), how
    )
