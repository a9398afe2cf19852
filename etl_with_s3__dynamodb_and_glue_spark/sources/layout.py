"""Output file sizing — the small-files problem at the sink.

At 100 TB the write layout matters as much as the plan: a sink that
inherits the job's task count emits one file per task (thousands of
KB-sized files that crush the next scan's footer/listing cost), while
an unbounded task can emit a multi-GB file that breaks downstream
range-request parallelism. Two independent controls fix both ends:

- ``rebalance`` hint (AQE): inserts a shuffle whose output partitions
  are coalesced to ``spark.sql.adaptive.advisoryPartitionSizeInBytes``
  and skew-split when oversized — the optimizer sizes the write tasks
  from runtime statistics instead of the static partition count.
- ``maxRecordsPerFile``: hard cap per file within a task, bounding the
  upper end even when a single write task is large.

No collect, no count job — sizing decisions stay inside AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_sized_parquet(
    df: DataFrame,
    path: str,
    max_records_per_file: int | None = None,
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Write parquet with runtime-sized files.

    ``partition_by`` columns are both the directory partitioning and
    the rebalance keys, so each output directory is written by tasks
    that hold only its rows (no cross-partition small-file spray —
    without this, every task can hold rows of every partition value
    and emits a file into each directory it touches).
    """
    balanced = df.hint("rebalance", *partition_by) if partition_by else df.hint(
        "rebalance"
    )
    writer = balanced.write.mode(mode)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
