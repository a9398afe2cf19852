"""Small-file compaction for landed parquet datasets.

Every long-lived ingest layout degrades the same way: micro-batches,
dynamic-overwrite merges, and backfills each drop a few small files
per partition, and a year later every scan pays thousands of file
opens and the scheduler pays thousands of splits. Compaction is the
standing maintenance job that rewrites fragmented partitions into
right-sized files — the engine-level equivalent of OPTIMIZE in
lakehouse table formats.

Scale shape: the candidate scan is pure METADATA (driver-side listing
of per-partition file counts/bytes — the same information a catalog
or manifest would serve); the rewrite reads ONLY fragmented
partitions (partition-pruned scan) and lands them with dynamic
partition overwrite via ``write_sized_parquet`` (AQE rebalance →
runtime-sized files). Untouched partitions are never read, never
written. Cost is proportional to fragmented-partition bytes, not
dataset size; idempotent (a second run finds nothing to do) and
crash-tolerant the same way the SCD-1 state store is — a partition is
replaced atomically by the committer, and a re-run converges.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import SparkSession, functions as F

from .dataset import write_sized_parquet


@dataclass
class CompactionReport:
    partitions_total: int
    partitions_compacted: int
    files_before: int
    files_after: int
    compacted_values: list[str]


def _partition_files(path: str, partition_col: str) -> dict[str, list[str]]:
    """value → parquet file names, from the hive directory layout."""
    out: dict[str, list[str]] = {}
    prefix = f"{partition_col}="
    for entry in sorted(os.listdir(path)):
        if not entry.startswith(prefix):
            continue
        pdir = os.path.join(path, entry)
        out[entry[len(prefix):]] = [
            f
            for f in sorted(os.listdir(pdir))
            if f.endswith(".parquet")
        ]
    return out


def compact_dataset(
    spark: SparkSession,
    path: str,
    partition_col: str,
    max_files_per_partition: int = 1,
    max_records_per_file: int | None = None,
) -> CompactionReport:
    """Rewrite every partition holding more than
    ``max_files_per_partition`` parquet files into right-sized files.

    Returns a report of what was (and wasn't) touched. The rewrite is
    one Spark job over the union of fragmented partitions — the scan
    carries an ``isin`` filter on the partition column, which prunes
    at the source, and the write only replaces directories it produced
    rows for (dynamic overwrite).
    """
    before = _partition_files(path, partition_col)
    fragmented = sorted(
        v for v, files in before.items() if len(files) > max_files_per_partition
    )
    files_before = sum(len(f) for f in before.values())
    if fragmented:
        df = spark.read.parquet(path)
        # partition values arrive typed from directory discovery;
        # comparing against the string forms matches how Spark prints
        # them, so cast the column for the prune filter
        touched = df.filter(
            F.col(partition_col).cast("string").isin(fragmented)
        )
        write_sized_parquet(
            touched,
            path,
            max_records_per_file=max_records_per_file,
            partition_by=(partition_col,),
            mode="overwrite",
            dynamic_overwrite=True,
        )
    after = _partition_files(path, partition_col)
    return CompactionReport(
        partitions_total=len(before),
        partitions_compacted=len(fragmented),
        files_before=files_before,
        files_after=sum(len(f) for f in after.values()),
        compacted_values=fragmented,
    )
