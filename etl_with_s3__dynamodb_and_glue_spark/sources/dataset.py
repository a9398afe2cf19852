"""Curated-dataset writer: the layout decisions that make a 100 TB
table cheap to read later.

``df.write.parquet(path)`` at scale produces the two classic failure
modes: thousands of tiny files (one per task per partition value) and
unclustered data (every later range scan reads everything). This
writer fixes the layout at land time:

- **Hive partitioning** on low-cardinality columns → partition pruning
  for free on every later read (the serving pattern of SURVEY.md §3
  entry point 3).
- **Range-clustering** inside partitions: ``repartitionByRange`` on
  the sort key bounds files per partition-value and gives min/max
  parquet row-group statistics real pruning power (a time-range scan
  over a date-partitioned, ts-clustered table touches only matching
  row groups).
- **zstd** — better ratio than the snappy default at similar decode
  cost; at 100 TB the storage/network delta dominates.

The reference's only layout decision is "CSV files in a folder"
(reference glue_job.py:51-53); everything here is what that leaves on
the table.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import threading
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame


def write_dataset(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    cluster_by: Sequence[str] = (),
    target_files: int = 32,
    compression: str = "zstd",
    mode: str = "overwrite",
) -> None:
    """Land ``df`` as a partitioned, range-clustered parquet dataset.

    ``cluster_by`` drives both the pre-write range shuffle and a
    within-partition sort, so parquet row-group min/max stats line up
    with the expected scan predicates. ``target_files`` is the total
    range-slice count across the dataset — size it as
    ``dataset_bytes / desired_file_bytes`` (desired ≈ 128 MB-1 GB),
    not by task count; a range slice usually spans one partition value,
    so file counts stay decoupled from write parallelism.
    """
    out = df
    if cluster_by:
        keys = [df[c] for c in (*partition_by, *cluster_by)]
        out = df.repartitionByRange(
            max(target_files, 1), *keys
        ).sortWithinPartitions(*[df[c] for c in cluster_by])
    writer = out.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


# --- build-once derived datasets -----------------------------------------

# Process-lifetime registry of built derived datasets (IVF indexes,
# serving layouts). Keyed on the INPUT files' identity (path, mtime,
# size), not just their path, so a changed input triggers a rebuild
# instead of serving a stale artifact. The on-disk artifacts are
# session-independent: they survive SparkSession restarts within one
# process and are removed at interpreter exit.
_DERIVED_DIRS: dict[tuple, str] = {}
_DERIVED_LOCK = threading.Lock()


def _input_fingerprint(path: str) -> tuple:
    st = os.stat(path)
    return (path, int(st.st_mtime_ns), st.st_size)


def ensure_derived_dataset(
    kind: str,
    input_paths: Sequence[str],
    build: Callable[[str], None],
) -> str:
    """Build-once/read-many accessor for an on-disk derived dataset.

    ``build(path)`` materializes the artifact into a fresh temp dir;
    the dir is cached for the life of the process under a key that
    includes each input's (path, mtime, size) — the cheap O(1) staleness
    check a real deployment would replace with a catalog snapshot id.
    The build runs under a lock (concurrent callers wait, exactly one
    builds) and every built dir is registered for removal at exit.
    """
    key = (kind, *map(_input_fingerprint, input_paths))
    with _DERIVED_LOCK:
        path = _DERIVED_DIRS.get(key)
        if path is None:
            path = tempfile.mkdtemp(prefix=f"{kind}_")
            atexit.register(shutil.rmtree, path, ignore_errors=True)
            try:
                build(path)
            except BaseException:
                shutil.rmtree(path, ignore_errors=True)
                raise
            _DERIVED_DIRS[key] = path
    return path


def write_sized_parquet(
    df: DataFrame,
    path: str,
    max_records_per_file: int | None = None,
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
    dynamic_overwrite: bool = False,
) -> None:
    """Write parquet with RUNTIME-sized files — the AQE companion to
    :func:`write_dataset` for when there is no clustering key and no
    good a-priori ``target_files`` estimate (intermediate hand-offs,
    un-profiled inputs):

    - the ``rebalance`` hint inserts a shuffle whose output partitions
      AQE coalesces to ``advisoryPartitionSizeInBytes`` and skew-splits
      when oversized — write-task sizing comes from runtime statistics
      instead of a static count;
    - ``maxRecordsPerFile`` bounds the large end within a task.

    ``partition_by`` columns are both the directory partitioning and
    the rebalance keys, so each output directory is written by tasks
    holding only its rows (without this, every task can hold rows of
    every partition value and sprays a small file into each directory
    it touches). Prefer :func:`write_dataset` for curated final tables
    where a clustering key gives row-group pruning on later scans.
    """
    balanced = df.hint("rebalance", *partition_by) if partition_by else df.hint(
        "rebalance"
    )
    writer = balanced.write.mode(mode)
    if dynamic_overwrite:
        # replace only the partitions this write produces rows for —
        # required by in-place maintenance (compaction, keyed merges);
        # static overwrite would drop every untouched partition
        writer = writer.option("partitionOverwriteMode", "dynamic")
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
