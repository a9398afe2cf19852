"""Processed-file ledger: incremental batch ingestion bookkeeping.

The reference marks stream files "done" by MOVING them to an archive
prefix (reference dag.py:168-229) — destructive bookkeeping that
makes replays and audits awkward. Structured Streaming's file-source
checkpoint is the right tool for continuous ingestion
(streaming/file_pipeline.py); this ledger is the BATCH counterpart
for backfills and scheduled loads: a human-inspectable parquet
manifest of what was processed, with inputs left in place.

Identity is (path, mtime, size) — a rewritten file re-processes, an
untouched one never does. The ledger is append-only; readers collapse
duplicates, so a crash between process and commit simply reprocesses
that batch (choose idempotent sinks — the upsert/merge family — and
at-least-once becomes exactly-once at the table level, the same
argument as streaming/state_table.py). Listing and diffing are pure
metadata; no data is scanned to decide what's new.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

LEDGER_SCHEMA = "path string, mtime_ns long, size long, batch_label string"


def _file_identity(path: str) -> tuple[str, int, int]:
    st = os.stat(path)
    return (path, st.st_mtime_ns, st.st_size)


def list_input_files(input_dir: str, suffix: str = ".csv") -> list[tuple[str, int, int]]:
    out = []
    for name in sorted(os.listdir(input_dir)):
        if name.endswith(suffix) and not name.startswith("_"):
            out.append(_file_identity(os.path.join(input_dir, name)))
    return out


def processed_set(spark: SparkSession, ledger_dir: str) -> set[tuple[str, int, int]]:
    if not os.path.isdir(ledger_dir):
        return set()
    rows = spark.read.schema(LEDGER_SCHEMA).parquet(ledger_dir).collect()
    return {(r.path, r.mtime_ns, r.size) for r in rows}


def new_files(
    spark: SparkSession, input_dir: str, ledger_dir: str, suffix: str = ".csv"
) -> list[str]:
    """Paths in ``input_dir`` not yet recorded (by identity, so a
    rewritten file shows up again)."""
    seen = processed_set(spark, ledger_dir)
    return [p for (p, m, s) in list_input_files(input_dir, suffix) if (p, m, s) not in seen]


def commit_files(
    spark: SparkSession, ledger_dir: str, paths: list[str], batch_label: str
) -> None:
    """Append the processed identities. Safe to re-commit (readers
    collapse duplicates)."""
    if not paths:
        return
    rows = [(_file_identity(p) + (batch_label,)) for p in paths]
    spark.createDataFrame(rows, LEDGER_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(ledger_dir)


def ledger_table(spark: SparkSession, ledger_dir: str) -> DataFrame:
    """The audit view: every processed file with its batch label."""
    return spark.read.schema(LEDGER_SCHEMA).parquet(ledger_dir).distinct()
