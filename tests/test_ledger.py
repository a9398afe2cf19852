"""Processed-file ledger: incremental selection, rewrite detection,
re-commit safety."""

from __future__ import annotations

import os

from etl_with_s3__dynamodb_and_glue_spark.sources.ledger import (
    commit_files,
    ledger_table,
    new_files,
)


def _write(path, text):
    with open(path, "w") as f:
        f.write(text)


def test_ledger_incremental_episodes(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    ledger = str(tmp_path / "ledger")
    a, b = str(src / "a.csv"), str(src / "b.csv")
    _write(a, "x\n1\n")
    _write(b, "x\n2\n")

    first = new_files(spark, str(src), ledger)
    assert first == [a, b]
    commit_files(spark, ledger, first, "batch-1")
    assert new_files(spark, str(src), ledger) == []

    c = str(src / "c.csv")
    _write(c, "x\n3\n")
    second = new_files(spark, str(src), ledger)
    assert second == [c]
    commit_files(spark, ledger, second, "batch-2")
    assert new_files(spark, str(src), ledger) == []

    audit = {r.path: r.batch_label for r in ledger_table(spark, ledger).collect()}
    assert audit == {a: "batch-1", b: "batch-1", c: "batch-2"}


def test_ledger_rewritten_file_reprocesses(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    ledger = str(tmp_path / "ledger")
    a = str(src / "a.csv")
    _write(a, "x\n1\n")
    commit_files(spark, ledger, new_files(spark, str(src), ledger), "b1")
    assert new_files(spark, str(src), ledger) == []
    # rewrite with different content/size → new identity
    _write(a, "x\n1\n2\n")
    assert new_files(spark, str(src), ledger) == [a]


def test_ledger_recommit_is_safe(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    ledger = str(tmp_path / "ledger")
    a = str(src / "a.csv")
    _write(a, "x\n1\n")
    files = new_files(spark, str(src), ledger)
    commit_files(spark, ledger, files, "b1")
    commit_files(spark, ledger, files, "b1")  # crash-retry double commit
    assert new_files(spark, str(src), ledger) == []
    assert ledger_table(spark, ledger).count() == 1
