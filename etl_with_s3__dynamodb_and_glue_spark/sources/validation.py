"""Data-quality gates, re-expressed in-engine.

The reference validates in the orchestrator: an S3 listing must be
non-empty (reference dag.py:59-95) and each CSV must contain a required
column subset, checked via a pandas read (reference dag.py:114-137).
Here both gates operate on the DataFrame itself — no second read of the
data, no pandas in the data plane. Column checks are metadata-only
(``df.columns``); emptiness checks use ``isEmpty()`` which stops at the
first row found.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame


class ValidationError(ValueError):
    """Raised when a pipeline gate fails (engine fails loudly; the
    reference's swallow-and-report-success behavior — glue_job.py:136-142
    — is a documented defect we do not reproduce, SURVEY.md C5)."""


def require_columns(df: DataFrame, required: Iterable[str], table: str = "<df>") -> DataFrame:
    """Subset-semantics column contract (reference dag.py:133-137):
    required ⊆ actual; extra columns are permitted."""
    missing = set(required) - set(df.columns)
    if missing:
        raise ValidationError(f"{table}: missing required columns {sorted(missing)}")
    return df


def require_csv_columns(spark, path: str, required: Iterable[str], table: str = "<csv>"):
    """Header-level contract check for raw CSV inputs (reference
    dag.py:114-137, which pandas-reads each file to compare columns).

    A schema-enforced read always carries every declared column, so
    the contract must be checked against the file's ACTUAL header: a
    header-only schemaless read (no inferSchema — Spark only scans for
    column names, not types) gives exactly that, without pandas and
    without a second full pass over the data.
    """
    try:
        actual = spark.read.option("header", True).csv(path).columns
    except Exception as exc:  # Spark raises UNABLE_TO_INFER_SCHEMA on no files
        raise ValidationError(f"{table}: no readable CSV files at {path}") from exc
    missing = set(required) - set(actual)
    if missing:
        raise ValidationError(f"{table}: missing required columns {sorted(missing)}")


def require_nonempty(df: DataFrame, table: str = "<df>") -> DataFrame:
    """Fail-fast on empty input (reference dag.py:82-84)."""
    if df.isEmpty():
        raise ValidationError(f"{table}: input is empty")
    return df
