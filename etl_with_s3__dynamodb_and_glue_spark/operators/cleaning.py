"""Row-cleaning operators (SURVEY.md §2.2 P6/P7, §2.6 D1).

All three are single Catalyst primitives — they stay inside
whole-stage codegen and push down to the scan where possible.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

NUMERIC_RE = r"^[0-9]+(\.[0-9]+)?$"


def drop_null_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """P6: drop rows with nulls in any key column
    (reference glue_job.py:60,62 — df.dropna(subset=...))."""
    return df.na.drop(subset=list(keys))


def dedup_by_key(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[str] | None = None
) -> DataFrame:
    """D1: keep one row per key.

    With ``order_by=None`` this is the reference-faithful
    ``dropDuplicates(keys)`` (arbitrary survivor, reference
    glue_job.py:61). Passing ``order_by`` picks a deterministic survivor
    (first row under that ordering) — required for oracle-checkable
    results (SURVEY.md §2.6) and generally for reproducible pipelines.

    At scale both shapes are one hash-shuffle on ``keys``; the
    deterministic variant materializes as Window + filter which Spark
    ≥3.5 rewrites to WindowGroupLimit (top-1 per key, no full sort
    materialization).
    """
    if order_by is None:
        return df.dropDuplicates(list(keys))
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def filter_not_numeric(df: DataFrame, column: str) -> DataFrame:
    """P7: remove rows whose ``column`` is a purely numeric string
    (reference glue_job.py:83).

    NULL-semantics note (SURVEY.md P7): ``rlike`` on NULL yields NULL,
    ``~NULL`` is NULL, and a NULL predicate drops the row — so this
    also removes NULL values of ``column``, which is what silently
    turns the reference's left join into an inner join downstream.
    Preserved exactly.
    """
    return df.filter(~F.col(column).rlike(NUMERIC_RE))
