"""Declarative data-quality expectations: the promotion gate between
"the job ran" and "the output is servable".

An expectation is a name + a boolean Column predicate + a violation
budget. Checking ALL rules is ONE aggregate pass over the frame (each
rule contributes one conditional sum — map-side combined, no shuffle
beyond the single global agg), so adding rules costs expressions, not
scans. The report is a tiny long-format frame a gate can persist next
to the data it judged; ``enforce`` turns any over-budget rule into a
loud failure (the reference's validation stance — dag.py:125-137
fails the run on missing columns — generalized to row-level
predicates).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class Expectation:
    name: str
    predicate: Column  # True ⇒ row passes
    max_violations: int = 0


class ExpectationError(ValueError):
    pass


def check_expectations(df: DataFrame, rules: list[Expectation]) -> DataFrame:
    """Long-format report: (rule, n_rows, n_violations, max_violations,
    passed) — one aggregate pass for every rule together."""
    if not rules:
        raise ValueError("no expectations given")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, r in enumerate(rules):
        aggs.append(
            F.sum((~F.coalesce(r.predicate, F.lit(False))).cast("long")).alias(
                f"_v{i}"
            )
        )
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(r.name).alias("rule"),
                F.col("_n").alias("n_rows"),
                F.col(f"_v{i}").alias("n_violations"),
                F.lit(r.max_violations).cast("long").alias("max_violations"),
                (F.col(f"_v{i}") <= r.max_violations).alias("passed"),
            )
            for i, r in enumerate(rules)
        ]
    )
    return wide.select(F.explode(rows).alias("e")).select("e.*")


def enforce(df: DataFrame, rules: list[Expectation]) -> DataFrame:
    """Check and fail loudly: raises :class:`ExpectationError` listing
    every over-budget rule; returns ``df`` unchanged when all pass, so
    it composes as a pipeline stage."""
    failed = [
        (r.rule, r.n_violations, r.max_violations)
        for r in check_expectations(df, rules).collect()
        if not r.passed
    ]
    if failed:
        detail = "; ".join(
            f"{name}: {v} violations (budget {b})" for name, v, b in failed
        )
        raise ExpectationError(f"expectations failed — {detail}")
    return df
