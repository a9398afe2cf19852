"""Pipeline observability (the reference's structured step logging,
SURVEY.md C6, re-expressed as Spark observation metrics).

``df.observe`` attaches aggregates that are computed DURING the action
that consumes the DataFrame — no extra pass, no extra job, unlike a
``df.count()`` side-check which re-runs the lineage. This is the
scale-safe way to record row counts and data-quality tallies at each
pipeline stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, functions as F


def with_stage_metrics(
    df: DataFrame, null_check_cols: list[str] | None = None
) -> tuple[DataFrame, Observation]:
    """Attach a row count (and per-column null tallies) to a stage.

    Returns the instrumented DataFrame and the Observation; read
    ``observation.get`` AFTER an action has consumed the DataFrame.
    """
    obs = Observation()
    aggs = [F.count(F.lit(1)).alias("rows")]
    for c in null_check_cols or []:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}")
        )
    return df.observe(obs, *aggs), obs
