"""Window / top-k operators (SURVEY.md §2.5 W1/W2, §2.6 K1).

The per-group top-k pattern: row_number over (PARTITION BY group ORDER
BY metric DESC) then rank <= k (reference glue_job.py:89-92). Spark
≥3.5 rewrites the filtered window to WindowGroupLimitExec, which keeps
only k rows per group inside each partial sort — the property that
makes this viable on 100 TB (no full per-group materialization).

Q4 (SURVEY.md): row_number over a tie-heavy ORDER BY is
nondeterministic; callers pass ``tie_breakers`` to pin results (the
declared oracle queries always do).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def ranked_desc(metric: str, tie_breakers: Sequence[str] = ()) -> list[Column]:
    """ORDER BY metric DESC, then ascending tie-breakers."""
    return [F.col(metric).desc(), *[F.col(c).asc() for c in tie_breakers]]
