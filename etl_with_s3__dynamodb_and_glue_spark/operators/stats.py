"""Statistical analysis operators: categorical-independence testing
and correlation structure — the "is this relationship real" layer a
profiling/drift stack sits on (complements operators/profile.py's
per-column stats and psi_drift's distribution monitor).

Both reduce the fact table to a TINY intermediate in one keyed
aggregate (the only wide operation), then finish on that: the
contingency table is |A|×|B| cells, the correlation pass is one
``df.agg`` with every pairwise moment — no second scan, no shuffle
larger than the group-by key space.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame, functions as F


def chi_square_independence(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Pearson χ² test of independence between two categorical
    columns. One (a, b) count aggregate (the only scan/shuffle);
    marginals and the statistic compute on the tiny contingency
    table. The cell sum runs over the FULL |A|×|B| cross product —
    zero-observed cells contribute their expectation (dropping them
    is the classic χ² bug).

    Output (one row): ``chi2``, ``dof``, ``n``.
    """
    obs = df.groupBy(
        F.col(col_a).alias("a"), F.col(col_b).alias("b")
    ).agg(F.count(F.lit(1)).cast("double").alias("n_obs"))
    row_tot = obs.groupBy("a").agg(F.sum("n_obs").alias("na"))
    col_tot = obs.groupBy("b").agg(F.sum("n_obs").alias("nb"))
    total = obs.agg(F.sum("n_obs").alias("t"))

    cells = (
        row_tot.crossJoin(col_tot)
        .join(obs, ["a", "b"], "left")
        .crossJoin(F.broadcast(total))
        .select(
            (
                F.pow(
                    F.coalesce("n_obs", F.lit(0.0))
                    - F.col("na") * F.col("nb") / F.col("t"),
                    2,
                )
                / (F.col("na") * F.col("nb") / F.col("t"))
            ).alias("term")
        )
    )
    dims = row_tot.agg(F.count(F.lit(1)).alias("ka")).crossJoin(
        col_tot.agg(F.count(F.lit(1)).alias("kb"))
    )
    return (
        cells.agg(F.round(F.sum("term"), 6).alias("chi2"))
        .crossJoin(F.broadcast(dims))
        .crossJoin(F.broadcast(total))
        .select(
            "chi2",
            ((F.col("ka") - 1) * (F.col("kb") - 1)).cast("long").alias("dof"),
            F.col("t").cast("long").alias("n"),
        )
    )


def corr_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlations of ``cols`` in ONE aggregate
    pass (every ``F.corr`` co-moment accumulates in the same scan,
    map-side combined), unpivoted to long (col_x, col_y, corr_coef) rows
    for the k(k−1)/2 upper-triangle pairs."""
    pairs = list(combinations(cols, 2))
    wide = df.agg(
        *[
            F.round(F.corr(x, y), 6).alias(f"_c_{i}")
            for i, (x, y) in enumerate(pairs)
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(x).alias("col_x"),
                F.lit(y).alias("col_y"),
                F.col(f"_c_{i}").alias("corr_coef"),
            )
            for i, (x, y) in enumerate(pairs)
        ]
    )
    return wide.select(F.explode(rows).alias("p")).select("p.*")
