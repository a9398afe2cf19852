"""Skew mitigation: salted join.

AQE's skew-join splitting (on by default, session.py) handles most
skew at the sort-merge layer by subdividing oversized partitions. The
salted join is the explicit fallback for the case AQE can't fix:
a *single* join key so hot that even one key's rows exceed an
executor — e.g. joining a clickstream against a dimension where 30%
of rows share one key.

Mechanics: the skewed (large) side gets a deterministic salt in
[0, salt); the small side is replicated once per salt value; the join
key becomes (key, salt), spreading the hot key over ``salt``
partitions. Replication multiplies the small side by ``salt`` — use
only when the small side times salt is still comfortably shuffle-able
(else broadcast it and no salting is needed at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join ``skewed ⋈ small`` on ``on`` with the hot-key rows of
    the skewed side spread across ``salt`` sub-partitions.

    The salt is derived from the skewed side's full row hash —
    deterministic, uniform, and independent of the join key (salting
    by the key itself would keep the hot key together)."""
    if salt < 2:
        raise ValueError("salt must be >= 2")
    skew_salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt)
    ).cast("int")
    left = skewed.withColumn("_salt", skew_salt)
    right = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return left.join(right, [*on, "_salt"], how).drop("_salt")
