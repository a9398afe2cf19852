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
    by the key itself would keep the hot key together).

    ``how`` is restricted to joins that never preserve unmatched
    small-side rows: the small side is replicated once per salt value,
    so any small-side-preserving join ('right', 'full') would emit
    each unmatched small-side row ``salt`` times."""
    if salt < 2:
        raise ValueError("salt must be >= 2")
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: the small side is "
            "replicated per salt value, so small-side-preserving joins "
            "would duplicate unmatched small-side rows. Use one of "
            "inner/left/left_semi/left_anti."
        )
    skew_salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt)
    ).cast("int")
    left = skewed.withColumn("_salt", skew_salt)
    right = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return left.join(right, [*on, "_salt"], how).drop("_salt")


def null_bypass_left_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
) -> DataFrame:
    """Left join with NULL-key rows routed AROUND the shuffle.

    The quiet skew killer: every NULL join key hashes to the same
    shuffle partition, so a fact table with 20% unmatched/NULL keys
    concentrates 20% of its rows in one task. But NULL keys can never
    equi-join anyway — a plain left join just emits them with NULL
    payload after dragging them through the exchange. Splitting them
    out FIRST (cheap per-row filter at the scan) and unioning them
    back with NULL payload columns is result-identical and removes the
    hot partition entirely.

    AQE's skew splitting cannot help here: it subdivides by size but
    every sub-partition of the NULL bucket still lands in the same
    sort-merge group.
    """
    keys_nonnull = F.lit(True)
    for k in on:
        keys_nonnull = keys_nonnull & F.col(k).isNotNull()
    matched = left.filter(keys_nonnull).join(right, on, "left")
    payload = [c for c in right.columns if c not in on]
    bypass = left.filter(~keys_nonnull).select(
        "*", *[F.lit(None).cast(dict(right.dtypes)[c]).alias(c) for c in payload]
    )
    return matched.unionByName(bypass)
