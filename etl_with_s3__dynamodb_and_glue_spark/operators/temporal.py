"""Temporal joins Spark lacks as built-ins: as-of join and range
(interval) join — both implemented as shuffle-lean DataFrame
compositions, per the task pattern (a) "composition of existing
DataFrame ops" (no Pandas fallback needed).

Scale design:

- **As-of join = union + window, not a join.** The classic merge_asof
  degenerates to a non-equi join (BroadcastNestedLoop in stock Spark —
  quadratic). Instead: tag both sides, UNION ALL, one window partitioned
  by key ordered by time, and carry the right side's payload forward
  with ``last_value(ignoreNulls)``. ONE shuffle on the key, linear in
  rows, no pair explosion, AQE-skew-safe. This is the standard
  log-merge formulation of point-in-time joins.
- **Range join = bucketed equi-join.** A raw ``BETWEEN`` predicate is
  again a nested-loop in stock Spark. Quantize time into buckets of
  the window width, explode each left row to the (≤2) buckets its
  window spans, equi-join on (key, bucket) — hash join, shuffle on
  (key, bucket) — then re-apply the exact range predicate. Candidate
  fan-out is bounded by window/bucket ratio, not table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_payload: list[str],
    strict: bool = False,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the payload of the latest right row
    with the same key and ``right_time <= left_time`` (``<`` when
    ``strict``). Left rows with no prior right row keep nulls
    (left-outer as-of semantics).

    ``tolerance_seconds`` bounds staleness (pandas ``merge_asof``'s
    ``tolerance``): a match older than the bound nulls out, exactly as
    if no prior row existed — "the last quote, but only if it's fresh
    enough". Implemented by carrying the matched right TIME alongside
    the payload through the same window (no extra shuffle) and
    masking on the age.

    Ties on ``right_time`` within a key must be pre-resolved by the
    caller (dedup the right side) for deterministic output.
    """
    lcols = left.columns
    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).cast("timestamp").alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_payload],
        F.lit(None).cast("timestamp").alias("_r_time"),
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).cast("timestamp").alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in right_payload],
        F.col(right_time).cast("timestamp").alias("_r_time"),
    )
    merged = l_tagged.unionByName(r_tagged)
    # Right rows sort before left rows at equal time iff matching is
    # inclusive (<=): last_value at a left row then sees the tied right
    # row. Strict mode flips the tiebreak so it doesn't.
    tiebreak = F.col("_is_left").asc() if not strict else F.col("_is_left").desc()
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in right_payload
        ],
        F.last("_r_time", ignorenulls=True).over(w).alias("_asof_time"),
    )
    fresh = F.lit(True)
    if tolerance_seconds is not None:
        age = F.col("_t").cast("double") - F.col("_asof_time").cast("double")
        fresh = age <= F.lit(float(tolerance_seconds))
    return carried.filter(F.col("_is_left") == 1).select(
        *lcols,
        *[
            F.when(fresh, F.col(f"_asof_{c}")).alias(c)
            for c in right_payload
        ],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    lower_seconds: int,
    upper_seconds: int,
) -> DataFrame:
    """Pairs (l, r) sharing ``on`` with
    ``l.left_time + lower < r.right_time <= l.left_time + upper``.

    Returns left columns + right columns (caller projects/aggregates).
    Bucket width = the window span, so each left row explodes to at
    most 2 buckets.
    """
    span = upper_seconds - lower_seconds
    if span <= 0:
        raise ValueError("upper_seconds must exceed lower_seconds")
    l_us = F.unix_micros(F.col(left_time).cast("timestamp"))
    r_us = F.unix_micros(F.col(right_time).cast("timestamp"))
    bucket_us = span * 1_000_000

    lo = l_us + lower_seconds * 1_000_000
    hi = l_us + upper_seconds * 1_000_000
    l_bucketed = left.withColumn(
        "_b", F.explode(F.sequence(F.floor(lo / bucket_us), F.floor(hi / bucket_us)))
    )
    r_bucketed = right.withColumn("_b", F.floor(r_us / bucket_us))
    joined = l_bucketed.join(
        r_bucketed,
        [
            l_bucketed["_b"] == r_bucketed["_b"],
            l_bucketed[on] == r_bucketed[on],
        ],
    )
    lt = F.unix_micros(l_bucketed[left_time].cast("timestamp"))
    rt = F.unix_micros(r_bucketed[right_time].cast("timestamp"))
    return (
        joined.filter(
            (rt > lt + lower_seconds * 1_000_000)
            & (rt <= lt + upper_seconds * 1_000_000)
        )
        .drop(l_bucketed["_b"])
        .drop(r_bucketed["_b"])
        .drop(r_bucketed[on])
    )


def point_in_time_join(
    facts: DataFrame,
    history: DataFrame,
    key_cols: list[str],
    ts_col: str,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
) -> DataFrame:
    """Point-in-time-correct dimension join: attach to each fact the
    SCD2 version that was valid AT the fact's timestamp
    (``valid_from <= ts < valid_to``, open-ended current versions
    have NULL ``valid_to``).

    The temporal-correctness join every feature store runs: joining
    facts to the CURRENT dimension leaks future attribute values into
    historical training rows; joining to the full history without the
    validity predicate duplicates facts. This is the third temporal
    join next to as-of (nearest earlier event) and range (interval
    containment) — here the right side is a VERSIONED dimension whose
    intervals partition time per key, so each fact matches at most
    one version.

    Plan: one equi-join on the key (the only shuffle) with the
    validity range as a residual join predicate — version counts per
    key are small (bounded by update frequency), so the residual
    filter runs over a few rows per fact, never a time-bucket
    explosion. LEFT semantics: facts with no valid version (before
    the key existed) keep NULL attributes.
    """
    h = history
    for k in key_cols:
        h = h.withColumnRenamed(k, f"_h_{k}")
    cond = None
    for k in key_cols:
        c = facts[k] == h[f"_h_{k}"]
        cond = c if cond is None else cond & c
    cond = (
        cond
        & (facts[ts_col] >= h[valid_from_col])
        & (h[valid_to_col].isNull() | (facts[ts_col] < h[valid_to_col]))
    )
    return facts.join(h, cond, "left").drop(*[f"_h_{k}" for k in key_cols])
