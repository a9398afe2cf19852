"""Upsert / SCD-1 merge: latest-wins reconciliation of a base table
with an update stream, as a single-shuffle declarative plan.

The reference's serving write is an upsert (DynamoDB put_item
overwrites by key — reference glue_job.py:110-132 via the sink's
partition-overwrite semantics); this operator is the BATCH form of the
same contract, generalized to the MERGE shape every warehouse pipeline
needs: given ``base`` (current state) and ``updates`` (new versions of
existing keys + brand-new keys), produce the next state where the
newest version of each key wins.

Plan shape — union + one ``max_by`` keyed aggregate, NOT a join and
NOT a window: tagging each side with a priority and taking the
argmax row per key under (priority, ordering) is a single aggregate
with a PARTIAL (map-side) phase, so each input partition ships at
most one candidate row per key into the one shuffle. The textbook
alternatives both lose at scale: a full-outer join shuffles both
sides in full and then joins; a row_number window also shuffles
every row in full (no map-side reduction) before sorting each
partition. (Spark executes this as SortAggregate — ``max_by``'s
struct-typed buffer is not hash-aggregable — but the sorts are
per-partition and the shuffle-volume reduction is what matters at
100 TB.)

At 100 TB the practical deployment partitions the state table on a
stable key hash (sources/dataset.py::write_dataset) and rewrites only
the partitions that received updates (dynamic partition overwrite) —
the merge plan itself is unchanged; only the sink narrows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def scd1_merge(
    base: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    ordering_col: str | list[str] | None = None,
) -> DataFrame:
    """Latest-wins merge of ``updates`` into ``base``.

    - a key present in both → the updates row wins (ties between
      multiple update rows for one key broken by ``ordering_col``
      descending, which MUST be provided when updates can repeat a
      key);
    - a key only in ``base`` → kept as-is;
    - a key only in ``updates`` → inserted.

    Both inputs must share a schema. Output adds ``change_type`` ∈
    {'unchanged', 'updated', 'inserted'} for auditability; drop it if
    the sink doesn't want it.
    """
    if set(base.columns) != set(updates.columns):
        raise ValueError(
            "scd1_merge requires matching schemas; got "
            f"{sorted(base.columns)} vs {sorted(updates.columns)}"
        )
    tagged = base.withColumn("_prio", F.lit(0)).unionByName(
        updates.withColumn("_prio", F.lit(1))
    )
    ordering = (
        []
        if ordering_col is None
        else [ordering_col]
        if isinstance(ordering_col, str)
        else list(ordering_col)
    )
    payload_cols = [c for c in base.columns if c not in key_cols]
    # argmax under lexicographic (priority, ordering...): updates beat
    # base, newest update beats older ones
    order_key = F.struct(F.col("_prio"), *[F.col(c) for c in ordering])
    row_struct = F.struct(
        F.col("_prio"), *[F.col(c) for c in payload_cols]
    )
    winners = tagged.groupBy(*key_cols).agg(
        F.max_by(row_struct, order_key).alias("_win"),
        F.max(1 - F.col("_prio")).alias("_has_base"),
    )
    return winners.select(
        *key_cols,
        *[F.col(f"_win.{c}").alias(c) for c in payload_cols],
        F.when(F.col("_win._prio") == 0, F.lit("unchanged"))
        .when(F.col("_has_base") == 1, F.lit("updated"))
        .otherwise(F.lit("inserted"))
        .alias("change_type"),
    )
