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


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """Version diff of two snapshots of the same table: per key,
    ``change_type`` ∈ {'inserted', 'deleted', 'changed', 'unchanged'}
    — the reverse primitive of :func:`apply_changes` (this GENERATES
    the change log that apply_changes folds in; snapshot-diff → CDC is
    how pipelines bootstrap change capture from sources that only
    export full dumps).

    Scale shape: each side reduces to (key, xxhash64(payload)) BEFORE
    the full-outer join, so the shuffle carries 8-byte digests instead
    of full rows; payload equality is digest equality (false-unchanged
    needs a 64-bit collision on the SAME key — ~2⁻⁶⁴ per key). Join
    on the key is the only wide operation.

    NULL discipline: Spark's ``xxhash64`` SKIPS null inputs (the
    running hash passes through unchanged), so hashing raw columns
    would make ``('a', NULL)`` and ``(NULL, 'a')`` collide
    systematically — a moved value between nullable columns would
    read 'unchanged'. Each column is therefore encoded LENGTH-PREFIXED
    (``len(v) ":" v``, NULL → the bare marker ``"N"``) before the
    per-row concat: boundaries cannot shift no matter what bytes the
    values contain (a sentinel/separator scheme is spoofable by values
    that embed the separator — ('a<sep>b','c') vs ('a','b<sep>c')),
    and NULL stays distinguishable from any real string because every
    real value starts with a digit run + ':'.
    """
    if set(old.columns) != set(new.columns):
        raise ValueError(
            "snapshot_diff requires matching schemas; got "
            f"{sorted(old.columns)} vs {sorted(new.columns)}"
        )
    payload_cols = sorted(c for c in old.columns if c not in key_cols)

    def digest(df: DataFrame, name: str) -> DataFrame:
        def enc(c: str):
            s = F.col(c).cast("string")
            return F.when(s.isNull(), F.lit("N")).otherwise(
                F.concat(F.length(s).cast("string"), F.lit(":"), s)
            )

        payload = (
            F.concat(*[enc(c) for c in payload_cols])
            if payload_cols
            else F.lit("")
        )
        return df.select(*key_cols, F.xxhash64(payload).alias(name))

    o = digest(old, "_h_old")
    n = digest(new, "_h_new")
    return o.join(n, key_cols, "full_outer").select(
        *key_cols,
        F.when(F.col("_h_old").isNull(), F.lit("inserted"))
        .when(F.col("_h_new").isNull(), F.lit("deleted"))
        .when(F.col("_h_old") == F.col("_h_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("change_type"),
    )


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    effective_col: str = "effective_date",
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
) -> DataFrame:
    """SCD Type 2: fold ``updates`` into a full-history table where
    each key's versions carry ``[valid_from, valid_to)`` ranges and
    the current version has ``valid_to`` NULL.

    Per key (latest update by ``effective_col`` wins within a batch):

    - payload differs from the current version → the current row
      CLOSES (``valid_to`` = effective) and a new current row opens;
    - payload identical → history unchanged (no empty-range churn);
    - key not in history → new current row;
    - keys without updates, and all already-closed rows, pass through.

    Plan: closed rows never shuffle (pass-through union); current
    rows meet the per-key latest update in ONE full-outer join on the
    key, and each joined row EXPLODES into its 1–2 output rows (the
    close + the open) — no second join, no window. At 100 TB the
    history table is partitioned by key hash and only touched
    partitions rewrite (same deployment note as :func:`scd1_merge`).
    """
    data_cols = [c for c in updates.columns if c != effective_col]
    payload_cols = [c for c in data_cols if c not in key_cols]
    hist_cols = [*data_cols, valid_from_col, valid_to_col]
    if set(history.columns) != set(hist_cols):
        raise ValueError(
            f"history must carry {sorted(hist_cols)}; got "
            f"{sorted(history.columns)}"
        )
    closed = history.filter(F.col(valid_to_col).isNotNull())
    current = history.filter(F.col(valid_to_col).isNull())

    latest = updates.groupBy(*key_cols).agg(
        F.max_by(
            F.struct(*[F.col(c) for c in payload_cols]),
            F.col(effective_col),
        ).alias("_upd"),
        F.max(effective_col).alias("_eff"),
    )
    cur = current.select(
        *key_cols,
        F.struct(*[F.col(c) for c in payload_cols]).alias("_cur"),
        F.col(valid_from_col).alias("_cur_from"),
    )
    joined = cur.join(latest, key_cols, "full_outer")

    def row_t(payload, vf, vt):
        # identical field names in every branch: array() requires
        # branch-wise type equality including struct field names
        return F.struct(payload.alias("p"), vf.alias("vf"), vt.alias("vt"))

    no_update = F.col("_upd").isNull()
    brand_new = F.col("_cur").isNull()
    same = F.col("_upd") == F.col("_cur")
    never = F.lit(None).cast("timestamp")
    eff = F.col("_eff").cast("timestamp")
    out_rows = (
        F.when(
            no_update | same,
            F.array(row_t(F.col("_cur"), F.col("_cur_from"), never)),
        )
        .when(
            brand_new,
            F.array(row_t(F.col("_upd"), eff, never)),
        )
        .otherwise(
            F.array(
                row_t(F.col("_cur"), F.col("_cur_from"), eff),
                row_t(F.col("_upd"), eff, never),
            )
        )
    )
    exploded = joined.select(
        *key_cols, F.explode(out_rows).alias("_r")
    ).select(
        *key_cols,
        *[F.col(f"_r.p.{c}").alias(c) for c in payload_cols],
        F.col("_r.vf").alias(valid_from_col),
        F.col("_r.vt").alias(valid_to_col),
    )
    return closed.select(*key_cols, *payload_cols, valid_from_col, valid_to_col).unionByName(
        exploded
    )


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    ordering_col: str | list[str],
    op_col: str = "op",
) -> DataFrame:
    """CDC apply: fold an insert/update/delete change log into the
    state table. ``changes`` carries the base schema plus ``op_col``
    ('U' for upsert, 'D' for delete); the LATEST change per key (by
    ``ordering_col``) decides — an upsert lands the new row, a delete
    drops the key, and keys without changes pass through.

    Same single-shuffle argmax shape as :func:`scd1_merge` (base rows
    tagged priority 0 / op 'U'); the delete is a post-aggregate filter
    on the winning row's op, so tombstones cost nothing extra. This is
    the batch core of a warehouse CDC pipeline (the op log is what
    Debezium-style sources emit); at 100 TB pair it with the
    bucket-partitioned store of streaming/state_table.py so each batch
    rewrites only touched buckets.
    """
    if op_col not in changes.columns:
        raise ValueError(f"changes must carry an {op_col!r} column")
    data_cols = [c for c in changes.columns if c != op_col]
    if set(base.columns) != set(data_cols):
        raise ValueError(
            "apply_changes requires changes = base schema + op; got "
            f"{sorted(base.columns)} vs {sorted(data_cols)}"
        )
    ordering = [ordering_col] if isinstance(ordering_col, str) else list(ordering_col)
    tagged = base.select(
        *data_cols, F.lit("U").alias(op_col), F.lit(0).alias("_prio")
    ).unionByName(changes.select(*data_cols, op_col).withColumn("_prio", F.lit(1)))
    payload_cols = [c for c in data_cols if c not in key_cols]
    order_key = F.struct(F.col("_prio"), *[F.col(c) for c in ordering])
    row_struct = F.struct(
        F.col("_prio"), F.col(op_col), *[F.col(c) for c in payload_cols]
    )
    winners = tagged.groupBy(*key_cols).agg(
        F.max_by(row_struct, order_key).alias("_win"),
        F.max(1 - F.col("_prio")).alias("_has_base"),
    )
    return (
        winners.filter(F.col(f"_win.{op_col}") != "D")
        .select(
            *key_cols,
            *[F.col(f"_win.{c}").alias(c) for c in payload_cols],
            F.when(F.col("_win._prio") == 0, F.lit("unchanged"))
            .when(F.col("_has_base") == 1, F.lit("updated"))
            .otherwise(F.lit("inserted"))
            .alias("change_type"),
        )
    )
