"""Record linkage: blocked fuzzy matching for entity resolution —
the "same real-world thing, different spelling" dedup that exact and
shingle-based dedup both miss (catalog SKUs, vendor names, address
variants).

The quadratic trap and its standard fix: similarity is not an
equi-join key, so a naive fuzzy match is O(n²). BLOCKING restores
the equi-join: a cheap deterministic key (last token, first char,
phonetic code, …) that true matches almost always share; candidate
pairs come from a self-equi-join on the block key, and the expensive
edit-distance only runs within blocks — O(Σ bᵢ²) with bᵢ bounded by
design. Same architecture as the MinHash-LSH path (operators/
dedup.py) with a hand-chosen key instead of a probabilistic one;
LSH over character shingles IS the blocking scheme of last resort
when no natural key exists.

Skew is the failure mode: one hot block ("smith", "inc") re-creates
the n² it was meant to kill. ``max_block`` caps participation — the
dropped keys are reported by :func:`fuzzy_dropped_blocks` (run it
alongside the pair join), or the job fails fast with
``on_oversize="error"``; either way a hot key is LOUD, never a
silently exploding task (the same df-cap discipline as the winnowing
containment path, plans/llm_ops.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def fuzzy_dropped_blocks(
    df: DataFrame,
    name_col: str,
    block_key: Column,
    max_block: int = 1000,
) -> DataFrame:
    """The blocks :func:`fuzzy_match_pairs` EXCLUDES at the same
    ``max_block`` cap: (blk, blk_n) per oversize key. Run it alongside
    the pair join and persist/alert on it — a non-empty result means
    the blocking key has a hot value ("smith", "inc") and recall is
    silently bounded there. Same single window pass as the cap itself.
    """
    blocked = df.select(
        F.col(name_col).alias("name"), block_key.alias("blk")
    ).distinct()
    return (
        blocked.groupBy("blk")
        .agg(F.count(F.lit(1)).cast("long").alias("blk_n"))
        .filter(F.col("blk_n") > max_block)
    )


def fuzzy_match_pairs(
    df: DataFrame,
    name_col: str,
    block_key: Column,
    min_distance: int = 1,
    max_distance: int = 2,
    max_block: int = 1000,
    on_oversize: str = "drop",
) -> DataFrame:
    """Within-block name pairs with Levenshtein distance in
    [``min_distance``, ``max_distance``] (``min_distance=1`` skips
    exact duplicates — route those through exact dedup, it's free).
    Output: (name_a, name_b, edit_distance), name_a < name_b.

    One block-keyed self-equi-join; blocks larger than ``max_block``
    are excluded (count them via the window before the join).
    ``on_oversize`` picks the loud path: ``"drop"`` excludes them —
    pair with :func:`fuzzy_dropped_blocks` to report what was capped —
    while ``"error"`` fails the job at the first oversize block
    (``raise_error`` inside the size filter), for pipelines where
    bounded recall is worse than no answer.
    """
    if on_oversize not in ("drop", "error"):
        raise ValueError(f"on_oversize must be drop|error, got {on_oversize!r}")
    blocked = df.select(
        F.col(name_col).alias("name"), block_key.alias("blk")
    ).distinct()
    sized = blocked.withColumn(
        "blk_n", F.count(F.lit(1)).over(Window.partitionBy("blk"))
    )
    if on_oversize == "error":
        sized = sized.filter(
            F.when(F.col("blk_n") <= max_block, F.lit(True)).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"fuzzy_match_pairs: block over max_block={max_block}: "
                        ),
                        F.col("blk"),
                    )
                )
            )
        )
    else:
        sized = sized.filter(F.col("blk_n") <= max_block)
    a = sized.select(F.col("name").alias("name_a"), "blk")
    b = sized.select(F.col("name").alias("name_b"), "blk")
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(b, "blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .select(
            "name_a",
            "name_b",
            dist.cast("int").alias("edit_distance"),
        )
        .filter(
            (F.col("edit_distance") >= min_distance)
            & (F.col("edit_distance") <= max_distance)
        )
    )
