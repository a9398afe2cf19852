"""Count-Min sketch: mergeable heavy-hitter counting in fixed state —
the frequency companion to the HLL distinct-count sketches
(streaming/sketches.py, ``weekly_user_sketch_rollup``).

Why a sketch: exact per-key counts over a 10¹²-token stream are a
full shuffle of the key space; a CMS is a ``d × w`` counter matrix
(here 4×512 longs = 16 KB) that answers point frequency queries with
one-sided error — estimates NEVER undercount, and overcount by at
most ``ε·N`` (ε ≈ e/w) with probability ``1 − δ`` (δ ≈ e^−d).
Heavy hitters stay sharply estimated because every cell a hot key
touches is dominated by the key itself. CMS cells are plain sums, so
sketches MERGE by cell-wise addition — per-partition sketches
combine map-side, per-day sketches roll up to weeks, exactly like
the HLL store.

Engineering shape: building aggregates instance counts per DISTINCT
key first (one map-side-combining shuffle on the key), then hashes
each distinct key into its ``d`` (row, cell) coordinates and sums
counts into ≤ ``d·w`` cells. Hash work is O(vocabulary), not
O(instances) — the earlier per-instance form hashed every token
occurrence (4 md5s + 16 hex-digit string ops each) and measured
21.9 s vs 2.3 s for this form at 50k docs / 2.5M tokens, cells
byte-identical; at 10¹² tokens over a 10⁷ vocabulary the gap is five
orders of magnitude of hashing. Probing broadcasts the sketch (it is
KBs by construction) against the query keys' ``d`` coordinates and
takes the row-wise MIN.

Hashing is the repo's portable md5-digit construction
(operators/classifier.py) rather than xxhash64 — deliberately: the
whole sketch becomes a pure deterministic function of the data that
the DuckDB oracle rebuilds VERBATIM, so the driver value-checks an
approximate-counting operator end-to-end (rare for sketches — the
HLL paths are rows-only because Spark's HLL internals aren't
replayable; this one is, by design).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .classifier import _hex4

D_ROWS = 4
W_CELLS = 512


def _cms_pos(key: Column, j: int, w: int) -> Column:
    """Cell index of ``key`` in sketch row ``j`` (seeded md5-hex4)."""
    return (
        _hex4(F.md5(F.concat(F.lit(f"cms{j}|"), key.cast("string")))) % w
    ).cast("int")


def cms_build(
    df: DataFrame,
    key_col: str,
    d: int = D_ROWS,
    w: int = W_CELLS,
) -> DataFrame:
    """Sketch the key-instance stream of ``df`` into a (j, pos, n)
    table — ≤ ``d·w`` rows regardless of key cardinality. Counts per
    distinct key first so each key is hashed ONCE, not once per
    instance (see module doc: measured 9× at 2.5M tokens, identical
    cells)."""
    counts = df.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("_cms_n")
    )
    return cms_build_from_counts(counts, key_col, "_cms_n", d=d, w=w)


def cms_build_from_counts(
    counts: DataFrame,
    key_col: str,
    count_col: str,
    d: int = D_ROWS,
    w: int = W_CELLS,
) -> DataFrame:
    """Sketch a pre-aggregated (key, count) table — the shape to use
    when the caller already needs per-key counts (e.g. alongside an
    exact heavy-hitter table): one hash pass over the vocabulary, no
    second scan of the instance stream."""
    key = F.col(key_col)
    coords = F.array(
        *[
            F.struct(F.lit(j).alias("j"), _cms_pos(key, j, w).alias("pos"))
            for j in range(d)
        ]
    )
    return (
        counts.select(F.explode(coords).alias("c"), F.col(count_col))
        .groupBy(F.col("c.j").alias("j"), F.col("c.pos").alias("pos"))
        .agg(F.sum(count_col).cast("long").alias("n"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same (d, w): cell-wise sum."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("j", "pos").agg(F.sum("n").cast("long").alias("n"))


def cms_estimate(
    keys: DataFrame,
    key_col: str,
    sketch: DataFrame,
    d: int = D_ROWS,
    w: int = W_CELLS,
    out_col: str = "est_count",
) -> DataFrame:
    """Point-frequency estimates for ``keys[key_col]`` (distinct rows
    expected): min over the ``d`` probed cells. Never undercounts."""
    key = F.col(key_col)
    coords = F.array(
        *[
            F.struct(F.lit(j).alias("j"), _cms_pos(key, j, w).alias("pos"))
            for j in range(d)
        ]
    )
    probes = keys.select(key_col, F.explode(coords).alias("c")).select(
        key_col, F.col("c.j").alias("j"), F.col("c.pos").alias("pos")
    )
    return (
        probes.join(F.broadcast(sketch), ["j", "pos"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("n", F.lit(0))).cast("long").alias(out_col))
    )
