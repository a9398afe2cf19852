"""Distributed EXACT percentiles — the few-groups holistic-aggregate
fix (round 11).

Spark's native ``percentile()`` is a HOLISTIC aggregate: every value
of a group is buffered in its reducer (an OpenHashMap of boxed
value→count entries), so a low-cardinality groupBy concentrates the
whole table in a handful of tasks. The r11 relational XL probe
measured the consequence on ``order_price_percentiles`` (5 priority
groups): 1.75 s at 10× → 40–55 s at 100×, exponent ~1.37 — and each
``percentile()`` expression keeps its OWN buffer, so three
percentiles tripled the cost (isolated A/B: declarative aggs 0.5 s,
one percentile 12 s). At crawl scale the 5 hot tasks OOM long before
1000 executors help.

``group_percentiles_exact`` computes the same interpolated
percentiles (Spark ``percentile()`` / DuckDB ``quantile_cont``
semantics, continuous type-7 quantile) by DISTRIBUTED SELECTION:

1. range-partition the (group, value) pairs so every task sorts only
   ~n/P rows — a big group SPANS partitions instead of owning one;
2. global rank = within-slice row_number + the slice's offset, where
   offsets come from a tiny (partition × group) count table (range
   partitions are ordered, so ranks compose across slices);
3. each requested percentile needs exactly TWO order statistics
   (k_lo = ⌊p·(n−1)⌋+1 and its successor) — fetch just those rows via
   a broadcast of the ≤|groups|·|ps| target table and interpolate
   with the native aggregate's exact arithmetic:
   (⌈pos⌉−pos)·v_lo + (pos−⌊pos⌋)·v_hi.

Cost: one range shuffle + one hash shuffle of the value pairs and
tiny metadata aggregates — fully parallel at any group cardinality,
nothing holistic anywhere. The interpolation arithmetic reproduces
``percentile()`` bit-for-bit on the driver corpus (pinned by
tests/test_percentiles.py, which also property-checks against the
native aggregate), so oracle hashes are unchanged.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_percentiles_exact(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ps: Sequence[float],
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact interpolated percentiles per group, long format:
    (group_col, p, pct). NULL values are ignored (native
    ``percentile()`` semantics); a group with zero non-null values
    emits NO rows — note this differs from a native GROUPED
    ``percentile()``, which keeps the group with NULL percentiles, so
    an all-null group VANISHES from any downstream inner join on the
    result (ADVICE r12; left-join where the old behavior matters).
    Values are cast to double before ranking —
    identical ordering for numeric inputs, and interpolation happens
    in double exactly as the native aggregate does.

    INVARIANTS a deployment must not break (ADVICE r11):

    * The ``offsets`` broadcast is (partitions × groups) rows and the
      ``targets`` broadcast (groups × |ps|): fine for few-to-moderate
      group cardinality (the holistic-trap fix this operator exists
      for), but do NOT migrate a high-cardinality groupBy onto it
      without sizing that product — at ~10M+ rows the broadcast
      becomes the bottleneck, and the native percentile() trap this
      fixes doesn't apply there anyway (many groups already
      parallelize the holistic aggregate).
    """
    spark = df.sparkSession
    if num_partitions is None:
        try:
            num_partitions = int(
                spark.conf.get("spark.sql.shuffle.partitions")
            )
        except (TypeError, ValueError):  # e.g. "auto" deployments
            num_partitions = df.rdd.getNumPartitions()

    # STRUCT-WRAP the group key: a NULL group is a real group to the
    # native aggregate, but bare-column equality (both the USING join
    # on offsets and the target join) silently drops null keys —
    # struct equality compares null FIELDS as values, making every
    # join/groupBy below null-safe without eqNullSafe special cases.
    #
    # PERSISTED (r14, the ADVICE-r11 hardening pre-staged in
    # __spark_entry__.py): both consumers of ``pairs`` — the
    # slice-count offsets and the ranked window — must observe
    # IDENTICAL range boundaries and ``spark_partition_id`` stamps.
    # The persist replaces the previous reliance on exchange reuse
    # (which left rank consistency hostage to a session conf: with
    # ``spark.sql.exchangeReuse.enabled=false`` the two
    # RangePartitioner samplings could differ and silently corrupt
    # global ranks). The cache fills on the slice_counts aggregate
    # that runs anyway and is released with the result's lifetime.
    from pyspark.storagelevel import StorageLevel

    # Projections below are parsed SQL strings (r14 construction-cost
    # round): same expression trees as the previous Column-by-Column
    # construction (double literals carry the D suffix), ~0.5 s less
    # driver time per construction across the five consumers.
    # Bit-equality with the native aggregate stays pinned by
    # tests/test_percentiles.py.
    pairs = (
        df.selectExpr(
            f"named_struct('k', `{group_col}`) AS _g",
            f"CAST(`{value_col}` AS DOUBLE) AS _v",
        )
        .filter("_v IS NOT NULL")
        .repartitionByRange(num_partitions, "_g", "_v")
        .selectExpr("*", "spark_partition_id() AS _pid")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # tiny: at most (partitions × groups) rows
    slice_counts = pairs.groupBy("_pid", "_g").agg(F.expr("count(1) AS _cnt"))
    offsets = slice_counts.selectExpr(
        "_pid",
        "_g",
        "coalesce(sum(_cnt) OVER (PARTITION BY _g ORDER BY _pid"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS _off",
    )
    n_per = slice_counts.groupBy("_g").agg(F.expr("sum(_cnt) AS _n"))

    # (group, p) → the two 1-based ranks the percentile needs.
    # r0 = p·(n−1) is the 0-based fractional index; frac interpolates
    # between rank k_lo = floor(r0)+1 and k_hi = k_lo+1 (== k_lo when
    # r0 is integral, so the k_hi match is the same row).
    # RENAME the group key on the target side: both frames descend
    # from `pairs`, so ranked["_g"] == targets["_g"] would resolve to
    # a trivially-true self-comparison (the classic same-lineage join
    # trap).
    ps_sql = ", ".join(f"{float(p)!r}D" for p in ps)
    targets = (
        n_per.selectExpr(
            "_g AS _tg", "_n", f"explode(array({ps_sql})) AS p"
        )
        .selectExpr("*", "p * CAST(_n - 1 AS DOUBLE) AS _r0")
        .selectExpr("*", "CAST(floor(_r0) + 1 AS BIGINT) AS _k_lo")
        # carry BOTH interpolation weights exactly as the native
        # aggregate computes them — (ceil−pos)·lo + (pos−floor)·hi,
        # NOT the algebraically-equal lerp lo+(hi−lo)·frac, which
        # differs in the last ulp (caught by the bit-equality test)
        .selectExpr(
            "*",
            "CAST(least(_k_lo + 1, _n) AS BIGINT) AS _k_hi",
            "CAST(ceil(_r0) AS DOUBLE) - _r0 AS _w_lo",
            "_r0 - CAST(floor(_r0) AS DOUBLE) AS _w_hi",
        )
    )

    ranked = pairs.join(F.broadcast(offsets), ["_pid", "_g"]).selectExpr(
        "*",
        "row_number() OVER (PARTITION BY _pid, _g ORDER BY _v) + _off"
        " AS _rk",
    )
    hits = ranked.join(
        F.broadcast(targets),
        F.expr("_g = _tg AND (_rk = _k_lo OR _rk = _k_hi)"),
    ).select("_g", "p", "_rk", "_k_lo", "_k_hi", "_w_lo", "_w_hi", "_v")
    out = (
        hits.groupBy("_g", "p")
        .agg(
            F.expr("max(CASE WHEN _rk = _k_lo THEN _v END) AS _v_lo"),
            F.expr("max(CASE WHEN _rk = _k_hi THEN _v END) AS _v_hi"),
            F.expr("first(_w_lo) AS _w_lo"),
            F.expr("first(_w_hi) AS _w_hi"),
        )
        .selectExpr(
            f"_g.k AS `{group_col}`",
            "p",
            "CASE WHEN _w_hi = 0.0D THEN _v_lo"
            " ELSE _w_lo * _v_lo + _w_hi * _v_hi END AS pct",
        )
    )
    from ..caching import unpersist_on_release

    return unpersist_on_release(out, pairs)


def global_percentiles_exact(
    df: DataFrame,
    value_col: str,
    ps: Sequence[float],
    num_partitions: int | None = None,
) -> DataFrame:
    """Ungrouped exact percentiles — the single-group special case
    (an un-grouped ``percentile()`` buffers the ENTIRE column in one
    task). Returns (p, pct)."""
    out = group_percentiles_exact(
        df.withColumn("_all", F.lit(1)),
        "_all",
        value_col,
        ps,
        num_partitions,
    )
    return out.select("p", "pct")
