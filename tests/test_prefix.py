"""Distributed prefix aggregation (operators/prefix.py): exactness vs
a sequential reference, partition-count invariance, sweep-line
semantics, and the cache-release discipline."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_with_s3__dynamodb_and_glue_spark.operators.prefix import (
    running_sum,
    sweep_concurrency,
)


def test_running_sum_matches_sequential_reference(spark):
    n = 5000
    df = spark.range(n).select(
        F.col("id").alias("k"),
        ((F.col("id") * 37) % 101 - 50).alias("v"),
    )
    out = running_sum(df, "v", ["k"], num_partitions=16).collect()
    got = {r["k"]: r["running_total"] for r in out}
    acc = 0
    for k in range(n):
        acc += (k * 37) % 101 - 50
        assert got[k] == acc, k
    assert len(got) == n


def test_running_sum_partition_count_invariant(spark):
    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    one = running_sum(df, "v", ["k"], num_partitions=1).collect()
    many = running_sum(df.repartition(23), "v", ["k"], num_partitions=13).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, many))


def test_running_sum_releases_internal_persist(spark):
    import gc

    df = spark.range(100).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    out = running_sum(df, "v", ["k"], num_partitions=4)
    out.collect()
    deps = out._graft_cache_deps
    assert any(d.storageLevel.useMemory or d.storageLevel.useDisk for d in deps)
    del out
    gc.collect()
    assert all(
        not (d.storageLevel.useMemory or d.storageLevel.useDisk) for d in deps
    )


def test_sweep_concurrency_end_exclusive(spark):
    # [0,10) [5,15) overlap; [15,20) starts exactly when [5,15) ends ->
    # end-exclusive: never 2 concurrent at t=15
    rows = [(1, 0, 10), (2, 5, 15), (3, 15, 20)]
    df = spark.createDataFrame(rows, "iid long, s long, e long")
    out = sweep_concurrency(df, "s", "e", ["iid"], out_col="n").collect()
    by_key = {(r["ts"], r["delta"], r["iid"]): r["n"] for r in out}
    assert by_key[(0, 1, 1)] == 1
    assert by_key[(5, 1, 2)] == 2        # peak: 1 and 2 overlap
    assert by_key[(10, -1, 1)] == 1
    assert by_key[(15, -1, 2)] == 0      # 2 closes BEFORE 3 opens
    assert by_key[(15, 1, 3)] == 1
    assert by_key[(20, -1, 3)] == 0
    assert max(r["n"] for r in out) == 2
