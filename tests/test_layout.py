"""Sink file-sizing: the rebalance hint coalesces tiny write tasks and
maxRecordsPerFile bounds the large end."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from etl_with_s3__dynamodb_and_glue_spark.sources.dataset import write_sized_parquet


def _parquet_files(path: str) -> list[Path]:
    return [p for p in Path(path).rglob("*.parquet") if p.is_file()]


def test_rebalance_coalesces_small_write_tasks(spark, tmp_path):
    # 32 tiny partitions would naively emit 32 KB-sized files; AQE
    # rebalance merges them to a handful sized by advisory bytes.
    df = spark.range(0, 10_000, 1, 32).withColumn("v", F.rand(seed=7))
    out = str(tmp_path / "sized")
    write_sized_parquet(df, out)
    files = _parquet_files(out)
    assert 1 <= len(files) <= 4, [f.name for f in files]
    assert spark.read.parquet(out).count() == 10_000


def test_max_records_per_file_bounds_large_tasks(spark, tmp_path):
    df = spark.range(10_000).withColumn("v", F.rand(seed=7))
    out = str(tmp_path / "capped")
    write_sized_parquet(df, out, max_records_per_file=1000)
    files = _parquet_files(out)
    assert len(files) >= 10
    assert spark.read.parquet(out).count() == 10_000


def test_partitioned_write_no_small_file_spray(spark, tmp_path):
    # rebalance keyed on the partition column: each directory written
    # by tasks holding only its rows -> ~1 file per partition value,
    # not (tasks x values).
    df = (
        spark.range(0, 9_000, 1, 32)
        .withColumn("bucket", (F.col("id") % 3).cast("string"))
        .withColumn("v", F.rand(seed=7))
    )
    out = str(tmp_path / "parted")
    write_sized_parquet(df, out, partition_by=("bucket",))
    for b in ("0", "1", "2"):
        files = _parquet_files(f"{out}/bucket={b}")
        assert 1 <= len(files) <= 2, (b, [f.name for f in files])
    got = spark.read.parquet(out)
    assert got.count() == 9_000
    assert got.select("bucket").distinct().count() == 3
