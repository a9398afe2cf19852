"""Small-file compaction: fragmented partitions merge, healthy ones
stay byte-untouched, data survives, reruns are no-ops."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_with_s3__dynamodb_and_glue_spark.sources.compaction import (
    _partition_files,
    compact_dataset,
)


def _fragmented_dataset(spark, path: str):
    """day=A fragmented into many files, day=B already compact."""
    a = spark.createDataFrame(
        [(i, "A") for i in range(100)], "id long, day string"
    ).repartition(8)
    a.write.partitionBy("day").mode("append").parquet(path)
    b = spark.createDataFrame(
        [(i, "B") for i in range(100, 150)], "id long, day string"
    ).coalesce(1)
    b.write.partitionBy("day").mode("append").parquet(path)


def test_compact_merges_only_fragmented_partitions(spark, tmp_path):
    path = str(tmp_path / "ds")
    _fragmented_dataset(spark, path)
    before = _partition_files(path, "day")
    assert len(before["A"]) > 1 and len(before["B"]) == 1

    report = compact_dataset(spark, path, "day")
    after = _partition_files(path, "day")

    assert report.compacted_values == ["A"]
    assert report.partitions_total == 2
    assert len(after["A"]) < len(before["A"])
    # the healthy partition was never rewritten — same file names
    assert after["B"] == before["B"]
    # data intact
    ids = sorted(
        r.id for r in spark.read.parquet(path).select("id").collect()
    )
    assert ids == list(range(150))


def test_compact_rerun_is_noop(spark, tmp_path):
    path = str(tmp_path / "ds")
    _fragmented_dataset(spark, path)
    compact_dataset(spark, path, "day")
    listing = _partition_files(path, "day")
    report = compact_dataset(spark, path, "day")
    assert report.partitions_compacted == 0
    assert _partition_files(path, "day") == listing
