"""Write-audit-publish snapshot versioning (sources/publish.py):
atomic promotion, audit gating, rollback, pruning."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_with_s3__dynamodb_and_glue_spark.sources.expectations import (
    Expectation,
    ExpectationError,
)
from etl_with_s3__dynamodb_and_glue_spark.sources.publish import (
    current_version,
    publish_snapshot,
    read_published,
    rollback,
)


def _df(spark, n, tag):
    return spark.range(n).select(
        F.col("id"), F.lit(tag).alias("tag")
    )


def test_publish_read_rollback_cycle(spark, tmp_path):
    root = str(tmp_path / "tbl")
    v0 = publish_snapshot(_df(spark, 10, "a"), root)
    assert v0 == 0 and current_version(root) == 0
    assert read_published(spark, root).count() == 10

    v1 = publish_snapshot(_df(spark, 20, "b"), root)
    assert v1 == 1
    got = read_published(spark, root)
    assert got.count() == 20 and got.first()["tag"] == "b"

    rollback(root, 0)
    assert read_published(spark, root).count() == 10
    # publishing after rollback continues the version sequence
    v2 = publish_snapshot(_df(spark, 30, "c"), root)
    assert v2 == 1  # next after the ROLLED-BACK current (0)
    assert read_published(spark, root).count() == 30


def test_failed_audit_leaves_previous_published(spark, tmp_path):
    root = str(tmp_path / "tbl")
    publish_snapshot(_df(spark, 10, "good"), root)
    bad = _df(spark, 5, "bad").withColumn(
        "id", F.lit(None).cast("long")
    )
    with pytest.raises(ExpectationError):
        publish_snapshot(
            bad,
            root,
            expectations=[Expectation("id_not_null", F.col("id").isNotNull())],
        )
    # previous version still the published one; staged dir kept for forensics
    assert current_version(root) == 0
    assert read_published(spark, root).first()["tag"] == "good"
    assert os.path.isdir(str(tmp_path / "tbl" / "v=0001"))


def test_version_pruning_never_removes_published(spark, tmp_path):
    root = str(tmp_path / "tbl")
    for i in range(5):
        publish_snapshot(_df(spark, 10 + i, f"t{i}"), root, keep_versions=2)
    vs = sorted(d for d in os.listdir(root) if d.startswith("v="))
    assert vs == ["v=0003", "v=0004"]
    assert current_version(root) == 4
    assert read_published(spark, root).count() == 14


def test_time_travel_read(spark, tmp_path):
    from etl_with_s3__dynamodb_and_glue_spark.sources.publish import read_version

    root = str(tmp_path / "tbl")
    publish_snapshot(_df(spark, 10, "a"), root)
    publish_snapshot(_df(spark, 20, "b"), root)
    assert read_version(spark, root, 0).count() == 10
    assert read_version(spark, root, 1).count() == 20
    with pytest.raises(FileNotFoundError):
        read_version(spark, root, 7)
