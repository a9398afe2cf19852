"""Schema-memoized readers (sources/readers.py::read_parquet_memo /
read_events_memo): the memo is METADATA ONLY and must be invisible in
plans and results, and must never serve a stale schema after the file
changes on disk."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from etl_with_s3__dynamodb_and_glue_spark.sources.readers import (
    _SCHEMA_MEMO,
    read_events,
    read_events_memo,
    read_parquet_memo,
)
from tests.conftest import SF_SMOKE


def _norm(plan: str) -> str:
    plan = re.sub(r"#\d+", "#N", plan)
    plan = re.sub(r"plan_id=\d+", "plan_id=N", plan)
    return re.sub(r"\b([a-z]+)_\d+#", r"\1_K#", plan)


def test_memo_read_matches_plain_read_schema_and_rows(spark):
    for table in ("orders", "documents"):
        path = f"{SF_SMOKE}/{table}.parquet"
        plain = spark.read.parquet(path)
        memo = read_parquet_memo(spark, path)
        assert memo.schema == plain.schema
        assert memo.exceptAll(plain).count() == 0
        assert plain.exceptAll(memo).count() == 0


def test_memo_is_warm_on_second_read(spark):
    path = f"{SF_SMOKE}/customer.parquet"
    read_parquet_memo(spark, path)
    hits_before = sum(1 for k in _SCHEMA_MEMO if k[0] == path)
    assert hits_before == 1
    read_parquet_memo(spark, path)
    assert sum(1 for k in _SCHEMA_MEMO if k[0] == path) == 1


def test_memo_invalidates_when_file_changes(spark, tmp_path):
    path = str(tmp_path / "t.parquet")
    spark.range(3).select(F.col("id").alias("a")).write.mode(
        "overwrite"
    ).parquet(path)
    first = read_parquet_memo(spark, path)
    assert first.columns == ["a"]
    # rewrite with a different schema — the (path, mtime, size) key
    # must miss and re-infer, never serve the stale schema
    spark.range(4).select(
        F.col("id").alias("b"), F.lit("x").alias("c")
    ).write.mode("overwrite").parquet(path)
    second = read_parquet_memo(spark, path)
    assert sorted(second.columns) == ["b", "c"]
    assert second.count() == 4


def test_read_events_memo_plan_identical_to_read_events(spark):
    plain = read_events(spark, SF_SMOKE)
    memo = read_events_memo(spark, SF_SMOKE)
    a = _norm(plain._jdf.queryExecution().optimizedPlan().toString())
    b = _norm(memo._jdf.queryExecution().optimizedPlan().toString())
    assert a == b
    assert memo.schema == plain.schema
