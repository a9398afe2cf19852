"""Edge-case tests for the as-of and range join operators."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from etl_with_s3__dynamodb_and_glue_spark.operators.temporal import (
    as_of_join,
    range_join,
)


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_inclusive_and_strict(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "L1")],
        "k long, t timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:00:00"), 100),
            (1, _ts("2024-01-01 10:00:00"), 200),  # exactly at left time
            (1, _ts("2024-01-01 11:00:00"), 300),  # after — never matches
        ],
        "k long, rt timestamp, payload int",
    )
    inclusive = as_of_join(left, right, "k", "t", "rt", ["payload"]).collect()
    assert inclusive[0].payload == 200
    strict = as_of_join(left, right, "k", "t", "rt", ["payload"], strict=True).collect()
    assert strict[0].payload == 100


def test_asof_no_prior_row_keeps_nulls(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 08:00:00")), (2, _ts("2024-01-01 12:00:00"))],
        "k long, t timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:00:00"), 5)], "k long, rt timestamp, payload int"
    )
    rows = {r.k: r.payload for r in as_of_join(left, right, "k", "t", "rt", ["payload"]).collect()}
    assert rows == {1: None, 2: None}  # k=1: right row is AFTER; k=2: no right rows


def test_asof_carries_latest_not_any(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 12:00:00"))], "k long, t timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:00:00"), 1),
            (1, _ts("2024-01-01 11:00:00"), 2),
            (1, _ts("2024-01-01 10:00:00"), 3),
        ],
        "k long, rt timestamp, payload int",
    )
    assert as_of_join(left, right, "k", "t", "rt", ["payload"]).first().payload == 2


def test_range_join_boundaries(spark):
    """Window is (t+lower, t+upper] — exclusive start, inclusive end."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "e")], "k long, t timestamp, tag string"
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "at_t"),       # == t+lower → excluded
            (1, _ts("2024-01-01 10:05:00"), "inside"),
            (1, _ts("2024-01-01 10:10:00"), "at_upper"),   # == t+upper → included
            (1, _ts("2024-01-01 10:10:01"), "past"),
            (2, _ts("2024-01-01 10:05:00"), "wrong_key"),
        ],
        "k long, rt timestamp, name string",
    )
    got = {
        r.name
        for r in range_join(left, right, "k", "t", "rt", 0, 600).collect()
    }
    assert got == {"inside", "at_upper"}


def test_range_join_crosses_bucket_boundary(spark):
    """A match whose bucket differs from the left row's own bucket —
    the explode-to-two-buckets path."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:09:59"))], "k long, t timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:15:00"), "next_bucket")],
        "k long, rt timestamp, name string",
    )
    rows = range_join(left, right, "k", "t", "rt", 0, 600).collect()
    assert [r.name for r in rows] == ["next_bucket"]


def test_range_join_rejects_empty_window(spark):
    df = spark.range(1).select(
        F.col("id").alias("k"), F.current_timestamp().alias("t")
    )
    try:
        range_join(df, df, "k", "t", "t", 600, 600)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_point_in_time_join_versions_and_gaps(spark):
    from etl_with_s3__dynamodb_and_glue_spark.operators.temporal import (
        point_in_time_join,
    )

    hist = spark.createDataFrame(
        [
            (1, "v1", "2020-01-01", "2021-01-01"),
            (1, "v2", "2021-01-01", None),
            (2, "x", "2022-01-01", None),
        ],
        "k long, payload string, valid_from string, valid_to string",
    ).selectExpr(
        "k", "payload",
        "cast(valid_from as timestamp) valid_from",
        "cast(valid_to as timestamp) valid_to",
    )
    facts = spark.createDataFrame(
        [
            (100, 1, "2020-06-01"),  # inside v1
            (101, 1, "2021-01-01"),  # boundary: v1 closes, v2 opens
            (102, 1, "2023-01-01"),  # open-ended current
            (103, 2, "2020-01-01"),  # before key existed -> NULL
            (104, 3, "2022-01-01"),  # unknown key -> NULL
        ],
        "fid long, k long, ts string",
    ).selectExpr("fid", "k", "cast(ts as timestamp) ts")
    out = {
        r["fid"]: r["payload"]
        for r in point_in_time_join(facts, hist, ["k"], "ts").collect()
    }
    assert out == {100: "v1", 101: "v2", 102: "v2", 103: None, 104: None}
    # each fact emitted exactly once (intervals partition time per key)
    assert point_in_time_join(facts, hist, ["k"], "ts").count() == 5


def test_as_of_join_tolerance(spark):
    from etl_with_s3__dynamodb_and_glue_spark.operators.temporal import as_of_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 10:10:00"),
         (1, "2024-01-01 12:00:00")],
        "k long, lt string",
    ).selectExpr("k", "cast(lt as timestamp) lt")
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:59:00", 42.0)],
        "k long, rt string, quote double",
    ).selectExpr("k", "cast(rt as timestamp) rt", "quote")

    # unbounded: all three see the 09:59 quote
    unbounded = as_of_join(left, right, "k", "lt", "rt", ["quote"])
    assert [r["quote"] for r in unbounded.orderBy("lt").collect()] == [
        42.0, 42.0, 42.0
    ]
    # 15-minute tolerance: the 12:00 row's quote is too stale -> null
    bounded = as_of_join(
        left, right, "k", "lt", "rt", ["quote"], tolerance_seconds=900
    )
    assert [r["quote"] for r in bounded.orderBy("lt").collect()] == [
        42.0, 42.0, None
    ]
