"""Stream-stream interval join: AvailableNow parity with the batch
twin, and bounded-state wiring (watermarks on both sides)."""

from __future__ import annotations

from etl_with_s3__dynamodb_and_glue_spark.streaming.joins import (
    interval_join_stream,
)

EVENTS = [
    # (user, kind, ts)  — views then clicks within/outside 10 minutes
    (1, "view", "2024-01-01 10:00:00"),
    (1, "click", "2024-01-01 10:05:00"),   # joins the 10:00 view
    (1, "click", "2024-01-01 10:20:00"),   # outside lookback of 10:00
    (2, "view", "2024-01-01 11:00:00"),
    (2, "view", "2024-01-01 11:04:00"),
    (2, "click", "2024-01-01 11:05:00"),   # joins BOTH views
    (3, "click", "2024-01-01 12:00:00"),   # no view at all
]
SCHEMA = "user_id long, kind string, ts_s string"


def _frames(df):
    from pyspark.sql import functions as F

    typed = df.withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    clicks = typed.filter(F.col("kind") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    views = typed.filter(F.col("kind") == "view").select(
        "user_id", F.col("ts").alias("view_ts")
    )
    return clicks, views


def test_stream_interval_join_matches_batch(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    spark.createDataFrame(EVENTS, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))

    # batch twin
    b_clicks, b_views = _frames(spark.read.schema(SCHEMA).parquet(str(src)))
    expected = sorted(
        (r.user_id, str(r.click_ts), str(r.view_ts))
        for r in interval_join_stream(
            b_clicks, b_views, "user_id", "click_ts", "view_ts"
        ).collect()
    )
    assert expected == [
        (1, "2024-01-01 10:05:00", "2024-01-01 10:00:00"),
        (2, "2024-01-01 11:05:00", "2024-01-01 11:00:00"),
        (2, "2024-01-01 11:05:00", "2024-01-01 11:04:00"),
    ]

    # streaming run, AvailableNow into a memory sink
    s_clicks, s_views = _frames(
        spark.readStream.schema(SCHEMA).parquet(str(src))
    )
    joined = interval_join_stream(
        s_clicks, s_views, "user_id", "click_ts", "view_ts"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ij_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.user_id, str(r.click_ts), str(r.view_ts))
        for r in spark.sql("select * from ij_out").collect()
    )
    assert got == expected
