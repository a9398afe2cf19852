"""Streaming SCD-1 state table: stream-vs-batch parity, replay
idempotency, and bucket-pruned incremental rewrite."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from etl_with_s3__dynamodb_and_glue_spark.streaming.state_table import (
    merge_state,
    read_state,
    state_table_stream,
)

SCHEMA = "k long, v double, at string"


def _state_dict(spark, store):
    return {r.k: (r.v, r.at) for r in read_state(spark, store).collect()}


def test_merge_state_batches_accumulate_latest_wins(spark, tmp_path):
    store = str(tmp_path / "state")
    b1 = spark.createDataFrame(
        [(1, 10.0, "2024-01-01"), (2, 20.0, "2024-01-01")], SCHEMA
    )
    b2 = spark.createDataFrame(
        [(2, 21.0, "2024-02-01"), (3, 30.0, "2024-02-01"),
         (3, 31.0, "2024-03-01")],  # repeated key within one batch
        SCHEMA,
    )
    merge_state(spark, b1, store, ["k"], "at")
    merge_state(spark, b2, store, ["k"], "at")
    assert _state_dict(spark, store) == {
        1: (10.0, "2024-01-01"),
        2: (21.0, "2024-02-01"),
        3: (31.0, "2024-03-01"),
    }


def test_merge_state_replay_is_idempotent(spark, tmp_path):
    store = str(tmp_path / "state")
    b1 = spark.createDataFrame([(1, 10.0, "2024-01-01")], SCHEMA)
    b2 = spark.createDataFrame([(1, 11.0, "2024-02-01")], SCHEMA)
    merge_state(spark, b1, store, ["k"], "at")
    merge_state(spark, b2, store, ["k"], "at")
    before = _state_dict(spark, store)
    merge_state(spark, b2, store, ["k"], "at")  # at-least-once redelivery
    assert _state_dict(spark, store) == before


def test_merge_state_rewrites_only_touched_buckets(spark, tmp_path):
    """The scale contract: a batch must not rewrite buckets its keys
    don't hash into (dynamic partition overwrite + pruning)."""
    store = str(tmp_path / "state")
    many = spark.createDataFrame(
        [(k, float(k), "2024-01-01") for k in range(64)], SCHEMA
    )
    merge_state(spark, many, store, ["k"], "at")
    buckets_before = {
        d: sorted(os.listdir(os.path.join(store, d)))
        for d in os.listdir(store)
        if d.startswith("bucket=")
    }
    assert len(buckets_before) > 4, "fixture should cover many buckets"
    one = spark.createDataFrame([(7, 99.0, "2024-02-01")], SCHEMA)
    merge_state(spark, one, store, ["k"], "at")
    buckets_after = {
        d: sorted(os.listdir(os.path.join(store, d)))
        for d in os.listdir(store)
        if d.startswith("bucket=")
    }
    changed = [
        d for d in buckets_before if buckets_after[d] != buckets_before[d]
    ]
    assert len(changed) == 1, f"expected 1 rewritten bucket, got {changed}"
    # and the value actually updated
    assert _state_dict(spark, store)[7] == (99.0, "2024-02-01")


def test_state_table_stream_matches_batch_merge(spark, tmp_path):
    """File-stream episodes through foreachBatch produce the same state
    as one batch scd1 pass over all updates."""
    src = tmp_path / "updates"
    src.mkdir()
    store = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(
        [(1, 10.0, "2024-01-01"), (2, 20.0, "2024-01-01")], SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    q = state_table_stream(stream, store, ckpt, ["k"], "at")
    q.awaitTermination(120)

    spark.createDataFrame(
        [(2, 22.0, "2024-03-01"), (4, 40.0, "2024-03-01")], SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(src))
    q = state_table_stream(stream, store, ckpt, ["k"], "at")
    q.awaitTermination(120)

    assert _state_dict(spark, store) == {
        1: (10.0, "2024-01-01"),
        2: (22.0, "2024-03-01"),
        4: (40.0, "2024-03-01"),
    }


def test_merge_state_cdc_deletes_and_emptied_buckets(spark, tmp_path):
    """CDC mode: tombstones remove keys — including when a delete
    empties its entire bucket (dynamic overwrite alone cannot clear
    those; the store must)."""
    store = str(tmp_path / "state")
    CDC = "k long, v double, at string, op string"
    b1 = spark.createDataFrame(
        [(1, 10.0, "2024-01-01", "U"), (2, 20.0, "2024-01-01", "U")], CDC
    )
    merge_state(spark, b1, store, ["k"], "at", op_col="op")
    assert set(_state_dict(spark, store)) == {1, 2}
    # delete key 1 (its bucket may hold only key 1) and update key 2
    b2 = spark.createDataFrame(
        [(1, 0.0, "2024-02-01", "D"), (2, 21.0, "2024-02-01", "U")], CDC
    )
    merge_state(spark, b2, store, ["k"], "at", op_col="op")
    state = _state_dict(spark, store)
    assert set(state) == {2}
    assert state[2] == (21.0, "2024-02-01")
    # replay of the CDC batch converges to the same state
    merge_state(spark, b2, store, ["k"], "at", op_col="op")
    assert _state_dict(spark, store) == state


def test_merge_state_model_based_random_ops(spark, tmp_path):
    """Model check: random CDC batches applied to the store equal a
    plain-Python dict fold of the same log."""
    import random

    rng = random.Random(7)
    store = str(tmp_path / "state")
    CDC = "k long, v double, at string, op string"
    model: dict[int, tuple[float, str]] = {}
    t = 0
    for _ in range(4):
        rows = []
        for _ in range(20):
            k = rng.randrange(12)
            t += 1
            at = f"2024-01-01 00:00:{t:02d}" if t < 60 else f"2024-01-01 00:01:{t-60:02d}"
            op = "D" if rng.random() < 0.3 else "U"
            v = round(rng.uniform(0, 100), 2)
            rows.append((k, v, at, op))
        # fold into the reference model in ordering_col order
        for k, v, at, op in sorted(rows, key=lambda r: r[2]):
            if op == "D":
                model.pop(k, None)
            else:
                model[k] = (v, at)
        merge_state(
            spark,
            spark.createDataFrame(rows, CDC),
            store,
            ["k"],
            "at",
            op_col="op",
        )
    assert _state_dict(spark, store) == model
