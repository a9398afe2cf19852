"""Contract tests for the shared run-scoped replay marker
(``streaming/marker.py`` — ADVICE r7: atomic writes, empty-file
tolerance, legacy single-line upgrade) and the interval-union leaked-
token accounting (``decontam_gate.tokens_leaked``)."""

from __future__ import annotations

import os

import pytest

from etl_with_s3__dynamodb_and_glue_spark.streaming.marker import (
    is_replay,
    marker_path,
    read_marker,
    write_marker,
)


def test_write_read_round_trip_is_atomic(tmp_path):
    d = str(tmp_path)
    write_marker(d, "ckpt-A", 3)
    assert read_marker(d) == ("ckpt-A", 3)
    # no temp residue: os.replace either lands the file or nothing
    assert os.listdir(d) == ["_last_batch_id"]
    write_marker(d, "ckpt-A", 4)
    assert read_marker(d) == ("ckpt-A", 4)


def test_empty_marker_reads_as_absent(tmp_path):
    """A zero-byte marker (legacy non-atomic writer killed mid-write)
    must NOT poison the gate: it reads as absent, so the next batch
    re-lands idempotently instead of raising forever."""
    d = str(tmp_path)
    open(marker_path(d), "w").close()
    assert read_marker(d) is None
    assert is_replay(d, "ckpt-A", 0, "hint") is False


def test_corrupt_marker_raises_descriptively(tmp_path):
    d = str(tmp_path)
    with open(marker_path(d), "w") as f:
        f.write("ckpt-A\nnot-a-number")
    with pytest.raises(ValueError, match="corrupt batch marker"):
        read_marker(d)


def test_legacy_single_line_marker_upgrades_only_at_landed_id(tmp_path):
    """Pre-run-scoping markers carry no run_id, so the check
    discriminates on the batch_id: the original checkpoint's
    at-least-once redelivery replays AT the landed id (skip + rewrite
    run-scoped); a fresh checkpoint renumbering from 0 regresses
    BELOW it and must raise — skipping would silently drop its
    batches (r8 review finding)."""
    d = str(tmp_path)
    with open(marker_path(d), "w") as f:
        f.write("2")
    # a legacy batch BELOW the landed id: renumbering, loud
    with pytest.raises(ValueError, match="legacy unscoped"):
        is_replay(d, "/ckpt/whoever", 0, "resume hint text")
    # still legacy (the raise must not have adopted it)
    assert read_marker(d) == ("", 2)
    # replay AT the landed id: the safe resume — skip and upgrade
    assert is_replay(d, "/ckpt/original", 2, "hint") is True
    assert read_marker(d) == ("/ckpt/original", 2)
    # now strict: a DIFFERENT run regressing fails loudly
    with pytest.raises(ValueError, match="different run"):
        is_replay(d, "/ckpt/fresh", 1, "resume hint text")
    # and progress past the marker is not a replay
    assert is_replay(d, "/ckpt/original", 3, "hint") is False


def test_marker_with_trailing_newline_still_reads(tmp_path):
    """A hand-restored marker (the corrupt-marker error tells the
    operator to restore it; editors append a final newline) must read
    as the marker it is, not as absent — absent would disable the
    replay guard and double-merge a non-idempotent store (r8 review
    finding)."""
    d = str(tmp_path)
    with open(marker_path(d), "w") as f:
        f.write("ckpt-A\n5\n")
    assert read_marker(d) == ("ckpt-A", 5)
    with open(marker_path(d), "w") as f:
        f.write("7\n")
    assert read_marker(d) == ("", 7)


def test_cross_run_regression_error_carries_the_hint(tmp_path):
    d = str(tmp_path)
    write_marker(d, "ckpt-A", 5)
    with pytest.raises(ValueError, match="seed a fresh index_dir"):
        is_replay(d, "ckpt-B", 0, "seed a fresh index_dir")
    # same run replay still short-circuits
    assert is_replay(d, "ckpt-A", 5, "hint") is True


def test_tokens_leaked_unions_overlapping_spans(spark):
    """Spans from non-consecutive anchors closer than min_tokens apart
    OVERLAP (dedup.duplicate_spans docstring); n_tokens_leaked must be
    the union of the intervals, not the sum of lengths (ADVICE r7)."""
    from etl_with_s3__dynamodb_and_glue_spark.streaming.decontam_gate import (
        tokens_leaked,
    )

    rows = [
        # doc 1: [0,8) and [2,10) overlap -> union 10, sum would be 16
        (1, 0, 8),
        (1, 2, 8),
        # doc 2: disjoint [0,8) and [20,28) -> 16
        (2, 0, 8),
        (2, 20, 8),
        # doc 3: containment [0,12) covers [2,10) -> 12
        (3, 0, 12),
        (3, 2, 8),
        # doc 4: chain of overlaps [0,8),[5,13),[12,20) -> 20
        (4, 0, 8),
        (4, 5, 8),
        (4, 12, 8),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, span_start int, span_len int"
    )
    got = {
        r.doc_id: (r.n_spans, r.n_tokens_leaked)
        for r in tokens_leaked(df).collect()
    }
    assert got == {1: (2, 10), 2: (2, 16), 3: (2, 12), 4: (3, 20)}


def test_unscoped_backfill_swap_carries_the_marker_forward(spark, tmp_path):
    """A manual backfill merge (batch_id=None) rewrites the store
    through the same generation swap; it must NOT destroy the
    stream's replay marker — a lost marker lets the next
    at-least-once redelivery double-merge a non-idempotent sum (r8
    review finding, fixed in genstore.swap_in_generation)."""
    from etl_with_s3__dynamodb_and_glue_spark.streaming.cms_store import (
        merge_cms_batch,
    )

    df = spark.createDataFrame([("a",), ("b",), ("a",)], "key string")
    store = str(tmp_path / "store")
    merge_cms_batch(spark, df, store, "key", batch_id=4, run_id="ckpt-A")
    assert read_marker(store) == ("ckpt-A", 4)
    before = {
        (r.j, r.pos): r.n for r in spark.read.parquet(store).collect()
    }
    # unscoped backfill: merges, marker survives
    merge_cms_batch(spark, df, store, "key")
    assert read_marker(store) == ("ckpt-A", 4)
    after = {(r.j, r.pos): r.n for r in spark.read.parquet(store).collect()}
    assert after == {k: v * 2 for k, v in before.items()}
    # and the stream's replay of batch 4 still short-circuits
    merge_cms_batch(spark, df, store, "key", batch_id=4, run_id="ckpt-A")
    assert {
        (r.j, r.pos): r.n for r in spark.read.parquet(store).collect()
    } == after


def test_cms_store_crash_window_recovers(spark, tmp_path):
    """Generation-swap crash windows (shared genstore helper): a crash
    after the old generation was set aside but before promotion leaves
    only <store>.old — the next reader/merger must heal it; a crash
    after promotion leaves both — the leftover is dropped."""
    import shutil

    from etl_with_s3__dynamodb_and_glue_spark.streaming.cms_store import (
        estimate_counts,
        merge_cms_batch,
    )

    df = spark.createDataFrame([("a",), ("b",), ("a",)], "key string")
    store = str(tmp_path / "store")
    merge_cms_batch(spark, df, store, "key", batch_id=0, run_id="ckpt-A")
    want = {
        r.key: r.est_count
        for r in estimate_counts(spark, store, df.distinct(), "key").collect()
    }
    assert want == {"a": 2, "b": 1}

    # window 1: set-aside happened, promotion didn't
    shutil.move(store, store + ".old")
    got = {
        r.key: r.est_count
        for r in estimate_counts(spark, store, df.distinct(), "key").collect()
    }
    assert got == want and read_marker(store) == ("ckpt-A", 0)

    # window 2: promotion happened, leftover .old remains
    shutil.copytree(store, store + ".old")
    merge_cms_batch(spark, df, store, "key", batch_id=1, run_id="ckpt-A")
    assert not os.path.isdir(store + ".old")
    assert {
        r.key: r.est_count
        for r in estimate_counts(spark, store, df.distinct(), "key").collect()
    } == {"a": 4, "b": 2}


def test_last_merged_batch_id_heals_crash_window(spark, tmp_path):
    """The resume-decision accessor must see through the swap's crash
    window: with only <store>.old on disk (crash between set-aside and
    promotion), last_merged_batch_id heals first and reports the
    landed id — returning None here would invite a renumbered re-seed
    that the next merge rejects (review r8)."""
    import shutil

    from etl_with_s3__dynamodb_and_glue_spark.streaming.cms_store import (
        last_merged_batch_id,
        merge_cms_batch,
    )

    df = spark.createDataFrame([("a",), ("b",)], "key string")
    store = str(tmp_path / "store")
    merge_cms_batch(spark, df, store, "key", batch_id=3, run_id="ckpt-A")
    shutil.move(store, store + ".old")
    assert last_merged_batch_id(store) == 3
    assert os.path.isdir(store) and not os.path.isdir(store + ".old")


def _mk_events(spark, n=6):
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("ts"),
        F.lit("click").alias("event_type"),
        F.col("id").cast("double").alias("value"),
    )


def test_fold_and_publish_unscoped_backfill_carries_marker(spark, tmp_path):
    """A manual backfill (batch_id=None) through the WAP publisher
    must carry the folded (run_id, batch_id) forward into the new
    snapshot's metadata — publishing {} would wipe the replay guard
    and let the stream's next at-least-once redelivery double-fold
    (review r8; genstore.swap_in_generation's rule, WAP edition)."""
    from etl_with_s3__dynamodb_and_glue_spark.sources.publish import (
        read_metadata,
    )
    from etl_with_s3__dynamodb_and_glue_spark.streaming.publishing import (
        fold_and_publish,
    )

    root = str(tmp_path / "rollup")
    ev = _mk_events(spark)
    assert fold_and_publish(ev, root, batch_id=0, run_id="ckpt-A") == 0
    # unscoped backfill publishes a new version but keeps the guard
    assert fold_and_publish(ev, root) == 1
    meta = read_metadata(root)
    assert meta.get("last_batch_id") == 0 and meta.get("run_id") == "ckpt-A"
    # the stream's redelivery of batch 0 still short-circuits
    assert fold_and_publish(ev, root, batch_id=0, run_id="ckpt-A") is None


def test_fold_and_publish_legacy_skips_at_folded_id_raises_below(
    spark, tmp_path
):
    """Legacy snapshots (no recorded run) follow marker.py's truth
    table: a new run's replay AT the folded id skips (the original
    checkpoint resuming after an upgrade), BELOW it raises — skipping
    would silently drop a fresh checkpoint's renumbered batches from
    the published rollup (review r8)."""
    from etl_with_s3__dynamodb_and_glue_spark.streaming.publishing import (
        fold_and_publish,
    )

    ev = _mk_events(spark)
    # legacy replay BELOW the folded id raises (fresh checkpoint
    # renumbering from 0 — skipping would silently drop its batches)
    low = str(tmp_path / "rollup_low")
    fold_and_publish(ev, low, batch_id=5, run_id="")  # legacy-shaped
    with pytest.raises(ValueError, match="different run"):
        fold_and_publish(ev, low, batch_id=3, run_id="ckpt-B")

    # legacy replay AT the folded id skips and ADOPTS the current run
    # (metadata rewritten run-scoped, the marker.py contract): the
    # ambiguity resolves once — a THIRD run replaying at the folded
    # id now raises instead of silently dropping its data
    from etl_with_s3__dynamodb_and_glue_spark.sources.publish import (
        read_metadata,
    )

    root = str(tmp_path / "rollup")
    fold_and_publish(ev, root, batch_id=5, run_id="")  # legacy-shaped
    assert fold_and_publish(ev, root, batch_id=5, run_id="ckpt-B") is None
    assert read_metadata(root).get("run_id") == "ckpt-B"
    assert fold_and_publish(ev, root, batch_id=5, run_id="ckpt-B") is None
    with pytest.raises(ValueError, match="different run"):
        fold_and_publish(ev, root, batch_id=5, run_id="ckpt-C")


def test_swap_in_generation_cleans_temp_dir_on_write_failure(
    spark, tmp_path
):
    """A failed generation write must not strand a store-sized
    gen_store_* orphan beside the store (review r8): the swap removes
    its temp dir on failure and leaves the existing store untouched."""
    from pyspark.sql import functions as F

    from etl_with_s3__dynamodb_and_glue_spark.streaming.cms_store import (
        estimate_counts,
        merge_cms_batch,
    )
    from etl_with_s3__dynamodb_and_glue_spark.streaming.genstore import (
        swap_in_generation,
    )

    df = spark.createDataFrame([("a",), ("b",)], "key string")
    store = str(tmp_path / "store")
    merge_cms_batch(spark, df, store, "key", batch_id=0, run_id="ckpt-A")
    before = {
        r.key: r.est_count
        for r in estimate_counts(spark, store, df.distinct(), "key").collect()
    }

    exploding = spark.range(2).select(
        F.assert_true(F.col("id") < 1).alias("boom"), F.col("id")
    )
    with pytest.raises(Exception):
        swap_in_generation(exploding, store, run_id="ckpt-A", batch_id=1)

    leftovers = [
        p for p in os.listdir(tmp_path) if p.startswith("gen_store_")
    ]
    assert leftovers == [], leftovers
    assert {
        r.key: r.est_count
        for r in estimate_counts(spark, store, df.distinct(), "key").collect()
    } == before
    assert read_marker(store) == ("ckpt-A", 0)
