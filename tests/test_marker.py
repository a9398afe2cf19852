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


def test_legacy_single_line_marker_matches_any_run_and_upgrades(tmp_path):
    """Pre-run-scoping markers carry no run_id. The stream resuming
    from its ORIGINAL checkpoint replays its last landed batch
    at-least-once — that replay must skip (there was only ever one
    run), and the marker is rewritten run-scoped so later comparisons
    are strict."""
    d = str(tmp_path)
    with open(marker_path(d), "w") as f:
        f.write("2")
    assert is_replay(d, "/ckpt/original", 2, "hint") is True
    # upgraded in place: run-scoped at the legacy batch_id
    assert read_marker(d) == ("/ckpt/original", 2)
    # now strict: a DIFFERENT run regressing fails loudly
    with pytest.raises(ValueError, match="different run"):
        is_replay(d, "/ckpt/fresh", 1, "resume hint text")
    # and progress past the marker is not a replay
    assert is_replay(d, "/ckpt/original", 3, "hint") is False


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
