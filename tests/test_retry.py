"""Episode retry policy (reference dag.py:18-24 semantics)."""

from __future__ import annotations

import pytest

from etl_with_s3__dynamodb_and_glue_spark.retry import with_retries


def test_retries_transient_failure_then_succeeds():
    calls = {"n": 0}
    sleeps: list[float] = []

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient")
        return "ok"

    assert with_retries(flaky, retries=1, delay_sec=300, sleep=sleeps.append) == "ok"
    assert calls["n"] == 2
    assert sleeps == [300]  # reference's 5-minute retry_delay


def test_exhausted_retries_reraise():
    def always_fails():
        raise RuntimeError("permanent")

    with pytest.raises(RuntimeError, match="permanent"):
        with_retries(always_fails, retries=2, delay_sec=0, sleep=lambda _: None)


def test_non_retryable_propagates_immediately():
    calls = {"n": 0}

    def bad():
        calls["n"] += 1
        raise KeyboardInterrupt()

    with pytest.raises(KeyboardInterrupt):
        with_retries(bad, retries=5, delay_sec=0, sleep=lambda _: None)
    assert calls["n"] == 1


def test_backoff_multiplies_delay():
    sleeps: list[float] = []

    def always_fails():
        raise ValueError("x")

    with pytest.raises(ValueError):
        with_retries(
            always_fails, retries=3, delay_sec=10, backoff=2.0, sleep=sleeps.append
        )
    assert sleeps == [10, 20, 40]
