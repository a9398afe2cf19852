"""Hostile-timezone regression probe (documented in the verify skill):
the grading driver builds its OWN vanilla session, so nothing
guarantees a UTC session timezone. Timestamp semantics are pinned at
the read boundary (sources/readers.py::pin_naive_timestamp_semantics);
this probe pre-poisons the session with America/New_York and asserts
the event-time queries still match the DuckDB oracle value-for-value.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare

PROBED = [
    "user_sessions",          # sessionization boundaries
    "daily_new_users_cumulative",  # to_date day bucketing
    "events_json_extract",    # ts rendering alongside json
    "events_wow_change",      # epoch-week arithmetic
    "rolling_7d_distinct_exact",  # to_date + epoch-day fan-out (r7)
]


def _probe(spark, name, fn, sql):
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        res = compare(spark, SF_SMOKE, name, fn, sql)
        assert res.get("values_match"), res
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


@pytest.mark.parametrize("name", PROBED)
def test_query_survives_hostile_session_timezone(spark, name):
    _probe(
        spark, name, entry_mod.queries()[name], entry_mod.oracle_sql()[name]
    )


def test_weekly_exact_twin_survives_hostile_session_timezone(spark):
    """weekly_user_distinct_exact (date_trunc week + to_date; retired
    from the driver registry r11) keeps its oracle comparison HERE so
    the week-truncation timezone pin stays executable."""
    from etl_with_s3__dynamodb_and_glue_spark.plans.functions_surface import (
        WEEKLY_USER_DISTINCT_EXACT_SQL,
        weekly_user_distinct_exact,
    )

    _probe(
        spark,
        "weekly_user_distinct_exact",
        weekly_user_distinct_exact,
        WEEKLY_USER_DISTINCT_EXACT_SQL,
    )
