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
    "weekly_user_distinct_exact",  # date_trunc week + to_date (r8)
]


@pytest.mark.parametrize("name", PROBED)
def test_query_survives_hostile_session_timezone(spark, name):
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        res = compare(
            spark,
            SF_SMOKE,
            name,
            entry_mod.queries()[name],
            entry_mod.oracle_sql()[name],
        )
        assert res.get("values_match"), res
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
