"""Datetime column helpers (all JVM-side, codegen-friendly).

These encode the reference's two derived columns exactly:

- ``day_bucket``: the day key, formatted 'yyyy-MM-dd' as a STRING to
  match the reference's output contract (reference glue_job.py:59).
- ``time_of_day_seconds``: quirk Q1 (SURVEY.md §2.2 P5) — the reference
  treats the time-of-day of the listen timestamp as a listening
  DURATION: hour*3600 + minute*60 + second (reference glue_job.py:77-80).
  Preserved exactly for compatibility semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def day_bucket(ts: Column | str, fmt: str = "yyyy-MM-dd") -> Column:
    return F.date_format(ts, fmt)


def time_of_day_seconds(ts: Column | str) -> Column:
    col = F.col(ts) if isinstance(ts, str) else ts
    return (F.hour(col) * 3600 + F.minute(col) * 60 + F.second(col)).cast("long")
