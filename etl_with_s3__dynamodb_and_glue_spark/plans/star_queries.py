"""The reference's query semantics re-expressed over the driver's
star-schema testdata (TESTDATA.md; mapping per FIXTURES.md §2:
streams→events, users/songs-dimension→customer/part).

The flagship query is the reference's full core lineage in one plan
(SURVEY.md §7 phase 1): scan → clean (dropna/dedup) → left join dim →
derive day bucket + time-of-day seconds → numeric-string regex filter →
multi-key count aggregate → per-group top-3 window. It exercises
S1/S3, P1-P8, J1, A1, W1, K1, F1-F7 — >80% of the §2 inventory.

Determinism contract (Q4, SURVEY.md §2.5): every window/top-k query
adds explicit tie-breakers, mirrored in the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.datetime_fns import day_bucket, time_of_day_seconds
from ..operators.cleaning import drop_null_keys, filter_not_numeric
from ..operators.windows import ranked_desc, top_k_per_group
from ..sources.readers import read_events

NUMERIC_RE_SQL = "^[0-9]+(\\.[0-9]+)?$"


def _enriched_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared lineage prefix: events (streams-analog) cleaned, enriched
    with the customer dimension (users-analog), day bucket and Q1
    time-of-day seconds (reference glue_job.py:51-83 re-expressed).

    The dimension side is broadcast: customer is tiny relative to the
    fact at every scale factor (at 100 TB the fact grows, the dim
    broadcast still holds — exactly the case broadcast joins exist for).
    """
    events = read_events(spark, sf_dir)
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")

    facts = drop_null_keys(events, ["user_id", "ts"])
    dim = customer.select("c_custkey", "c_name", "c_mktsegment")

    joined = facts.alias("e").join(
        F.broadcast(dim.alias("c")),
        F.col("e.user_id") == F.col("c.c_custkey"),
        "left",
    )
    return joined.select(
        day_bucket(F.col("e.ts")).alias("date"),
        F.col("c.c_mktsegment").alias("segment"),
        F.col("c.c_custkey").alias("custkey"),
        F.col("c.c_name").alias("cust_name"),
        F.col("e.event_type").alias("event_type"),
        time_of_day_seconds(F.col("e.ts")).alias("listen_seconds"),
        F.col("e.user_id").alias("user_id"),
    )


_ENRICHED_SQL = f"""
    SELECT strftime(e.ts, '%Y-%m-%d')                       AS date,
           c.c_mktsegment                                   AS segment,
           c.c_custkey                                      AS custkey,
           c.c_name                                         AS cust_name,
           e.event_type                                     AS event_type,
           CAST(hour(e.ts)*3600 + minute(e.ts)*60
                + CAST(second(e.ts) AS BIGINT) AS BIGINT)   AS listen_seconds,
           e.user_id                                        AS user_id
    FROM events e
    LEFT JOIN (SELECT c_custkey, c_name, c_mktsegment FROM customer) c
      ON e.user_id = c.c_custkey
    WHERE e.user_id IS NOT NULL AND e.ts IS NOT NULL
"""


def flagship_daily_segment_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference flagship: per-(day, segment) top-3 customers by event
    count — the shape of TopSongs (reference glue_job.py:86-90), with
    deterministic tie-breaking on custkey."""
    enriched = filter_not_numeric(_enriched_events(spark, sf_dir), "segment")
    counts = enriched.groupBy("date", "segment", "custkey", "cust_name").agg(
        F.count(F.lit(1)).alias("listen_count")
    )
    return top_k_per_group(
        counts,
        group_by=["date", "segment"],
        order_by=ranked_desc("listen_count", ["custkey"]),
        k=3,
    )


FLAGSHIP_SQL = f"""
WITH enriched AS ({_ENRICHED_SQL}),
filtered AS (
    SELECT * FROM enriched
    WHERE NOT regexp_matches(segment, '{NUMERIC_RE_SQL}')
),
counts AS (
    SELECT date, segment, custkey, cust_name,
           COUNT(*) AS listen_count
    FROM filtered
    GROUP BY date, segment, custkey, cust_name
),
ranked AS (
    SELECT *, CAST(ROW_NUMBER() OVER (
               PARTITION BY date, segment
               ORDER BY listen_count DESC, custkey ASC) AS INTEGER) AS rank
    FROM counts
)
SELECT date, segment, custkey, cust_name, listen_count, rank
FROM ranked WHERE rank <= 3
"""


QUERIES = {
    "flagship_daily_segment_topk": flagship_daily_segment_topk,
}

ORACLE = {
    "flagship_daily_segment_topk": FLAGSHIP_SQL,
}
