"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Queries live in ``etl_with_s3__dynamodb_and_glue_spark/plans/``; this
module only merges the per-module registries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_with_s3__dynamodb_and_glue_spark.plans import (
    curation,
    event_time,
    functions_surface,
    llm_ops,
    star_queries,
    tpch_like,
)

_MODULES = [star_queries, tpch_like, llm_ops, event_time, functions_surface, curation]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return star_queries.flagship_daily_segment_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        merged.update(mod.QUERIES)
    return merged


def oracle_sql() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _MODULES:
        merged.update(mod.ORACLE)
    return merged
