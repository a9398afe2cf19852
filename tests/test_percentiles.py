"""Distributed exact percentiles (operators/percentiles.py, r11) —
the few-groups holistic-aggregate fix. The load-bearing claim is
BIT-equality with the native ``percentile()`` aggregate: same sorted
order statistics, same double interpolation, so swapping the
implementation under a registered query cannot move an oracle hash."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_with_s3__dynamodb_and_glue_spark.operators.percentiles import (
    global_percentiles_exact,
    group_percentiles_exact,
)
from tests.conftest import SF_ORACLE

PS = [0.0, 0.05, 0.25, 0.5, 0.9, 0.99, 1.0]


def _native(df, group_col, value_col, ps):
    aggs = [
        F.expr(f"percentile({value_col}, {p})").alias(f"p{i}")
        for i, p in enumerate(ps)
    ]
    rows = df.groupBy(group_col).agg(*aggs).collect()
    return {
        (r[group_col], p): r[f"p{i}"]
        for r in rows
        for i, p in enumerate(ps)
    }


def test_matches_native_percentile_bitwise_on_orders(spark):
    orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
    native = _native(orders, "o_orderpriority", "o_totalprice", PS)
    ours = {
        (r["o_orderpriority"], r["p"]): r["pct"]
        for r in group_percentiles_exact(
            orders, "o_orderpriority", "o_totalprice", PS
        ).collect()
    }
    assert set(ours) == set(native)
    for k in native:
        assert ours[k] == native[k], (k, ours[k], native[k])  # exact ==


def test_matches_native_on_skewed_and_tiny_groups(spark):
    # one giant group, one 1-row group, one 2-row group, ties galore
    rows = (
        [("big", float(i % 97)) for i in range(10007)]
        + [("one", 42.0)]
        + [("two", 1.0), ("two", 2.0)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    native = _native(df, "g", "v", PS)
    ours = {
        (r["g"], r["p"]): r["pct"]
        for r in group_percentiles_exact(df, "g", "v", PS).collect()
    }
    assert ours == native


def test_nulls_ignored_like_native(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0), ("b", None)],
        "g string, v double",
    )
    ours = {
        (r["g"], r["p"]): r["pct"]
        for r in group_percentiles_exact(df, "g", "v", [0.5]).collect()
    }
    # group b has no non-null values -> no row (native yields NULL;
    # callers join back, so absence == NULL)
    assert ours == {("a", 0.5): 2.0}


def test_null_group_key_is_a_real_group(spark):
    """Native percentile() emits a row for the NULL group; the
    distributed form must too (eqNullSafe on the target join, null-
    tolerant grouping everywhere else)."""
    df = spark.createDataFrame(
        [(None, 1.0), (None, 3.0), ("a", 10.0)], "g string, v double"
    )
    ours = {
        (r["g"], r["p"]): r["pct"]
        for r in group_percentiles_exact(df, "g", "v", [0.5]).collect()
    }
    assert ours == {(None, 0.5): 2.0, ("a", 0.5): 10.0}


def test_global_form_is_single_group(spark):
    df = spark.range(0, 1001).select(F.col("id").cast("double").alias("v"))
    [row] = global_percentiles_exact(df, "v", [0.9]).collect()
    assert row["p"] == 0.9
    assert row["pct"] == 900.0


@pytest.mark.parametrize("n_parts", [1, 3])
def test_partition_count_does_not_change_results(spark, n_parts):
    df = spark.createDataFrame(
        [("g", float(v)) for v in [5, 1, 4, 1, 3, 9, 2, 6]],
        "g string, v double",
    )
    native = _native(df, "g", "v", PS)
    ours = {
        (r["g"], r["p"]): r["pct"]
        for r in group_percentiles_exact(
            df, "g", "v", PS, num_partitions=n_parts
        ).collect()
    }
    assert ours == native


def test_matches_native_with_exchange_reuse_disabled(spark):
    """r14 hardening (ADVICE r11, pre-staged in __spark_entry__.py):
    rank consistency no longer depends on exchange reuse — the pairs
    frame is persisted, so both consumers see one materialization.
    The r11 failure mode under disabled reuse was SILENT rank
    corruption; this pins bit-equality with the native aggregate."""
    orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
    native = _native(orders, "o_orderpriority", "o_totalprice", PS)
    spark.conf.set("spark.sql.exchangeReuse.enabled", "false")
    try:
        ours = {
            (r["o_orderpriority"], r["p"]): r["pct"]
            for r in group_percentiles_exact(
                orders, "o_orderpriority", "o_totalprice", PS
            ).collect()
        }
    finally:
        spark.conf.set("spark.sql.exchangeReuse.enabled", "true")
    assert ours == native


def test_non_numeric_shuffle_partitions_conf_does_not_raise(spark, monkeypatch):
    """'auto'-style deployments: a non-numeric
    spark.sql.shuffle.partitions must degrade to the frame's own
    partition count, not raise (ADVICE r11 item b)."""
    orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
    real_get = spark.conf.get

    def fake_get(key, *a, **kw):
        if key == "spark.sql.shuffle.partitions":
            return "auto"
        return real_get(key, *a, **kw)

    monkeypatch.setattr(spark.conf, "get", fake_get)
    native = _native(orders, "o_orderpriority", "o_totalprice", [0.5])
    ours = {
        (r["o_orderpriority"], r["p"]): r["pct"]
        for r in group_percentiles_exact(
            orders, "o_orderpriority", "o_totalprice", [0.5]
        ).collect()
    }
    assert ours == native
