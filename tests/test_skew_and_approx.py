"""Salted-join correctness + approximate-aggregate accuracy."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_with_s3__dynamodb_and_glue_spark.operators.skew import salted_join
from tests.conftest import SF_SMOKE


def test_salted_join_matches_plain_join(spark):
    # heavy-hitter: 90% of fact rows share key 1
    fact = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(0, 50).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    plain = {(r.k, r.payload, r.name) for r in fact.join(dim, "k").collect()}
    salted = {
        (r.k, r.payload, r.name)
        for r in salted_join(fact, dim, ["k"], salt=8).collect()
    }
    assert salted == plain
    assert len(salted) == 2000


def test_salted_join_spreads_hot_key(spark):
    fact = spark.range(0, 1000).select(F.lit(1).alias("k"), F.col("id").alias("p"))
    dim = spark.range(0, 2).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    out = salted_join(fact, dim, ["k"], salt=8)
    # the join's shuffle key includes _salt → the single hot key hashes
    # to up to 8 distinct (k, salt) partitions; verify via the plan
    plan = out.sparkSession._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple"
    )
    assert "_salt" in plan


def test_salted_left_join_keeps_unmatched(spark):
    fact = spark.createDataFrame([(1, "a"), (99, "b")], "k long, p string")
    dim = spark.createDataFrame([(1, "d1")], "k long, v string")
    rows = {
        (r.k, r.p, r.v)
        for r in salted_join(fact, dim, ["k"], how="left", salt=4).collect()
    }
    assert rows == {(1, "a", "d1"), (99, "b", None)}


def test_approx_stats_accuracy_vs_exact(spark, capsys):
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    exact = {
        r.o_orderpriority: (r.nd, r.med)
        for r in orders.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("nd"),
            F.expr("percentile(o_totalprice, 0.5)").alias("med"),
        )
        .collect()
    }
    approx = {
        r.o_orderpriority: (r.approx_customers, r.approx_median_price)
        for r in orders.groupBy("o_orderpriority")
        .agg(
            F.approx_count_distinct("o_custkey").alias("approx_customers"),
            F.percentile_approx("o_totalprice", 0.5).alias("approx_median_price"),
        )
        .collect()
    }
    for prio, (nd, med) in exact.items():
        and_, amed = approx[prio]
        # surface measured accuracy vs the asserted envelope in CI
        # output — these queries are rows-only forever (sketch impls
        # differ from DuckDB's), so this print IS their value check
        with capsys.disabled():
            print(
                f"\n[sketch-accuracy] order_approx_stats {prio}: "
                f"distinct rel_err={abs(and_ - nd) / nd:.4f}, "
                f"median rel_err={abs(amed - med) / med:.4f} (bound 0.1)"
            )
        assert abs(and_ - nd) / nd < 0.1, (prio, and_, nd)
        assert abs(amed - med) / med < 0.1, (prio, amed, med)


def test_salted_join_rejects_small_side_preserving_how(spark):
    import pytest

    big = spark.range(10).withColumnRenamed("id", "k")
    small = spark.range(3).withColumnRenamed("id", "k")
    for how in ("right", "full", "full_outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(big, small, on=["k"], how=how)


def test_weekly_sketch_rollup_within_hll_error(spark, capsys):
    """Daily HLL sketches union-merged to weeks estimate the exact
    week-level distinct within the sketch's error envelope (~1.6%
    at lgConfigK=12; assert 5% for slack), and exact-count columns
    pass through the rollup untouched."""
    from pyspark.sql import functions as F

    from etl_with_s3__dynamodb_and_glue_spark.plans.functions_surface import (
        weekly_user_sketch_rollup,
    )
    from etl_with_s3__dynamodb_and_glue_spark.sources.readers import read_events
    from tests.conftest import SF_ORACLE

    got = {
        r.week: r for r in weekly_user_sketch_rollup(spark, SF_ORACLE).collect()
    }
    ev = read_events(spark, SF_ORACLE)
    exact = {
        r.week: r
        for r in ev.groupBy(F.to_date(F.date_trunc("week", "ts")).alias("week"))
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .collect()
    }
    assert set(got) == set(exact) and got
    assert len(got) >= 2  # multiple weeks -> the merge is exercised
    for week, row in got.items():
        rel_err = abs(row.est_distinct_users - exact[week].n_users) / max(
            exact[week].n_users, 1
        )
        with capsys.disabled():
            print(
                f"\n[sketch-accuracy] weekly_user_sketch_rollup {week}: "
                f"est={row.est_distinct_users} exact={exact[week].n_users} "
                f"rel_err={rel_err:.4f} (bound 0.05)"
            )
        assert rel_err <= 0.05, f"{week}: {rel_err:.4f}"
        assert row.n_events == exact[week].n_events


def test_weekly_distinct_exact_companion_matches_sketch_rollup(spark):
    """The STAGED round-8 oracle companion (weekly_user_distinct_exact)
    must agree with the sketch rollup on every shared semantic: same
    week set, identical n_days/n_events accounting, and the sketch
    estimate within its error envelope of the companion's exact
    distinct — so registering it later cannot surprise."""
    from etl_with_s3__dynamodb_and_glue_spark.plans.functions_surface import (
        weekly_user_distinct_exact,
        weekly_user_sketch_rollup,
    )
    from tests.conftest import SF_ORACLE

    exact = {
        r.week: r for r in weekly_user_distinct_exact(spark, SF_ORACLE).collect()
    }
    sketch = {
        r.week: r for r in weekly_user_sketch_rollup(spark, SF_ORACLE).collect()
    }
    assert set(exact) == set(sketch) and exact
    for week, e in exact.items():
        s = sketch[week]
        assert (e.n_days, e.n_events) == (s.n_days, s.n_events), week
        rel = abs(s.est_distinct_users - e.n_distinct_users) / max(
            e.n_distinct_users, 1
        )
        assert rel <= 0.05, f"{week}: {rel:.4f}"


def test_rolling_7d_sketch_window_vs_exact(spark, capsys):
    """Window-merged HLL (rolling_7d_distinct_users) must land within
    the sketch error envelope of the exact trailing-7-day distinct
    sets, for every day."""
    import __spark_entry__ as entry_mod
    from etl_with_s3__dynamodb_and_glue_spark.sources.readers import read_events
    from tests.conftest import SF_SMOKE

    got = {
        r["day"]: r["est_users_7d"]
        for r in entry_mod.queries()["rolling_7d_distinct_users"](
            spark, SF_SMOKE
        ).collect()
    }
    rows = (
        read_events(spark, SF_SMOKE)
        .select(F.to_date("ts").alias("day"), "user_id")
        .collect()
    )
    by_day = {}
    for r in rows:
        by_day.setdefault(r["day"], set()).add(r["user_id"])
    days = sorted(by_day)
    worst = 0.0
    for d in days:
        # CALENDAR-trailing window (not "last 7 active days"): a rows
        # frame on a gapped calendar would overcount, and an exact twin
        # computed the same row-based way could not catch it.
        window = [
            x for x in days if 0 <= (d - x).days <= 6
        ]
        exact = len(set().union(*(by_day[x] for x in window)))
        est = got[d.strftime("%Y-%m-%d")]
        rel = abs(est - exact) / max(exact, 1)
        worst = max(worst, rel)
        assert rel <= 0.05, (d, est, exact)
    print(f"[sketch-accuracy] rolling-7d worst rel_err={worst:.4f} (bound 0.05)")


def test_rolling_7d_calendar_gap(spark, tmp_path):
    """A rows-based frame would span the last 7 ACTIVE days; with a
    10-day gap the trailing window must have forgotten the early
    users entirely."""
    import __spark_entry__ as entry_mod

    rows = [
        # 100 users on day 1-2, then a 10-day gap, then 5 fresh users
        *[(i, "2024-01-01 10:00:00", i % 100) for i in range(100)],
        *[(200 + i, "2024-01-02 10:00:00", i % 100) for i in range(100)],
        *[(400 + i, "2024-01-13 10:00:00", 1000 + i) for i in range(5)],
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long"
    ).select("event_id", F.col("ts").cast("timestamp"), "user_id")
    sf_dir = str(tmp_path)
    df.write.parquet(f"{sf_dir}/events.parquet")
    got = {
        r["day"]: r["est_users_7d"]
        for r in entry_mod.queries()["rolling_7d_distinct_users"](
            spark, sf_dir
        ).collect()
    }
    # day 13 is >6 days past both active days: only the 5 fresh users
    assert got["2024-01-13"] == 5
    assert got["2024-01-02"] >= 95  # ~100 distinct, sketch tolerance
