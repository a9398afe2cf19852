"""Empty-input robustness: a representative slice of the query surface
must run (returning zero rows, not raising) when every table is empty.
Real pipelines hit empty partitions constantly — a backfill day with
no data, a filtered source, a new tenant."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from tests.conftest import SF_SMOKE

# representative lineages: flagship star join, KPI agg, text analysis,
# exact + LSH dedup, connected components (zero edges AND zero
# vertices), ANN, sessionization, merge family, retrieval, profiling,
# funnel
SUBSET = [
    "flagship_daily_segment_topk",
    "segment_kpis_compat",
    "doc_token_stats",
    "doc_exact_dedup",
    "doc_minhash_near_dups",
    "doc_dedup_final",
    "embedding_topk_bruteforce",
    "user_sessions",
    "customer_scd1_merge",
    "customer_cdc_apply",
    "doc_bm25_topk",
    "doc_lm_score",
    "doc_boilerplate_fraction",
    "orders_profile",
    "user_conversion_funnel",
    "event_key_skew_profile",
    "orders_price_histogram",
    # round-5 session additions: prefix sum, sweep, CMS, drift,
    # temperature mix, SCD2, snapshot diff, fuzzy matching, spine,
    # retention, hard negatives, keep-best dedup, bloom decontam
    "events_value_running_total",
    "events_activity_concurrency",
    "doc_token_cms_estimates",
    "orders_price_drift",
    "doc_temperature_mix",
    "doc_char_entropy",
    "doc_weighted_sample",
    "customer_scd2_apply",
    "customer_snapshot_diff",
    "part_name_fuzzy_matches",
    "events_daily_complete",
    "user_weekly_retention",
    "event_type_transitions",
    "embedding_hard_negatives",
    "doc_dedup_keep_best",
    "doc_decontamination_bloom",
    "segment_nation_chi2",
    "lineitem_corr_matrix",
    "orders_price_decile_bins",
    "nation_revenue_pareto",
    "top_return_customers",
    "asset_frame_samples",
    # round-6 session additions
    "lineitem_winsorized_stats",
    "doc_split_assignment",
    "doc_split_leakage_audit",
    "customer_balance_zscores",
    "doc_token_budget_sample",
    "doc_vocab_coverage",
    "doc_split_leakage_audit_lsh",
    # round-7 session additions: substring dedup, exact rolling
    # distinct, media near-dups, BPE merge table (empty corpus → no
    # merges)
    "doc_duplicate_spans",
    "rolling_7d_distinct_exact",
    "asset_near_dups",
    "doc_bpe_merges",
    # round-8 session additions: span-level decontamination (empty
    # corpus AND empty eval side), scrub; weekly_user_distinct_exact
    # (retired from the registry r11) is covered directly below
    "doc_eval_span_overlap",
    # round-9 session additions: DSIR weighting + resampling (empty
    # corpus → empty histogram, empty sample), per-source quality
    # terciles (empty corpus → empty threshold table)
    "doc_dsir_weights",
    "doc_dsir_sample",
    "doc_source_quality_buckets",
    "doc_token_dup_share",
    "doc_source_token_budget",
    # round-10 session addition: DSIR gate episode (empty corpus →
    # pure-smoothing store, empty arrival batches, empty landing)
    "doc_dsir_admissions",
]


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    """Zero-row copies of every table, schemas preserved."""
    out = tmp_path_factory.mktemp("sf_empty")
    tables = (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split()
    for t in tables:
        df = spark.read.parquet(f"{SF_SMOKE}/{t}.parquet")
        df.limit(0).coalesce(1).write.mode("overwrite").parquet(
            str(out / f"{t}.parquet")
        )
    return str(out)


@pytest.mark.parametrize("name", SUBSET)
def test_query_survives_empty_tables(spark, empty_sf_dir, name):
    fn = entry_mod.queries()[name]
    rows = fn(spark, empty_sf_dir).collect()
    assert rows == [] or all(r is not None for r in rows)


def test_weekly_exact_twin_survives_empty_tables(spark, empty_sf_dir):
    """weekly_user_distinct_exact (retired from the driver registry
    r11, kept as a pytest-only twin) on empty tables."""
    from etl_with_s3__dynamodb_and_glue_spark.plans.functions_surface import (
        weekly_user_distinct_exact,
    )

    assert weekly_user_distinct_exact(spark, empty_sf_dir).collect() == []


def test_scrub_query_survives_empty_tables(spark, empty_sf_dir):
    """doc_scrub_duplicate_spans (registered r9) on empty tables."""
    from etl_with_s3__dynamodb_and_glue_spark.plans.curation import (
        doc_scrub_duplicate_spans,
    )

    assert doc_scrub_duplicate_spans(spark, empty_sf_dir).collect() == []


def test_token_dup_share_empty_corpus_matches_oracle_edge(spark, empty_sf_dir):
    """ADVICE r9: Spark's SUM over zero rows is NULL while the oracle
    COALESCEs the duplicated-token count to 0 — both engines must
    agree on the empty edge. The single KPI row must carry a real 0,
    not NULL, in n_tokens_duplicated."""
    from etl_with_s3__dynamodb_and_glue_spark.plans.llm_ops import (
        doc_token_dup_share,
    )

    [row] = doc_token_dup_share(spark, empty_sf_dir).collect()
    assert row["n_docs"] == 0
    assert row["n_tokens_duplicated"] == 0


def test_weekly_retention_drops_null_ts_events(spark, tmp_path):
    """Null-week CONTRACT pin (ADVICE r12, latent — driver fixtures
    have zero null ts): the r12 join-free rework's collect_set(week)
    silently drops NULL weeks, so (a) a null-ts event contributes to
    no offset bucket and (b) a user whose every ts is NULL has no
    cohort and vanishes from the matrix. That is the INTENDED
    semantics (an event with no time cannot place in a time-bucketed
    matrix); this fixture makes it explicit instead of latent. The
    oracle SQL keeps such rows as NULL-offset groups — the contract
    divergence is documented in __spark_entry__.py's r15 queue (the
    oracle edit burns a window slot until the query rotates back)."""
    from etl_with_s3__dynamodb_and_glue_spark.plans.event_time import (
        user_weekly_retention,
    )

    rows = [
        # user 1: weeks 0 and 1 plus a null-ts event
        (1, "2024-01-01 00:00:00", 1, "click", 1.0, None),
        (2, "2024-01-08 00:00:00", 1, "click", 1.0, None),
        (3, None, 1, "click", 1.0, None),
        # user 2: ONLY null ts — no cohort, absent from the matrix
        (4, None, 2, "click", 1.0, None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    got = {
        (r.cohort_week, r.week_offset): r.n_users
        for r in user_weekly_retention(spark, str(tmp_path)).collect()
    }
    # 2024-01-01 = epoch day 19723 → week floor(19723/7) = 2817
    assert got == {(2817, 0): 1, (2817, 1): 1}, got
