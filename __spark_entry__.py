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
    retrieval,
    star_queries,
    tpch_like,
)

_MODULES = [
    star_queries,
    tpch_like,
    llm_ops,
    event_time,
    functions_surface,
    curation,
    retrieval,
]

# The driver's correctness harness checks the FIRST 50 registry entries
# per round; the registry is larger than that, so ordering is coverage
# policy (round 9 edition). Rotation rules (tested by
# tests/test_registry_rotation.py):
#   1. every query never seen in ANY CORRECTNESS_r*.json artifact must
#      be in the current window (first 50) — nothing ships a round
#      without at least one driver check;
#   2. every query whose code or oracle changed this round stays in
#      the window — encoded as _TOUCHED_THIS_ROUND below (updated as
#      part of each round's diff; the rotation test asserts it is a
#      subset of the window);
#   3. the incident-prone events.ts lineage (user_sessions) stays in
#      the window every round;
#   4. the overflow parks queries that were driver-green in the most
#      recent round that checked them AND whose lineage this round's
#      diff does not touch.
#
# CAPACITY DECISION (round 9, per VERDICT r8 item 3): the staleness
# bound moved from ≤2 to ≤3 artifacts (every query must be in the
# current window or in one of the LAST THREE committed
# CORRECTNESS_r*.json artifacts). Rationale over retirement: the ≤2
# bound's 148-slot capacity was exhausted the moment
# doc_scrub_duplicate_spans registered, and the build keeps adding
# operators every round — retiring a green query per new registration
# trades real coverage for bookkeeping, while one extra round of
# parking (4-round full-coverage cycle instead of 3) is still well
# inside the regression-detection horizon the local pytest suite and
# rule 2 (touched lineage re-checks immediately) already cover.
# CAPACITY under ≤3: a 50-slot window sustains 4×50 − 3
# (user_sessions occupies a slot every round) = 197 queries; the
# registry is at 153 after this round's six registrations — 44
# slots of headroom. The same math lives in
# tests/test_registry_rotation.py::test_no_query_stale_beyond_three_artifacts.
#
# ROUND-9 WINDOW: the r6-checked block (published_segment_kpis …
# customers_without_events_anti) rotates back in minus five deferrals
# (returnflag_cube, order_date_parts, buyer_eventer_intersect,
# buyers_not_eventers_except, returnflag_status_pivot — legal under
# ≤3, they sit in the r6 artifact until the r10 window), plus
# user_sessions (rule 3) and the six round-9 registrations
# (rule 1): doc_scrub_duplicate_spans, doc_dsir_weights,
# doc_dsir_sample, doc_source_quality_buckets, doc_token_dup_share,
# doc_source_token_budget. Exactly 50.
#
# ROUND-10 QUEUE: mandatory returns are the five r6 deferrals above
# (at r10 the last-three artifacts are r7/r8/r9 and they are in none)
# plus user_sessions; the 49-query r7-checked block at the head of
# _CHECK_LAST becomes stale at r11, so r10 should proactively rotate
# most of it in (44 fit alongside the mandatory six), deferring the
# remainder to r11 — compute it from the artifacts, the rotation test
# enforces it.

# Rule-2 ledger: queries whose code or oracle this round's diff
# touched (directly or through an operator they consume). The rotation
# test enforces these sit inside the window.
_TOUCHED_THIS_ROUND = [
    "doc_scrub_duplicate_spans",  # new registration
    "doc_dsir_weights",           # new registration + null-text coalesce
    "doc_dsir_sample",            # new registration (importance lineage)
    "doc_source_quality_buckets",  # new registration
    "doc_token_dup_share",         # new registration
    "doc_source_token_budget",     # new registration
]

_CHECK_FIRST = [
    # --- last checked r6: due this round (the two ≤3-legal deferrals
    # buyers_not_eventers_except / returnflag_status_pivot sit at the
    # end of _CHECK_LAST and are the r10 window's mandatory head) ---
    "published_segment_kpis",
    "top_return_customers",
    "nation_revenue_pareto",
    "doc_token_budget_sample",
    "doc_lang_confusion",
    "doc_dedup_keep_best",
    "embedding_hard_negatives",
    "embedding_dedup_final_lsh",
    "asset_frame_samples",
    "events_daily_complete",
    "user_weekly_retention",
    "event_type_transitions",
    "events_daily_rollup_incremental",
    "event_type_cooccurrence",
    "events_wow_change",
    "segment_nation_chi2",
    "part_name_fuzzy_matches",
    "lineitem_corr_matrix",
    "orders_price_decile_bins",
    "customer_scd2_apply",
    "customer_balance_zscores",
    "orders_pit_customer_balance",
    "rolling_7d_distinct_users",
    "events_customers_null_bypass",
    "clicks_asof_recent_view",
    "doc_encoding_audit",
    "doc_novelty_fraction",
    "doc_arrivals_dedup_lsh",
    "doc_arrivals_dedup_store",
    "doc_decontamination_bloom",
    "doc_lm_outliers",
    "daily_new_users_cumulative",
    "doc_length_buckets",
    "order_quantity_arrays",
    "event_key_skew_profile",
    "doc_split_assignment",
    "doc_split_leakage_audit",
    "doc_split_leakage_audit_lsh",
    "doc_vocab_coverage",
    "lineitem_winsorized_stats",
    "eventers_orderers_full_outer",
    "top_orders_global",
    "customers_without_events_anti",
    # --- incident-prone events.ts lineage, in-window every round ---
    "user_sessions",
    # --- new this round (rule 1): the two r8-staged registrations plus
    # the DSIR resampling end-to-end query (VERDICT r8 items 2-4) ---
    "doc_scrub_duplicate_spans",
    "doc_dsir_weights",
    "doc_dsir_sample",
    "doc_source_quality_buckets",
    "doc_token_dup_share",
    "doc_source_token_budget",
]
_CHECK_LAST = [
    # hash-green r7 (or rows-only-by-design r7), lineage untouched by
    # this round's diff — parked; becomes stale at r11, so the r10
    # window should rotate most of this block back in proactively
    "flagship_daily_segment_topk",
    "segment_kpis_compat",
    "top_rows_per_day_compat",
    "doc_token_stats",
    "doc_quality",
    "doc_lang_id",
    "doc_exact_dedup",
    "doc_jaccard_pairs",
    "doc_dedup_final_lsh",
    "doc_minhash_near_dups",
    "doc_simhash_near_dups",
    "embedding_topk_bruteforce",
    "embedding_near_dup_pairs",
    "embedding_near_dup_pairs_lsh",
    "asset_features",
    "order_approx_stats",
    "asset_content_hashes",
    "weekly_user_sketch_rollup",
    "customer_rolling_spend",
    "part_text_features",
    "csv_quarantine_counts",
    "doc_repetition_signals",
    "doc_pii_scrub",
    "doc_source_mix",
    "embedding_lsh_topk",
    "embedding_ivf_topk",
    "clicks_asof_prior_view",
    "error_followup_counts",
    "priority_returns_exists",
    "small_qty_part_revenue",
    "segment_event_value_salted",
    "activity_union_by_name",
    "order_price_percentiles",
    "order_rank_flavors",
    "pricing_summary",
    "shipping_priority",
    "nation_revenue",
    "returnflag_rollup",
    "customer_order_deltas",
    "user_sessions_native",
    "events_daily_tumbling",
    "events_sliding_windows",
    "customer_snapshot_diff",
    "embedding_pq_topk",
    "ivf_imbalance",
    "doc_bpe_merges",
    "asset_near_dups",
    "doc_duplicate_spans",
    "rolling_7d_distinct_exact",
    # checked r8, parked
    "orders_price_histogram",
    "doc_chunks",
    "doc_char_entropy",
    "segment_kpis_intended",
    "top_segments_per_day_intended",
    "part_scalar_showcase",
    "active_user_ids_union",
    "customers_with_events_semi",
    "events_json_extract",
    "priority_status_grouping_sets",
    "doc_chunk_packs",
    "doc_bm25_topk",
    "doc_inverted_index",
    "doc_lm_score",
    "doc_boilerplate_fraction",
    "embedding_dedup_final",
    "customer_scd1_merge",
    "doc_hybrid_rrf",
    "doc_quality_classifier",
    "doc_dedup_final",
    "customer_cdc_apply",
    "orders_profile",
    "user_conversion_funnel",
    "doc_per_source_sample",
    "fk_integrity_audit",
    "orders_expectations",
    "events_forward_fill",
    "volume_shipping",
    "doc_dedup_cluster_stats",
    "user_daily_anomalies",
    "serving_top_rows_lookup",
    "doc_arrivals_dedup",
    "doc_training_order",
    "doc_curation_funnel",
    "doc_tfidf_top_terms",
    "doc_top_tokens",
    "doc_decontamination",
    "segment_distinct_stats",
    "doc_bpe_token_counts",
    "doc_ngram_containment",
    "doc_temperature_mix",
    "orders_price_drift",
    "doc_token_cms_estimates",
    "doc_weighted_sample",
    "events_value_running_total",
    "events_activity_concurrency",
    "weekly_user_distinct_exact",
    "embedding_ivfpq_topk",
    "doc_eval_span_overlap",
    # checked r6, deferred past this round under the ≤3 bound —
    # MANDATORY in the r10 window
    "returnflag_cube",
    "order_date_parts",
    "buyer_eventer_intersect",
    "buyers_not_eventers_except",
    "returnflag_status_pivot",
]


def _reorder(merged: dict) -> dict:
    middle = [
        k for k in merged if k not in _CHECK_FIRST and k not in _CHECK_LAST
    ]
    ordered = _CHECK_FIRST + middle + _CHECK_LAST
    return {k: merged[k] for k in ordered if k in merged}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return star_queries.flagship_daily_segment_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        merged.update(mod.QUERIES)
    return _reorder(merged)


def oracle_sql() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _MODULES:
        merged.update(mod.ORACLE)
    return merged
