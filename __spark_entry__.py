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
# policy (round 10 edition). Rotation rules (tested by
# tests/test_registry_rotation.py):
#   1. every query never seen in ANY CORRECTNESS_r*.json artifact must
#      be in the current window (first 50) — nothing ships a round
#      without at least one driver check;
#   2. every query whose code or oracle changed this round stays in
#      the window — encoded as _TOUCHED_THIS_ROUND below (updated as
#      part of each round's diff; the rotation test asserts it is a
#      subset of the window). "Touched" is FUNCTION-level: a query is
#      touched when a function on its plan lineage changed, not when
#      an unrelated function in a shared module did (e.g. a
#      ``minhash_signatures`` edit touches the LSH consumers but not
#      ``doc_dedup_final``, which consumes only ``jaccard_pairs`` +
#      ``resolve_near_dups`` from the same file);
#   3. the incident-prone events.ts lineage (user_sessions) stays in
#      the window every round;
#   4. the overflow parks queries that were driver-green in the most
#      recent round that checked them AND whose lineage this round's
#      diff does not touch.
#
# STALENESS BOUND (ADVICE r9, medium): the ≤3-artifact bound is
# evaluated AS OF WINDOW CONSTRUCTION — the last three artifacts with
# round < _WINDOW_ROUND. The current round's own artifact (written by
# the driver at round end, round == _WINDOW_ROUND) re-checks the
# current window and never shrinks coverage, so it is excluded from
# the bound rather than allowed to retro-invalidate a legal parking
# decision. The forcing function moves to
# test_window_rotated_for_every_artifact: an artifact with round >
# _WINDOW_ROUND on disk means a new round began — that test goes red
# with a message naming the rotation, by design, until the new
# round's first commit rotates the window and bumps _WINDOW_ROUND.
#
# CAPACITY under ≤3: a 50-slot window sustains 4×50 − 3
# (user_sessions occupies a slot every round) = 197 queries; the
# registry size is asserted against that ceiling in
# tests/test_registry_rotation.py::test_registry_within_window_capacity.
# DECISION RULE when a round's mandatory returns + rule-1
# registrations would exceed 50 (VERDICT r9 item 7): prefer RETIRING
# a redundant variant (e.g. one of the three rolling-distinct
# flavors) over moving the staleness bound again — a 5-round cycle
# would outlive the local suite's regression horizon, while redundant
# variants are exactly the coverage a full window can't afford.
#
# ROUND-10 WINDOW: the five r6 deferrals (mandatory — at r10 the
# last-three artifacts are r7/r8/r9 and they are in none), plus
# user_sessions (rule 3), plus the rule-2 touched set (the dedup-core
# perf pass — packed band keys + the pointer-jump/pair-graph CC
# rework — touches the LSH pair queries AND every resolve_near_dups
# consumer; the DSIR persist-finalizer and COALESCE fixes touch the
# DSIR/token-dup queries; the running_sum persist-guard fixes touch
# the two event prefix-sum queries; see _TOUCHED_THIS_ROUND), plus
# the round-10 registration doc_dsir_admissions (rule 1), plus 30 of
# the 49-query r7-checked block (stale at r11 otherwise — the 19
# deferred to the r11 window are listed at the head of _CHECK_LAST).
# Exactly 50.
#
# ROUND-11 QUEUE (precomputed): mandatory returns are the 19 r7
# deferrals at the head of _CHECK_LAST (at r11 the last-three
# artifacts are r8/r9/r10 and they sit only in r7) plus
# user_sessions. SCHEDULE THROUGH r13 (computed from the post-r10
# last-checked map: 19 r7 / 44 r8 / 41 r9 / 50 r10): r11 = 19 + 30 of
# the r8 block + user_sessions (EXACTLY 50, zero slack); r12 = the
# remaining 14 r8 + 35 of the r9 block + user_sessions (50, zero
# slack); r13 = the remaining 6 r9 + 43 r10-checked + user_sessions
# (50). Feasible with NO retirements — but r11 and r12 have ZERO
# slack for rule-1 registrations or broad rule-2 touches, so in those
# rounds every new registration (or module-wide perf pass) must be
# paid for by retiring a redundant variant per the decision rule
# above (first candidates: the four rolling/weekly-distinct flavors —
# rolling_7d_distinct_users/_exact, weekly_user_distinct_exact,
# weekly_user_sketch_rollup — and the three near-identical asof
# variants). The BPE perf pass originally queued for r11 landed in
# r10 after all: the "shares operators/bpe.py with the r8-parked
# doc_bpe_token_counts" premise was wrong — token_counts consumes
# text.bpe_ish_token_count, not bpe.py, so the trainer rework touches
# only the in-window doc_bpe_merges (see _TOUCHED_THIS_ROUND).
# r11 PERF QUEUE (both blocked by rule 2 this round, both measured
# and ready):
#   1. doc_lm_score — MEASURED SUPERLINEAR at the 500k probe point
#      (BENCH_NOTES_r10 "ret-xl": broadcast→sort-merge phase change;
#      the banked fix is two .hint("SHUFFLE_HASH") on the c2/c1 joins
#      in retrieval.bigram_lm_scores, measured ~4× at 500k). Consumers
#      doc_lm_score (r8-parked, in-window at r11 anyway) and
#      doc_lm_outliers (r9-parked — +1 over the zero-slack r11 window,
#      so pay for it by retiring one redundant rolling-distinct
#      variant per the decision rule, or split: hint lands at r11,
#      doc_lm_outliers re-checks at r12 when its block rotates in —
#      NOT legal; rule 2 forces both at r11, so plan the retirement).
#   2. doc_char_entropy (5.2 s in the final r10 sweep — slowest parked
#      query; r8-checked, rotates in at r11, no extra churn).

_WINDOW_ROUND = 10

# Rule-2 ledger: queries whose code or oracle this round's diff
# touched (directly or through a plan-lineage function they consume).
# The rotation test enforces these sit inside the window.
_TOUCHED_THIS_ROUND = [
    "doc_minhash_near_dups",       # MinHash signature fusion + band-key packing
    "doc_dedup_final_lsh",         # same core (minhash_near_dups)
    "doc_arrivals_dedup_lsh",      # same core (incremental cross-side)
    "doc_arrivals_dedup_store",    # same core (vs-store serving path)
    "doc_split_leakage_audit_lsh",  # same core (minhash_near_dups)
    "doc_dsir_weights",            # DSIR persist-finalizer fix (ADVICE r9)
    "doc_dsir_sample",             # DSIR persist-finalizer fix (ADVICE r9)
    "doc_token_dup_share",         # empty-corpus COALESCE fix (ADVICE r9)
    "doc_dsir_admissions",         # new registration (rule 1): gate landing
    # connected_components/resolve_near_dups rework (pointer jumping,
    # pair-graph-only iteration) — every CC consumer re-checks
    "doc_dedup_final",
    "doc_dedup_keep_best",
    "doc_dedup_cluster_stats",
    "embedding_dedup_final",
    "embedding_dedup_final_lsh",
    "asset_near_dups",             # carry_cache_deps fix (defeated persist)
    # running_sum's pid-stamp persist is a CORRECTNESS guard; the two
    # consumers composed it lazily and fired the finalizer early
    # (code-review finding) — fixed with carry_cache_deps, re-check
    "events_value_running_total",
    "events_activity_concurrency",
    # BPE trainer rework (distributed word-count pass + single-task
    # incremental merge loop): doc_bpe_merges is the ONLY registered
    # consumer of bpe.py (doc_bpe_token_counts uses
    # text.bpe_ish_token_count) and sits in the r7-return block above
    "doc_bpe_merges",
]

_CHECK_FIRST = [
    # --- last checked r6: mandatory this round (in none of r7/r8/r9) ---
    "returnflag_cube",
    "order_date_parts",
    "buyer_eventer_intersect",
    "buyers_not_eventers_except",
    "returnflag_status_pivot",
    # --- incident-prone events.ts lineage, in-window every round ---
    "user_sessions",
    # --- r9-checked but rule-2 touched by this round's diff ---
    "doc_arrivals_dedup_lsh",
    "doc_arrivals_dedup_store",
    "doc_split_leakage_audit_lsh",
    "doc_dsir_weights",
    "doc_dsir_sample",
    "doc_token_dup_share",
    # --- r7-checked block rotating back in (stale at r11 otherwise);
    # includes the rule-2-touched doc_dedup_final_lsh /
    # doc_minhash_near_dups / doc_duplicate_spans lineages ---
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
    "doc_repetition_signals",
    "doc_pii_scrub",
    "embedding_lsh_topk",
    "embedding_ivf_topk",
    "segment_event_value_salted",
    "order_rank_flavors",
    "pricing_summary",
    "shipping_priority",
    "nation_revenue",
    "returnflag_rollup",
    "embedding_pq_topk",
    "ivf_imbalance",
    "doc_bpe_merges",
    "asset_near_dups",
    "doc_duplicate_spans",
    "rolling_7d_distinct_exact",
    # --- new this round (rule 1): the DSIR admission gate's landed
    # decision table (VERDICT r9 item 3) ---
    "doc_dsir_admissions",
    # --- rule 2: the CC rework (pointer jumping, pair-graph-only
    # iteration) touches every resolve_near_dups consumer — the five
    # parked ones re-check this round; five untouched r7-block members
    # moved to the r11 mandatory queue to make room ---
    "doc_dedup_final",
    "doc_dedup_keep_best",
    "doc_dedup_cluster_stats",
    "embedding_dedup_final",
    "embedding_dedup_final_lsh",
    # --- rule 2: running_sum persist-finalizer fixes (correctness
    # guard per prefix.py) ---
    "events_value_running_total",
    "events_activity_concurrency",
]
_CHECK_LAST = [
    # checked r7, deferred to the r11 window under the
    # as-of-construction ≤3 bound — MANDATORY in the r11 window
    "order_price_percentiles",
    "doc_source_mix",
    "asset_features",
    "user_sessions_native",
    "events_daily_tumbling",
    "events_sliding_windows",
    "customer_snapshot_diff",
    "customer_order_deltas",
    "order_approx_stats",
    "asset_content_hashes",
    "weekly_user_sketch_rollup",
    "customer_rolling_spend",
    "part_text_features",
    "csv_quarantine_counts",
    "clicks_asof_prior_view",
    "error_followup_counts",
    "priority_returns_exists",
    "small_qty_part_revenue",
    "activity_union_by_name",
    # checked r8, parked (rotates in at r11 — stale at r12)
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
    "customer_scd1_merge",
    "doc_hybrid_rrf",
    "doc_quality_classifier",
    "customer_cdc_apply",
    "orders_profile",
    "user_conversion_funnel",
    "doc_per_source_sample",
    "fk_integrity_audit",
    "orders_expectations",
    "events_forward_fill",
    "volume_shipping",
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
    "weekly_user_distinct_exact",
    "embedding_ivfpq_topk",
    "doc_eval_span_overlap",
    # checked r9, parked
    "published_segment_kpis",
    "top_return_customers",
    "nation_revenue_pareto",
    "doc_token_budget_sample",
    "doc_lang_confusion",
    "embedding_hard_negatives",
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
    "doc_decontamination_bloom",
    "doc_lm_outliers",
    "daily_new_users_cumulative",
    "doc_length_buckets",
    "order_quantity_arrays",
    "event_key_skew_profile",
    "doc_split_assignment",
    "doc_split_leakage_audit",
    "doc_vocab_coverage",
    "lineitem_winsorized_stats",
    "eventers_orderers_full_outer",
    "top_orders_global",
    "customers_without_events_anti",
    "doc_scrub_duplicate_spans",
    "doc_source_quality_buckets",
    "doc_source_token_budget",
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
