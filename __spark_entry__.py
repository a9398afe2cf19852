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
# policy (round 11 edition). Rotation rules (tested by
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
# ROUND-11 WINDOW (the precomputed zero-slack round): the 19 r7
# deferrals from the head of the r10 _CHECK_LAST (mandatory — at r11
# the last-three artifacts are r8/r9/r10 and they sit only in r7),
# plus user_sessions (rule 3), plus doc_lm_outliers (rule 2: the
# banked SHUFFLE_HASH fix in retrieval.bigram_lm_scores lands this
# round and touches both consumers), plus 29 of the r8-checked block
# (including the rule-2-touched doc_lm_score and doc_char_entropy —
# the round's two queued perf passes). doc_lm_outliers' +1 over the
# zero-slack window is PAID FOR by retiring weekly_user_distinct_exact
# per the decision rule above (the most redundant of the four
# rolling/weekly-distinct flavors: its mechanism — date_trunc +
# countDistinct — is pinned by several other hash-green queries, and
# the trickier calendar-RANGE semantics twin rolling_7d_distinct_exact
# stays; the function remains in functions_surface.py as a
# pytest-only twin for the sketch-error-envelope / timezone / empty
# suites). Registry 154 → 153. Exactly 50.
#
# SCHEDULE THROUGH r13 (recomputed post-retirement from the
# last-checked map: 19 r7 / 43 r8 / 41 r9 / 50 r10, doc_lm_outliers
# re-checking at r11): r11 = 19 r7 + user_sessions + doc_lm_outliers
# + 29 r8 (EXACTLY 50, zero slack); r12 = the remaining 14 r8
# (head of _CHECK_LAST) + 35 of the 40-query r9 block + user_sessions
# (50, zero slack); r13 = the remaining 5 r9 + 43 r10-checked +
# user_sessions (49 — ONE slack slot).
#
# r13 PERF/FIX QUEUE (banked, blocked by rule 2 this round):
#   1. ADVICE r10 item 1 (dedup.py:823): on the distributed CC path
#      the caller's unpartitioned edges_sym persist stays pinned while
#      _pointer_jump_components persists a repartitioned copy —
#      double cache footprint on exactly the crawl-scale path. Fix =
#      materialize the repartitioned copy then unpersist the source
#      inside _pointer_jump_components (or skip the caller persist
#      when n_sym > CC_LOCAL_MAX_EDGES). Touches connected_components
#      → every resolve_near_dups consumer (doc_dedup_final,
#      doc_dedup_keep_best, doc_dedup_cluster_stats,
#      embedding_dedup_final, embedding_dedup_final_lsh,
#      doc_dedup_final_lsh, asset_near_dups ...) — ALL r10-checked,
#      all naturally in the r13 window; landing it at r11/r12 would
#      blow the zero-slack windows for a dormant-path cache nit.
#      (ADVICE r10 item 2 — the string-id caveat on
#      CC_LOCAL_MAX_EDGES — is comment-only, landed at r11: no
#      behavior change, so no rule-2 entry.)

_WINDOW_ROUND = 11

# Rule-2 ledger: queries whose code or oracle this round's diff
# touched (directly or through a plan-lineage function they consume).
# The rotation test enforces these sit inside the window.
_TOUCHED_THIS_ROUND = [
    # the banked SHUFFLE_HASH hints in retrieval.bigram_lm_scores
    # (the r10-measured broadcast→sort-merge phase change at 500k
    # docs) — both consumers re-check
    "doc_lm_score",
    "doc_lm_outliers",
    # char_entropy rework (operators/text.py): O(distinct×len) per-row
    # scan → sort + run-length; doc_char_entropy is its only consumer
    "doc_char_entropy",
    # the same sort-merge phase-change class found-and-fixed in
    # curation.boilerplate_fraction (A/B at 500k: 33.6 → 12.0 s);
    # doc_boilerplate_fraction is its only registered consumer
    "doc_boilerplate_fraction",
    # native-percentile holistic-aggregate fix (r11 probe finding):
    # swapped to operators/percentiles.py distributed selection —
    # bit-equal to percentile() by test; doc_lm_outliers (already
    # listed above for the LM hints) got the ungrouped form
    "order_price_percentiles",
    # TF ⋈ DF SHUFFLE_HASH (same join-fallback class, shipped on
    # structural grounds — local wash, see BENCH_NOTES_r11 §5);
    # doc_tfidf_top_terms is terms.tfidf_top_terms' only consumer
    "doc_tfidf_top_terms",
]

# r12 PERF QUEUE (banked this round, blocked by rule 2 — lineages
# parked until their blocks rotate in):
#   1. doc_novelty_fraction (r9-parked, rotates in at r12): carries
#      an inline copy of boilerplate_fraction's OLD two-shuffle
#      join-back skeleton. Do NOT just hint it — the r11 saga
#      (BENCH_NOTES_r11 §3) showed the 5-gram build side is unbounded
#      (SHUFFLE_HASH OOMed at 5M docs). The right fix is the
#      join-free owner rework that shipped in boilerplate_fraction,
#      and for novelty it is EXACT with no min_docs restriction:
#      novelty_frac(doc) = |grams with min(doc_id) == doc| /
#      n_distinct(doc) — the same single gram-key aggregate carrying
#      min(doc_id), a tiny owner groupBy, and a doc-keyed join.
#      Remember tokenize-staging + hashed gram keys + the base
#      persist (each independently measured load-bearing in r11).
#   2. While landing it, audit the remaining aggregate-join-back
#      patterns in then-in-window lineages — but classify build
#      sides first: vocabulary-bounded (hint-safe: bigram_lm_scores,
#      tfidf) vs corpus-proportional (hint = OOM at scale: n-gram
#      tables; restructure instead).
#   3. Native-percentile() holistic-aggregate class (r11 finding,
#      fixed in-window via operators/percentiles.py distributed
#      selection — order_price_percentiles 40→8 s at 100×): three
#      parked users remain — orders_price_decile_bins +
#      lineitem_winsorized_stats (r9-parked, rotate in at r12) and
#      doc_source_quality_buckets (r10-parked, r13; per-source
#      terciles = the grouped form). Swap each to
#      group_percentiles_exact when its block rotates in; the
#      bit-equality suite (tests/test_percentiles.py) guarantees
#      oracle hashes cannot move.

_CHECK_FIRST = [
    # --- checked r7, in none of r8/r9/r10: mandatory this round ---
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
    # --- incident-prone events.ts lineage, in-window every round ---
    "user_sessions",
    # --- rule 2: the banked SHUFFLE_HASH fix in bigram_lm_scores
    # touches both consumers; doc_lm_outliers (r9-checked) is the +1
    # paid for by the weekly_user_distinct_exact retirement ---
    "doc_lm_outliers",
    # --- r8-checked block rotating back in (stale at r12 otherwise);
    # includes the rule-2-touched doc_lm_score and doc_char_entropy
    # (this round's two queued perf passes); the 14 deferred to the
    # r12 window are listed at the head of _CHECK_LAST ---
    "doc_lm_score",
    "doc_char_entropy",
    "orders_price_histogram",
    "doc_chunks",
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
    "doc_boilerplate_fraction",
    "doc_hybrid_rrf",
    "doc_quality_classifier",
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
    "embedding_ivfpq_topk",
    "doc_eval_span_overlap",
]
_CHECK_LAST = [
    # checked r8, deferred to the r12 window under the
    # as-of-construction ≤3 bound — MANDATORY in the r12 window
    "customer_scd1_merge",
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
    # checked r9, parked (35 rotate in at r12, the last 5 at r13;
    # doc_lm_outliers moved to this round's window under rule 2)
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
    # checked r10, parked (rotates in at r13)
    "returnflag_cube",
    "order_date_parts",
    "buyer_eventer_intersect",
    "buyers_not_eventers_except",
    "returnflag_status_pivot",
    "doc_arrivals_dedup_lsh",
    "doc_arrivals_dedup_store",
    "doc_split_leakage_audit_lsh",
    "doc_dsir_weights",
    "doc_dsir_sample",
    "doc_token_dup_share",
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
    "doc_dsir_admissions",
    "doc_dedup_final",
    "doc_dedup_keep_best",
    "doc_dedup_cluster_stats",
    "embedding_dedup_final",
    "embedding_dedup_final_lsh",
    "events_value_running_total",
    "events_activity_concurrency",
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
