"""Construction-cost probe for the r14 memo-adoption campaign.

Times DataFrame CONSTRUCTION (plan-function call + optimizedPlan, no
execution) for the campaign's target queries, and dumps the
normalized optimized plan (exprIds/plan_ids masked) so plan identity
across code versions is checkable byte-for-byte.

Modes:
  python tools/probe_construct_r14.py before   # plain timings + plans
  python tools/probe_construct_r14.py after    # interleaved A/B:
      memo CLEARED before each rep (the pre-change read path: a miss
      in read_parquet_memo is exactly `spark.read.parquet`) vs memo
      WARM (the new path) — one session, alternating, best-of-N.

Timing discipline per BENCH_NOTES_r13: one session, alternate reps,
report best (host drift 2-4x on minute timescales).
"""

from __future__ import annotations

import gc
import json
import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")

from etl_with_s3__dynamodb_and_glue_spark import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("PROBE_REPS", "5"))

TARGETS = [
    # headline
    "customer_order_deltas",
    "events_json_extract",
    "user_sessions",
    "customer_rolling_spend",
    "clicks_asof_prior_view",
    "error_followup_counts",
    "asset_content_hashes",
    "doc_minhash_near_dups",
    # bench extras
    "events_value_running_total",
    "events_activity_concurrency",
    "doc_bm25_topk",
    "doc_lm_score",
    "doc_hybrid_rrf",
    "doc_boilerplate_fraction",
    "doc_dsir_weights",
    "doc_dsir_sample",
    "doc_source_quality_buckets",
    "lineitem_winsorized_stats",
    "doc_split_leakage_audit_lsh",
    # registry in-window percentile consumers
    "order_price_percentiles",
    "orders_price_decile_bins",
    "doc_lm_outliers",
    "doc_dedup_final_lsh",
]


def _norm(s: str) -> str:
    s = re.sub(r"#\d+", "#N", s)
    return re.sub(r"plan_id=\d+", "plan_id=N", s)


def _clear_memos() -> None:
    from etl_with_s3__dynamodb_and_glue_spark.sources import readers

    readers._SCHEMA_MEMO.clear()


def main() -> None:
    mode = sys.argv[1]
    names = sys.argv[2:] or TARGETS
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    spark = get_spark(f"probe-construct-{mode}")
    plans_dir = f"/tmp/construct_plans_{mode}"
    os.makedirs(plans_dir, exist_ok=True)
    out = {}
    for name in names:
        # warm this query's lineage once (classloading, store builds)
        df = qs[name](spark, SF_DIR)
        df._jdf.queryExecution().optimizedPlan()

        def construct(clear: bool) -> float:
            if clear:
                _clear_memos()
            gc.collect()
            t0 = time.perf_counter()
            d = qs[name](spark, SF_DIR)
            d._jdf.queryExecution().optimizedPlan()
            return time.perf_counter() - t0

        if mode == "before":
            ts = [round(construct(False), 3) for _ in range(REPS)]
            out[name] = {"construct_s": ts, "best": min(ts)}
        else:
            cleared, warm = [], []
            for _ in range(REPS):
                cleared.append(round(construct(True), 3))
                warm.append(round(construct(False), 3))
            out[name] = {
                "cleared_s": cleared,
                "warm_s": warm,
                "best_cleared": min(cleared),
                "best_warm": min(warm),
            }
        plan = _norm(
            qs[name](spark, SF_DIR)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        with open(f"{plans_dir}/{name}.txt", "w") as f:
            f.write(plan)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
