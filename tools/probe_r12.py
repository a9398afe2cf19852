"""Round-12 scale probe for the four touched lineages.

Usage: python tools/probe_r12.py [docs|rel]

* ``docs``  — doc_novelty_fraction (join-free owner rework) and
  doc_source_quality_buckets (distributed-selection terciles) over the
  50k→500k corpus decade (.scale_probe/n50k, n500k).
* ``rel``   — orders_price_decile_bins (ungrouped distributed
  selection) and lineitem_winsorized_stats (grouped) over the
  10×→100× relational decade (.scale_probe/t10x, t100x).
* ``emb``   — the ANN serving family's THIRD decade (1M→10M vectors,
  .scale_probe/e1m, e10m) — carried from the r10 brief twice; this is
  the decade where the indexed-vs-brute separation claim either holds
  or breaks, and where the 1M index-build cost (k-means-dominated,
  r10 notes) gets its 10M measurement. Index builds print untimed-
  build lines like the xl probe; serving reps=2 (docs-xxl precedent:
  treat same-session reps as a smoke record, quote fresh-session
  steady state).

Reuses tools/scale_probe.py's corpus generators, warm-up discipline and
noop-sink timing; run each family in its OWN fresh process, never
concurrently with another Spark job (BENCH_NOTES_r10 hygiene).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import scale_probe as sp  # noqa: E402

from etl_with_s3__dynamodb_and_glue_spark import get_spark  # noqa: E402

BASE = os.path.join("/root/repo", ".scale_probe")


def _time_single_size(spark, qs, queries, size_name: str, reps: int = 2):
    """One size point in its own fresh session — the emb decade-3
    variant of scale_probe._time_queries. The single-session two-point
    methodology OOMed at e10m even at 64g heap: the e1m builds' session
    residue (cached index frames, MLlib init working set) stacked under
    the e10m k-means|| init. docs-xxl's own hygiene note already
    prefers fresh-session steady state at these sizes; exponents are
    assembled from the two logs."""
    import gc
    import json as _json
    import time as _time

    for q in queries:
        best = None
        for rep in range(reps):
            spark.catalog.clearCache()
            gc.collect()
            spark._jvm.System.gc()
            t0 = _time.perf_counter()
            qs[q](spark, os.path.join(BASE, size_name)).write.format(
                "noop"
            ).mode("overwrite").save()
            dt = round(_time.perf_counter() - t0, 3)
            best = dt if best is None or dt < best else best
            print(
                _json.dumps(
                    {"query": q, "size": size_name, "rep": rep, "sec": dt}
                ),
                flush=True,
            )
        print(
            _json.dumps({"query": q, "size": size_name, "sec_best": best}),
            flush=True,
        )


# r12-window lineages with no XL row on record (r11 precedent: every
# in-window lineage gets a second-decade probe). doc_split_leakage_audit
# is EXCLUDED by design: the exact all-pairs twin is the deliberately
# small-N oracle path — its scale path is the already-probed _lsh
# variant. user_sessions / doc_char_entropy / the five reworked queries
# already have r12 rows.
WIN_DOCS = [
    "doc_per_source_sample",
    "doc_training_order",
    "doc_curation_funnel",
    "doc_encoding_audit",
    "doc_decontamination_bloom",
    "doc_length_buckets",
    "doc_split_assignment",
    "doc_vocab_coverage",
    "doc_source_token_budget",
    # doc_arrivals_dedup EXCLUDED mid-sweep (measured 868.6 s at a
    # MERE 50k docs): like doc_split_leakage_audit it is the
    # documented exact O(|A|·|C|) oracle twin (llm_ops.py:1187) —
    # small-N by design; the shape a real ingest runs is
    # doc_arrivals_dedup_lsh/_store, both already probed (store axis
    # through THREE decades). An all-pairs twin's cost curve is not a
    # finding, it's its definition.
    "asset_frame_samples",
]
WIN_REL = [
    "customer_scd1_merge",
    "customer_cdc_apply",
    "orders_profile",
    "user_conversion_funnel",
    "fk_integrity_audit",
    "orders_expectations",
    "events_forward_fill",
    "volume_shipping",
    "user_daily_anomalies",
    "serving_top_rows_lookup",
    "events_daily_complete",
    "user_weekly_retention",
    "event_type_transitions",
    "events_daily_rollup_incremental",
    "event_type_cooccurrence",
    "events_wow_change",
    "segment_nation_chi2",
    "part_name_fuzzy_matches",
    "lineitem_corr_matrix",
    "customer_scd2_apply",
    "customer_balance_zscores",
    "orders_pit_customer_balance",
    "rolling_7d_distinct_users",
    "events_customers_null_bypass",
    "clicks_asof_recent_view",
    "daily_new_users_cumulative",
    "order_quantity_arrays",
    "event_key_skew_profile",
    "eventers_orderers_full_outer",
    "top_orders_global",
    "customers_without_events_anti",
]


def _sweep(spark, qs, queries, small: str, big: str, reps: int = 3):
    """r11-style window sweep with per-query failure isolation (a
    query that needs a table the probe corpus lacks records an error
    instead of killing the family) and a long-rep guard (rep 1 over
    300 s skips further reps — the number is already the story)."""
    import gc
    import json as _json
    import math
    import time as _time

    for q in queries:
        best = {}
        for size in (small, big):
            reps_done = []
            for rep in range(reps):
                spark.catalog.clearCache()
                gc.collect()
                spark._jvm.System.gc()
                t0 = _time.perf_counter()
                try:
                    qs[q](spark, os.path.join(BASE, size)).write.format(
                        "noop"
                    ).mode("overwrite").save()
                except Exception as exc:  # noqa: BLE001
                    print(
                        _json.dumps(
                            {
                                "query": q,
                                "size": size,
                                "error": f"{type(exc).__name__}: {exc}"[:300],
                            }
                        ),
                        flush=True,
                    )
                    break
                dt = round(_time.perf_counter() - t0, 3)
                reps_done.append(dt)
                print(
                    _json.dumps(
                        {"query": q, "size": size, "rep": rep, "sec": dt}
                    ),
                    flush=True,
                )
                if dt > 300:
                    break
            if reps_done:
                best[size] = min(reps_done)
        if len(best) == 2 and best[small] > 0:
            print(
                _json.dumps(
                    {
                        "query": q,
                        f"sec_{small}": best[small],
                        f"sec_{big}": best[big],
                        "scaling_exponent": round(
                            math.log(best[big] / best[small]) / math.log(10), 3
                        ),
                    }
                ),
                flush=True,
            )


def main() -> None:
    family = sys.argv[1] if len(sys.argv) > 1 else "docs"
    extra = {}
    if family in ("stores", "emb", "emb1m", "emb10m"):
        # broadcast construction collects task results to the driver;
        # the s500k store side measured ~1.1 GiB against the 1g
        # default maxResultSize (see BENCH_NOTES_r12 §6 — the 64 MB
        # autoBroadcastJoinThreshold vs zstd-compressed size estimates
        # interaction is itself a recorded scale finding)
        extra["spark.driver.maxResultSize"] = "8g"
    spark = get_spark(f"probe-r12-{family}", extra_conf=extra)
    qs = sp._registry()
    if family in ("emb1m", "emb10m"):
        sizes = (
            {"e1m": 1_000_000}
            if family == "emb1m"
            else {"e10m": 10_000_000}
        )
        sp._prep_embedding_corpora(spark, BASE, sizes)
        _time_single_size(spark, qs, sp.EMB_QUERIES, next(iter(sizes)))
        return
    if family in ("emb1m-ivf", "emb10m-ivf"):
        # IVF-only decade-3 variant: ensure_pq_index trains codebooks
        # on the FULL corpus (quantization.train_pq default
        # train_fraction=1.0) and OOMed the 96g single-JVM heap at
        # 10M vectors — sampled codebook training is banked for r13
        # (the embedding_pq/ivfpq lineages rotate in then). The
        # decade-3 headline claim (indexed-vs-brute separation) needs
        # only brute + IVF, whose build trains on a 25% sample.
        import json as _json
        import time as _time

        from etl_with_s3__dynamodb_and_glue_spark.plans import llm_ops

        size_name = "e1m" if family == "emb1m-ivf" else "e10m"
        n = 1_000_000 if size_name == "e1m" else 10_000_000
        d = os.path.join(BASE, size_name)
        if not os.path.isdir(os.path.join(d, "embeddings.parquet")):
            sp.gen_embeddings(n, d)
        t0 = _time.perf_counter()
        llm_ops.ensure_ivf_index(spark, d)
        print(
            _json.dumps(
                {
                    "build": f"ivf_{size_name}",
                    "sec": round(_time.perf_counter() - t0, 3),
                    "timed": False,
                }
            ),
            flush=True,
        )
        _time_single_size(
            spark,
            qs,
            ["embedding_topk_bruteforce", "embedding_ivf_topk"],
            size_name,
            reps=3,
        )
        return
    if family == "docs":
        for name, n in sp.XL_SIZES.items():
            d = os.path.join(BASE, name)
            if not os.path.isdir(os.path.join(d, "documents.parquet")):
                sp.gen_documents(n, d)
        qs["doc_token_stats"](spark, os.path.join(BASE, "n50k")).collect()
        sp._time_queries(
            spark,
            ["doc_novelty_fraction", "doc_source_quality_buckets"],
            sp.XL_SIZES,
            BASE,
            "n50k",
            "n500k",
            reps=3,
        )
    elif family == "rel":
        for name, scale in sp.REL_XL_SIZES.items():
            d = os.path.join(BASE, name)
            if not os.path.isdir(os.path.join(d, "lineitem.parquet")):
                sp.gen_relational(scale, d)
        qs["pricing_summary"](spark, os.path.join(BASE, "t10x")).collect()
        sp._time_queries(
            spark,
            ["orders_price_decile_bins", "lineitem_winsorized_stats"],
            sp.REL_XL_SIZES,
            BASE,
            "t10x",
            "t100x",
            reps=4,
        )
    elif family == "win-docs":
        only = set(sys.argv[2:])
        for name, n in sp.XL_SIZES.items():
            d = os.path.join(BASE, name)
            if not os.path.isdir(os.path.join(d, "documents.parquet")):
                sp.gen_documents(n, d)
        qs["doc_token_stats"](spark, os.path.join(BASE, "n50k")).collect()
        sel = [q for q in WIN_DOCS if not only or q in only]
        _sweep(spark, qs, sel, "n50k", "n500k", reps=3)
    elif family == "win-rel":
        only = set(sys.argv[2:])
        for name, scale in sp.REL_XL_SIZES.items():
            d = os.path.join(BASE, name)
            if not os.path.isdir(os.path.join(d, "lineitem.parquet")):
                sp.gen_relational(scale, d)
        qs["pricing_summary"](spark, os.path.join(BASE, "t10x")).collect()
        sel = [q for q in WIN_REL if not only or q in only]
        _sweep(spark, qs, sel, "t10x", "t100x", reps=3)
    elif family == "stores":
        # THIRD decade of the STORE-SIZE axis (500k→5M-doc signature
        # stores, fixed 500-doc arrival batch) — r10 brief item 6,
        # carried twice. Mirrors tools/scale_probe.py::probe_stores_xl
        # one decade up; the n5m corpus already exists from the r11
        # docs-xxl probes. The claim under test: serving cost vs
        # absorbed history — decade 2 measured 0.29, and the serving
        # join's store side (S × bands exploded 8-byte keys) is the
        # term that could drift toward linear as S dominates.
        import shutil

        from pyspark.sql import functions as F

        from etl_with_s3__dynamodb_and_glue_spark.operators import dedup

        sizes = {"n500k": 500_000, "n5m": 5_000_000}
        for name, n in sizes.items():
            d = os.path.join(BASE, name)
            if not os.path.isdir(os.path.join(d, "documents.parquet")):
                sp.gen_documents(n, d)
        docs500k = spark.read.parquet(
            os.path.join(BASE, "n500k", "documents.parquet")
        )
        docs5m = spark.read.parquet(
            os.path.join(BASE, "n5m", "documents.parquet")
        )
        sdir = os.path.join(BASE, "stores_xxl")
        shutil.rmtree(sdir, ignore_errors=True)
        os.makedirs(sdir)
        sp._noop(dedup.exact_dedup(docs500k.limit(200)))
        mh = {}
        import json as _json
        import time as _time

        for name, docs in (("s500k", docs500k), ("s5m", docs5m)):
            p = os.path.join(sdir, f"minhash_{name}")
            t0 = _time.perf_counter()
            dedup.build_minhash_store(docs, p)
            print(
                _json.dumps(
                    {
                        "build": f"minhash_store_{name}",
                        "sec": round(_time.perf_counter() - t0, 3),
                        "timed": False,
                    }
                )
            )
            mh[name] = p

        def arrivals(n):
            # n500k is an exact prefix of n5m (shared generator seed),
            # so these re-keyed rows carry real dups against BOTH
            # stores; read them from the SMALLER corpus (matches the
            # stores-xl decade-2 arrivals construction — filtering the
            # 5M table gave the optimizer a corpus-sized size estimate)
            return docs500k.filter(F.col("doc_id") < n).withColumn(
                "doc_id", F.col("doc_id") + 10_000_000
            )

        serve = {}
        for name in ("s500k", "s5m"):
            store = dedup.load_minhash_store(spark, mh[name])
            serve[name] = sp._probe_call(
                spark,
                "minhash_store_serving",
                lambda rep, s=store: sp._noop(
                    dedup.minhash_near_dups_vs_store(arrivals(500), s)
                ),
                store=name,
                batch=500,
            )
        sp._exp_line(
            "minhash_store_serving_vs_store_size_decade3",
            serve["s500k"],
            serve["s5m"],
            batch=500,
        )
    elif family == "emb":
        xxl_sizes = {"e1m": 1_000_000, "e10m": 10_000_000}
        sp._prep_embedding_corpora(spark, BASE, xxl_sizes)
        sp._time_queries(
            spark, sp.EMB_QUERIES, xxl_sizes, BASE, "e1m", "e10m", reps=2
        )
    else:
        sys.exit("family must be docs, rel or emb")


if __name__ == "__main__":
    main()
