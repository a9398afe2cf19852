"""Round-13 scale probes: the three banked fixes under load, plus the
r13-window lineages with no XL row on record.

Usage: python tools/probe_r13.py [stores|pq e1m|pq e10m|win-docs|win-rel|win-emb]

* ``stores``  — decade-3 store serving (500k/5M-doc signature stores,
  500-doc batch) RE-RUN WITHOUT the ``spark.driver.maxResultSize``
  crutch the r12 probe needed: the broadcast-side pin in
  ``minhash_near_dups_vs_store`` must hold the driver collection to
  the batch-derived sides at the DEFAULT 1g limit, or the fix did not
  close the driver-OOM class it was banked for (BENCH_NOTES_r12 §7).
* ``pq e1m`` / ``pq e10m`` — the PQ family's third decade, unblocked
  by sampled codebook training (quantization.train_pq max_train_rows):
  per-size fresh sessions (the single-session two-point methodology
  OOMed at e10m — probe_r12 note), separate untimed build lines for
  IVF / PQ / IVF-PQ, then embedding_pq_topk + embedding_ivfpq_topk
  serving reps. Exponents are assembled from the two logs.
* ``win-docs`` / ``win-rel`` / ``win-emb`` — second-decade sweep for
  the r13-window lineages with no XL row in SCALING.md or any
  BENCH_NOTES (the six r9 deferrals plus seven r10-checked queries
  whose families were never probed by name). ``doc_jaccard_pairs`` is
  EXCLUDED by the standing cause: it is the documented exact
  all-pairs oracle twin (same class as doc_arrivals_dedup /
  doc_split_leakage_audit) — its scale shape is the already-probed
  minhash/simhash banded paths.

Reuses tools/scale_probe.py's corpus generators, warm-up discipline
and noop-sink timing; run each family in its OWN fresh process, never
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

WIN_DOCS = [
    "doc_lang_confusion",
    "doc_token_budget_sample",
    "doc_exact_dedup",
    "doc_simhash_near_dups",
    "doc_pii_scrub",
    "doc_dsir_admissions",
]
WIN_REL = [
    "published_segment_kpis",
    "top_return_customers",
    "nation_revenue_pareto",
    "flagship_daily_segment_topk",
    "segment_kpis_compat",
    "top_rows_per_day_compat",
    "segment_event_value_salted",
    "order_rank_flavors",
]
# exact brute-force scorer — expect the bruteforce family's linear
# shape (e100k→e1m like the rest of the embedding decade-2 rows)
WIN_EMB = ["embedding_hard_negatives"]


def _sweep(spark, qs, queries, small: str, big: str, reps: int = 3):
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
                            math.log(best[big] / best[small]) / math.log(10),
                            3,
                        ),
                    }
                ),
                flush=True,
            )


def _probe_stores(spark) -> None:
    """probe_r12's stores family minus the 8g maxResultSize override —
    the point IS running at the 1g default."""
    import json as _json
    import shutil
    import time as _time

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
    docs5m = spark.read.parquet(os.path.join(BASE, "n5m", "documents.parquet"))
    sdir = os.path.join(BASE, "stores_xxl")
    shutil.rmtree(sdir, ignore_errors=True)
    os.makedirs(sdir)
    sp._noop(dedup.exact_dedup(docs500k.limit(200)))
    mh = {}
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
            ),
            flush=True,
        )
        mh[name] = p

    def arrivals(n):
        # n500k is an exact prefix of n5m (shared generator seed) —
        # see probe_r12's stores family for why arrivals read the
        # SMALLER corpus
        return docs500k.filter(F.col("doc_id") < n).withColumn(
            "doc_id", F.col("doc_id") + 10_000_000
        )

    serve = {}
    for name in ("s500k", "s5m"):
        store = dedup.load_minhash_store(spark, mh[name])
        serve[name] = sp._probe_call(
            spark,
            "minhash_store_serving_pinned",
            lambda rep, s=store: sp._noop(
                dedup.minhash_near_dups_vs_store(arrivals(500), s)
            ),
            store=name,
            batch=500,
            max_result_size="default_1g",
        )
    sp._exp_line(
        "minhash_store_serving_vs_store_size_decade3_pinned",
        serve["s500k"],
        serve["s5m"],
        batch=500,
    )


def _probe_pq(spark, size_name: str, n: int) -> None:
    import json as _json
    import time as _time

    from etl_with_s3__dynamodb_and_glue_spark.plans import llm_ops

    d = os.path.join(BASE, size_name)
    if not os.path.isdir(os.path.join(d, "embeddings.parquet")):
        sp.gen_embeddings(n, d)
    qs = sp._registry()
    for label, ensure in (
        ("ivf", llm_ops.ensure_ivf_index),
        ("pq", llm_ops.ensure_pq_index),
        ("ivfpq", llm_ops.ensure_ivfpq_index),
    ):
        t0 = _time.perf_counter()
        ensure(spark, d)
        print(
            _json.dumps(
                {
                    "build": f"{label}_{size_name}",
                    "sec": round(_time.perf_counter() - t0, 3),
                    "timed": False,
                }
            ),
            flush=True,
        )
    for q in ("embedding_pq_topk", "embedding_ivfpq_topk"):
        best = None
        for rep in range(3):
            import gc

            spark.catalog.clearCache()
            gc.collect()
            spark._jvm.System.gc()
            t0 = _time.perf_counter()
            qs[q](spark, d).write.format("noop").mode("overwrite").save()
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


def main() -> None:
    family = sys.argv[1] if len(sys.argv) > 1 else "win-docs"
    spark = get_spark(f"probe-r13-{family}")
    qs = sp._registry()
    if family == "stores":
        _probe_stores(spark)
    elif family == "pq":
        size_name = sys.argv[2]
        n = {"e1m": 1_000_000, "e10m": 10_000_000}[size_name]
        _probe_pq(spark, size_name, n)
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
    elif family == "win-emb":
        only = set(sys.argv[2:])
        sizes = dict(sp.EMB_XL_SIZES)
        for name, n in sizes.items():
            d = os.path.join(BASE, name)
            if not os.path.isdir(os.path.join(d, "embeddings.parquet")):
                sp.gen_embeddings(n, d)
        sel = [q for q in WIN_EMB if not only or q in only]
        _sweep(spark, qs, sel, "e100k", "e1m", reps=3)
    else:
        sys.exit("family must be stores, pq <size>, win-docs, win-rel or win-emb")


if __name__ == "__main__":
    main()
