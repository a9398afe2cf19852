"""Interleaved A/B of the r13 scan-parallelism fixes on the LSH
family: dedup.ensure_scan_parallelism toggled to identity ('off') vs
real ('on') in one session; the store serving additionally compares a
1-file store layout vs the new multi-file layout.

Usage: python tools/probe_ab_scanfix.py [reps]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from etl_with_s3__dynamodb_and_glue_spark import get_spark  # noqa: E402
from etl_with_s3__dynamodb_and_glue_spark.operators import dedup  # noqa: E402
from etl_with_s3__dynamodb_and_glue_spark.operators.parallelism import (  # noqa: E402
    ensure_scan_parallelism,
)
from etl_with_s3__dynamodb_and_glue_spark.plans import llm_ops  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("probe-ab-scanfix")
    docs = llm_ops._docs(spark, SF_DIR)
    docs.limit(10).count()

    # two store layouts, built once each (old = single-file via
    # coalesce(1), mimicking the AQE-coalesced pre-fix layout)
    old_store = "/tmp/r13opt_store_old"
    new_store = "/tmp/r13opt_store_new"
    _, corpus = llm_ops._split_arrivals(spark, SF_DIR)
    frame = dedup.corpus_signature_frame(corpus)
    frame.coalesce(1).write.mode("overwrite").option(
        "compression", "zstd"
    ).parquet(old_store)
    dedup.build_minhash_store(corpus, new_store)
    arrivals, _ = llm_ops._split_arrivals(spark, SF_DIR)

    targets = {
        "minhash_self_0.95": lambda: dedup.minhash_near_dups(
            docs, threshold=0.95
        ),
        "minhash_self_0.9": lambda: dedup.minhash_near_dups(
            docs, threshold=0.9
        ),
        "arrivals_lsh": lambda: llm_ops.doc_arrivals_dedup_lsh(
            spark, SF_DIR
        ),
    }
    for name, fn in targets.items():
        res = {"off": [], "on": []}
        for _ in range(reps):
            for variant in ("off", "on"):
                dedup.ensure_scan_parallelism = (
                    (lambda df: df) if variant == "off" else ensure_scan_parallelism
                )
                spark.catalog.clearCache()
                gc.collect()
                spark._jvm.System.gc()
                t0 = time.perf_counter()
                fn().write.format("noop").mode("overwrite").save()
                res[variant].append(round(time.perf_counter() - t0, 3))
        print(
            json.dumps(
                {
                    "target": name,
                    "off_best": min(res["off"]),
                    "on_best": min(res["on"]),
                    "speedup": round(min(res["off"]) / min(res["on"]), 2),
                    **res,
                }
            )
        )
    dedup.ensure_scan_parallelism = ensure_scan_parallelism

    # store serving: old layout vs new layout (same serving code)
    res = {"old_store": [], "new_store": []}
    for _ in range(reps):
        for variant, path in (("old_store", old_store), ("new_store", new_store)):
            spark.catalog.clearCache()
            gc.collect()
            spark._jvm.System.gc()
            store = dedup.load_minhash_store(spark, path)
            t0 = time.perf_counter()
            pairs = dedup.minhash_near_dups_vs_store(
                arrivals, store, threshold=llm_ops._INCR_THRESHOLD
            )
            llm_ops._arrivals_decision(arrivals, pairs).write.format(
                "noop"
            ).mode("overwrite").save()
            res[variant].append(round(time.perf_counter() - t0, 3))
    print(
        json.dumps(
            {
                "target": "store_serving",
                "old_best": min(res["old_store"]),
                "new_best": min(res["new_store"]),
                "speedup": round(
                    min(res["old_store"]) / min(res["new_store"]), 2
                ),
                **res,
            }
        )
    )
    # parity: store layouts serve identical decisions
    a = llm_ops._arrivals_decision(
        arrivals,
        dedup.minhash_near_dups_vs_store(
            arrivals,
            dedup.load_minhash_store(spark, old_store),
            threshold=llm_ops._INCR_THRESHOLD,
        ),
    )
    b = llm_ops._arrivals_decision(
        arrivals,
        dedup.minhash_near_dups_vs_store(
            arrivals,
            dedup.load_minhash_store(spark, new_store),
            threshold=llm_ops._INCR_THRESHOLD,
        ),
    )
    print(
        json.dumps(
            {
                "store_parity_a_minus_b": a.exceptAll(b).count(),
                "store_parity_b_minus_a": b.exceptAll(a).count(),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
