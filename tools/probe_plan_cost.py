"""Split driver-side planning cost from execution for the LSH family.

For each target, times (a) queryExecution().executedPlan() — analysis
+ optimization + physical planning, pre-AQE — on a FRESH DataFrame
each rep, and (b) the full noop execution. Also counts verified pairs
at t=0.9 to test whether verify cost is output-bound.

Usage: python tools/probe_plan_cost.py
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
from etl_with_s3__dynamodb_and_glue_spark.plans import llm_ops  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("probe-plan-cost")
    docs = llm_ops._docs(spark, SF_DIR)
    docs.limit(100).count()  # warm-up

    targets = {
        "minhash_0.9_pairs": lambda: dedup.minhash_near_dups(docs, threshold=0.9),
        "minhash_0.95_pairs": lambda: dedup.minhash_near_dups(docs, threshold=0.95),
        "leakage_audit_lsh": lambda: llm_ops.doc_split_leakage_audit_lsh(spark, SF_DIR),
        "arrivals_dedup_lsh": lambda: llm_ops.doc_arrivals_dedup_lsh(spark, SF_DIR),
    }
    for name, fn in targets.items():
        plan_times, exec_times = [], []
        for _ in range(3):
            spark.catalog.clearCache()
            gc.collect()
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            df = fn()
            jqe = df._jdf.queryExecution()
            jqe.executedPlan()
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            plan_times.append(round(t1 - t0, 3))
            exec_times.append(round(t2 - t1, 3))
            del df
        print(
            json.dumps(
                {
                    "target": name,
                    "plan_best": min(plan_times),
                    "exec_best": min(exec_times),
                    "plan": plan_times,
                    "exec": exec_times,
                }
            )
        )
    # output cardinality at 0.9
    n = dedup.minhash_near_dups(docs, threshold=0.9).count()
    print(json.dumps({"verified_pairs_t0.9": n}))
    spark.stop()


if __name__ == "__main__":
    main()
