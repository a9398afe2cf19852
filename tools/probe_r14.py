"""Round-14 optimization probes.

Subcommands (python tools/probe_r14.py <cmd>):

- ``compat``: cold-plan cost breakdown of the two compat KPI queries
  (VERDICT r13 item 1) — Catalyst planning time, whole-stage-codegen
  compile time (CodegenMetrics deltas), first vs steady execution, in
  a fresh session that mimics the bench warm-up.
- ``rules``: RuleExecutor time profile of the LSH family's planning
  (VERDICT r13 item 3) — resets the optimizer-rule metrics, plans
  doc_minhash_near_dups once, dumps per-rule cumulative time.
- ``quality``: interleaved re-measure of doc_source_quality_buckets
  (VERDICT r13 item 6) vs a fixed canary, one session.

Timing discipline per BENCH_NOTES_r13: interleaved reps in ONE
session, clearCache + double GC between reps, best-of reported.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from etl_with_s3__dynamodb_and_glue_spark import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _settle(spark):
    spark.catalog.clearCache()
    gc.collect()
    spark._jvm.System.gc()


def _codegen_metrics(spark):
    cm = spark._jvm.org.apache.spark.metrics.source.CodegenMetrics
    return {
        "compile_ms": cm.METRIC_COMPILATION_TIME().getSnapshot().size()
        and sum(cm.METRIC_COMPILATION_TIME().getSnapshot().getValues()),
        "n_compiled": cm.METRIC_COMPILATION_TIME().getCount(),
        "src_bytes": cm.METRIC_SOURCE_CODE_SIZE().getCount()
        and sum(cm.METRIC_SOURCE_CODE_SIZE().getSnapshot().getValues()),
    }


def compat() -> None:
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    spark = get_spark("probe-r14-compat")
    # bench-equivalent warm-up
    for t in "customer events".split():
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
    from pyspark.sql.pandas.functions import pandas_udf

    _warm = pandas_udf(lambda s: s * 2, "long")
    spark.range(100).select(_warm("id")).collect()

    for name in ("segment_kpis_compat", "top_rows_per_day_compat"):
        rows = []
        for rep in range(4):
            _settle(spark)
            m0 = _codegen_metrics(spark)
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            jqe = df._jdf.queryExecution()
            jqe.executedPlan()
            t1 = time.perf_counter()
            df.collect()
            t2 = time.perf_counter()
            m1 = _codegen_metrics(spark)
            rows.append(
                {
                    "rep": rep,
                    "plan_s": round(t1 - t0, 3),
                    "exec_s": round(t2 - t1, 3),
                    "codegen_ms": m1["compile_ms"] - m0["compile_ms"],
                    "n_classes": m1["n_compiled"] - m0["n_compiled"],
                }
            )
            del df
        print(json.dumps({"target": name, "reps": rows}))
    spark.stop()


def rules() -> None:
    from etl_with_s3__dynamodb_and_glue_spark.operators import dedup
    from etl_with_s3__dynamodb_and_glue_spark.plans import llm_ops

    spark = get_spark("probe-r14-rules")
    docs = llm_ops._docs(spark, SF_DIR)
    docs.limit(100).count()
    re_mod = spark._jvm.org.apache.spark.sql.catalyst.rules.RuleExecutor
    # warm one full plan first so classloading isn't in the profile
    df = dedup.minhash_near_dups(docs, threshold=0.9)
    df._jdf.queryExecution().executedPlan()
    del df
    _settle(spark)
    re_mod.resetMetrics()
    t0 = time.perf_counter()
    df = dedup.minhash_near_dups(docs, threshold=0.9)
    df._jdf.queryExecution().executedPlan()
    t1 = time.perf_counter()
    dump = re_mod.dumpTimeSpent()
    print(f"planning wall: {t1 - t0:.3f}s")
    # keep only rules with >=10ms cumulative
    lines = []
    for line in dump.splitlines():
        parts = line.split()
        if parts and parts[-2:] and parts[0].startswith("org."):
            lines.append(line)
    print(dump)
    spark.stop()


def quality() -> None:
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    spark = get_spark("probe-r14-quality")
    qs["doc_source_quality_buckets"](spark, "/root/testdata/sf0.001").collect()
    out = {"doc_source_quality_buckets": [], "canary_doc_token_dup_share": []}
    for _ in range(4):
        for name, key in (
            ("doc_source_quality_buckets", "doc_source_quality_buckets"),
            ("doc_token_dup_share", "canary_doc_token_dup_share"),
        ):
            _settle(spark)
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).collect()
            out[key].append(round(time.perf_counter() - t0, 3))
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    {"compat": compat, "rules": rules, "quality": quality}[sys.argv[1]]()
