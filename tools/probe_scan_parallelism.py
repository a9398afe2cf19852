"""A/B: conditional repartition-after-read vs status quo.

Every sf-testdata table is ONE parquet file with ONE row group, so
every scan's map-side work (tokenize / explode / hash / partial agg /
filter) runs in a single task regardless of core count — the guide
§2.5 'unsplittable input' case. This probe monkeypatches the readers
to append .repartition(defaultParallelism) and interleaves reps of
both variants in one session (position effects cancel; best-of-N).

Usage: python tools/probe_scan_parallelism.py [reps]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from etl_with_s3__dynamodb_and_glue_spark import get_spark  # noqa: E402
from etl_with_s3__dynamodb_and_glue_spark.plans import llm_ops  # noqa: E402
from etl_with_s3__dynamodb_and_glue_spark.plans import event_time  # noqa: E402
from etl_with_s3__dynamodb_and_glue_spark.plans import tpch_like  # noqa: E402
from etl_with_s3__dynamodb_and_glue_spark.plans import curation  # noqa: E402
from etl_with_s3__dynamodb_and_glue_spark.sources import readers  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_orig_docs = llm_ops._docs
_parallel = {"on": False}


def _docs_patched(spark, sf_dir):
    df = _orig_docs(spark, sf_dir)
    if _parallel["on"]:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


_orig_read_events = readers.read_events


def _read_events_patched(spark, sf_dir):
    df = _orig_read_events(spark, sf_dir)
    if _parallel["on"]:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


_orig_t = tpch_like._t


def _t_patched(spark, sf_dir, name):
    df = _orig_t(spark, sf_dir, name)
    if _parallel["on"] and name in ("orders", "lineitem"):
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("probe-scan-parallelism")
    llm_ops._docs = _docs_patched
    curation._docs = _docs_patched
    event_time.read_events = _read_events_patched
    tpch_like._t = _t_patched

    qs = {
        "doc_minhash_near_dups": lambda: llm_ops.doc_minhash_near_dups(spark, SF_DIR),
        "doc_ngram_containment": lambda: llm_ops.doc_ngram_containment(spark, SF_DIR),
        "doc_token_stats": lambda: llm_ops.doc_token_stats(spark, SF_DIR),
        "doc_dsir_weights": lambda: curation.doc_dsir_weights(spark, SF_DIR),
        "user_sessions": lambda: event_time.user_sessions(spark, SF_DIR),
        "pricing_summary": lambda: tpch_like.pricing_summary(spark, SF_DIR),
        "customer_order_deltas": lambda: tpch_like.customer_order_deltas(spark, SF_DIR),
        "doc_exact_dedup": lambda: llm_ops.doc_exact_dedup(spark, SF_DIR),
    }
    # warm-up
    llm_ops.doc_token_stats(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    results: dict[str, dict[str, list[float]]] = {}
    for name, fn in qs.items():
        results[name] = {"off": [], "on": []}
        for _ in range(reps):
            for variant in ("off", "on"):
                _parallel["on"] = variant == "on"
                spark.catalog.clearCache()
                gc.collect()
                spark._jvm.System.gc()
                t0 = time.perf_counter()
                fn().write.format("noop").mode("overwrite").save()
                results[name][variant].append(
                    round(time.perf_counter() - t0, 3)
                )
        off, on = min(results[name]["off"]), min(results[name]["on"])
        print(
            json.dumps(
                {
                    "query": name,
                    "off_best": off,
                    "on_best": on,
                    "speedup": round(off / on, 2) if on else None,
                    "off": results[name]["off"],
                    "on": results[name]["on"],
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
