"""Stage attribution for doc_arrivals_dedup_store (the steady-state
serving shape): arrival tokenize → arrival signatures → band join vs
store → candidates → verify → decision. Noop sink, interleaved
best-of-2, fresh session.

Usage: python tools/probe_store_serving.py
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.storagelevel import StorageLevel  # noqa: E402

from etl_with_s3__dynamodb_and_glue_spark import get_spark  # noqa: E402
from etl_with_s3__dynamodb_and_glue_spark.operators import dedup  # noqa: E402
from etl_with_s3__dynamodb_and_glue_spark.plans import llm_ops  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
THRESHOLD = llm_ops._INCR_THRESHOLD


def timed(label, df_fn, spark, reps=2):
    best = None
    for _ in range(reps):
        spark.catalog.clearCache()
        gc.collect()
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        df_fn().write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 3)
        best = dt if best is None or dt < best else best
    print(json.dumps({"stage": label, "sec_best": best}))
    return best


def main() -> None:
    spark = get_spark("probe-store-serving")
    store_path = llm_ops.ensure_minhash_store(spark, SF_DIR)
    arrivals, _ = llm_ops._split_arrivals(spark, SF_DIR)
    arrivals.limit(10).count()

    num_hashes = 64
    bands = dedup.pick_bands(num_hashes, THRESHOLD)
    id_col = "doc_id"

    def store():
        return dedup.load_minhash_store(spark, store_path)

    def a_toks_df():
        return dedup.token_sets(arrivals)

    def chain(upto):
        a_toks = a_toks_df().persist(StorageLevel.MEMORY_AND_DISK)
        a_sigs = dedup.minhash_signatures(
            a_toks.withColumnRenamed("toks", "shingles"),
            id_col=id_col,
            shingle_col="shingles",
            num_hashes=num_hashes,
            include_set_size=True,
        )
        if upto == "sigs":
            return a_sigs
        band_keys = dedup._band_key_array(num_hashes, bands)
        banded_a = a_sigs.select(
            F.col(id_col).alias("doc_id"),
            F.col("n_set").alias("n_a"),
            F.explode(band_keys).alias("bucket"),
        )
        banded_c = store().select(
            F.col(id_col).alias("corpus_id"),
            F.col("n_set").alias("n_c"),
            F.explode(band_keys).alias("bucket"),
        )
        na, nc = F.col("n_a"), F.col("n_c")
        candidates = (
            F.broadcast(banded_a)
            .join(banded_c, ["bucket"])
            .filter((na >= nc * THRESHOLD) & (nc >= na * THRESHOLD))
            .select("doc_id", "corpus_id", "n_a", "n_c")
            .distinct()
        )
        if upto == "candidates":
            return candidates
        hashed = F.transform("toks", lambda t: F.xxhash64(t))
        a = a_toks.select(F.col(id_col).alias("doc_id"), hashed.alias("toks_a"))
        c = store().select(
            F.col(id_col).alias("corpus_id"), F.col("toks_h").alias("toks_b")
        )
        verified = (
            F.broadcast(candidates)
            .join(c, "corpus_id")
            .join(F.broadcast(a), "doc_id")
            .select(
                "doc_id",
                "corpus_id",
                F.size(F.array_intersect("toks_a", "toks_b")).alias("n_inter"),
                na,
                nc,
            )
            .select(
                "doc_id",
                "corpus_id",
                F.round(
                    F.col("n_inter").cast("double")
                    / (na + nc - F.col("n_inter")),
                    6,
                ).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= THRESHOLD)
        )
        return verified

    timed("1_arrival_token_sets", a_toks_df, spark)
    timed("2_arrival_signatures", lambda: chain("sigs"), spark)
    timed("3_candidates", lambda: chain("candidates"), spark)
    timed("4_verified", lambda: chain("verify"), spark)
    timed(
        "5_full_query",
        lambda: llm_ops.doc_arrivals_dedup_store(spark, SF_DIR),
        spark,
    )
    n_arr = arrivals.count()
    n_cand = chain("candidates").count()
    n_ver = chain("verify").count()
    print(json.dumps({"n_arrivals": n_arr, "n_candidates": n_cand, "n_verified": n_ver}))
    spark.stop()


if __name__ == "__main__":
    main()
