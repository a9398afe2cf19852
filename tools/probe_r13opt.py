"""Round-13 OPTIMIZATION probes — measure before touching anything.

Sub-commands (one per fresh process, per the standing probe hygiene):

  minhash   — stage-by-stage attribution of minhash_near_dups at the
              two deployed thresholds (0.95 self-dedup, 0.8 leakage):
              token_sets → exact-collapse → signatures → raw band
              collisions → pruned+distinct candidates → verified rep
              pairs → full output. Noop sink, best-of-2, cache cleared
              between stages.
  collectvs — collect() vs noop-sink timing for every HEADLINE bench
              query: quantifies how much of the bench's per-query
              second is row-pickling into the Python driver rather
              than Spark computation (guide §1.4).
  stages <q> — generic: time one registered query via noop.

Usage: python tools/probe_r13opt.py minhash|collectvs [args]
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


def _settle(spark):
    spark.catalog.clearCache()
    gc.collect()
    spark._jvm.System.gc()


def timed(label, df_fn, spark, reps=2, action="noop"):
    best = None
    for _ in range(reps):
        _settle(spark)
        t0 = time.perf_counter()
        df = df_fn()
        if action == "noop":
            df.write.format("noop").mode("overwrite").save()
        else:
            df.collect()
        dt = round(time.perf_counter() - t0, 3)
        best = dt if best is None or dt < best else best
    print(json.dumps({"stage": label, "sec_best": best, "action": action}))
    return best


def _warmup(spark, docs):
    docs.limit(100).select(F.length("text")).write.format("noop").mode(
        "overwrite"
    ).save()


def minhash_stages(threshold: float):
    """Replicates minhash_near_dups stage by stage so each boundary
    can be timed in isolation (the operator's own composition is the
    source of truth — this mirrors dedup.minhash_near_dups exactly)."""
    spark = get_spark("probe-r13opt-minhash")
    docs = llm_ops._docs(spark, SF_DIR)
    _warmup(spark, docs)
    from pyspark.sql import Window

    num_hashes = 64
    bands = dedup.pick_bands(num_hashes, threshold)
    print(json.dumps({"threshold": threshold, "bands": bands}))

    id_col = "doc_id"

    def toks_df():
        return dedup.token_sets(docs)

    def members_df(toks):
        w_fp = Window.partitionBy("fp")
        return (
            toks.select(
                F.col(id_col),
                F.md5(F.to_json(F.array_sort("toks"))).alias("fp"),
            )
            .select(F.col(id_col), F.min(id_col).over(w_fp).alias("rep"))
        )

    # stage 1: tokenize
    timed("1_token_sets", toks_df, spark)

    # stage 2: + exact collapse (members)
    timed("2_members", lambda: members_df(toks_df()), spark)

    # build the persisted chain once per stage-run, as the operator does
    def chain(upto: str):
        toks = toks_df().persist(StorageLevel.MEMORY_AND_DISK)
        members = members_df(toks).persist(StorageLevel.MEMORY_AND_DISK)
        rep_toks = toks.join(
            members.filter(F.col(id_col) == F.col("rep")).select(id_col),
            id_col,
        )
        sigs = dedup.minhash_signatures(
            rep_toks.withColumnRenamed("toks", "shingles"),
            id_col=id_col,
            shingle_col="shingles",
            num_hashes=num_hashes,
            include_set_size=True,
        )
        if upto == "sigs":
            return sigs
        raw = dedup.lsh_candidate_pairs(
            sigs,
            id_col=id_col,
            num_hashes=num_hashes,
            bands=bands,
            dedupe=False,
            carry_cols=("n_set",),
        )
        if upto == "raw":
            return raw
        na, nb = F.col("n_set_a"), F.col("n_set_b")
        candidates = (
            raw.filter((na >= nb * threshold) & (nb >= na * threshold))
            .select("id_a", "id_b", "n_set_a", "n_set_b")
            .distinct()
        )
        if upto == "candidates":
            return candidates
        hashed = F.transform("toks", lambda t: F.xxhash64(t))
        a = rep_toks.select(F.col(id_col).alias("id_a"), hashed.alias("toks_a"))
        b = rep_toks.select(F.col(id_col).alias("id_b"), hashed.alias("toks_b"))
        rep_pairs = (
            candidates.join(a, "id_a")
            .join(b, "id_b")
            .select(
                "id_a",
                "id_b",
                F.size(F.array_intersect("toks_a", "toks_b")).alias("n_inter"),
                na.alias("n_a"),
                nb.alias("n_b"),
            )
            .select(
                "id_a",
                "id_b",
                F.round(
                    F.col("n_inter").cast("double")
                    / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                    6,
                ).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= threshold)
        )
        if upto == "attach":
            # attachment joins WITHOUT the intersect compute: how much
            # is moving the arrays vs intersecting them
            return (
                candidates.join(a, "id_a")
                .join(b, "id_b")
                .select("id_a", "id_b", F.size("toks_a").alias("sa"),
                        F.size("toks_b").alias("sb"))
            )
        return rep_pairs

    timed("3_signatures", lambda: chain("sigs"), spark)
    timed("4_raw_band_collisions", lambda: chain("raw"), spark)
    timed("5_candidates_pruned_distinct", lambda: chain("candidates"), spark)
    timed("6_attach_arrays_only", lambda: chain("attach"), spark)
    timed("7_verified_rep_pairs", lambda: chain("verify"), spark)
    timed(
        "8_full_operator",
        lambda: dedup.minhash_near_dups(docs, threshold=threshold),
        spark,
    )
    # row counts for context (one run, cached chain)
    toks = toks_df().persist(StorageLevel.MEMORY_AND_DISK)
    n_docs = toks.count()
    sigs = chain("sigs")
    raw = chain("raw")
    cand = chain("candidates")
    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "n_reps": sigs.count(),
                "n_raw_collisions": raw.count(),
                "n_candidates": cand.count(),
            }
        )
    )
    spark.stop()


def collect_vs_noop():
    spark = get_spark("probe-r13opt-collectvs")
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    import bench

    docs = llm_ops._docs(spark, SF_DIR)
    _warmup(spark, docs)
    qs["top_rows_per_day_compat"](spark, "/root/testdata/sf0.001").collect()
    llm_ops.ensure_ivf_index(spark, SF_DIR)
    out = {}
    for name in bench.HEADLINE:
        fn = qs[name]
        n_rows = None
        res = {}
        for action in ("collect", "noop"):
            best = None
            for _ in range(2):
                _settle(spark)
                t0 = time.perf_counter()
                df = fn(spark, SF_DIR)
                if action == "noop":
                    df.write.format("noop").mode("overwrite").save()
                else:
                    rows = df.collect()
                    n_rows = len(rows)
                dt = round(time.perf_counter() - t0, 3)
                best = dt if best is None or dt < best else best
            res[action] = best
        res["rows"] = n_rows
        out[name] = res
        print(json.dumps({name: res}))
    print(json.dumps({"summary": out}))
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "minhash"
    if cmd == "minhash":
        thr = float(sys.argv[2]) if len(sys.argv) > 2 else 0.95
        minhash_stages(thr)
    elif cmd == "collectvs":
        collect_vs_noop()
    else:
        raise SystemExit(f"unknown sub-command {cmd!r}")
