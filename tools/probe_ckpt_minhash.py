"""A/B: localCheckpoint-truncated minhash_near_dups vs shipped persist
form. Same algorithm, same output (checkpoint materializes the exact
computed rows); the variant only replaces the two persisted
intermediates (toks, members) with EAGER localCheckpoints so the
13 InMemoryRelation references stop embedding the full subtree in
every downstream plan — driver-side planning was measured at
1.3-1.8 s PER EXECUTION of every LSH-family query (probe_plan_cost).

Interleaved reps, one session; reports plan/exec split per variant
and exceptAll parity.

Usage: python tools/probe_ckpt_minhash.py [threshold] [reps]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window, functions as F  # noqa: E402

from etl_with_s3__dynamodb_and_glue_spark import get_spark  # noqa: E402
from etl_with_s3__dynamodb_and_glue_spark.operators import dedup  # noqa: E402
from etl_with_s3__dynamodb_and_glue_spark.plans import llm_ops  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def minhash_near_dups_ckpt(df, threshold, num_hashes=64, bands=None):
    """Checkpoint-truncated clone of dedup.minhash_near_dups."""
    id_col = "doc_id"
    if bands is None:
        bands = dedup.pick_bands(num_hashes, threshold)
    toks = dedup.token_sets(df).localCheckpoint()
    w_fp = Window.partitionBy("fp")
    members = (
        toks.select(
            F.col(id_col),
            F.md5(F.to_json(F.array_sort("toks"))).alias("fp"),
        )
        .select(F.col(id_col), F.min(id_col).over(w_fp).alias("rep"))
        .localCheckpoint()
    )
    rep_toks = toks.join(
        members.filter(F.col(id_col) == F.col("rep")).select(id_col), id_col
    )
    sigs = dedup.minhash_signatures(
        rep_toks.withColumnRenamed("toks", "shingles"),
        id_col=id_col,
        shingle_col="shingles",
        num_hashes=num_hashes,
        include_set_size=True,
    )
    raw = dedup.lsh_candidate_pairs(
        sigs,
        id_col=id_col,
        num_hashes=num_hashes,
        bands=bands,
        dedupe=False,
        carry_cols=("n_set",),
    )
    na, nb = F.col("n_set_a"), F.col("n_set_b")
    candidates = (
        raw.filter((na >= nb * threshold) & (nb >= na * threshold))
        .select("id_a", "id_b", "n_set_a", "n_set_b")
        .distinct()
    )
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
    ma = members.select(F.col("rep").alias("id_a"), F.col(id_col).alias("_da"))
    mb = members.select(F.col("rep").alias("id_b"), F.col(id_col).alias("_db"))
    cross = (
        rep_pairs.join(ma, "id_a")
        .join(mb, "id_b")
        .select(
            F.least("_da", "_db").alias("id_a"),
            F.greatest("_da", "_db").alias("id_b"),
            "jaccard",
        )
    )
    wa = members.select("rep", F.col(id_col).alias("_da"))
    wb = members.select("rep", F.col(id_col).alias("_db"))
    within = (
        wa.join(wb, "rep")
        .filter(F.col("_da") < F.col("_db"))
        .select(
            F.col("_da").alias("id_a"),
            F.col("_db").alias("id_b"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    return cross.union(within), (toks, members)


def _release(ckpts) -> None:
    for df in ckpts:
        try:
            df._jdf.rdd().unpersist(False)
        except Exception:  # noqa: BLE001
            pass


def main() -> None:
    threshold = float(sys.argv[1]) if len(sys.argv) > 1 else 0.9
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("probe-ckpt-minhash")
    docs = llm_ops._docs(spark, SF_DIR)
    docs.limit(100).count()

    out = {"old": {"plan": [], "exec": []}, "ckpt": {"plan": [], "exec": []}}
    for _ in range(reps):
        for variant in ("old", "ckpt"):
            spark.catalog.clearCache()
            gc.collect()
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            if variant == "old":
                df = dedup.minhash_near_dups(docs, threshold=threshold)
                ckpts = ()
            else:
                df, ckpts = minhash_near_dups_ckpt(docs, threshold)
            jqe = df._jdf.queryExecution()
            jqe.executedPlan()
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            out[variant]["plan"].append(round(t1 - t0, 3))
            out[variant]["exec"].append(round(t2 - t1, 3))
            _release(ckpts)
            del df
    for variant in ("old", "ckpt"):
        print(
            json.dumps(
                {
                    "variant": variant,
                    "plan_best": min(out[variant]["plan"]),
                    "exec_best": min(out[variant]["exec"]),
                    **out[variant],
                }
            )
        )
    # parity
    old = dedup.minhash_near_dups(docs, threshold=threshold)
    new, ckpts = minhash_near_dups_ckpt(docs, threshold)
    d1 = old.exceptAll(new).count()
    d2 = new.exceptAll(old).count()
    print(json.dumps({"parity_old_minus_new": d1, "parity_new_minus_old": d2}))
    _release(ckpts)
    spark.stop()


if __name__ == "__main__":
    main()
