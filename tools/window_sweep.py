#!/usr/bin/env python
"""Full-window timing sweep at bench scale (VERDICT r8 item 8 — the
round-8 sweep was an ad-hoc session; this commits the harness).

Times every query in the driver's current 50-slot window (or the whole
registry with ``--all``) at ``sf_dir`` (default ``$SPARK_GRAFT_SF_DIR``
or ``/root/testdata/sf0.1``): best-of-2 warm reps, noop sink — same
measurement discipline and reasons as ``tools/scale_probe.py`` (a
``count()`` sink lets Catalyst prune un-referenced subtrees and made
two r7 exponents fictitious).

**Exact-twin cap.** The documented O(n²) exact-oracle twins
(``EXACT_TWINS`` below) exist to ground-truth the scalable
``_lsh``/``_store`` deployment paths; their brute-force pair
generation is deliberate and driver-checked at sf0.01 (~1 s), but at
sweep scale it costs minutes by design (r8: ``doc_dedup_cluster_stats``
202 s, ``doc_dedup_final`` 178 s at sf0.1). The sweep therefore runs
THEM against a capped corpus — a deterministic md5-ordered
hash-sample of ≤``CAP_DOCS`` documents / ≤``CAP_VECS`` vectors,
materialized once under ``.window_sweep/`` with every other table
symlinked from the real sf dir — and labels the rows ``capped: true``.
The cap lives HERE, in the sweep harness, NOT in the query functions:
driver correctness runs, oracle tests, and the LSH-grounding role stay
exact, and the parked queries' lineage is untouched (rotation rule 2).

Usage::

    python tools/window_sweep.py [sf_dir] [--all]

Prints one JSON line per (query, rep) and a final summary sorted by
best time descending; quiet machine required, same as bench.py.
"""

from __future__ import annotations

import gc
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CAP_DOCS = 1500
CAP_VECS = 1000

# Queries whose docstrings declare the small-N exact-oracle-twin role
# (brute-force pair generation grounding an LSH/store variant). Keep in
# sync with the `documented small-N oracle twin` notes in operators/
# dedup.py and plans/llm_ops.py.
EXACT_TWINS = {
    "doc_jaccard_pairs",
    "doc_dedup_final",
    "doc_dedup_keep_best",
    "doc_dedup_cluster_stats",
    "doc_arrivals_dedup",
    "doc_split_leakage_audit",
    "embedding_near_dup_pairs",
    "embedding_dedup_final",
}

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def build_capped_dir(spark, sf_dir: str, out_dir: str) -> str:
    """Materialize the capped twin-input dir: documents/embeddings
    hash-sampled (md5 order — deterministic, engine-portable, no RNG)
    and rewritten as 8 part files for honest stage-1 parallelism;
    every other table symlinked to the real sf dir."""
    from pyspark.sql import functions as F

    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    caps = {"documents": ("doc_id", CAP_DOCS), "embeddings": ("vec_id", CAP_VECS)}
    # abspath: a relative sf_dir CLI arg would otherwise produce
    # symlinks that resolve relative to out_dir and dangle (ADVICE r9)
    sf_dir = os.path.abspath(sf_dir)
    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        dst = os.path.join(out_dir, f"{t}.parquet")
        if t in caps:
            key, cap = caps[t]
            (
                spark.read.parquet(src)
                .orderBy(F.md5(F.concat(F.lit("sweepcap|"), F.col(key).cast("string"))))
                .limit(cap)
                .repartition(8)
                .write.mode("overwrite")
                .parquet(dst)
            )
        else:
            os.symlink(src, dst)
    return out_dir


def main() -> None:
    sf_dir = None
    sweep_all = False
    for a in sys.argv[1:]:
        if a == "--all":
            sweep_all = True
        else:
            sf_dir = a
    sf_dir = sf_dir or os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )

    import __spark_entry__ as entry_mod

    from etl_with_s3__dynamodb_and_glue_spark import get_spark
    from etl_with_s3__dynamodb_and_glue_spark.plans import llm_ops

    spark = get_spark("window-sweep")
    qs = entry_mod.queries()
    names = list(qs) if sweep_all else list(qs)[:50]

    # One-time offline builds (serving queries measure SERVING, the
    # builds are reported by bench.py) + a tiny composite warm-up.
    try:
        qs[names[0]](spark, "/root/testdata/sf0.001").collect()
        llm_ops.ensure_ivf_index(spark, sf_dir)
        llm_ops.ensure_pq_index(spark, sf_dir)
        llm_ops.ensure_ivfpq_index(spark, sf_dir)
        llm_ops.ensure_minhash_store(spark, sf_dir)
    except Exception as exc:  # noqa: BLE001 — cold builds still sweep
        print(json.dumps({"warmup_error": f"{type(exc).__name__}: {exc}"[:300]}))

    capped_dir = build_capped_dir(
        spark, sf_dir, os.path.join(REPO, ".window_sweep", "capped_sf")
    )

    best: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        capped = name in EXACT_TWINS
        d = capped_dir if capped else sf_dir
        for rep in range(2):
            spark.catalog.clearCache()
            gc.collect()
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            try:
                qs[name](spark, d).write.format("noop").mode("overwrite").save()
            except Exception as exc:  # noqa: BLE001 — degrade, don't die
                errors[name] = f"{type(exc).__name__}: {exc}"[:300]
                break
            dt = round(time.perf_counter() - t0, 3)
            best[name] = min(best.get(name, float("inf")), dt)
            print(
                json.dumps(
                    {"query": name, "rep": rep, "sec": dt, "capped": capped}
                )
            )

    summary = {
        "metric": "window_sweep_best_of_2",
        "sf_dir": sf_dir,
        "n_queries": len(names),
        "cap_docs": CAP_DOCS,
        "cap_vecs": CAP_VECS,
        "capped_queries": sorted(EXACT_TWINS & set(names)),
        "total_best_sec": round(sum(best.values()), 3),
        "slowest": dict(
            sorted(best.items(), key=lambda kv: -kv[1])[:10]
        ),
        **({"errors": errors} if errors else {}),
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
