#!/usr/bin/env python
"""10× scale probe for the priciest headline queries (VERDICT r6 #7;
embedding lineage added per VERDICT r7 #6).

The driver ships no sf1 testdata, so the probe generates its OWN
two-point corpus families — because both points of a family come from
the SAME generator, the ratio isolates the engine's scaling behavior
instead of mixing two data distributions:

- ``docs``: same schema and duplicate structure as the driver's
  ``documents`` table (≈50-token docs, ~8% exact dups, ~8% near
  dups), at 5k docs (the sf0.1 size) and 50k docs (the sf1 size);
- ``embeddings``: 64-dim float vectors drawn from a 32-Gaussian
  mixture (so IVF's coarse quantizer has genuine structure to find),
  at 10k and 100k vectors (5× / 50× the sf0.1 table). Index BUILDS
  run once untimed (offline construction, excluded from the headline
  for the same reason); the timed queries are the SERVING paths —
  brute-force top-k as the unpruned yardstick, IVF probe (reads
  n_probe/n_clusters of the corpus), PQ ADC (full scan of 16-byte
  codes), and composed IVF-PQ (pruned AND compressed).

Usage: python tools/scale_probe.py [docs|embeddings|all]  (default
all; writes .scale_probe/ under the repo root, prints one JSON line
per (query, size, repeat) and a scaling-exponent summary; quiet
machine required — same discipline as bench.py).
"""

from __future__ import annotations

import gc
import json
import os
import random
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

QUERIES = ["doc_minhash_near_dups", "doc_token_cms_estimates", "doc_duplicate_spans"]
SIZES = {"n5k": 5_000, "n50k": 50_000}
EMB_QUERIES = [
    "embedding_topk_bruteforce",
    "embedding_ivf_topk",
    "embedding_pq_topk",
    "embedding_ivfpq_topk",
]
EMB_SIZES = {"e10k": 10_000, "e100k": 100_000}
DIM = 64
N_CLUSTERS = 32
SEED = 42


def gen_documents(n_docs: int, out_dir: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(SEED)
    vocab = [f"w{i}" for i in range(2000)]
    # zipf-ish weights — a realistic token head like the driver data
    weights = [1.0 / (i + 1) ** 0.8 for i in range(len(vocab))]
    sources = ["web", "books", "code", "wiki", "forums"]

    texts: list[str] = []
    for i in range(n_docs):
        r = rng.random()
        if i > 10 and r < 0.08:  # exact dup of an earlier doc
            texts.append(texts[rng.randrange(i)])
        elif i > 10 and r < 0.16:  # near dup: mutate 3 tokens
            toks = texts[rng.randrange(i)].split()
            for _ in range(3):
                toks[rng.randrange(len(toks))] = rng.choice(vocab)
            texts.append(" ".join(toks))
        else:
            ln = max(10, min(120, int(rng.gauss(50, 15))))
            texts.append(" ".join(rng.choices(vocab, weights, k=ln)))

    table = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * n_docs),
            "source": pa.array(
                [sources[rng.randrange(len(sources))] for _ in range(n_docs)]
            ),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(table, os.path.join(out_dir, "documents.parquet"))


def gen_embeddings(n_vecs: int, out_dir: str) -> None:
    """32-Gaussian mixture in 64-d — cluster structure for the coarse
    quantizer, one generator for both size points."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(SEED)
    centers = rng.normal(0.0, 1.0, size=(N_CLUSTERS, DIM))
    labels = rng.integers(0, N_CLUSTERS, size=n_vecs)
    vecs = (
        centers[labels] + rng.normal(0.0, 0.35, size=(n_vecs, DIM))
    ).astype("float32")
    table = pa.table(
        {
            "vec_id": pa.array(range(n_vecs), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.reshape(-1)), DIM
            ).cast(pa.list_(pa.float32())),
            "label": pa.array(labels.astype("int32"), pa.int32()),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(table, os.path.join(out_dir, "embeddings.parquet"))


def _time_queries(
    spark, queries: list[str], sizes: dict[str, int], base: str, small: str, big: str
) -> None:
    import math

    from etl_with_s3__dynamodb_and_glue_spark.plans import llm_ops

    results: dict[str, dict[str, list[float]]] = {
        q: {s: [] for s in sizes} for q in queries
    }
    for q in queries:
        for s in sizes:
            for rep in range(2):
                spark.catalog.clearCache()
                gc.collect()
                spark._jvm.System.gc()
                t0 = time.perf_counter()
                n_rows = llm_ops.QUERIES[q](
                    spark, os.path.join(base, s)
                ).count()
                dt = round(time.perf_counter() - t0, 3)
                results[q][s].append(dt)
                print(
                    json.dumps(
                        {"query": q, "size": s, "rep": rep, "sec": dt, "rows": n_rows}
                    )
                )

    for q in queries:
        t1 = min(results[q][small])
        t10 = min(results[q][big])
        exp = math.log(t10 / t1) / math.log(10)
        print(
            json.dumps(
                {
                    "query": q,
                    f"sec_{small}": t1,
                    f"sec_{big}": t10,
                    "ratio_10x": round(t10 / t1, 2),
                    "scaling_exponent": round(exp, 3),
                }
            )
        )


def probe_docs(spark, base: str) -> None:
    from etl_with_s3__dynamodb_and_glue_spark.plans import llm_ops

    for name, n in SIZES.items():
        d = os.path.join(base, name)
        if not os.path.exists(os.path.join(d, "documents.parquet")):
            gen_documents(n, d)
    # warm-up: JVM + codegen
    llm_ops.QUERIES["doc_token_stats"](
        spark, os.path.join(base, "n5k")
    ).collect()
    _time_queries(spark, QUERIES, SIZES, base, "n5k", "n50k")


def probe_embeddings(spark, base: str) -> None:
    from etl_with_s3__dynamodb_and_glue_spark.plans import llm_ops

    for name, n in EMB_SIZES.items():
        d = os.path.join(base, name)
        if not os.path.exists(os.path.join(d, "embeddings.parquet")):
            gen_embeddings(n, d)
    # untimed prebuild of every index artifact (offline construction);
    # also doubles as the JVM/codegen warm-up for the serving paths
    for s in EMB_SIZES:
        d = os.path.join(base, s)
        t0 = time.perf_counter()
        llm_ops.ensure_ivf_index(spark, d)
        llm_ops.ensure_pq_index(spark, d)
        llm_ops.ensure_ivfpq_index(spark, d)
        print(
            json.dumps(
                {
                    "build": "ivf+pq+ivfpq",
                    "size": s,
                    "sec": round(time.perf_counter() - t0, 3),
                    "timed": False,
                }
            )
        )
    _time_queries(spark, EMB_QUERIES, EMB_SIZES, base, "e10k", "e100k")


def main() -> None:
    from etl_with_s3__dynamodb_and_glue_spark import get_spark

    family = sys.argv[1] if len(sys.argv) > 1 else "all"
    base = os.path.join(HERE, ".scale_probe")
    spark = get_spark()
    if family in ("docs", "all"):
        probe_docs(spark, base)
    if family in ("embeddings", "all"):
        probe_embeddings(spark, base)
    spark.stop()


if __name__ == "__main__":
    main()
