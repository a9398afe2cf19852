#!/usr/bin/env python
"""10× scale probe for the priciest headline queries (VERDICT r6 #7).

The driver ships no sf1 testdata, so the probe generates its OWN
two-point corpus family — same schema and duplicate structure as the
driver's ``documents`` table (≈50-token docs, ~8% exact dups, ~8%
near dups), at 5k docs (the sf0.1 size) and 50k docs (the sf1 size) —
and times the registered queries on both. Because both points come
from the SAME generator, the ratio isolates the engine's scaling
behavior instead of mixing two data distributions.

Usage: python tools/scale_probe.py  (writes .scale_probe/ under the
repo root, prints one JSON line per (query, size, repeat) and a
scaling-exponent summary; quiet machine required — same discipline as
bench.py).
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


def main() -> None:
    from etl_with_s3__dynamodb_and_glue_spark import get_spark
    from etl_with_s3__dynamodb_and_glue_spark.plans import llm_ops

    base = os.path.join(HERE, ".scale_probe")
    for name, n in SIZES.items():
        d = os.path.join(base, name)
        if not os.path.exists(os.path.join(d, "documents.parquet")):
            gen_documents(n, d)

    spark = get_spark()
    # warm-up: JVM + codegen
    llm_ops.QUERIES["doc_token_stats"](
        spark, os.path.join(base, "n5k")
    ).collect()

    results: dict[str, dict[str, list[float]]] = {
        q: {s: [] for s in SIZES} for q in QUERIES
    }
    for q in QUERIES:
        for s in SIZES:
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

    import math

    for q in QUERIES:
        t1 = min(results[q]["n5k"])
        t10 = min(results[q]["n50k"])
        exp = math.log(t10 / t1) / math.log(10)
        print(
            json.dumps(
                {
                    "query": q,
                    "sec_5k": t1,
                    "sec_50k": t10,
                    "ratio_10x": round(t10 / t1, 2),
                    "scaling_exponent": round(exp, 3),
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
