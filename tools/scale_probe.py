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

- ``relational``: the full TPC-H-shape star (region…lineitem, same
  schemas/FK structure/value shapes as the driver testdata) plus a
  30-day events stream, at 1× and 10× the sf0.1 row counts (600k →
  6M lineitem) — times the agg/join/window/sessionization headline
  lineages that had never been measured above sf0.1 (VERDICT r7
  missing #4).

Usage: python tools/scale_probe.py
[docs|embeddings|relational|retrieval|stores|docs-xl|emb-xl|rel-xl|ret-xl|stores-xl|docs-xxl|all]
(default all; the two -xl second-decade modes are NOT in "all" —
minutes-long by design, run explicitly; writes .scale_probe/ under
the repo root, prints one JSON line per (query, size, repeat) and a
scaling-exponent summary; quiet machine required — same discipline
as bench.py).
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

QUERIES = [
    "doc_minhash_near_dups",
    # r10: the full LSH→connected-components composition — the tail
    # the r10 pointer-jump/pair-graph CC rework changed; probed so the
    # rework's exponent is pinned, not just its sf0.1 wall time
    "doc_dedup_final_lsh",
    "doc_token_cms_estimates",
    "doc_duplicate_spans",
    # r10 (VERDICT r9 item 5): the span family's two derived consumers
    # — the one-row corpus KPI (span extraction + interval-union token
    # sweep) and the scrub transform — previously unprobed
    "doc_token_dup_share",
    "doc_scrub_duplicate_spans",
    # r10 trainer rework: distributed word-count pass + one
    # single-task incremental merge loop — the probe pins that the
    # remaining cost is the corpus pass (near-linear stage over a
    # fixed 30-merge loop whose table is vocab-bounded)
    "doc_bpe_merges",
    "doc_dsir_weights",
    # weights + the log-space Gumbel top-k selection layer: the probe
    # times the plan shape (the generator's single-lang corpus makes
    # every weight 0, which moves no joins or aggregations)
    "doc_dsir_sample",
]
SIZES = {"n5k": 5_000, "n50k": 50_000}
RET_QUERIES = [
    "doc_bm25_topk",
    "doc_inverted_index",
    "doc_lm_score",
    "doc_hybrid_rrf",
]
EMB_QUERIES = [
    "embedding_topk_bruteforce",
    "embedding_ivf_topk",
    "embedding_pq_topk",
    "embedding_ivfpq_topk",
]
EMB_SIZES = {"e10k": 10_000, "e100k": 100_000}
DIM = 64
N_CLUSTERS = 32
REL_QUERIES = [
    "pricing_summary",
    "shipping_priority",
    "nation_revenue",
    "customer_rolling_spend",
    "user_sessions",
    "events_sliding_windows",
]
REL_SIZES = {"t1x": 1, "t10x": 10}
SEED = 42
N_GEN_FILES = 8


def _write_split(table, path: str) -> None:
    """Write a generated table as a DIRECTORY of ``N_GEN_FILES`` part
    files (Spark reads it transparently). A single-file corpus reads
    as 1-2 input splits, so every stage-1 pass (tokenize, explode,
    hash, scan) ran on 2 of 32 cores and the measured exponents mixed
    engine scaling with an unrepresentative serial read — a real
    corpus at these sizes is many files, and stage-1 parallelism
    equals the cluster, not the file count. Splitting changes bytes,
    not rows."""
    import shutil

    import pyarrow.parquet as pq

    if os.path.isfile(path):
        os.remove(path)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    n = table.num_rows
    step = max(1, (n + N_GEN_FILES - 1) // N_GEN_FILES)
    for i in range(N_GEN_FILES):
        lo = i * step
        if lo >= n:
            break
        pq.write_table(
            table.slice(lo, step), os.path.join(path, f"part-{i:02d}.parquet")
        )


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
    _write_split(table, os.path.join(out_dir, "documents.parquet"))


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
    _write_split(table, os.path.join(out_dir, "embeddings.parquet"))


def _registry():
    import __spark_entry__ as entry_mod
    import bench

    # staged-but-unregistered queries (bench extras) probe too
    return {**entry_mod.queries(), **bench._staged_queries()}


def _time_queries(
    spark,
    queries: list[str],
    sizes: dict[str, int],
    base: str,
    small: str,
    big: str,
    reps: int = 2,
) -> None:
    import math

    qs = _registry()
    results: dict[str, dict[str, list[float]]] = {
        q: {s: [] for s in sizes} for q in queries
    }
    for q in queries:
        for s in sizes:
            for rep in range(reps):
                spark.catalog.clearCache()
                gc.collect()
                spark._jvm.System.gc()
                t0 = time.perf_counter()
                # noop sink, not .count(): count lets Catalyst prune
                # every un-referenced expression (a Window computing
                # unused columns vanishes entirely — measured
                # customer_rolling_spend "flat" at 10× data under
                # count); the noop writer materializes every output
                # column without driver collect
                qs[q](spark, os.path.join(base, s)).write.format(
                    "noop"
                ).mode("overwrite").save()
                dt = round(time.perf_counter() - t0, 3)
                results[q][s].append(dt)
                print(
                    json.dumps({"query": q, "size": s, "rep": rep, "sec": dt})
                )
            n_rows = qs[q](spark, os.path.join(base, s)).count()
            print(json.dumps({"query": q, "size": s, "rows": n_rows}))

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


def gen_relational(scale: int, out_dir: str) -> None:
    """TPC-H-shape family at ``scale``× the sf0.1 row counts plus a
    30-day events stream — same schemas, key relationships (≈4 lines
    per order, FK ranges) and value distributions as the driver
    testdata, one seeded generator for both points."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(SEED)
    os.makedirs(out_dir, exist_ok=True)

    def write(name: str, table: "pa.Table") -> None:
        _write_split(table, os.path.join(out_dir, f"{name}.parquet"))

    n_cust, n_supp, n_part = 15_000 * scale, 1_000 * scale, 20_000 * scale
    n_ord, n_line, n_ev = 150_000 * scale, 600_000 * scale, 100_000 * scale

    regions = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    write(
        "region",
        pa.table(
            {
                "r_regionkey": pa.array(range(5), pa.int32()),
                "r_name": pa.array(regions),
            }
        ),
    )
    write(
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int32()),
                "n_name": pa.array([f"NATION_{i:02d}" for i in range(25)]),
                "n_regionkey": pa.array(
                    (np.arange(25) % 5).astype("int32"), pa.int32()
                ),
            }
        ),
    )
    segments = np.array(
        ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    )
    write(
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(range(n_cust), pa.int64()),
                "c_name": pa.array(
                    [f"Customer#{i:09d}" for i in range(n_cust)]
                ),
                "c_nationkey": pa.array(
                    rng.integers(0, 25, n_cust).astype("int32"), pa.int32()
                ),
                "c_acctbal": pa.array(
                    rng.uniform(-999.99, 9999.99, n_cust).round(2)
                ),
                "c_mktsegment": pa.array(
                    segments[rng.integers(0, 5, n_cust)]
                ),
            }
        ),
    )
    write(
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(range(n_supp), pa.int64()),
                "s_name": pa.array(
                    [f"Supplier#{i:09d}" for i in range(n_supp)]
                ),
                "s_nationkey": pa.array(
                    rng.integers(0, 25, n_supp).astype("int32"), pa.int32()
                ),
                "s_acctbal": pa.array(
                    rng.uniform(-999.99, 9999.99, n_supp).round(2)
                ),
            }
        ),
    )
    brands = np.array([f"Brand#{i}{j}" for i in range(1, 6) for j in range(1, 6)])
    types = np.array(
        [f"{a} {b} {c}"
         for a in ("STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO")
         for b in ("ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED")
         for c in ("TIN", "NICKEL", "BRASS", "STEEL", "COPPER")]
    )
    write(
        "part",
        pa.table(
            {
                "p_partkey": pa.array(range(n_part), pa.int64()),
                "p_name": pa.array([f"part {i} name" for i in range(n_part)]),
                "p_brand": pa.array(brands[rng.integers(0, len(brands), n_part)]),
                "p_type": pa.array(types[rng.integers(0, len(types), n_part)]),
                "p_size": pa.array(
                    rng.integers(1, 51, n_part).astype("int32"), pa.int32()
                ),
                "p_retailprice": pa.array(
                    rng.uniform(900, 2000, n_part).round(2)
                ),
            }
        ),
    )
    day_us = 86_400_000_000
    d0 = np.datetime64("1995-01-01", "us").astype("int64")
    span_days = 2_400
    statuses = np.array(["O", "F", "P"])
    prios = np.array(
        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    )
    o_dates = d0 + rng.integers(0, span_days, n_ord) * day_us
    write(
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(range(n_ord), pa.int64()),
                "o_custkey": pa.array(
                    rng.integers(0, n_cust, n_ord), pa.int64()
                ),
                "o_orderstatus": pa.array(
                    statuses[rng.integers(0, 3, n_ord)]
                ),
                "o_totalprice": pa.array(
                    rng.uniform(1000, 450_000, n_ord).round(2)
                ),
                "o_orderdate": pa.array(o_dates).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(prios[rng.integers(0, 5, n_ord)]),
            }
        ),
    )
    l_ord = rng.integers(0, n_ord, n_line)
    flags = np.array(["A", "N", "R"])
    write(
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(l_ord, pa.int64()),
                "l_partkey": pa.array(
                    rng.integers(0, n_part, n_line), pa.int64()
                ),
                "l_suppkey": pa.array(
                    rng.integers(0, n_supp, n_line), pa.int64()
                ),
                "l_linenumber": pa.array(
                    rng.integers(1, 8, n_line).astype("int32"), pa.int32()
                ),
                "l_quantity": pa.array(
                    rng.integers(1, 51, n_line).astype("float64")
                ),
                "l_extendedprice": pa.array(
                    rng.uniform(1000, 100_000, n_line).round(2)
                ),
                "l_discount": pa.array(
                    rng.integers(0, 11, n_line).astype("float64") / 100.0
                ),
                "l_tax": pa.array(
                    rng.integers(0, 9, n_line).astype("float64") / 100.0
                ),
                "l_returnflag": pa.array(flags[rng.integers(0, 3, n_line)]),
                "l_linestatus": pa.array(
                    np.array(["F", "O"])[rng.integers(0, 2, n_line)]
                ),
                "l_shipdate": pa.array(
                    o_dates[l_ord] + rng.integers(1, 122, n_line) * day_us
                ).cast(pa.timestamp("us")),
            }
        ),
    )
    ev_types = np.array(["view", "click", "purchase", "signup", "error"])
    e0 = np.datetime64("2024-01-01", "us").astype("int64")
    ts = e0 + np.sort(rng.integers(0, 30 * day_us, n_ev))
    write(
        "events",
        pa.table(
            {
                "event_id": pa.array(range(n_ev), pa.int64()),
                "ts": pa.array(ts).cast(pa.timestamp("us")),
                "user_id": pa.array(
                    rng.integers(0, 2_000 * scale, n_ev), pa.int64()
                ),
                "event_type": pa.array(ev_types[rng.integers(0, 5, n_ev)]),
                "value": pa.array(rng.exponential(20.0, n_ev).round(3)),
                "props": pa.array(
                    [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)]
                ),
            }
        ),
    )


def probe_relational(spark, base: str) -> None:
    qs = _registry()
    for name, scale in REL_SIZES.items():
        d = os.path.join(base, name)
        # isdir, not exists — see probe_docs
        if not os.path.isdir(os.path.join(d, "lineitem.parquet")):
            gen_relational(scale, d)
    # warm-up: JVM + codegen on the small point
    qs["pricing_summary"](spark, os.path.join(base, "t1x")).collect()
    _time_queries(spark, REL_QUERIES, REL_SIZES, base, "t1x", "t10x")


REL_XL_SIZES = {"t10x": 10, "t100x": 100}


def probe_relational_xl(spark, base: str) -> None:
    """Second decade for the TPC-H-shape family (10×→100× the sf0.1
    row counts: 60M lineitem, 10M events at t100x). Separate mode
    like the other -xl probes — generation alone writes several GB."""
    qs = _registry()
    for name, scale in REL_XL_SIZES.items():
        d = os.path.join(base, name)
        if not os.path.isdir(os.path.join(d, "lineitem.parquet")):
            gen_relational(scale, d)
    qs["pricing_summary"](spark, os.path.join(base, "t10x")).collect()
    # 4 reps, not 2: the decimal-exact aggregates (sum over
    # decimal(20,2) leaves Spark's compact-long Decimal path) need
    # 2-3 runs of JIT warm-up at the 60M-row point — a best-of-2
    # measured pricing_summary at 29 s where the best-of-4 steady
    # state is 3.0 s (BENCH_NOTES_r10)
    _time_queries(
        spark, REL_QUERIES, REL_XL_SIZES, base, "t10x", "t100x", reps=4
    )


def _probe_doc_family(
    spark, base: str, queries, sizes, small: str, big: str, reps: int = 2
) -> None:
    """Shared by the three docs probe decades: generate missing
    corpora (isdir, not exists: a stale pre-change SINGLE-FILE corpus
    must regenerate, or the probe silently times the 1-2-split
    serial-read layout the multi-file fix eliminated), warm up
    JVM/codegen on the small point, time the family."""
    from etl_with_s3__dynamodb_and_glue_spark.plans import llm_ops

    for name, n in sizes.items():
        d = os.path.join(base, name)
        if not os.path.isdir(os.path.join(d, "documents.parquet")):
            gen_documents(n, d)
    llm_ops.QUERIES["doc_token_stats"](
        spark, os.path.join(base, small)
    ).collect()
    _time_queries(spark, queries, sizes, base, small, big, reps=reps)


def probe_docs(spark, base: str) -> None:
    _probe_doc_family(spark, base, QUERIES, SIZES, "n5k", "n50k")


XL_QUERIES = [
    # the flagship LSH→CC composition and its pair stage: the 10×
    # probes pin exponents over 5k→50k; this mode adds the SECOND
    # decade (50k→500k) for the queries a 100 TB deployment leans on
    # hardest, so "the exponent holds" is measured, not extrapolated
    "doc_minhash_near_dups",
    "doc_dedup_final_lsh",
    # r10 trainer rework: corpus pass should stay ~linear while the
    # single-task merge loop stays vocab-bounded (flat)
    "doc_bpe_merges",
    # decade-2 completion for the SCALING.md table
    "doc_duplicate_spans",
    "doc_dsir_weights",
]
XL_SIZES = {"n50k": 50_000, "n500k": 500_000}


def probe_docs_xl(spark, base: str) -> None:
    """Second-decade probe (50k→500k docs, same generator/layout as
    probe_docs). Separate mode because generation + runs cost minutes;
    exponents print with the same keys as the 10× lines."""
    _probe_doc_family(
        spark, base, XL_QUERIES, XL_SIZES, "n50k", "n500k", reps=4
    )


XXL_SIZES = {"n500k": 500_000, "n5m": 5_000_000}


def probe_docs_xxl(spark, base: str) -> None:
    """THIRD decade for the flagship dedup composition (500k→5M docs
    — ~1.5 GB of text, generation alone runs ~20 min). Two queries
    only; the interesting physics at this point: the pair graph
    (~1M edges at 5M docs) approaches CC_LOCAL_MAX_EDGES, so this is
    the last decade the local union-find path serves before the
    distributed loop takes over.

    HYGIENE (measured, BENCH_NOTES_r10): at this size, back-to-back
    reps in ONE session thrash the multi-GB persisted token-set
    caches left by earlier reps (same-session 235 s vs fresh-session
    65 s for the pair stage). Treat this mode's output as a smoke
    record; quote FRESH-session steady state for the dossier."""
    _probe_doc_family(
        spark,
        base,
        ["doc_minhash_near_dups", "doc_dedup_final_lsh"],
        XXL_SIZES,
        "n500k",
        "n5m",
    )


def _prep_embedding_corpora(spark, base: str, sizes: dict[str, int]) -> None:
    """Shared by both embedding probe modes: generate missing corpora,
    then the untimed prebuild of every index artifact (offline
    construction); also doubles as the JVM/codegen warm-up for the
    serving paths."""
    from etl_with_s3__dynamodb_and_glue_spark.plans import llm_ops

    for name, n in sizes.items():
        d = os.path.join(base, name)
        if not os.path.isdir(os.path.join(d, "embeddings.parquet")):
            gen_embeddings(n, d)
    for s in sizes:
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


def probe_embeddings(spark, base: str) -> None:
    _prep_embedding_corpora(spark, base, EMB_SIZES)
    _time_queries(spark, EMB_QUERIES, EMB_SIZES, base, "e10k", "e100k")


EMB_XL_SIZES = {"e100k": 100_000, "e1m": 1_000_000}


def probe_embeddings_xl(spark, base: str) -> None:
    """Second decade for the ANN serving family (100k→1M vectors,
    same 32-Gaussian generator). Separate mode like docs-xl: the 1M
    index builds alone take minutes. Brute force stays in as the
    unpruned yardstick — the indexed paths' exponents only mean
    something against it."""
    _prep_embedding_corpora(spark, base, EMB_XL_SIZES)
    _time_queries(spark, EMB_QUERIES, EMB_XL_SIZES, base, "e100k", "e1m")


def probe_retrieval(spark, base: str) -> None:
    """Retrieval lineage over the SAME two-point docs family (plus
    matching-size embedding tables for the hybrid fuser) — BM25,
    full inverted-index build, bigram-LM scoring, and hybrid RRF had
    never been timed above sf0.1."""
    from etl_with_s3__dynamodb_and_glue_spark.plans import retrieval as rq

    for name, n in SIZES.items():
        d = os.path.join(base, name)
        # isdir, not exists: a stale pre-change SINGLE-FILE corpus
        # must regenerate, or the probe silently times the 1-2-split
        # serial-read layout the multi-file fix eliminated
        if not os.path.isdir(os.path.join(d, "documents.parquet")):
            gen_documents(n, d)
        if not os.path.isdir(os.path.join(d, "embeddings.parquet")):
            gen_embeddings(n, d)
    # warm-up: JVM + codegen
    rq.QUERIES["doc_bm25_topk"](spark, os.path.join(base, "n5k")).collect()
    _time_queries(spark, RET_QUERIES, SIZES, base, "n5k", "n50k")


def probe_retrieval_xl(spark, base: str) -> None:
    """Second decade for the retrieval lineage (50k→500k docs,
    reusing the docs-xl corpora; matching-size embedding tables
    generated for the hybrid fuser). Postings-list builds are the
    interesting part: the inverted index and BM25 are one
    explode+groupBy away from raw linear, so their exponents say
    whether the postings shuffle stays the only cost."""
    from etl_with_s3__dynamodb_and_glue_spark.plans import retrieval as rq

    for name, n in XL_SIZES.items():
        d = os.path.join(base, name)
        if not os.path.isdir(os.path.join(d, "documents.parquet")):
            gen_documents(n, d)
        if not os.path.isdir(os.path.join(d, "embeddings.parquet")):
            gen_embeddings(n, d)
    rq.QUERIES["doc_bm25_topk"](spark, os.path.join(base, "n50k")).collect()
    # 4 reps for the same reason as rel-xl: the 500k point's join-heavy
    # plans (25M-row gram streams) need warm-up before steady state
    _time_queries(
        spark, RET_QUERIES, XL_SIZES, base, "n50k", "n500k", reps=4
    )


def probe_stores_xl(spark, base: str) -> None:
    """Second decade of the STORE-SIZE axis (50k→500k-doc stores) for
    the two serving paths a steady-state deployment leans on: the
    MinHash signature store's arrivals-vs-store matcher and the
    decontamination gate. Store builds are untimed (offline); the
    claim under test is that SERVING stays flat as the store absorbs
    10× more history — the decade-1 exponents were −0.13 / 0.06."""
    import shutil

    from pyspark.sql import functions as F

    from etl_with_s3__dynamodb_and_glue_spark.operators import dedup
    from etl_with_s3__dynamodb_and_glue_spark.streaming import decontam_gate

    for name, n in XL_SIZES.items():
        d = os.path.join(base, name)
        if not os.path.isdir(os.path.join(d, "documents.parquet")):
            gen_documents(n, d)
    docs50 = spark.read.parquet(
        os.path.join(base, "n50k", "documents.parquet")
    )
    docs500 = spark.read.parquet(
        os.path.join(base, "n500k", "documents.parquet")
    )
    sdir = os.path.join(base, "stores_xl")
    shutil.rmtree(sdir, ignore_errors=True)
    os.makedirs(sdir)
    _noop(dedup.exact_dedup(docs50.limit(200)))

    mh = {}
    for name, docs in (("s50k", docs50), ("s500k", docs500)):
        p = os.path.join(sdir, f"minhash_{name}")
        t0 = time.perf_counter()
        dedup.build_minhash_store(docs, p)
        print(
            json.dumps(
                {
                    "build": f"minhash_store_{name}",
                    "sec": round(time.perf_counter() - t0, 3),
                    "timed": False,
                }
            )
        )
        mh[name] = p

    def arrivals(n):
        # shared generator seed: n50k is an exact prefix of n500k, so
        # these re-keyed rows carry real dups against BOTH stores
        return docs500.filter(F.col("doc_id") < n).withColumn(
            "doc_id", F.col("doc_id") + 10_000_000
        )

    serve = {}
    for name in ("s50k", "s500k"):
        store = dedup.load_minhash_store(spark, mh[name])
        serve[name] = _probe_call(
            spark,
            "minhash_store_serving",
            lambda rep, s=store: _noop(
                dedup.minhash_near_dups_vs_store(arrivals(500), s)
            ),
            store=name,
            batch=500,
        )
    _exp_line(
        "minhash_store_serving_vs_store_size_decade2",
        serve["s50k"],
        serve["s500k"],
        batch=500,
    )

    anchor = {}
    for name, docs in (("e5k", docs50), ("e50k", docs500)):
        ev = docs.filter(F.col("doc_id") % 10 == 0)
        p = os.path.join(sdir, f"anchors_{name}")
        t0 = time.perf_counter()
        dedup.build_anchor_store(ev, p, min_tokens=8)
        print(
            json.dumps(
                {
                    "build": f"anchor_store_{name}",
                    "sec": round(time.perf_counter() - t0, 3),
                    "timed": False,
                }
            )
        )
        anchor[name] = p
    batch = docs50.filter(F.col("doc_id") < 5000)

    def screen(rep, store, tag):
        # fresh landing dirs + advancing batch_id per rep: the gate's
        # replay marker rejects a repeated id by design
        fdir = os.path.join(sdir, f"gate_f_{tag}_{rep}")
        ddir = os.path.join(sdir, f"gate_d_{tag}_{rep}")
        decontam_gate.screen_batch(
            batch, rep, store, fdir, ddir, min_tokens=8,
            run_id=f"probe_xl_{tag}",
        )

    gate_t = {}
    for name in ("e5k", "e50k"):
        gate_t[name] = _probe_call(
            spark,
            "decontam_gate_screen",
            lambda rep, s=anchor[name], n=name: screen(rep, s, f"store_{n}"),
            store=name,
            batch=5000,
        )
    _exp_line(
        "decontam_gate_vs_store_size_decade2",
        gate_t["e5k"],
        gate_t["e50k"],
        batch=5000,
    )


def _probe_call(spark, label: str, fn, reps: int = 2, **tags) -> float:
    """Best-of-``reps`` timing of one call with the probe discipline
    (cache clear + both GCs before each rep); prints one JSON line per
    rep and returns the best. ``fn`` does its own materialization —
    noop sink for pure reads, the call itself for store writers (the
    write IS the deployment cost being measured)."""
    best = float("inf")
    for rep in range(reps):
        spark.catalog.clearCache()
        gc.collect()
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        fn(rep)
        dt = round(time.perf_counter() - t0, 3)
        print(json.dumps({"probe": label, "rep": rep, "sec": dt, **tags}))
        best = min(best, dt)
    return best


def _exp_line(label: str, t1: float, t10: float, **tags) -> None:
    import math

    print(
        json.dumps(
            {
                "probe": label,
                "sec_1x": t1,
                "sec_10x": t10,
                "ratio_10x": round(t10 / t1, 2),
                "scaling_exponent": round(math.log(t10 / t1) / math.log(10), 3),
                **tags,
            }
        )
    )


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def probe_stores(spark, base: str) -> None:
    """Incremental/streaming-store family (VERDICT r8 item 5) — the
    only family never probed at 10×, and where a 100 TB deployment
    actually lives (steady-state incremental, not one-shot): the
    MinHash signature store's arrivals-vs-store matcher, the CMS
    frequency store's merge + estimate, and the decontamination gate,
    each at 10× STORE size and 10× BATCH size independently. Pure
    reads go through the noop sink; store-writing calls time the
    whole call (the write is the deployment cost). The two docs
    corpora share the generator seed, so n5k is an exact prefix of
    n50k — arrivals drawn from one genuinely match the other's
    dups/near-dups."""
    import shutil

    from pyspark.sql import functions as F

    from etl_with_s3__dynamodb_and_glue_spark.operators import dedup
    from etl_with_s3__dynamodb_and_glue_spark.streaming import (
        cms_store,
        decontam_gate,
    )

    for name, n in SIZES.items():
        d = os.path.join(base, name)
        if not os.path.isdir(os.path.join(d, "documents.parquet")):
            gen_documents(n, d)
    docs5 = spark.read.parquet(os.path.join(base, "n5k", "documents.parquet"))
    docs50 = spark.read.parquet(
        os.path.join(base, "n50k", "documents.parquet")
    )
    sdir = os.path.join(base, "stores")
    shutil.rmtree(sdir, ignore_errors=True)
    os.makedirs(sdir)
    # warm-up: JVM + codegen + Python worker spin-up
    _noop(dedup.exact_dedup(docs5.limit(200)))

    # --- A. MinHash signature store: arrivals-vs-store serving -----
    mh_paths = {}
    for name, docs in (("s5k", docs5), ("s50k", docs50)):
        p = os.path.join(sdir, f"minhash_{name}")
        t0 = time.perf_counter()
        dedup.build_minhash_store(docs, p)
        print(
            json.dumps(
                {
                    "build": f"minhash_store_{name}",
                    "sec": round(time.perf_counter() - t0, 3),
                    "timed": False,
                }
            )
        )
        mh_paths[name] = p

    def arrivals(n):
        # real corpus rows re-keyed as a new batch: content matches
        # (exact + near dups) exist against BOTH stores by prefix
        return docs50.filter(F.col("doc_id") < n).withColumn(
            "doc_id", F.col("doc_id") + 10_000_000
        )

    serve = {}
    for name in ("s5k", "s50k"):
        store = dedup.load_minhash_store(spark, mh_paths[name])
        serve[name] = _probe_call(
            spark,
            "minhash_store_serving",
            lambda rep, s=store: _noop(
                dedup.minhash_near_dups_vs_store(arrivals(500), s)
            ),
            store=name,
            batch=500,
        )
    _exp_line(
        "minhash_store_serving_vs_store_size",
        serve["s5k"],
        serve["s50k"],
        batch=500,
    )
    big_store = dedup.load_minhash_store(spark, mh_paths["s50k"])
    batch_t = {}
    for nb in (500, 5000):
        batch_t[nb] = _probe_call(
            spark,
            "minhash_store_serving",
            lambda rep, n=nb: _noop(
                dedup.minhash_near_dups_vs_store(arrivals(n), big_store)
            ),
            store="s50k",
            batch=nb,
        )
    _exp_line(
        "minhash_store_serving_vs_batch_size",
        batch_t[500],
        batch_t[5000],
        store="s50k",
    )

    # --- B. CMS frequency store: merge + estimate -------------------
    def keyed(docs):
        return docs.select(
            F.explode(F.split(F.col("text"), " ")).alias("tok")
        )

    # merge cost vs BATCH size (fresh store each rep: the guard marker
    # would otherwise flag rep 2 as a replay)
    merge_t = {}
    for name, docs in (("b250k", docs5), ("b2500k", docs50)):

        def do_merge(rep, d=docs, n=name):
            p = os.path.join(sdir, f"cms_fresh_{n}_{rep}")
            cms_store.merge_cms_batch(
                spark, keyed(d), p, "tok", batch_id=0, run_id="probe"
            )

        merge_t[name] = _probe_call(
            spark, "cms_merge_fresh", do_merge, batch=name
        )
    _exp_line(
        "cms_merge_vs_batch_size", merge_t["b250k"], merge_t["b2500k"]
    )
    # merge cost vs STORE AGE: the store is O(d·w) cells whatever it
    # has absorbed, so merge #10 must cost what merge #1 did
    aged = os.path.join(sdir, "cms_aged")
    times = []
    for b in range(10):
        spark.catalog.clearCache()
        gc.collect()
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        cms_store.merge_cms_batch(
            spark, keyed(docs5), aged, "tok", batch_id=b, run_id="probe"
        )
        times.append(round(time.perf_counter() - t0, 3))
    print(
        json.dumps(
            {
                "probe": "cms_merge_vs_store_age",
                "merge_1": times[0],
                "merge_10": times[-1],
                "all": times,
            }
        )
    )
    # estimate vs KEY count (store fixed; sketch broadcasts)
    keys = keyed(docs50).distinct()
    est_t = {}
    for nk in (1000, 10_000):
        kdf = keys.limit(nk)
        est_t[nk] = _probe_call(
            spark,
            "cms_estimate",
            lambda rep, k=kdf: _noop(
                cms_store.estimate_counts(spark, aged, k, "tok")
            ),
            n_keys=nk,
        )
    _exp_line("cms_estimate_vs_key_count", est_t[1000], est_t[10_000])

    # --- C. Decontamination gate ------------------------------------
    anchor = {}
    for name, mod in (("e500", 100), ("e5000", 10)):
        ev = docs50.filter(F.col("doc_id") % mod == 0)
        p = os.path.join(sdir, f"anchors_{name}")
        t0 = time.perf_counter()
        dedup.build_anchor_store(ev, p, min_tokens=8)
        print(
            json.dumps(
                {
                    "build": f"anchor_store_{name}",
                    "sec": round(time.perf_counter() - t0, 3),
                    "timed": False,
                }
            )
        )
        anchor[name] = p

    def screen(rep, batch, store, tag):
        # fresh landing dirs + advancing batch_id per rep: the gate's
        # replay marker rejects a repeated id by design
        fdir = os.path.join(sdir, f"gate_f_{tag}_{rep}")
        ddir = os.path.join(sdir, f"gate_d_{tag}_{rep}")
        decontam_gate.screen_batch(
            batch, rep, store, fdir, ddir, min_tokens=8, run_id=f"probe_{tag}"
        )

    gate_t = {}
    for name in ("e500", "e5000"):
        gate_t[name] = _probe_call(
            spark,
            "decontam_gate_screen",
            lambda rep, s=anchor[name], n=name: screen(
                rep, docs5, s, f"store_{n}"
            ),
            store=name,
            batch=5000,
        )
    _exp_line(
        "decontam_gate_vs_store_size",
        gate_t["e500"],
        gate_t["e5000"],
        batch=5000,
    )
    gb_t = {}
    for name, docs in (("b5k", docs5), ("b50k", docs50)):
        gb_t[name] = _probe_call(
            spark,
            "decontam_gate_screen",
            lambda rep, d=docs, n=name: screen(
                rep, d, anchor["e500"], f"batch_{n}"
            ),
            store="e500",
            batch=name,
        )
    _exp_line(
        "decontam_gate_vs_batch_size", gb_t["b5k"], gb_t["b50k"], store="e500"
    )


def main() -> None:
    from etl_with_s3__dynamodb_and_glue_spark import get_spark

    family = sys.argv[1] if len(sys.argv) > 1 else "all"
    known = {
        "docs", "embeddings", "relational", "retrieval", "stores",
        "docs-xl", "emb-xl", "rel-xl", "ret-xl", "stores-xl",
        "docs-xxl", "all",
    }
    if family not in known:
        sys.exit(f"unknown probe family {family!r}; one of {sorted(known)}")
    base = os.path.join(HERE, ".scale_probe")
    spark = get_spark()
    if family in ("docs", "all"):
        probe_docs(spark, base)
    # not in "all": minutes-long by design, run explicitly
    if family == "docs-xl":
        probe_docs_xl(spark, base)
    if family == "emb-xl":
        probe_embeddings_xl(spark, base)
    if family == "rel-xl":
        probe_relational_xl(spark, base)
    if family == "ret-xl":
        probe_retrieval_xl(spark, base)
    if family == "stores-xl":
        probe_stores_xl(spark, base)
    if family == "docs-xxl":
        probe_docs_xxl(spark, base)
    if family in ("embeddings", "all"):
        probe_embeddings(spark, base)
    if family in ("relational", "all"):
        probe_relational(spark, base)
    if family in ("retrieval", "all"):
        probe_retrieval(spark, base)
    if family in ("stores", "all"):
        probe_stores(spark, base)
    spark.stop()


if __name__ == "__main__":
    main()
