"""Round-13 scale probes: the three banked fixes under load, plus the
r13-window lineages with no XL row on record.

Usage: python tools/probe_r13.py
    [stores|pq e1m|pq e10m|pq-recall|cc|win-docs|win-rel|win-emb]

* ``stores``  — decade-3 store serving (500k/5M-doc signature stores,
  500-doc batch) RE-RUN WITHOUT the ``spark.driver.maxResultSize``
  crutch the r12 probe needed: the broadcast-side pin in
  ``minhash_near_dups_vs_store`` must hold the driver collection to
  the batch-derived sides at the DEFAULT 1g limit, or the fix did not
  close the driver-OOM class it was banked for (BENCH_NOTES_r12 §7).
* ``pq e1m`` / ``pq e10m`` — the PQ family's third decade, unblocked
  by sampled codebook training (quantization.train_pq max_train_rows):
  per-size fresh sessions (the single-session two-point methodology
  OOMed at e10m — probe_r12 note), separate untimed build lines for
  IVF / PQ / IVF-PQ, then embedding_pq_topk + embedding_ivfpq_topk
  serving reps. Exponents are assembled from the two logs.
* ``pq-recall`` — the cap's quality check: at e1m (where the 2^18 cap
  ENGAGES, frac≈0.26) train codebooks capped AND uncapped, ADC-serve
  both against the same exact brute-force top-k, and report recall@10
  side by side. At e100k the cap is a no-op (100k < 2^18; bit-identity
  pinned by tests/test_quantization.py), so one recall line suffices.
* ``cc``      — peak cached-storage before/after for the
  double-persist fix (ADVICE r10 / VERDICT r12 item 2): a synthetic
  ~2.5M-pair chain graph (n_sym ≈ 5M > 2·CC_LOCAL_MAX_EDGES) forces
  the distributed fixpoint; a sampler thread reads
  ``getRDDStorageInfo()`` at 100ms and records the peak cached bytes
  for (a) the FIXED path (``_pointer_jump_components`` releases the
  caller's unpartitioned persist before the loop) and (b) an in-probe
  replica of the OLD call shape (both copies pinned through the
  loop), plus label parity between the two runs.
* ``win-docs`` / ``win-rel`` / ``win-emb`` — second-decade sweep for
  the r13-window lineages with no XL row in SCALING.md or any
  BENCH_NOTES (the six r9 deferrals plus seven r10-checked queries
  whose families were never probed by name). ``doc_jaccard_pairs`` is
  EXCLUDED by the standing cause: it is the documented exact
  all-pairs oracle twin (same class as doc_arrivals_dedup /
  doc_split_leakage_audit) — its scale shape is the already-probed
  minhash/simhash banded paths.

Reuses tools/scale_probe.py's corpus generators, warm-up discipline
and noop-sink timing; run each family in its OWN fresh process, never
concurrently with another Spark job (BENCH_NOTES_r10 hygiene).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import scale_probe as sp  # noqa: E402

from etl_with_s3__dynamodb_and_glue_spark import get_spark  # noqa: E402

BASE = os.path.join("/root/repo", ".scale_probe")

WIN_DOCS = [
    "doc_lang_confusion",
    "doc_token_budget_sample",
    "doc_exact_dedup",
    "doc_simhash_near_dups",
    "doc_pii_scrub",
    "doc_dsir_admissions",
]
WIN_REL = [
    "published_segment_kpis",
    "top_return_customers",
    "nation_revenue_pareto",
    "flagship_daily_segment_topk",
    "segment_kpis_compat",
    "top_rows_per_day_compat",
    "segment_event_value_salted",
    "order_rank_flavors",
]
# exact brute-force scorer — expect the bruteforce family's linear
# shape (e100k→e1m like the rest of the embedding decade-2 rows)
WIN_EMB = ["embedding_hard_negatives"]


def _sweep(spark, qs, queries, small: str, big: str, reps: int = 3):
    import gc
    import json as _json
    import math
    import time as _time

    for q in queries:
        best = {}
        for size in (small, big):
            reps_done = []
            for rep in range(reps):
                spark.catalog.clearCache()
                gc.collect()
                spark._jvm.System.gc()
                t0 = _time.perf_counter()
                try:
                    qs[q](spark, os.path.join(BASE, size)).write.format(
                        "noop"
                    ).mode("overwrite").save()
                except Exception as exc:  # noqa: BLE001
                    print(
                        _json.dumps(
                            {
                                "query": q,
                                "size": size,
                                "error": f"{type(exc).__name__}: {exc}"[:300],
                            }
                        ),
                        flush=True,
                    )
                    break
                dt = round(_time.perf_counter() - t0, 3)
                reps_done.append(dt)
                print(
                    _json.dumps(
                        {"query": q, "size": size, "rep": rep, "sec": dt}
                    ),
                    flush=True,
                )
                if dt > 300:
                    break
            if reps_done:
                best[size] = min(reps_done)
        if len(best) == 2 and best[small] > 0:
            print(
                _json.dumps(
                    {
                        "query": q,
                        f"sec_{small}": best[small],
                        f"sec_{big}": best[big],
                        "scaling_exponent": round(
                            math.log(best[big] / best[small]) / math.log(10),
                            3,
                        ),
                    }
                ),
                flush=True,
            )


def _probe_stores(spark) -> None:
    """probe_r12's stores family minus the 8g maxResultSize override —
    the point IS running at the 1g default."""
    import json as _json
    import shutil
    import time as _time

    from pyspark.sql import functions as F

    from etl_with_s3__dynamodb_and_glue_spark.operators import dedup

    sizes = {"n500k": 500_000, "n5m": 5_000_000}
    for name, n in sizes.items():
        d = os.path.join(BASE, name)
        if not os.path.isdir(os.path.join(d, "documents.parquet")):
            sp.gen_documents(n, d)
    docs500k = spark.read.parquet(
        os.path.join(BASE, "n500k", "documents.parquet")
    )
    docs5m = spark.read.parquet(os.path.join(BASE, "n5m", "documents.parquet"))
    sdir = os.path.join(BASE, "stores_xxl")
    shutil.rmtree(sdir, ignore_errors=True)
    os.makedirs(sdir)
    sp._noop(dedup.exact_dedup(docs500k.limit(200)))
    mh = {}
    for name, docs in (("s500k", docs500k), ("s5m", docs5m)):
        p = os.path.join(sdir, f"minhash_{name}")
        t0 = _time.perf_counter()
        dedup.build_minhash_store(docs, p)
        print(
            _json.dumps(
                {
                    "build": f"minhash_store_{name}",
                    "sec": round(_time.perf_counter() - t0, 3),
                    "timed": False,
                }
            ),
            flush=True,
        )
        mh[name] = p

    def arrivals(n):
        # n500k is an exact prefix of n5m (shared generator seed) —
        # see probe_r12's stores family for why arrivals read the
        # SMALLER corpus
        return docs500k.filter(F.col("doc_id") < n).withColumn(
            "doc_id", F.col("doc_id") + 10_000_000
        )

    serve = {}
    for name in ("s500k", "s5m"):
        store = dedup.load_minhash_store(spark, mh[name])
        serve[name] = sp._probe_call(
            spark,
            "minhash_store_serving_pinned",
            lambda rep, s=store: sp._noop(
                dedup.minhash_near_dups_vs_store(arrivals(500), s)
            ),
            store=name,
            batch=500,
            max_result_size="default_1g",
        )
    sp._exp_line(
        "minhash_store_serving_vs_store_size_decade3_pinned",
        serve["s500k"],
        serve["s5m"],
        batch=500,
    )


def _probe_pq(spark, size_name: str, n: int) -> None:
    import json as _json
    import time as _time

    from etl_with_s3__dynamodb_and_glue_spark.plans import llm_ops

    d = os.path.join(BASE, size_name)
    if not os.path.isdir(os.path.join(d, "embeddings.parquet")):
        sp.gen_embeddings(n, d)
    qs = sp._registry()
    for label, ensure in (
        ("ivf", llm_ops.ensure_ivf_index),
        ("pq", llm_ops.ensure_pq_index),
        ("ivfpq", llm_ops.ensure_ivfpq_index),
    ):
        t0 = _time.perf_counter()
        ensure(spark, d)
        print(
            _json.dumps(
                {
                    "build": f"{label}_{size_name}",
                    "sec": round(_time.perf_counter() - t0, 3),
                    "timed": False,
                }
            ),
            flush=True,
        )
    for q in ("embedding_pq_topk", "embedding_ivfpq_topk"):
        best = None
        for rep in range(3):
            import gc

            spark.catalog.clearCache()
            gc.collect()
            spark._jvm.System.gc()
            t0 = _time.perf_counter()
            qs[q](spark, d).write.format("noop").mode("overwrite").save()
            dt = round(_time.perf_counter() - t0, 3)
            best = dt if best is None or dt < best else best
            print(
                _json.dumps(
                    {"query": q, "size": size_name, "rep": rep, "sec": dt}
                ),
                flush=True,
            )
        print(
            _json.dumps({"query": q, "size": size_name, "sec_best": best}),
            flush=True,
        )


def _probe_pq_recall(spark) -> None:
    """Capped-vs-uncapped codebook quality at the first size where the
    cap ENGAGES (e1m: frac = 2^18/1e6 ≈ 0.26). Same config as
    ensure_pq_index (m=16, k=16, dim=64, max_iter=5); both variants
    ADC-serve the standard 10-query probe set against the SAME exact
    brute-force top-10, so the recall delta isolates centroid
    placement. e100k needs no run: the cap is a no-op below 2^18 and
    bit-identity is pinned by test_train_cap_is_noop_below_threshold."""
    import json as _json
    import time as _time

    from etl_with_s3__dynamodb_and_glue_spark.operators import (
        quantization as Q,
        similarity as S,
    )
    from etl_with_s3__dynamodb_and_glue_spark.plans import llm_ops

    import numpy as np

    d = os.path.join(BASE, "e1m")
    if not os.path.isdir(os.path.join(d, "embeddings.parquet")):
        sp.gen_embeddings(1_000_000, d)
    emb = llm_ops._emb(spark, d)
    queries = llm_ops._queries_df(spark, d)
    exact = S.brute_force_topk(emb, queries, k=10).persist()
    exact.count()
    # distortion sample: 20k seeded rows, L2-normalized like the
    # encode path — E‖x − decode(encode(x))‖² is the direct codebook-
    # quality statistic, and unlike recall it stays SENSITIVE at this
    # corpus size (recall@10 on 1M structure-less random vectors is
    # ~0 for ANY 16×16 codebook — quantization error exceeds the gap
    # between true neighbors; the documented 0.45 floor is the small-
    # corpus regime)
    sample = np.array(
        emb.sample(withReplacement=False, fraction=0.02, seed=11)
        .limit(20_000)
        .toPandas()["embedding"]
        .tolist(),
        dtype=np.float64,
    )
    sample = sample / np.linalg.norm(sample, axis=1, keepdims=True)
    served = {}
    # the seed-13 control isolates what the OVERLAP metric means on
    # this data: if merely re-seeding k-means init reshuffles the
    # served list as thoroughly as capping does, list instability is
    # a property of the near-tie band (random vectors, equal-distance
    # candidates), not of the sampled training
    for label, cap, seed in (
        ("capped_2^18", 262_144, 7),
        ("uncapped", None, 7),
        ("capped_seed13", 262_144, 13),
    ):
        t0 = _time.perf_counter()
        books = Q.train_pq(
            emb, m=16, k=16, dim=64, max_iter=5, max_train_rows=cap,
            seed=seed,
        )
        build = round(_time.perf_counter() - t0, 3)
        cb = np.asarray(books.codebooks, dtype=np.float64)  # (m,k,dsub)
        m, _, dsub = cb.shape
        err = 0.0
        for j in range(m):
            xj = sample[:, j * dsub : (j + 1) * dsub]
            d2 = (
                (xj**2).sum(1, keepdims=True)
                - 2 * xj @ cb[j].T
                + (cb[j] ** 2).sum(1)
            )
            err += d2.min(axis=1).sum()
        distortion = err / len(sample)
        codes = Q.pq_encode(books, emb)
        approx = Q.pq_adc_topk(books, codes, queries, k=10).persist()
        rec = S.recall_at_k(approx, exact, 10)
        served[label] = approx
        print(
            _json.dumps(
                {
                    "probe": "pq_recall_e1m",
                    "variant": label,
                    "recall_at_10": round(rec, 4),
                    "quantization_distortion": round(distortion, 6),
                    "train_sec": build,
                }
            ),
            flush=True,
        )
    for a, b in (
        ("capped_2^18", "uncapped"),
        ("capped_2^18", "capped_seed13"),
    ):
        fa = served[a].select("query_id", "neighbor_id")
        ovl = fa.intersect(
            served[b].select("query_id", "neighbor_id")
        ).count() / max(fa.count(), 1)
        print(
            _json.dumps(
                {
                    "probe": "pq_recall_e1m",
                    f"served_topk_overlap_{a}_vs_{b}": round(ovl, 4),
                }
            ),
            flush=True,
        )
    exact.unpersist()


def _probe_cc(
    spark, order: str = "fixed-first", graph: str = "clique"
) -> None:
    """Peak cached-storage, fixed path vs old call shape (VERDICT r12
    item 2 done-criterion). Both graphs push n_sym past
    2·CC_LOCAL_MAX_EDGES so the distributed branch runs.

    * ``chain`` (component size 32, diameter 31): edges ≈ vertices.
      Measured FIRST and kept for the record: at this shape the total
      peak is dominated by the loop's per-round ``localCheckpoint``
      blocks (which scale with the pair-graph VERTEX count and are
      identical across variants — they free only on GC, which is also
      why the second variant in a session reads ~2×: it sits on the
      first variant's not-yet-collected blocks). The extra pinned
      edge copy (~tens of MB columnar) is invisible under that, so
      the chain graph CANNOT isolate the fix.
    * ``clique`` (default; components = 50-cliques, 100k vertices,
      2.45M pairs): the EDGE-dominated regime — checkpoint frames are
      100k rows while the edge caches are 4.9M — which is exactly the
      regime the double-persist hurt: near-dup clusters are cliquish
      (boilerplate), so crawl-scale pair graphs carry edges >>
      vertices. Per-cache byte accounting (storage-info delta at each
      materialization) isolates the released copy directly.

    Storage is sampled, not timed — same-session A/B is legitimate
    here (the hygiene rule guards TIMING); the emitted ``sec`` fields
    are NOT comparable across variants in one run (whichever goes
    first pays the session's codegen warm-up — run both orders and
    compare per-position)."""
    import json as _json
    import threading
    import time as _time

    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    from etl_with_s3__dynamodb_and_glue_spark.operators import dedup

    if graph == "chain":
        n_vertices = 2_560_000
        chain = 32
        base = spark.range(n_vertices).select(
            F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
        )
        pairs = base.filter((F.col("id_a") % chain) != (chain - 1))
    else:
        n_vertices = 100_000
        csize = 50
        members = spark.range(n_vertices)
        a = members.select(
            (F.col("id") / csize).cast("long").alias("c"),
            F.col("id").alias("id_a"),
        )
        b = a.select(F.col("c"), F.col("id_a").alias("id_b"))
        pairs = a.join(b, "c").filter(F.col("id_a") < F.col("id_b")).select(
            "id_a", "id_b"
        )
    vertices = spark.range(n_vertices + 100_000).select(
        F.col("id").alias("doc_id")
    )
    if graph == "clique-str":
        # realistic id regime: the production pair tables carry STRING
        # doc_ids ("doc000001234"), which cache many× fatter than
        # sequential longs (whose columnar encoding crushed the edge
        # caches to ~2 MB and hid the delta)
        pairs = pairs.select(
            F.format_string("doc%09d", "id_a").alias("id_a"),
            F.format_string("doc%09d", "id_b").alias("id_b"),
        )
        vertices = vertices.select(
            F.format_string("doc%09d", "doc_id").alias("doc_id")
        )

    class _Sampler:
        def __init__(self):
            self.peak_bytes = 0
            self.peak_rdds = 0
            self._stop = threading.Event()
            self._t = threading.Thread(target=self._run, daemon=True)

        def _run(self):
            sc = spark.sparkContext._jsc.sc()
            while not self._stop.is_set():
                try:
                    infos = sc.getRDDStorageInfo()
                    total = sum(
                        i.memSize() + i.diskSize() for i in infos
                    )
                    cached = sum(
                        1 for i in infos if i.numCachedPartitions() > 0
                    )
                    if total > self.peak_bytes:
                        self.peak_bytes = total
                    if cached > self.peak_rdds:
                        self.peak_rdds = cached
                except Exception:  # noqa: BLE001 — py4j race on teardown
                    pass
                _time.sleep(0.1)

        def __enter__(self):
            self._t.start()
            return self

        def __exit__(self, *exc):
            self._stop.set()
            self._t.join()

    def _emit(variant, sampler, sec):
        print(
            _json.dumps(
                {
                    "probe": "cc_peak_storage",
                    "variant": variant,
                    "peak_cached_mb": round(
                        sampler.peak_bytes / 1024 / 1024, 1
                    ),
                    "peak_cached_rdds": sampler.peak_rdds,
                    "sec": round(sec, 3),
                }
            ),
            flush=True,
        )

    results = {}

    def _storage_mb() -> float:
        sc = spark.sparkContext._jsc.sc()
        return sum(
            i.memSize() + i.diskSize() for i in sc.getRDDStorageInfo()
        ) / 1024 / 1024

    def _settle():
        """Free the previous variant's checkpoint blocks (ContextCleaner
        needs both Python and JVM GC) so variant 2 doesn't sit on
        variant 1's storage — the raw A/B's ~2× position artifact."""
        import gc

        spark.catalog.clearCache()
        for _ in range(20):
            gc.collect()
            spark._jvm.System.gc()
            _time.sleep(1)
            if _storage_mb() < 50:
                break
        print(
            _json.dumps(
                {
                    "probe": "cc_peak_storage",
                    "settled_baseline_mb": round(_storage_mb(), 1),
                }
            ),
            flush=True,
        )

    def _run_fixed():
        # fixed path: the shipped operator (source persist released
        # before the fixpoint loop)
        _settle()
        with _Sampler() as s:
            t0 = _time.perf_counter()
            fixed = dedup.connected_components(pairs, vertices).persist()
            fixed.count()
            dt = _time.perf_counter() - t0
        _emit("fixed", s, dt)
        results["fixed"] = fixed

    def _run_old():
        # old call shape: BOTH the unpartitioned symmetrized persist
        # and the co-partitioned loop copy pinned for the entire
        # fixpoint — the r10..r12 behavior this round removed
        _settle()
        edges = pairs.select(
            F.col("id_a").alias("u"), F.col("id_b").alias("v")
        )
        edges_sym = edges.union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).persist(StorageLevel.MEMORY_AND_DISK)
        with _Sampler() as s:
            t0 = _time.perf_counter()
            s0 = _storage_mb()
            edges_sym.count()
            s1 = _storage_mb()
            nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
            co = edges_sym.repartition(nparts, "u").persist(
                StorageLevel.MEMORY_AND_DISK
            )
            co.count()
            s2 = _storage_mb()
            print(
                _json.dumps(
                    {
                        "probe": "cc_peak_storage",
                        "src_edge_cache_mb": round(s1 - s0, 1),
                        "co_edge_cache_mb": round(s2 - s1, 1),
                        "pinned_through_loop_old_mb": round(s2 - s0, 1),
                        "pinned_through_loop_fixed_mb": round(s2 - s1, 1),
                    }
                ),
                flush=True,
            )
            labels = dedup._pointer_jump_loop(co, 50)
            old = (
                vertices.join(
                    labels, vertices["doc_id"] == labels["vid"], "left"
                )
                .select(
                    F.col("doc_id"),
                    F.coalesce("label", F.col("doc_id")).alias(
                        "cluster_id"
                    ),
                )
                .persist()
            )
            old.count()
            dt = _time.perf_counter() - t0
        _emit("old_double_persist", s, dt)
        results["old"] = old
        # release the big loop caches HERE so they can't inflate the
        # other variant's sampled peak when this one runs first; the
        # small (vid,label)-sized result stays pinned for parity
        co.unpersist()
        edges_sym.unpersist()

    runners = (
        (_run_fixed, _run_old)
        if order == "fixed-first"
        else (_run_old, _run_fixed)
    )
    for r in runners:
        r()

    old, fixed = results["old"], results["fixed"]
    mism = (
        old.exceptAll(fixed).count() + fixed.exceptAll(old).count()
    )
    print(
        _json.dumps({"probe": "cc_peak_storage", "label_parity_mismatches": mism}),
        flush=True,
    )


def main() -> None:
    family = sys.argv[1] if len(sys.argv) > 1 else "win-docs"
    spark = get_spark(f"probe-r13-{family}")
    qs = sp._registry()
    if family == "stores":
        _probe_stores(spark)
    elif family == "pq-recall":
        _probe_pq_recall(spark)
    elif family == "cc":
        _probe_cc(
            spark,
            sys.argv[2] if len(sys.argv) > 2 else "fixed-first",
            sys.argv[3] if len(sys.argv) > 3 else "clique",
        )
    elif family == "pq":
        size_name = sys.argv[2]
        n = {"e1m": 1_000_000, "e10m": 10_000_000}[size_name]
        _probe_pq(spark, size_name, n)
    elif family == "win-docs":
        only = set(sys.argv[2:])
        for name, n in sp.XL_SIZES.items():
            d = os.path.join(BASE, name)
            if not os.path.isdir(os.path.join(d, "documents.parquet")):
                sp.gen_documents(n, d)
        qs["doc_token_stats"](spark, os.path.join(BASE, "n50k")).collect()
        sel = [q for q in WIN_DOCS if not only or q in only]
        _sweep(spark, qs, sel, "n50k", "n500k", reps=3)
    elif family == "win-rel":
        only = set(sys.argv[2:])
        for name, scale in sp.REL_XL_SIZES.items():
            d = os.path.join(BASE, name)
            if not os.path.isdir(os.path.join(d, "lineitem.parquet")):
                sp.gen_relational(scale, d)
        qs["pricing_summary"](spark, os.path.join(BASE, "t10x")).collect()
        sel = [q for q in WIN_REL if not only or q in only]
        _sweep(spark, qs, sel, "t10x", "t100x", reps=3)
    elif family == "win-emb":
        only = set(sys.argv[2:])
        sizes = dict(sp.EMB_XL_SIZES)
        for name, n in sizes.items():
            d = os.path.join(BASE, name)
            if not os.path.isdir(os.path.join(d, "embeddings.parquet")):
                sp.gen_embeddings(n, d)
        sel = [q for q in WIN_EMB if not only or q in only]
        _sweep(spark, qs, sel, "e100k", "e1m", reps=3)
    else:
        sys.exit(
            "family must be stores, pq <size>, pq-recall, cc, "
            "win-docs, win-rel or win-emb"
        )


if __name__ == "__main__":
    main()
