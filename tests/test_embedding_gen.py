"""Embedding-inference boundary tests: determinism and partitioning
invariance of the batched plumbing, the loud real-model gate, and the
downstream composition (embed → PQ/ANN) that the boundary exists for."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_with_s3__dynamodb_and_glue_spark.operators import (
    embedding_gen as E,
    quantization as Q,
    similarity as S,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").cache()
    yield df
    df.unpersist()


def test_embeddings_shape_and_norm(docs):
    import numpy as np

    rows = E.embed_texts(docs.limit(20)).collect()
    assert len(rows) == 20
    for r in rows:
        v = np.asarray(r.embedding)
        assert v.shape == (64,)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-9


def test_embedding_is_partitioning_invariant(docs):
    """The determinism contract: an embedder is a pure function of the
    text, so any partitioning/batching yields identical vectors."""
    sample = docs.limit(50)
    one = {r.doc_id: tuple(r.embedding) for r in E.embed_texts(sample.repartition(1)).collect()}
    many = {r.doc_id: tuple(r.embedding) for r in E.embed_texts(sample.repartition(7)).collect()}
    assert one == many


def test_identical_texts_embed_identically(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "delta")],
        "doc_id long, text string",
    )
    vecs = {r.doc_id: tuple(r.embedding) for r in E.embed_texts(df).collect()}
    assert vecs[1] == vecs[2]
    assert vecs[1] != vecs[3]


def test_empty_text_embeds_to_zero(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "   ")], "doc_id long, text string"
    )
    for r in E.embed_texts(df).collect():
        assert all(x == 0.0 for x in r.embedding)


def test_model_embedder_fails_loudly_without_library():
    with pytest.raises(NotImplementedError, match="sentence-transformers"):
        E.model_embedder("all-MiniLM-L6-v2")


def test_embed_then_ann_finds_duplicate(spark, docs):
    """End-to-end composition the boundary exists for: embed the
    corpus, embed a copied document, and nearest-neighbor search must
    return the original as an exact (cos=1) hit."""
    corpus = E.embed_texts(docs.limit(100)).withColumnRenamed(
        "doc_id", "vec_id"
    )
    source = docs.limit(1).collect()[0]
    probe = E.embed_texts(
        spark.createDataFrame(
            [(99999, source.text)], "doc_id long, text string"
        )
    ).withColumnRenamed("doc_id", "query_id")
    top = S.brute_force_topk(
        corpus, probe, k=1, vec_col="embedding"
    ).collect()
    assert top[0].neighbor_id == source.doc_id
    assert top[0].cos >= 0.999999


def test_embed_then_pq_roundtrip(docs):
    """The generated column speaks the downstream schema: PQ trains,
    encodes, and serves over it without adaptation."""
    emb = E.embed_texts(docs.limit(200)).withColumnRenamed(
        "doc_id", "vec_id"
    )
    books = Q.train_pq(emb, m=8, k=8, dim=64, max_iter=2)
    enc = Q.pq_encode(books, emb)
    queries = emb.limit(3).withColumnRenamed("vec_id", "query_id")
    out = Q.pq_adc_topk(books, enc, queries, k=3)
    assert out.count() == 9


def test_embedding_drift_zero_on_identical_snapshots(docs):
    emb = E.embed_texts(docs.limit(100))
    report = E.embedding_drift(emb, emb).collect()
    assert len(report) == 16
    assert all(r.abs_shift == 0.0 for r in report)


def test_embedding_drift_detects_shift(docs):
    emb = E.embed_texts(docs.limit(100))
    shifted = emb.select(
        "doc_id",
        F.transform("embedding", lambda x: x + F.lit(0.5)).alias("embedding"),
    )
    report = E.embedding_drift(emb, shifted).collect()
    assert max(r.abs_shift for r in report) > 0.1
