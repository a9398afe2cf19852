"""Reranking-boundary tests: determinism/partitioning invariance,
planted-relevance ordering, the loud real-model gate, and the
composition with the fused retrieval pool it exists for."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_with_s3__dynamodb_and_glue_spark.operators import rerank as R
from tests.conftest import SF_ORACLE, SF_SMOKE


def _pool(spark):
    rows = [
        (1, "alpha beta gamma", 10, "alpha beta gamma delta"),
        (1, "alpha beta gamma", 11, "unrelated words entirely here"),
        (1, "alpha beta gamma", 12, "alpha beta gamma"),
        (2, "delta epsilon", 20, "delta epsilon"),
        (2, "delta epsilon", 21, "delta zeta"),
    ]
    return spark.createDataFrame(
        rows, "query_id long, query_text string, doc_id long, text string"
    )


def test_planted_relevance_ranks_first(spark):
    out = R.rerank_pool(_pool(spark), k=3).collect()
    best = {r.query_id: r.doc_id for r in out if r.rank == 1}
    # exact text match beats superset beats unrelated
    assert best == {1: 12, 2: 20}
    q1 = [r.doc_id for r in sorted(out, key=lambda r: r.rank) if r.query_id == 1]
    assert q1 == [12, 10, 11]


def test_rerank_is_partitioning_invariant(spark):
    pool = _pool(spark)
    one = sorted(map(tuple, R.rerank_pool(pool.repartition(1), k=3).collect()))
    many = sorted(map(tuple, R.rerank_pool(pool.repartition(5), k=3).collect()))
    assert one == many


def test_score_ties_break_on_doc_id(spark):
    rows = [(1, "q", 5, "same text"), (1, "q", 3, "same text")]
    pool = spark.createDataFrame(
        rows, "query_id long, query_text string, doc_id long, text string"
    )
    out = sorted(R.rerank_pool(pool, k=2).collect(), key=lambda r: r.rank)
    assert [r.doc_id for r in out] == [3, 5]
    assert out[0].rerank_score == out[1].rerank_score


def test_model_scorer_fails_loudly_without_library():
    with pytest.raises(NotImplementedError, match="sentence-transformers"):
        R.model_scorer("cross-encoder/ms-marco-MiniLM-L-6-v2")


def test_rerank_composes_with_hybrid_retrieval(spark):
    """The cascade this boundary exists for: the fused BM25⊕ANN pool
    (tens of rows) joined to its documents, reranked — pool-bounded
    inference, k rows out per query."""
    from etl_with_s3__dynamodb_and_glue_spark.plans.retrieval import (
        BM25_QUERY_TERMS,
        doc_hybrid_rrf,
    )

    fused = doc_hybrid_rrf(spark, SF_ORACLE)
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").select(
        "doc_id", "text"
    )
    pool = fused.join(docs, "doc_id").select(
        F.lit(0).alias("query_id"),
        F.lit(" ".join(BM25_QUERY_TERMS)).alias("query_text"),
        "doc_id",
        "text",
    )
    n_pool = pool.count()
    out = R.rerank_pool(pool, k=5).collect()
    assert n_pool <= 10  # the pool, not the corpus, is the work unit
    assert len(out) == 5
    assert all(r.rerank_score > 0 for r in out)  # query terms do occur
    ranks = [r.rank for r in sorted(out, key=lambda r: r.rank)]
    assert ranks == [1, 2, 3, 4, 5]


def test_smoke_pool_on_real_docs(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(30)
    q = docs.limit(1).collect()[0]
    pool = docs.select(
        F.lit(7).alias("query_id"),
        F.lit(q.text).alias("query_text"),
        "doc_id",
        "text",
    )
    out = R.rerank_pool(pool, k=3).collect()
    assert [r.doc_id for r in out if r.rank == 1] == [q.doc_id]
