"""Retrieval-surface tests: BM25 / inverted index / bigram-LM oracle
parity at smoke scale, invariants, and the postings-filter plan shape
that makes BM25 scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_with_s3__dynamodb_and_glue_spark.operators import retrieval
from etl_with_s3__dynamodb_and_glue_spark.plans import retrieval as retrieval_plans
from tests.conftest import SF_ORACLE, SF_SMOKE
from tests.oracle_harness import compare


@pytest.fixture(scope="module")
def docs(spark):
    # teardown unpersist: a leaked cache would be substituted into later
    # plan-shape tests' documents scans (see test_llm_ops.py::docs)
    df = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").cache()
    yield df
    df.unpersist()


@pytest.mark.parametrize("name", sorted(retrieval_plans.QUERIES))
def test_retrieval_oracle_parity(spark, name):
    res = compare(
        spark,
        SF_ORACLE,
        name,
        retrieval_plans.QUERIES[name],
        retrieval_plans.ORACLE[name],
    )
    assert res["ok"], res


def test_bm25_ranks_are_dense_and_ordered(docs):
    rows = retrieval.bm25_topk(docs, ["dup", "spark"], k=7).collect()
    assert 0 < len(rows) <= 7
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(1 <= r.n_query_terms_hit <= 2 for r in rows)


def test_bm25_rare_term_dominates_idf(docs):
    """A doc matching only the rare term should outrank a doc matching
    only an equally-frequent common term (idf ordering) — sanity that
    the Lucene idf form is wired correctly."""
    n_docs = docs.count()
    df_dup = docs.filter(F.col("text").rlike(r"\bdup\b")).count()
    assert df_dup < n_docs * 0.2, "fixture drift: 'dup' is no longer rare"
    top = retrieval.bm25_topk(docs, ["dup", "the"], k=n_docs).collect()
    # every dup-containing doc must rank above every dup-free doc that
    # hit only 'the' with comparable tf — check the weaker, robust
    # form: rank-1 doc contains 'dup'.
    top1_text = (
        docs.filter(F.col("doc_id") == top[0].doc_id).head().text.lower()
    )
    assert "dup" in top1_text.split()


def test_bm25_filters_postings_before_shuffle(docs):
    """The scale property: the query-term IN-filter must run on the
    scan side, before any Exchange, so only matching postings ever
    shuffle. simpleString prints the tree top-down, so every Exchange
    must appear BEFORE the Filter(term IN ...) line."""
    from tests.test_plan_shapes import plan_str

    plan = plan_str(
        retrieval.bm25_topk(docs, ["dup", "spark"], k=5), mode="simple"
    )
    lines = plan.splitlines()

    def indent(ln: str) -> int:
        return len(ln) - len(ln.lstrip(" :+-*("))

    filter_lines = [
        i
        for i, ln in enumerate(lines)
        if "Filter" in ln and "term" in ln and " IN " in ln
    ]
    assert filter_lines, f"no query-term IN-filter in plan:\n{plan}"
    for fi in filter_lines:
        d = indent(lines[fi])
        j = fi + 1
        while j < len(lines) and indent(lines[j]) > d:
            assert "Exchange" not in lines[j], (
                "shuffle below the query-term filter:\n" + plan
            )
            j += 1


def test_inverted_index_posting_cap(docs):
    idx = retrieval.inverted_index(docs, max_postings=3).collect()
    assert idx, "empty index"
    for r in idx:
        posted = r.top_doc_ids.split(",")
        assert 1 <= len(posted) <= 3
        assert r.df >= len(posted)
        assert r.total_tf >= r.df


def test_lm_score_short_docs_null(spark):
    one_tok = spark.createDataFrame(
        [(1, "hello"), (2, "hello world hello world")], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in retrieval.bigram_lm_scores(one_tok).collect()}
    assert rows[1].n_bigrams == 0 and rows[1].avg_logprob is None
    assert rows[2].n_bigrams == 3 and rows[2].avg_logprob is not None


def test_hybrid_rrf_fuses_both_rankers(spark):
    """Every fused row must come from at least one ranker, scores must
    be consistent with the rank columns, and both rankers must actually
    contribute to the pool."""
    from etl_with_s3__dynamodb_and_glue_spark.plans.retrieval import (
        RRF_K,
        doc_hybrid_rrf,
    )

    rows = doc_hybrid_rrf(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 10
    assert [r.fused_rank for r in rows] == list(range(1, len(rows) + 1))
    assert any(r.rank_lex is not None for r in rows)
    assert any(r.rank_sem is not None for r in rows)
    for r in rows:
        expect = sum(
            1.0 / (RRF_K + rank)
            for rank in (r.rank_lex, r.rank_sem)
            if rank is not None
        )
        assert abs(r.rrf - round(expect, 6)) < 1e-9
