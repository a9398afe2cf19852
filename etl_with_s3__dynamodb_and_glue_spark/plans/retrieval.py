"""Lexical retrieval + corpus-LM queries over the documents table
(north-star extension surface: similarity/search and text analysis —
BASELINE.json).

Every query here is exact and deterministic, so each carries a DuckDB
oracle twin replaying the identical math (same tokenization regex,
same natural-log formulas, same rounding, same tie-breaks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import retrieval

# A mixed-selectivity ad-hoc query: "dup" is rare in the corpus (high
# idf, drives the ranking), the rest are common (tf/length
# normalization differentiates).
BM25_QUERY_TERMS = ["dup", "spark", "merge", "window"]
BM25_K = 10


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def doc_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents for a bag-of-words query under BM25 (Lucene
    idf form). The scale property: postings are filtered to the query
    terms before any shuffle — see operators/retrieval.py."""
    return retrieval.bm25_topk(
        _docs(spark, sf_dir), BM25_QUERY_TERMS, k=BM25_K
    )


_TOKS_CTE = (
    "SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks "
    "FROM documents"
)

DOC_BM25_TOPK_SQL = f"""
WITH t AS ({_TOKS_CTE}),
toks AS (
  SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
),
post AS (
  SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks
  WHERE term IN ('dup', 'merge', 'spark', 'window')
  GROUP BY doc_id, dl, term
),
stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(len(toks)) AS avgdl FROM t
),
dfs AS (
  SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
  FROM post GROUP BY term
),
scored AS (
  SELECT p.doc_id, p.term,
         ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
           * (p.tf * (1.2 + 1))
           / (p.tf + 1.2 * (1 - 0.75 + 0.75 * p.dl / s.avgdl)) AS term_score
  FROM post p JOIN dfs d USING (term) CROSS JOIN stats s
),
per_doc AS (
  SELECT doc_id, ROUND(SUM(term_score), 6) AS score,
         CAST(COUNT(DISTINCT term) AS BIGINT) AS n_query_terms_hit
  FROM scored GROUP BY doc_id
),
ranked AS (
  SELECT doc_id, score, n_query_terms_hit,
         CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER)
           AS rank
  FROM per_doc
)
SELECT doc_id, score, n_query_terms_hit, rank
FROM ranked WHERE rank <= {BM25_K} ORDER BY rank
"""


def doc_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline inverted-index build: per term df / total_tf / capped
    top-5-by-tf posting sample as a canonical string."""
    return retrieval.inverted_index(_docs(spark, sf_dir), max_postings=5)


DOC_INVERTED_INDEX_SQL = f"""
WITH t AS ({_TOKS_CTE}),
toks AS (SELECT doc_id, unnest(toks) AS term FROM t),
post AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, term
),
capped AS (
  SELECT doc_id, term, tf,
         ROW_NUMBER() OVER (
           PARTITION BY term ORDER BY tf DESC, doc_id ASC) AS pos
  FROM post
)
SELECT term,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
       CAST(SUM(tf) AS BIGINT) AS total_tf,
       string_agg(
         CASE WHEN pos <= 5 THEN CAST(doc_id AS VARCHAR) END,
         ',' ORDER BY pos) AS top_doc_ids
FROM capped
GROUP BY term
ORDER BY term
"""


def doc_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM quality signal (CCNet/KenLM pattern): avg log-prob of
    each document's bigrams under an add-one-smoothed model fit on the
    corpus itself."""
    return retrieval.bigram_lm_scores(_docs(spark, sf_dir))


DOC_LM_SCORE_SQL = f"""
WITH t AS ({_TOKS_CTE}),
g0 AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)),
                               i -> toks[i] || ' ' || toks[i + 1])) AS bigram
  FROM t
),
g AS (
  SELECT doc_id, bigram, split_part(bigram, ' ', 1) AS w1 FROM g0
),
c2 AS (SELECT bigram, CAST(COUNT(*) AS DOUBLE) AS c2 FROM g GROUP BY bigram),
c1 AS (SELECT w1, CAST(COUNT(*) AS DOUBLE) AS c1 FROM g GROUP BY w1),
vocab AS (
  SELECT CAST(COUNT(DISTINCT term) AS DOUBLE) AS v
  FROM (SELECT unnest(toks) AS term FROM t)
),
scored AS (
  SELECT g.doc_id, ln((c2.c2 + 1.0) / (c1.c1 + vocab.v)) AS logprob
  FROM g JOIN c2 USING (bigram) JOIN c1 USING (w1) CROSS JOIN vocab
),
per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         ROUND(AVG(logprob), 6) AS avg_logprob
  FROM scored GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(p.n_bigrams, 0) AS n_bigrams,
       p.avg_logprob
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
ORDER BY d.doc_id
"""


QUERIES = {
    "doc_bm25_topk": doc_bm25_topk,
    "doc_inverted_index": doc_inverted_index,
    "doc_lm_score": doc_lm_score,
}

ORACLE = {
    "doc_bm25_topk": DOC_BM25_TOPK_SQL,
    "doc_inverted_index": DOC_INVERTED_INDEX_SQL,
    "doc_lm_score": DOC_LM_SCORE_SQL,
}
