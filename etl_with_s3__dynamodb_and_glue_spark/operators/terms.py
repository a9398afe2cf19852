"""Corpus-level term statistics: TF-IDF and global token frequency.

Classic IR building blocks every text corpus pipeline needs (term
weighting for relevance/keyword extraction, vocabulary profiling for
tokenizer design). Both are two-aggregate compositions:

Scale design (100 TB):

- TF is one explode + one hash aggregate keyed (doc, term) — map-side
  partial aggregation absorbs the explode fan-out before the shuffle.
- DF (document frequency) aggregates the *already per-doc-distinct*
  TF table, so it never re-touches raw text, and the corpus size
  joins in as a broadcast one-row aggregate (no driver-side count
  action inside the plan).
- The TF ⋈ DF join shuffles on term; the vocabulary is orders of
  magnitude smaller than the corpus, and term skew (stopwords) is
  AQE-skew-join territory. Top-k per doc is a WindowGroupLimit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..caching import unpersist_on_release
from .text import tokens
from .windows import top_k_per_group


def term_frequencies(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, term, tf) — occurrences of each term per document."""
    return (
        docs.select(F.col(id_col), tokens(text_col).alias("tk"))
        .select(F.col(id_col), F.explode("tk").alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def document_frequencies(tf: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(term, df) — number of documents containing each term. Consumes
    the TF table (already distinct per (doc, term)), so this is a
    count, not a count-distinct."""
    return tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k terms per document by smoothed TF-IDF:
    ``tf · (ln((N+1)/(df+1)) + 1)`` (the standard sklearn-style
    smoothing — never negative, defined for unseen terms). Ties break
    on term ascending — deterministic."""
    # tf feeds both sides of the TF ⋈ DF join and the branches prune
    # different columns (DF never reads the count), so their exchanges
    # don't canonicalize equal and ReusedExchange can't kick in
    # (verified: 0 reuses, 2.4× slower unpersisted at sf0.1). Persist,
    # with release tied to the result's lifetime — no leaked cache.
    tf = term_frequencies(docs, text_col, id_col).persist()
    df_tbl = document_frequencies(tf, id_col)
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    # SHUFFLE_HASH (r11): past the broadcast threshold the TF ⋈ DF
    # fallback is sort-merge — sorting the full (doc, term, tf) table
    # plus the vocabulary table. Same class as the bigram-LM /
    # boilerplate fixes; locally a wash at 500k (~13% median, inside
    # the single-session band — the sorted stream here is the already-
    # aggregated TF table, not raw grams) but strictly more stable
    # across reps, and structurally no full-table sort survives at any
    # scale. Build side = (term, df), vocabulary-bounded per partition.
    scored = (
        tf.join(df_tbl.hint("SHUFFLE_HASH"), "term")
        .join(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            "tf",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                6,
            ).alias("tfidf"),
        )
    )
    result = top_k_per_group(
        scored,
        group_by=[id_col],
        order_by=[F.col("tfidf").desc(), F.col("term").asc()],
        k=k,
    )
    return unpersist_on_release(result, tf)


def top_tokens(
    docs: DataFrame, n: int = 50, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Global top-n tokens by total occurrences (vocabulary head
    profile). One explode + one aggregate; the top-n is a TakeOrdered
    over the (small) aggregated vocabulary, not a full sort. Ties
    break on term ascending."""
    counts = (
        docs.select(tokens(text_col).alias("tk"))
        .select(F.explode("tk").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    return (
        counts.orderBy(F.col("n_occurrences").desc(), F.col("term").asc())
        .limit(n)
    )
