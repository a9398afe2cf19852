"""Keyword retrieval and statistical language-model scoring over a
document corpus: BM25 ad-hoc search, inverted-index construction, and
a bigram LM perplexity proxy for quality filtering.

Training-data pipelines need lexical retrieval next to embedding ANN
(operators/similarity.py): BM25 is the standard first-stage ranker for
eval-set decontamination lookups, targeted corpus probes ("find every
document mentioning X"), and hybrid retrieval. The LM score is the
classic CCNet/KenLM-style quality signal — rank documents by how
"language-like" they are under a model fit on the corpus itself.

All operators are native DataFrame expressions (explode + keyed
aggregates + joins); no Python in the data plane, every aggregation
benefits from map-side partial combine.

Scale shapes (100 TB corpus):
- ``bm25_topk`` filters the exploded postings to the query's terms
  BEFORE any shuffle — the per-term aggregation and the scoring join
  only ever see rows for the handful of query terms, so cost is
  O(matching postings), not O(corpus vocabulary). Corpus-wide scalars
  (N, avgdl) are one cheap global aggregate broadcast via cross-join.
- ``inverted_index`` is the offline build: one shuffle keyed by term,
  skew-safe because the posting list is capped inside the aggregate
  (top-``max_postings`` by tf) rather than collected unbounded; land
  it with sources/dataset.py::write_dataset bucketed by term for
  point-lookup serving.
- ``bigram_lm_scores`` builds the LM table with one keyed aggregate
  (bigram counts are vocabulary-bounded, far smaller than the corpus)
  and joins it back to the exploded corpus on the bigram key; AQE
  broadcasts the LM side when it fits, otherwise it's a plain shuffle
  join with partial aggregation on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .text import tokens, word_ngrams

BM25_K1 = 1.2
BM25_B = 0.75


def _postings(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, term, tf, dl): term frequency per (document, term) plus
    the document length, from one tokenize + explode pass."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("tk")
    ).select("doc_id", F.size("tk").alias("dl"), F.explode("tk").alias("term"))
    return toks.groupBy("doc_id", "term", "dl").agg(
        F.count("*").cast("long").alias("tf")
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-``k`` documents for a bag-of-words query under BM25.

    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))   (Lucene form — always
    positive, so a term in >half the corpus still contributes), and the
    usual tf saturation / length normalization with ``k1``/``b``.

    Ordering of operations is the scale story: the exploded token
    stream is filtered to the query's terms *first* (a codegen'd
    isin() on the scan side of the shuffle), so everything downstream
    — df aggregation, scoring, top-k — is sized by the query's
    postings. N and avgdl come from one scalar aggregate over the
    corpus (a count+avg, no extra pass over text) broadcast by
    cross-join. Output: (doc_id, score, n_query_terms_hit), score
    rounded to 6 for cross-engine comparability; ties broken by
    doc_id.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    qt = sorted(set(query_terms))

    lengths = docs.select(
        F.col(id_col).alias("doc_id"), F.size(tokens(text_col)).alias("dl")
    )
    stats = lengths.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )

    postings = _postings(docs, text_col, id_col).filter(F.col("term").isin(qt))
    df_per_term = postings.groupBy("term").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )

    scored = (
        postings.join(F.broadcast(df_per_term), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.round(F.sum("term_score"), 6).alias("score"),
        F.countDistinct("term").cast("long").alias("n_query_terms_hit"),
    )
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        per_doc.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "score", "n_query_terms_hit", "rank")
    )


def inverted_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_postings: int = 5,
) -> DataFrame:
    """Offline inverted-index build: one row per term with document
    frequency, total term frequency, and a CAPPED posting sample (the
    ``max_postings`` docs with highest tf, ties to lower doc_id) as a
    canonical comma-joined string.

    The cap is enforced with a window BEFORE the per-term collect, so
    no aggregate ever materializes an unbounded list — stopword-grade
    terms (df ≈ corpus size) cost a top-N per key, not an O(df)
    buffer. df/total_tf come from the same shuffled partials. At scale,
    land the result via write_dataset(bucket_by=term) so serving
    lookups are single-bucket scans.
    """
    postings = _postings(docs, text_col, id_col)
    w = Window.partitionBy("term").orderBy(
        F.col("tf").desc(), F.col("doc_id").asc()
    )
    capped = postings.withColumn("pos", F.row_number().over(w))
    return (
        capped.groupBy("term")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("df"),
            F.sum("tf").cast("long").alias("total_tf"),
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("pos") <= max_postings,
                                F.struct(
                                    F.col("pos").alias("pos"),
                                    F.col("doc_id").alias("doc_id"),
                                ),
                            )
                        )
                    ),
                    lambda s: s["doc_id"].cast("string"),
                ),
            ).alias("top_doc_ids"),
        )
    )


def bigram_lm_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style corpus-LM quality signal: average log-probability of
    each document's bigrams under an add-one-smoothed bigram model fit
    on the corpus itself.

    logp(w2 | w1) = ln( (c(w1 w2) + 1) / (c1(w1) + V) ), where c1
    counts w1's occurrences as a bigram PREFIX (so the conditional
    sums to 1 over the vocabulary) and V is the distinct-token count.
    Low (more negative) scores mark gibberish / word-soup outliers;
    high scores mark formulaic repetition — both tails are filter
    targets.

    One explode produces the doc→bigram stream; the LM table is a
    keyed count over it (vocabulary²-bounded — tiny next to a 100 TB
    corpus) joined back on the bigram key. Per-doc score is then a
    plain avg. Output: (doc_id, n_bigrams, avg_logprob) rounded to 6.
    Documents with fewer than 2 tokens score NULL with n_bigrams = 0.

    JOIN STRATEGY (r10-measured phase change, BENCH_NOTES_r10
    "ret-xl"): below ~100k docs the count tables broadcast; past the
    broadcast threshold Spark's default fallback is sort-merge, which
    SORTS the full gram stream twice (once per join) — measured ~40 s
    steady at 500k docs, exponent ~1.2 across the decade. The two
    SHUFFLE_HASH hints below pin the fallback to a shuffled hash join
    instead: the gram stream is hashed, never sorted, and the BUILD
    side is the count table, whose per-partition slice is vocabulary-
    bounded (n-gram type counts grow ~Heaps-law sublinearly, and each
    partition holds 1/P of them) — so the build side fits in executor
    memory at any corpus scale where the vocabulary does. Measured
    10.5–13 s at 500k (~4×), and the decade exponent drops back to
    join-bound linear. AQE still upgrades to broadcast when the side
    is small, so the sf0.01 driver plan is unchanged. Two rejected
    alternatives (both measured, BENCH_NOTES_r10): per-(doc,bigram)
    pre-aggregation ran 104 s (bigrams are near-distinct per doc, the
    groupBy barely combines), and persisting the gram stream added
    nothing (AQE already reuses the exchange).
    """
    grams = (
        docs.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("tk"))
        .select("doc_id", F.explode(word_ngrams(F.col("tk"), 2)).alias("bigram"))
        .withColumn("w1", F.substring_index(F.col("bigram"), " ", 1))
    )

    c2 = grams.groupBy("bigram").agg(F.count("*").cast("double").alias("c2"))
    c1 = grams.groupBy("w1").agg(F.count("*").cast("double").alias("c1"))
    vocab = (
        docs.select(tokens(text_col).alias("tk"))
        .select(F.explode("tk").alias("t"))
        .agg(F.countDistinct("t").cast("double").alias("v"))
    )

    scored = (
        grams.join(c2.hint("SHUFFLE_HASH"), "bigram")
        .join(c1.hint("SHUFFLE_HASH"), "w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "logprob", F.log((F.col("c2") + 1.0) / (F.col("c1") + F.col("v")))
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.round(F.avg("logprob"), 6).alias("avg_logprob"),
    )
    all_docs = docs.select(F.col(id_col).alias("doc_id"))
    return all_docs.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0).cast("long")).alias("n_bigrams"),
        "avg_logprob",
    )
