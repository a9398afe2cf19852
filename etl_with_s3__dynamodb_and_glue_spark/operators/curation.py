"""Training-corpus curation operators: repetition-based quality
signals, PII scrubbing, and benchmark decontamination.

These are the standard web-corpus filters from the public literature
(repetition signals per Rae et al.'s Gopher quality heuristics;
n-gram-overlap decontamination as practiced for public benchmark
hygiene) re-expressed as native DataFrame plans.

Scale design (100 TB):

- Within-doc repetition ratios are pure per-row array expressions —
  no shuffle at all.
- The top-n-gram fraction needs a per-(doc, gram) count: one explode
  + one hash aggregate keyed (doc, gram) — map-side partial
  aggregation absorbs the fan-out — then a per-doc max/sum. Two
  shuffles, both keyed by doc-sized keys, no joins.
- PII scrubbing is a per-row regexp chain (JVM-side, codegen) — no
  shuffle, no Python.
- Decontamination joins the corpus's exploded distinct n-gram hashes
  against the eval-benchmark n-gram set. The eval set is tiny by
  construction (benchmarks are KBs; the corpus is TBs), so it is
  BROADCAST — the corpus never shuffles, and the only aggregate is
  the per-doc overlap count. 64-bit n-gram hashes keep the join key
  at 8 B instead of shipping gram strings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text import tokens, word_ngram_hashes, word_ngrams

# RE2-safe patterns (no lookaround / backrefs) so the same pattern
# text runs under Java regex (Spark) and RE2-family engines. Order
# matters when scrubbing: SSN before generic phone (a dashed SSN also
# matches loose phone shapes).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\+?\b\d{3}[-. ]\d{3}[-. ]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def _dup_fraction(arr: Column) -> Column:
    """1 - distinct/total over an array — fraction of entries that are
    repeats of an earlier value. 0 for empty arrays."""
    total = F.size(arr)
    return F.when(total <= 0, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct(arr)).cast("double") / total
    )


def repetition_signals(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition quality signals (Gopher-style):

    - ``dup_word_frac``: fraction of tokens that repeat an earlier
      token (1 - distinct/total) — pure per-row expression.
    - ``dup_3gram_frac``: same over word 3-grams — per-row.
    - ``top_2gram_frac``: occurrences of the single most frequent
      2-gram over total 2-grams — the explode + two-aggregate path.

    High values flag boilerplate/spam; typical filter thresholds are
    applied downstream (this operator only measures).
    """
    from ..caching import unpersist_on_release

    # tokenize once; inlining the tokenizer into the three gram
    # consumers embeds its split/regex tree per consumer (HOF subtrees
    # dodge subexpression elimination → codegen blowup). Persisted:
    # the per-row signals branch and the gram-count branch would each
    # re-run scan+tokenize otherwise (released with the result).
    staged = docs.select(F.col(id_col), tokens(text_col).alias("tk")).persist()
    tk = F.col("tk")
    base = staged.select(
        F.col(id_col),
        F.round(_dup_fraction(tk), 6).alias("dup_word_frac"),
        F.round(_dup_fraction(word_ngrams(tk, 3)), 6).alias("dup_3gram_frac"),
        word_ngrams(tk, 2).alias("grams2"),
    )
    gram_counts = (
        base.select(F.col(id_col), F.explode_outer("grams2").alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top_frac = gram_counts.groupBy(id_col).agg(
        F.round(
            F.when(
                F.max(F.when(F.col("gram").isNotNull(), F.col("n"))).isNull(),
                F.lit(0.0),
            ).otherwise(
                F.max(F.when(F.col("gram").isNotNull(), F.col("n"))).cast("double")
                / F.sum(F.when(F.col("gram").isNotNull(), F.col("n")).otherwise(0))
            ),
            6,
        ).alias("top_2gram_frac")
    )
    result = base.drop("grams2").join(top_frac, id_col)
    return unpersist_on_release(result, staged)


def pii_count_cols(text_col: str = "text") -> list[Column]:
    """One ``n_<pattern>`` count column per PII pattern (match counts
    on the raw text, independent of any scrubbing)."""
    return [
        F.regexp_count(F.col(text_col), F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat in PII_PATTERNS.items()
    ]


def pii_scrub_col(text_col: str = "text") -> Column:
    """The scrubbed-text column: every PII pattern replaced with a
    ``<NAME>`` placeholder, applied in declaration order (SSN before
    phone, so dashed SSNs don't half-match as phones)."""
    scrubbed = F.col(text_col)
    for name, pat in PII_PATTERNS.items():
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{name.upper()}>")
    return scrubbed


def pii_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document PII match counts, one column per pattern
    (``n_email``, ``n_ssn``, ``n_phone``, ``n_ipv4``)."""
    return docs.select(F.col(id_col), *pii_count_cols(text_col))


def pii_scrub(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Redact PII in ``text_col`` → ``scrubbed`` with ``<NAME>``
    placeholders."""
    return docs.select(F.col(id_col), pii_scrub_col(text_col).alias("scrubbed"))


def decontaminate(
    corpus: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: per corpus document, the number of
    distinct word ``n``-grams it shares with the eval benchmark set.
    Docs with no overlap are absent (filter the returned ids out of
    the corpus to decontaminate it).

    The eval n-gram set is deduped and BROADCAST — benchmarks are KBs
    while the corpus is TBs, so the corpus side NEVER shuffles its
    grams: per-doc gram dedup happens in-row (``array_distinct``
    before the explode — a distinct over exploded (doc, gram) rows
    would be a full corpus-gram shuffle), the broadcast join filters
    at the scan, and the per-doc count aggregates map-side. Grams
    travel as 64-bit xxhash64 keys (8 B, hashed straight off the
    token window — no gram-string construction).
    """

    def gram_hashes(df: DataFrame, keep_id: bool) -> DataFrame:
        # tokenize staged below the generator: an inline tokenize
        # re-evaluates the regex split per EMITTED row (pathology
        # measured on the containment path — plans/llm_ops.py)
        cols = [F.col(id_col)] if keep_id else []
        return df.select(*cols, tokens(text_col).alias("tk")).select(
            *cols,
            F.explode(
                F.array_distinct(word_ngram_hashes(F.col("tk"), n))
            ).alias("gram_h"),
        )

    eval_grams = gram_hashes(eval_docs, keep_id=False).distinct()
    return (
        gram_hashes(corpus, keep_id=True)
        .join(F.broadcast(eval_grams), "gram_h")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlapping_ngrams"))
    )


def boilerplate_fraction(
    docs: DataFrame,
    n: int = 5,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CROSS-document duplicated-n-gram fraction: for each document,
    the share of its distinct word ``n``-grams that also occur in at
    least ``min_docs`` documents corpus-wide. High values mark
    boilerplate (headers, footers, licence blocks, templated spam) —
    the complement of ``repetition_signals``, which only sees
    within-document repetition.

    Plan shape: per-doc gram dedup happens in-row (``array_distinct``
    before the explode), so the exploded stream carries one row per
    (doc, distinct gram). Corpus-wide document frequency is then a
    plain count per gram — no countDistinct needed — and one join back
    on the gram key attaches it. Two shuffles on the gram key, one on
    doc_id; map-side combine absorbs hot grams on the aggregate side,
    and the join's build side is (gram, df) — already aggregated,
    orders of magnitude smaller than the corpus. The join carries a
    SHUFFLE_HASH hint (r11): past the broadcast threshold Spark's
    default fallback is sort-merge, which SORTS the full gram stream —
    the same measured phase-change class as ``bigram_lm_scores``
    (A/B at 500k docs: 33.6 s sort-merge → 12.0 s hinted, ~2.7×); the
    build side stays the aggregated (gram, df) slice, distinct-gram-
    bounded per partition. AQE still upgrades to broadcast when small.

    Grams travel as STRINGS here because the DuckDB oracle replays the
    exact computation; the drop-in scale variant swaps
    ``word_ngrams`` for ``word_ngram_hashes`` (8-byte keys, no gram
    string construction) with identical semantics modulo hash
    collisions (~n²/2⁶⁴).

    Output: (doc_id, n_distinct_grams, boilerplate_frac) — frac NULL
    when the doc is shorter than ``n`` tokens.
    """
    grams = docs.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("tk")
    ).select(
        "doc_id",
        F.explode(F.array_distinct(word_ngrams(F.col("tk"), n))).alias(
            "gram"
        ),
    )
    gram_df = grams.groupBy("gram").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    per_doc = (
        grams.join(gram_df.hint("SHUFFLE_HASH"), "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct_grams"),
            F.round(
                F.avg((F.col("df") >= min_docs).cast("double")), 6
            ).alias("boilerplate_frac"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_distinct_grams", F.lit(0).cast("long")).alias(
                "n_distinct_grams"
            ),
            "boilerplate_frac",
        )
    )
