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

    Plan shape (r11, second rework): per-doc gram dedup happens
    in-row (``array_distinct`` before the explode), and the per-doc
    distinct-gram COUNT is taken in-row too (``size``, zero shuffle).
    For the default ``min_docs=2`` the gram-key JOIN-BACK is
    eliminated entirely: a gram with df == 1 belongs to exactly ONE
    document, so carrying ``min(doc_id)`` through the df aggregate
    (still map-side combinable) recovers that owner, and
    ``boilerplate_frac = (n_distinct − n_unique) / n_distinct`` needs
    only a doc-keyed join of two n_docs-row tables. One gram-key
    shuffle total, nothing joins the gram stream against anything.
    The arithmetic is bit-identical to the old avg-of-indicators form
    (the indicator sum IS n_distinct − n_unique; both divide the same
    exact-integer doubles).

    r11 history, for the record: the first rework hinted the
    join-back to SHUFFLE_HASH (33.6 → 12.0 s at 500k), but the
    third-decade probe OOMed it at 5M docs — distinct 5-grams grow
    ~linearly with the corpus (unlike the vocabulary-bounded build
    sides in bigram_lm_scores / tfidf_top_terms), so the hash-join
    build side is unbounded and sort-merge was the SAFE fallback.
    The join-free form is faster than both and cannot OOM. For
    ``min_docs > 2`` the general agg + join-back path remains, hint-
    LESS (sort-merge is correct there: the build side scales with the
    corpus).

    Grams travel as 64-BIT HASHES (``word_ngram_hashes``, no gram
    string construction) — the same design as ``duplicate_spans`` /
    ``ngram_containment``, whose DuckDB oracles also replay with
    strings: only AGGREGATE OUTPUTS are compared, and equal windows
    collide under either construction, so results differ only on an
    xxhash64 collision (~n²/2⁶⁴; ~1e-10 at the driver's sf0.01).
    The string form was the r3–r11a implementation and is what made
    every variant above struggle: string gram arrays are ~6× the
    bytes, so the persist thrashed (420 s at 5M) and the join build
    side OOMed; with longs the persisted arrays are ~8 B/gram.

    Output: (doc_id, n_distinct_grams, boilerplate_frac) — frac NULL
    when the doc is shorter than ``n`` tokens.
    """
    from pyspark.storagelevel import StorageLevel

    from ..caching import unpersist_on_release

    # PERSIST the per-doc gram arrays: both consumers below (the
    # exploded df aggregate and the in-row distinct counts) need them,
    # they share no exchange (counts never shuffles), and the gram
    # STRING construction is the dominant cost — unpersisted, the
    # tokenize+ngram pass ran twice and measured SLOWER than the join
    # form it replaces (52–75 s vs 33.6 s at 500k; persisted:
    # 17.5–19.5 s, 1.9× under the join form and OOM-proof).
    # tokenize STAGED in its own projection (the ngram_containment
    # lesson): word_ngram_hashes slices the token array inside a
    # transform lambda, and an inline tokens() subtree there is
    # re-evaluated per window (measured 40–46 s at 500k inline vs
    # ~10 s staged)
    base = (
        docs.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("tk"))
        .select(
            "doc_id",
            F.array_distinct(word_ngram_hashes(F.col("tk"), n)).alias("gs"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    grams = base.select("doc_id", F.explode("gs").alias("gram"))
    # coalesce: size(NULL array) is NULL, but a NULL-text doc counted
    # 0 grams on the old exploded path — keep that contract
    counts = base.select(
        "doc_id",
        F.coalesce(F.size("gs"), F.lit(0)).cast("long").alias(
            "n_distinct_grams"
        ),
    )

    if min_docs == 2:
        gram_stats = grams.groupBy("gram").agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.min("doc_id").alias("owner"),
        )
        uniq = (
            gram_stats.filter(F.col("df") == 1)
            .groupBy("owner")
            .agg(F.count(F.lit(1)).cast("long").alias("n_unique"))
            .withColumnRenamed("owner", "doc_id")
        )
        per_doc = counts.join(uniq, "doc_id", "left").select(
            "doc_id",
            "n_distinct_grams",
            F.when(
                F.col("n_distinct_grams") > 0,
                F.round(
                    (
                        F.col("n_distinct_grams")
                        - F.coalesce(F.col("n_unique"), F.lit(0))
                    ).cast("double")
                    / F.col("n_distinct_grams").cast("double"),
                    6,
                ),
            ).alias("boilerplate_frac"),
        )
        return unpersist_on_release(per_doc, base)

    gram_df = grams.groupBy("gram").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    per_doc = (
        grams.join(gram_df, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct_grams"),
            F.round(
                F.avg((F.col("df") >= min_docs).cast("double")), 6
            ).alias("boilerplate_frac"),
        )
    )
    result = (
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
    return unpersist_on_release(result, base)


def novelty_fraction(
    docs: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document novelty: treating ``id_col`` as arrival order, the
    fraction of each document's distinct word ``n``-grams whose FIRST
    corpus occurrence is this document — how much genuinely new
    content the doc contributes (1.0 all new, 0.0 everything seen
    before). The dual of :func:`boilerplate_fraction` (which asks how
    much is SHARED); dedup keeps one copy of repeated content, novelty
    ranks what remains for training order.

    Plan shape (r12 rework, banked in the r11 brief): the r3–r11 form
    was the OLD boilerplate skeleton — string grams exploded, a
    first-seen aggregate, then the GRAM STREAM joined back against
    the corpus-proportional first-seen table. The r11 saga measured
    that exact shape slow (33.6 s at 500k docs) and un-hintable (a
    SHUFFLE_HASH build side that grows with the corpus OOMed at 5M).
    Here the join-back is eliminated — and unlike boilerplate, the
    owner trick is EXACT for every parameter, no ``min_docs``
    restriction: a gram's first owner IS ``min(doc_id)``, so

        novelty_frac(doc) = |grams with min(doc_id) == doc| /
                            n_distinct_grams(doc)

    needs only (a) the in-row distinct-gram COUNT (``size``, zero
    shuffle), (b) ONE gram-key aggregate carrying ``min(doc_id)``
    (map-side combinable), (c) a tiny owner groupBy, and (d) one
    doc-keyed join of two ≤n_docs-row frames. One gram-key shuffle
    total; nothing joins the gram stream against anything. The r11
    triad of independently-measured ingredients all apply: tokenize
    STAGED in its own projection (an inline tokens() under the
    n-gram transform lambda re-evaluates per window — HOF-LAMBDA
    RULE, operators/text.py), grams as 64-BIT HASHES
    (``word_ngram_hashes``; string arrays are ~6× the bytes), and the
    per-doc gram arrays PERSISTED (two consumers share no exchange).

    The division is bit-identical to the old avg-of-indicators form:
    the indicator sum over a doc's grams IS the owner count, and both
    divide the same exact-integer doubles. The DuckDB oracle replays
    with gram STRINGS — same groupings unless an xxhash64 collision
    (~n²/2⁶⁴), the established contract of boilerplate_fraction /
    duplicate_spans / ngram_containment.

    Output: (doc_id, n_distinct_grams, novelty_frac) — frac NULL when
    the doc is shorter than ``n`` tokens.
    """
    from pyspark.storagelevel import StorageLevel

    from ..caching import unpersist_on_release

    base = (
        docs.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("tk"))
        .select(
            "doc_id",
            F.array_distinct(word_ngram_hashes(F.col("tk"), n)).alias("gs"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = base.select(
        "doc_id",
        F.coalesce(F.size("gs"), F.lit(0)).cast("long").alias(
            "n_distinct_grams"
        ),
    )
    owners = (
        base.select("doc_id", F.explode("gs").alias("gram"))
        .groupBy("gram")
        .agg(F.min("doc_id").alias("first_doc"))
        .groupBy("first_doc")
        .agg(F.count(F.lit(1)).cast("long").alias("n_novel"))
        .withColumnRenamed("first_doc", "doc_id")
    )
    per_doc = counts.join(owners, "doc_id", "left").select(
        "doc_id",
        "n_distinct_grams",
        F.when(
            F.col("n_distinct_grams") > 0,
            F.round(
                F.coalesce(F.col("n_novel"), F.lit(0)).cast("double")
                / F.col("n_distinct_grams").cast("double"),
                6,
            ),
        ).alias("novelty_frac"),
    )
    return unpersist_on_release(per_doc, base)
