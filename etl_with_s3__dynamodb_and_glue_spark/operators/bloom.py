"""Bit-packed Bloom filter built and probed with native Spark
expressions — compact set membership for decontamination and
anti-join prefiltering at corpus scale.

Why this exists: ``operators/curation.py::decontaminate`` broadcasts
the EXACT eval n-gram set (8-byte xxhash64 keys). That is the right
call while benchmarks are KBs–MBs, but a 10⁸-gram eval suite is
~800 MB of exact keys — past comfortable broadcast range. A Bloom
filter is ``m_bits`` of state no matter how many keys went in
(1 MiB covers ~870k keys at 1% FP with k=7; the word table is
``m_bits/64`` longs), turning the prefilter broadcast back into KBs–MBs
at any eval-set size. False positives only ever keep EXTRA candidate
grams — a doc with true overlap is always flagged (no false
negatives), so a bloom prefilter composes safely in front of the
exact join: probe first, exact-join only the survivors.

Spark's own runtime bloom (AQE ``InjectRuntimeFilter``) does this for
equi-joins it can see; this operator makes the same structure an
explicit, reusable data product (build once, persist the word table,
probe many corpora) — the pattern Spark cannot infer.

Engineering shape (everything whole-stage-codegen, no Python):

- build: k=``n_hashes`` positions per key via seeded ``xxhash64``
  (independent hashes by seed, the standard seeded-double-hashing
  construction), ``posexplode``-free — one ``explode`` of a k-array,
  then ``groupBy(word_idx).agg(bit_or(mask))``: a shuffle of at most
  ``k·|keys|`` 12-byte rows that collapses to ≤ ``m_bits/64`` rows.
- probe: the word table is tiny by construction, so each of the k
  probes is a broadcast left join on ``word_idx`` (Spark reuses the
  broadcast exchange across probes); a key "might be present" iff
  every probed word has its bit set. One row in/one row out — no
  explode-and-regroup on the corpus side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# 2^20 bits = 128 KiB = 16,384 longs — ~1% FP at ~10^5 keys (k=7),
# still <10% at 10^6. Size m ≈ -n·ln(p)/ln(2)² for a target FP p.
DEFAULT_M_BITS = 1 << 20
DEFAULT_N_HASHES = 5


def _positions(key: Column, n_hashes: int, m_bits: int) -> list[Column]:
    """k independent bit positions for a key (seeded xxhash64)."""
    return [
        F.pmod(F.xxhash64(F.lit(i), key), F.lit(m_bits))
        for i in range(n_hashes)
    ]


def _word_and_mask(pos: Column) -> tuple[Column, Column]:
    word_idx = (pos / 64).cast("int")
    # call_function: SQL shiftleft takes the shift amount as a column;
    # the Python F.shiftleft wrapper only accepts an int literal
    mask = F.call_function(
        "shiftleft", F.lit(1).cast("long"), F.pmod(pos, F.lit(64)).cast("int")
    )
    return word_idx, mask


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m_bits: int = DEFAULT_M_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
) -> DataFrame:
    """Aggregate ``keys[key_col]`` into a (word_idx int, word long)
    Bloom word table — ≤ ``m_bits/64`` rows regardless of key count."""
    pos = F.explode(
        F.array(*_positions(F.col(key_col), n_hashes, m_bits))
    ).alias("pos")
    word_idx, mask = _word_and_mask(F.col("pos"))
    return (
        keys.select(pos)
        .select(word_idx.alias("word_idx"), mask.alias("mask"))
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_might_contain(
    df: DataFrame,
    key: Column | str,
    bloom: DataFrame,
    m_bits: int = DEFAULT_M_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Append boolean ``out_col``: True iff ``key`` might be in the
    set ``bloom`` was built from (never False for a true member).

    k broadcast left joins on ``word_idx`` (the broadcast exchange is
    reused across probes); absent words mean bit-not-set.
    """
    key = F.col(key) if isinstance(key, str) else key
    hit = F.lit(True)
    out = df
    for i, pos in enumerate(_positions(key, n_hashes, m_bits)):
        word_idx, mask = _word_and_mask(pos)
        probe = bloom.select(
            F.col("word_idx").alias(f"_b{i}_idx"),
            F.col("word").alias(f"_b{i}_word"),
        )
        out = out.withColumn(f"_b{i}_probe", word_idx).join(
            F.broadcast(probe),
            F.col(f"_b{i}_probe") == F.col(f"_b{i}_idx"),
            "left",
        )
        hit = hit & (
            F.coalesce(F.col(f"_b{i}_word"), F.lit(0)).bitwiseAND(mask) != 0
        )
    drop = [c for i in range(n_hashes) for c in (f"_b{i}_probe", f"_b{i}_idx", f"_b{i}_word")]
    return out.withColumn(out_col, hit).drop(*drop)


def bloom_decontaminate(
    corpus: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = DEFAULT_M_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
) -> DataFrame:
    """Bloom-prefiltered benchmark decontamination: per corpus doc,
    the number of distinct word ``n``-grams that MIGHT overlap the
    eval set (a guaranteed superset of the exact
    ``curation.decontaminate`` counts — no true overlap is missed;
    false positives add extra candidates at the filter's FP rate).

    Same corpus-side plan as the exact operator (tokenize-once,
    in-row gram dedup, grams travel as 8-byte hashes); the eval side
    collapses to a ≤``m_bits/64``-row word table instead of an exact
    broadcast set. Chain the exact join AFTER this filter when exact
    counts are required and the eval set is broadcastable.
    """
    from .curation import decontaminate  # noqa: F401  (parity: see docstring)
    from .text import tokens, word_ngram_hashes

    def gram_hashes(df: DataFrame, keep_id: bool) -> DataFrame:
        cols = [F.col(id_col)] if keep_id else []
        return df.select(*cols, tokens(text_col).alias("tk")).select(
            *cols,
            F.explode(
                F.array_distinct(word_ngram_hashes(F.col("tk"), n))
            ).alias("gram_h"),
        )

    bloom = bloom_build(
        gram_hashes(eval_docs, keep_id=False),
        "gram_h",
        m_bits=m_bits,
        n_hashes=n_hashes,
    )
    probed = bloom_might_contain(
        gram_hashes(corpus, keep_id=True),
        "gram_h",
        bloom,
        m_bits=m_bits,
        n_hashes=n_hashes,
    )
    return (
        probed.filter(F.col("bloom_hit"))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_candidate_ngrams"))
    )
