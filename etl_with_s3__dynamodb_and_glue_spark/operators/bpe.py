"""Byte-pair-encoding tokenizer TRAINING, distributed the way it
actually scales (Sennrich, Haddow, Birch, "Neural Machine Translation
of Rare Words with Subword Units", ACL 2016).

The scale insight every production tokenizer trainer uses: BPE does
not train on the corpus — it trains on the WORD-COUNT TABLE. The
corpus contributes exactly one aggregation (word → count, one
shuffle); every merge iteration after that runs over the distinct-word
table, whose size is vocabulary-bounded (≈10⁵–10⁷ rows) regardless of
whether the corpus is 1 GB or 100 TB. Each iteration is one explode +
one keyed sum over that small table plus a ONE-ROW collect of the
winning pair; the corpus is never re-read.

Plan shapes:

- :func:`word_counts` — the single corpus pass (split, explode, count;
  map-side partial combine).
- :func:`bpe_train` — the merge loop. The word table carries its
  symbol arrays; pair counting is in-row ``zip_with`` over (symbols,
  shifted symbols), the merge application is a vectorized Pandas UDF
  over the vocabulary-bounded table (per-row linear scan — the classic
  sequential merge), and ``localCheckpoint`` truncates the growing
  lineage every few merges exactly like the connected-components loop
  in ``dedup.py``.
- :func:`bpe_segment` — apply learned merges to a corpus: one Pandas
  UDF pass with the merge-rank dict as closure constant; no shuffle.

Determinism: ties on pair count break lexicographically, so the merge
sequence is a pure function of the word-count table. The end-of-word
sentinel is ``</w>`` (the paper's construction), so learned units
never merge across word boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

EOW = "</w>"


def word_counts(
    docs: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """The one corpus pass: whitespace words → (word, n). Everything
    downstream of this is vocabulary-bounded."""
    w = F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word")
    out = docs.select(w).filter(F.col("word") != "")
    if lowercase:
        out = out.select(F.lower("word").alias("word"))
    return out.groupBy("word").agg(F.count(F.lit(1)).alias("n"))


def _initial_symbols(wc: DataFrame) -> DataFrame:
    """word → array of single-character symbols with the end-of-word
    sentinel appended to the last character."""
    chars = F.split(F.col("word"), "")
    syms = F.concat(
        F.slice(chars, 1, F.size(chars) - 1),
        F.array(F.concat(F.element_at(chars, -1), F.lit(EOW))),
    )
    one = F.array(F.concat(F.element_at(chars, 1), F.lit(EOW)))
    return wc.select(
        "word",
        "n",
        F.when(F.size(chars) == 1, one).otherwise(syms).alias("syms"),
    )


def _pair_counts(symtab: DataFrame) -> DataFrame:
    """Adjacent-pair counts over the symbol table, weighted by word
    frequency: in-row zip of (syms, syms shifted by one) — no
    self-join, map-side combine on the keyed sum."""
    pairs = F.zip_with(
        F.slice(F.col("syms"), 1, F.size("syms") - 1),
        F.slice(F.col("syms"), 2, F.size("syms") - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    return (
        symtab.filter(F.size("syms") >= 2)
        .select(F.explode(pairs).alias("p"), "n")
        .groupBy("p.a", "p.b")
        .agg(F.sum("n").alias("cnt"))
    )


def _merge_pair_udf(a: str, b: str):
    """Vectorized merge application: replace every adjacent (a, b) by
    a+b in each symbol array (left-to-right, non-overlapping — the
    classic sequential semantics). Runs over the vocab-bounded table
    only, never the corpus."""
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    def _apply(col):
        out = []
        for syms in col:
            res = []
            i, L = 0, len(syms)
            while i < L:
                if i + 1 < L and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            out.append(res)
        return pd.Series(out)

    return pandas_udf(_apply, "array<string>")


def bpe_train(
    docs: DataFrame,
    n_merges: int = 50,
    min_pair_count: int = 2,
    text_col: str = "text",
    checkpoint_every: int = 10,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merges from a corpus. Returns the
    ordered merge list (the tokenizer artifact — feed it to
    :func:`bpe_segment`).

    Driver traffic per iteration is ONE row (the argmax pair, with a
    lexicographic tie-break for determinism); the symbol table is
    persisted and re-derived through one merge per step,
    localCheckpoint-ed every ``checkpoint_every`` merges so the plan
    stays constant-size over hundreds of merges. Stops early when no
    pair reaches ``min_pair_count`` (merging hapax pairs memorizes the
    corpus instead of compressing it).

    Iteration-table partition sizing is AQE's job and AQE already does
    it (the checkpointed symbol table lands coalesced — 1 partition at
    the sf0.01 vocab); a manual vocab-proportional coalesce measured as
    a no-op (repeated same-session runs: 10.6-10.9 s for 30 merges with
    or without it — an earlier apparent win was warm-up). The residual
    cost is the n_merges sequential driver round-trips (~0.35 s each:
    one TakeOrdered argmax + one vocab-bounded UDF pass), irreducible
    without abandoning the textbook merge-at-a-time semantics."""
    symtab = _initial_symbols(word_counts(docs, text_col)).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for step in range(n_merges):
        best = (
            _pair_counts(symtab)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0].cnt < min_pair_count:
            break
        a, b = best[0].a, best[0].b
        merges.append((a, b))
        merged = symtab.select(
            "word", "n", _merge_pair_udf(a, b)("syms").alias("syms")
        )
        symtab = (
            merged.localCheckpoint()
            if (step + 1) % checkpoint_every == 0
            else merged
        )
    return merges


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Apply a learned merge list: (id, tokens array<string>,
    n_tokens). One Pandas UDF pass with the merge-rank dict as closure
    constant (the standard greedy lowest-rank-first application); the
    corpus never shuffles."""
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    def _encode_word(word: str) -> list[str]:
        if not word:
            return []
        syms = list(word[:-1]) + [word[-1] + EOW]
        while len(syms) >= 2:
            best_i, best_r = -1, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_r is None or r < best_r):
                    best_i, best_r = i, r
            if best_r is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        return syms

    def _apply(col):
        out = []
        for text in col:
            toks: list[str] = []
            for w in (text or "").split():
                toks.extend(_encode_word(w.lower() if lowercase else w))
            out.append(toks)
        return pd.Series(out)

    seg_udf = pandas_udf(_apply, "array<string>")
    return docs.select(
        F.col(id_col),
        seg_udf(F.col(text_col)).alias("tokens"),
    ).select(
        id_col, "tokens", F.size("tokens").cast("long").alias("n_tokens")
    )
