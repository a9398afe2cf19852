"""Byte-pair-encoding tokenizer TRAINING, distributed the way it
actually scales (Sennrich, Haddow, Birch, "Neural Machine Translation
of Rare Words with Subword Units", ACL 2016).

The scale insight every production tokenizer trainer uses: BPE does
not train on the corpus — it trains on the WORD-COUNT TABLE. The
corpus contributes exactly one aggregation (word → count, one
shuffle); everything after that is vocabulary-bounded (≈10⁵–10⁷ rows)
regardless of whether the corpus is 1 GB or 100 TB.

Plan shape (round-10 rework; the r7 original and its measurements are
in git history):

- :func:`word_counts` — the single corpus pass (split, explode, count;
  map-side partial combine). This is the only stage that touches the
  corpus and the only stage whose cost grows with data size, and it is
  fully distributed.
- :func:`bpe_train` — ships the vocabulary-bounded word table to ONE
  task (``repartition(1)`` + ``mapInPandas``) and runs the whole merge
  loop there with incremental pair-count maintenance — the classic
  fast-trainer structure (only words containing the merged pair are
  touched per step). The driver receives ``n_merges`` rows, total.

  Why not iterate in Spark? The r7 implementation did (explode +
  keyed sum + one-row collect per merge, ``localCheckpoint`` every 10
  steps) and was CORRECT and vocabulary-bounded — but each merge paid
  a fixed ~0.35 s of job scheduling + Python-UDF launch, so 30 merges
  cost ~13 s at ANY corpus size: pure per-iteration overhead, not
  data-volume cost. Since the iterated table is vocab-bounded by
  construction, the distributed loop bought nothing but that overhead;
  one task over the aggregated table is the architecture real
  tokenizer trainers (HuggingFace tokenizers, SentencePiece) use, with
  Spark doing the part that actually needs a cluster — the corpus
  pass. Measured at sf0.1 / 30 merges: 13.3 s → see BENCH_NOTES_r10.
- :func:`bpe_segment` — apply learned merges to a corpus: one Pandas
  UDF pass with the merge-rank dict as closure constant; no shuffle.

For a crawl whose DISTINCT-word table itself no longer fits one
executor (≈10⁸+ rows — typo/URL tails), pass ``max_words`` to keep the
top-N words by frequency before the single-task stage; hapax tails
carry negligible pair mass, and capping the word table is standard
trainer practice at that scale. Default is None (exact).

Determinism: ties on pair count break lexicographically, so the merge
sequence is a pure function of the word-count table (Python tuple
comparison on (left, right) orders by code point, identical to
Spark's binary UTF-8 string ordering). The end-of-word sentinel is
``</w>`` (the paper's construction), so learned units never merge
across word boundaries.
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


def _train_incremental(
    words: list[tuple[list[str], int]], n_merges: int, min_pair_count: int
) -> list[tuple[str, str]]:
    """The in-task merge loop: textbook sequential BPE with incremental
    pair-count maintenance. ``words`` is the (symbols, frequency) table;
    per merge only the words CONTAINING the winning pair are re-scanned
    (``pair_words`` tracks membership), so a step costs O(affected
    words), not O(vocabulary). Exact-twin parity with the sequential
    reference (including the (count desc, left asc, right asc)
    tie-break and the left-to-right non-overlapping merge application)
    is pinned by tests/test_bpe.py and the hypothesis property test.

    The argmax is a linear scan over the live pair table — fine for
    the ≤10³-merge regime this engine trains; swap in a lazy-deletion
    heap before asking for 10⁵ merges."""
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for idx, (syms, n) in enumerate(words):
        for p in zip(syms, syms[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + n
            pair_words.setdefault(p, set()).add(idx)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        (a, b), cnt = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if cnt < min_pair_count:
            break
        merges.append((a, b))
        ab = a + b
        for idx in list(pair_words.get((a, b), ())):
            syms, n = words[idx]
            old_pairs = list(zip(syms, syms[1:]))
            for p in old_pairs:
                c = pair_counts[p] - n
                if c:
                    pair_counts[p] = c
                else:
                    del pair_counts[p]
            for p in set(old_pairs):
                owners = pair_words[p]
                owners.discard(idx)
                if not owners:
                    del pair_words[p]
            new_syms: list[str] = []
            i, length = 0, len(syms)
            while i < length:
                if i + 1 < length and syms[i] == a and syms[i + 1] == b:
                    new_syms.append(ab)
                    i += 2
                else:
                    new_syms.append(syms[i])
                    i += 1
            words[idx] = (new_syms, n)
            new_pairs = list(zip(new_syms, new_syms[1:]))
            for p in new_pairs:
                pair_counts[p] = pair_counts.get(p, 0) + n
            for p in set(new_pairs):
                pair_words.setdefault(p, set()).add(idx)
    return merges


def bpe_train(
    docs: DataFrame,
    n_merges: int = 50,
    min_pair_count: int = 2,
    text_col: str = "text",
    max_words: int | None = None,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merges from a corpus. Returns the
    ordered merge list (the tokenizer artifact — feed it to
    :func:`bpe_segment`).

    One distributed corpus pass (:func:`word_counts`), one small
    shuffle of the vocabulary-bounded word table to a single task, one
    ``mapInPandas`` that runs the whole merge loop in-process
    (:func:`_train_incremental`), and an ``n_merges``-row collect.
    Stops early when no pair reaches ``min_pair_count`` (merging hapax
    pairs memorizes the corpus instead of compressing it).

    ``max_words`` caps the word table to the top-N by (frequency desc,
    word asc) before the single-task stage — the crawl-scale relief
    valve documented in the module docstring; leave None for exact
    textbook semantics over the full table."""
    wc = word_counts(docs, text_col)
    if max_words is not None:
        wc = wc.orderBy(F.desc("n"), F.asc("word")).limit(max_words)
    # close over plain ints, not self, so the task ships no DataFrames
    want_merges, min_count = int(n_merges), int(min_pair_count)

    def _train(batches):
        import pandas as pd

        words: list[tuple[list[str], int]] = []
        for pdf in batches:
            for w, n in zip(pdf["word"].tolist(), pdf["n"].tolist()):
                words.append((list(w[:-1]) + [w[-1] + EOW], int(n)))
        merges = _train_incremental(words, want_merges, min_count)
        if merges:
            yield pd.DataFrame(
                {
                    "merge_rank": pd.array(
                        range(len(merges)), dtype="int32"
                    ),
                    "left": [a for a, _ in merges],
                    "right": [b for _, b in merges],
                }
            )

    out = wc.repartition(1).mapInPandas(
        _train, "merge_rank int, left string, right string"
    )
    rows = sorted(out.collect(), key=lambda r: r.merge_rank)
    return [(r.left, r.right) for r in rows]


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
