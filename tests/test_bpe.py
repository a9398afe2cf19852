"""BPE training tests: exact-twin parity with a sequential reference
implementation of Sennrich et al.'s algorithm, determinism, early
stopping, and segmentation round-trip invariants."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_with_s3__dynamodb_and_glue_spark.operators import bpe
from tests.conftest import SF_SMOKE

CORPUS = (
    "low low low low low "
    "lower lower "
    "newest newest newest newest newest newest "
    "widest widest widest"
)


def _reference_bpe(words: Counter, n_merges: int, min_count: int):
    """Sequential textbook BPE (the exact twin), with the same
    lexicographic tie-break."""
    vocab = {
        tuple(list(w[:-1]) + [w[-1] + bpe.EOW]): n for w, n in words.items()
    }
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if best[1] < min_count:
            break
        (a, b) = best[0]
        merges.append((a, b))
        new_vocab = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def _corpus_df(spark):
    return spark.createDataFrame([(1, CORPUS)], "doc_id long, text string")


def test_bpe_train_matches_sequential_reference(spark):
    got = bpe.bpe_train(_corpus_df(spark), n_merges=12, min_pair_count=2)
    want = _reference_bpe(Counter(CORPUS.split()), 12, 2)
    assert got == want
    # the canonical example's first merges: 'est</w>' forms for
    # newest/widest (9 occurrences beat 'lo' at 7)
    assert got[0] == ("e", "s")
    assert ("es", "t" + bpe.EOW) in got[:2]


def test_bpe_train_on_real_docs_matches_reference(spark):
    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .limit(100)
        .select("doc_id", "text")
    )
    words: Counter = Counter()
    for r in docs.collect():
        words.update(w.lower() for w in r.text.split())
    got = bpe.bpe_train(docs, n_merges=25, min_pair_count=2)
    want = _reference_bpe(words, 25, 2)
    assert got == want
    assert len(got) == 25  # real corpus has plenty of frequent pairs


@settings(max_examples=300, deadline=None)
@given(
    st.dictionaries(
        st.text(
            alphabet=st.sampled_from("abcdef😀"), min_size=1, max_size=6
        ),
        st.integers(min_value=1, max_value=9),
        min_size=0,
        max_size=12,
    ),
    st.integers(min_value=0, max_value=20),
    st.integers(min_value=1, max_value=4),
)
def test_train_incremental_matches_reference(words, n_merges, min_count):
    """Unit-level twin of the Spark property test: the incremental
    pair-count/owner maintenance in _train_incremental must replay the
    recount-everything reference EXACTLY — same argmax sequence, same
    tie-breaks, same early stop — across hundreds of random word
    tables (no Spark in the loop, so the example budget is cheap)."""
    table = [
        (list(w[:-1]) + [w[-1] + bpe.EOW], n) for w, n in words.items()
    ]
    got = bpe._train_incremental(table, n_merges, min_count)
    want = _reference_bpe(Counter(words), n_merges, min_count)
    assert got == want


def test_bpe_train_code_point_symbols(spark):
    # astral-plane characters (UTF-16 surrogate pairs on the JVM) are
    # single symbols: the r10 single-task trainer builds symbol arrays
    # with Python code-point slicing, matching the sequential
    # reference exactly — pinned so a future Spark-side symbol split
    # (which would slice JVM code UNITS) can't silently diverge
    text = "\U0001F600x \U0001F600x \U0001F600y"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = bpe.bpe_train(df, n_merges=3, min_pair_count=2)
    want = _reference_bpe(Counter(text.split()), 3, 2)
    assert got == want == [("\U0001F600", "x" + bpe.EOW)]


def test_bpe_train_is_deterministic(spark):
    a = bpe.bpe_train(_corpus_df(spark), n_merges=8)
    b = bpe.bpe_train(_corpus_df(spark), n_merges=8)
    assert a == b


def test_bpe_train_stops_when_pairs_go_rare(spark):
    df = spark.createDataFrame(
        [(1, "ab ab cd")], "doc_id long, text string"
    )
    # 'ab' appears twice -> one mergeable pair at count 2; everything
    # after is hapax and must not be merged
    merges = bpe.bpe_train(df, n_merges=50, min_pair_count=2)
    assert merges == [("a", "b" + bpe.EOW)]


def test_bpe_segment_round_trip(spark):
    docs = _corpus_df(spark)
    merges = bpe.bpe_train(docs, n_merges=12)
    seg = bpe.bpe_segment(docs, merges).collect()[0]
    # concatenating tokens and stripping sentinels reconstructs the text
    rebuilt = "".join(seg.tokens).replace(bpe.EOW, " ").strip()
    assert rebuilt == CORPUS
    assert seg.n_tokens == len(seg.tokens)
    # frequent whole words became single units
    assert "low" + bpe.EOW in seg.tokens or "newest" + bpe.EOW in seg.tokens


def test_more_merges_never_increase_token_count(spark):
    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .limit(50)
        .select("doc_id", "text")
    )
    m_few = bpe.bpe_train(docs, n_merges=5)
    m_many = bpe.bpe_train(docs, n_merges=25)
    assert m_many[:5] == m_few  # merge sequence is prefix-stable
    few = bpe.bpe_segment(docs, m_few).agg(F.sum("n_tokens")).first()[0]
    many = bpe.bpe_segment(docs, m_many).agg(F.sum("n_tokens")).first()[0]
    assert many <= few
