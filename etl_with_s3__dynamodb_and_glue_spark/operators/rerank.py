"""Cross-encoder reranking boundary: (query text, doc text) → score.

The last stage of the standard retrieval cascade this package already
ships (BM25 → ANN → reciprocal-rank fusion): a cross-encoder reads the
query and document TOGETHER and outscores any bi-encoder ranking, at a
per-pair inference cost that only makes sense over a small fused
candidate pool — which is exactly what ``doc_hybrid_rrf`` produces.
Like ``embedding_gen``/``multimodal``, model inference is external;
what this module makes real and tested is the Spark side:

- **Candidate-pool discipline**: reranking takes the top-k fused pool
  per query (tens of rows), never the corpus. The pool table is the
  unit of work; its size bounds inference cost by construction.
- **Batched execution**: one ``mapInPandas`` pass over the pool,
  scorer invoked once per Arrow batch with (queries, docs) lists —
  the shape a GPU cross-encoder wants.
- **Determinism contract**: a scorer is a pure function of the
  (query, doc) text pair; partitioning-invariance is asserted so
  reranked orderings are reproducible across cluster layouts.

Scorers: :func:`overlap_scorer` is the deterministic fake (smoothed
token-overlap F1 — a real, if weak, relevance signal that makes
ordering tests meaningful), and :func:`model_scorer` is the loud
import-gated real boundary (the ``multimodal.py`` rule: never silently
substitute the fake)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .windows import top_k_per_group


def overlap_scorer():
    """Deterministic fake cross-encoder: token-overlap F1 between the
    query and the document with add-one smoothing. Pure function of
    the pair, identical across processes."""

    def _score(queries, docs):
        out = []
        for q, d in zip(queries, docs):
            qs, ds = set((q or "").lower().split()), set(
                (d or "").lower().split()
            )
            inter = len(qs & ds)
            p = inter / (len(ds) + 1)
            r = inter / (len(qs) + 1)
            out.append(2 * p * r / (p + r) if (p + r) else 0.0)
        return out

    return _score


def model_scorer(model_name: str):
    """Resolve a real cross-encoder, loudly (import-gated at
    RESOLUTION time, never silently replaced by the fake)."""
    try:
        from sentence_transformers import CrossEncoder  # type: ignore
    except ImportError as exc:
        raise NotImplementedError(
            f"real cross-encoder inference needs sentence-transformers "
            f"for {model_name!r}; install it or pass an explicit scorer "
            f"(tests use overlap_scorer)"
        ) from exc
    model = CrossEncoder(model_name)

    def _score(queries, docs):
        return [float(s) for s in model.predict(list(zip(queries, docs)))]

    return _score


def rerank_pool(
    pool: DataFrame,
    k: int = 10,
    scorer=None,
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    doc_id_col: str = "doc_id",
    doc_text_col: str = "text",
) -> DataFrame:
    """Rerank a per-query candidate pool: returns (query_id, doc_id,
    rerank_score, rank) with the top ``k`` per query.

    ``pool`` carries both texts per row (the fused-retrieval output
    joined to its documents) — tens of rows per query, which is the
    entire point: cross-encoder cost is bounded by the pool, not the
    corpus. One ``mapInPandas`` pass (scorer per Arrow batch), then
    the standard WindowGroupLimit rank cut with score-desc,
    doc-id-asc determinism."""
    import pandas as pd

    fn = scorer if scorer is not None else overlap_scorer()
    out_schema = (
        f"{query_id_col} long, {doc_id_col} long, rerank_score double"
    )

    def _score_batches(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            scores = fn(
                pdf[query_text_col].tolist(), pdf[doc_text_col].tolist()
            )
            yield pd.DataFrame(
                {
                    query_id_col: pdf[query_id_col].to_numpy(),
                    doc_id_col: pdf[doc_id_col].to_numpy(),
                    "rerank_score": [round(float(s), 6) for s in scores],
                }
            )

    scored = pool.select(
        query_id_col, query_text_col, doc_id_col, doc_text_col
    ).mapInPandas(_score_batches, out_schema)
    return top_k_per_group(
        scored,
        group_by=[query_id_col],
        order_by=[F.col("rerank_score").desc(), F.col(doc_id_col).asc()],
        k=k,
    )
