"""Embedding-inference boundary: text → ``array<float>`` vectors.

Model inference is EXTERNAL to this engine — a transformer encoder
needs model weights and an inference runtime this container does not
ship, exactly like the codec situation in ``multimodal.py``. What IS
this engine's job, and what this module makes real and tested, is the
Spark side of the boundary:

- **Batched execution**: one ``mapInPandas`` pass, embedder called per
  Arrow batch (the shape a GPU wants — weights load once per worker,
  rows arrive pre-batched), never per row.
- **Schema contract**: output is the corpus embedding layout
  (``id, embedding array<double>``) that every downstream consumer in
  this package (ANN, PQ, SemDeDup, hard negatives) already speaks.
- **Determinism contract**: an embedder must be a pure function of the
  text — asserted by the partitioning-invariance test, which is what
  makes embedding-keyed dedup decisions reproducible across cluster
  layouts.

Two embedders ship:

- :func:`hash_embedder` — a deterministic FAKE (seeded per-token
  Gaussian vectors, mean-pooled, L2-normalized; md5-derived seeds, so
  identical across processes and interpreters). Exact-duplicate texts
  embed identically and token-overlapping texts land measurably close:
  enough structure to drive the full downstream pipeline in tests.
- :func:`model_embedder` — the REAL boundary: resolves a
  sentence-transformers model if the library is importable and fails
  LOUDLY otherwise. Never silently falls back to the fake (the
  ``multimodal.py`` rule: a stub that pretends to succeed poisons
  every downstream decision).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, functions as F


def hash_embedder(dim: int = 64, seed: int = 7):
    """Deterministic fake embedder: per-token Gaussian vector seeded by
    md5(token) ⊕ seed, mean-pooled over the token sequence, L2
    normalized. Empty/whitespace-only texts embed to the zero vector.

    Returns ``fn(list[str]) -> np.ndarray (n, dim)``.
    """
    import numpy as np

    def _token_vec(tok: str):
        h = int.from_bytes(
            hashlib.md5(tok.encode("utf-8")).digest()[:8], "little"
        )
        rng = np.random.default_rng((h ^ seed) & 0xFFFFFFFFFFFFFFFF)
        return rng.standard_normal(dim)

    def _embed(texts):
        out = np.zeros((len(texts), dim))
        for i, t in enumerate(texts):
            toks = (t or "").split()
            if not toks:
                continue
            v = np.mean([_token_vec(tok) for tok in toks], axis=0)
            n = np.linalg.norm(v)
            out[i] = v / n if n else v
        return out

    return _embed


def model_embedder(model_name: str, dim: int | None = None):
    """Resolve a real sentence-transformers encoder, loudly.

    Import-gated like ``multimodal.py``'s Pillow path: if the library
    is not present this raises ``NotImplementedError`` at RESOLUTION
    time — before any Spark job runs — never at row time and never by
    silently substituting the fake."""
    try:
        from sentence_transformers import SentenceTransformer  # type: ignore
    except ImportError as exc:
        raise NotImplementedError(
            f"real embedding inference needs sentence-transformers for "
            f"{model_name!r}; install it or pass an explicit embedder "
            f"(tests use hash_embedder)"
        ) from exc
    model = SentenceTransformer(model_name)

    def _embed(texts):
        return model.encode(list(texts), convert_to_numpy=True)

    return _embed


def embed_texts(
    docs: DataFrame,
    embedder=None,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
) -> DataFrame:
    """Embed a text column: (id, embedding array<double>).

    One ``mapInPandas`` pass; ``embedder`` (default
    :func:`hash_embedder`) is invoked once per Arrow batch with the
    batch's texts. The embedder rides the task closure — for a real
    model wrap lazy weight-loading inside it so weights load once per
    worker, not per batch. No shuffle: embedding is a per-row map, and
    the output column feeds straight into ``pq_encode`` /
    ``build_ivf_index`` / ``minhash``-style downstream stages.
    """
    import pandas as pd

    fn = embedder if embedder is not None else hash_embedder(dim)
    out_schema = f"{id_col} long, embedding array<double>"

    def _embed_batches(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            vecs = fn(pdf[text_col].tolist())
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "embedding": [list(map(float, v)) for v in vecs],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(_embed_batches, out_schema)


def embedding_drift(
    reference: DataFrame,
    current: DataFrame,
    dim: int = 64,
    vec_col: str = "embedding",
    n_probes: int = 16,
    seed: int = 11,
) -> DataFrame:
    """Model-upgrade drift monitor: compare two embedding snapshots of
    the same corpus WITHOUT pairing rows — project each population onto
    ``n_probes`` fixed random directions (seeded, shared by both sides)
    and report per-probe mean shift. Catches re-embedding drift (new
    model version, changed normalization) as a tiny ``n_probes``-row
    report; each side is ONE aggregate pass — no join of the corpora,
    no shuffle of vectors, and the only join is on the n_probes-row
    summaries.
    """
    import random as _random

    rng = _random.Random(seed)
    directions = [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_probes)
    ]

    def probe_means(df: DataFrame) -> DataFrame:
        aggs = []
        for p, direction in enumerate(directions):
            dir_col = F.array(*[F.lit(x) for x in direction])
            proj = F.aggregate(
                F.zip_with(
                    F.transform(F.col(vec_col), lambda x: x.cast("double")),
                    dir_col,
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            aggs.append(F.avg(proj).alias(f"p_{p}"))
        stacked = ", ".join(f"{p}, p_{p}" for p in range(n_probes))
        return df.agg(*aggs).selectExpr(
            f"stack({n_probes}, {stacked}) as (probe, mean_proj)"
        )

    ref = probe_means(reference)
    cur = probe_means(current)
    return (
        ref.select("probe", F.col("mean_proj").alias("ref_mean"))
        .join(
            cur.select("probe", F.col("mean_proj").alias("cur_mean")),
            "probe",
        )
        .select(
            "probe",
            F.round("ref_mean", 6).alias("ref_mean"),
            F.round("cur_mean", 6).alias("cur_mean"),
            F.round(F.abs(F.col("cur_mean") - F.col("ref_mean")), 6).alias(
                "abs_shift"
            ),
        )
    )
