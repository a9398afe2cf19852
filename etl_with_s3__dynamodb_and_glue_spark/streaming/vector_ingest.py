"""Streaming vector ingest: embed arriving documents and extend the
serving ANN index — the continuous loop every retrieval deployment
runs over its document stream.

Per micro-batch: the batch's texts go through the batched inference
boundary (``operators/embedding_gen.embed_texts``), the vectors are
assigned to the FIXED coarse-quantizer centroids
(``similarity.ivf_assign`` — the append-without-retrain contract), and
the assignments land in the index's cluster-partitioned layout.
Per-batch cost = batch inference + one argmin matmul; the quantizer
never re-fits and the existing corpus is never re-read.

Idempotence layout (the ``ingest_dedup`` discipline): each batch's
assignments land under ``assignments/batch_id=N`` (sub-partitioned by
``cluster``) with overwrite — foreachBatch is at-least-once, and a
replayed batch rewrites its OWN subtree instead of duplicating rows.
A ``_last_batch_id`` marker short-circuits fully-landed batches, and
it is SCOPED TO A RUN (the checkpoint location): foreachBatch ids
restart at 0 under a fresh checkpoint, so an unscoped ``batch_id <=
last`` skip would silently drop new arrivals (and landing them anyway
would clobber the old run's same-numbered subtree). A regressing
batch_id from a DIFFERENT run therefore fails loudly instead of
returning — reuse the original checkpoint to resume, or point a new
run at a fresh ``index_dir``. The seed corpus is generation
``batch_id=-1``, so batch and streaming writes share one schema and
``load_vector_index`` is a single partitioned read — probe pruning
keys on the ``cluster`` partition column exactly as for a static
index, and the extra ``batch_id`` column doubles as ingestion
provenance.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.embedding_gen import embed_texts
from ..operators.similarity import IvfIndex, ivf_assign
from .marker import is_replay, last_batch_id, write_marker

SEED_BATCH_ID = -1


def last_ingested_batch_id(index_dir: str) -> int | None:
    return last_batch_id(index_dir)


def seed_index(
    docs: DataFrame,
    index_dir: str,
    n_clusters: int = 8,
    embedder=None,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Bootstrap: embed the existing corpus, fit the coarse quantizer
    once, land centroids + generation ``batch_id=-1`` assignments."""
    from ..operators.similarity import build_ivf_index

    spark = docs.sparkSession
    emb = embed_texts(
        docs, embedder=embedder, id_col=id_col, text_col=text_col, dim=dim
    )
    index = build_ivf_index(
        emb, id_col=id_col, vec_col="embedding", n_clusters=n_clusters
    )
    (
        index.assignments.write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(f"{index_dir}/assignments/batch_id={SEED_BATCH_ID}")
    )
    centroid_rows = [
        (i, [float(x) for x in ctr]) for i, ctr in enumerate(index.centers)
    ]
    spark.createDataFrame(
        centroid_rows, "cluster int, center array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_dir}/centroids")


def load_vector_index(spark: SparkSession, index_dir: str) -> IvfIndex:
    """The whole index — seed generation plus every ingested batch —
    as one partitioned scan (batch_id, cluster are partition columns;
    probes prune on cluster)."""
    import numpy as np

    rows = spark.read.parquet(f"{index_dir}/centroids").collect()
    centers = np.array(
        [r.center for r in sorted(rows, key=lambda r: r.cluster)]
    )
    assignments = spark.read.option(
        "basePath", f"{index_dir}/assignments"
    ).parquet(f"{index_dir}/assignments/batch_id=*")
    return IvfIndex(centers, assignments)


def ingest_vector_batch(
    batch: DataFrame,
    batch_id: int,
    index_dir: str,
    embedder=None,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    run_id: str = "",
) -> None:
    """Embed + assign + land one batch. Runs identically under
    foreachBatch and as a batch backfill.

    ``run_id`` scopes the replay short-circuit (the streaming wrapper
    passes its checkpoint path). A batch_id that regresses WITHIN a run
    is an at-least-once replay of a landed batch → skipped; one that
    regresses ACROSS runs means a fresh checkpoint is re-numbering from
    0 against an index another run built → raises instead of silently
    skipping (or clobbering the same-numbered subtree)."""
    if is_replay(
        index_dir,
        run_id,
        batch_id,
        "a restart with a fresh checkpoint would drop or clobber "
        "batches — resume from the original checkpoint, or seed a "
        "fresh index_dir",
    ):
        return
    spark = batch.sparkSession
    index = load_vector_index(spark, index_dir)
    emb = embed_texts(
        batch, embedder=embedder, id_col=id_col, text_col=text_col, dim=dim
    )
    assigned = ivf_assign(index, emb, id_col=id_col, vec_col="embedding")
    (
        assigned.write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(f"{index_dir}/assignments/batch_id={batch_id}")
    )
    write_marker(index_dir, run_id, batch_id)


def vector_ingest_stream(
    arrivals: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    embedder=None,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> StreamingQuery:
    """Run the ingest loop over a document stream (columns: doc_id,
    text, ...) against a seeded index."""

    run_id = os.path.abspath(checkpoint_dir)

    def handle(batch: DataFrame, batch_id: int) -> None:
        ingest_vector_batch(
            batch,
            batch_id,
            index_dir,
            embedder=embedder,
            dim=dim,
            id_col=id_col,
            text_col=text_col,
            run_id=run_id,
        )

    return (
        arrivals.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
