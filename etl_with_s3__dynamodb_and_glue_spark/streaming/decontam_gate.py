"""Streaming substring-decontamination gate: screen arriving documents
against a PERSISTED eval anchor store before they enter the training
corpus — the production loop of span-level benchmark decontamination.

Per micro-batch: the batch's verbatim overlaps with the eval suite are
extracted span-by-span (``operators/dedup.py::duplicate_spans_vs_store``
— the batch's own anchor pass plus a broadcast of the stored 8-byte
gram hashes; the eval text itself is hashed ONCE at
``build_anchor_store`` time and never re-read), and two artifacts land
per batch:

- a FINDINGS log (doc_id, span_start, span_len, span_text) — the
  evidence trail an audit reads;
- a DECISIONS log (doc_id, contaminated, n_spans, n_tokens_leaked) —
  one row per arriving doc, clean docs included, which is what the
  admission step joins against (and what
  ``dedup.remove_duplicate_spans`` consumes when scrub-and-admit is
  preferred over reject).

Idempotence layout (the house ``ingest_dedup`` discipline): both logs
land under per-batch subdirectories (``batch_id=N``) written with
overwrite — foreachBatch is at-least-once and a replayed batch
rewrites its OWN subtree. The ``_last_batch_id`` marker is SCOPED TO A
RUN (checkpoint path): a regressed batch_id within a run short-circuits
as a replay; across runs it fails loudly (fresh-checkpoint
re-numbering would silently skip arrivals). Unlike the near-dup ingest
gate the store is STATIC — the eval suite does not grow with arrivals
— so batches are independent and the gate is embarrassingly
replayable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import duplicate_spans_vs_store

_BATCH_MARKER = "_last_batch_id"


def _marker_path(findings_dir: str) -> str:
    return os.path.join(findings_dir, _BATCH_MARKER)


def _read_marker(findings_dir: str) -> tuple[str, int] | None:
    if not os.path.isfile(_marker_path(findings_dir)):
        return None
    with open(_marker_path(findings_dir)) as f:
        lines = f.read().splitlines()
    if len(lines) >= 2:
        return lines[0], int(lines[1])
    return "", int(lines[0].strip())


def screen_batch(
    batch: DataFrame,
    batch_id: int,
    store_path: str,
    findings_dir: str,
    decisions_dir: str,
    min_tokens: int = 8,
    run_id: str = "",
) -> None:
    """Screen one batch against the anchor store, land findings +
    per-doc decisions. Runs identically under foreachBatch and as a
    batch backfill."""
    marker = _read_marker(findings_dir)
    if marker is not None and batch_id <= marker[1]:
        if marker[0] == run_id:
            return
        raise ValueError(
            f"batch_id {batch_id} regressed below the landed "
            f"{marker[1]} but came from a different run "
            f"({run_id!r} vs {marker[0]!r}): resume from the original "
            "checkpoint, or point at fresh findings/decisions dirs"
        )
    batch = batch.persist()
    spans = duplicate_spans_vs_store(batch, store_path, min_tokens=min_tokens)
    spans.write.mode("overwrite").parquet(f"{findings_dir}/batch_id={batch_id}")
    spark = batch.sparkSession
    landed = spark.read.parquet(f"{findings_dir}/batch_id={batch_id}")
    per_doc = landed.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("span_len").alias("n_tokens_leaked"),
    )
    decisions = (
        batch.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_spans") > 0, F.lit(False)).alias(
                "contaminated"
            ),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("n_tokens_leaked", F.lit(0))
            .cast("long")
            .alias("n_tokens_leaked"),
        )
    )
    decisions.write.mode("overwrite").parquet(
        f"{decisions_dir}/batch_id={batch_id}"
    )
    with open(_marker_path(findings_dir), "w") as f:
        f.write(f"{run_id}\n{batch_id}")
    batch.unpersist()


def decontam_gate_stream(
    arrivals: DataFrame,
    store_path: str,
    findings_dir: str,
    decisions_dir: str,
    checkpoint_dir: str,
    min_tokens: int = 8,
) -> StreamingQuery:
    """Run the gate over a document stream (columns: doc_id, text, …)
    against a prebuilt anchor store (``dedup.build_anchor_store``)."""
    run_id = os.path.abspath(checkpoint_dir)

    def handle(batch: DataFrame, batch_id: int) -> None:
        screen_batch(
            batch,
            batch_id,
            store_path,
            findings_dir,
            decisions_dir,
            min_tokens=min_tokens,
            run_id=run_id,
        )

    return (
        arrivals.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_findings(spark: SparkSession, findings_dir: str) -> DataFrame:
    return spark.read.option("basePath", findings_dir).parquet(
        f"{findings_dir}/batch_id=*"
    )


def read_decisions(spark: SparkSession, decisions_dir: str) -> DataFrame:
    return spark.read.option("basePath", decisions_dir).parquet(
        f"{decisions_dir}/batch_id=*"
    )
