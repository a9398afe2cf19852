"""Multimodal-column operators: images/audio/video as opaque binary
columns with typed metadata.

The Spark-side plumbing is real and tested — schema contract,
Arrow-batched ``mapInPandas`` pipelines, content hashing, metadata
handling, batch shapes. The actual media DECODE step is stubbed
(this container ships no image/audio codecs): ``decode_image`` raises
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder produces stable per-content features so
every downstream stage is exercisable end-to-end.

Schema contract for a multimodal asset table:

    asset_id  long
    modality  string            ('image' | 'audio' | 'video')
    content   binary            (opaque encoded bytes)
    meta      struct<mime string, width int, height int,
                     duration_ms long>

At 100 TB the binary column dominates: keep assets in their own table
partitioned by ingest date, carry only (asset_id, features) forward,
and never groupBy/shuffle the binary payload — all operators below
are per-partition maps (mapInPandas) with no shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("content_sha", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def content_hash(df: DataFrame, content_col: str = "content") -> DataFrame:
    """sha2 of the raw bytes — exact-dup detection across assets
    without decoding. Native function, no Python."""
    return df.withColumn("content_sha", F.sha2(F.col(content_col), 256))


def _fake_decode(content: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder: features derived
    from the content digest. Stable across runs/machines."""
    digest = hashlib.sha256(content).digest()
    return [digest[i] / 255.0 for i in range(FEATURE_DIM)]


def decode_image(content: bytes) -> list[float]:  # pragma: no cover - stub
    """STUB: real image decode (e.g. Pillow/libvips) is unavailable in
    this environment. The Spark plumbing around it is real; swap this
    function for an actual decoder in deployment."""
    raise NotImplementedError(
        "image codecs not available in this environment; use fake=True"
    )


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the asset table.

    ``mapInPandas`` processes whole record batches per partition — the
    decode cost is the only per-row cost, there is no shuffle, and
    batch size is bounded by spark.sql.execution.arrow.maxRecordsPerBatch
    (so executor memory is safe even with large blobs).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decode = _fake_decode if fake else decode_image
            contents = pdf["content"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "content_sha": contents.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "n_bytes": contents.map(len).astype("int64"),
                    "features": contents.map(lambda b: decode(bytes(b))),
                }
            )

    return df.mapInPandas(run, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)


def _fake_resize(content: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for decode→resize→re-encode: a stable
    function of (content digest, target dims) with output length
    scaled to the target pixel count, so size-dependent downstream
    behavior (batching, memory accounting) is exercisable."""
    digest = hashlib.sha256(content + f"{width}x{height}".encode()).digest()
    n = max(1, (width * height) // 64)
    return (digest * (n // len(digest) + 1))[:n]


def resize_images(
    df: DataFrame, width: int, height: int, fake: bool = True
) -> DataFrame:
    """Resize the image assets to (width, height) — same asset-table
    schema out, with ``content`` re-encoded and ``meta`` dims updated.

    Same plumbing contract as :func:`extract_features`: Arrow-batched
    ``mapInPandas``, per-partition, no shuffle, binary payload never
    leaves its partition. The pixel work is stubbed (no codecs in
    this container): ``fake=True`` runs a deterministic stand-in,
    ``fake=False`` raises at the decode boundary exactly where a real
    Pillow/libvips call slots in.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image codecs not available in this environment; "
                    "use fake=True"
                )
            out = pdf.copy()
            out["content"] = out["content"].map(
                lambda b: _fake_resize(bytes(b), width, height)
            )
            out["meta"] = out["meta"].map(
                lambda m: {**m, "width": width, "height": height}
            )
            yield out

    return df.filter(F.col("modality") == "image").mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: computes per-asset frame timestamps
    (native array expression) without decoding — the decode of each
    sampled frame would run through ``extract_features``-style
    mapInPandas in deployment."""
    n_frames = (F.col("meta.duration_ms") / every_ms).cast("int")
    return df.filter(F.col("modality") == "video").select(
        "asset_id",
        F.transform(
            F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
            lambda i: i * every_ms,
        ).alias("frame_ts_ms"),
    )


def make_asset_table(documents: DataFrame, modality: str = "image") -> DataFrame:
    """Build a synthetic asset table from the documents testdata:
    text bytes play the role of encoded media (the harness ships no
    real media). Deterministic: same input → same assets."""
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        F.lit(modality).alias("modality"),
        F.encode("text", "UTF-8").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )
