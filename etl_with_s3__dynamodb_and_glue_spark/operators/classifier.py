"""Hashed-feature linear text classifier scoring — the fastText-style
quality/toxicity/language filter pattern at corpus scale.

The production shape this demonstrates: a trained linear model over
hashed bag-of-words features is a (bucket → weight) TABLE, tiny next
to the corpus. Scoring broadcasts the model and reduces per document:
explode tokens → hash to feature bucket → broadcast-join weights →
per-doc mean → sigmoid. The corpus never shuffles for the join (the
model is the build side); the only wide operation is the per-doc
aggregate, map-side combined. Swapping in a real trained model means
replacing ``weights_table`` with a parquet read — nothing else moves.

Weights here are deterministic pseudo-random (a pure function of the
bucket id via md5 digits) so the DuckDB oracle can rebuild the
identical model and replay the identical scores — engine-parity over
every step: hashing, bucketing, weight synthesis, mean, sigmoid.

All hex→int decoding is spelled out digit-by-digit (``instr`` over
the hex alphabet) because engines disagree on hex-conversion builtins
but agree on string positions — same portability stance as
operators/sampling.py's threshold-on-hex-string trick.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

N_BUCKETS = 1024
_HEX = "0123456789abcdef"


def _hex_val(col: Column, pos: int) -> Column:
    """Value 0-15 of the ``pos``-th (1-based) hex digit of a lowercase
    hex string — portable across engines via string position."""
    return F.instr(F.lit(_HEX), F.substring(col, pos, 1)) - 1


def _hex4(col: Column) -> Column:
    """First 4 hex digits as an int in [0, 65536)."""
    return (
        _hex_val(col, 1) * 4096
        + _hex_val(col, 2) * 256
        + _hex_val(col, 3) * 16
        + _hex_val(col, 4)
    )


def feature_bucket(token: Column) -> Column:
    """Feature-hash a token into [0, N_BUCKETS)."""
    return (_hex4(F.md5(F.concat(F.lit("f|"), token))) % N_BUCKETS).cast("int")


def weights_table(spark: SparkSession) -> DataFrame:
    """The synthetic linear model: bucket → weight in [-1, 1), a pure
    function of the bucket id (md5-digit uniform). A real deployment
    reads this from the training job's parquet instead."""
    return spark.range(N_BUCKETS).select(
        F.col("id").cast("int").alias("bucket"),
        F.round(
            _hex4(F.md5(F.concat(F.lit("w|"), F.col("id").cast("string"))))
            / 65536.0
            * 2.0
            - 1.0,
            6,
        ).alias("w"),
    )


def classifier_scores(
    docs: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document probability under the linear model:
    sigmoid(mean of token-feature weights). Output: (doc_id, n_tokens,
    prob) with prob rounded to 6; empty docs score NULL.
    """
    from .text import tokens

    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("tk")
    ).select("doc_id", F.explode("tk").alias("tok"))
    scored = toks.withColumn("bucket", feature_bucket(F.col("tok"))).join(
        F.broadcast(weights), "bucket"
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.avg("w").alias("mean_w"),
    )
    all_docs = docs.select(F.col(id_col).alias("doc_id"))
    return all_docs.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
        F.round(1.0 / (1.0 + F.exp(-F.col("mean_w"))), 6).alias("prob"),
    )
