"""Deterministic hash-based sampling: stable splits and source mixing
for training-data pipelines.

``df.sample``/``sampleBy`` draw per-row Bernoulli from a seeded RNG
whose stream depends on partitioning — re-partition the input (or move
it to a cluster with different parallelism) and the sample changes.
Training pipelines need the opposite: membership decided by the ROW,
not by where it landed. The standard fix is hash-mod sampling: a row is
in the sample iff ``hash(salt | key) < fraction``, which is

- deterministic across runs, partitionings, and engines (md5 is md5
  everywhere — the DuckDB oracle checks these queries exactly);
- stable under data growth: a row's membership never flips when other
  rows arrive, so incremental pipelines don't churn their splits;
- disjoint-composable: non-overlapping hash ranges give leak-free
  train/test splits from one pass.

The threshold comparison is done on the first 8 hex chars of the md5
as a STRING — fixed-width lowercase hex compares lexicographically
exactly like the number it encodes, sidestepping engine-specific
hex→int conversion. Per-row map, no shuffle, codegen-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_HEX_WIDTH = 8
_HEX_SPACE = 16**_HEX_WIDTH


def hex_threshold(fraction: float) -> str:
    """The 8-hex-char string h such that P[bucket < h] = fraction.

    fraction == 1.0 returns the sentinel ``"g"`` — lexicographically
    above every hex string — so every row (including the ~1-in-2^32
    bucket ``ffffffff``) satisfies ``bucket < h`` and the contract
    "fraction 1.0 keeps every row" holds exactly.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    if fraction >= 1.0:
        return "g"
    return format(int(fraction * _HEX_SPACE), "08x")


def hash_bucket(key: Column | str, salt: str) -> Column:
    """Uniform bucket id in hex-string space for a row key."""
    c = F.col(key) if isinstance(key, str) else key
    return F.substring(
        F.md5(F.concat_ws("|", F.lit(salt), c.cast("string"))), 1, _HEX_WIDTH
    )


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Keep ~``fraction`` of rows, membership decided by the key alone."""
    return df.filter(hash_bucket(key_col, salt) < F.lit(hex_threshold(fraction)))


def train_test_split(
    df: DataFrame, key_col: str, test_fraction: float, salt: str = "split"
) -> tuple[DataFrame, DataFrame]:
    """Leak-free (train, test): complementary hash ranges of one bucket
    column — no row can be in both, every row is in one."""
    th = F.lit(hex_threshold(test_fraction))
    bucket = hash_bucket(key_col, salt)
    return df.filter(bucket >= th), df.filter(bucket < th)


def sharded_training_order(
    df: DataFrame,
    key_col: str,
    salt: str = "order",
) -> DataFrame:
    """Reproducible global shuffle for training order, in 16 shards.

    ``orderBy(rand())`` changes with seed plumbing, partitioning, and
    engine; training runs need the SAME shuffle on every rerun and
    resumption. Hash order gives that: shard = first hex digit of the
    key's hash bucket, position = rank within the shard by (hash,
    key). A trainer reads shards in index order, rows within a shard
    in position order — a uniform, deterministic permutation that is a
    pure function of (salt, key), byte-identical across engines (the
    DuckDB oracle replays it).

    Scale shape: the within-shard window partitions by ``shard``
    (parallel, no global sort barrier); at the petabyte tier you skip
    materializing positions entirely and land the order physically via
    ``write_dataset(partition_by=shard, cluster_by=order_key)`` — the
    sort becomes the write's range shuffle and the files ARE the
    training order.
    """
    from pyspark.sql import Window

    bucket = hash_bucket(key_col, salt)
    staged = df.select(F.col(key_col), bucket.alias("order_key")).withColumn(
        "shard",
        (
            F.expr("instr('0123456789abcdef', substring(order_key, 1, 1))") - 1
        ).cast("int"),
    )
    w = Window.partitionBy("shard").orderBy("order_key", key_col)
    return staged.select(
        key_col,
        "shard",
        "order_key",
        F.row_number().over(w).alias("position"),
    )


def temperature_mix_report(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    alpha: float = 0.5,
    target_total: int = 100,
    salt: str = "tmix",
) -> DataFrame:
    """α-temperature source mixing (the multilingual/source-balancing
    recipe): stratum ``s`` gets sampling weight ``w_s = n_s^α / Σ
    n_t^α``, flattening the natural distribution toward uniform as
    α→0 — low-resource strata are upsampled relative to their share.
    The per-stratum rate ``min(1, target_total·w_s / n_s)`` is then
    applied with the same deterministic hash-mod membership as every
    sampler here, so the realized sample is a pure function of
    (salt, key, α, target) — stable across engines and partitionings.

    Plan: one tiny per-stratum count (map-side combined), a scalar
    normalizer broadcast by cross-join, the rate table broadcast back
    onto the corpus, one filtered count — the corpus is scanned twice
    and never shuffled on anything but the stratum key. The rate →
    hex-threshold conversion happens IN the plan (floor to the 2³²
    bucket space), rounded to 6 digits first so the DuckDB oracle
    reproduces the cut bit-for-bit.

    Output per stratum: ``n_rows``, ``weight``, ``sample_rate``,
    ``n_sampled``.
    """
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_rows"))
    z = counts.agg(
        F.sum(F.pow(F.col("n_rows").cast("double"), F.lit(alpha))).alias("z")
    )
    rates = (
        counts.crossJoin(F.broadcast(z))
        .select(
            strata_col,
            "n_rows",
            F.round(
                F.pow(F.col("n_rows").cast("double"), F.lit(alpha))
                / F.col("z"),
                6,
            ).alias("weight"),
        )
        .withColumn(
            "sample_rate",
            F.round(
                F.least(
                    F.lit(1.0),
                    F.lit(float(target_total))
                    * F.col("weight")
                    / F.col("n_rows"),
                ),
                6,
            ),
        )
        .withColumn(
            "th",
            F.when(F.col("sample_rate") >= 1.0, F.lit("g")).otherwise(
                F.lower(
                    F.lpad(
                        F.hex(
                            F.floor(
                                F.col("sample_rate") * F.lit(float(_HEX_SPACE))
                            ).cast("bigint")
                        ),
                        _HEX_WIDTH,
                        "0",
                    )
                )
            ),
        )
    )
    sampled = (
        df.join(F.broadcast(rates.select(strata_col, "th")), strata_col)
        .filter(hash_bucket(key_col, salt) < F.col("th"))
        .groupBy(strata_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_sampled"))
    )
    return (
        rates.join(sampled, strata_col, "left")
        .select(
            strata_col,
            "n_rows",
            "weight",
            "sample_rate",
            F.coalesce("n_sampled", F.lit(0).cast("long")).alias("n_sampled"),
        )
    )


def weighted_sample_score(
    key: Column | str, weight: Column | str, salt: str = "wsample"
) -> Column:
    """Efraimidis–Spirakis (A-RES) weighted-sampling score: rank rows
    by ``u^(1/w)`` descending — the top-k by that score is a weighted
    random sample WITHOUT replacement. Ranked here by the monotone
    equivalent ``ln(u)/w`` (same ordering for u ∈ (0,1], one libm
    call instead of a nested pow).

    ``u`` is the row's deterministic md5 uniform ((hex8+1)/2³² ∈
    (0,1], so ln is always finite) — the same engine-portable
    hash-digit construction as every sampler here: the draw is a pure
    function of (salt, key), replayable by the DuckDB oracle and
    stable under partitioning. Per-row map; pair with a global or
    per-stratum top-k (TakeOrdered — no single-task window needed).
    """
    from .classifier import _hex_val

    k = F.col(key) if isinstance(key, str) else key
    w = F.col(weight) if isinstance(weight, str) else weight
    h = F.md5(F.concat_ws("|", F.lit(salt), k.cast("string")))
    # long arithmetic: digit * 16^7 overflows int32 under ANSI mode
    hex8 = sum(
        _hex_val(h, i + 1).cast("long") * F.lit(16 ** (7 - i)).cast("long")
        for i in range(8)
    )
    u = (hex8.cast("double") + 1.0) / F.lit(float(16**8))
    return F.log(u) / w.cast("double")


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "mix",
) -> DataFrame:
    """Per-stratum fractions (source/language mixing): each stratum
    gets its own threshold; strata absent from ``fractions`` default to
    ``default_fraction``. One when-chain, still a per-row map."""
    th: Column = F.lit(hex_threshold(default_fraction))
    for value, frac in sorted(fractions.items()):
        th = F.when(
            F.col(strata_col) == value, F.lit(hex_threshold(frac))
        ).otherwise(th)
    return df.filter(hash_bucket(key_col, salt) < th)
