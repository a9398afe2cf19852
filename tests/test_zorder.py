"""Z-order clustering: every clustered dimension must get file-level
locality (narrow per-file min/max), unlike lexicographic clustering
where only the leading key does."""

from __future__ import annotations

import glob

from etl_with_s3__dynamodb_and_glue_spark.sources.dataset import (
    write_dataset,
    write_dataset_zorder,
)


def _per_file_spans(spark, path):
    """Average per-file (max-min) span of x and y, normalized by the
    global range."""
    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        df = spark.read.parquet(f)
        row = df.selectExpr(
            "min(x) AS xlo", "max(x) AS xhi", "min(y) AS ylo", "max(y) AS yhi"
        ).head()
        spans.append(((row.xhi - row.xlo) / 63.0, (row.yhi - row.ylo) / 63.0))
    assert len(spans) > 4, "expected several output files"
    n = len(spans)
    return sum(s[0] for s in spans) / n, sum(s[1] for s in spans) / n


def test_zorder_gives_locality_in_both_dimensions(spark, tmp_path):
    grid = spark.createDataFrame(
        [(x, y) for x in range(64) for y in range(64)], "x int, y int"
    )
    z_path = str(tmp_path / "z")
    lex_path = str(tmp_path / "lex")
    write_dataset_zorder(grid, z_path, zorder_by=("x", "y"), target_files=16)
    write_dataset(grid, lex_path, cluster_by=("x",), target_files=16)

    zx, zy = _per_file_spans(spark, z_path)
    lx, ly = _per_file_spans(spark, lex_path)

    # lexicographic: leading key narrow, second dimension spans ~all
    assert lx < 0.3, f"lex leading-key span {lx:.2f}"
    assert ly > 0.9, f"lex second-dim span {ly:.2f} unexpectedly narrow"
    # z-order: BOTH dimensions narrow
    assert zx < 0.5 and zy < 0.5, f"zorder spans x={zx:.2f} y={zy:.2f}"
    # data intact
    assert spark.read.parquet(z_path).count() == 64 * 64
    assert sorted(spark.read.parquet(z_path).columns) == ["x", "y"]
