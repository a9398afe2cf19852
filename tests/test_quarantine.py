"""Row-level corrupt-record quarantine over a malformed CSV fixture —
the reference's misaligned songs.csv anomaly (reference glue_job.py:83,
SURVEY.md §1.3) handled at the read boundary instead of patched
downstream."""

from __future__ import annotations

from pyspark.sql import types as T

from etl_with_s3__dynamodb_and_glue_spark.sources.readers import (
    read_csv_quarantine,
    split_quarantine,
)

SCHEMA = T.StructType(
    [
        T.StructField("track_id", T.StringType()),
        T.StructField("track_name", T.StringType()),
        T.StructField("popularity", T.LongType()),
    ]
)

FIXTURE = """track_id,track_name,popularity
t1,Song One,90
t2,Song Two,81
t3,Misaligned Row,not_a_number
t4,Song Four,55
t5,Another Bad One,12.5x
"""


def _write_fixture(tmp_path):
    p = tmp_path / "songs.csv"
    p.write_text(FIXTURE)
    return str(p)


def test_quarantine_splits_clean_from_malformed(spark, tmp_path):
    df = read_csv_quarantine(spark, _write_fixture(tmp_path), SCHEMA)
    clean, quarantined = split_quarantine(df)

    assert clean.count() == 3
    assert quarantined.count() == 2
    # clean side drops the corrupt column and keeps typed values
    assert clean.columns == ["track_id", "track_name", "popularity"]
    assert {r.track_id for r in clean.collect()} == {"t1", "t2", "t4"}
    # quarantined side preserves the raw line for forensics
    raw = {r["_corrupt_record"] for r in quarantined.collect()}
    assert raw == {
        "t3,Misaligned Row,not_a_number",
        "t5,Another Bad One,12.5x",
    }


def test_derived_corrupt_only_plan_survives_cache_release(spark, tmp_path):
    """A corrupt-column-only projection derived from the quarantined
    half must execute even after both returned halves are dropped and
    the shared cache released (the CSV file source forbids that plan on
    a cold scan; the from_csv read path must not)."""
    import gc

    df = read_csv_quarantine(spark, _write_fixture(tmp_path), SCHEMA)
    clean, quarantined = split_quarantine(df)
    raw_only = quarantined.select("_corrupt_record")
    del clean, quarantined, df
    gc.collect()  # finalizer unpersists the shared cache
    assert {r["_corrupt_record"] for r in raw_only.collect()} == {
        "t3,Misaligned Row,not_a_number",
        "t5,Another Bad One,12.5x",
    }


def test_quarantine_clean_file_has_empty_quarantine(spark, tmp_path):
    p = tmp_path / "ok.csv"
    p.write_text("track_id,track_name,popularity\nt1,A,1\nt2,B,2\n")
    clean, quarantined = split_quarantine(read_csv_quarantine(spark, str(p), SCHEMA))
    assert clean.count() == 2
    assert quarantined.count() == 0


def test_read_parquet_evolving_across_schema_generations(spark, tmp_path):
    """Files written before a column existed read back with NULLs for
    it; mergeSchema unions footers when no schema is pinned."""
    from pyspark.sql import types as T

    from etl_with_s3__dynamodb_and_glue_spark.sources.readers import (
        read_parquet_evolving,
    )

    out = tmp_path / "evolving"
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(
        str(out / "gen1")
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.parquet(str(out / "gen2"))

    pinned = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    got = {
        (r.id, r.name, r.score)
        for r in read_parquet_evolving(
            spark, f"{out}/gen*", schema=pinned
        ).collect()
    }
    assert got == {(1, "a", None), (2, "b", 9.5)}

    merged = read_parquet_evolving(spark, f"{out}/gen*")
    assert set(merged.columns) == {"id", "name", "score"}
    assert merged.count() == 2
