"""Music-pipeline parity tests: fixture-driven, DuckDB-cross-checked,
plus property and negative tests for the validation gates."""

from __future__ import annotations

import duckdb
import pytest

from etl_with_s3__dynamodb_and_glue_spark.plans import music_pipeline as mp
from etl_with_s3__dynamodb_and_glue_spark.sources.validation import ValidationError
from tests.fixtures_gen import generate
from tests.oracle_harness import canonical


@pytest.fixture(scope="module")
def fixture_paths(tmp_path_factory):
    return generate(tmp_path_factory.mktemp("music"))


@pytest.fixture(scope="module")
def result(spark, fixture_paths):
    res = mp.run_pipeline(
        spark,
        users_path=fixture_paths["users"],
        songs_path=fixture_paths["songs"],
        streams_path=fixture_paths["streams"],
    )
    yield res
    mp.unpersist_all(res)


def _duck_base_sql(paths) -> str:
    """The pipeline's cleaning + enrichment, in DuckDB SQL. Empty CSV
    fields arrive as NULL in Spark but '' for VARCHAR in DuckDB —
    NULLIF normalizes."""
    return f"""
WITH streams AS (
  SELECT CAST(NULLIF(user_id,'') AS BIGINT) AS user_id,
         NULLIF(track_id,'') AS track_id,
         CAST(NULLIF(listen_time,'') AS TIMESTAMP) AS listen_time
  FROM read_csv('{paths["streams"]}/*.csv', header=true, all_varchar=true)
),
songs_clean AS (
  SELECT track_id, track_name, track_genre FROM (
    SELECT NULLIF(track_id,'') AS track_id, NULLIF(track_name,'') AS track_name,
           NULLIF(track_genre,'') AS track_genre,
           ROW_NUMBER() OVER (PARTITION BY NULLIF(track_id,'')
                              ORDER BY NULLIF(track_name,''), NULLIF(track_genre,'')) AS rn
    FROM read_csv('{paths["songs"]}', header=true, all_varchar=true)
    WHERE NULLIF(track_id,'') IS NOT NULL
      AND NULLIF(track_name,'') IS NOT NULL
      AND NULLIF(track_genre,'') IS NOT NULL
  ) WHERE rn = 1
),
enriched AS (
  SELECT strftime(s.listen_time, '%Y-%m-%d') AS date,
         g.track_genre, s.track_id, g.track_name, s.user_id,
         CAST(hour(s.listen_time)*3600 + minute(s.listen_time)*60
              + CAST(second(s.listen_time) AS BIGINT) AS BIGINT) AS listen_time_seconds
  FROM streams s LEFT JOIN songs_clean g ON s.track_id = g.track_id
  WHERE s.track_id IS NOT NULL AND s.user_id IS NOT NULL AND s.listen_time IS NOT NULL
),
filtered AS (
  SELECT * FROM enriched
  WHERE NOT regexp_matches(track_genre, '^[0-9]+(\\.[0-9]+)?$')
),
counts AS (
  SELECT date, track_genre, track_id, track_name, COUNT(track_id) AS listen_count
  FROM filtered GROUP BY ALL
)
"""


def _check(sdf, sql):
    con = duckdb.connect()
    cur = con.execute(sql)
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    srows = sdf.collect()
    assert sorted(sdf.columns) == sorted(dcols)
    assert canonical(srows, sdf.columns) == canonical(drows, dcols)


def test_genre_kpis_matches_duckdb(result, fixture_paths):
    _check(
        result.genre_kpis,
        _duck_base_sql(fixture_paths)
        + """
SELECT date, track_genre,
       COUNT(*) AS listen_count,
       COUNT(user_id) AS unique_listeners,
       SUM(listen_time_seconds) AS total_listening_time,
       CAST(SUM(listen_time_seconds) AS DOUBLE)/COUNT(*) AS avg_listening_time
FROM filtered GROUP BY date, track_genre
""",
    )


def test_top_songs_matches_duckdb(result, fixture_paths):
    _check(
        result.top_songs,
        _duck_base_sql(fixture_paths)
        + """
SELECT * FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY date, track_genre
             ORDER BY listen_count DESC, track_id) AS INTEGER) AS rank
  FROM counts
) WHERE rank <= 3
""",
    )


def test_top_genres_compat_matches_duckdb(result, fixture_paths):
    _check(
        result.top_genres,
        _duck_base_sql(fixture_paths)
        + """
SELECT * FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY date
             ORDER BY listen_count DESC, track_id) AS INTEGER) AS rank
  FROM counts
) WHERE rank <= 5
""",
    )


def test_q2_compat_semantics(result):
    """Reference-faithful: unique_listeners == listen_count because
    count(user_id) over non-null user_ids equals count(*)."""
    rows = result.genre_kpis.collect()
    assert rows
    assert all(r.listen_count == r.unique_listeners for r in rows)


def test_q2_intended_semantics(result):
    rows = result.extras["genre_kpis_distinct"].collect()
    assert any(r.unique_listeners < r.listen_count for r in rows)


def test_q3_shapes(result):
    """Compat top_genres carries song columns (quirk Q3); intended
    variant is genre-grained."""
    assert "track_id" in result.top_genres.columns
    intended = result.extras["top_genres_intended"]
    assert "track_id" not in intended.columns
    per_day = intended.groupBy("date").count().collect()
    assert all(r["count"] <= 5 for r in per_day)


def test_rank_bounds_and_no_numeric_genres(result):
    assert result.top_songs.filter("rank > 3 OR rank < 1").count() == 0
    assert result.top_genres.filter("rank > 5").count() == 0
    assert (
        result.genre_kpis.filter("track_genre rlike '^[0-9]+(\\\\.[0-9]+)?$'").count()
        == 0
    )
    assert result.genre_kpis.filter("track_genre IS NULL").count() == 0


def test_shared_lineage_is_persisted(result):
    assert result.extras["enriched"].is_cached
    assert result.extras["song_counts"].is_cached


def test_missing_required_column_raises(spark, fixture_paths, tmp_path):
    bad = tmp_path / "bad.csv"
    bad.write_text("user_id,listen_time\n1,2024-06-25 10:00:00\n")
    with pytest.raises(ValidationError, match="track_id"):
        mp.run_pipeline(
            spark,
            users_path=fixture_paths["users"],
            songs_path=fixture_paths["songs"],
            streams_path=str(bad),
        )


def test_empty_streams_raises(spark, fixture_paths, tmp_path):
    empty_dir = tmp_path / "streams_empty"
    empty_dir.mkdir()
    (empty_dir / "streams1.csv").write_text("user_id,track_id,listen_time\n")
    with pytest.raises(ValidationError, match="empty"):
        mp.run_pipeline(
            spark,
            users_path=fixture_paths["users"],
            songs_path=fixture_paths["songs"],
            streams_path=str(empty_dir),
        )
