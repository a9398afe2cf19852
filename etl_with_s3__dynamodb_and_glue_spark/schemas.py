"""Explicit schema registry.

The reference reads CSVs with ``header=True`` and NO schema, so every
column arrives as a string (reference glue_job.py:51-53), then casts by
hand. At 100 TB, schema inference is a full extra pass over the data —
we declare every schema up front instead (SURVEY.md §1.2).

Two families:

1. Music-domain tables (the reference's own data model, SURVEY.md §1.3)
   — used by the KPI pipeline and its fixtures.
2. The driver's star-schema testdata (/root/testdata/sf*/,
   TESTDATA.md) — used by the declared query inventory.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- music domain (reference data model) -------------------------------

# users.csv: user_id,user_name,user_age,user_country,created_at
# (reference data/users/users.csv:1). Required subset: {user_id, user_name}
# (reference dag.py:53).
USERS = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("user_name", T.StringType()),
        T.StructField("user_age", T.IntegerType()),
        T.StructField("user_country", T.StringType()),
        T.StructField("created_at", T.DateType()),
    ]
)

# songs.csv required subset {track_id, track_name, track_genre}
# (reference dag.py:54); job projects exactly these three
# (reference glue_job.py:52). Extra columns permitted and ignored.
SONGS = T.StructType(
    [
        T.StructField("track_id", T.StringType()),
        T.StructField("track_name", T.StringType()),
        T.StructField("track_genre", T.StringType()),
        T.StructField("artists", T.StringType()),
        T.StructField("popularity", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

# streams*.csv: user_id,track_id,listen_time — all required
# (reference dag.py:55, data/streams/streams1.csv:1). listen_time is a
# 'yyyy-MM-dd HH:mm:ss' string in the raw CSV; we type it explicitly
# (SURVEY.md F7 makes the reference's implicit coercion explicit).
STREAMS = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("track_id", T.StringType()),
        T.StructField("listen_time", T.TimestampType()),
    ]
)

# Raw (strings-in) variants, matching exactly what a schemaless CSV read
# produces — used by the validation gate which must accept raw files.
STREAMS_RAW = T.StructType(
    [
        T.StructField("user_id", T.StringType()),
        T.StructField("track_id", T.StringType()),
        T.StructField("listen_time", T.StringType()),
    ]
)

# Required-column contracts (reference dag.py:52-56): subset semantics,
# extra columns allowed.
REQUIRED_COLUMNS = {
    "users": {"user_id", "user_name"},
    "songs": {"track_id", "track_name", "track_genre"},
    "streams": {"track_id", "user_id", "listen_time"},
}

# --- KPI output schemas (reference glue_job.py:86-100) ------------------

GENRE_KPIS = T.StructType(
    [
        T.StructField("date", T.StringType()),
        T.StructField("track_genre", T.StringType()),
        T.StructField("listen_count", T.LongType()),
        T.StructField("unique_listeners", T.LongType()),
        T.StructField("total_listening_time", T.LongType()),
        T.StructField("avg_listening_time", T.DoubleType()),
    ]
)

TOP_SONGS = T.StructType(
    [
        T.StructField("date", T.StringType()),
        T.StructField("track_genre", T.StringType()),
        T.StructField("track_id", T.StringType()),
        T.StructField("track_name", T.StringType()),
        T.StructField("listen_count", T.LongType()),
        T.StructField("rank", T.IntegerType()),
    ]
)

# --- driver star-schema testdata (TESTDATA.md) ---------------------------

STAR_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)
