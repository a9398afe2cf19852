"""Training-corpus curation queries: repetition quality signals,
PII audit (count + scrub), and benchmark decontamination.

These wrap ``operators/curation.py`` over the documents testdata.
The synthetic corpus contains no PII-shaped strings, so the PII query
deterministically injects them (same expression in the Spark plan and
the oracle SQL) — the oracle then genuinely checks the count and
replacement semantics instead of hashing an identity transform.

The regex patterns in the oracle SQL are the SAME Python strings as
the Spark plan (``PII_PATTERNS`` is spliced into the SQL text), so
the two engines can never drift apart on the pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import curation
from ..operators.curation import PII_PATTERNS


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --- repetition quality signals ------------------------------------------


def doc_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style per-document repetition signals (duplicate word /
    3-gram fraction, top-2-gram mass)."""
    return curation.repetition_signals(_docs(spark, sf_dir))


DOC_REPETITION_SQL = """
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
base AS (
  SELECT doc_id,
    ROUND(CASE WHEN len(toks) <= 0 THEN 0.0
          ELSE 1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
          END, 6) AS dup_word_frac,
    list_transform(range(1, GREATEST(len(toks) - 2, 0) + 1),
                   i -> array_to_string(list_slice(toks, i, i + 2), ' ')) AS g3,
    list_transform(range(1, GREATEST(len(toks) - 1, 0) + 1),
                   i -> array_to_string(list_slice(toks, i, i + 1), ' ')) AS g2
  FROM t
),
b2 AS (
  SELECT doc_id, dup_word_frac,
    ROUND(CASE WHEN len(g3) <= 0 THEN 0.0
          ELSE 1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3)
          END, 6) AS dup_3gram_frac,
    g2
  FROM base
),
cnt AS (
  SELECT doc_id, gram, COUNT(*) AS n
  FROM (SELECT doc_id, unnest(g2) AS gram FROM b2)
  GROUP BY 1, 2
),
top AS (
  SELECT doc_id, ROUND(CAST(MAX(n) AS DOUBLE) / SUM(n), 6) AS top_2gram_frac
  FROM cnt GROUP BY 1
)
SELECT b2.doc_id, dup_word_frac, dup_3gram_frac,
       COALESCE(top_2gram_frac, 0.0) AS top_2gram_frac
FROM b2 LEFT JOIN top USING (doc_id)
ORDER BY doc_id
"""


# --- PII audit ------------------------------------------------------------

# Deterministic PII injection: every 7th doc gets an appended tail
# with one of each PII shape, parameterized by doc_id so no two tails
# collide into identical strings.
def _inject_tail_spark():
    # built lazily: Column construction needs an active SparkContext
    return [
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com ssn 123-45-6789 tel 555-867-5309 host 10.0.0."),
        (F.col("doc_id") % 200).cast("string"),
    ]


_INJECT_TAIL_SQL = (
    "' contact user' || CAST(doc_id AS VARCHAR) || "
    "'@example.com ssn 123-45-6789 tel 555-867-5309 host 10.0.0.' || "
    "CAST(doc_id % 200 AS VARCHAR)"
)


def doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII audit over the (injected) corpus: per-pattern match counts
    on the raw text plus the fully scrubbed text. Single scan, pure
    per-row regex chain (JVM codegen) — no shuffle."""
    docs = _docs(spark, sf_dir)
    injected = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), *_inject_tail_spark()),
        ).otherwise(F.col("text")),
    )
    return injected.select(
        "doc_id",
        *curation.pii_count_cols("text"),
        curation.pii_scrub_col("text").alias("scrubbed"),
    )


def _pii_sql() -> str:
    counts = ",\n  ".join(
        "CAST(len(regexp_extract_all(text, '%PAT_{0}%')) AS BIGINT) AS n_{0}".format(
            name
        )
        for name in PII_PATTERNS
    )
    scrub = "text"
    for name in PII_PATTERNS:
        scrub = "regexp_replace({0}, '%PAT_{1}%', '<{2}>', 'g')".format(
            scrub, name, name.upper()
        )
    sql = """
WITH injected AS (
  SELECT doc_id,
    CASE WHEN doc_id % 7 = 0 THEN text || {tail} ELSE text END AS text
  FROM documents
)
SELECT doc_id,
  {counts},
  {scrub} AS scrubbed
FROM injected
ORDER BY doc_id
""".format(tail=_INJECT_TAIL_SQL, counts=counts, scrub=scrub)
    for name, pat in PII_PATTERNS.items():
        sql = sql.replace(f"%PAT_{name}%", pat)
    return sql


DOC_PII_SCRUB_SQL = _pii_sql()


# --- benchmark decontamination -------------------------------------------


def doc_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc count of distinct 8-gram overlaps with a (synthetic)
    eval-benchmark subset — every 25th doc stands in for the
    benchmark. The eval n-gram set is broadcast; the corpus never
    shuffles on the join."""
    docs = _docs(spark, sf_dir)
    eval_docs = docs.filter(F.col("doc_id") % 25 == 0)
    return curation.decontaminate(docs, eval_docs, n=8)


DOC_DECONTAMINATION_SQL = """
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
g AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
  FROM t, UNNEST(range(1, GREATEST(len(toks) - 7, 0) + 1)) AS u(i)
),
ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 25 = 0)
SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlapping_ngrams
FROM g JOIN ev USING (gram)
GROUP BY g.doc_id
ORDER BY doc_id
"""


QUERIES = {
    "doc_repetition_signals": doc_repetition_signals,
    "doc_pii_scrub": doc_pii_scrub,
    "doc_decontamination": doc_decontamination,
}

ORACLE = {
    "doc_repetition_signals": DOC_REPETITION_SQL,
    "doc_pii_scrub": DOC_PII_SCRUB_SQL,
    "doc_decontamination": DOC_DECONTAMINATION_SQL,
}
