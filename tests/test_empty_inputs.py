"""Empty-input robustness: a representative slice of the query surface
must run (returning zero rows, not raising) when every table is empty.
Real pipelines hit empty partitions constantly — a backfill day with
no data, a filtered source, a new tenant."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_SMOKE

# representative lineages: flagship star join, KPI agg, text analysis,
# exact + LSH dedup, connected components (zero edges AND zero
# vertices), ANN, sessionization, merge family, retrieval, profiling,
# funnel
SUBSET = [
    "flagship_daily_segment_topk",
    "segment_kpis_compat",
    "doc_token_stats",
    "doc_exact_dedup",
    "doc_minhash_near_dups",
    "doc_dedup_final",
    "embedding_topk_bruteforce",
    "user_sessions",
    "customer_scd1_merge",
    "customer_cdc_apply",
    "doc_bm25_topk",
    "doc_lm_score",
    "doc_boilerplate_fraction",
    "orders_profile",
    "user_conversion_funnel",
    "event_key_skew_profile",
    "orders_price_histogram",
]


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    """Zero-row copies of every table, schemas preserved."""
    out = tmp_path_factory.mktemp("sf_empty")
    tables = (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split()
    for t in tables:
        df = spark.read.parquet(f"{SF_SMOKE}/{t}.parquet")
        df.limit(0).coalesce(1).write.mode("overwrite").parquet(
            str(out / f"{t}.parquet")
        )
    return str(out)


@pytest.mark.parametrize("name", SUBSET)
def test_query_survives_empty_tables(spark, empty_sf_dir, name):
    fn = entry_mod.queries()[name]
    rows = fn(spark, empty_sf_dir).collect()
    assert rows == [] or all(r is not None for r in rows)
