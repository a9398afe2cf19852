"""Oracle type-parity gate: no DuckDB result column may be wider than
the Spark column it is compared against.

The driver's value hash is type-sensitive, while the local replica
(tests/oracle_harness.py) stringifies values — so a DuckDB HUGEINT
(int128, from SUM(BIGINT) or BIGINT*BIGINT) or an unexpected DECIMAL
passes locally but hash-reds under the driver. This happened twice in
round 5 (daily_new_users_cumulative, doc_length_buckets) and once in
round 4 (array hashing). This test walks EVERY declared oracle, binds
the SQL in DuckDB (plan-only, no execution), and asserts each output
column's DuckDB type is in the allowed set for the Spark dtype.

Fails if the CAST(... AS BIGINT) fixes are reverted.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_harness import duck_connection

import __spark_entry__ as entry_mod

# spark simpleString dtype -> allowed DuckDB type names (upper-case).
_ALLOWED = {
    "bigint": {"BIGINT"},
    "int": {"INTEGER"},
    "smallint": {"SMALLINT"},
    "tinyint": {"TINYINT"},
    "double": {"DOUBLE"},
    "float": {"FLOAT"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "date": {"DATE"},
    "timestamp": {"TIMESTAMP", "TIMESTAMP WITH TIME ZONE"},
    "binary": {"BLOB"},
}


def _check_type(spark_dtype: str, duck_type: str) -> bool:
    duck_type = duck_type.upper()
    if spark_dtype.startswith("array<"):
        inner = spark_dtype[len("array<") : -1]
        if duck_type.endswith("[]"):
            return _check_type(inner, duck_type[:-2])
        return False
    if spark_dtype.startswith("struct<") or spark_dtype.startswith("map<"):
        # nested records: the harness stringifies field-by-field; only
        # reject the known-widening scalar types anywhere in the name
        return "HUGEINT" not in duck_type
    if spark_dtype.startswith("decimal"):
        return duck_type.startswith("DECIMAL")
    allowed = _ALLOWED.get(spark_dtype)
    if allowed is None:  # unmapped dtype: only reject int128 widening
        return "HUGEINT" not in duck_type
    return duck_type in allowed


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_SMOKE)
    yield con
    con.close()


def _oracle_items():
    oracles = entry_mod.oracle_sql()
    return sorted(oracles.items())


@pytest.mark.parametrize(
    "name,sql", _oracle_items(), ids=[n for n, _ in _oracle_items()]
)
def test_oracle_columns_not_widened(name, sql, duck, spark):
    queries = entry_mod.queries()
    assert name in queries, f"oracle {name} has no matching queries() entry"
    sdf = queries[name](spark, SF_SMOKE)
    spark_types = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}

    rel = duck.sql(sql)  # binds + plans only; no execution
    duck_types = dict(zip(rel.columns, (str(t) for t in rel.types)))

    assert sorted(spark_types) == sorted(duck_types), (
        f"{name}: column sets differ: spark={sorted(spark_types)} "
        f"duck={sorted(duck_types)}"
    )
    bad = []
    for col, sd in spark_types.items():
        dd = duck_types[col]
        if not _check_type(sd, dd):
            bad.append((col, sd, dd))
    assert not bad, (
        f"{name}: oracle column type wider/different than Spark "
        f"(col, spark, duckdb): {bad} — add an explicit CAST in the "
        f"oracle SQL (HUGEINT from SUM/product of BIGINT is the usual "
        f"culprit)"
    )
