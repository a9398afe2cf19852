"""Schema conformance and expectation gates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from etl_with_s3__dynamodb_and_glue_spark.sources.evolution import (
    SchemaDriftError,
    conform_schema,
)
from etl_with_s3__dynamodb_and_glue_spark.sources.expectations import (
    Expectation,
    ExpectationError,
    check_expectations,
    enforce,
)

TARGET = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("score", DoubleType()),
    ]
)


def test_conform_schema_rename_cast_default(spark):
    src = spark.createDataFrame(
        [("1", "a"), ("2", "b")], "ident string, name string"
    )
    out = conform_schema(
        src, TARGET, renames={"ident": "id"}, defaults={"score": 0.0}
    )
    assert out.columns == ["id", "name", "score"]
    assert dict(out.dtypes) == {"id": "bigint", "name": "string", "score": "double"}
    rows = {r.id: r for r in out.collect()}
    assert rows[1].score == 0.0 and rows[2].name == "b"


def test_conform_schema_is_loud_about_drift(spark):
    src = spark.createDataFrame([(1, "a", "x")], "id long, name string, junk string")
    with pytest.raises(SchemaDriftError, match="extra"):
        conform_schema(src, TARGET, defaults={"score": 0.0})
    out = conform_schema(src, TARGET, defaults={"score": 0.0}, allow_extra=True)
    assert out.columns == ["id", "name", "score"]
    missing = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(SchemaDriftError, match="missing"):
        conform_schema(missing, TARGET)
    with pytest.raises(SchemaDriftError, match="rename source"):
        conform_schema(missing, TARGET, renames={"nope": "name"})


def test_expectations_report_and_enforce(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (3, None)], "id long, v double"
    )
    rules = [
        Expectation("id_not_null", F.col("id").isNotNull()),
        Expectation("v_positive", F.col("v") > 0),  # -1 and NULL violate
        Expectation("v_positive_budget2", F.col("v") > 0, max_violations=2),
    ]
    report = {r.rule: r for r in check_expectations(df, rules).collect()}
    assert report["id_not_null"].passed
    assert report["v_positive"].n_violations == 2
    assert not report["v_positive"].passed
    assert report["v_positive_budget2"].passed
    with pytest.raises(ExpectationError, match="v_positive: 2 violations"):
        enforce(df, rules)
    # all-pass returns the frame unchanged for composition
    assert enforce(df, [rules[0]]) is df
