from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from etl_with_s3__dynamodb_and_glue_spark import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest")
    yield s
