from __future__ import annotations

import os

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from skoltexter_by_ai_spark.session import get_spark

    spark = get_spark(app_name="skoltexter-tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_ORACLE
