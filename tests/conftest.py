from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_MID = os.environ.get("SPARK_GRAFT_TEST_SF_DIR_MID", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from hello_flink_spark.session import get_spark

    spark = get_spark("hello-flink-spark-tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def sf_dir_mid() -> str:
    return SF_DIR_MID
