"""Shared fixtures: one local SparkSession per test session.

Small shuffle-partition count keeps local runs fast; the engine's
session factory is the same one a cluster submit would configure up.
"""

from __future__ import annotations

import os

import pytest

from sales_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", SF_DIR)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="sales_data_pipeline_spark-tests",
        master="local[4]",
        shuffle_partitions=8,
    )
    s.sparkContext.setLogLevel("WARN")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
