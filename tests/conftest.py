"""Shared Spark fixture for the operator test suite (SURVEY.md §5).

One tuned session for the whole run (JVM startup dominates otherwise);
small shuffle-partition count because every fixture table here is tiny.
"""

from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")


@pytest.fixture(scope="session")
def spark():
    from bi_etl_and_integration_spark import get_session
    s = get_session("tests", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture()
def rows(spark):
    """df([(..), ..], "a int, b string") shorthand."""
    def make(data, schema):
        return spark.createDataFrame(data, schema)
    return make
