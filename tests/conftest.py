from __future__ import annotations

import os

import pytest

from arrowhouse_spark.session import get_spark

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # small JVM for unit tests


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="arrowhouse-tests", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
