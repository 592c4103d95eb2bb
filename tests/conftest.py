from __future__ import annotations

import os

import pytest

# Small local parallelism for test speed; the engine itself defaults to
# $SPARK_GRAFT_CPUS.
os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from pypgsync_spark.session import get_spark

    s = get_spark(app_name="pypgsync_spark_tests", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_small() -> str:
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_oracle() -> str:
    return SF_ORACLE
