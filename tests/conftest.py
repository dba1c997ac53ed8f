from __future__ import annotations

import os

import pytest

SF_SMALL = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_SF_ORACLE", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from lagoon_spark.session import get_spark

    s = get_spark("lagoon_spark_tests", cpus="8")
    yield s


@pytest.fixture()
def lagoon(spark, tmp_path):
    from lagoon_spark.engine import Lagoon

    lg = Lagoon(spark, str(tmp_path / "warehouse"), user="tester")
    lg.init_db()
    return lg


@pytest.fixture(scope="session")
def sf_small() -> str:
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_oracle() -> str:
    return SF_ORACLE
