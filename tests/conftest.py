from __future__ import annotations

import os

import pytest

SF_SMALL = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_SF_ORACLE", "/root/testdata/sf0.01")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavyweight soak/scale lane, skipped unless "
        "SPARK_GRAFT_RUN_SLOW=1 (the default `pytest tests/` run must "
        "finish inside the driver's verify window — round-12 verdict #3)",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SPARK_GRAFT_RUN_SLOW"):
        return
    skip = pytest.mark.skip(
        reason="slow lane; set SPARK_GRAFT_RUN_SLOW=1 to run"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


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
