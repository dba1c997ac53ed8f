"""Driver-mirror: every registered query must hash-match its DuckDB oracle.

Runs at sf0.001 for speed in the default test loop; the driver runs the
same comparison at sf0.01. Set SPARK_GRAFT_SF_SMALL to widen.
"""

from __future__ import annotations

import pytest

from lagoon_spark.queries import registry
from lagoon_spark.verify import compare, duck_connection

QUERIES = registry()


@pytest.fixture(scope="module")
def duck(sf_small):
    con = duck_connection(sf_small)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, sf_small, name):
    res = compare(spark, duck, QUERIES[name], sf_small)
    assert res.ok, f"{name}: {res.detail} (spark={res.spark_rows}, duck={res.duck_rows})"
    if QUERIES[name].oracle is not None:
        assert res.spark_rows == res.duck_rows
