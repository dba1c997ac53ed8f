"""Bucketed tables must give exchange-free co-located joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lagoon_spark.operators import bucketing
from lagoon_spark.session import register_views


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_small):
    # managed tables land in the session warehouse dir (static conf);
    # dropped on teardown
    register_views(spark, sf_small)
    bucketing.write_bucketed(
        spark.table("orders").select("o_orderkey", "o_totalprice"),
        "orders_b",
        ["o_orderkey"],
        num_buckets=8,
    )
    bucketing.write_bucketed(
        spark.table("lineitem").select("l_orderkey", "l_quantity").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        ),
        "lineitem_b",
        ["o_orderkey"],
        num_buckets=8,
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, sf_small, bucketed_tables):
    left, right = bucketed_tables
    joined = bucketing.bucketed_join(spark, left, right, ["o_orderkey"])
    # disable broadcast so the bucket layout, not a broadcast, must
    # carry the join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
    assert "Exchange" not in plan, plan[:2000]


def test_bucketed_join_is_correct(spark, sf_small, bucketed_tables):
    left, right = bucketed_tables
    register_views(spark, sf_small)
    got = bucketing.bucketed_join(spark, left, right, ["o_orderkey"]).count()
    expect = (
        spark.table("lineitem")
        .join(
            spark.table("orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert got == expect
