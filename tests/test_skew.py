"""Salted aggregation/join correctness on structurally skewed data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lagoon_spark.operators import skew


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key with 10k rows, a long tail of singletons
    hot = spark.range(10_000).select(
        F.lit("HOT").alias("k"), (F.col("id") % 97).alias("v")
    )
    tail = spark.range(500).select(
        F.concat(F.lit("t"), F.col("id")).alias("k"), F.col("id").alias("v")
    )
    return hot.unionByName(tail)


def test_salted_agg_matches_plain(skewed):
    plain = {
        (r["k"],): (r["n"], r["total"], r["lo"], r["hi"])
        for r in skewed.groupBy("k")
        .agg(
            F.count("v").alias("n"),
            F.sum("v").alias("total"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    salted = {
        (r["k"],): (r["n"], r["total"], r["lo"], r["hi"])
        for r in skew.salted_agg(
            skewed,
            ["k"],
            {
                "n": ("count", "v"),
                "total": ("sum", "v"),
                "lo": ("min", "v"),
                "hi": ("max", "v"),
            },
            salt=16,
        ).collect()
    }
    assert salted == plain


def test_salted_agg_rejects_nondecomposable(skewed):
    with pytest.raises(ValueError, match="non-decomposable"):
        skew.salted_agg(skewed, ["k"], {"m": ("median", "v")})


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("HOT", "hot-label"), ("t1", "tail-1"), ("t2", "tail-2")], "k string, label string"
    )
    plain = sorted(
        tuple(r) for r in skewed.join(dim, ["k"]).select("k", "v", "label").collect()
    )
    salted = sorted(
        tuple(r)
        for r in skew.salted_join(skewed, dim, ["k"], salt=8)
        .select("k", "v", "label")
        .collect()
    )
    assert salted == plain
    assert len(plain) == 10_000 + 2


def test_salted_left_join(spark, skewed):
    dim = spark.createDataFrame([("HOT", 1)], "k string, flag int")
    out = skew.salted_join(skewed, dim, ["k"], salt=4, how="left")
    assert out.count() == skewed.count()
    assert out.filter(F.col("flag").isNull()).count() == 500


def test_top_frequent_keys(skewed):
    hot = skew.top_frequent_keys(skewed, "k", min_count=1000).collect()
    assert [r["k"] for r in hot] == ["HOT"]
