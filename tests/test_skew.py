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


def test_capped_per_key_matches_single_window(spark):
    from pyspark.sql import Window

    # hot key: 5k rows on one domain, tail of small domains
    df = spark.range(6_000).select(
        F.col("id"),
        F.when(F.col("id") % 6 < 5, F.lit("hot")).otherwise(
            F.concat(F.lit("d"), (F.col("id") % 13).cast("string"))
        ).alias("k"),
        (F.col("id") * 37 % 1009).alias("score"),
    )
    order = [F.col("score").desc(), F.col("id").asc()]
    got = {
        (r["k"], r["id"], r["rank"])
        for r in skew.capped_per_key(
            df, "k", order, 7, salt=F.col("id"), salt_buckets=8
        ).collect()
    }
    w = Window.partitionBy("k").orderBy(*order)
    want = {
        (r["k"], r["id"], r["rank"])
        for r in df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 7)
        .collect()
    }
    assert got == want and len(want) > 7


def test_capped_per_key_phase1_prunes_before_global_rank(spark):
    # the plan must carry TWO window nodes, the first partitioned on
    # (key, salt) with a filter between them — i.e. the hot key is
    # cut to <= buckets*n rows before any per-key global sort
    df = spark.range(100).select(
        F.col("id"), F.lit("hot").alias("k"), (F.col("id") % 7).alias("s")
    )
    capped = skew.capped_per_key(
        df, "k", [F.col("s").asc(), F.col("id").asc()], 3, salt=F.col("id")
    )
    plan = capped._jdf.queryExecution().optimizedPlan().toString()
    first_window = plan.rindex("Window")  # bottom-most = phase 1
    assert "__salt" in plan[first_window:]
