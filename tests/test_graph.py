"""PageRank operator invariants (beyond the d35 oracle gate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lagoon_spark.operators.graph import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_pagerank_mass_conserved_and_dangling_handled(spark):
    # a -> b -> c, c dangling; d isolated-ish (only outlink to a)
    e = _edges(spark, [("a", "b"), ("b", "c"), ("d", "a"), ("a", "b")])
    pr = {r["node"]: r["pagerank"] for r in pagerank(e, "src", "dst", iters=4).collect()}
    assert set(pr) == {"a", "b", "c", "d"}
    # total mass stays 1 (dangling mass redistributed, not lost)
    assert abs(sum(pr.values()) - 1.0) < 1e-6
    # b receives all of a's rank (its only outlink target, doubled edge
    # collapses to weight 1) -> b outranks the unlinked-to d
    assert pr["b"] > pr["d"] and pr["c"] > pr["d"]


def test_pagerank_uniform_cycle_is_uniform(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    pr = [r["pagerank"] for r in pagerank(e, "src", "dst", iters=6).collect()]
    assert max(pr) - min(pr) < 1e-9  # symmetric graph -> equal ranks


def test_pagerank_weights_follow_multiplicity(spark):
    # a links twice to b, once to c -> b gets 2/3 of a's rank share
    e = _edges(spark, [("a", "b"), ("a", "b"), ("a", "c")])
    pr = {r["node"]: r["pagerank"] for r in pagerank(e, "src", "dst", iters=3).collect()}
    assert pr["b"] > pr["c"]
