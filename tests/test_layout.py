"""Partitioned-layout proofs: pruning reaches the scan, content
roundtrips, partition types recover."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lagoon_spark.operators import layout
from lagoon_spark.session import register_views


def test_partition_pruning_reaches_scan(spark, sf_small, tmp_path):
    register_views(spark, sf_small)
    ev = spark.table("events")
    path = os.path.join(str(tmp_path), "ev_by_type")
    layout.write_partitioned(ev, path, ["event_type"], sort_within=["ts"])

    back = layout.read_partitioned(spark, path)
    pruned = back.filter(F.col("event_type") == "purchase")
    filters = layout.scan_partition_filters(pruned)
    assert "event_type" in filters and "purchase" in filters

    # pruning must touch only the one directory
    dirs = [d for d in os.listdir(path) if d.startswith("event_type=")]
    assert len(dirs) == 5
    # content equality vs the unpartitioned filter
    want = sorted(
        tuple(r)
        for r in ev.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "value")
        .collect()
    )
    got = sorted(
        tuple(r) for r in pruned.select("event_id", "user_id", "value").collect()
    )
    assert got == want


def test_partition_column_type_recovered(spark, sf_small, tmp_path):
    register_views(spark, sf_small)
    ev = spark.table("events").withColumn("day", F.col("ts").cast("date"))
    path = os.path.join(str(tmp_path), "ev_by_day")
    layout.write_partitioned(ev, path, ["day"])
    back = layout.read_partitioned(spark, path)
    assert dict(back.dtypes)["day"] == "date"
    # range predicate on the partition column prunes too
    pruned = back.filter(F.col("day") >= "2024-01-15")
    assert "day" in layout.scan_partition_filters(pruned)
    assert pruned.count() == ev.filter(F.col("day") >= "2024-01-15").count()


def test_sort_within_tightens_rowgroups(spark, sf_small, tmp_path):
    register_views(spark, sf_small)
    ev = spark.table("events")
    path = os.path.join(str(tmp_path), "ev_sorted")
    layout.write_partitioned(ev, path, ["event_type"], sort_within=["user_id"])
    back = layout.read_partitioned(spark, path)
    # pushed predicate on the sorted column appears in the scan
    plan = (
        back.filter((F.col("event_type") == "click") & (F.col("user_id") == 3))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "user_id" in plan.split("PushedFilters", 1)[1][:200]
