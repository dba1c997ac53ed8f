"""Partitioned-layout proofs: pruning reaches the scan, content
roundtrips, partition types recover."""

from __future__ import annotations

import os

import pytest
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


def test_zorder_clusters_both_dimensions(spark, sf_small, tmp_path):
    # z-ordered files must be selective for point predicates on BOTH
    # columns; a single-column sort is selective only for its own
    import glob

    from lagoon_spark.operators.layout import write_zordered

    ev = spark.read.parquet(f"{sf_small}/events.parquet").select(
        "user_id", "value"
    )
    out = str(tmp_path / "zordered")
    write_zordered(ev, out, ["user_id", "value"], bits=8, num_files=16)

    files = sorted(glob.glob(out + "/part-*.parquet"))
    assert len(files) >= 8

    def overlap_fraction(col):
        import pyarrow.parquet as pq

        spans = []
        for f in files:
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            spans.append((min(mins), max(maxs)))
        lo = min(s[0] for s in spans)
        hi = max(s[1] for s in spans)
        probe = lo + (hi - lo) * 0.5
        hit = sum(1 for s in spans if s[0] <= probe <= s[1])
        return hit / len(spans)

    # a mid-range point predicate on either dimension must overlap only
    # a minority of files (unclustered: every file overlaps)
    assert overlap_fraction("user_id") <= 0.5
    assert overlap_fraction("value") <= 0.5


def test_zorder_key_is_deterministic_and_total(spark, sf_small):
    from lagoon_spark.operators.layout import zorder_key

    ev = spark.read.parquet(f"{sf_small}/events.parquet").select(
        "user_id", "event_type", "value"
    )
    a = zorder_key(ev, ["user_id", "event_type"], bits=6)
    b = zorder_key(ev, ["user_id", "event_type"], bits=6)
    assert a.count() == ev.count()
    assert a.filter("zorder IS NULL").count() == 0
    assert (
        a.agg({"zorder": "sum"}).collect()[0][0]
        == b.agg({"zorder": "sum"}).collect()[0][0]
    )


def test_engine_optimize_layout_preserves_content(lagoon, tmp_path):
    import glob

    rows = "\n".join(f"{i},{(i * 37) % 100},w{i % 7}" for i in range(2000))
    p = tmp_path / "m.csv"
    p.write_text("a,b,c\n" + rows + "\n")
    info = lagoon.ingest(str(p), "measure")

    before = [
        tuple(r)
        for r in lagoon.dataframe(info, typed=True).orderBy("ix").collect()
    ]
    out = lagoon.optimize_layout(info, ["a", "b"], bits=8, num_files=8)
    after = [
        tuple(r)
        for r in lagoon.dataframe(out, typed=True).orderBy("ix").collect()
    ]
    assert after == before  # pure row reorder: content and ix identity keep

    # the friendly view and the SQL passthrough still work post-swap
    n = lagoon.sql(f"SELECT count(*) AS n FROM {info.typed_view_name}").collect()
    assert n[0]["n"] == 2000

    # the rewrite actually produced a multi-file clustered layout
    files = glob.glob(
        lagoon._data_path(out.typed_table_name) + "/part-*.parquet"
    )
    assert len(files) >= 4


def test_engine_optimize_layout_rejects_unknown_column(lagoon, tmp_path):
    p = tmp_path / "m2.csv"
    p.write_text("a,b\n1,2\n")
    info = lagoon.ingest(str(p), "m2")
    with pytest.raises(ValueError):
        lagoon.optimize_layout(info, ["nope"])


def test_optimize_layout_on_compacted_source_keeps_versions(lagoon, tmp_path):
    # a compacted source's table is SHARED across versions and carries
    # the ixs membership array; the z-order rewrite is a pure row
    # reorder, so every version's view must reconstruct identically
    p1 = tmp_path / "v1.csv"
    p2 = tmp_path / "v2.csv"
    p1.write_text("k,v\n" + "\n".join(f"{i},{i*3}" for i in range(300)) + "\n")
    p2.write_text(
        "k,v\n" + "\n".join(f"{i},{i*3}" for i in range(100, 500)) + "\n"
    )
    lagoon.ingest(str(p1), "zc")
    lagoon.ingest(str(p2), "zc")
    lagoon.compact("zc")
    i1 = lagoon.catalog.get_source("zc", 1)
    i2 = lagoon.catalog.get_source("zc", 2)
    before1 = [tuple(r) for r in lagoon.dataframe(i1).orderBy("ix").collect()]
    before2 = [tuple(r) for r in lagoon.dataframe(i2).orderBy("ix").collect()]

    lagoon.optimize_layout(i2, ["k"], typed=True, num_files=4)

    after1 = [tuple(r) for r in lagoon.dataframe(i1).orderBy("ix").collect()]
    after2 = [tuple(r) for r in lagoon.dataframe(i2).orderBy("ix").collect()]
    assert after1 == before1
    assert after2 == before2


def test_zorder_key_all_null_and_empty_are_clean_noops(spark):
    # round-4 driver advice: None min/max (empty table or all-NULL
    # numeric column) raised TypeError far from the cause; now the
    # column is a constant bucket and the key still computes
    from lagoon_spark.operators.layout import zorder_key

    df = spark.createDataFrame(
        [(None, "a"), (None, "b")], "num double, s string"
    )
    got = zorder_key(df, ["num", "s"], bits=4).collect()
    assert len(got) == 2 and all(r["zorder"] is not None for r in got)

    empty = spark.createDataFrame([], "num double, s string")
    assert zorder_key(empty, ["num", "s"], bits=4).count() == 0
