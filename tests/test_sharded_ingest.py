"""Sharded ingest: a directory (or glob) of same-schema files becomes
ONE source — per-shard headers dropped, `ix` contiguous in shard
listing order, type inference unified across shards."""

from __future__ import annotations

import os

import pytest


@pytest.fixture()
def shard_dir(tmp_path):
    d = tmp_path / "shards"
    d.mkdir()
    (d / "part-000.csv").write_text("id,score,flag\n1,10,t\n2,20,f\n")
    (d / "part-001.csv").write_text("id,score,flag\n3,2.5,t\n4,40,f\n")
    (d / "part-002.csv").write_text("id,score,flag\n5,50,maybe\n")
    return str(d)


def test_directory_ingest_one_source(lagoon, shard_dir):
    info = lagoon.ingest(shard_dir, "sharded")
    assert info.row_count == 5

    rows = lagoon.spark.table(info.view_name).orderBy("ix").collect()
    # ix contiguous 1..5 in shard listing order
    assert [r["ix"] for r in rows] == [1, 2, 3, 4, 5]
    assert [r["id"] for r in rows] == ["1", "2", "3", "4", "5"]

    # inference unified ACROSS shards: score int in shards 0/2 but real
    # in shard 1 -> DOUBLE PRECISION; flag bool in 0/1 but text in 2
    types = {h: t for _p, h, t in info.columns}
    assert types["score"] == "DOUBLE PRECISION"
    assert types["flag"] == "TEXT"
    assert types["id"] == "INTEGER"


def test_glob_ingest_subset(lagoon, shard_dir):
    info = lagoon.ingest(os.path.join(shard_dir, "part-00[01].csv"), "globbed")
    assert info.row_count == 4
    rows = lagoon.spark.table(f"{info.view_name}_typed").orderBy("ix").collect()
    assert [r["id"] for r in rows] == [1, 2, 3, 4]
    # bool column: only shards 0/1 -> stays BOOLEAN end-to-end
    assert [r["flag"] for r in rows] == [True, False, True, False]


def test_empty_dir_raises(lagoon, tmp_path):
    d = tmp_path / "empty"
    d.mkdir()
    with pytest.raises(FileNotFoundError):
        lagoon.ingest(str(d), "nothing")


def test_sharded_jsonl(lagoon, tmp_path):
    d = tmp_path / "jshards"
    d.mkdir()
    (d / "a.json").write_text('{"k": 1}\n{"k": 2}\n')
    (d / "b.json").write_text('{"k": null}\n')
    info = lagoon.ingest(str(d), "jsonl_shards", file_type="json")
    assert info.row_count == 3
    assert info.columns[0][2] == "JSON"


def test_sharded_json_path_rejected(lagoon, shard_dir):
    with pytest.raises(ValueError):
        lagoon.ingest(shard_dir, "bad", json_path="[_]")


def test_with_ix_on_zero_row_frame(spark):
    # a header-only streaming batch produces a zero-row frame; the
    # offset map must not become an unindexable empty map<void,void>
    # (hypothesis-found via test_streaming_ingest_property)
    from lagoon_spark.ingest.rowid import with_ix

    df = spark.createDataFrame([], "a string, b string")
    out = with_ix(df)
    assert out.columns == ["a", "b", "ix"]
    assert out.count() == 0


def test_with_ix_join_tier_matches_literal_tier(spark, tmp_path, monkeypatch):
    """Past _MAP_LITERAL_MAX groups the offsets ride a broadcast-joined
    frame instead of create_map literals; the numbering contract (ix
    1..N in filename-major order, original column order preserved)
    must be bit-identical across the two tiers."""
    from lagoon_spark.ingest import rowid

    d = tmp_path / "tier_shards"
    d.mkdir()
    for i in range(12):
        rows = "\n".join(f"{i}-{j}" for j in range(3))
        (d / f"p-{i:03d}.csv").write_text(rows + "\n")
    df = spark.read.schema("v string").csv(str(d))

    literal = {
        r["v"]: r["ix"] for r in rowid.with_ix(df).collect()
    }
    monkeypatch.setattr(rowid, "_MAP_LITERAL_MAX", 0)
    joined_df = rowid.with_ix(df)
    assert joined_df.columns == ["v", "ix"]
    joined = {r["v"]: r["ix"] for r in joined_df.collect()}
    assert joined == literal
    assert sorted(joined.values()) == list(range(1, 37))
    # filename-major: every row of p-000 numbers before any of p-001
    assert max(joined[f"0-{j}"] for j in range(3)) < min(
        joined[f"1-{j}"] for j in range(3)
    )


@pytest.mark.slow  # heavyweight soak lane (round-12 verdict #3)
def test_with_ix_10k_shards_plan_stays_small(spark, tmp_path):
    """The 100 TB sharded-ingest shape: 10k input files. The offset
    state must NOT land in the plan tree as a 20k-entry map literal
    (driver/plan bloat growing with shard count) — above the threshold
    it broadcasts, so the optimized plan stays O(1) in group count."""
    from lagoon_spark.ingest.rowid import with_ix

    d = tmp_path / "many_shards"
    d.mkdir()
    for i in range(10_000):
        (d / f"s-{i:05d}.csv").write_text(f"{i}\n")
    df = spark.read.schema("v string").csv(str(d))
    out = with_ix(df)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # a create_map literal tier at 10k groups would be >1 MB of plan
    assert len(plan) < 100_000, f"plan blew up to {len(plan)} chars"
    stats = out.selectExpr(
        "count(*) AS n", "min(ix) AS lo", "max(ix) AS hi",
        "count(DISTINCT ix) AS d"
    ).collect()[0]
    assert (stats["n"], stats["lo"], stats["hi"], stats["d"]) == (
        10_000, 1, 10_000, 10_000
    )
