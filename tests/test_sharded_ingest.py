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
