"""Query-result export formats (A21) and ingest progress events."""

from __future__ import annotations

import json


def test_export_query_csv(lagoon, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text('name,qty\n"a,b",1\nplain,2\n')
    lagoon.ingest(str(p), "exp")
    out = "".join(lagoon.export_query("SELECT name, qty FROM exp_v1_typed ORDER BY ix", "csv"))
    assert out == 'name,qty\r\n"a,b",1\r\nplain,2\r\n'


def test_export_query_json_lines_and_array(lagoon, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("k,v\nx,1\ny,2\n")
    lagoon.ingest(str(p), "expj")
    lines = "".join(lagoon.export_query("SELECT k, v FROM expj_v1_typed ORDER BY ix", "json"))
    rows = [json.loads(line) for line in lines.strip().splitlines()]
    assert rows == [{"k": "x", "v": 1}, {"k": "y", "v": 2}]

    arr = "".join(lagoon.export_query("SELECT k FROM expj_v1 ORDER BY ix", "json_array"))
    assert json.loads(arr) == [{"k": "x"}, {"k": "y"}]


def test_export_query_dataset_partitioned(lagoon, tmp_path):
    import os

    p = tmp_path / "t.csv"
    p.write_text("grp,val\na,1\nb,2\na,3\nb,4\n")
    lagoon.ingest(str(p), "expd")
    out = tmp_path / "out"
    lagoon.export_query_dataset(
        "SELECT grp, val FROM expd_v1_typed",
        str(out),
        partition_by=["grp"],
        sort_by=["val"],
        max_records_per_file=100,
    )
    # hive layout: one directory per partition value
    dirs = sorted(d for d in os.listdir(out) if d.startswith("grp="))
    assert dirs == ["grp=a", "grp=b"]
    back = lagoon.spark.read.parquet(str(out))
    got = sorted((r["grp"], r["val"]) for r in back.collect())
    assert got == [("a", 1), ("a", 3), ("b", 2), ("b", 4)]
    # a predicate on the partition column reaches the scan as a
    # PartitionFilter — directory pruning, the point of the layout
    from lagoon_spark.operators.layout import scan_partition_filters

    pf = scan_partition_filters(back.filter(back.grp == "a"))
    assert "grp" in pf

    # security still applies
    import pytest

    from lagoon_spark.security import QueryDenied

    with pytest.raises(QueryDenied):
        lagoon.export_query_dataset("DROP TABLE expd_v1", str(tmp_path / "x"))

    # bad partition column is a clean error
    with pytest.raises(ValueError, match="partition_by"):
        lagoon.export_query_dataset(
            "SELECT grp FROM expd_v1", str(tmp_path / "y"), partition_by=["nope"]
        )


def test_export_rejects_writes(lagoon, tmp_path):
    import pytest

    from lagoon_spark.security import QueryDenied

    p = tmp_path / "t.csv"
    p.write_text("a\n1\n")
    lagoon.ingest(str(p), "sec")
    with pytest.raises(QueryDenied):
        list(lagoon.export_query("DROP TABLE sec_v1", "csv"))


def test_metadata_tables_queryable(lagoon, tmp_path):
    """The reference lets /sql read its metadata tables
    (`Verified.hs:844-854`) — same here via lagoon_* views."""
    p = tmp_path / "t.csv"
    p.write_text("a,b\n5,x\n")
    lagoon.ingest(str(p), "meta_demo", tags=["tagged"])
    rows = lagoon.sql(
        "SELECT s.name, s.row_count, c.header, c.type, t.tag "
        "FROM lagoon_sources s "
        "JOIN lagoon_columns c ON c.source_ix = s.ix "
        "JOIN lagoon_tags t ON t.source_ix = s.ix "
        "WHERE s.name = 'meta_demo' ORDER BY c.column_name"
    ).collect()
    assert [(r.header, r.type, r.tag) for r in rows] == [
        ("a", "INTEGER", "tagged"),
        ("b", "TEXT", "tagged"),
    ]
    assert rows[0].row_count == 1


def test_ingest_progress_events(lagoon, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    events = []
    info = lagoon.ingest(str(p), "prog", progress=events.append)
    kinds = [e["event"] for e in events]
    assert kinds == ["input", "format", "loaded", "typed", "done"]
    by_kind = {e["event"]: e for e in events}
    assert by_kind["format"]["width"] == 2
    assert by_kind["loaded"]["rows"] == 2
    assert by_kind["typed"]["columns"] == [("a", "INTEGER"), ("b", "TEXT")]
    assert by_kind["done"]["ix"] == info.ix and by_kind["done"]["rows"] == 2
