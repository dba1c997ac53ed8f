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
