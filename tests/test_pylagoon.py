"""PyLagoon client-API parity (lagoon_spark.pylagoon vs
clients/PyLagoon/PyLagoon) — same names, same Source JSON shape, same
DataFrame-returning download surface, backed by the engine."""

from __future__ import annotations

import pytest

from lagoon_spark import pylagoon
from lagoon_spark.engine import Lagoon as Engine


@pytest.fixture()
def client(spark, tmp_path):
    eng = Engine(spark, str(tmp_path / "wh"), user="pyuser")
    eng.init_db()
    p = tmp_path / "d.csv"
    p.write_text("id,score,label\n1,1.5,a\n2,2.5,b\n3,3.5,c\n")
    eng.ingest(str(p), "pyds", tags=["demo"])
    j = tmp_path / "d.json"
    j.write_text('{"k": 1}\n{"k": 2}\n')
    eng.ingest(str(j), "pyjson")
    return pylagoon.Lagoon(eng)


def test_source_wire_json_shape(client):
    (src,) = client.sources(name="pyds")
    # the exact field names the server emits (SourceInfo.hs:263-279)
    for field in (
        "ix", "name", "descr", "tags", "URL", "version", "deprecated",
        "created", "addedBy", "schema", "tableName", "viewName", "typed",
        "columns", "numRows", "isCompact",
    ):
        assert field in src._json, field
    assert src._json["numRows"] == 3
    assert src.view_name == "pyds_v1"
    col = src.columns["score"]
    assert set(col) == {"name", "header", "type", "inView"}
    assert col["type"] == "DOUBLE PRECISION"
    # col_types maps through the client's LAGOON_TYPES table
    assert src.col_types["score"] is pylagoon.LAGOON_TYPES["DOUBLE PRECISION"]
    assert src.col_types["ix"] is int


def test_json_source_type_is_list_shaped(client):
    (src,) = client.sources(name="pyjson")
    (col,) = src.columns.values()
    # the client checks c["type"][0] == "JSON" (lagoon.py:124)
    assert col["type"][0] == "JSON"
    assert "number" in col["type"][1]


def test_sources_filters_and_my_sources(client):
    assert {s._json["name"] for s in client.sources()} == {"pyds", "pyjson"}
    assert [s._json["name"] for s in client.sources(tags=["demo"])] == ["pyds"]
    assert len(client.my_sources()) == 2
    with pytest.raises(TypeError, match="unknown sources"):
        client.sources(bogus=1)


def test_users(client):
    assert client.users() == ["pyuser"]


def test_ingest_returns_source(client, tmp_path):
    p = tmp_path / "n.csv"
    p.write_text("x\n1\n2\n")
    src = client.ingest(str(p), "newds", tags=["t1"])
    assert isinstance(src, pylagoon.Source)
    assert src._json["numRows"] == 2 and "t1" in src._json["tags"]


def test_download_source_dataframe(client):
    (src,) = client.sources(name="pyds")
    pdf = client.download_source(src)
    assert list(pdf["id"]) == [1, 2, 3]
    assert list(pdf["label"]) == ["a", "b", "c"]
    assert abs(pdf["score"].sum() - 7.5) < 1e-9


def test_download_query_sql_text(client):
    pdf = client.download_query(
        "SELECT label, score FROM pyds_v1_typed WHERE id > 1 ORDER BY id"
    )
    assert list(pdf["label"]) == ["b", "c"]


def test_download_query_denies_unknown_table(client):
    from lagoon_spark.security import QueryDenied

    with pytest.raises(QueryDenied):
        client.download_query("SELECT * FROM not_a_table")


def test_pgmeta_sqlalchemy_lane(client):
    """Skipped where SQLAlchemy is absent (this container); green the
    day the environment grows it: builds the EDSL classes, compiles a
    filtered query, and runs it through the engine."""
    pytest.importorskip("sqlalchemy")
    (src,) = client.sources(name="pyds")
    meta = pylagoon.PGMeta([src])
    table = meta[src]
    q = meta.query(table).filter(table.id > 1)
    sql = pylagoon.build_sql_query(q)
    assert "pyds_v1" in sql
    pdf = client.download_query(q)
    assert len(pdf) == 2


def test_pgmeta_without_sqlalchemy_hints():
    if pytest.importorskip is None:  # pragma: no cover
        return
    try:
        import sqlalchemy  # noqa: F401

        pytest.skip("sqlalchemy present; the hint path is for its absence")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="SQLAlchemy"):
        pylagoon.PGMeta([])
