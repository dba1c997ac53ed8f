"""REST facade tests — the reference server's routes over one engine.

Drives `lagoon_spark.server.LagoonServer` through real HTTP (urllib
against a thread-bound listener on a free port): the PyLagoon wire
JSON, streaming download/sql, permission mapping to 403, and the
name/version resolution endpoints (`Interface/API.hs:115-290`).
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest


@pytest.fixture()
def served(lagoon):
    from lagoon_spark.server import LagoonServer

    lagoon.user = "admin"
    srv = LagoonServer(lagoon, port=0)
    port = srv.start()
    yield f"http://127.0.0.1:{port}"
    srv.stop()


def _req(base, method, path, body=None, user="admin", headers=None):
    data = (
        body if isinstance(body, bytes)
        else json.dumps(body).encode() if body is not None
        else None
    )
    req = urllib.request.Request(
        base + path, data=data, method=method,
        headers={"X-Lagoon-User": user, **(headers or {})},
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        payload = r.read()
        ct = r.headers.get("Content-Type", "")
        return r.status, dict(r.headers), (
            json.loads(payload) if ct.startswith("application/json") and payload
            else payload.decode()
        )


def test_ingest_list_download_sql_roundtrip(served):
    # POST /sources ingests the request body
    st, _, info = _req(
        served, "POST", "/sources?name=web&tag=demo",
        body=b"a,b\n1,x\n2,y\n",
    )
    assert st == 200 and info["name"] == "web" and info["numRows"] == 2
    assert info["viewName"] == "web_v1" and info["tags"] == ["demo"]
    assert {c["header"] for c in info["columns"]} == {"a", "b"}

    st, hdr, lst = _req(served, "GET", "/sources?tag=demo")
    assert st == 200 and hdr["X-Total-Count"] == "1" and lst[0]["ix"] == info["ix"]

    st, _, csv_text = _req(served, "GET", f"/source/{info['ix']}/download")
    assert csv_text == "a,b\r\n1,x\r\n2,y\r\n"

    st, _, rows = _req(
        served, "POST", "/sql?format=json",
        body=b"SELECT b FROM web_v1_typed WHERE a = 2",
    )
    assert rows == {"b": "y"}


def test_name_version_resolution_and_lifecycle(served, tmp_path):
    for _ in range(2):
        _req(served, "POST", "/sources?name=multi", body=b"x\n7\n")
    st, _, snix = _req(served, "GET", "/source/name/multi")
    assert st == 200
    st, _, ixs = _req(served, "GET", f"/source/versions/{snix}")
    assert len(ixs) == 2
    st, _, latest = _req(served, "GET", f"/source/version/{snix}")
    assert latest == ixs[-1]
    st, _, v1 = _req(served, "GET", f"/source/version/{snix}?version=1")
    assert v1 == ixs[0]

    # tag / untag / deprecate / show
    _req(served, "POST", f"/source/{v1}/tags", body=["red", "blue"])
    _req(served, "DELETE", f"/source/{v1}/tag/red")
    _req(served, "POST", f"/source/{v1}/deprecated", body=True)
    st, _, shown = _req(served, "GET", f"/source/{v1}")
    assert shown["tags"] == ["blue"] and shown["deprecated"] is True

    # delete restores state
    _req(served, "DELETE", f"/source/{latest}")
    st, _, ixs2 = _req(served, "GET", f"/source/versions/{snix}")
    assert ixs2 == [v1]


def test_acl_routes_and_403_mapping(served):
    st, _, info = _req(
        served, "POST", "/sources?name=sec", body=b"a\n1\n", user="alice"
    )
    ix = info["ix"]
    # bob can't download → 403
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(served, "GET", f"/source/{ix}/download", user="bob")
    assert e.value.code == 403
    # alice grants read over HTTP
    _req(served, "POST", f"/source/{ix}/userAccessLevel/bob", body="read",
         user="alice")
    st, _, got = _req(served, "GET", f"/source/{ix}/download", user="bob")
    assert got.startswith("a")
    # revoke via "none"
    _req(served, "POST", f"/source/{ix}/userAccessLevel/bob", body="none",
         user="alice")
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(served, "GET", f"/source/{ix}/download", user="bob")
    assert e.value.code == 403
    # group path + public
    _req(served, "POST", "/group/team", user="admin")
    _req(served, "POST", "/group/team/addUser/carol", user="admin")
    _req(served, "POST", f"/source/{ix}/groupAccessLevel/team", body="read",
         user="alice")
    st, _, got = _req(served, "GET", f"/source/{ix}/download", user="carol")
    assert got.startswith("a")
    st, _, groups = _req(served, "GET", "/groups")
    assert groups == ["team"]
    _req(served, "POST", f"/source/{ix}/public", body=True, user="alice")
    st, _, got = _req(served, "GET", f"/source/{ix}/download", user="dave")
    assert got.startswith("a")
    # a write through /sql → 403 (QueryDenied), unknown source → 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(served, "POST", "/sql", body=b"DROP TABLE sec_v1")
    assert e.value.code == 403
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(served, "GET", "/source/99999")
    assert e.value.code == 404


def test_infer_json_type_and_compact(served):
    st, _, jt = _req(
        served, "POST", "/source/inferJsonType",
        body=b'{"a": 1}\n{"a": null, "b": "s"}\n',
    )
    assert jt == '{"a":nullable number, "b":optional string}'

    for _ in range(2):
        _req(served, "POST", "/sources?name=cmp", body=b"v\n1\n")
    st, _, info = _req(served, "POST", "/sources/compact?name=cmp")
    assert st == 200 and info["isCompact"] is True

    st, _, users = _req(served, "GET", "/users")
    assert "admin" in users


def test_pylagoon_source_wrapper_reads_wire_json(served):
    """The facade's JSON is the same shape PyLagoon's Source wraps."""
    from lagoon_spark.pylagoon import Source

    _, _, info = _req(served, "POST", "/sources?name=pyl", body=b"n\n1\n")
    s = Source(info)
    assert s.view_name == "pyl_v1" and "n" in s.columns
