"""Thin REST facade over the engine — the reference server's routes.

SURVEY §7 descopes the reference's servant/WAI/LDAP machinery ("engine
= library + thin API"); this module is the thin API: a stdlib-only
HTTP server exposing the reference's route shapes
(`src/interface/src/Lagoon/Interface/API.hs:115-290`) over one
in-process engine, speaking the same SourceInfo wire JSON PyLagoon
consumes (`pylagoon.source_json`,
`Interface/SourceInfo.hs:263-279`).

Routes (paths as in API.hs):

    GET    /sources                      list (SourcesSpec subset as query
                                         params; X-Total-Count header)
    POST   /sources?name=...             ingest the request body
    POST   /sources/compact?name=...     compact all versions
    GET    /source/<ix>                  SourceInfo JSON
    DELETE /source/<ix>
    POST   /source/<ix>/tags             body: ["tag", ...]
    DELETE /source/<ix>/tag/<name>
    GET    /source/<ix>/download         streamed CSV / JSON lines
    POST   /source/<ix>/makeTyped
    POST   /source/<ix>/deprecated       body: true | false
    POST   /source/<ix>/public           body: true | false
    POST   /source/<ix>/userAccessLevel/<user>    body: "read"|"update"|
                                                  "manage"|"none"
    POST   /source/<ix>/groupAccessLevel/<group>  body: same
    GET    /source/name/<name>           → SourceNameIx
    GET    /source/version/<snix>?version=N  → SourceIx
    GET    /source/versions/<snix>       → [SourceIx]
    POST   /source/inferJsonType         body: JSON document(s)
    POST   /sql?format=csv|json|json_array   body: SQL text
    GET    /groups                       group names
    POST   /group/<name>                 create group
    POST   /group/<name>/addUser/<user>  (removeUser/addAdmin/removeAdmin)
    GET    /users                        user names seen by the catalog

Deliberate divergences, documented here once: authentication is the
``X-Lagoon-User`` header (the reference's trust-auth mode — no
login/session endpoints, so /user/* is omitted); permission paths key
on the SOURCE ix (the engine anchors grants on the owning dataset
itself, so any version's ix addresses the dataset). Failures map to
403 (PermissionDenied / QueryDenied), 404 (unknown source), 400
(anything else), each with a one-line JSON error body.
"""

from __future__ import annotations

import io
import json
import re
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse


def _wire(info) -> dict:
    from lagoon_spark.pylagoon import source_json

    return source_json(info)


class LagoonServer:
    """One engine behind an HTTP listener. ``serve_forever`` blocks;
    ``start()`` runs it on a daemon thread and returns the bound port
    (pass ``port=0`` to pick a free one — the test mode)."""

    def __init__(self, engine, host: str = "127.0.0.1", port: int = 1866):
        self.engine = engine
        handler = _make_handler(self)
        self.httpd = ThreadingHTTPServer((host, port), handler)
        self.port = self.httpd.server_address[1]
        self._thread: threading.Thread | None = None

    def start(self) -> int:
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self.port

    def stop(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()

    # -- request-scoped engine view ------------------------------------------

    def _as_user(self, user: str):
        """The engine bound to the request's identity. One shared
        engine object would race `.user` across handler threads, so
        each request gets a shallow per-user view sharing the catalog
        (and therefore the writer lock and cache)."""
        from lagoon_spark.engine import Lagoon

        eng = Lagoon(self.engine.spark, self.engine.warehouse, user=user)
        eng.catalog = self.engine.catalog  # share cache + lock state
        return eng


def _make_handler(srv: LagoonServer):
    class Handler(BaseHTTPRequestHandler):
        # route table: (method, compiled path) → handler name
        ROUTES = [
            ("GET", r"^/sources$", "sources_get"),
            ("POST", r"^/sources$", "sources_post"),
            ("POST", r"^/sources/compact$", "sources_compact"),
            ("GET", r"^/source/name/(?P<name>[^/]+)$", "source_by_name"),
            ("GET", r"^/source/version/(?P<snix>\d+)$", "source_version"),
            ("GET", r"^/source/versions/(?P<snix>\d+)$", "source_versions"),
            ("POST", r"^/source/inferJsonType$", "infer_json_type"),
            ("GET", r"^/source/(?P<ix>\d+)$", "source_get"),
            ("DELETE", r"^/source/(?P<ix>\d+)$", "source_delete"),
            ("POST", r"^/source/(?P<ix>\d+)/tags$", "tags_post"),
            ("DELETE", r"^/source/(?P<ix>\d+)/tag/(?P<tag>[^/]+)$", "tag_delete"),
            ("GET", r"^/source/(?P<ix>\d+)/download$", "download"),
            ("POST", r"^/source/(?P<ix>\d+)/makeTyped$", "make_typed"),
            ("POST", r"^/source/(?P<ix>\d+)/deprecated$", "set_deprecated"),
            ("POST", r"^/source/(?P<ix>\d+)/public$", "set_public"),
            (
                "POST",
                r"^/source/(?P<ix>\d+)/userAccessLevel/(?P<subject>[^/]+)$",
                "set_user_level",
            ),
            (
                "POST",
                r"^/source/(?P<ix>\d+)/groupAccessLevel/(?P<subject>[^/]+)$",
                "set_group_level",
            ),
            ("POST", r"^/sql$", "sql"),
            ("GET", r"^/groups$", "groups_get"),
            ("POST", r"^/group/(?P<g>[^/]+)$", "group_create"),
            (
                "POST",
                r"^/group/(?P<g>[^/]+)/(?P<op>addUser|removeUser|addAdmin|removeAdmin)/(?P<u>[^/]+)$",
                "group_manage",
            ),
            ("GET", r"^/users$", "users_get"),
        ]
        _COMPILED = [(m, re.compile(p), h) for m, p, h in ROUTES]

        def log_message(self, *a):  # quiet: the engine logs enough
            pass

        # -- plumbing ---------------------------------------------------------

        def _dispatch(self, method: str) -> None:
            u = urlparse(self.path)
            self.query = {k: v[-1] for k, v in parse_qs(u.query).items()}
            self.user = self.headers.get("X-Lagoon-User", "unknown")
            self.eng = srv._as_user(self.user)
            for m, pat, hname in self._COMPILED:
                if m != method:
                    continue
                hit = pat.match(u.path)
                if hit:
                    try:
                        getattr(self, hname)(
                            **{k: unquote(v) for k, v in hit.groupdict().items()}
                        )
                    except Exception as e:  # map engine failures to codes
                        self._error(e)
                    return
            self._json({"error": f"no route {method} {u.path}"}, 404)

        def do_GET(self):
            self._dispatch("GET")

        def do_POST(self):
            self._dispatch("POST")

        def do_DELETE(self):
            self._dispatch("DELETE")

        def _body(self) -> bytes:
            n = int(self.headers.get("Content-Length") or 0)
            return self.rfile.read(n) if n else b""

        def _json(self, obj, code: int = 200, headers: dict | None = None):
            data = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            for k, v in (headers or {}).items():
                self.send_header(k, str(v))
            self.end_headers()
            self.wfile.write(data)

        def _stream(self, chunks, content_type: str):
            # force the generator's permission/verification work BEFORE
            # committing a 200: engine.download / export_query raise
            # PermissionDenied/QueryDenied on first pull, and an error
            # after headers have gone out corrupts the response
            import itertools

            it = iter(chunks)
            try:
                first = next(it)
            except StopIteration:
                first = None
            chunks = itertools.chain([first] if first is not None else [], it)
            self.send_response(200)
            self.send_header("Content-Type", content_type)
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()
            for chunk in chunks:
                b = chunk.encode()
                if not b:
                    continue
                self.wfile.write(f"{len(b):X}\r\n".encode() + b + b"\r\n")
            self.wfile.write(b"0\r\n\r\n")

        def _error(self, e: Exception):
            from lagoon_spark import security

            if isinstance(e, (security.PermissionDenied, security.QueryDenied)):
                code = 403
            elif isinstance(e, KeyError) or "unknown source" in str(e).lower():
                code = 404
            else:
                code = 400
            self._json({"error": f"{type(e).__name__}: {e}"}, code)

        def _info(self, ix: str):
            return self.eng.catalog.get_source_by_ix(int(ix))

        # -- /sources ----------------------------------------------------------

        def sources_get(self):
            q = self.query
            infos, total = self.eng.catalog.search(
                name_contains=q.get("q") or q.get("name"),
                description_contains=q.get("description"),
                tags_all=[q["tag"]] if "tag" in q else None,
                ts_query=q.get("search"),
                offset=int(q.get("offset", 0)),
                limit=int(q["limit"]) if "limit" in q else None,
                order_by=q.get("orderBy"),
                ascending=q.get("orderAsc", "true") != "false",
            )
            self._json(
                [_wire(i) for i in infos], headers={"X-Total-Count": total}
            )

        def sources_post(self):
            q = self.query
            name = q.get("name")
            if not name:
                raise ValueError("?name= is required")
            suffix = ".json" if q.get("fileType") == "json" else ".csv"
            with tempfile.NamedTemporaryFile("wb", suffix=suffix, delete=False) as f:
                f.write(self._body())
                spool = f.name
            try:
                info = self.eng.ingest(
                    spool,
                    name,
                    description=q.get("description"),
                    tags=q["tag"].split(",") if "tag" in q else None,
                    created=q.get("created"),
                    has_headers=q.get("noHeaders") is None,
                    json_path=q.get("jsonPath"),
                    source_identifier=q.get("sourceIdentifier"),
                    file_type={"csv": "tabular"}.get(
                        q.get("fileType"), q.get("fileType")
                    ),
                    public=False if q.get("private") is not None else None,
                )
            finally:
                import os as _os

                _os.unlink(spool)
            self._json(_wire(info))

        def sources_compact(self):
            name = self.query.get("name")
            if not name:
                raise ValueError("?name= is required")
            self._json(_wire(self.eng.compact(name)))

        # -- /source/<ix> ------------------------------------------------------

        def source_get(self, ix):
            self._json(_wire(self._info(ix)))

        def source_delete(self, ix):
            self.eng.delete_source(self._info(ix))
            self._json(None)

        def tags_post(self, ix):
            info = self._info(ix)
            for t in json.loads(self._body()):
                self.eng.catalog.tag(info.ix, t)
            self._json(None)

        def tag_delete(self, ix, tag):
            self.eng.catalog.untag(self._info(ix).ix, tag)
            self._json(None)

        def download(self, ix):
            info = self._info(ix)
            fmt = self.query.get("format")
            ct = "application/json" if (fmt or info.format) == "json" else "text/csv"
            self._stream(self.eng.download(info, fmt=fmt), ct)

        def make_typed(self, ix):
            self._json(_wire(self.eng.make_typed(self._info(ix))))

        def set_deprecated(self, ix):
            info = self._info(ix)
            self.eng.catalog.update_source(
                info.ix, deprecated=bool(json.loads(self._body()))
            )
            self._json(None)

        def set_public(self, ix):
            from lagoon_spark import security as _sec

            _sec.set_public(
                self.eng.catalog,
                int(ix),
                bool(json.loads(self._body())),
                actor=self.user,
                owner=self._info(ix).added_by,
            )
            self._json(None)

        def _set_level(self, ix, subject, subject_type):
            from lagoon_spark import security as _sec

            level = json.loads(self._body())
            owner = self._info(ix).added_by
            if level == "none":
                _sec.revoke(
                    self.eng.catalog, int(ix), subject, actor=self.user,
                    subject_type=subject_type, owner=owner,
                )
            else:
                _sec.grant(
                    self.eng.catalog, int(ix), subject, level, actor=self.user,
                    subject_type=subject_type, owner=owner,
                )
            self._json(None)

        def set_user_level(self, ix, subject):
            self._set_level(ix, subject, "user")

        def set_group_level(self, ix, subject):
            self._set_level(ix, subject, "group")

        # -- name/version resolution -------------------------------------------

        def _names(self):
            return self.eng.catalog.load("sourcenames")

        def source_by_name(self, name):
            names = self._names()
            hit = names[names["name"] == name]
            if not len(hit):
                raise KeyError(f"unknown source {name!r}")
            self._json(int(hit.iloc[0]["ix"]))

        def _sn_sources(self, snix):
            s = self.eng.catalog.load("sources")
            return s[s["sourcename_ix"] == int(snix)]

        def source_version(self, snix):
            rows = self._sn_sources(snix)
            if "version" in self.query:
                rows = rows[rows["version"] == int(self.query["version"])]
            else:
                rows = rows[rows["version"] == rows["version"].max()]
            if not len(rows):
                raise KeyError(f"no such version for sourcename {snix}")
            self._json(int(rows.iloc[0]["ix"]))

        def source_versions(self, snix):
            rows = self._sn_sources(snix)
            self._json([int(x) for x in sorted(rows["ix"])])

        def infer_json_type(self):
            from lagoon_spark.ingest import jsonsplit, jsontype

            jpath = (
                jsonsplit.parse_path(self.query["jsonPath"])
                if "jsonPath" in self.query
                else jsonsplit.HERE
            )
            merged = None
            for raw in jsonsplit.split_values(
                io.StringIO(self._body().decode("utf-8")), jpath
            ):
                t = jsontype.type_of_value(json.loads(raw))
                merged = t if merged is None else jsontype.unify(merged, t)
            self._json(jsontype.render(merged) if merged is not None else None)

        # -- /sql ---------------------------------------------------------------

        def sql(self):
            fmt = self.query.get("format", "csv")
            sql_text = self._body().decode("utf-8")
            self.eng.register_metadata_views()
            ct = "text/csv" if fmt == "csv" else "application/json"
            self._stream(self.eng.export_query(sql_text, fmt=fmt), ct)

        # -- groups / users ------------------------------------------------------

        def groups_get(self):
            from lagoon_spark import security as _sec

            g = _sec._sec_load(self.eng.catalog, "groups")
            self._json(sorted(g["name"].tolist()))

        def group_create(self, g):
            from lagoon_spark import security as _sec

            _sec.create_group(self.eng.catalog, g, actor=self.user)
            self._json(None)

        def group_manage(self, g, op, u):
            from lagoon_spark import security as _sec

            cat = self.eng.catalog
            if op == "addUser":
                _sec.add_to_group(cat, g, u, actor=self.user)
            elif op == "removeUser":
                _sec.remove_from_group(cat, g, u, actor=self.user)
            elif op == "addAdmin":
                _sec.set_group_manager(cat, g, u, True, actor=self.user)
            else:
                _sec.set_group_manager(cat, g, u, False, actor=self.user)
            self._json(None)

        def users_get(self):
            s = self.eng.catalog.load("sources")
            self._json(sorted(set(s["added_by"].dropna())))

    return Handler
