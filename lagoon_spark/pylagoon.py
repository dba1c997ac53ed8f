"""PyLagoon-compatible client facade over the in-process engine.

The reference ships a Python client (`clients/PyLagoon/PyLagoon/`,
511 LoC) whose user-facing surface is: ``Lagoon`` (sources /
my_sources / ingest / users / download_source / download_query),
``Source`` (a wrapper over the server's SourceInfo JSON,
`source.py:55-78`), and the ``PGMeta`` SQLAlchemy EDSL +
``build_sql_query`` (`postgresql.py:28-107`). A PyLagoon user's
scripts talk to those names — this module provides the same names and
semantics backed by the Spark engine directly instead of the REST
server (SURVEY §7 descopes the HTTP layer; the client API is the
contract worth keeping).

Source JSON field names match the server's wire format exactly
(`src/interface/src/Lagoon/Interface/SourceInfo.hs:263-279` and
`ColumnSpec.hs:86-92`): ``ix``, ``name``, ``viewName``, ``columns``
(each ``{name, header, type, inView}``), ``numRows``, ``isCompact``…
so code that pokes at ``source._json`` keeps working.

Deliberate divergences (no server in this architecture):
- ``Lagoon(engine)`` wraps a `lagoon_spark.engine.Lagoon` instead of
  ``Lagoon(config, host, port)``; authentication is the engine user.
- ``download_*`` return pandas DataFrames built from Spark results,
  not HTTP downloads.
- ``PGMeta``/``build_sql_query`` need SQLAlchemy (optional import —
  absent in this container, the names raise with an install hint).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:  # pragma: no cover
    from lagoon_spark.catalog import SourceInfo
    from lagoon_spark.engine import Lagoon as Engine

# `clients/PyLagoon/PyLagoon/source.py:17-27`
LAGOON_TYPES = {
    "BOOLEAN": bool,
    "INTEGER": int,
    "BIGINT": pd.Int64Dtype,
    "DOUBLE PRECISION": np.float64,
    "TEXT": str,
    "ARR": object,
    "DOCUMENT": object,
    "JSON": object,
}
UNKNOWN_COLUMN_TYPE = object


def source_json(info: "SourceInfo") -> dict:
    """The server's SourceInfo wire JSON for one version
    (`Interface/SourceInfo.hs:263-279`)."""
    columns = []
    for phys, header, ctype in info.columns:
        t = ["JSON", info.json_type] if ctype == "JSON" else ctype
        columns.append(
            {"name": phys, "header": header, "type": t, "inView": header}
        )
    return {
        "ix": info.ix,
        "name": info.name,
        "descr": info.description,
        "tags": list(info.tags),
        "URL": info.url,
        "version": info.version,
        "deprecated": info.deprecated,
        "created": info.created,
        "addedBy": info.added_by,
        "schema": None,  # no Postgres schemas in this architecture
        "tableName": info.table_name,
        "viewName": info.view_name,
        "typed": [info.typed_table_name, info.typed_view_name]
        if info.typed_table_name
        else None,
        "columns": columns,
        "numRows": info.row_count,
        "isCompact": info.table_name.startswith("compact"),
        "isTypedCompact": False,
    }


class Source:
    """`source.py:30-78` — a wrapper over the SourceInfo JSON."""

    INDEX_COL = "ix"
    INDEX_COL_TYPE = int

    def __init__(self, json: dict):
        self.__json = json

    def __str__(self) -> str:
        return "<Source: ix={0}, view_name={1}>".format(self.ix, self.view_name)

    __repr__ = __str__

    @property
    def ix(self):
        return self.__json["ix"]

    @property
    def view_name(self):
        return self.__json["viewName"]

    @property
    def columns(self):
        return {c["inView"]: c for c in self.__json["columns"]}

    @property
    def _json(self):
        return self.__json

    @property
    def schema(self):
        return self.__json["schema"]

    @property
    def col_types(self):
        types = {n: get_column_type(c) for n, c in self.columns.items()}
        types[self.INDEX_COL] = self.INDEX_COL_TYPE
        return types


def get_column_type(column: dict):
    t = column["type"]
    if isinstance(t, list):
        t = t[0]
    return LAGOON_TYPES.get(t, UNKNOWN_COLUMN_TYPE)


def get_column_name(column: dict):
    return column["inView"]


class Lagoon:
    """`lagoon.py:25-154` with the HTTP plumbing replaced by direct
    engine calls. Method names, argument spellings (``ontoClass``,
    ``tags``, ``columns``), and return types match the client."""

    def __init__(self, engine: "Engine"):
        self._engine = engine

    @property
    def is_authenticated(self) -> bool:
        return True  # the engine user is the principal

    # -- catalog ------------------------------------------------------------

    _FILTERS = {
        # REST param -> catalog.search kwarg (`lagoon.py:57` docstring)
        "name": "name_contains",
        "ix": "ix",
        "user": "added_by_contains",
        "createdAfter": "created_after",
        "createdBefore": "created_before",
        "description": "description_contains",
        "q": "ts_query",
        "orderBy": "order_by",
        "offset": "offset",
        "limit": "limit",
    }

    def sources(self, ontoClass=None, tags=None, columns=None, **kwargs):
        """List sources matching the REST-style filters; returns
        [Source]. (`ontoClass` is accepted for signature parity; the
        reference maps it to an ontology service this engine does not
        model — it filters as a tag.)"""
        search_kw = {}
        for k, v in kwargs.items():
            if k not in self._FILTERS:
                raise TypeError(f"unknown sources() filter: {k}")
            search_kw[self._FILTERS[k]] = v
        want_tags = list(tags) if tags else []
        if ontoClass:
            want_tags.append(ontoClass)
        if want_tags:
            search_kw["tags_all"] = want_tags
        if columns:
            search_kw["columns_all"] = list(columns)
        infos, _total = self._engine.catalog.search(**search_kw)
        return [Source(source_json(i)) for i in infos]

    def my_sources(self, **kwargs):
        """`lagoon.py:111`: shortcut for sources(user=<current user>)."""
        return self.sources(user=self._engine.user, **kwargs)

    def users(self):
        """`lagoon.py:115`: the known principals — dataset uploaders
        plus every group member/manager."""
        from lagoon_spark import security

        cat = self._engine.catalog
        out = set(cat.load("sources")["added_by"].dropna().tolist())
        out.update(security._sec_load(cat, "group_members")["user"].tolist())
        out.update(security._sec_load(cat, "group_managers")["user"].tolist())
        return sorted(out)

    # -- data movement --------------------------------------------------------

    def ingest(self, file_path, name, ontoClass=None, tags=None, **kwargs):
        """Upload a dataset; returns the new Source (`lagoon.py:69`)."""
        all_tags = list(tags) if tags else []
        if ontoClass:
            all_tags.append(ontoClass)
        info = self._engine.ingest(file_path, name, tags=all_tags or None, **kwargs)
        return Source(source_json(info))

    def _info(self, source: Source):
        return self._engine.catalog.get_source_by_ix(source.ix)

    def download_source(self, source: Source) -> pd.DataFrame:
        """`lagoon.py:121`: the whole source as a pandas DataFrame
        (typed view when available, like the server's typed download)."""
        info = self._info(source)
        df = self._engine.dataframe(info, typed=bool(info.typed_table_name))
        # physical storage keeps c1..cn; the client surface (like the
        # server's view download) uses the friendly headers
        from pyspark.sql import functions as F

        renames = [F.col("ix")] + [
            F.col(phys).alias(header) for phys, header, _t in info.columns
        ]
        return df.orderBy("ix").select(*renames).toPandas()

    def download_query(self, query, sources=None) -> pd.DataFrame:
        """`lagoon.py:140`: run a query and return a DataFrame. Accepts
        the SQL text directly, or a SQLAlchemy Query (compiled through
        :func:`build_sql_query` exactly like the client)."""
        if not isinstance(query, str):
            query = build_sql_query(query)
        return self._engine.sql(query).toPandas()


# -- the SQLAlchemy EDSL (`postgresql.py`) ----------------------------------


def _require_sqlalchemy():
    try:
        import sqlalchemy  # noqa: F401

        return sqlalchemy
    except ImportError as e:  # pragma: no cover - absent in this container
        raise NotImplementedError(
            "PGMeta/build_sql_query need SQLAlchemy (pip install sqlalchemy); "
            "pass SQL text to download_query instead"
        ) from e


_SA_TYPES = {
    # Lagoon column type -> sqlalchemy type name (`postgresql.py:51-68`)
    "BOOLEAN": "Boolean",
    "INTEGER": "Integer",
    "BIGINT": "BigInteger",
    "DOUBLE PRECISION": "Float",
    "TEXT": "Text",
    "DOCUMENT": "Text",
    "JSON": "JSON",
    "ARR": "ARRAY",
}


class PGMeta:
    """`postgresql.py:28-92`: build SQLAlchemy table classes from
    Sources; index by Source or view name; ``query(*sources)`` starts
    a Query."""

    def __init__(self, sources):
        sa = _require_sqlalchemy()
        from sqlalchemy.ext.automap import automap_base

        self.__view_names = [s.view_name for s in sources]
        self.__md = sa.MetaData()
        for s in sources:
            self.__add_source(sa, s)
        self.__base = automap_base(metadata=self.__md)
        self.__base.prepare()

    @property
    def sql_tables(self):
        return self.__md.tables

    def __getitem__(self, key):
        if isinstance(key, Source):
            key = key.view_name
        return self.__base.classes[key]

    def __add_source(self, sa, source: Source) -> None:
        cols = []
        for name, col in source.columns.items():
            t = col["type"]
            if isinstance(t, list):
                t = t[0]
            sa_name = _SA_TYPES.get(t, "Text")
            cols.append(sa.Column(name, getattr(sa, sa_name)))
        sa.Table(
            source.view_name,
            self.__md,
            sa.Column("ix", sa.Integer, primary_key=True),
            *cols,
        )

    def query(self, *sources):
        _require_sqlalchemy()
        from sqlalchemy.orm import Session

        if len(sources) == 0:
            sources = self.__view_names
        return Session().query(
            *(
                self[s] if isinstance(s, (str, Source)) else s
                for s in sources
            )
        )


def build_sql_query(query) -> str:
    """`postgresql.py:95-107`: compile a SQLAlchemy Query to SQL text
    with inlined literal parameters."""
    _require_sqlalchemy()

    compiled = query.statement.compile(
        compile_kwargs={"literal_binds": True}
    )
    return str(compiled)


# -- HTTP-backed client (the reference's CONNECTED deployment shape) ---------


class LagoonHTTP:
    """The reference client's connected mode — the same user surface as
    :class:`Lagoon` (sources / my_sources / users / ingest /
    download_source / download_query) spoken over HTTP to a running
    :class:`lagoon_spark.server.LagoonServer`, wire-for-wire with
    `clients/PyLagoon/PyLagoon/lagoon.py:26-155`: cookie-session login
    at construction when a password is given (`lagoon.py:38-47`),
    query-param filters, streamed downloads. Built on stdlib urllib so
    the client adds no dependencies; without a password it runs in the
    trust-header mode (`X-Lagoon-User`)."""

    def __init__(
        self,
        host: str = "127.0.0.1",
        port: int = 1866,
        user: str | None = None,
        password: str | None = None,
    ):
        self._base = f"http://{host}:{port}"
        self._user = user or "unknown"
        self._cookie: str | None = None
        if password is not None:
            self.login(self._user, password)

    # -- wire -----------------------------------------------------------------

    def _req(self, method: str, path: str, params=None, body: bytes | None = None):
        import urllib.parse
        import urllib.request

        pairs = []
        for k, v in (params or {}).items():
            if v is None:
                continue
            for item in v if isinstance(v, (list, tuple)) else [v]:
                pairs.append((k, str(item)))
        url = self._base + path + (
            "?" + urllib.parse.urlencode(pairs) if pairs else ""
        )
        headers = (
            {"Cookie": self._cookie}
            if self._cookie
            else {"X-Lagoon-User": self._user}
        )
        req = urllib.request.Request(
            url, data=body, method=method, headers=headers
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            return r.read(), r.headers.get("Set-Cookie")

    def login(self, user: str, password: str) -> None:
        """`lagoon.py:38-47`: POST /user/login, keep the session cookie."""
        import json as _json
        import urllib.error

        try:
            _payload, set_cookie = self._req(
                "POST",
                "/user/login",
                body=_json.dumps({"user": user, "pass": password}).encode(),
            )
        except urllib.error.HTTPError as e:
            raise Exception("Authentication failed") from e
        self._cookie = set_cookie.split(";", 1)[0]
        self._user = user

    def logout(self) -> None:
        self._req("POST", "/user/logout")
        self._cookie = None

    @property
    def is_authenticated(self) -> bool:
        return self._cookie is not None

    # -- catalog --------------------------------------------------------------

    def sources(self, ontoClass=None, tags=None, columns=None, **kwargs):
        import json as _json

        params = dict(kwargs)
        want_tags = list(tags) if tags else []
        if ontoClass:
            want_tags.append(ontoClass)
        if want_tags:
            params["tag"] = want_tags
        if columns:
            params["column"] = list(columns)
        payload, _ = self._req("GET", "/sources", params=params)
        return [Source(j) for j in _json.loads(payload)]

    def my_sources(self, **kwargs):
        return self.sources(user=self._user, **kwargs)

    def users(self):
        import json as _json

        payload, _ = self._req("GET", "/users")
        return _json.loads(payload)

    # -- data movement --------------------------------------------------------

    def ingest(self, file_path, name, ontoClass=None, tags=None, **kwargs):
        import json as _json

        params = dict(kwargs)
        params["name"] = name
        want_tags = list(tags) if tags else []
        if ontoClass:
            want_tags.append(ontoClass)
        if want_tags:
            params["tag"] = want_tags
        if "fileType" not in params and str(file_path).endswith(
            (".json", ".jsonl")
        ):
            params["fileType"] = "json"
        with open(file_path, "rb") as f:
            payload, _ = self._req(
                "POST", "/sources", params=params, body=f.read()
            )
        return Source(_json.loads(payload))

    def download_source(self, source: Source) -> pd.DataFrame:
        import io
        import json as _json

        is_json = any(
            isinstance(c["type"], list) and c["type"][0] == "JSON"
            for c in source.columns.values()
        )
        if is_json:
            payload, _ = self._req(
                "GET",
                f"/source/{source.ix}/download",
                params={"format": "json"},
            )
            rows = [
                _json.loads(line)
                for line in payload.decode("utf-8").splitlines()
                if line.strip()
            ]
            return pd.DataFrame(rows)
        payload, _ = self._req("GET", f"/source/{source.ix}/download")
        return pd.read_csv(io.StringIO(payload.decode("utf-8")))

    def download_query(self, query, sources=None) -> pd.DataFrame:
        import json as _json

        if not isinstance(query, str):
            query = build_sql_query(query)
        payload, _ = self._req(
            "POST",
            "/sql",
            params={"format": "json_array"},
            body=query.encode("utf-8"),
        )
        return pd.DataFrame(_json.loads(payload))
