"""Postgres JSON operator family over Spark columns.

Surface inventory from the reference's R dplyr translations
(`clients/RLagoon/R/dplyrlagoon.r:88-100`): ``-> ->> #> #>> @> <@ ?
?& ?|``. The JVM-expressible operators compile to built-in functions
(``get_json_object``, ``json_object_keys`` — codegen'd, scale as plain
scans); structural containment (``@>``/``<@``) has no Spark built-in
and ships as an Arrow-vectorized Pandas UDF implementing the Postgres
recursive-containment rules.

Hot-path guidance: when the needle shape is known statically (e.g.
``props @> '{"k": 1}'``), prefer the equivalent
``get_json_object(props, '$.k') = '1'`` expression — it stays in
whole-stage codegen. The generic UDF is for ad-hoc / user-supplied
needles.
"""

from __future__ import annotations

import json

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


# -- path selection (`->`, `->>`, `#>`, `#>>`) ------------------------------

def json_get(col: str | Column, key: str | int) -> Column:
    """``col -> key``: member (or array element) as JSON text."""
    path = f"$[{key}]" if isinstance(key, int) else f"$.{key}"
    return F.get_json_object(_c(col), path)


def json_get_text(col: str | Column, key: str | int) -> Column:
    """``col ->> key``: member as text (get_json_object already
    unquotes scalar strings, matching ``->>``)."""
    return json_get(col, key)


def _path(keys: list[str | int]) -> str:
    out = "$"
    for k in keys:
        out += f"[{k}]" if isinstance(k, int) else f".{k}"
    return out


def json_path(col: str | Column, keys: list[str | int]) -> Column:
    """``col #> '{a,b,0}'``: selection by path list."""
    return F.get_json_object(_c(col), _path(keys))


def json_path_text(col: str | Column, keys: list[str | int]) -> Column:
    """``col #>> path`` — text form of :func:`json_path`."""
    return json_path(col, keys)


# -- key existence (`?`, `?&`, `?|`) ----------------------------------------

def jsonb_exists(col: str | Column, key: str) -> Column:
    """``col ? key``: does the top-level object have the key?"""
    return F.array_contains(F.json_object_keys(_c(col)), key)


def jsonb_exists_all(col: str | Column, keys: list[str]) -> Column:
    """``col ?& keys``: all keys present."""
    ks = F.json_object_keys(_c(col))
    out = F.lit(True)
    for k in keys:
        out = out & F.array_contains(ks, k)
    return out


def jsonb_exists_any(col: str | Column, keys: list[str]) -> Column:
    """``col ?| keys``: any key present."""
    ks = F.json_object_keys(_c(col))
    out = F.lit(False)
    for k in keys:
        out = out | F.array_contains(ks, k)
    return out


# -- structural containment (`@>`, `<@`) ------------------------------------

def _pg_contains(hay, needle) -> bool:
    """Postgres jsonb containment: objects need every needle pair
    contained; arrays need every needle element contained in some
    haystack element (scalar needle in array haystack also matches);
    scalars compare by equality."""
    if isinstance(needle, dict):
        if not isinstance(hay, dict):
            return False
        return all(k in hay and _pg_contains(hay[k], v) for k, v in needle.items())
    if isinstance(needle, list):
        if not isinstance(hay, list):
            return False
        return all(any(_pg_contains(h, n) for h in hay) for n in needle)
    if isinstance(hay, list):
        # top-level scalar-in-array special case
        return any(h == needle for h in hay)
    return hay == needle


def jsonb_contains(col: str | Column, needle_json: str) -> Column:
    """``col @> needle``: structural containment of a constant needle.

    Arrow-vectorized Pandas UDF (the needle parses once per batch);
    map-only, no shuffle — but see the module docstring for the
    codegen-friendly alternative when the needle shape is static.
    """
    @pandas_udf("boolean")
    def contains(s: pd.Series) -> pd.Series:
        needle = json.loads(needle_json)

        def one(v):
            if v is None:
                return None
            try:
                return _pg_contains(json.loads(v), needle)
            except ValueError:
                return None

        return s.map(one)

    return contains(_c(col))


def jsonb_contained(col: str | Column, hay_json: str) -> Column:
    """``col <@ hay``: the column value is contained in the constant."""
    @pandas_udf("boolean")
    def contained(s: pd.Series) -> pd.Series:
        hay = json.loads(hay_json)

        def one(v):
            if v is None:
                return None
            try:
                return _pg_contains(hay, json.loads(v))
            except ValueError:
                return None

        return s.map(one)

    return contained(_c(col))


# -- modifiers (`-`, `#-`, `||`) --------------------------------------------
#
# Postgres jsonb modifiers return jsonb; there is no Spark built-in for
# JSON mutation, so these are Arrow-vectorized UDFs. Output text is
# canonicalized (sorted keys, no whitespace) — Postgres jsonb likewise
# re-serializes in its own canonical key order, so queries must not
# depend on the raw byte order of either engine's output; compare via
# extraction (`json_object_keys`, `get_json_object`) instead.


def _dump(obj) -> str:
    return json.dumps(obj, separators=(",", ":"), sort_keys=True)


def jsonb_delete_key(col: str | Column, key: str | int) -> Column:
    """``col - 'key'`` / ``col - index``: remove an object key, a
    matching string element, or an array element by (negative-ok)
    index — the Postgres ``-`` operator."""
    @pandas_udf("string")
    def delete(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            try:
                obj = json.loads(v)
            except ValueError:
                return None
            if isinstance(obj, dict):
                if isinstance(key, str):
                    obj.pop(key, None)
            elif isinstance(obj, list):
                if isinstance(key, str):
                    obj = [x for x in obj if x != key]
                elif -len(obj) <= key < len(obj):
                    obj = obj[:key] + obj[key + 1 :] if key >= 0 else (
                        obj[: len(obj) + key] + obj[len(obj) + key + 1 :]
                    )
            return _dump(obj)

        return s.map(one)

    return delete(_c(col))


def jsonb_delete_path(col: str | Column, keys: list[str | int]) -> Column:
    """``col #- '{a,b,...}'``: remove the value at a path
    (object keys / array indexes along the way). An empty path returns
    the operand unchanged (canonicalized), matching ``#- '{}'``."""
    @pandas_udf("string")
    def delete_path(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            try:
                obj = json.loads(v)
            except ValueError:
                return None
            if not keys:
                return _dump(obj)
            node = obj
            for k in keys[:-1]:
                if isinstance(node, dict) and isinstance(k, str) and k in node:
                    node = node[k]
                elif isinstance(node, list) and isinstance(k, int) and -len(node) <= k < len(node):
                    node = node[k]
                else:
                    return _dump(obj)  # path absent → unchanged (PG behavior)
            last = keys[-1]
            if isinstance(node, dict) and isinstance(last, str):
                node.pop(last, None)
            elif isinstance(node, list) and isinstance(last, int) and -len(node) <= last < len(node):
                del node[last]
            return _dump(obj)

        return s.map(one)

    return delete_path(_c(col))


def _parse_pg_path(p: str) -> list:
    """Accept a path as a JSON array ('["a",0]') or the Postgres
    '{a,0}' literal; numeric segments become array indexes."""
    p = p.strip()
    if p.startswith("["):
        return json.loads(p)
    parts = [seg.strip() for seg in p.strip("{}").split(",") if seg.strip()]
    out: list = []
    for seg in parts:
        try:
            out.append(int(seg))
        except ValueError:
            out.append(seg.strip('"'))
    return out


def register_sql_functions(spark) -> None:
    """Expose the jsonb operator family to `/sql` as two-argument SQL
    functions — the reference's users reach these operators through
    Postgres SQL, so the passthrough surface must offer them too:
    ``jsonb_contains/jsonb_contained/jsonb_exists/jsonb_exists_any/
    jsonb_exists_all/jsonb_delete_key/jsonb_delete_path/jsonb_concat``.

    All are Arrow-vectorized; the second argument is usually a literal,
    parsed once per distinct value. Registration is idempotent per
    session and invalidates the security walker's function cache so the
    new names pass its fail-closed registry check.
    """
    if getattr(spark, "_lagoon_jsonb_udfs", False):
        return

    def _two_arg(fn, ret):
        @pandas_udf(ret)
        def udf(col: pd.Series, arg: pd.Series) -> pd.Series:
            cache: dict = {}

            def parsed(n):
                if n not in cache:
                    try:
                        cache[n] = json.loads(n)
                    except ValueError:
                        cache[n] = ValueError
                return cache[n]

            def one(v, n):
                if v is None or n is None:
                    return None
                try:
                    doc = json.loads(v)
                except ValueError:
                    return None
                return fn(doc, n, parsed)

            return pd.Series(
                [one(v, n) for v, n in zip(col, arg)], dtype="object"
            )

        return udf

    def contains(doc, n, parsed):
        needle = parsed(n)
        return None if needle is ValueError else _pg_contains(doc, needle)

    def contained(doc, n, parsed):
        hay = parsed(n)
        return None if hay is ValueError else _pg_contains(hay, doc)

    def exists(doc, n, _parsed):
        if isinstance(doc, dict):
            return n in doc
        if isinstance(doc, list):
            return n in doc
        return False

    def exists_any(doc, n, parsed):
        keys = parsed(n)
        return None if keys is ValueError else any(exists(doc, k, None) for k in keys)

    def exists_all(doc, n, parsed):
        keys = parsed(n)
        return None if keys is ValueError else all(exists(doc, k, None) for k in keys)

    def delete_key(doc, n, _parsed):
        import numbers

        # an integer argument means index deletion on arrays (Postgres
        # `jsonb - int`), matching the Python-level jsonb_delete_key
        if isinstance(n, numbers.Integral) and not isinstance(n, bool):
            if isinstance(doc, list) and -len(doc) <= n < len(doc):
                del doc[int(n)]
            return _dump(doc)
        if isinstance(doc, dict):
            doc.pop(n, None)
        elif isinstance(doc, list):
            doc = [x for x in doc if x != n]
        return _dump(doc)

    def delete_path(doc, n, _parsed):
        keys = _parse_pg_path(n)
        if not keys:
            return _dump(doc)
        node = doc
        for k in keys[:-1]:
            if isinstance(node, dict) and isinstance(k, str) and k in node:
                node = node[k]
            elif isinstance(node, list) and isinstance(k, int) and -len(node) <= k < len(node):
                node = node[k]
            else:
                return _dump(doc)
        last = keys[-1]
        if isinstance(node, dict) and isinstance(last, str):
            node.pop(last, None)
        elif isinstance(node, list) and isinstance(last, int) and -len(node) <= last < len(node):
            del node[last]
        return _dump(doc)

    def concat(doc, n, parsed):
        other = parsed(n)
        if other is ValueError:
            return None
        if isinstance(doc, dict) and isinstance(other, dict):
            merged = dict(doc)
            merged.update(other)
            return _dump(merged)
        left = doc if isinstance(doc, list) else [doc]
        right = other if isinstance(other, list) else [other]
        return _dump(left + right)

    spark.udf.register("jsonb_contains", _two_arg(contains, "boolean"))
    spark.udf.register("jsonb_contained", _two_arg(contained, "boolean"))
    spark.udf.register("jsonb_exists", _two_arg(exists, "boolean"))
    spark.udf.register("jsonb_exists_any", _two_arg(exists_any, "boolean"))
    spark.udf.register("jsonb_exists_all", _two_arg(exists_all, "boolean"))
    spark.udf.register("jsonb_delete_key", _two_arg(delete_key, "string"))
    spark.udf.register("jsonb_delete_path", _two_arg(delete_path, "string"))
    spark.udf.register("jsonb_concat", _two_arg(concat, "string"))
    spark._lagoon_jsonb_udfs = True

    # the security walker caches SHOW FUNCTIONS per session — a cache
    # built before this registration would fail-closed on the new names
    from lagoon_spark import security

    security._session_fn_cache.pop(spark, None)


def jsonb_concat(col: str | Column, other_json: str) -> Column:
    """``col || other``: shallow object merge (right wins), array
    concatenation, scalar-to-array promotion — the Postgres ``||``
    operator with a constant right side."""
    other = json.loads(other_json)

    @pandas_udf("string")
    def concat(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            try:
                obj = json.loads(v)
            except ValueError:
                return None
            if isinstance(obj, dict) and isinstance(other, dict):
                merged = dict(obj)
                merged.update(other)
                return _dump(merged)
            left = obj if isinstance(obj, list) else [obj]
            right = other if isinstance(other, list) else [other]
            return _dump(left + right)

        return s.map(one)

    return concat(_c(col))
