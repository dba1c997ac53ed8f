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
    """``col ? key`` with the full Postgres shape rules, pure JVM:
    object → top-level key present; array → some *string* element
    equals the key; string scalar → equality; other scalars → false;
    invalid / NULL json → NULL."""
    c = _c(col)
    keys = F.json_object_keys(c)
    arr = F.from_json(c, "array<variant>")
    # ensure_ascii=False: compared against Spark's raw-UTF-8 variant
    # to_json output — \uXXXX escapes would miss non-ASCII keys
    quoted = F.lit(json.dumps(key, ensure_ascii=False))
    return (
        F.when(keys.isNotNull(), F.array_contains(keys, key))
        .when(arr.isNotNull(), F.exists(arr, lambda e: F.to_json(e) == quoted))
        .when(
            F.try_parse_json(c).isNotNull(),
            F.to_json(F.try_parse_json(c)) == quoted,
        )
        .otherwise(F.lit(None).cast("boolean"))
    )


def jsonb_exists_all(col: str | Column, keys: list[str]) -> Column:
    """``col ?& keys``: all keys present (PG shape rules per key)."""
    out = F.lit(True)
    for k in keys:
        out = out & jsonb_exists(col, k)
    return out


def jsonb_exists_any(col: str | Column, keys: list[str]) -> Column:
    """``col ?| keys``: any key present (PG shape rules per key)."""
    out = F.lit(False)
    for k in keys:
        out = out | jsonb_exists(col, k)
    return out


# -- structural containment (`@>`, `<@`) ------------------------------------
#
# Two execution tiers. The general tier is an Arrow-vectorized Pandas
# UDF implementing the full recursive Postgres containment rules. The
# fast tier handles the dominant case — a *flat object* needle (all
# values scalar) — entirely JVM-side with Spark 4 variant expressions,
# keeping the whole plan in codegen with no Python worker round-trip:
#
#   to_json(try_variant_get(v, '$.k', 'variant'))
#
# distinguishes `7` from `"7"` (the text keeps JSON quoting), so each
# needle pair compiles to one typed comparison. Numbers compare via a
# double cast guarded by a not-a-JSON-string check (PG's cross-scale
# numeric equality: 7 contains 7.0); huge integers beyond 2^53 fall
# back to the UDF so double rounding can never conflate distinct ints.

_SAFE_KEY = None  # compiled lazily


def _key_path_safe(k: str) -> bool:
    """Keys that embed verbatim into a variant_get path (`$.k`)."""
    global _SAFE_KEY
    if _SAFE_KEY is None:
        import re

        _SAFE_KEY = re.compile(r"^[A-Za-z0-9_]+$")
    return bool(_SAFE_KEY.match(k))


def _flat_needle(needle_json: str):
    """Parse the needle; return the dict when the JVM tier applies
    (flat object, path-safe keys, doubles-safe numbers), else None."""
    try:
        needle = json.loads(needle_json)
    except ValueError:
        return None
    if not isinstance(needle, dict):
        return None
    for k, v in needle.items():
        if not isinstance(k, str) or not _key_path_safe(k):
            return None
        if isinstance(v, (dict, list)):
            return None
        if isinstance(v, int) and not isinstance(v, bool) and abs(v) > 2**53:
            return None
    return needle


def _flat_term(kv: Column, val) -> Column:
    """One flat-needle term over the key's SUB-VARIANT column.

    Shared by the Column tier (which passes
    ``try_variant_get(v, "$.k", "variant")``) and the staged tier
    (which passes the materialized ``__kv<i>`` attribute) so the
    Postgres containment semantics — null/bool/numeric/string kind
    checks and the missing-key gate — live in exactly one place
    (ADVICE r12: the tiers had drifted-prone duplicate branches).
    """
    kj = F.to_json(kv)
    if val is None:
        t = kj == F.lit("null")
    elif isinstance(val, bool):
        t = kj == F.lit("true" if val else "false")
    elif isinstance(val, (int, float)):
        t = (
            kj.isNotNull()
            & ~kj.startswith('"')
            & ~kj.isin("true", "false", "null")
            & (F.try_variant_get(kv, "$", "double") == F.lit(float(val)))
        )
    else:  # str
        t = kj.startswith('"') & (
            F.try_variant_get(kv, "$", "string") == F.lit(val)
        )
    return F.coalesce(t, F.lit(False))


def _jvm_flat_contains(col: Column, needle: dict) -> Column:
    """`col @> needle` for a flat object needle, pure JVM expressions."""
    v = F.try_parse_json(col)
    if not needle:
        # `doc @> '{}'` is true iff doc is an object
        ok = F.schema_of_variant(v).startswith("OBJECT")
    else:
        terms = [
            _flat_term(F.try_variant_get(v, f"$.{k}", "variant"), val)
            for k, val in needle.items()
        ]
        ok = terms[0]
        for t in terms[1:]:
            ok = ok & t
    return F.when(
        col.isNull() | v.isNull(), F.lit(None).cast("boolean")
    ).otherwise(ok)


def filter_jsonb_contains(df, col: str, needle_json: str):
    """``df WHERE col @> needle``, with the parse staged once per row.

    :func:`jsonb_contains` is a Column: its flat-needle JVM tier
    references ``try_parse_json(col)`` once per term, and variant
    ``invoke`` expressions are NOT subexpression-eliminated by
    whole-stage codegen (unlike plain functions — measured, not
    assumed: the same barrier on minhash's fold was a wash, while
    here the repeated parse costs 2×: 8.9 → 4.3 s on the 10× events
    replica). Staging the parsed sub-variants through a one-element
    generator barrier makes every term read the materialized
    attribute. Row count and filter semantics are identical; the
    barrier column is dropped before returning.

    Non-flat needles fall back to the vectorized UDF tier unchanged.
    """
    flat = _flat_needle(needle_json)
    if flat is None:
        return df.filter(jsonb_contains(col, needle_json))
    c = F.col(col)
    v = F.try_parse_json(c)
    fields = [v.isNull().alias("__vnull")]
    for i, k in enumerate(flat):
        fields.append(F.try_variant_get(v, f"$.{k}", "variant").alias(f"__kv{i}"))
    if not flat:
        fields.append(F.schema_of_variant(v).alias("__vschema"))
    # pick a barrier alias that can't collide with a caller column
    # (ADVICE r12: a frame already carrying __jb would make every
    # __jb.* reference ambiguous at analysis time)
    jb = "__jb"
    while jb in df.columns:
        jb += "_"
    staged = df.select(
        "*", F.explode(F.array(F.struct(*fields))).alias(jb)
    )
    if not flat:
        ok = F.col(f"{jb}.__vschema").startswith("OBJECT")
    else:
        terms = [
            _flat_term(F.col(f"{jb}.__kv{i}"), val)
            for i, val in enumerate(flat.values())
        ]
        ok = terms[0]
        for t in terms[1:]:
            ok = ok & t
    pred = F.when(
        c.isNull() | F.col(f"{jb}.__vnull"), F.lit(None).cast("boolean")
    ).otherwise(ok)
    return staged.filter(pred).drop(jb)


def _pg_eq(a, b) -> bool:
    """jsonb scalar equality: like Python ``==`` EXCEPT that booleans
    are their own kind (Postgres: ``'1' @> 'true'`` is false; Python's
    ``1 == True`` would say otherwise)."""
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a == b
    return a == b


def _pg_contains(hay, needle) -> bool:
    """Postgres jsonb containment: objects need every needle pair
    contained; arrays need every needle element contained in some
    haystack element (scalar needle in array haystack also matches);
    scalars compare by equality (kind-separated, see :func:`_pg_eq`)."""
    if isinstance(needle, dict):
        if not isinstance(hay, dict):
            return False
        return all(k in hay and _pg_contains(hay[k], v) for k, v in needle.items())
    if isinstance(needle, list):
        if not isinstance(hay, list):
            return False
        return all(any(_pg_contains(h, n) for h in hay) for n in needle)
    if isinstance(hay, list):
        # scalar-in-array special case
        return any(_pg_eq(h, needle) for h in hay)
    return _pg_eq(hay, needle)


def jsonb_contains(col: str | Column, needle_json: str) -> Column:
    """``col @> needle``: structural containment of a constant needle.

    Flat object needles (the dominant case) compile to pure JVM variant
    expressions — no Python worker in the plan. Nested / array / scalar
    needles ride the general Arrow-vectorized Pandas UDF (the needle
    parses once per batch); both tiers are map-only, no shuffle.
    """
    flat = _flat_needle(needle_json)
    if flat is not None:
        return _jvm_flat_contains(_c(col), flat)

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
    # ensure_ascii=False: raw UTF-8, matching both Postgres jsonb
    # output and Spark's variant to_json (keeps the two tiers
    # byte-identical on non-ASCII content)
    return json.dumps(obj, separators=(",", ":"), sort_keys=True, ensure_ascii=False)


def _entries_to_json(entries: Column) -> Column:
    """Serialize an ``array<struct<key:string,value:variant>>`` to
    canonical JSON object text (sorted keys, no whitespace), pure JVM.

    The entries comparator-sort by key (variants are unorderable, so
    struct sort won't do), then ONE ``to_json`` over the rebuilt map —
    measured 2× faster than per-entry serialization at sf0.1. Spark
    owns all escaping."""
    ordered = F.array_sort(
        entries,
        lambda a, b: F.when(a["key"] < b["key"], -1)
        .when(a["key"] > b["key"], 1)
        .otherwise(0),
    )
    return F.to_json(F.map_from_entries(ordered))


# -- the map-level jsonb pipeline -------------------------------------------
#
# Postgres jsonb is a binary type, so `(doc - 'k') || '{"z":"w"}'`
# parses the document ONCE. Text-typed Column operators lose that: each
# operator would re-parse its predecessor's serialized output. The
# pipeline below is the Spark analog of the binary type —
# `map<string,variant>` — with parse/serialize at the ends only. The
# object_only text operators are thin wrappers over it, and they FUSE:
# a jsonb text operator receiving another's output recognizes it (the
# `_lagoon_jsonb_map` attribute rides on the returned Column) and
# continues from the unserialized map, so composed chains cost one
# parse + one serialize no matter their length.


def jsonb_object(col: str | Column) -> Column:
    """Parse a JSON *object* document to ``map<string,variant>``
    (NULL for non-objects / invalid JSON) — the pipeline entry."""
    return F.from_json(_c(col), "map<string,variant>")


def jsonb_drop(mapcol: Column, keys: list[str]) -> Column:
    """Remove keys from a parsed object (PG ``- key`` on the map tier)."""
    return F.map_filter(
        mapcol, lambda k, _v: ~k.isin(*[F.lit(x) for x in keys])
    )


def jsonb_merge(mapcol: Column, other_json: str) -> Column:
    """Shallow-merge a constant object into a parsed object, right
    wins (PG ``||`` on the map tier). Nested constant values fine."""
    other = json.loads(other_json)
    if not isinstance(other, dict):
        raise ValueError("jsonb_merge needs a JSON object constant")
    if not other:
        return mapcol
    keep = F.map_filter(
        mapcol, lambda k, _v: ~k.isin(*[F.lit(x) for x in other.keys()])
    )
    const_entries = F.array(
        *[
            F.struct(
                F.lit(k).alias("key"),
                F.parse_json(F.lit(_dump(v))).alias("value"),
            )
            for k, v in other.items()
        ]
    )
    return F.map_from_entries(
        F.concat(F.map_entries(keep), const_entries)
    )


def jsonb_text(mapcol: Column) -> Column:
    """Serialize a parsed object back to canonical text (sorted keys,
    no whitespace) — the pipeline exit. NULL stays NULL."""
    return F.when(mapcol.isNull(), F.lit(None).cast("string")).otherwise(
        _entries_to_json(F.map_entries(mapcol))
    )


def _as_map(col) -> tuple[Column, Column]:
    """(parsed map, null-gate) for a text operand — reusing the
    predecessor's unserialized map when the operand is itself the
    output of an object_only jsonb operator. The marker is read from
    ``__dict__`` directly: ``Column.__getattr__`` resolves unknown
    names as struct-field access, so a plain getattr would fabricate a
    bogus Column instead of missing."""
    if not isinstance(col, str):
        fused = col.__dict__.get("_lagoon_jsonb_map")
        if fused is not None:
            return fused
    m = jsonb_object(col)
    return m, m


def jsonb_map_and_gate(col: "str | Column") -> "tuple[Column, Column]":
    """The fused ``(map<string,variant>, null-gate)`` pair behind an
    object_only jsonb operator chain (or a fresh parse for plain text).
    Consumers that only EXTRACT from the chain's result — key lists,
    single values — read the unserialized map directly instead of
    paying the chain's canonical re-serialize plus their own re-parse
    (guide §1.2: don't compute things you throw away). The map is NULL
    exactly when the serialized text would be NULL."""
    return _as_map(col)


def _fused_text(mapcol: Column, gate: Column) -> Column:
    out = F.when(gate.isNull(), F.lit(None).cast("string")).otherwise(
        _entries_to_json(F.map_entries(mapcol))
    )
    out._lagoon_jsonb_map = (mapcol, gate)
    return out


def jsonb_delete_key(
    col: str | Column, key: str | int, *, object_only: bool = False
) -> Column:
    """``col - 'key'`` / ``col - index``: remove an object key, a
    matching string element, or an array element by (negative-ok)
    index — the Postgres ``-`` operator.

    With ``object_only=True`` (caller guarantees every document is a
    JSON object — e.g. after a ``ltrim(col) LIKE '{%'`` filter) and a
    string key, the operator compiles to JVM ``from_json`` →
    ``map<string,variant>`` → ``map_filter`` → canonical re-serialize:
    no Python worker, stays in codegen, and fuses with other
    object_only operators (one parse/serialize per chain). Non-object
    documents return NULL on this tier (an array document would need
    the element-removal semantics only the general tier implements)."""
    if object_only and isinstance(key, str):
        m, gate = _as_map(col)
        return _fused_text(jsonb_drop(m, [key]), gate)

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
                else:
                    # PG parity: `'{"a":1}'::jsonb - 1` is an error
                    raise ValueError(
                        "cannot delete from object using integer index"
                    )
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
    '{a,0}' array literal; numeric unquoted segments become array
    indexes. Quote-aware: '{a,"b,c"}' is two segments, commas and
    backslash escapes inside double quotes are literal, and a quoted
    numeric ('"0"') stays a text key."""
    p = p.strip()
    if p.startswith("["):
        return json.loads(p)
    inner = p[1:-1] if p.startswith("{") and p.endswith("}") else p
    out: list = []
    i, n = 0, len(inner)
    while i < n:
        while i < n and inner[i].isspace():
            i += 1
        if i >= n:
            break
        if inner[i] == '"':
            buf = []
            i += 1
            while i < n and inner[i] != '"':
                if inner[i] == "\\" and i + 1 < n:
                    buf.append(inner[i + 1])
                    i += 2
                else:
                    buf.append(inner[i])
                    i += 1
            i += 1  # closing quote
            out.append("".join(buf))
            while i < n and inner[i] != ",":
                i += 1
            i += 1
        else:
            j = inner.find(",", i)
            if j == -1:
                j = n
            seg = inner[i:j].strip()
            if seg:
                try:
                    out.append(int(seg))
                except ValueError:
                    out.append(seg)
            i = j + 1
    return out


# -- the /sql JVM rewrite tier ------------------------------------------------
#
# The SQL-registered jsonb functions are pandas UDFs for every input:
# a SQL function cannot inspect its needle argument at registration, so
# a `/sql` user never reached the codegen tier the DataFrame user gets
# from `jsonb_contains(col, '<flat literal>')`. The engine closes that
# gap at the TEXT level: before verification, `rewrite_jsonb_sql`
# rewrites each `jsonb_contains(<expr>, '<flat object literal>')` call
# into the same JVM variant expression `_jvm_flat_contains` builds —
# semantics preserved exactly (both tiers are oracle-tested against
# each other), dynamic/nested shapes left on the pandas UDF.


def _sql_str(s: str) -> str:
    """SQL single-quoted literal with '' escaping."""
    return "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"


def flat_contains_sql(operand_sql: str, needle: dict) -> str:
    """SQL text equivalent of :func:`_jvm_flat_contains` for a flat
    object needle over an arbitrary operand expression."""
    op = f"({operand_sql})"
    v = f"try_parse_json({op})"
    if not needle:
        ok = f"startswith(schema_of_variant({v}), 'OBJECT')"
    else:
        terms = []
        for k, val in needle.items():
            kj = f"to_json(try_variant_get({v}, '$.{k}', 'variant'))"
            if val is None:
                t = f"{kj} = 'null'"
            elif isinstance(val, bool):
                t = f"{kj} = '{'true' if val else 'false'}'"
            elif isinstance(val, (int, float)):
                t = (
                    f"({kj} IS NOT NULL AND NOT startswith({kj}, '\"') "
                    f"AND {kj} NOT IN ('true', 'false', 'null') "
                    f"AND try_variant_get({v}, '$.{k}', 'double') = "
                    f"CAST({float(val)!r} AS DOUBLE))"
                )
            else:  # str
                t = (
                    f"(startswith({kj}, '\"') AND "
                    f"try_variant_get({v}, '$.{k}', 'string') = {_sql_str(val)})"
                )
            terms.append(f"coalesce({t}, false)")
        ok = " AND ".join(terms)
    return (
        f"CASE WHEN {op} IS NULL OR {v} IS NULL "
        f"THEN CAST(NULL AS BOOLEAN) ELSE ({ok}) END"
    )


def _scan_call(sql: str, start: int) -> tuple[list[str], int] | None:
    """From the '(' at ``start``, return (top-level args, index past the
    closing paren) — quote- and nesting-aware; None if unbalanced."""
    assert sql[start] == "("
    depth = 0
    args: list[str] = []
    buf: list[str] = []
    i, n = start, len(sql)
    while i < n:
        ch = sql[i]
        if ch in ("'", '"', "`"):
            # SQL string/identifier: '' doubling and \' escapes inside
            q = ch
            j = i + 1
            while j < n:
                if q == "'" and sql[j] == "\\" and j + 1 < n:
                    j += 2
                    continue
                if sql[j] == q:
                    if q == "'" and j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            buf.append(sql[i : j + 1])
            i = j + 1
            continue
        if ch == "(":
            depth += 1
            if depth > 1:
                buf.append(ch)
        elif ch == ")":
            depth -= 1
            if depth == 0:
                args.append("".join(buf).strip())
                return args, i + 1
            buf.append(ch)
        elif ch == "," and depth == 1:
            args.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
        i += 1
    return None


def _string_literal(arg: str) -> str | None:
    """'...'-literal → decoded content (handling '' escapes), else None."""
    arg = arg.strip()
    if len(arg) < 2 or arg[0] != "'" or arg[-1] != "'":
        return None
    inner = arg[1:-1]
    if "\\" in inner:
        # backslash escapes depend on parser config — leave such
        # needles on the pandas tier rather than risk mis-decoding
        return None
    # reject literals whose quotes aren't balanced as '' pairs
    stripped = inner.replace("''", "")
    if "'" in stripped:
        return None
    return inner.replace("''", "'")


def _exists_chain_sql(operand_sql: str, keys: list, op: str) -> str | None:
    """``?&``/``?|`` with a constant key list → an AND/OR chain over the
    expression-bodied (codegen'd) jsonb_exists SQL UDF. PG: empty key
    list is vacuously true for ?& and false for ?|."""
    if not isinstance(keys, list) or not all(isinstance(k, str) for k in keys):
        return None
    if not keys:
        # vacuous truth is still operand-aware: the pandas tier (and PG)
        # returns NULL for a NULL / invalid document, not the constant
        return (
            f"CASE WHEN try_parse_json(({operand_sql})) IS NULL "
            f"THEN CAST(NULL AS BOOLEAN) "
            f"ELSE {'true' if op == 'AND' else 'false'} END"
        )
    return f" {op} ".join(
        f"jsonb_exists(({operand_sql}), {_sql_str(k)})" for k in keys
    )


# SQL snippets shared by the modifier rewrites: entries sorted by key
# (variants are unorderable, so struct sort won't do) then one to_json
# over the rebuilt map — the text twin of `_entries_to_json`.
_KEY_CMP_SQL = (
    "(a, b) -> CASE WHEN a.key < b.key THEN -1 "
    "WHEN a.key > b.key THEN 1 ELSE 0 END"
)


def _sorted_obj_sql(entries_sql: str) -> str:
    return (
        f"to_json(map_from_entries(array_sort({entries_sql}, {_KEY_CMP_SQL})))"
    )


def _flat_hay(hay_json: str):
    """Parse a ``<@`` right side; return the dict when the JVM tier
    applies (flat object, scalar values, doubles-safe numbers), else
    None. Unlike `_flat_needle`, keys need not be path-safe: they embed
    as string literals compared against map keys, never as paths."""
    try:
        hay = json.loads(hay_json)
    except ValueError:
        return None
    if not isinstance(hay, dict):
        return None
    for k, v in hay.items():
        if not isinstance(k, str) or isinstance(v, (dict, list)):
            return None
        if isinstance(v, int) and not isinstance(v, bool) and abs(v) > 2**53:
            return None
    return hay


def contained_flat_sql(operand_sql: str, hay: dict) -> str:
    """SQL text for ``<expr> <@ '<flat object hay>'``, pure JVM: the
    document must be an object whose every entry matches some hay pair
    (key equal, value equal under the PG typed-comparison rules the
    ``@>`` fast tier uses — JSON-text shape probes + a typed variant
    extraction per scalar kind). NULL / invalid documents → NULL;
    non-object documents → false (a flat object can never contain
    them); the empty document is vacuously contained."""
    op = f"({operand_sql})"
    m = f"from_json({op}, 'map<string,variant>')"
    if hay:
        pair_terms = []
        for k, v in hay.items():
            tj = "to_json(e.value)"
            if v is None:
                cond = f"{tj} = 'null'"
            elif isinstance(v, bool):
                cond = f"{tj} = '{'true' if v else 'false'}'"
            elif isinstance(v, (int, float)):
                cond = (
                    f"({tj} IS NOT NULL AND NOT startswith({tj}, '\"') "
                    f"AND {tj} NOT IN ('true', 'false', 'null') "
                    f"AND try_variant_get(e.value, '$', 'double') = "
                    f"CAST({float(v)!r} AS DOUBLE))"
                )
            else:  # str
                cond = (
                    f"(startswith({tj}, '\"') AND "
                    f"try_variant_get(e.value, '$', 'string') = {_sql_str(v)})"
                )
            pair_terms.append(
                f"(e.key = {_sql_str(k)} AND coalesce({cond}, false))"
            )
        match = " OR ".join(pair_terms)
    else:
        match = "false"  # forall over zero entries: only {} <@ {}
    return (
        f"CASE WHEN try_parse_json({op}) IS NULL THEN CAST(NULL AS BOOLEAN) "
        f"WHEN {m} IS NULL THEN false "
        f"ELSE forall(map_entries({m}), e -> {match}) END"
    )


# -- dynamic (column-vs-column) containment, pure JVM ------------------------
#
# The recursive containment over two VARIANT values unrolls to a fixed
# needle-nesting depth. Every level LET-BINDS its operands through
# single-element-array lambdas (``exists(array(x), v -> ...)``) so the
# generated text stays linear per level instead of re-inlining the
# whole operand chain into every reference (the measured 20× Catalyst
# analysis blowup this codebase documents for naked lambda inlining).

#: needle nesting the JVM dynamic tier unrolls to; deeper needles
#: raise_error (loud, never silently wrong) — real jsonb rarely nests
#: past 3-4 levels of CONTAINMENT structure. The unrolled text doubles
#: per level (~30 KB/level after kind-binding); 5+ makes the SQL
#: parser the bottleneck
JSONB_DYNAMIC_DEPTH = 4


def _vkind(x: str) -> str:
    """One-char jsonb kind of a variant: o(bject) a(rray) s(tring)
    b(ool) n(ull) d(number) — schema_of_variant spells the rest."""
    s = f"schema_of_variant({x})"
    return (
        f"(CASE WHEN {s} = 'STRING' THEN 's' WHEN {s} = 'BOOLEAN' THEN 'b' "
        f"WHEN {s} = 'VOID' THEN 'n' WHEN startswith({s}, 'OBJECT') THEN 'o' "
        f"WHEN startswith({s}, 'ARRAY') THEN 'a' ELSE 'd' END)"
    )


def _scalar_eq_sql(x: str, y: str, kx: str | None = None, ky: str | None = None) -> str:
    """jsonb scalar equality over two variants, kind-separated (the
    `_pg_eq` twin). Numbers compare by canonical text (exact at any
    magnitude — the variant writer trims 1.0 to 1, so int/decimal
    cross-kind works) OR by double value within the 2^53-exact range
    (so 100 vs 1e2 works); containers never equal scalars. ``kx``/
    ``ky`` take pre-bound kind variables to keep the unrolled text
    small."""
    kx = kx or _vkind(x)
    ky = ky or _vkind(y)
    big = "9007199254740993"
    return (
        f"({kx} = {ky} AND CASE {kx} "
        f"WHEN 'n' THEN true "
        f"WHEN 's' THEN CAST({x} AS STRING) = CAST({y} AS STRING) "
        f"WHEN 'b' THEN CAST({x} AS BOOLEAN) = CAST({y} AS BOOLEAN) "
        f"WHEN 'd' THEN (to_json({x}) = to_json({y}) OR ("
        f"try_cast({x} AS DOUBLE) = try_cast({y} AS DOUBLE) "
        f"AND abs(try_cast({x} AS DOUBLE)) < CAST({big} AS DOUBLE))) "
        f"ELSE false END)"
    )


def _json_depth(v) -> int:
    """Container nesting depth of a parsed JSON value (scalars 0)."""
    if isinstance(v, dict):
        return 1 + max((_json_depth(x) for x in v.values()), default=0)
    if isinstance(v, list):
        return 1 + max((_json_depth(x) for x in v), default=0)
    return 0


def _contains_variant_sql(
    h: str, n: str, depth: int, d: int = 0, floor: str = "raise"
) -> str:
    """`_pg_contains` over two variant-typed SQL expressions, unrolled
    to ``depth`` levels of needle nesting. Each level let-binds its
    operands AND their kind chars through single-element-array lambdas
    so the text grows ~30 KB per level, not exponentially in reference
    count.

    ``floor`` decides what a still-nested needle at the unroll floor
    does: ``"raise"`` (dynamic needles of unknown depth — loud, never
    silently wrong) or ``"false"`` (EXACT when the unroll covers the
    full depth of one side: recursion steps both sides together, so
    past the known side's depth the other side faces a scalar and a
    container needle is simply not contained)."""
    hv, nv, hk, nk = f"hv{d}", f"nv{d}", f"hk{d}", f"nk{d}"
    if d >= depth:
        if floor == "raise":
            deep = (
                f"CAST(raise_error('jsonb containment: needle nesting "
                f"exceeds the JVM tier depth ({depth}); rewrite the query "
                f"with a constant needle or raise JSONB_DYNAMIC_DEPTH') "
                f"AS BOOLEAN)"
            )
        else:
            deep = "false"
        body = (
            f"(CASE WHEN {nk} IN ('o', 'a') THEN {deep} "
            f"WHEN {hk} = 'a' THEN "
            f"exists(try_cast({hv} AS ARRAY<VARIANT>), "
            f"he{d} -> {_scalar_eq_sql(f'he{d}', nv, ky=nk)}) "
            f"ELSE {_scalar_eq_sql(hv, nv, kx=hk, ky=nk)} END)"
        )
    else:
        hm = f"try_cast({hv} AS MAP<STRING, VARIANT>)"
        nm = f"try_cast({nv} AS MAP<STRING, VARIANT>)"
        ha = f"try_cast({hv} AS ARRAY<VARIANT>)"
        na = f"try_cast({nv} AS ARRAY<VARIANT>)"
        e, ne_, he_ = f"e{d}", f"ne{d}", f"he{d}"
        inner_obj = _contains_variant_sql(
            f"try_element_at({hm}, {e}.key)", f"{e}.value", depth, d + 1, floor
        )
        inner_arr = _contains_variant_sql(he_, ne_, depth, d + 1, floor)
        body = (
            f"(CASE "
            f"WHEN {nk} = 'o' THEN {hk} = 'o' AND "
            f"forall(map_entries({nm}), {e} -> "
            f"map_contains_key({hm}, {e}.key) AND {inner_obj}) "
            f"WHEN {nk} = 'a' THEN {hk} = 'a' AND "
            f"forall({na}, {ne_} -> exists({ha}, {he_} -> {inner_arr})) "
            f"WHEN {hk} = 'a' THEN "
            f"exists({ha}, {he_} -> {_scalar_eq_sql(he_, nv, ky=nk)}) "
            f"ELSE {_scalar_eq_sql(hv, nv, kx=hk, ky=nk)} END)"
        )
    # let-bind operands and kinds once per level
    return (
        f"exists(array({h}), {hv} -> exists(array({n}), {nv} -> "
        f"exists(array({_vkind(hv)}), {hk} -> "
        f"exists(array({_vkind(nv)}), {nk} -> {body}))))"
    )


def contains_dynamic_sql(
    operand_sql: str,
    needle_sql: str,
    depth: int | None = None,
    floor: str = "raise",
) -> str:
    """``<hay expr> @> <needle expr>`` with BOTH sides dynamic, pure
    JVM — the round-7 verdict-#7 tier: full recursive Postgres
    containment semantics (the `_pg_contains` twin, fuzz-parity-tested)
    compiled as one whole-stage-codegen expression. NULL / unparseable
    on either side → NULL, like the pandas tier. Needles nested deeper
    than ``depth`` raise_error rather than silently answering."""
    depth = JSONB_DYNAMIC_DEPTH if depth is None else depth
    # CAST AS STRING mirrors the pandas UDF's string-typed signature
    # (a numeric literal or column coerces instead of failing analysis)
    op = f"(CAST(({operand_sql}) AS STRING))"
    ne = f"(CAST(({needle_sql}) AS STRING))"
    return (
        f"CASE WHEN {op} IS NULL OR {ne} IS NULL "
        f"OR try_parse_json({op}) IS NULL OR try_parse_json({ne}) IS NULL "
        f"THEN CAST(NULL AS BOOLEAN) ELSE "
        + _contains_variant_sql(
            f"try_parse_json({op})", f"try_parse_json({ne})", depth, 0, floor
        )
        + " END"
    )


def delete_key_sql(operand_sql: str, key: str) -> str:
    """SQL text for ``<expr> - '<key>'`` with the FULL Postgres shape
    semantics, pure JVM: object → drop the key, re-serialize sorted-
    canonical; array → drop string elements equal to the key; scalar →
    canonical re-serialize unchanged; NULL / invalid → NULL."""
    op = f"({operand_sql})"
    m = f"from_json({op}, 'map<string,variant>')"
    entries = f"filter(map_entries({m}), e -> e.key <> {_sql_str(key)})"
    arr = f"from_json({op}, 'array<variant>')"
    # ensure_ascii=False: Spark's variant to_json emits raw UTF-8, so a
    # \uXXXX-escaped comparand would silently keep non-ASCII elements
    # the pandas tier (and Postgres '-') delete (round-7 ADVICE fix)
    quoted = _sql_str(json.dumps(key, ensure_ascii=False))
    return (
        f"CASE WHEN try_parse_json({op}) IS NULL THEN CAST(NULL AS STRING) "
        f"WHEN json_object_keys({op}) IS NOT NULL THEN {_sorted_obj_sql(entries)} "
        f"WHEN {arr} IS NOT NULL "
        f"THEN to_json(filter({arr}, e -> to_json(e) <> {quoted})) "
        f"ELSE to_json(try_parse_json({op})) END"
    )


def delete_key_dynamic_sql(operand_sql: str, key_sql: str) -> str:
    """SQL text for ``<expr> - <dynamic key expr>``, pure JVM (round-8
    verdict #5 — the modifier twin of `contains_dynamic_sql`). The key
    expression's SQL type picks the Postgres operator at runtime via
    ``typeof()``: integer family → array index deletion (object → the
    same loud error as the pandas tier and PG); string → object-key /
    string-element deletion; any other key type raise_errors — loud,
    never silently wrong, the same fail-closed policy as the
    containment depth guard. Operand and key are let-bound through one
    single-element ``transform`` so a chained operand inlines once."""
    d, k = "x.d", "x.k"
    m = f"from_json({d}, 'map<string,variant>')"
    arr = f"from_json({d}, 'array<variant>')"
    obj = f"json_object_keys({d}) IS NOT NULL"
    ks = f"CAST({k} AS STRING)"
    ki = f"try_cast({k} AS INT)"
    entries = f"filter(map_entries({m}), e -> e.key <> {ks})"
    # array string-element removal compares the DECODED string (escapes
    # can't diverge); the LIKE guard keeps numbers from coercing
    str_arr = (
        f"to_json(filter({arr}, e -> NOT (to_json(e) LIKE '\"%' "
        f"AND try_variant_get(e, '$', 'string') = {ks})))"
    )
    idx = f"(CASE WHEN {ki} >= 0 THEN {ki} ELSE size({arr}) + {ki} END)"
    kept = f"filter({arr}, (e, i) -> i <> {idx})"
    in_range = f"({idx} >= 0 AND {idx} < size({arr}))"
    unchanged = f"to_json(try_parse_json({d}))"
    body = (
        f"CASE WHEN {d} IS NULL OR {k} IS NULL "
        f"OR try_parse_json({d}) IS NULL THEN CAST(NULL AS STRING) "
        f"WHEN typeof({k}) IN ('tinyint', 'smallint', 'int', 'bigint') THEN "
        f"CASE WHEN {obj} THEN CAST(raise_error("
        f"'cannot delete from object using integer index') AS STRING) "
        f"WHEN {arr} IS NOT NULL THEN "
        f"to_json(CASE WHEN {in_range} THEN {kept} ELSE {arr} END) "
        f"ELSE {unchanged} END "
        f"WHEN typeof({k}) = 'string' THEN "
        f"CASE WHEN {obj} THEN {_sorted_obj_sql(entries)} "
        f"WHEN {arr} IS NOT NULL THEN {str_arr} "
        f"ELSE {unchanged} END "
        f"ELSE CAST(raise_error(concat('jsonb_delete_key: unsupported "
        f"dynamic key type ', typeof({k}), "
        f"'; use a string key or an integer index')) AS STRING) END"
    )
    return (
        f"element_at(transform(array(named_struct("
        f"'d', CAST(({operand_sql}) AS STRING), 'k', ({key_sql}))), "
        f"x -> {body}), 1)"
    )


def concat_dynamic_sql(operand_sql: str, other_sql: str) -> str:
    """SQL text for ``<expr> || <dynamic expr>``, pure JVM, full PG
    shape semantics: object || object → shallow merge (right wins,
    sorted-canonical); anything else → array-promote both sides and
    concatenate; NULL / invalid either side → NULL. The merge is
    shallow by definition, so no depth guard is needed; values
    re-serialize through the variant writer (the documented
    canonicalization caveat every JVM modifier tier shares)."""
    d, o = "x.d", "x.o"
    md = f"from_json({d}, 'map<string,variant>')"
    mo = f"from_json({o}, 'map<string,variant>')"
    ad = f"from_json({d}, 'array<variant>')"
    ao = f"from_json({o}, 'array<variant>')"
    entries = (
        f"concat(filter(map_entries({md}), "
        f"e -> NOT map_contains_key({mo}, e.key)), map_entries({mo}))"
    )
    larr = f"coalesce({ad}, array(try_parse_json({d})))"
    rarr = f"coalesce({ao}, array(try_parse_json({o})))"
    body = (
        f"CASE WHEN {d} IS NULL OR {o} IS NULL "
        f"OR try_parse_json({d}) IS NULL OR try_parse_json({o}) IS NULL "
        f"THEN CAST(NULL AS STRING) "
        f"WHEN json_object_keys({d}) IS NOT NULL "
        f"AND json_object_keys({o}) IS NOT NULL "
        f"THEN {_sorted_obj_sql(entries)} "
        f"ELSE to_json(concat({larr}, {rarr})) END"
    )
    return (
        f"element_at(transform(array(named_struct("
        f"'d', CAST(({operand_sql}) AS STRING), "
        f"'o', CAST(({other_sql}) AS STRING))), x -> {body}), 1)"
    )


#: dynamic #- paths unroll to this many segments; longer runtime paths
#: raise_error (the object/array rebuild doubles the expression text
#: per level, so the cap is tighter than the containment unroll)
JSONB_PATH_DYNAMIC_DEPTH = 3


def delete_path_dynamic_sql(operand_sql: str, path_sql: str) -> str:
    """SQL text for ``<expr> #- <dynamic path expr>``, pure JVM, for
    SIMPLE runtime paths: the Postgres ``'{a,b,0}'`` array-literal form
    with unquoted segments, walked to ``JSONB_PATH_DYNAMIC_DEPTH``
    levels. Unquoted numeric segments are array indexes (``_parse_pg_path``
    parity); a numeric segment against an object — or a key segment
    against an array — leaves the document unchanged, like the pandas
    tier and PG. Quoted/escaped segments, the ``'["a",0]'`` JSON form,
    and paths longer than the unroll raise_error: loud, never silently
    wrong (the containment depth-guard policy)."""
    depth = JSONB_PATH_DYNAMIC_DEPTH
    d, p, g = "x.d", "x.p", "g"
    seg_is_int = "({s} RLIKE '^-?[0-9]+$')"

    def canonical(sub: str) -> str:
        m = f"from_json(({sub}), 'map<string,variant>')"
        arr = f"from_json(({sub}), 'array<variant>')"
        return (
            f"CASE WHEN json_object_keys(({sub})) IS NOT NULL "
            f"THEN {_sorted_obj_sql(f'map_entries({m})')} "
            f"WHEN {arr} IS NOT NULL THEN to_json({arr}) "
            f"ELSE to_json(try_parse_json(({sub}))) END"
        )

    def level(sub: str, lvl: int) -> str:
        if lvl >= depth:
            return (
                f"CAST(raise_error('jsonb #- : dynamic path length "
                f"exceeds the JVM tier depth ({depth}); use a constant "
                f"path or raise JSONB_PATH_DYNAMIC_DEPTH') AS STRING)"
            )
        m = f"from_json(({sub}), 'map<string,variant>')"
        arr = f"from_json(({sub}), 'array<variant>')"
        obj = f"json_object_keys(({sub})) IS NOT NULL"
        seg = f"element_at({g}, {lvl + 1})"
        is_int = seg_is_int.format(s=seg)
        ki = f"try_cast({seg} AS INT)"
        idx = f"(CASE WHEN {ki} >= 0 THEN {ki} ELSE size({arr}) + {ki} END)"
        e, i = f"e{lvl}", f"i{lvl}"
        unchanged = f"to_json(try_parse_json(({sub})))"
        can_obj = _sorted_obj_sql(f"map_entries({m})")
        # last segment: delete here
        last_entries = (
            f"filter(map_entries({m}), {e} -> {e}.key <> {seg})"
        )
        kept = f"filter({arr}, ({e}, {i}) -> {i} <> {idx})"
        in_range = f"({idx} >= 0 AND {idx} < size({arr}))"
        last = (
            f"CASE WHEN {obj} THEN "
            f"(CASE WHEN {is_int} THEN {can_obj} "
            f"ELSE {_sorted_obj_sql(last_entries)} END) "
            f"WHEN {arr} IS NOT NULL THEN "
            f"(CASE WHEN {is_int} THEN "
            f"to_json(CASE WHEN {in_range} THEN {kept} ELSE {arr} END) "
            f"ELSE to_json({arr}) END) "
            f"ELSE {unchanged} END"
        )
        # intermediate segment: rebuild the matched child in place
        inner_obj = level(f"to_json({e}.value)", lvl + 1)
        inner_arr = level(f"to_json({e})", lvl + 1)
        rebuilt_obj = (
            f"transform(map_entries({m}), {e} -> "
            f"CASE WHEN {e}.key = {seg} THEN named_struct("
            f"'key', {e}.key, 'value', parse_json({inner_obj})) "
            f"ELSE {e} END)"
        )
        rebuilt_arr = (
            f"transform({arr}, ({e}, {i}) -> "
            f"CASE WHEN {i} = {idx} THEN parse_json({inner_arr}) "
            f"ELSE {e} END)"
        )
        inter = (
            f"CASE WHEN {obj} THEN "
            f"(CASE WHEN {is_int} THEN {can_obj} "
            f"ELSE {_sorted_obj_sql(rebuilt_obj)} END) "
            f"WHEN {arr} IS NOT NULL THEN "
            f"(CASE WHEN {is_int} THEN to_json({rebuilt_arr}) "
            f"ELSE to_json({arr}) END) "
            f"ELSE {unchanged} END"
        )
        return (
            f"(CASE WHEN size({g}) = {lvl + 1} THEN {last} "
            f"ELSE {inter} END)"
        )

    # segments: lenient '{...}' strip, comma split, trim, drop empties
    # (mirrors _parse_pg_path's skip of empty segments); quotes and
    # backslashes are detected via chr() so no literal-escaping games
    bad = (
        f"(contains({p}, chr(34)) OR contains({p}, chr(92)) "
        f"OR startswith({p}, '['))"
    )
    inner = (
        f"CASE WHEN startswith({p}, '{{') AND endswith({p}, '}}') "
        f"THEN substring({p}, 2, length({p}) - 2) ELSE {p} END"
    )
    segs = (
        f"filter(transform(split({inner}, ','), s -> trim(s)), "
        f"s -> s <> '')"
    )
    body = (
        f"CASE WHEN {d} IS NULL OR {p} IS NULL "
        f"OR try_parse_json({d}) IS NULL THEN CAST(NULL AS STRING) "
        f"WHEN {bad} THEN CAST(raise_error('jsonb #- : quoted/escaped "
        f"or JSON-form dynamic paths are not JVM-compilable; use a "
        f"constant path') AS STRING) "
        f"ELSE element_at(transform(array({segs}), {g} -> "
        f"CASE WHEN size({g}) = 0 THEN {canonical(d)} "
        f"ELSE {level(d, 0)} END), 1) END"
    )
    return (
        f"element_at(transform(array(named_struct("
        f"'d', CAST(({operand_sql}) AS STRING), "
        f"'p', trim(CAST(({path_sql}) AS STRING)))), x -> {body}), 1)"
    )


def _stable_const(v) -> bool:
    """True when a constant right-side value renders identically through
    Python json and Spark's variant writer. Integral floats are the
    known divergence (variant trims `1.0` to `1`); such constants stay
    on the pandas tier so a literal the user wrote as `1.0` round-trips
    byte-identically."""
    if isinstance(v, float):
        return not v.is_integer()
    if isinstance(v, dict):
        return all(_stable_const(x) for x in v.values())
    if isinstance(v, list):
        return all(_stable_const(x) for x in v)
    return True


def concat_obj_sql(operand_sql: str, other: dict) -> str:
    """SQL text for ``<expr> || '<object literal>'`` with the FULL
    Postgres shape semantics, pure JVM: object → shallow merge (right
    wins), sorted-canonical; array → append the object as one element;
    scalar → two-element array promotion; NULL / invalid → NULL."""
    op = f"({operand_sql})"
    m = f"from_json({op}, 'map<string,variant>')"
    if other:
        keys_in = ", ".join(_sql_str(k) for k in other)
        keep = f"filter(map_entries({m}), e -> e.key NOT IN ({keys_in}))"
        consts = ", ".join(
            f"named_struct('key', {_sql_str(k)}, "
            f"'value', parse_json({_sql_str(_dump(v))}))"
            for k, v in other.items()
        )
        entries = f"concat({keep}, array({consts}))"
    else:
        entries = f"map_entries({m})"
    arr = f"from_json({op}, 'array<variant>')"
    other_lit = f"parse_json({_sql_str(_dump(other))})"
    return (
        f"CASE WHEN try_parse_json({op}) IS NULL THEN CAST(NULL AS STRING) "
        f"WHEN json_object_keys({op}) IS NOT NULL THEN {_sorted_obj_sql(entries)} "
        f"WHEN {arr} IS NOT NULL "
        f"THEN to_json(concat({arr}, array({other_lit}))) "
        f"ELSE to_json(array(try_parse_json({op}), {other_lit})) END"
    )


def delete_path_sql(operand_sql: str, path: list) -> str:
    """SQL text for ``<expr> #- '<path>'`` with the FULL Postgres shape
    semantics, pure JVM, for a constant path: traverse object keys /
    array indexes (negative ok), delete at the last segment, absent or
    type-mismatched segments leave the document unchanged (PG
    behavior), everything re-serializes canonically. The rebuild
    recurses per path segment — constant depth, so the expression stays
    linear in the path length. Lambda variables are depth-suffixed so
    nested rebuilds never capture each other's bindings."""

    def canonical(sub: str) -> str:
        m = f"from_json(({sub}), 'map<string,variant>')"
        arr = f"from_json(({sub}), 'array<variant>')"
        return (
            f"CASE WHEN json_object_keys(({sub})) IS NOT NULL "
            f"THEN {_sorted_obj_sql(f'map_entries({m})')} "
            f"WHEN {arr} IS NOT NULL THEN to_json({arr}) "
            f"ELSE to_json(try_parse_json(({sub}))) END"
        )

    def rec(sub: str, segs: list, d: int) -> str:
        m = f"from_json(({sub}), 'map<string,variant>')"
        arr = f"from_json(({sub}), 'array<variant>')"
        obj_guard = f"json_object_keys(({sub})) IS NOT NULL"
        seg = segs[0]
        e, i = f"e{d}", f"i{d}"
        if len(segs) == 1:
            if isinstance(seg, str):
                entries = (
                    f"filter(map_entries({m}), {e} -> {e}.key <> {_sql_str(seg)})"
                )
                return (
                    f"CASE WHEN {obj_guard} THEN {_sorted_obj_sql(entries)} "
                    f"WHEN {arr} IS NOT NULL THEN to_json({arr}) "
                    f"ELSE to_json(try_parse_json(({sub}))) END"
                )
            idx = f"(CASE WHEN {seg} >= 0 THEN {seg} ELSE size({arr}) + {seg} END)"
            kept = f"filter({arr}, ({e}, {i}) -> {i} <> {idx})"
            in_range = f"({idx} >= 0 AND {idx} < size({arr}))"
            return (
                f"CASE WHEN {obj_guard} THEN "
                f"{_sorted_obj_sql(f'map_entries({m})')} "
                f"WHEN {arr} IS NOT NULL THEN "
                f"to_json(CASE WHEN {in_range} THEN {kept} ELSE {arr} END) "
                f"ELSE to_json(try_parse_json(({sub}))) END"
            )
        if isinstance(seg, str):
            inner = rec(f"to_json({e}.value)", segs[1:], d + 1)
            rebuilt = (
                f"transform(map_entries({m}), {e} -> "
                f"CASE WHEN {e}.key = {_sql_str(seg)} "
                f"THEN named_struct('key', {e}.key, 'value', parse_json({inner})) "
                f"ELSE {e} END)"
            )
            return (
                f"CASE WHEN {obj_guard} THEN {_sorted_obj_sql(rebuilt)} "
                f"WHEN {arr} IS NOT NULL THEN to_json({arr}) "
                f"ELSE to_json(try_parse_json(({sub}))) END"
            )
        idx = f"(CASE WHEN {seg} >= 0 THEN {seg} ELSE size({arr}) + {seg} END)"
        inner = rec(f"to_json({e})", segs[1:], d + 1)
        rebuilt = (
            f"transform({arr}, ({e}, {i}) -> "
            f"CASE WHEN {i} = {idx} THEN parse_json({inner}) ELSE {e} END)"
        )
        return (
            f"CASE WHEN {obj_guard} THEN {_sorted_obj_sql(f'map_entries({m})')} "
            f"WHEN {arr} IS NOT NULL THEN to_json({rebuilt}) "
            f"ELSE to_json(try_parse_json(({sub}))) END"
        )

    op = f"({operand_sql})"
    body = canonical(op) if not path else rec(op, path, 0)
    return (
        f"CASE WHEN try_parse_json({op}) IS NULL THEN CAST(NULL AS STRING) "
        f"ELSE {body} END"
    )


_UNPARSED = object()  # sentinel: a literal that is not valid JSON


def rewrite_jsonb_sql(sql: str) -> str:
    """Rewrite the jsonb calls whose JVM form exists onto it:

    * ``jsonb_contains(<expr>, '<flat object literal>')`` → the variant
      containment expression (`flat_contains_sql`); nested / array /
      scalar constant needles → the recursive variant containment
      unrolled to the needle's EXACT depth (`contains_dynamic_sql`,
      round 7 — no raise floor, capped at depth 5 past which the
      pandas tier stays);
    * ``jsonb_contained(<expr>, '<flat object literal>')`` → the
      mirrored forall-entries containment (`contained_flat_sql`);
      non-flat constant hays → the recursive form unrolled to hay
      depth + 1 with a ``false`` floor (exact for documents of ANY
      depth: recursion steps both sides together, so past the hay's
      depth a container needle faces a scalar);
    * ``jsonb_contains/jsonb_contained(<expr>, <DYNAMIC expr>)`` → the
      recursive form at ``JSONB_DYNAMIC_DEPTH`` with a raise_error
      floor (loud, never silently wrong, round-7 verdict #7);
    * ``jsonb_exists_all/any(<expr>, '<string array literal>')`` → an
      AND/OR chain over the codegen'd ``jsonb_exists`` SQL UDF;
    * ``jsonb_delete_key(<expr>, '<key>')`` → the full-shape map/array
      variant expression (`delete_key_sql`);
    * ``jsonb_delete_path(<expr>, '<path literal>')`` → the recursive
      in-place rebuild (`delete_path_sql`);
    * ``jsonb_concat(<expr>, '<object literal>')`` → the full-shape
      merge/append expression (`concat_obj_sql`);
    * (round 8) ``jsonb_delete_key/jsonb_delete_path/jsonb_concat
      (<expr>, <DYNAMIC expr>)`` → typeof-dispatched / depth-bounded
      variant expressions (`delete_key_dynamic_sql`,
      `delete_path_dynamic_sql`, `concat_dynamic_sql`); the cases a
      bounded JVM expression cannot express — non-string/int dynamic
      keys, quoted or over-deep dynamic paths — raise_error rather
      than answer silently wrong, the containment depth-guard policy.

    Operand expressions are rewritten recursively, so a modifier CHAIN
    (``jsonb_concat(jsonb_delete_key(doc, 'k'), '{...}')``) compiles
    end-to-end with no Python worker stage. Everything else passes
    through verbatim — over-deep constant containment shapes and
    modifier constants whose rendering differs between Python json and
    the variant writer (array/scalar/integral-float ``||`` constants)
    stay on the pandas tier.

    Rendering caveat (same as the DataFrame ``object_only`` tier): the
    JVM modifiers re-serialize through Spark's variant writer — sorted
    keys, raw UTF-8, scale-trimmed decimals (a document value ``1.0``
    renders as ``1``) — while the pandas tier uses Python json
    (``\\u`` escapes, ``1.0`` kept). Both are canonicalizations, like
    Postgres's own jsonb re-serialization; queries must compare via
    extraction, never raw modifier bytes.

    Operates on SQL text (the passthrough surface), so call names are
    matched case-insensitively at word boundaries and the argument scan
    is quote/nesting-aware."""
    import re

    # positions inside '...' string literals (with '' doubling) or
    # "..."/`...` quoted identifiers — matches there are data, not calls
    in_str = [False] * len(sql)
    j, n = 0, len(sql)
    while j < n:
        ch = sql[j]
        if ch in ("'", '"', "`"):
            k = j + 1
            while k < n:
                if ch == "'" and sql[k] == "\\" and k + 1 < n:
                    k += 2
                    continue
                if sql[k] == ch:
                    if ch == "'" and k + 1 < n and sql[k + 1] == "'":
                        k += 2
                        continue
                    break
                k += 1
            for p in range(j, min(k + 1, n)):
                in_str[p] = True
            j = k + 1
        else:
            j += 1

    out: list[str] = []
    i = 0
    pat = re.compile(
        r"(jsonb_contains|jsonb_contained|jsonb_exists_all|jsonb_exists_any"
        r"|jsonb_delete_key|jsonb_delete_path|jsonb_concat)\s*\(",
        re.IGNORECASE,
    )
    while i < n:
        m = pat.search(sql, i)
        if not m:
            out.append(sql[i:])
            break
        # skip matches inside strings or glued to a longer identifier
        if in_str[m.start()] or (
            m.start() > 0 and (sql[m.start() - 1].isalnum() or sql[m.start() - 1] == "_")
        ):
            out.append(sql[i : m.start() + 1])
            i = m.start() + 1
            continue
        lparen = m.end() - 1
        scanned = _scan_call(sql, lparen)
        if scanned is None:
            out.append(sql[i:])
            break
        args, after = scanned
        lit = _string_literal(args[1]) if len(args) == 2 else None
        fname = m.group(1).lower()
        replacement = None
        if lit is not None:
            # chains: the operand may itself be a rewritable jsonb call
            operand = rewrite_jsonb_sql(args[0])
            if fname == "jsonb_contains":
                flat = _flat_needle(lit)
                if flat is not None:
                    replacement = flat_contains_sql(operand, flat)
                else:
                    # nested/array/scalar CONSTANT needle: the variant
                    # containment unrolled to the needle's exact depth
                    # (the raise floor is unreachable — fully covered)
                    try:
                        needle_v = json.loads(lit)
                    except ValueError:
                        needle_v = _UNPARSED
                    # cap: unrolled text doubles per level; past 5 the
                    # SQL parser is the bottleneck — deeper stays pandas
                    if (
                        needle_v is not _UNPARSED
                        and _json_depth(needle_v) <= JSONB_DYNAMIC_DEPTH + 1
                    ):
                        replacement = contains_dynamic_sql(
                            operand, args[1], depth=_json_depth(needle_v)
                        )
            elif fname == "jsonb_contained":
                hay = _flat_hay(lit)
                if hay is not None:
                    replacement = contained_flat_sql(operand, hay)
                else:
                    # constant HAY: recursion steps both sides together,
                    # so unrolling to hay depth + 1 with a `false` floor
                    # is EXACT for documents of ANY depth (past the
                    # hay's depth a container needle faces a scalar)
                    try:
                        hay_v = json.loads(lit)
                    except ValueError:
                        hay_v = _UNPARSED
                    if (
                        hay_v is not _UNPARSED
                        and _json_depth(hay_v) + 1 <= JSONB_DYNAMIC_DEPTH + 1
                    ):
                        replacement = contains_dynamic_sql(
                            args[1],
                            operand,
                            depth=_json_depth(hay_v) + 1,
                            floor="false",
                        )
            elif fname == "jsonb_delete_key":
                # the literal IS the key (not JSON); integer-index
                # deletes arrive as numeric literals and fall through
                # to the DYNAMIC branch below (typeof dispatches them
                # to index semantics on the JVM tier)
                replacement = delete_key_sql(operand, lit)
            elif fname == "jsonb_delete_path":
                try:
                    segs = _parse_pg_path(lit)
                except ValueError:
                    segs = None
                if segs is not None and all(
                    isinstance(s, str)
                    or (isinstance(s, int) and not isinstance(s, bool))
                    for s in segs
                ):
                    replacement = delete_path_sql(operand, segs)
            elif fname == "jsonb_concat":
                try:
                    other = json.loads(lit)
                except ValueError:
                    other = None
                if isinstance(other, dict) and _stable_const(other):
                    replacement = concat_obj_sql(operand, other)
            else:
                try:
                    keys = json.loads(lit)
                except ValueError:
                    keys = None
                if keys is not None:
                    replacement = _exists_chain_sql(
                        operand, keys, "AND" if fname == "jsonb_exists_all" else "OR"
                    )
        elif len(args) == 2 and fname in (
            "jsonb_contains",
            "jsonb_contained",
            "jsonb_delete_key",
            "jsonb_delete_path",
            "jsonb_concat",
        ):
            # DYNAMIC right side (column / expression): the unrolled
            # variant containment (round-7 verdict #7) and, round-8
            # verdict #5, the modifier family — both operands may
            # themselves be rewritable jsonb chains
            operand = rewrite_jsonb_sql(args[0])
            other = rewrite_jsonb_sql(args[1])
            if fname == "jsonb_contains":
                replacement = contains_dynamic_sql(operand, other)
            elif fname == "jsonb_contained":  # col <@ hay == contains(hay, col)
                replacement = contains_dynamic_sql(other, operand)
            elif fname == "jsonb_delete_key":
                replacement = delete_key_dynamic_sql(operand, other)
            elif fname == "jsonb_delete_path":
                replacement = delete_path_dynamic_sql(operand, other)
            else:
                replacement = concat_dynamic_sql(operand, other)
        if replacement is None:
            out.append(sql[i : m.start() + 1])
            i = m.start() + 1
            continue
        out.append(sql[i : m.start()])
        out.append("(" + replacement + ")")
        i = after
    return "".join(out)


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
            # PG `?` on an array tests *string* elements only
            return any(isinstance(x, str) and x == n for x in doc)
        if isinstance(doc, str):
            # PG `?` on a string scalar is equality
            return doc == n
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
            if isinstance(doc, dict):
                raise ValueError("cannot delete from object using integer index")
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
    # jsonb_exists is the one family member whose FULL Postgres shape
    # rules are JVM-expressible with a dynamic key, so its SQL name is
    # an expression-bodied SQL UDF (inlines into the plan, stays in
    # codegen) rather than a pandas UDF: object → key present; array →
    # some *string* element equals the key; string scalar → equality;
    # other scalars → false; invalid/NULL → NULL. Stringiness tests
    # ride to_json (a JSON string keeps its quote); equality compares
    # the DECODED string so escapes can't diverge.
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION jsonb_exists(
            doc STRING, k STRING) RETURNS BOOLEAN RETURN
        CASE
          WHEN doc IS NULL OR k IS NULL THEN CAST(NULL AS BOOLEAN)
          WHEN json_object_keys(doc) IS NOT NULL
            THEN array_contains(json_object_keys(doc), k)
          WHEN from_json(doc, 'array<variant>') IS NOT NULL
            THEN exists(from_json(doc, 'array<variant>'),
                        e -> to_json(e) LIKE '"%'
                             AND try_variant_get(e, '$', 'string') = k)
          WHEN try_parse_json(doc) IS NOT NULL
            THEN to_json(try_parse_json(doc)) LIKE '"%'
                 AND try_variant_get(try_parse_json(doc), '$', 'string') = k
          ELSE CAST(NULL AS BOOLEAN)
        END
        """
    )
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


def jsonb_concat(
    col: str | Column, other_json: str, *, object_only: bool = False
) -> Column:
    """``col || other``: shallow object merge (right wins), array
    concatenation, scalar-to-array promotion — the Postgres ``||``
    operator with a constant right side.

    With ``object_only=True`` and a constant *object* right side, the
    merge compiles JVM-side: the document's surviving entries
    (``map_filter`` drops right-side keys) concatenate with the
    constant's entries (``parse_json`` literals, nested values fine)
    and re-serialize canonically. Non-object documents return NULL on
    this tier."""
    other = json.loads(other_json)
    if object_only and isinstance(other, dict):
        m, gate = _as_map(col)
        return _fused_text(jsonb_merge(m, other_json) if other else m, gate)

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
