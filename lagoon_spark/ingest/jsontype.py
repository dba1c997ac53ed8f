"""JsonType: the reference's structural type language for JSON columns.

AST, unification, and printed syntax in behavioral parity with
`src/interface/src/Lagoon/Interface/JsonType.hs:52-170` and the
stack-machine inference in
`src/backend/src/Lagoon/Ingest/JSON/TypeInference.hs:30-134`:

* ``null`` introduces ``nullable unknown``;
* object unification marks keys missing on either side ``optional``
  (distinct from value nullability — a lattice Spark's schema inference
  conflates, which is why this exists at the catalog level);
* irreconcilable types collapse to ``mixed``.

Inference here types each parsed value recursively and folds ``unify``
across values — semantically the same as the reference's token-stack
fold for well-formed documents, but expressible as a partition-parallel
Spark job (per-partition fold, tiny per-partition results reduced on
the driver).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Iterable, Union

# --- AST -------------------------------------------------------------------


@dataclass(frozen=True)
class Mixed:
    pass


@dataclass(frozen=True)
class Unknown:
    pass


@dataclass(frozen=True)
class JString:
    pass


@dataclass(frozen=True)
class JNumber:
    pass


@dataclass(frozen=True)
class JBool:
    pass


@dataclass(frozen=True)
class Nullable:
    of: "JsonType"


@dataclass(frozen=True)
class JArray:
    of: "JsonType"


@dataclass(frozen=True)
class JObject:
    # key -> (optional, type); stored as a sorted tuple for hashability
    fields: tuple[tuple[str, bool, "JsonType"], ...]

    @staticmethod
    def of(d: dict[str, tuple[bool, "JsonType"]]) -> "JObject":
        return JObject(tuple((k, o, t) for k, (o, t) in sorted(d.items())))

    def as_dict(self) -> dict[str, tuple[bool, "JsonType"]]:
        return {k: (o, t) for k, o, t in self.fields}


JsonType = Union[Mixed, Unknown, JString, JNumber, JBool, Nullable, JArray, JObject]

MIXED, UNKNOWN, STRING, NUMBER, BOOL = Mixed(), Unknown(), JString(), JNumber(), JBool()


# --- unification (TypeInference.hs:104-134, same pattern order) ------------


def unify(a: JsonType, b: JsonType) -> JsonType:
    if isinstance(a, Mixed) or isinstance(b, Mixed):
        return MIXED
    if isinstance(b, Unknown):
        return a
    if isinstance(a, Unknown):
        return b
    if isinstance(a, JString) and isinstance(b, JString):
        return STRING
    if isinstance(a, JNumber) and isinstance(b, JNumber):
        return NUMBER
    if isinstance(a, JBool) and isinstance(b, JBool):
        return BOOL
    if isinstance(a, Nullable) or isinstance(b, Nullable):
        # Two deliberate divergences from the reference's clause order
        # (TypeInference.hs:118-120), both on inputs no reference
        # fixture pins, both REQUIRED for a partition-parallel fold
        # (the reference folds one value at a time in stream order;
        # we reduce partial results in arbitrary grouping/order, so
        # unify must be a true commutative/associative join — the
        # property tests in test_jsontype_property.py enforce it):
        #
        # 1. unwrap BOTH sides before recursing — the reference's
        #    one-side-at-a-time clauses double-wrap nullable⊔nullable
        #    (`[null,null]` would print "nullable nullable unknown");
        # 2. Mixed absorbs nullability (nullable(mixed) ≡ mixed) —
        #    the reference yields Mixed or Nullable Mixed depending on
        #    whether the null arrived before or after the conflict;
        #    the one golden-pinned case (026_parse-arr-03.json
        #    `["hi",true,false,null]` → `[mixed]`) agrees with
        #    absorption.
        ia = a.of if isinstance(a, Nullable) else a
        ib = b.of if isinstance(b, Nullable) else b
        inner = unify(ia, ib)
        if isinstance(inner, Mixed):
            return MIXED
        return inner if isinstance(inner, Nullable) else Nullable(inner)
    if isinstance(a, JArray) and isinstance(b, JArray):
        return JArray(unify(a.of, b.of))
    if isinstance(a, JObject) and isinstance(b, JObject):
        da, db = a.as_dict(), b.as_dict()
        out: dict[str, tuple[bool, JsonType]] = {}
        for k in set(da) | set(db):
            if k in da and k in db:
                (o1, t1), (o2, t2) = da[k], db[k]
                out[k] = (o1 or o2, unify(t1, t2))
            elif k in da:
                o1, t1 = da[k]
                out[k] = (True, t1)  # missing on one side → optional
            else:
                o2, t2 = db[k]
                out[k] = (True, t2)
        return JObject.of(out)
    return MIXED


# --- per-value typing (≡ the token-stack fold for well-formed values) ------


def type_of_value(v: object) -> JsonType:
    if v is None:
        return Nullable(UNKNOWN)
    if isinstance(v, bool):
        return BOOL
    if isinstance(v, (int, float)):
        return NUMBER
    if isinstance(v, str):
        return STRING
    if isinstance(v, list):
        t: JsonType = UNKNOWN
        for el in v:
            t = unify(t, type_of_value(el))
        return JArray(t)
    if isinstance(v, dict):
        return JObject.of({k: (False, type_of_value(val)) for k, val in v.items()})
    raise TypeError(f"not a JSON value: {type(v)}")


def infer_strings(values: Iterable[str]) -> JsonType:
    """Fold unify over raw JSON texts (raises on invalid JSON — the
    reference also fails the ingest, fixture F15)."""
    t: JsonType = UNKNOWN
    for s in values:
        t = unify(t, type_of_value(json.loads(s)))
    return t


# --- printed syntax (JsonType.hs Pretty instance) --------------------------


def render(t: JsonType) -> str:
    if isinstance(t, Mixed):
        return "mixed"
    if isinstance(t, Unknown):
        return "unknown"
    if isinstance(t, JString):
        return "string"
    if isinstance(t, JNumber):
        return "number"
    if isinstance(t, JBool):
        return "bool"
    if isinstance(t, Nullable):
        return f"nullable {render(t.of)}"
    if isinstance(t, JArray):
        return f"[{render(t.of)}]"
    if isinstance(t, JObject):
        parts = []
        for k, optional, ft in t.fields:  # sorted key order (Map.toList)
            opt = "optional " if optional else ""
            # json.dumps escapes quotes/backslashes in the key — the
            # parser's string_lit json.loads them back; a raw f-string
            # here corrupted the render/parse round-trip the
            # distributed inference relies on
            parts.append(f"{json.dumps(k)}:{opt}{render(ft)}")
        return "{" + ", ".join(parts) + "}"
    raise TypeError(t)


def parse(s: str) -> JsonType:
    """Inverse of render (JsonType.hs:127-170)."""
    tok = _Tokens(s)
    t = _parse_type(tok)
    tok.skip_ws()
    if tok.pos != len(tok.s):
        raise ValueError(f"trailing input in JsonType: {s[tok.pos:]!r}")
    return t


class _Tokens:
    def __init__(self, s: str):
        self.s = s
        self.pos = 0

    def skip_ws(self):
        while self.pos < len(self.s) and self.s[self.pos].isspace():
            self.pos += 1

    def eat(self, lit: str) -> bool:
        self.skip_ws()
        if self.s.startswith(lit, self.pos):
            self.pos += len(lit)
            return True
        return False

    def expect(self, lit: str):
        if not self.eat(lit):
            raise ValueError(f"expected {lit!r} at {self.s[self.pos:]!r}")

    def string_lit(self) -> str:
        self.skip_ws()
        if self.pos >= len(self.s) or self.s[self.pos] != '"':
            raise ValueError(f"expected string at {self.s[self.pos:]!r}")
        end = self.pos + 1
        while self.s[end] != '"':
            end += 2 if self.s[end] == "\\" else 1
        lit = self.s[self.pos : end + 1]
        self.pos = end + 1
        return json.loads(lit)


def _parse_type(tok: _Tokens) -> JsonType:
    for lit, t in (
        ("mixed", MIXED),
        ("unknown", UNKNOWN),
        ("string", STRING),
        ("number", NUMBER),
        ("bool", BOOL),
    ):
        if tok.eat(lit):
            return t
    if tok.eat("nullable"):
        return Nullable(_parse_type(tok))
    if tok.eat("["):
        inner = _parse_type(tok)
        tok.expect("]")
        return JArray(inner)
    if tok.eat("{"):
        fields: dict[str, tuple[bool, JsonType]] = {}
        tok.skip_ws()
        if not tok.eat("}"):
            while True:
                key = tok.string_lit()
                tok.expect(":")
                optional = tok.eat("optional")
                fields[key] = (optional, _parse_type(tok))
                if not tok.eat(","):
                    break
            tok.expect("}")
        return JObject.of(fields)
    raise ValueError(f"cannot parse JsonType at {tok.s[tok.pos:]!r}")
