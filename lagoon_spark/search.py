"""Full-text catalog search: the TsQuery language (operator A19).

Grammar parity with the reference's error-recovering parser
(`src/interface/src/Lagoon/Interface/TsQuery.hs:127-179`): precedence
``| < & < ' '(=AND) < ! < label:``, parens with optional close, and any
unparseable token degrades to an error node that drops out of the query
instead of failing the search.

Evaluation replaces Postgres tsvector/tsquery
(`src/backend/src/Lagoon/Util/PostgreSQL/TsQuery.hs:42-77` and the
weighted `sourceFullText` tsvector, `DB/Schema.hs:544-573`): catalog
fields are tokenized per label — name=A, tags/columns=B, description=C,
added_by=D — and the boolean AST is evaluated per catalog row (the
catalog is metadata-sized, so row-at-a-time is the right tool; data
tables never go through this path). Lexemes match as lowercase
prefix-or-exact tokens (approximating the 'english' stemmer with
prefix semantics).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional, Union


@dataclass(frozen=True)
class Lexeme:
    text: str


@dataclass(frozen=True)
class And:
    left: "TsQuery"
    right: "TsQuery"


@dataclass(frozen=True)
class Or:
    left: "TsQuery"
    right: "TsQuery"


@dataclass(frozen=True)
class Not:
    of: "TsQuery"


@dataclass(frozen=True)
class Label:
    label: str
    of: "TsQuery"


TsQuery = Union[Lexeme, And, Or, Not, Label]

# label → weight class (DB/Schema.hs:566-573)
LABEL_WEIGHTS = {
    "description": "C",
    "name": "A",
    "user": "D",
    "tag": "B",
    "column": "B",
}

_IDENT = re.compile(r"[A-Za-z0-9_][A-Za-z0-9_]*")


class _P:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def ws(self):
        while self.i < len(self.s) and self.s[self.i].isspace():
            self.i += 1

    def peek(self) -> str | None:
        self.ws()
        return self.s[self.i] if self.i < len(self.s) else None

    def ident(self) -> str | None:
        self.ws()
        m = _IDENT.match(self.s, self.i)
        if m:
            self.i = m.end()
            return m.group(0)
        return None


def parse(s: str) -> Optional[TsQuery]:
    """Parse; error nodes are dropped (`ignoreError`,
    TsQuery.hs:100-121). Returns None if nothing survives."""
    p = _P(s)
    q = _expr(p, in_parens=False)
    return q


def _expr(p: _P, in_parens: bool) -> Optional[TsQuery]:
    return _p1(p, in_parens)


def _p1(p: _P, in_parens: bool) -> Optional[TsQuery]:
    acc = _p2(p, in_parens)
    while p.peek() == "|":
        p.i += 1
        rhs = _p2(p, in_parens)
        acc = _merge(Or, acc, rhs)
    return acc


def _p2(p: _P, in_parens: bool) -> Optional[TsQuery]:
    acc = _p3(p, in_parens)
    while p.peek() == "&":
        p.i += 1
        rhs = _p3(p, in_parens)
        acc = _merge(And, acc, rhs)
    return acc


def _p3(p: _P, in_parens: bool) -> Optional[TsQuery]:
    acc = None
    first = True
    while True:
        c = p.peek()
        if c is None or c in "|&" or (in_parens and c == ")"):
            break
        q = _p4(p, in_parens)
        if first:
            acc = q
            first = False
        else:
            acc = _merge(And, acc, q)
    return acc


def _p4(p: _P, in_parens: bool) -> Optional[TsQuery]:
    if p.peek() == "!":
        p.i += 1
        q = _p5(p, in_parens)
        return Not(q) if q is not None else None
    return _p5(p, in_parens)


def _p5(p: _P, in_parens: bool) -> Optional[TsQuery]:
    save = p.i
    ident = p.ident()
    if ident is not None and p.peek() == ":":
        p.i += 1
        q = _term(p, in_parens)
        return Label(ident, q) if q is not None else None
    p.i = save
    return _term(p, in_parens)


def _term(p: _P, in_parens: bool) -> Optional[TsQuery]:
    c = p.peek()
    if c == "(":
        p.i += 1
        q = _expr(p, in_parens=True)
        if p.peek() == ")":  # optional close paren
            p.i += 1
        return q
    ident = p.ident()
    if ident is not None:
        return Lexeme(ident)
    # unknown char: consume one and recover as an error node
    if c is not None and (c not in "&|!(" and not (in_parens and c == ")")):
        p.i += 1
        return None
    return None


def _merge(ctor, a: Optional[TsQuery], b: Optional[TsQuery]) -> Optional[TsQuery]:
    if a is None:
        return b
    if b is None:
        return a
    return ctor(a, b)


# --- evaluation ------------------------------------------------------------


def _tokens(s: str) -> list[str]:
    return [t.lower() for t in re.split(r"[^A-Za-z0-9_]+", s or "") if t]


def source_tokens(catalog, ix: int) -> dict[str, list[str]]:
    """Weighted token sets per source (replaces the tsvector cache)."""
    info = catalog.get_source_by_ix(ix)
    return {
        "A": _tokens(info.name),
        "B": _tokens(" ".join(info.tags))
        + _tokens(" ".join(h for _p, h, _t in info.columns)),
        "C": _tokens(info.description or ""),
        "D": _tokens(info.added_by or ""),
    }


def evaluate(q: TsQuery, weighted: dict[str, list[str]], weights: str = "ABCD") -> bool:
    if isinstance(q, Lexeme):
        needle = q.text.lower()
        return any(
            tok == needle or tok.startswith(needle)
            for w in weights
            for tok in weighted.get(w, ())
        )
    if isinstance(q, And):
        return evaluate(q.left, weighted, weights) and evaluate(q.right, weighted, weights)
    if isinstance(q, Or):
        return evaluate(q.left, weighted, weights) or evaluate(q.right, weighted, weights)
    if isinstance(q, Not):
        return not evaluate(q.of, weighted, weights)
    if isinstance(q, Label):
        w = LABEL_WEIGHTS.get(q.label.lower())
        return evaluate(q.of, weighted, w if w else "ABCD")
    raise TypeError(q)


def matches_source(catalog, query: str, ix: int) -> bool:
    q = parse(query)
    if q is None:
        return True  # empty/error-only query matches everything
    return evaluate(q, source_tokens(catalog, ix))
