"""Constant-memory JSON splitting + JsonPath selection (ops A2-A4).

The reference lexes JSON into a token stream and regroups top-level (or
path-selected) values, keeping the original bytes
(`src/backend/src/Lagoon/Util/JSON/{Lexer.x,TopLevel.hs,Context.hs}`).
This module is the Python equivalent: a chunked recursive-descent
scanner that yields the **raw text slice** of every value matching a
JsonPath — so downloads byte-roundtrip (fixture F14) and a 1M-element
array (`[1,2,…]` with path ``[_]``, fixture F16) streams in constant
memory.

JsonPath subset (`src/interface/src/Lagoon/Interface/JsonPath.hs:41-50`):
``_`` (the value itself), ``[p]`` (every array element), ``{"k":p}``
(object field k). Non-matching subtrees are skipped without buffering.

Used on the driver to spool a local/remote file into value-per-line
form that Spark then reads distributed; for already-line-delimited
input (JSONL) the distributed `spark.read.text` path is used instead
and this module never runs.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Iterator, TextIO, Union


# --- JsonPath --------------------------------------------------------------


@dataclass(frozen=True)
class Here:
    pass


@dataclass(frozen=True)
class Elem:
    of: "JsonPath"


@dataclass(frozen=True)
class Field:
    key: str
    of: "JsonPath"


JsonPath = Union[Here, Elem, Field]
HERE = Here()


def parse_path(s: str) -> JsonPath:
    s = s.strip()
    if s == "_":
        return HERE
    if s.startswith("[") and s.endswith("]"):
        return Elem(parse_path(s[1:-1]))
    if s.startswith("{") and s.endswith("}"):
        body = s[1:-1].strip()
        colon = _find_colon(body)
        key = json.loads(body[:colon].strip())
        return Field(key, parse_path(body[colon + 1 :]))
    raise ValueError(f"invalid JsonPath: {s!r}")


def _find_colon(s: str) -> int:
    in_str = False
    i = 0
    while i < len(s):
        c = s[i]
        if in_str:
            if c == "\\":
                i += 1
            elif c == '"':
                in_str = False
        elif c == '"':
            in_str = True
        elif c == ":":
            return i
        i += 1
    raise ValueError(f"no ':' in object path {s!r}")


def render_path(p: JsonPath) -> str:
    if isinstance(p, Here):
        return "_"
    if isinstance(p, Elem):
        return f"[{render_path(p.of)}]"
    if isinstance(p, Field):
        return json.dumps({p.key: 0}).replace("0", render_path(p.of), 1) if False else (
            "{" + json.dumps(p.key) + ":" + render_path(p.of) + "}"
        )
    raise TypeError(p)


# --- chunked scanner -------------------------------------------------------


class JsonSplitError(ValueError):
    pass


class _Scanner:
    """Chunked character scanner; buffers only from the earliest capture
    start (constant memory when captured values are bounded)."""

    def __init__(self, stream: TextIO, chunk_size: int = 1 << 16):
        self.stream = stream
        self.chunk = chunk_size
        self.buf = ""
        self.base = 0  # absolute offset of buf[0]
        self.pos = 0  # absolute scan position
        self.capture_start: int | None = None
        self.eof = False

    def _fill(self) -> bool:
        data = self.stream.read(self.chunk)
        if not data:
            self.eof = True
            return False
        self.buf += data
        return True

    def peek(self) -> str | None:
        while self.pos - self.base >= len(self.buf):
            if self.capture_start is None:
                # drop consumed prefix
                self.base += len(self.buf)
                self.buf = ""
            if not self._fill():
                return None
        return self.buf[self.pos - self.base]

    def advance(self) -> None:
        self.pos += 1

    def skip_ws(self) -> None:
        while True:
            c = self.peek()
            if c is None or not c.isspace():
                return
            self.advance()

    def begin_capture(self) -> None:
        self.capture_start = self.pos

    def end_capture(self) -> str:
        assert self.capture_start is not None
        s = self.buf[self.capture_start - self.base : self.pos - self.base]
        self.capture_start = None
        return s


def _scan_string(sc: _Scanner) -> None:
    assert sc.peek() == '"'
    sc.advance()
    while True:
        c = sc.peek()
        if c is None:
            raise JsonSplitError("unterminated string")
        sc.advance()
        if c == "\\":
            if sc.peek() is None:
                raise JsonSplitError("unterminated escape")
            sc.advance()
        elif c == '"':
            return


def _scan_scalar(sc: _Scanner) -> None:
    """Numbers / true / false / null: consume until a delimiter."""
    while True:
        c = sc.peek()
        if c is None or c in ",]}" or c.isspace():
            return
        sc.advance()


def _scan_value(sc: _Scanner, path: JsonPath, out: list[str]) -> None:
    sc.skip_ws()
    c = sc.peek()
    if c is None:
        raise JsonSplitError("unexpected end of input")
    matching_here = isinstance(path, Here)
    if matching_here:
        sc.begin_capture()
    if c == "{":
        sc.advance()
        sc.skip_ws()
        if sc.peek() == "}":
            sc.advance()
        else:
            while True:
                sc.skip_ws()
                if sc.peek() != '"':
                    raise JsonSplitError("expected object key")
                key_start = sc.pos
                had_capture = sc.capture_start is not None
                if not had_capture:
                    sc.begin_capture()
                _scan_string(sc)
                raw_key = (
                    sc.buf[key_start - sc.base : sc.pos - sc.base]
                    if had_capture
                    else sc.end_capture()
                )
                key = json.loads(raw_key)
                sc.skip_ws()
                if sc.peek() != ":":
                    raise JsonSplitError("expected ':'")
                sc.advance()
                if isinstance(path, Field) and path.key == key:
                    _scan_value(sc, path.of, out)
                else:
                    _scan_value(sc, _SKIP, out)
                sc.skip_ws()
                nxt = sc.peek()
                if nxt == ",":
                    sc.advance()
                    continue
                if nxt == "}":
                    sc.advance()
                    break
                raise JsonSplitError("expected ',' or '}'")
    elif c == "[":
        sc.advance()
        sc.skip_ws()
        if sc.peek() == "]":
            sc.advance()
        else:
            elem_path = path.of if isinstance(path, Elem) else _SKIP
            while True:
                _scan_value(sc, elem_path, out)
                sc.skip_ws()
                nxt = sc.peek()
                if nxt == ",":
                    sc.advance()
                    continue
                if nxt == "]":
                    sc.advance()
                    break
                raise JsonSplitError("expected ',' or ']'")
    elif c == '"':
        _scan_string(sc)
    else:
        _scan_scalar(sc)
        if matching_here and sc.pos == sc.capture_start:
            raise JsonSplitError(f"unexpected character {c!r}")
    if matching_here:
        out.append(sc.end_capture())


class _Skip:
    pass


_SKIP = _Skip()  # sentinel path that matches nothing


def split_values(stream: TextIO, path: JsonPath = HERE) -> Iterator[str]:
    """Yield raw text of every value matching ``path`` across all
    top-level values in the stream (JSONL, whitespace-separated, or one
    giant value)."""
    sc = _Scanner(stream)
    while True:
        sc.skip_ws()
        if sc.peek() is None:
            return
        out: list[str] = []
        _scan_value(sc, path, out)
        yield from out
