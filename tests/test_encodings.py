"""Encoding handling on tabular ingest.

Reference behaviours covered:

* UTF-8 → Latin1 fallback when decoding fails
  (`src/backend/src/Lagoon/Ingest.hs:138-148` ``fallbackToLatin1``).
* UTF-16 LE/BE with and without BOM — the reference ships these as
  *disabled* fixtures (`clients/cmdline/test-cases/disabled-tests/
  082-085_utf16*.csv`); we sniff and transcode so they ingest anyway.
"""

from __future__ import annotations

import pytest


CSV_TEXT = "name,price\ncafé,1\nstraße,2\n"


def _rows(lagoon, info):
    return {
        r["name"]: r["price"]
        for r in lagoon.spark.table(info.typed_view_name).collect()
    }


def test_latin1_fallback(lagoon, tmp_path):
    p = tmp_path / "latin.csv"
    p.write_bytes(CSV_TEXT.encode("iso-8859-1"))  # é/ß bytes invalid as UTF-8
    events = []
    info = lagoon.ingest(str(p), "latin", progress=events.append)
    assert {"event": "encoding", "fallback": "ISO-8859-1"} in events
    assert _rows(lagoon, info) == {"café": 1, "straße": 2}


def test_utf8_replacement_char_is_not_mangled(lagoon, tmp_path):
    """A file that legitimately contains U+FFFD must stay UTF-8."""
    p = tmp_path / "repl.csv"
    p.write_text("name,price\na�b,1\n", encoding="utf-8")
    events = []
    info = lagoon.ingest(str(p), "repl", progress=events.append)
    assert not any(e.get("event") == "encoding" for e in events)
    assert _rows(lagoon, info) == {"a�b": 1}


@pytest.mark.parametrize(
    "codec,bom",
    [
        ("utf-16-le", True),   # 084_utf16le_bom
        ("utf-16-be", True),   # 085_utf16be_bom
        ("utf-16-le", False),  # 082_utf16le_nobom
        ("utf-16-be", False),  # 083_utf16be_nobom
    ],
)
def test_utf16_variants(lagoon, tmp_path, codec, bom):
    p = tmp_path / f"{codec}{'_bom' if bom else ''}.csv"
    body = CSV_TEXT.encode(codec)
    if bom:
        body = ("﻿".encode(codec)) + body
    p.write_bytes(body)
    events = []
    info = lagoon.ingest(str(p), p.stem, progress=events.append)
    assert any(e.get("event") == "encoding" and "detected" in e for e in events)
    assert _rows(lagoon, info) == {"café": 1, "straße": 2}
    # type inference still ran on the transcoded bytes
    assert {h: t for _c, h, t in info.columns} == {
        "name": "TEXT",
        "price": "INTEGER",
    }
