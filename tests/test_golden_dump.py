"""Golden catalog-dump test — the reference's primary oracle pattern.

The reference pins type inference, naming, versioning, and deprecation
semantics with one artifact: ingest a fixture corpus with a pinned
clock, `dump-db-info`, and diff against a golden file
(`runtests.sh:107-118`). Same here, including the delete-restores-
state property: ingesting an extra version and deleting it must yield
the identical dump again (`runtests.sh:120-157`).
"""

from __future__ import annotations

import os

PIN = "2016-10-01 12:00:00"
GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "dbinfo.expected")


def _ingest_corpus(lagoon, tmp_path):
    """The FIXTURES.md F1-F15 families (mirroring the reference's
    88-fixture corpus, `clients/cmdline/test-cases/tests/` +
    `dbinfo.expected`), ingested with a pinned clock."""

    def w(name, text):
        p = tmp_path / name
        p.write_text(text)
        return str(p)

    lagoon.ingest(w("simple.csv", "Foo\nTRUE\n"), "simple", created=PIN)
    lagoon.ingest(
        w("types.csv", "b,i,big,r,t\n1,1,1234567890,1.5,x\nt,2,2,2e3,y\n"),
        "types",
        created=PIN,
        tags=["demo"],
    )
    lagoon.ingest(w("dups.csv", "a,A,a\n1,2,3\n"), "dups", created=PIN)
    lagoon.ingest(w("vals.json", '{"x": 1}\n{"x": 2, "y": "s"}\n'), "vals", created=PIN)
    lagoon.ingest(
        w("types2.csv", "b,i,big,r,t\nf,9,9,9.9,z\n"), "types", created=PIN
    )

    # F1 — the full inference lattice (011_type-inference.csv shape)
    lagoon.ingest(
        w(
            "type_inference.csv",
            "bool,int,bigint,real,text\n"
            "0,0,0,0,t\n1,1,1,1,f\nt,2,2,2,0\nf,3,3,3,1\n"
            "true,4,4,3.5,a\nfalse,5,9234567890,3.6,b\n",
        ),
        "type_inference",
        created=PIN,
    )
    # F2 — scientific notation unifies to real (012_scientific.csv)
    lagoon.ingest(
        w("scientific.csv", "scientific\n1\n2.3\n-4\n+5e11\n2.3e-44\n-6.7e+5\n"),
        "scientific",
        created=PIN,
    )
    # F3 — exponents over 3 digits fall out of the double domain → TEXT
    # (013_outofrange.csv, InferFieldType.x:81-83)
    lagoon.ingest(
        w("outofrange.csv", "outofrange\n11e1111\n-66.77e-4444\n"),
        "outofrange",
        created=PIN,
    )
    # F4 — every boolean literal form (Postgres rules); a stray value
    # tops out to TEXT in the second column
    lagoon.ingest(
        w(
            "bool_literals.csv",
            "allbool,withstray\nt,t\nTRUE,true\ny,maybe\nYES,no\non,off\n1,0\nf,f\n",
        ),
        "bool_literals",
        created=PIN,
    )
    # F5 — >4096-char value → DOCUMENT (079_longtext.csv, maxTextLen)
    lagoon.ingest(
        w("longtext.csv", "id,document\n1,short\n2," + "x" * 5000 + "\n"),
        "longtext",
        created=PIN,
    )
    # F6 — RFC4180 quoting (002-005_quotes*.csv) + quote-disabled variant
    quotes = 'foo,bar\n"simple",easy\n"hi,ho",x\n"John ""X"" Smith",y\n'
    lagoon.ingest(w("quotes.csv", quotes), "quotes", created=PIN)
    lagoon.ingest(
        w("quotes_raw.csv", quotes), "quotes_raw", created=PIN, quote=None
    )
    # F7 — headerless ragged rows widen to max width (006_vary_num_rows)
    lagoon.ingest(
        w("vary.csv", "a\nb,c\nd,e,f\ng,h,i,j,k\nl,m,n,o\np,q,r\ns\n"),
        "vary",
        created=PIN,
        has_headers=False,
    )
    # F8 — case-insensitive header dedup (009/010_dups*.csv)
    lagoon.ingest(
        w("dup_headers.csv", "foo,Foo,bar,baz,BAR,baZ\n1,2,3,4,5,6\n"),
        "dup_headers",
        created=PIN,
    )
    # F9 — sanitization: spaces, keywords, symbols, unicode
    # (007/008_strange_names*.csv)
    lagoon.ingest(
        w(
            "strange_names.csv",
            "name with spaces,keywords,create,table,some symbols > and $,some unicode 中文\n"
            "1,2,3,4,5,6\n",
        ),
        "strange_names",
        created=PIN,
    )
    # F10 — CRLF + tab-delimited .txt (088_windows-cr.txt)
    lagoon.ingest(
        w("windows_cr.txt", "colA\tcolB\r\n1\ttrue\r\n2\tfalse\r\n"),
        "windows_cr",
        created=PIN,
    )
    # F11 — quoted header row (087_escaped_headers.csv)
    lagoon.ingest(
        w("escaped_headers.csv", '"foo","bar baz"\n1,2\n'), "escaped_headers",
        created=PIN,
    )
    # F13 — JsonType lattice shapes (040-077_typ-*.json)
    lagoon.ingest(w("typ_empty.json", "[]\n"), "typ_empty_array", created=PIN)
    lagoon.ingest(w("typ_nums.json", "[1,2]\n"), "typ_number_array", created=PIN)
    lagoon.ingest(w("typ_mixed.json", '[1,"a"]\n'), "typ_mixed_array", created=PIN)
    lagoon.ingest(w("typ_nullable.json", "[1,null]\n"), "typ_nullable", created=PIN)
    lagoon.ingest(
        w("typ_obj.json", '{"a":true,"b":1}\n'), "typ_object", created=PIN
    )
    lagoon.ingest(
        w("typ_optional.json", '[{"a":1},{"b":true}]\n'), "typ_optional_keys",
        created=PIN,
    )
    lagoon.ingest(
        w("typ_nested.json", '{"items":[{"d":[1,null]}],"n":{"m":"s"}}\n'),
        "typ_nested",
        created=PIN,
    )
    # F13 with json-path: split a top-level array into rows
    lagoon.ingest(
        w("typ_split.json", '[{"v":1},{"v":2},{"v":3}]\n'),
        "typ_split_rows",
        created=PIN,
        json_path="[_]",
    )
    # F14 — escaped quotes byte-roundtrip (086_json_escape.json)
    lagoon.ingest(
        w("json_escape.json", '{"name": "John \\"Crazy\\" Smith"}\n'),
        "json_escape",
        created=PIN,
    )
    # F19 — versioning + deprecation chain on one name
    v = w("versioned.csv", "x,y\n1,a\n2,b\n")
    lagoon.ingest(v, "versioned", created=PIN)
    lagoon.ingest(v, "versioned", created=PIN)
    lagoon.ingest(
        w("versioned3.csv", "x,y,z\n3,c,true\n"), "versioned", created=PIN
    )


def test_dump_matches_golden(lagoon, tmp_path):
    _ingest_corpus(lagoon, tmp_path)
    assert lagoon.dump_db_info() == open(GOLDEN).read()


def test_delete_restores_dump(lagoon, tmp_path):
    """The reference's scenario (`runtests.sh:120-157`): ingest a fresh
    name with several versions, delete them one by one; the catalog
    dump must return to the pre-ingest golden."""
    _ingest_corpus(lagoon, tmp_path)
    golden = open(GOLDEN).read()

    extra = tmp_path / "extra.csv"
    extra.write_text("x\n1\n")
    infos = [lagoon.ingest(str(extra), "to_be_deleted", created=PIN) for _ in range(3)]
    assert lagoon.dump_db_info() != golden

    for info in infos:
        lagoon.delete_source(info)
    assert lagoon.dump_db_info() == golden
