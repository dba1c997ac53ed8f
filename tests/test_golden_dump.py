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
