"""Input acquisition (A26): file URLs, zip spooling, error paths."""

from __future__ import annotations

import zipfile

import pytest

from lagoon_spark.ingest.input import InputError, acquire


def test_plain_path_passthrough(tmp_path):
    p = tmp_path / "x.csv"
    p.write_text("a,b\n1,2\n")
    assert acquire(str(p)) == str(p)


def test_file_url(tmp_path):
    p = tmp_path / "x.csv"
    p.write_text("a,b\n1,2\n")
    assert acquire(f"file://{p}") == str(p)


def test_zip_single_entry(tmp_path):
    csv = "a,b\n1,2\n3,4\n"
    zp = tmp_path / "data.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("inner.csv", csv)
    cleanup: list[str] = []
    local = acquire(str(zp), cleanup)
    assert open(local).read() == csv
    assert local.endswith("_inner.csv") and cleanup == [local]


def test_zip_multi_entry_rejected(tmp_path):
    zp = tmp_path / "two.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("a.csv", "a\n1\n")
        zf.writestr("b.csv", "b\n2\n")
    with pytest.raises(InputError, match="exactly one"):
        acquire(str(zp))


def test_s3_gated(tmp_path):
    with pytest.raises(NotImplementedError, match="s3"):
        acquire("s3://bucket/key.csv")


def test_engine_ingest_from_zip(lagoon, tmp_path):
    csv = "name,qty\nwidget,3\ngadget,5\n"
    zp = tmp_path / "inv.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("inventory.csv", csv)
    info = lagoon.ingest(str(zp), "inventory")
    assert info.row_count == 2
    assert info.url == str(zp)  # original location recorded
    cols = [(h, t) for _p, h, t in info.columns]
    assert cols == [("name", "TEXT"), ("qty", "INTEGER")]
