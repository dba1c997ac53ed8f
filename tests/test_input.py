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


def test_s3_gated_without_boto3(monkeypatch):
    # without boto3 → loud NotImplementedError naming the Spark-native
    # alternative, not a deep failure later
    import builtins

    real_import = builtins.__import__

    def no_boto3(name, *a, **k):
        if name == "boto3":
            raise ImportError("boto3 not installed")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_boto3)
    with pytest.raises(NotImplementedError, match="s3"):
        acquire("s3://bucket/key.csv")


class _FakeS3Client:
    """Stands in for boto3.client('s3') — download_file writes bytes."""

    def __init__(self, objects):
        self.objects = objects

    def download_file(self, bucket, key, filename):
        with open(filename, "wb") as f:
            f.write(self.objects[(bucket, key)])


def test_s3_fetch_with_stub_client(tmp_path, monkeypatch):
    from lagoon_spark.ingest import input as input_mod

    fake = _FakeS3Client({("mybucket", "data/in.csv"): b"a,b\n1,2\n"})
    monkeypatch.setattr(input_mod, "_make_s3_client", lambda: fake)
    cleanup: list[str] = []
    local = acquire("s3://mybucket/data/in.csv", cleanup)
    assert open(local).read() == "a,b\n1,2\n"
    assert cleanup == [local] and local.endswith("_in.csv")


def test_s3_url_shape_rejected(monkeypatch):
    from lagoon_spark.ingest import input as input_mod

    monkeypatch.setattr(input_mod, "_make_s3_client", lambda: _FakeS3Client({}))
    with pytest.raises(InputError, match="bucket/key"):
        acquire("s3://justabucket")


def test_engine_ingest_from_s3(lagoon, tmp_path, monkeypatch):
    """End-to-end: s3:// source through the full ingest pipeline."""
    from lagoon_spark.ingest import input as input_mod

    csv = "name,qty\nwidget,3\ngadget,5\n"
    fake = _FakeS3Client({("corp-data", "drops/inv.csv"): csv.encode()})
    monkeypatch.setattr(input_mod, "_make_s3_client", lambda: fake)
    info = lagoon.ingest("s3://corp-data/drops/inv.csv", "s3inv")
    assert info.row_count == 2
    assert info.url == "s3://corp-data/drops/inv.csv"
    cols = [(h, t) for _p, h, t in info.columns]
    assert cols == [("name", "TEXT"), ("qty", "INTEGER")]


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
