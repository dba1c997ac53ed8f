"""CLI parity tests — the reference's primary UX and test harness.

The reference drives EVERYTHING through the ``lagoon`` executable
(`clients/cmdline/test-cases/runtests.sh:96-118`): ingest the fixture
corpus via CLI flags, ``dump-db-info``, diff a golden file. Same here:
the F1-F15 golden corpus flows through ``python -m lagoon_spark``
argument parsing (an adapter maps the corpus's engine kwargs onto CLI
flags, proving the flag surface can express every fixture), and the
resulting dump must byte-match the same ``dbinfo.expected`` the engine
API produces. One true-subprocess test proves the executable works
standalone; everything else drives ``cli.main()`` in-process so the
suite shares the session Spark JVM.
"""

from __future__ import annotations

import io
import os
import subprocess
import sys
from contextlib import redirect_stdout

import pytest

from lagoon_spark import cli
from tests.test_golden_dump import GOLDEN, PIN, _ingest_corpus

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(wh, *argv, user="tester", check=True):
    """Drive cli.main() in-process; returns (exit_code, stdout)."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        code = cli.main(["--warehouse", str(wh), "-u", user, *argv])
    if check and code != 0:
        raise AssertionError(f"CLI failed ({code}): {argv}\n{buf.getvalue()}")
    return code, buf.getvalue()


class _CliLagoon:
    """Adapter exposing the engine's ingest() signature over CLI argv —
    lets the golden corpus (`test_golden_dump._ingest_corpus`) run
    unmodified through the command-line surface."""

    def __init__(self, wh):
        self.wh = wh

    def ingest(
        self,
        path,
        name,
        *,
        created=None,
        tags=None,
        has_headers=True,
        quote='"',
        json_path=None,
        **kw,
    ):
        argv = ["ingest", "-n", name, path]
        if created:
            argv += ["--created", created]
        for t in tags or []:
            argv += ["--tag", t]
        if not has_headers:
            argv += ["--no-headers"]
        if quote is None:
            argv += ["--no-quoting"]
        if json_path:
            argv += ["--json-path", json_path]
        for k, v in kw.items():
            raise NotImplementedError(f"corpus kwarg {k!r} not mapped to a CLI flag")
        _run(self.wh, *argv)


@pytest.mark.slow  # heavyweight soak lane (round-12 verdict #3)
def test_cli_golden_dump(spark, tmp_path):
    """The whole F1-F15 corpus through CLI flags == the golden dump the
    engine API produces (the reference's runtests.sh oracle)."""
    wh = tmp_path / "warehouse"
    _run(wh, "init-db")
    _ingest_corpus(_CliLagoon(wh), tmp_path)
    _, dump = _run(wh, "dump-db-info")
    assert dump == open(GOLDEN).read()


def test_cli_delete_restores_dump(spark, tmp_path):
    """runtests.sh:120-157: ingest a fresh name 3×, delete-source one
    version at a time, the dump returns to its prior state."""
    wh = tmp_path / "warehouse"
    _run(wh, "init-db")
    p = tmp_path / "x.csv"
    p.write_text("x\n1\n")
    _run(wh, "ingest", "-n", "keepme", "--created", PIN, str(p))
    _, before = _run(wh, "dump-db-info")

    for _ in range(3):
        _run(wh, "ingest", "-n", "to_be_deleted", "--created", PIN, str(p))
    _, during = _run(wh, "dump-db-info")
    assert during != before
    # delete one specific version, then the remaining ones wholesale
    _run(wh, "delete-source", "to_be_deleted", "-v", "2")
    _run(wh, "delete-source", "to_be_deleted")
    _, after = _run(wh, "dump-db-info")
    assert after == before


def test_cli_suid_idempotent_reingest(spark, tmp_path):
    """runtests.sh:70-80: the same --source-identifier twice must not
    create a second version."""
    wh = tmp_path / "warehouse"
    _run(wh, "init-db")
    p = tmp_path / "s.csv"
    p.write_text("a\n1\n")
    for _ in range(2):
        _run(
            wh, "ingest", "-n", "suid_src", "--created", PIN,
            "--source-identifier", "deadbeef", str(p),
        )
    _, out = _run(wh, "list-sources", "--count")
    assert out.strip() == "1"


def test_cli_sql_download_roundtrip(spark, tmp_path):
    wh = tmp_path / "warehouse"
    _run(wh, "init-db")
    p = tmp_path / "r.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    _run(wh, "ingest", "-n", "rt", str(p))
    _, csv_out = _run(wh, "download", "rt")
    assert csv_out == "a,b\r\n1,x\r\n2,y\r\n"
    _, sql_out = _run(
        wh, "sql", "SELECT b FROM rt_v1_typed WHERE a = 2", "--format", "json"
    )
    assert sql_out.strip() == '{"b":"y"}'
    # metadata views are exposed to /sql like the reference's
    _, meta = _run(wh, "sql", "SELECT name FROM lagoon_sources", "--format", "json")
    assert '"name":"rt"' in meta


def test_cli_make_typed_and_set_type(spark, tmp_path):
    wh = tmp_path / "warehouse"
    _run(wh, "init-db")
    p = tmp_path / "n.csv"
    p.write_text("n\n1\n2\n")
    _run(wh, "ingest", "-n", "nt", "--no-type-inference", str(p))
    _, shown = _run(wh, "show-source", "nt")
    assert "typed" not in shown
    _run(wh, "make-typed", "nt")
    _, shown = _run(wh, "show-source", "nt")
    assert "INTEGER" in shown and "typed" in shown
    _run(wh, "set-type", "nt", "-c", "n", "TEXT")
    _, shown = _run(wh, "show-source", "nt")
    assert "TEXT" in shown


def test_cli_acl_and_group_management(spark, tmp_path):
    """The manage/create-group/manage-group/manage-user surface, and
    the fail-closed paths: a plain user cannot manage-user, and a
    revoked user cannot create datasets."""
    wh = tmp_path / "warehouse"
    _run(wh, "init-db", user="admin")
    p = tmp_path / "a.csv"
    p.write_text("a\n1\n")
    _run(wh, "ingest", "-n", "secret", str(p), user="alice")

    # bob can't read it...
    code, _ = _run(wh, "download", "secret", user="bob", check=False)
    assert code == 1
    # ...until alice grants read via the CLI
    _run(wh, "manage", "secret", "--set-user-access", "bob", "read", user="alice")
    code, out = _run(wh, "download", "secret", user="bob")
    assert out.startswith("a\r\n")
    # revoke via LEVEL=none
    _run(wh, "manage", "secret", "--set-user-access", "bob", "none", user="alice")
    code, _ = _run(wh, "download", "secret", user="bob", check=False)
    assert code == 1

    # group path
    _run(wh, "create-group", "team", user="admin")
    _run(wh, "manage-group", "team", "--add-user", "carol", user="admin")
    _run(wh, "manage", "secret", "--set-group-access", "team", "read", user="alice")
    _, out = _run(wh, "download", "secret", user="carol")
    assert out.startswith("a\r\n")

    # public / private / deprecated
    _run(wh, "manage", "secret", "--public", user="alice")
    _, out = _run(wh, "download", "secret", user="dave")
    assert out.startswith("a\r\n")
    _run(wh, "manage", "secret", "--private", user="alice")
    _run(wh, "manage", "secret", "--deprecated", user="alice")
    _, shown = _run(wh, "show-source", "secret", user="alice")
    assert "deprecated  True" in shown

    # manage-user is admin-only and gates dataset creation
    code, _ = _run(wh, "manage-user", "--revoke-create", "eve", user="mallory", check=False)
    assert code == 1
    _run(wh, "manage-user", "--revoke-create", "eve", user="admin")
    code, _ = _run(wh, "ingest", "-n", "evil", str(p), user="eve", check=False)
    assert code == 1
    # tag requires update rights
    code, _ = _run(wh, "tag", "secret", "stolen", user="mallory", check=False)
    assert code == 1


def test_cli_compact_and_vacuum(spark, tmp_path):
    wh = tmp_path / "warehouse"
    _run(wh, "init-db", user="admin")
    p = tmp_path / "c.csv"
    p.write_text("a\n1\n")
    _run(wh, "ingest", "-n", "cc", str(p), user="admin")
    _run(wh, "ingest", "-n", "cc", str(p), user="admin")
    _, out = _run(wh, "compact", "cc", user="admin")
    assert "Compacted sources" in out
    os.makedirs(os.path.join(str(wh), "data", "t9999"))
    _, out = _run(wh, "vacuum", "--dry-run", user="admin")
    assert "t9999" in out
    code, _ = _run(wh, "vacuum", user="nobody", check=False)
    assert code == 1


def test_cli_infer_json_type_and_stdin_ingest(spark, tmp_path, monkeypatch):
    wh = tmp_path / "warehouse"
    _run(wh, "init-db")
    j = tmp_path / "v.json"
    j.write_text('{"a": 1}\n{"a": null, "b": "s"}\n')
    _, out = _run(wh, "infer-json-type", str(j))
    assert out.strip() == '{"a":nullable number, "b":optional string}'

    monkeypatch.setattr("sys.stdin", io.StringIO("x,y\n1,2\n"))
    _run(wh, "ingest", "-n", "fromstdin", "--file-type", "csv", "-")
    _, shown = _run(wh, "show-source", "fromstdin")
    assert "row count   1" in shown


def test_cli_subprocess_executable(tmp_path):
    """`python -m lagoon_spark` works as a real standalone process for
    metadata commands (no Spark JVM needed — must return fast)."""
    wh = str(tmp_path / "warehouse")
    env = {**os.environ, "PYTHONPATH": REPO}

    def run(*argv):
        return subprocess.run(
            [sys.executable, "-m", "lagoon_spark", "--warehouse", wh, "-u", "admin", *argv],
            capture_output=True, text=True, env=env, timeout=120,
        )

    r = run("init-db")
    assert r.returncode == 0 and r.stdout.strip() == "ok"
    r = run("list-sources", "--count")
    assert r.returncode == 0 and r.stdout.strip() == "0"
    r = run("dump-db-info")
    assert r.returncode == 0
    r = run("show-source", "nope")
    assert r.returncode == 1 and "error:" in r.stderr


@pytest.mark.slow  # parity/diagnostic soak (round-12 verdict #3)


def test_cli_extension_commands(spark, tmp_path):
    """The engine-surface extensions exposed to the shell: stats,
    export-dataset, optimize-layout, stream-ingest."""
    import json as _json

    wh = tmp_path / "warehouse"
    _run(wh, "init-db")
    p = tmp_path / "e.csv"
    p.write_text("a,b\n1,x\n2,y\n2,z\n")
    _run(wh, "ingest", "-n", "ext", str(p))

    _, out = _run(wh, "stats", "ext")
    st = _json.loads(out)
    assert st["__rows"] == 3 and st["a"]["min"] == 1 and st["a"]["max"] == 2

    dest = str(tmp_path / "shards")
    _run(
        wh, "export-dataset", "SELECT a, b FROM ext_v1_typed", dest,
        "--partition-by", "a",
    )
    assert os.path.isdir(os.path.join(dest, "a=1"))
    assert os.path.isdir(os.path.join(dest, "a=2"))

    _, out = _run(wh, "optimize-layout", "ext", "-c", "a")
    assert "Optimized layout" in out
    _, got = _run(wh, "sql", "SELECT COUNT(*) AS n FROM ext_v1_typed")
    assert got.strip().splitlines()[-1] == "3"

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    (inbox / "s1.csv").write_text("id\n1\n")
    _, out = _run(
        wh, "stream-ingest", "-n", "flowed", str(inbox),
        "--checkpoint-dir", str(tmp_path / "ckpt"),
    )
    assert "flowed (version 1)" in out


COMPACT_GOLDEN = os.path.join(
    os.path.dirname(__file__), "golden", "dbinfo-compact.expected"
)


def _compaction_corpus(wh, tmp_path):
    """The runcompactiontests.sh shape: one dataset, two versions, the
    second a superset of the first, pinned clock, user edsko."""
    rows = "".join(f"{i},name{i},{i * 7 % 97}\n" for i in range(200))
    extra = "".join(f"{i},name{i},{i * 7 % 97}\n" for i in range(200, 260))
    p1 = tmp_path / "many-rows.csv"
    p1.write_text("id,name,val\n" + rows)
    p2 = tmp_path / "many-rows-extra.csv"
    p2.write_text("id,name,val\n" + rows + extra)
    _run(wh, "init-db", user="edsko")
    for p in (p1, p2):
        _run(wh, "ingest", "-n", "many-rows.csv", "--created", PIN, str(p),
             user="edsko")


@pytest.mark.slow  # heavyweight soak lane (round-12 verdict #3)
def test_cli_compaction_golden_dump(spark, tmp_path):
    """Mirror of `runcompactiontests.sh:49-62` + dbinfo-compact.expected:
    per-version downloads are byte-identical before and after
    compaction, and the post-compaction dump-db-info matches the
    committed golden."""
    wh = tmp_path / "warehouse"
    _compaction_corpus(wh, tmp_path)
    _, v1 = _run(wh, "download", "many-rows.csv", "-v", "1", user="edsko")
    _, v2 = _run(wh, "download", "many-rows.csv", "-v", "2", user="edsko")
    _run(wh, "compact", "many-rows.csv", user="edsko")
    _, v1c = _run(wh, "download", "many-rows.csv", "-v", "1", user="edsko")
    _, v2c = _run(wh, "download", "many-rows.csv", "-v", "2", user="edsko")
    assert v1c == v1 and v2c == v2
    _, dump = _run(wh, "dump-db-info", user="edsko")
    with open(COMPACT_GOLDEN) as f:
        assert dump == f.read()


@pytest.mark.slow  # parity/diagnostic soak (round-12 verdict #3)


def test_cli_dedup_source(spark, tmp_path):
    wh = tmp_path / "warehouse"
    _run(wh, "init-db", user="admin")
    base = "the quick brown fox jumps over the lazy dog " * 3
    p = tmp_path / "dd.csv"
    p.write_text(
        "txt\n" + base + "short\n" + base + "short\n"
        + base + "longer tail with extra tokens\n"
        + "completely different text about something else entirely ok\n"
    )
    _run(wh, "ingest", "-n", "ddcli", str(p), user="admin")
    _, out = _run(wh, "dedup-source", "ddcli", "--column", "txt",
                  "--min-matches", "6", user="admin")
    assert "version 2" in out and "row count   2" in out


def test_cli_ann_index_and_search(spark, tmp_path):
    wh = tmp_path / "warehouse"
    _run(wh, "init-db", user="admin")
    p = tmp_path / "emb.json"
    p.write_text("[1.0, 0.0]\n[0.9, 0.1]\n[0.0, 1.0]\n[0.1, 0.9]\n")
    _run(wh, "ingest", "-n", "embcli", "--file-type", "json", str(p),
         user="admin")
    _, out = _run(wh, "build-ann-index", "embcli", "--column", "data",
                  "-k", "2", user="admin")
    assert '"k": 2' in out and '"dim": 2' in out
    _, out = _run(wh, "ann-search", "embcli", "--column", "data",
                  "--vector", "[1.0, 0.05]", "--topk", "2", "--nprobe", "1",
                  user="admin")
    lines = [ln for ln in out.splitlines() if ln.strip()]
    assert len(lines) == 2 and lines[0].startswith("1\t")


S3_GOLDEN = os.path.join(
    os.path.dirname(__file__), "golden", "dbinfo-s3.expected"
)


def test_cli_s3_golden_dump(spark, tmp_path, monkeypatch):
    """Mirror of `runs3tests.sh` + dbinfo-s3.expected: ingest a JSON
    numbers file and a CSV whose S3 KEY CONTAINS A SPACE straight from
    s3:// URLs (stubbed client — no boto3 in this container), pinned
    clock, user edsko; the dump must match the committed golden,
    including the source URL lines. Scaled to 1000 JSON values (the
    reference uses 1M for its constant-memory RTS assertion, which
    Spark's executor-side streaming makes moot)."""
    from lagoon_spark.ingest import input as input_mod

    class _FakeS3:
        def __init__(self, objects):
            self.objects = objects

        def download_file(self, bucket, key, filename):
            with open(filename, "wb") as f:
                f.write(self.objects[(bucket, key)])

    nums = "".join(f"{i}\n" for i in range(1000)).encode()
    monkeypatch.setattr(
        input_mod,
        "_make_s3_client",
        lambda: _FakeS3(
            {
                ("my-bucket", "many-json-numbers.json"): nums,
                ("my-bucket", "simple file.csv"): b"Foo\ntrue\n",
            }
        ),
    )
    wh = tmp_path / "warehouse"
    _run(wh, "init-db", user="edsko")
    _run(
        wh, "ingest", "-n", "many-json-numbers.json", "--file-type", "json",
        "--created", PIN, "s3://my-bucket/many-json-numbers.json",
        user="edsko",
    )
    _run(
        wh, "ingest", "-n", "simple file.csv", "--created", PIN,
        "s3://my-bucket/simple file.csv", user="edsko",
    )
    _, dump = _run(wh, "dump-db-info", user="edsko")
    with open(S3_GOLDEN) as f:
        assert dump == f.read()
