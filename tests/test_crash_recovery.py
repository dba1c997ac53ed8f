"""Crash safety for the writer plane (round-8 verdict #4).

The flock serializes LIVE writers; these lanes prove the warehouse
survives a DEAD one. A subprocess ingest is SIGKILLed at the named
kill point — after the data write and the catalog row/column updates,
before the commit (``finalize_source``) — and the warehouse must then
be (a) fully readable, (b) free of any visible partial version, and
(c) cleanly re-ingestable; vacuum sweeps the invisible debris. The
reference gets all of this from Postgres: each ingest is one
transaction (`Ingest.hs`) and torn pages are WAL's problem. The
library-world equivalents under test: the ``pending`` visibility
latch (catalog.py new_source/finalize_source) and the
write-temp-then-rename atomic catalog save.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

import pytest

# kill -9 subprocess crash/replay soak (~90 s) — kept out of the
# driver's verify window (round-12 verdict #3); SPARK_GRAFT_RUN_SLOW=1
pytestmark = pytest.mark.slow

_CHILD = """
import sys
import time

import lagoon_spark.catalog as cat


def _hang(self, ix):
    # the kill point: data written, catalog rows/columns updated,
    # commit NOT yet run — exactly "between the data write and the
    # catalog parquet rewrite" (the round-8 verdict's named window)
    print("KILLPOINT", flush=True)
    time.sleep(600)


cat.Catalog.finalize_source = _hang

from pyspark.sql import SparkSession

from lagoon_spark.engine import Lagoon

spark = (
    SparkSession.builder.master("local[2]")
    .appName("crash_child")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
eng = Lagoon(spark, sys.argv[1], user="crash")
eng.init_db()
eng.ingest(sys.argv[2], "victim")
"""


def test_kill9_mid_ingest_leaves_no_partial_version(spark, tmp_path):
    wh = str(tmp_path / "wh")
    csv = tmp_path / "data.csv"
    csv.write_text("a,b\n" + "\n".join(f"{i},x{i}" for i in range(50)) + "\n")
    script = tmp_path / "child.py"
    script.write_text(_CHILD)

    import lagoon_spark

    repo_root = os.path.dirname(os.path.dirname(lagoon_spark.__file__))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [sys.executable, str(script), wh, str(csv)],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        env=env,
    )
    try:
        # wait for the child to reach the kill point, then kill -9
        reached = False
        deadline = time.time() + 180
        for line in proc.stdout:  # pragma: no branch
            if "KILLPOINT" in line:
                reached = True
                break
            if time.time() > deadline:
                raise AssertionError("child never reached the kill point")
        assert reached, "child exited before the kill point"
        os.kill(proc.pid, signal.SIGKILL)
        proc.wait(30)
    finally:
        if proc.poll() is None:
            proc.kill()

    from lagoon_spark.catalog import Catalog
    from lagoon_spark.engine import Lagoon

    # (a) every catalog table is readable — no torn parquet
    cat = Catalog(wh)
    for t in ("sources", "sourcenames", "sourcecolumns", "tags", "users"):
        cat.load(t)

    # (b) the half-ingested version is INVISIBLE: not the latest, not a
    # version, not a search hit, not in the golden dump
    with pytest.raises(KeyError):
        cat.get_source("victim")
    assert cat.versions("victim") == []
    _page, total = cat.search(name_contains="victim")
    assert total == 0
    # ...but the debris row exists on disk (pending), awaiting vacuum
    raw = cat.load("sources")
    assert len(raw) == 1 and bool(raw.iloc[0]["pending"])

    # (c) a re-run ingests cleanly into the same warehouse
    eng = Lagoon(spark, wh, user="crash")
    info = eng.ingest(str(csv), "victim")
    assert info.row_count == 50
    assert eng.catalog.get_source("victim").ix == info.ix
    # the golden dump shows exactly ONE victim block — the committed one
    assert eng.dump_db_info().count("victim (version") == 1

    # vacuum (admin) sweeps the pending debris — catalog row and its
    # data directories — and leaves the committed re-run untouched
    admin = Lagoon(spark, wh, user="admin")
    swept = admin.vacuum()
    assert any(s.startswith("pending:") for s in swept)
    left = admin.catalog.load("sources")
    assert len(left) == 1 and not bool(left.iloc[0]["pending"])
    assert admin.catalog.get_source("victim").row_count == 50


def test_vacuum_skips_pending_row_of_live_writer(lagoon):
    """A pending row whose writer still HOLDS the lock is an in-flight
    ingest, not debris — vacuum must leave it alone. The live writer is
    a SEPARATE Catalog instance (its flock contends with the vacuuming
    engine's, like a second process would)."""
    from lagoon_spark.catalog import Catalog

    lagoon.user = "admin"
    other = Catalog(lagoon.warehouse)
    with other.writer_lock():
        other.new_source(
            "inflight", url=None, description=None, added_by="admin",
            created=None, fmt="tabular",
        )
        # the sweep needs the lock; the live writer holds it → skip
        swept_while_live = [
            s for s in lagoon.vacuum() if s.startswith("pending:")
        ]
    assert swept_while_live == []
    # writer gone (lock released) → same row is debris
    assert any(s.startswith("pending:") for s in lagoon.vacuum())


def test_atomic_catalog_save_survives_torn_write(tmp_path, monkeypatch):
    """A writer dying INSIDE the base-parquet write (the compaction /
    full-save path) must leave the previous table intact: save()
    writes a temp file and os.replace()s it, so readers see old-or-new,
    never a truncated file."""
    import pyarrow.parquet as pq

    from lagoon_spark.catalog import Catalog

    cat = Catalog(str(tmp_path / "wh"))
    cat.init_db()
    cat.new_source(
        "keepme", url=None, description=None, added_by="x",
        created=None, fmt="tabular",
    )
    cat.finalize_source(1)
    cat.save("sources", cat.load("sources"))  # compact: state → base

    real = pq.write_table

    def torn(table, path, *a, **kw):
        real(table, path, *a, **kw)  # temp file fully written...
        with open(path, "r+b") as fh:  # ...then truncated mid-flush
            fh.truncate(10)
        raise OSError("simulated torn write / disk full")

    monkeypatch.setattr(pq, "write_table", torn)
    with pytest.raises(OSError, match="torn"):
        cat.save("sources", cat.load("sources").assign(row_count=99))
    monkeypatch.undo()

    fresh = Catalog(str(tmp_path / "wh"))
    row = fresh.load("sources")
    assert len(row) == 1 and int(row.iloc[0]["row_count"]) == 0  # old state
    assert fresh.get_source("keepme").name == "keepme"
    # and no temp debris is left beside the table
    leftovers = [
        f for f in os.listdir(fresh.dir) if ".tmp." in f
    ]
    assert leftovers == []


def test_catalog_wal_replay_and_torn_tail(tmp_path):
    """Hot-path mutations are WAL lines, not full rewrites: a fresh
    Catalog instance replays them; a torn tail line (writer killed
    mid-append) is ignored without losing the committed prefix."""
    from lagoon_spark.catalog import Catalog

    cat = Catalog(str(tmp_path / "wh"))
    cat.init_db()
    ix, _v, _t, _vw = cat.new_source(
        "walme", url=None, description=None, added_by="x",
        created=None, fmt="tabular",
    )
    cat.update_source(ix, row_count=7)
    cat.finalize_source(ix)
    cat.tag(ix, "hello")
    # the mutations live in the log, not the base (no compaction yet)
    assert os.path.exists(os.path.join(cat.dir, "sources.log.jsonl"))

    fresh = Catalog(str(tmp_path / "wh"))
    got = fresh.get_source("walme")
    assert got.row_count == 7 and not got.deprecated
    assert ix in fresh.find_by_tag("hello")

    # torn tail: append half a line, as a kill -9 mid-write would
    with open(os.path.join(cat.dir, "sources.log.jsonl"), "a") as fh:
        fh.write('{"seq": 999, "op": "set", "whe')
    fresh2 = Catalog(str(tmp_path / "wh"))
    assert fresh2.get_source("walme").row_count == 7  # prefix intact


def test_catalog_wal_compaction_is_replay_safe(tmp_path):
    """Crash BETWEEN the compaction's base replace and its log unlink:
    the base's applied-seq watermark (in the parquet footer, atomic
    with the data) filters the stale lines, so nothing double-applies
    — even for non-idempotent-looking histories (delete then a crash
    must not resurrect the row from an old log line)."""
    import shutil

    from lagoon_spark.catalog import Catalog

    cat = Catalog(str(tmp_path / "wh"))
    cat.init_db()
    ix, _v, _t, _vw = cat.new_source(
        "ghost", url=None, description=None, added_by="x",
        created=None, fmt="tabular",
    )
    cat.finalize_source(ix)
    log_p = os.path.join(cat.dir, "sources.log.jsonl")
    saved_log = log_p + ".copy"
    shutil.copy(log_p, saved_log)  # the log as of the live row

    # delete the source (a full-save path) — then simulate the crash
    # window by restoring the pre-delete log beside the new base
    sources = cat.load("sources")
    cat.save("sources", sources[sources["ix"] != ix])
    shutil.copy(saved_log, log_p)

    fresh = Catalog(str(tmp_path / "wh"))
    rows = fresh.load("sources")
    # the old "up"/"tx" lines are below the base watermark: filtered
    assert not len(rows[rows["ix"] == ix])


def test_catalog_load_retry_exhaustion_reads_under_lock(tmp_path, monkeypatch):
    """Round-10 verdict #2: when the base moves on EVERY lock-free
    read attempt (a pathologically hot compactor), load() must not
    silently cache the last — possibly chimeric — snapshot. It takes
    the writer lock and re-reads once, authoritatively: the returned
    data is correct and the lock was actually acquired."""
    import itertools

    from lagoon_spark.catalog import Catalog

    cat = Catalog(str(tmp_path / "wh"))
    cat.init_db()
    ix, _v, _t, _vw = cat.new_source(
        "hotbase", url=None, description=None, added_by="x",
        created=None, fmt="tabular",
    )
    cat.update_source(ix, row_count=42)

    fresh = Catalog(str(tmp_path / "wh"))
    # every stat call returns a different key -> all 8 lock-free
    # attempts look torn; only the locked re-read can satisfy load()
    counter = itertools.count()
    monkeypatch.setattr(
        Catalog, "_base_stat", lambda self, table: next(counter)
    )
    locked: list[float] = []
    real_lock = Catalog.writer_lock

    def spying_lock(self, timeout: float = 600.0):
        locked.append(timeout)
        return real_lock(self, timeout)

    monkeypatch.setattr(Catalog, "writer_lock", spying_lock)
    rows = fresh.load("sources")
    assert locked, "retry exhaustion must fall back to a locked read"
    assert int(rows[rows["ix"] == ix].iloc[0]["row_count"]) == 42


def test_catalog_load_consistent_read_never_locks(tmp_path, monkeypatch):
    """The happy path stays lock-free: a stable base key means the
    first attempt wins and writer_lock is never touched."""
    from lagoon_spark.catalog import Catalog

    cat = Catalog(str(tmp_path / "wh"))
    cat.init_db()
    cat.new_source(
        "coldbase", url=None, description=None, added_by="x",
        created=None, fmt="tabular",
    )

    fresh = Catalog(str(tmp_path / "wh"))

    def no_lock(self, timeout: float = 600.0):
        raise AssertionError("consistent read must not take the writer lock")

    monkeypatch.setattr(Catalog, "writer_lock", no_lock)
    assert len(fresh.load("sources")) >= 1


def test_json_scalar_rejects_non_native_types(tmp_path):
    """Round-10 advice: a WAL field that isn't JSON-native (bytes,
    datetime, ...) must raise at WRITE time — a str(v) fallback would
    replay as a string after restart while the in-memory state kept
    the original type."""
    import numpy as np
    import pytest as _pytest

    from lagoon_spark.catalog import _json_scalar

    # numpy scalars unwrap
    assert _json_scalar(np.int64(7)) == 7
    assert _json_scalar(np.float64(1.5)) == 1.5
    assert _json_scalar(np.bool_(True)) is True
    # everything else fails loudly
    import datetime

    for bad in (b"bytes", datetime.datetime(2026, 1, 1), {1, 2}, object()):
        with _pytest.raises(TypeError, match="JSON-native"):
            _json_scalar(bad)


def test_deferred_deletes_batch_one_flush(tmp_path):
    """``del`` WAL ops are fsynced immediately but materialized lazily:
    a burst of deletes ORs into a pending mask and the next load() pays
    ONE filtered copy; every read surface (get_source, search, replay
    by a fresh instance) sees post-delete state; interleaving a non-del
    mutation flushes first so frame order matches log order."""
    from lagoon_spark.catalog import Catalog

    cat = Catalog(str(tmp_path / "wh"))
    cat.init_db()
    ixs = []
    for i in range(6):
        ix, _v, _t, _vw = cat.new_source(
            f"ds{i}", url=None, description=None, added_by="x",
            created=None, fmt="tabular",
        )
        cat.finalize_source(ix)
        ixs.append(ix)

    cat.load("sources")  # materialize the ingest tail into the frame
    cat.delete_source(ixs[0])
    cat.delete_source(ixs[1])
    # pending mask exists, frame not yet filtered
    assert cat._pending_del_mask.get("sources") is not None
    # delete_source's own lookup is pending-aware: the deleted ix is
    # gone even before any flush
    import pytest

    with pytest.raises(KeyError):
        cat.delete_source(ixs[0])
    # a read flushes the batch in one copy
    s = cat.load("sources")
    assert "sources" not in cat._pending_del_mask
    assert set(s["ix"]) == set(ixs[2:])
    assert list(s.index) == list(range(len(s)))

    # interleaved non-del ops apply against the pending state without
    # forcing a flush (live mirror of _replay_ops); the next load()
    # still materializes the correct post-everything frame
    cat.delete_source(ixs[2])
    cat.tag(ixs[3], "keep")
    cat.update_source(ixs[3], row_count=42)
    assert "sources" in cat._pending_del_mask  # still deferred
    s = cat.load("sources")
    assert ixs[2] not in set(s["ix"])
    assert int(s[s["ix"] == ixs[3]].iloc[0]["row_count"]) == 42

    # fresh instance replays the same state from base+WAL
    fresh = Catalog(str(tmp_path / "wh"))
    assert set(fresh.load("sources")["ix"]) == set(ixs[3:])
    assert fresh.find_by_tag("keep") == [ixs[3]]

    # live cross-instance visibility: an instance with a WARM cache
    # refreshes past another writer's deferred delete (the WAL line is
    # on disk before delete_source returns, so the disk token moved)
    other = Catalog(str(tmp_path / "wh"))
    other.load("sources")  # warm its cache
    cat.delete_source(ixs[3])
    other.refresh()
    assert ixs[3] not in set(other.load("sources")["ix"])

    # save() with an unflushed pending mask must fail loudly: it would
    # retire the WAL and silently resurrect the deleted rows
    cat.delete_source(ixs[4])
    stale = cat._cache["sources"]
    with pytest.raises(RuntimeError, match="pending deletes"):
        cat.save("sources", stale)


def test_deferred_appends_batch_and_tail_deletes(tmp_path):
    """Ingest-path mutations defer too: new rows buffer in a pending
    tail (no per-op frame copy), in-flight updates hit the tail dict,
    a delete of a never-materialized row drops it from the tail, and
    load()/fresh-replay both see the correct final state."""
    from lagoon_spark.catalog import Catalog

    cat = Catalog(str(tmp_path / "wh"))
    cat.init_db()
    cat.load("sources")
    base_len = len(cat._cache["sources"])
    ixs = []
    for i in range(4):
        ix, _v, _t, _vw = cat.new_source(
            f"ds{i}", url=None, description=None, added_by="x",
            created=None, fmt="tabular",
        )
        cat.update_source(ix, row_count=i * 10)
        cat.finalize_source(ix)
        ixs.append(ix)
    # all four rows still live in the tail — frame object untouched
    assert len(cat._cache["sources"]) == base_len
    assert len(cat._pending_tail["sources"]) == 4
    # the set ops reached the tail dicts, not a frame copy
    assert [r["row_count"] for r in cat._pending_tail["sources"]] == [
        0, 10, 20, 30,
    ]
    assert all(not r["pending"] for r in cat._pending_tail["sources"])
    # delete a never-materialized row: dropped from the tail, no mask
    cat.delete_source(ixs[1])
    assert len(cat._pending_tail["sources"]) == 3
    assert cat._pending_del_mask.get("sources") is None
    # one load folds the batch; versions minted correctly (v1 each name)
    s = cat.load("sources")
    assert set(s["ix"]) == set(ixs) - {ixs[1]}
    assert list(s["version"][s["ix"].isin(ixs)]) == [1, 1, 1]
    assert "sources" not in cat._pending_tail
    # same-name reingest AFTER materialization mints v2 and
    # auto-deprecates v1 even while the new row is still in the tail
    ix2, v2, _t, _vw = cat.new_source(
        "ds0", url=None, description=None, added_by="x",
        created=None, fmt="tabular",
    )
    assert v2 == 2
    cat.finalize_source(ix2)
    s = cat.load("sources")
    assert bool(s[s["ix"] == ixs[0]].iloc[0]["deprecated"])
    assert not bool(s[s["ix"] == ix2].iloc[0]["deprecated"])
    # fresh instance replays to the identical state
    fresh = Catalog(str(tmp_path / "wh"))
    s2 = fresh.load("sources")
    import pandas as pd

    pd.testing.assert_frame_equal(
        s.sort_values("ix").reset_index(drop=True),
        s2.sort_values("ix").reset_index(drop=True),
    )


def test_replay_ops_differential_vs_naive(tmp_path):
    """Randomized differential: the index-backed bulk replay
    (_replay_ops: batch-local sorted keys, alive-mask deletes) must
    produce exactly the state of the naive op-by-op semantics it
    replaced — including order dependence (set-after-del must not see
    the row; up-after-del re-inserts via the tail; a later where can
    match values an earlier op wrote)."""
    import random

    import pandas as pd

    from lagoon_spark.catalog import Catalog

    rng = random.Random(20260816)
    cat = Catalog(str(tmp_path / "wh"))

    def naive(df, ops):
        tail = []

        def flat(ops):
            for op in ops:
                if op["op"] == "tx":
                    yield from op["ops"]
                else:
                    yield op

        def matches(rec, where):
            return all(rec.get(c) == v for c, v in where.items())

        def mask(df, where):
            m = pd.Series(True, index=df.index)
            for c, v in where.items():
                m &= df[c] == v
            return m

        for op in flat(ops):
            if op["op"] == "up":
                for row in op["rows"]:
                    key = {c: row[c] for c in op["pk"]}
                    idx = df.index[mask(df, key)] if len(df) else []
                    if len(idx):
                        for k, v in row.items():
                            df.loc[idx, k] = v
                        continue
                    hit = next((r for r in tail if matches(r, key)), None)
                    if hit is not None:
                        hit.update(row)
                    else:
                        tail.append(dict(row))
            elif op["op"] == "set":
                idx = df.index[mask(df, op["where"])] if len(df) else []
                for k, v in op["fields"].items():
                    df.loc[idx, k] = v
                for r in tail:
                    if matches(r, op["where"]):
                        r.update(op["fields"])
            elif op["op"] == "del":
                if len(df):
                    df = df[~mask(df, op["where"])]
                tail = [r for r in tail if not matches(r, op["where"])]
        if tail:
            df = pd.concat([df, pd.DataFrame(tail)], ignore_index=True)
        else:
            df.index = pd.RangeIndex(len(df))
        return df

    for trial in range(25):
        n = rng.randint(0, 40)
        base = pd.DataFrame(
            {
                "ix": range(n),
                "source_ix": [rng.randint(0, 6) for _ in range(n)],
                "name": [f"n{rng.randint(0, 9)}" for _ in range(n)],
                "flag": [bool(rng.randint(0, 1)) for _ in range(n)],
            }
        )
        ops = []
        next_ix = n
        for _ in range(rng.randint(1, 30)):
            kind = rng.choice(["up", "up", "set", "del", "tx"])
            if kind == "up":
                # mix of updates to existing ixs and fresh appends
                ix = (
                    rng.randrange(max(next_ix, 1))
                    if rng.random() < 0.7
                    else next_ix
                )
                next_ix = max(next_ix, ix + 1)
                ops.append(
                    {
                        "op": "up",
                        "pk": ["ix"],
                        "rows": [
                            {
                                "ix": ix,
                                "source_ix": rng.randint(0, 6),
                                "name": f"n{rng.randint(0, 9)}",
                                "flag": bool(rng.randint(0, 1)),
                            }
                        ],
                    }
                )
            elif kind == "set":
                where = rng.choice(
                    [
                        {"ix": rng.randrange(max(next_ix, 1))},
                        {"source_ix": rng.randint(0, 6)},
                        {
                            "source_ix": rng.randint(0, 6),
                            "name": f"n{rng.randint(0, 9)}",
                        },
                    ]
                )
                ops.append(
                    {
                        "op": "set",
                        "where": where,
                        "fields": {
                            "flag": bool(rng.randint(0, 1)),
                            "name": f"n{rng.randint(0, 9)}",
                        },
                    }
                )
            elif kind == "del":
                where = rng.choice(
                    [
                        {"ix": rng.randrange(max(next_ix, 1))},
                        {"source_ix": rng.randint(0, 6)},
                    ]
                )
                ops.append({"op": "del", "where": where})
            else:
                ops.append(
                    {
                        "op": "tx",
                        "ops": [
                            {
                                "op": "set",
                                "where": {
                                    "ix": rng.randrange(max(next_ix, 1))
                                },
                                "fields": {"flag": True},
                            },
                            {
                                "op": "del",
                                "where": {"source_ix": rng.randint(0, 6)},
                            },
                        ],
                    }
                )
        got = cat._replay_ops(base.copy(), list(ops))
        want = naive(base.copy(), list(ops))
        pd.testing.assert_frame_equal(
            got.sort_values("ix").reset_index(drop=True),
            want.sort_values("ix").reset_index(drop=True),
            check_dtype=False,
        ), f"trial {trial}"


def test_adaptive_compaction_cadence_replays_identical(tmp_path):
    """The cadence scales with the frame (floor 128, cap 4096) and a
    cold open across a longer-than-128-line log replays to the exact
    same state a continuously-live instance holds."""
    from lagoon_spark.catalog import Catalog

    cat = Catalog(str(tmp_path / "wh"))
    cat.init_db()
    assert cat._compact_every("sources") == cat.COMPACT_EVERY
    ixs = []
    for i in range(150):
        ix, _v, _t, _vw = cat.new_source(
            f"d{i}", url=None, description=None, added_by="x",
            created=None, fmt="tabular",
        )
        cat.update_source(ix, row_count=i)
        cat.finalize_source(ix)
        ixs.append(ix)
    # sanity on the scaling function itself
    import pandas as pd

    cat._cache["__probe"] = pd.DataFrame({"x": range(1_000_000)})
    assert cat._compact_every("__probe") == 1_000_000 // 256
    cat._cache["__probe"] = pd.DataFrame({"x": range(10_000_000)})
    assert cat._compact_every("__probe") == cat._COMPACT_CAP
    del cat._cache["__probe"]

    live = cat.load("sources").sort_values("ix").reset_index(drop=True)
    fresh = Catalog(str(tmp_path / "wh"))
    replayed = (
        fresh.load("sources").sort_values("ix").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(live, replayed)
    got = fresh.get_source(f"d{len(ixs) - 1}")
    assert got.row_count == len(ixs) - 1
