"""The metadata catalog: sources, versions, columns, tags, users.

Mirrors the reference's Postgres schema
(`src/backend/src/Lagoon/DB/Schema.hs:104-333`) table-for-table:
``sourcenames`` (named dataset → version counter), ``sources`` (one row
per ingested version), ``sourcecolumns`` (physical name c1..cN, view
header, inferred type), ``tags``, ``users``.

Storage: parquet files under ``<warehouse>/catalog/`` written with
pyarrow on the driver. The catalog is metadata-sized (rows ∝ number of
*datasets*, not data rows), so driver-side IO is the right tool — the
reference likewise keeps it in ordinary Postgres tables next to the
data plane. Caches (the reference maintains them with triggers,
`Schema.hs:668-783`) are recomputed on write instead.

Versioning semantics (`src/backend/src/Lagoon/DB/Sources.hs:62-135`):
a new ingest under an existing name allocates version = max+1 and
auto-deprecates the previous latest; table/view names are
``t<ix>`` / ``<sanitized>_v<N>`` (`Sources.hs:186-188`).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from datetime import datetime, timezone

import pandas as pd

from lagoon_spark.ingest.names import sanitize

_TABLES = {
    # created_by anchors dataset-level ownership: the creator keeps
    # their rights even after their earliest version is deleted
    "sourcenames": {"ix": "int64", "name": "object", "created_by": "object"},
    "sources": {
        "ix": "int64",
        "sourcename_ix": "int64",
        "version": "int64",
        "url": "object",
        "description": "object",
        "created": "object",
        "added_by": "object",
        "table_name": "object",
        "view_name": "object",
        "typed_table_name": "object",
        "typed_view_name": "object",
        "deprecated": "bool",
        "row_count": "int64",
        "format": "object",  # tabular | json
        "json_type": "object",  # rendered JsonType for json sources
        # True from new_source until the ingest finishes: a version is
        # INVISIBLE (get_source/versions/search/views) while pending,
        # so a writer killed mid-ingest never exposes a half-built
        # version — the library-world stand-in for the reference's
        # per-ingest Postgres transaction (Ingest.hs)
        "pending": "bool",
    },
    "sourcecolumns": {
        "source_ix": "int64",
        "column_name": "object",  # physical c1..cN (or 'data' for json)
        "header": "object",  # friendly view name
        "type": "object",  # ColumnType value string
    },
    "tags": {"source_ix": "int64", "tag": "object"},
    "users": {"ix": "int64", "name": "object"},
}


@dataclass
class SourceInfo:
    """A dataset version (`Lagoon.Interface.SourceInfo`,
    `src/interface/src/Lagoon/Interface/SourceInfo.hs:52-81`)."""

    ix: int
    name: str
    version: int
    url: str | None
    description: str
    created: str
    added_by: str
    table_name: str
    view_name: str
    typed_table_name: str | None
    typed_view_name: str | None
    deprecated: bool
    row_count: int
    format: str
    json_type: str | None
    tags: list[str] = field(default_factory=list)
    columns: list[tuple[str, str, str]] = field(default_factory=list)
    # (physical_name, header, type)


def _now() -> str:
    return datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M:%S")


def _visible(sources: pd.DataFrame) -> pd.DataFrame:
    """Rows whose ingest has committed (``pending`` False or absent).
    Pre-v5 frames (opened without migrate) lack the column — every row
    there was written by a finish-or-rollback engine, so all visible."""
    if "pending" not in sources.columns:
        return sources
    return sources[~sources["pending"].fillna(False).astype(bool)]


# Catalog layout version. v1 = the pre-dbmeta layout (no version file);
# v2 records the version in dbmeta and reconciles every table to the
# current column set; v3 adds sourcenames.created_by (dataset-level
# ownership) backfilled from each dataset's earliest surviving version;
# v5 adds sources.pending (crash-safe ingest visibility; existing rows
# reconcile to False = visible).
# Bump this and add a _MIGRATIONS entry whenever the layout changes.
CATALOG_VERSION = 5


def _atomic_to_parquet(df: pd.DataFrame, path: str) -> None:
    """write-temp-then-``os.replace``: the same crash discipline as
    :meth:`Catalog.save`, for writers that bypass the cache (the
    migration chain). A process killed mid-migration must leave the
    old table intact, never a truncated parquet."""
    tmp = path + f".tmp.{os.getpid()}"
    try:
        df.to_parquet(tmp, index=False)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def _json_scalar(v):
    """JSON default hook for WAL lines: numpy scalars → Python.

    Anything else raises (round-10 advice): a silently stringified
    field (bytes, timestamp, ...) would REPLAY as a string after a
    restart while the in-memory `_apply_live` kept the original type —
    a divergence that must fail loudly at write time, not surface as
    a type mismatch weeks later."""
    item = getattr(v, "item", None)
    if callable(item):
        out = item()
        if isinstance(out, (bool, int, float, str)) or out is None:
            return out
    raise TypeError(
        f"WAL fields must be JSON-native or numpy scalars, got "
        f"{type(v).__name__}: {v!r}"
    )


def _migrate_1_to_2(cat: "Catalog") -> None:
    """v1 → v2: schema-reconcile each catalog table — add any column the
    current layout has that the stored file lacks (with type-appropriate
    defaults), drop nothing. Opens warehouses written before the version
    file existed."""
    defaults = {"int64": 0, "bool": False, "object": None}
    for table, spec in _TABLES.items():
        if not os.path.exists(cat._path(table)):
            continue
        # load()/save(), not raw parquet IO: the table's current state
        # may live partly in its WAL, and save() re-stamps the
        # applied-seq watermark + retires the log atomically
        df = cat.load(table).copy()
        changed = False
        for col, dtype in spec.items():
            if col not in df.columns:
                df[col] = pd.Series(
                    [defaults[dtype]] * len(df), dtype=dtype, index=df.index
                )
                changed = True
        if changed:
            df = df[[c for c in spec] + [c for c in df.columns if c not in spec]]
            cat.save(table, df)


def _migrate_2_to_3(cat: "Catalog") -> None:
    """v2 → v3: backfill ``sourcenames.created_by`` from the earliest
    surviving version's uploader (the best available proxy for the
    original creator in an old warehouse)."""
    if not os.path.exists(cat._path("sourcenames")):
        return
    names = cat.load("sourcenames").copy()
    sources = (
        cat.load("sources")
        if os.path.exists(cat._path("sources"))
        else None
    )
    creators = {}
    if sources is not None and len(sources):
        earliest = sources.sort_values("version").groupby("sourcename_ix").first()
        creators = earliest["added_by"].to_dict()
    if "created_by" not in names.columns:
        names["created_by"] = None
    names["created_by"] = [
        row["created_by"]
        if isinstance(row.get("created_by"), str)
        else creators.get(row["ix"])
        for _, row in names.iterrows()
    ]
    cat.save("sourcenames", names)


def _migrate_3_to_4(cat: "Catalog") -> None:
    """v3 → v4: re-anchor ACL rows from version ix to the dataset's
    sourcename_ix (matching the reference's CanReadDataset keying).
    Multiple version rows of one dataset collapse to one anchored row
    at the *max* level — the pre-migration semantics aggregated levels
    across sibling versions, so max preserves every access a user had."""
    level_rank = {"read": 1, "update": 2, "manage": 3}
    sources = (
        cat.load("sources")
        if os.path.exists(cat._path("sources"))
        else None
    )

    def anchor(ix: int) -> int:
        if sources is None or not len(sources):
            return int(ix)
        row = sources[sources["ix"] == ix]
        return int(row.iloc[0]["sourcename_ix"]) if len(row) else int(ix)

    gp = os.path.join(cat.dir, "grants.parquet")
    if os.path.exists(gp):
        g = pd.read_parquet(gp)
        if "source_ix" in g.columns:
            g["sourcename_ix"] = [anchor(ix) for ix in g["source_ix"]]
            g = g.drop(columns=["source_ix"])
            g["__rank"] = g["level"].map(level_rank).fillna(0)
            g = (
                g.sort_values("__rank")
                .groupby(["sourcename_ix", "subject_type", "subject"], as_index=False)
                .last()
                .drop(columns=["__rank"])
            )
            _atomic_to_parquet(g, gp)

    pp = os.path.join(cat.dir, "public_sources.parquet")
    if os.path.exists(pp):
        p = pd.read_parquet(pp)
        if "source_ix" in p.columns:
            p["sourcename_ix"] = [anchor(ix) for ix in p["source_ix"]]
            p = p.drop(columns=["source_ix"])
            p["__rank"] = p["level"].map(level_rank).fillna(1)
            p = (
                p.sort_values("__rank")
                .groupby(["sourcename_ix"], as_index=False)
                .last()
                .drop(columns=["__rank"])
            )
            _atomic_to_parquet(p, pp)


# v4 → v5 reuses the generic schema reconcile: it adds the new
# sources.pending column with its bool default (False = visible),
# which is exactly the right backfill for every pre-v5 row
_MIGRATIONS = {
    1: _migrate_1_to_2,
    2: _migrate_2_to_3,
    3: _migrate_3_to_4,
    4: _migrate_1_to_2,
}


class Catalog:
    def __init__(self, warehouse: str):
        self.warehouse = warehouse
        self.dir = os.path.join(warehouse, "catalog")
        self._cache: dict[str, pd.DataFrame] = {}
        # WAL bookkeeping: last sequence number per table (base
        # watermark ∨ last log line) and current log length
        self._seq: dict[str, int] = {}
        self._log_lines: dict[str, int] = {}
        # on-disk fingerprint each cache entry was built from — lets
        # refresh() keep entries whose files no other writer touched
        self._disk_token: dict[str, tuple] = {}
        # deferred mutations: WAL ops are fsynced immediately
        # (durability/ordering) but their O(n) frame materialization is
        # batched. Deletes OR a row mask into _pending_del_mask;
        # appended rows buffer as dicts in _pending_tail; updates hit
        # the frame in place (no copy) or the tail dict. load() folds
        # both into the frame with ONE filtered copy + ONE concat per
        # read burst, so a burst of k mutations is O(n + k) frame work
        # instead of O(n·k) (round-10: delete_source was 86 ms and an
        # ingest 22-33 ms at 100k sources, almost all per-op frame
        # copies). The live mirror of _replay_ops.
        self._pending_del_mask: dict[str, "object"] = {}
        self._pending_tail: dict[str, "list[dict]"] = {}
        # bumped on every write through THIS instance; state_token()
        # is the cross-instance (warehouse-state) change signal
        self.mutation_count = 0
        # memoized sources⋈sourcenames frame for search(): the merge is
        # O(n) per call (~60 ms of the 183 ms warm search at 100k
        # sources, CATALOG_SCALE_r10). Keyed on (mutation_count, frame
        # identities) — every in-place WAL mutation bumps the count,
        # and a refresh() reload swaps the frame objects; the tuple
        # keeps strong refs so CPython can't reuse the ids while the
        # entry is live.
        self._merged_cache: "tuple | None" = None
        self._lock_depth = 0
        self._lock_owner: int | None = None  # threading.get_ident() of holder
        import threading

        # same-process cross-thread writer serialization (server handler
        # threads, streaming foreachBatch vs main thread); the flock in
        # writer_lock only arbitrates between processes
        self._tlock = threading.RLock()

    def writer_lock(self, timeout: float = 600.0):
        """Exclusive warehouse writer lock (flock on
        ``catalog/.writer.lock``) held for the span of one mutating
        operation — an ingest, compaction, delete, or streaming batch.

        The catalog is parquet + an in-process pandas cache; without
        the lock, two engines mutating one warehouse interleave their
        read-modify-write cycles (both compute the same next source
        ix, one's sources.parquet write silently erases the other's
        row). The reference gets this for free from Postgres
        transactions (`Ingest.hs` runs each ingest in one); flock is
        the library-world equivalent. On acquisition the in-memory
        cache is dropped so this writer builds on the other writer's
        committed state. Reentrant within one Catalog instance FROM THE
        SAME THREAD only (an ingest inside a streaming batch
        re-enters); a second THREAD in this process serializes on an
        in-process RLock (flock alone can't arbitrate threads sharing
        one instance — a cross-thread writer seeing ``_lock_depth=1``
        must wait, not stroll through the reentrant branch), and a
        second PROCESS blocks on the flock. Either blocks up to
        ``timeout`` seconds, then fails cleanly with TimeoutError —
        never corrupting the catalog either way.
        """
        import contextlib
        import threading

        @contextlib.contextmanager
        def _guard():
            ident = threading.get_ident()
            if self._lock_depth and self._lock_owner == ident:
                self._lock_depth += 1
                try:
                    yield
                finally:
                    self._lock_depth -= 1
                return
            import time

            # one budget covers BOTH waits: a contender may spend part
            # of `timeout` on the in-process RLock and only the
            # remainder in the flock spin — the documented "blocks up
            # to timeout seconds" contract, not up to 2×
            t0 = time.monotonic()
            # cross-thread writers in this process serialize here; the
            # flock below arbitrates only between processes (a second
            # flock on the same file in one process would also block,
            # but with a spin-wait and no fairness)
            if not self._tlock.acquire(timeout=timeout):
                raise TimeoutError(
                    "another thread holds the warehouse writer lock for "
                    f"{self.dir}"
                )
            try:
                try:
                    import fcntl
                except ImportError:  # non-POSIX: single-process only
                    fcntl = None
                f = None
                if fcntl is not None:
                    os.makedirs(self.dir, exist_ok=True)
                    f = open(os.path.join(self.dir, ".writer.lock"), "a+")
                    while True:
                        try:
                            fcntl.flock(f, fcntl.LOCK_EX | fcntl.LOCK_NB)
                            break
                        except OSError:
                            if time.monotonic() - t0 > timeout:
                                f.close()
                                raise TimeoutError(
                                    "another writer holds the warehouse lock "
                                    f"{self.dir}/.writer.lock"
                                )
                            time.sleep(0.05)
                self._lock_depth = 1
                self._lock_owner = ident
                self.refresh()  # build on the other writer's committed state
                try:
                    yield
                finally:
                    self._lock_depth = 0
                    self._lock_owner = None
                    if f is not None:
                        fcntl.flock(f, fcntl.LOCK_UN)
                        f.close()
            finally:
                self._tlock.release()

        return _guard()

    # -- storage ------------------------------------------------------------

    def _path(self, table: str) -> str:
        return os.path.join(self.dir, f"{table}.parquet")

    def _empty(self, table: str) -> pd.DataFrame:
        return pd.DataFrame(
            {c: pd.Series(dtype=t) for c, t in _TABLES[table].items()}
        )

    def state_token(self) -> str:
        """Digest of the on-disk catalog state (parquet names, sizes,
        mtimes). Changes whenever ANY writer mutates the warehouse —
        this instance, another Catalog object in-process, or an
        external process — so consumers (engine.sql's view
        registration) can memoize on warehouse state instead of a
        per-instance counter, which two instances could coincidentally
        share (round-3 advisory)."""
        import hashlib

        h = hashlib.blake2b(digest_size=16)
        try:
            entries = sorted(os.scandir(self.dir), key=lambda e: e.name)
        except FileNotFoundError:
            return "empty"
        for e in entries:
            if e.name.endswith(".parquet") or e.name.endswith(".log.jsonl"):
                st = e.stat()
                h.update(f"{e.name}:{st.st_mtime_ns}:{st.st_size};".encode())
        return h.hexdigest()

    def refresh(self, force: bool = False) -> None:
        """Invalidate the in-memory table cache so the next load()
        builds on committed on-disk state.

        Validity-aware (round-10: writer_lock refreshes on EVERY
        mutation, and an unconditional drop made each mutation replay
        the whole WAL tail with O(n) masks — the delete/ingest cost
        curve at 100k sources): a cached table is dropped only when its
        on-disk (base stat, log size) no longer matches the token
        captured when the cache entry was built — i.e. exactly when
        another writer actually committed something. ``force=True``
        drops everything unconditionally (cold-read simulation,
        corruption recovery)."""
        if force:
            self._cache.clear()
            self._seq.clear()
            self._log_lines.clear()
            self._disk_token.clear()
            self._pending_del_mask.clear()
            self._pending_tail.clear()
            return
        for table in list(self._cache):
            if self._disk_token.get(table) != self._table_token(table):
                self._cache.pop(table, None)
                self._seq.pop(table, None)
                self._log_lines.pop(table, None)
                self._disk_token.pop(table, None)
                self._pending_del_mask.pop(table, None)
                self._pending_tail.pop(table, None)

    def _log_size(self, table: str) -> int:
        try:
            return os.stat(self._log_path(table)).st_size
        except FileNotFoundError:
            return 0

    def _table_token(self, table: str) -> "tuple":
        """(base stat, log size) fingerprint of a table's on-disk state
        — every committed mutation moves one of the two (appends grow
        the log; compaction/save replaces the base inode)."""
        return (self._base_stat(table), self._log_size(table))

    # -- write-ahead log ------------------------------------------------------
    #
    # Per-ingest full-parquet rewrites are O(#sources) each — measured
    # 28→73 ms/ingest from 1k→10k sources, O(n²) cumulative (round-8
    # verdict #6). Hot-path mutations (new version, row-count update,
    # finalize, tag, column set) therefore append ONE fsynced JSONL
    # line to ``<table>.log.jsonl`` instead; the base parquet carries
    # the sequence number of the last op it includes in its footer
    # metadata (atomic with the data via os.replace), and load() replays
    # only lines PAST that watermark — so a compaction or full save
    # racing a crash can never double-apply or lose an op. Ops are
    # row-keyed upserts / predicate updates / deletes; a multi-op "tx"
    # line applies atomically (one line, one fsync). The log compacts
    # back into the base every COMPACT_EVERY ops, under the writer lock
    # like every other mutation.

    # Compaction cadence balances two costs: per-ingest write
    # amplification (one full-table rewrite per COMPACT_EVERY ops —
    # ~40 ms/128 ≈ 0.3 ms/op amortized at 10k sources) against
    # cold-open replay length (a fresh process replays ≤ COMPACT_EVERY
    # lines per table, each an O(rows) predicate mask — ~3 ms/line on
    # a 600k-row frame, so 128 keeps cold opens under ~0.6 s at any
    # population). A frame-size-scaled threshold was tried in round 10
    # and reverted: it cut ingest 16 → 13 ms at 100k sources but blew
    # the cold open 0.6 → 6.3 s, because replay masks are O(rows) per
    # line — the fixed bound is what keeps restart latency flat.
    COMPACT_EVERY = 128
    _SEQ_META = b"lagoon_applied_seq"

    def _log_path(self, table: str) -> str:
        return os.path.join(self.dir, f"{table}.log.jsonl")

    def _ensure_seq(self, table: str) -> int:
        """The table's current sequence number — max of the base's
        applied watermark and any log line — loading it from disk if
        this instance hasn't touched the table yet. save() MUST stamp
        a watermark ≥ every existing log line, or a crash between its
        base replace and log unlink would replay those lines onto a
        state that already (or no longer) reflects them."""
        if table not in self._seq:
            self.load(table)
        return self._seq.get(table, 0)

    @staticmethod
    def _mask(df: pd.DataFrame, where: dict) -> "pd.Series":
        """Boolean mask for a WAL where-clause.

        Evaluated cheapest-first (round-10, the 100k-catalog ingest
        cliff): numeric-column equality is a vectorized numpy compare
        (~0.2 ms at 200k rows) while OBJECT-dtype (string) equality is
        ~7 ms per pass — so numeric conditions run over the full frame
        and string conditions run only over the rows that survive
        them. Ingest-path ops key on fresh integer ix/source_ix values
        that match nothing or one row, so the object comparisons end
        up scanning a handful of rows instead of the whole catalog."""
        cols = sorted(
            where,
            key=lambda c: 0
            if c in df.columns and df[c].dtype.kind in "biufc"
            else 1,
        )
        if not cols:
            return pd.Series(True, index=df.index)
        live_idx = None  # None = the whole frame (skips one .loc copy)
        for c in cols:
            series = df[c] if live_idx is None else df.loc[live_idx, c]
            hit = (series == where[c]).to_numpy(dtype=bool)
            live_idx = (df.index if live_idx is None else live_idx)[hit]
            if not len(live_idx):
                break
        m = pd.Series(False, index=df.index)
        if len(live_idx):
            m.loc[live_idx] = True
        return m


    def _log_op(self, table: str, op: dict) -> None:
        """Apply ``op`` incrementally to the cached frame (no
        whole-frame copy — see :meth:`_apply_live`) and append it to
        the table's WAL (one fsynced line = one atomic mutation). The
        frame materializes lazily at the next load()."""
        self._apply_live(table, op)
        self._append_op(table, op)
        if self._log_lines[table] >= self.COMPACT_EVERY:
            # compaction: base absorbs the log
            self.save(table, self._flush_pending(table))

    @staticmethod
    def _matches(rec: dict, where: dict) -> bool:
        return all(rec.get(c) == v for c, v in where.items())

    def _apply_live(self, table: str, op: dict) -> None:
        """Apply one op to the cached frame WITHOUT any whole-frame
        copy — the live mirror of :meth:`_replay_ops`. Updates hit the
        frame in place (``df.loc``) or a pending tail dict; appends
        buffer in the tail; deletes OR into the pending mask and drop
        tail dicts. The WAL line is fsynced by the caller either way,
        so durability and replay ordering are exactly as before; only
        the in-memory materialization is deferred to load()."""
        kind = op["op"]
        if kind == "tx":
            for sub in op["ops"]:
                self._apply_live(table, sub)
            return
        if table not in self._cache:
            self.load(table)
        df = self._cache[table]
        pm = self._pending_del_mask.get(table)
        tail = self._pending_tail.setdefault(table, [])
        if kind == "up":
            pk = op["pk"]
            for row in op["rows"]:
                key = {c: row[c] for c in pk}
                idx = []
                if len(df):
                    hit = self._mask(df, key).to_numpy(dtype=bool)
                    if pm is not None:
                        # a pending-deleted row must read as absent:
                        # updating it would lose the re-insert
                        hit &= ~pm
                    idx = df.index[hit]
                if len(idx):
                    for k, v in row.items():
                        df.loc[idx, k] = v
                    continue
                live = next(
                    (r for r in tail if self._matches(r, key)), None
                )
                if live is not None:
                    live.update(row)
                else:
                    tail.append(dict(row))
            return
        if kind == "set":
            if len(df):
                # dead (pending-deleted) rows may be written too —
                # harmless, they drop at flush
                idx = df.index[self._mask(df, op["where"])]
                for k, v in op["fields"].items():
                    df.loc[idx, k] = v
            for r in tail:
                if self._matches(r, op["where"]):
                    r.update(op["fields"])
            return
        if kind == "del":
            if len(df):
                hit = self._mask(df, op["where"]).to_numpy(dtype=bool)
                if hit.any():
                    self._pending_del_mask[table] = (
                        hit if pm is None else (pm | hit)
                    )
            if tail:
                kept = [
                    r for r in tail if not self._matches(r, op["where"])
                ]
                if len(kept) != len(tail):
                    self._pending_tail[table] = kept
            return
        raise ValueError(f"unknown catalog log op {kind!r}")

    def _append_op(self, table: str, op: dict) -> None:
        """Append one op line to the table's WAL, fsynced."""
        import json as _json

        os.makedirs(self.dir, exist_ok=True)
        seq = self._seq.get(table, 0) + 1
        op = {"seq": seq, **op}
        with open(self._log_path(table), "a") as fh:
            fh.write(_json.dumps(op, default=_json_scalar) + "\n")
            fh.flush()
            os.fsync(fh.fileno())
        self._seq[table] = seq
        self._log_lines[table] = self._log_lines.get(table, 0) + 1
        self._disk_token[table] = self._table_token(table)
        self.mutation_count += 1

    def _flush_pending(self, table: str) -> pd.DataFrame:
        """Materialize pending deletes + appended tail into the cached
        frame — one filtered copy + one concat for the whole batch."""
        df = self._cache[table]
        pm = self._pending_del_mask.pop(table, None)
        tail = self._pending_tail.pop(table, None)
        deleted = pm is not None and pm.any()
        if deleted:
            df = df[~pm]
        if tail:
            df = pd.concat([df, pd.DataFrame(tail)], ignore_index=True)
        elif deleted:
            df.index = pd.RangeIndex(len(df))
        if deleted or tail:
            self._cache[table] = df
        return df

    def _has_pending(self, table: str) -> bool:
        pm = self._pending_del_mask.get(table)
        return (pm is not None and pm.any()) or bool(
            self._pending_tail.get(table)
        )

    def peek(self, table: str) -> "tuple[pd.DataFrame, object, list]":
        """(frame, pending-delete mask | None, pending tail rows)
        WITHOUT flushing: for read paths that can consult the pending
        state themselves (vectorized scans + a tail walk) and must not
        force the O(n) materialization copy mid mutation burst. Rows
        where the mask is True are deleted; tail dicts are appended
        rows not yet in the frame; the frame must be treated as
        read-only."""
        if table not in self._cache:
            self.load(table)
        return (
            self._cache[table],
            self._pending_del_mask.get(table),
            self._pending_tail.get(table) or [],
        )

    def _read_base(self, table: str) -> "tuple[pd.DataFrame, int]":
        p = self._path(table)
        if not os.path.exists(p):
            return self._empty(table), 0
        import pyarrow.parquet as pq

        t = pq.read_table(p)
        md = t.schema.metadata or {}
        seq = int(md.get(self._SEQ_META, b"0"))
        return t.to_pandas(), seq

    def _replay_ops(self, df: pd.DataFrame, ops: "list[dict]") -> pd.DataFrame:
        """Bulk-apply a replay batch. Appended rows buffer in a Python
        tail list and concat ONCE — per-op ``pd.concat`` rebuilds the
        whole frame (O(ops·n): measured ~2 s to cold-open a 10k-source
        warehouse with a ~1.2k-line log). Updates and deletes apply to
        the frame vectorized and to the tail dicts directly; semantics
        are identical to :meth:`_apply_live` op-by-op."""
        tail: "list[dict]" = []

        def flat(ops):
            for op in ops:
                if op["op"] == "tx":
                    yield from op["ops"]
                else:
                    yield op

        def matches(rec: dict, where: dict) -> bool:
            return all(rec.get(c) == v for c, v in where.items())

        for op in flat(ops):
            kind = op["op"]
            if kind == "up":
                pk = op["pk"]
                for row in op["rows"]:
                    key = {c: row[c] for c in pk}
                    idx = df.index[self._mask(df, key)] if len(df) else []
                    if len(idx):
                        for k, v in row.items():
                            df.loc[idx, k] = v
                        continue
                    hit = next(
                        (r for r in tail if matches(r, key)), None
                    )
                    if hit is not None:
                        hit.update(row)
                    else:
                        tail.append(dict(row))
            elif kind == "set":
                idx = df.index[self._mask(df, op["where"])] if len(df) else []
                for k, v in op["fields"].items():
                    df.loc[idx, k] = v
                for r in tail:
                    if matches(r, op["where"]):
                        r.update(op["fields"])
            elif kind == "del":
                if len(df):
                    df = df[~self._mask(df, op["where"])]
                tail = [r for r in tail if not matches(r, op["where"])]
            else:
                raise ValueError(f"unknown catalog log op {kind!r}")
        if tail:
            df = pd.concat(
                [df, pd.DataFrame(tail)], ignore_index=True
            )
        elif not df.index.equals(pd.RangeIndex(len(df))):
            # in-place index repair instead of a reset_index(drop=True)
            # whole-frame copy; the frame here is replay-private
            df.index = pd.RangeIndex(len(df))
        return df

    def load(self, table: str) -> pd.DataFrame:
        if table not in self._cache:
            import json as _json

            def read_snapshot() -> "tuple[pd.DataFrame, int, int, list]":
                df, applied = self._read_base(table)
                seq, lines, pending = applied, 0, []
                lp = self._log_path(table)
                if os.path.exists(lp):
                    with open(lp) as fh:
                        for line in fh:
                            try:
                                op = _json.loads(line)
                            except ValueError:
                                break  # torn tail from a killed writer
                            lines += 1
                            if op["seq"] > applied:
                                pending.append(op)
                            seq = max(seq, op["seq"])
                return df, seq, lines, pending

            # base + log are TWO files, so a lock-free reader can race
            # a concurrent compaction: base read BEFORE the os.replace,
            # log read AFTER the unlink/re-append would replay new-base
            # ops onto the old base. Re-stat the base after reading the
            # log and retry if it moved — each pass is a consistent
            # snapshot or detectably stale, never a chimera.
            for _attempt in range(8):
                base_key = self._base_stat(table)
                log_sz = self._log_size(table)
                df, seq, lines, pending = read_snapshot()
                if self._base_stat(table) == base_key:
                    break
            else:
                # round-10 verdict #2: a writer hot enough to move the
                # base 8 times mid-read must not make us cache a
                # possibly-chimeric snapshot. One authoritative re-read
                # under the writer lock — compaction replaces the base
                # only while holding it, so this read is consistent by
                # construction (the flock is re-entrant in-thread, so a
                # load() issued inside a writing transaction is safe).
                with self.writer_lock():
                    base_key = self._base_stat(table)
                    log_sz = self._log_size(table)
                    df, seq, lines, pending = read_snapshot()
            if pending:
                df = self._replay_ops(df, pending)
            self._cache[table] = df
            self._seq[table] = seq
            self._log_lines[table] = lines
            # fingerprint captured BEFORE the read: bytes appended
            # mid-read can only over-invalidate, never go stale
            self._disk_token[table] = (base_key, log_sz)
            # a disk read already replayed every logged op; pending
            # state from a dropped cache entry is stale by construction
            self._pending_del_mask.pop(table, None)
            self._pending_tail.pop(table, None)
        if self._has_pending(table):
            return self._flush_pending(table)
        return self._cache[table]

    def _base_stat(self, table: str) -> "tuple | None":
        try:
            st = os.stat(self._path(table))
            return (st.st_mtime_ns, st.st_size, st.st_ino)
        except FileNotFoundError:
            return None

    def save(self, table: str, df: pd.DataFrame) -> None:
        if self._has_pending(table):
            # save() retires the WAL, so a frame that predates pending
            # (logged-but-unmaterialized) mutations would silently undo
            # them. Every internal caller loads (which flushes) before
            # saving — reaching here means a caller skipped that.
            raise RuntimeError(
                f"save({table!r}) with unmaterialized pending deletes"
                " or appends; call load() first"
            )
        os.makedirs(self.dir, exist_ok=True)
        seq = self._ensure_seq(table)
        self._cache[table] = df.reset_index(drop=True)
        # write-temp-then-rename: a writer killed mid-write (OOM,
        # kill -9, node loss) must never leave a truncated parquet
        # where a catalog table used to be — os.replace is atomic on
        # POSIX, so readers see the old table or the new one, nothing
        # in between (round-8 crash-safety; the reference gets this
        # from Postgres WAL). The applied-seq watermark rides in the
        # SAME file, so the WAL replay boundary moves atomically with
        # the data: a crash between this replace and the log unlink
        # replays nothing twice (stale lines are below the watermark).
        import pyarrow as pa
        import pyarrow.parquet as pq

        p = self._path(table)
        tmp = p + f".tmp.{os.getpid()}"
        try:
            t = pa.Table.from_pandas(
                self._cache[table], preserve_index=False
            )
            t = t.replace_schema_metadata(
                {**(t.schema.metadata or {}), self._SEQ_META: str(seq).encode()}
            )
            pq.write_table(t, tmp)
            os.replace(tmp, p)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        lp = self._log_path(table)
        if os.path.exists(lp):
            os.unlink(lp)
        self._log_lines[table] = 0
        self._disk_token[table] = (self._base_stat(table), 0)
        self.mutation_count += 1

    def init_db(self, reset: bool = False) -> None:
        """A29: create (or reset) the catalog storage; an existing
        warehouse written by an older layout is upgraded in place
        through the migration chain first."""
        if reset:
            import shutil

            if os.path.exists(self.warehouse):
                shutil.rmtree(self.warehouse)
        os.makedirs(self.dir, exist_ok=True)
        if not reset and self.schema_version() > 0:
            self.migrate()
        for t in _TABLES:
            if reset or not os.path.exists(self._path(t)):
                self.save(t, self._empty(t))
        self._write_version(CATALOG_VERSION)

    # -- schema migrations (A29; `DB/Migration.hs:71-120` parity) -----------

    def schema_version(self) -> int:
        """0 = empty warehouse, 1 = pre-dbmeta layout (rounds 1-2),
        else the recorded version."""
        p = self._path("dbmeta")
        if os.path.exists(p):
            meta = pd.read_parquet(p)
            hit = meta[meta["key"] == "schema_version"]
            if len(hit):
                return int(hit.iloc[0]["value"])
        if any(os.path.exists(self._path(t)) for t in _TABLES):
            return 1
        return 0

    def _write_version(self, version: int) -> None:
        os.makedirs(self.dir, exist_ok=True)
        pd.DataFrame(
            [{"key": "schema_version", "value": str(version)}]
        ).to_parquet(self._path("dbmeta"), index=False)

    def migrate(self) -> int:
        """Chain migrations version-by-version up to CATALOG_VERSION
        (the reference walks its migration list the same way,
        `src/backend/src/Lagoon/DB/Migration.hs:71-120`). Returns the
        final version. Unknown future versions fail loudly."""
        v = self.schema_version()
        if v > CATALOG_VERSION:
            raise RuntimeError(
                f"warehouse schema v{v} is newer than this engine "
                f"(v{CATALOG_VERSION}); refusing to downgrade"
            )
        while v < CATALOG_VERSION:
            step = _MIGRATIONS.get(v)
            if step is None:
                raise RuntimeError(f"no migration from catalog schema v{v}")
            step(self)
            v += 1
            self._write_version(v)
            self._cache.clear()
        return v

    # -- sources / versions (A14, A15) --------------------------------------

    def new_source(
        self,
        name: str,
        *,
        url: str | None,
        description: str | None,
        added_by: str,
        created: str | None,
        fmt: str,
    ) -> tuple[int, int, str, str]:
        """Allocate (source_ix, version, table_name, view_name); bump the
        per-name version counter and auto-deprecate the previous latest.

        Lookups are pending-aware (:meth:`peek`) rather than flushing
        loads, so an ingest burst stays O(1) frame copies amortized —
        the deferred-mutation contract (round-10)."""
        import numpy as np

        names, nm, ntail = self.peek("sourcenames")
        sn_ix = None
        if len(names):
            hit = names["name"].to_numpy() == name
            if nm is not None:
                hit &= ~nm
            if hit.any():
                sn_ix = int(names["ix"].to_numpy()[np.argmax(hit)])
        if sn_ix is None:
            t_hit = next(
                (r for r in ntail if r.get("name") == name), None
            )
            if t_hit is not None:
                sn_ix = int(t_hit["ix"])
        if sn_ix is None:
            mx = 0
            if len(names):
                alive_ix = names["ix"].to_numpy()
                if nm is not None:
                    alive_ix = alive_ix[~nm]
                if len(alive_ix):
                    mx = int(alive_ix.max())
            for r in ntail:
                mx = max(mx, int(r["ix"]))
            sn_ix = mx + 1
            self._log_op(
                "sourcenames",
                {
                    "op": "up",
                    "pk": ["ix"],
                    "rows": [
                        {"ix": sn_ix, "name": name, "created_by": added_by}
                    ],
                },
            )
        # version numbers continue from the last COMMITTED version:
        # counting a crashed writer's pending debris would leave a gap
        # in the dataset's version chain (a streaming replay after an
        # interrupt must mint v3, not v4). A debris row may therefore
        # share its number with the committed retry — only one of the
        # two is ever visible, and vacuum sweeps the invisible one.
        sources, sm, stail = self.peek("sources")
        ver = 0
        if len(sources):
            mine = sources["sourcename_ix"].to_numpy() == sn_ix
            if sm is not None:
                mine &= ~sm
            if "pending" in sources.columns:
                mine &= ~(
                    sources["pending"].fillna(False).to_numpy(dtype=bool)
                )
            if mine.any():
                ver = int(sources["version"].to_numpy()[mine].max())
        for r in stail:
            if r.get("sourcename_ix") == sn_ix and not r.get(
                "pending", False
            ):
                ver = max(ver, int(r["version"]))
        version = ver + 1
        mxi = 0
        if len(sources):
            ixa = sources["ix"].to_numpy()
            if sm is not None:
                ixa = ixa[~sm]
            if len(ixa):
                mxi = int(ixa.max())
        for r in stail:
            mxi = max(mxi, int(r["ix"]))
        ix = mxi + 1
        # NOTE: auto-deprecation of the previous latest happens in
        # finalize_source, not here — a writer killed mid-ingest must
        # leave the old latest exactly as it was
        view_name = f"{sanitize(name)}_v{version}"
        row = {
            "ix": ix,
            "sourcename_ix": sn_ix,
            "version": version,
            "url": url,
            "description": description if description is not None else name,
            "created": created or _now(),
            "added_by": added_by,
            "table_name": f"t{ix}",
            "view_name": view_name,
            "typed_table_name": None,
            "typed_view_name": None,
            "deprecated": False,
            "row_count": 0,
            "format": fmt,
            "json_type": None,
            # invisible until the ingest's final update_source clears it
            # (crash-safe: a killed writer leaves only invisible debris)
            "pending": True,
        }
        self._log_op("sources", {"op": "up", "pk": ["ix"], "rows": [row]})
        return ix, version, f"t{ix}", view_name

    def _ix_alive(self, ix: int) -> bool:
        """Pending-aware existence check for a sources row (no flush)."""
        sources, sm, stail = self.peek("sources")
        if len(sources):
            hit = sources["ix"].to_numpy() == ix
            if sm is not None:
                hit &= ~sm
            if hit.any():
                return True
        return any(r.get("ix") == ix for r in stail)

    def update_source(self, ix: int, **fields) -> None:
        if not self._ix_alive(ix):
            raise KeyError(f"no source ix={ix}")
        self._log_op(
            "sources",
            {"op": "set", "where": {"ix": int(ix)}, "fields": dict(fields)},
        )

    def finalize_source(self, ix: int) -> None:
        """Commit a version minted by :meth:`new_source`: clear the
        ``pending`` visibility latch and auto-deprecate the previous
        latest version of the same name — in ONE catalog write, so
        there is no window where both versions read as current.
        Everything before this call is invisible debris a crash can
        leave behind (vacuum sweeps it); everything after is a
        committed version."""
        import numpy as np

        sources, sm, stail = self.peek("sources")
        sn_ix = version = None
        if len(sources):
            hit = sources["ix"].to_numpy() == ix
            if sm is not None:
                hit &= ~sm
            if hit.any():
                pos = int(np.argmax(hit))
                sn_ix = int(sources["sourcename_ix"].to_numpy()[pos])
                version = int(sources["version"].to_numpy()[pos])
        if sn_ix is None:
            t_hit = next((r for r in stail if r.get("ix") == ix), None)
            if t_hit is None:
                raise KeyError(f"no source ix={ix}")
            sn_ix = int(t_hit["sourcename_ix"])
            version = int(t_hit["version"])
        ops = []
        prev_ixs: "list[int]" = []
        if len(sources):
            pv = (sources["sourcename_ix"].to_numpy() == sn_ix) & (
                sources["version"].to_numpy() == version - 1
            )
            if sm is not None:
                pv &= ~sm
            prev_ixs = [int(x) for x in sources["ix"].to_numpy()[pv]]
        for r in stail:
            if (
                r.get("sourcename_ix") == sn_ix
                and r.get("version") == version - 1
            ):
                prev_ixs.append(int(r["ix"]))
        for pix in prev_ixs:
            ops.append(
                {
                    "op": "set",
                    "where": {"ix": int(pix)},
                    "fields": {"deprecated": True},
                }
            )
        ops.append(
            {
                "op": "set",
                "where": {"ix": int(ix)},
                "fields": {"pending": False},
            }
        )
        # one WAL line = one fsync = both mutations commit atomically:
        # no window where old and new version both read as current
        self._log_op("sources", {"op": "tx", "ops": ops})

    def set_deprecated(self, ix: int, deprecated: bool = True) -> None:
        self.update_source(ix, deprecated=deprecated)

    def set_columns(self, ix: int, cols: list[tuple[str, str, str]]) -> None:
        rows = [
            {"source_ix": int(ix), "column_name": c, "header": h, "type": t}
            for c, h, t in cols
        ]
        self._log_op(
            "sourcecolumns",
            {
                "op": "tx",
                "ops": [
                    {"op": "del", "where": {"source_ix": int(ix)}},
                    {
                        "op": "up",
                        "pk": ["source_ix", "column_name"],
                        "rows": rows,
                    },
                ],
            },
        )

    # -- tags (A16, A17) ----------------------------------------------------

    def tag(self, ix: int, tag: str) -> None:
        tags, tm, ttail = self.peek("tags")
        exists = False
        if len(tags):
            hit = (tags["source_ix"].to_numpy() == ix) & (
                tags["tag"].to_numpy() == tag
            )
            if tm is not None:
                hit &= ~tm
            exists = bool(hit.any())
        if not exists:
            exists = any(
                r.get("source_ix") == ix and r.get("tag") == tag
                for r in ttail
            )
        if not exists:
            self._log_op(
                "tags",
                {
                    "op": "up",
                    "pk": ["source_ix", "tag"],
                    "rows": [{"source_ix": int(ix), "tag": tag}],
                },
            )

    def untag(self, ix: int, tag: str) -> None:
        self._log_op(
            "tags", {"op": "del", "where": {"source_ix": int(ix), "tag": tag}}
        )

    def get_column(self, ix: int, column: str) -> tuple[str, str, str]:
        """Look up one column of a source by physical or friendly name
        (parity with the reference's GetColumn command,
        `src/interface/src/Lagoon/Interface/Prog.hs`). Returns
        (physical_name, header, type); KeyError if absent."""
        sc = self.load("sourcecolumns")
        mine = sc[sc["source_ix"] == ix]
        hit = mine[(mine["column_name"] == column) | (mine["header"] == column)]
        if not len(hit):
            raise KeyError(f"no column {column!r} in source ix={ix}")
        r = hit.iloc[0]
        return (str(r["column_name"]), str(r["header"]), str(r["type"]))

    def find_by_tag(self, tag: str) -> list[int]:
        tags = self.load("tags")
        return [int(x) for x in tags[tags["tag"] == tag]["source_ix"]]

    # -- lookup -------------------------------------------------------------

    def get_source(self, name: str, version: int | None = None) -> SourceInfo:
        names = self.load("sourcenames")
        hit = names[names["name"] == name]
        if not len(hit):
            raise KeyError(f"no source named {name!r}")
        sn_ix = int(hit.iloc[0]["ix"])
        sources = self.load("sources")
        # pending rows (in-flight or crashed ingests) are invisible
        mine = _visible(sources[sources["sourcename_ix"] == sn_ix])
        if not len(mine):
            raise KeyError(f"no committed version of {name!r}")
        if version is None:
            version = int(mine["version"].max())
        row = mine[mine["version"] == version]
        if not len(row):
            raise KeyError(f"no version {version} of {name!r}")
        return self._info(row.iloc[0], name)

    def get_source_by_ix(self, ix: int) -> SourceInfo:
        sources = self.load("sources")
        row = sources[sources["ix"] == ix]
        if not len(row):
            raise KeyError(f"no source ix={ix}")
        names = self.load("sourcenames")
        name = names[names["ix"] == row.iloc[0]["sourcename_ix"]].iloc[0]["name"]
        return self._info(row.iloc[0], name)

    def dataset_creator(self, name: str) -> str | None:
        """The user who created the dataset (sourcename row) — the
        ownership anchor that survives deletion of early versions.
        Falls back to the earliest surviving version's uploader for
        rows migrated from layouts without created_by."""
        names = self.load("sourcenames")
        hit = names[names["name"] == name]
        if not len(hit):
            return None
        created_by = hit.iloc[0].get("created_by")
        if isinstance(created_by, str) and created_by:
            return created_by
        vs = self.versions(name)
        if vs:
            return self.get_source(name, vs[0]).added_by
        return None

    def versions(self, name: str) -> list[int]:
        names = self.load("sourcenames")
        hit = names[names["name"] == name]
        if not len(hit):
            return []
        sources = self.load("sources")
        mine = _visible(sources[sources["sourcename_ix"] == int(hit.iloc[0]["ix"])])
        return sorted(int(v) for v in mine["version"])

    def _bulk_info_maps(self) -> "tuple[dict, dict]":
        """(cols_by_ix, tags_by_ix): one grouping pass over the
        sourcecolumns/tags frames — the shared prefetch behind
        all_infos and big search pages."""
        # zip over materialized column arrays, not iterrows: iterrows
        # builds one Series per row (~70 µs each) and was the dominant
        # cost of a 100k-catalog dump (CATALOG_SCALE_r10 first cut:
        # 13.3 s, ~threefold iterrows); the zip form is a plain tuple
        # walk over python lists
        sc = self.load("sourcecolumns")
        cols_by_ix: dict[int, list] = {}
        for six, cn, hd, tp in zip(
            sc["source_ix"].tolist(),
            sc["column_name"].tolist(),
            sc["header"].tolist(),
            sc["type"].tolist(),
        ):
            cols_by_ix.setdefault(int(six), []).append((cn, hd, tp))
        tags = self.load("tags")
        tags_by_ix: dict[int, list] = {}
        for six, tg in zip(
            tags["source_ix"].tolist(), tags["tag"].tolist()
        ):
            tags_by_ix.setdefault(int(six), []).append(tg)
        return cols_by_ix, tags_by_ix

    def all_infos(self) -> list[SourceInfo]:
        """Every committed version as SourceInfo, built in BULK: one
        pass over sourcecolumns/tags grouped by source_ix instead of a
        per-ix frame filter. The per-row path costs O(N) per source —
        O(N²) for a whole-catalog dump, measured 16.9 s at 10k versions
        (CATALOG_SCALE_r8); this path is linear."""
        sources = _visible(self.load("sources"))
        names = self.load("sourcenames")
        name_by_ix = dict(zip(names["ix"], names["name"]))
        cols_by_ix, tags_by_ix = self._bulk_info_maps()
        # to_dict("records") not iterrows — same keys, ~50× cheaper
        return [
            self._info_prefetched(
                row,
                name_by_ix[int(row["sourcename_ix"])],
                cols_by_ix.get(int(row["ix"]), []),
                sorted(tags_by_ix.get(int(row["ix"]), [])),
            )
            for row in sources.to_dict("records")
        ]

    def iter_infos_sorted(self) -> "Iterator[SourceInfo]":
        """Lazily yield every committed version in (name, version)
        order — the dump_db_info contract. All O(n) prep is vectorized
        pandas (merge + sort + the bulk grouping maps); the per-source
        SourceInfo build is paid AT yield time, so a streaming consumer
        sees its first block after the sort, not after n dataclass
        constructions (round-10 verdict #5 done-criterion: first-byte
        latency at 100k sources dropped 13.3 s → the vectorized-prep
        cost)."""
        merged = self._merged_visible().sort_values(
            ["__name", "version"], kind="mergesort"
        )
        cols_by_ix, tags_by_ix = self._bulk_info_maps()
        # lazy row dicts (zip over pre-materialized column lists), not
        # to_dict("records") — that would build all n dicts before the
        # first yield, putting ~0.3 s back on the 100k first byte
        col_names = list(merged.columns)
        col_vals = [merged[c].tolist() for c in col_names]
        for vals in zip(*col_vals):
            row = dict(zip(col_names, vals))
            ix = int(row["ix"])
            yield self._info_prefetched(
                row,
                row["__name"],
                cols_by_ix.get(ix, []),
                sorted(tags_by_ix.get(ix, [])),
            )

    def _info(self, row, name: str) -> SourceInfo:
        ix = int(row["ix"])
        tags = self.load("tags")
        sc = self.load("sourcecolumns")
        mine = sc[sc["source_ix"] == ix]
        return self._info_prefetched(
            row,
            name,
            [
                (r["column_name"], r["header"], r["type"])
                for _, r in mine.iterrows()
            ],
            sorted(tags[tags["source_ix"] == ix]["tag"].tolist()),
        )

    def _info_prefetched(
        self, row, name: str, columns: list, tag_list: "list[str]"
    ) -> SourceInfo:
        ix = int(row["ix"])
        return SourceInfo(
            ix=ix,
            name=name,
            version=int(row["version"]),
            url=row["url"] if pd.notna(row["url"]) else None,
            description=row["description"],
            created=row["created"],
            added_by=row["added_by"],
            table_name=row["table_name"],
            view_name=row["view_name"],
            typed_table_name=row["typed_table_name"]
            if pd.notna(row["typed_table_name"])
            else None,
            typed_view_name=row["typed_view_name"]
            if pd.notna(row["typed_view_name"])
            else None,
            deprecated=bool(row["deprecated"]),
            row_count=int(row["row_count"]),
            format=row["format"],
            json_type=row["json_type"] if pd.notna(row["json_type"]) else None,
            tags=list(tag_list),
            columns=list(columns),
        )

    # -- delete (A27) --------------------------------------------------------

    def delete_source(self, ix: int) -> None:
        """Remove version rows; drop the name when its last version goes
        (state returns to pre-ingest — the reference's delete golden test,
        `runtests.sh:120-157`).

        Round-10 verdict #3: deletes are WAL ``del`` ops (the op kind
        existed since the WAL landed, `_apply_live`/`_replay_ops` handle
        it), not O(n) full-table rewrites — at 10k sources the old
        ``save`` path cost 100-310 ms per delete. Materialization is
        DEFERRED (``_pending_del_mask``): this method's own lookups
        consult the pending mask instead of forcing a flush, so a burst
        of k deletes costs k fsyncs + O(n) numpy boolean work and ONE
        filtered frame copy per table at the next read — measured
        86 ms → ~5 ms per delete at 100k sources."""
        import numpy as np

        sources, pm, stail = self.peek("sources")
        sn_ix = None
        if len(sources):
            hit = sources["ix"].to_numpy() == ix
            if pm is not None:
                hit &= ~pm
            if hit.any():
                sn_ix = int(
                    sources["sourcename_ix"].to_numpy()[np.argmax(hit)]
                )
        if sn_ix is None:
            t_hit = next((r for r in stail if r.get("ix") == ix), None)
            if t_hit is None:
                raise KeyError(f"no source ix={ix}")
            sn_ix = int(t_hit["sourcename_ix"])
        self._log_op("sources", {"op": "del", "where": {"ix": int(ix)}})
        self._log_op(
            "sourcecolumns", {"op": "del", "where": {"source_ix": int(ix)}}
        )
        self._log_op("tags", {"op": "del", "where": {"source_ix": int(ix)}})
        sources, pm, stail = self.peek("sources")
        remaining = False
        if len(sources):
            alive = sources["sourcename_ix"].to_numpy() == sn_ix
            if pm is not None:
                alive &= ~pm
            remaining = bool(alive.any())
        if not remaining:
            remaining = any(
                r.get("sourcename_ix") == sn_ix for r in stail
            )
        if not remaining:
            self._log_op(
                "sourcenames", {"op": "del", "where": {"ix": int(sn_ix)}}
            )

    def _merged_visible(self) -> pd.DataFrame:
        """Visible sources merged with their names (``__name`` column),
        memoized until any catalog mutation or refresh. Callers must
        treat the frame as read-only (search/iter paths only filter and
        slice, never mutate)."""
        sources_raw = self.load("sources")
        names = self.load("sourcenames")
        key = (self.mutation_count, id(sources_raw), id(names))
        if self._merged_cache is not None and self._merged_cache[0] == key:
            return self._merged_cache[1]
        merged = _visible(sources_raw).merge(
            names.rename(columns={"ix": "sourcename_ix", "name": "__name"}),
            on="sourcename_ix",
        )
        self._merged_cache = (key, merged, (sources_raw, names))
        return merged

    # -- search (A18, A20) ---------------------------------------------------

    def search(
        self,
        *,
        ix: int | None = None,
        name_contains: str | None = None,
        description_contains: str | None = None,
        created_after: str | None = None,
        created_before: str | None = None,
        tags_all: list[str] | None = None,
        columns_all: list[str] | None = None,
        added_by_contains: str | None = None,
        added_by_any: list[str] | None = None,
        include_deprecated: bool = True,
        ts_query: str | None = None,
        order_by: str | None = None,
        ascending: bool = True,
        offset: int = 0,
        limit: int | None = None,
    ) -> tuple[list[SourceInfo], int]:
        """SourcesSpec filters → (page, total_count)
        (`src/backend/src/Lagoon/DB/SourceInfo.hs:214-331`; count drops
        sort/offset/limit like `flattenCountQuery`)."""
        merged = self._merged_visible()

        def lc(src: str) -> "pd.Series":
            # lowercased filter column, computed once per memoized
            # merge and cached ON the memo frame: plain (regex=False)
            # contains over a pre-lowered column is ~3× cheaper than a
            # per-call IGNORECASE regex scan (search was 111 ms warm at
            # 100k sources, mostly these two scans)
            dst = f"__lc_{src}"
            if dst not in merged.columns:
                merged[dst] = merged[src].str.lower()
            return merged[dst]

        mask = pd.Series(True, index=merged.index)
        if ix is not None:
            mask &= merged["ix"] == ix
        if name_contains:
            mask &= lc("__name").str.contains(
                name_contains.lower(), regex=False, na=False
            )
        if description_contains:
            mask &= lc("description").str.contains(
                description_contains.lower(), regex=False, na=False
            )
        if added_by_contains:
            mask &= lc("added_by").str.contains(
                added_by_contains.lower(), regex=False, na=False
            )
        if added_by_any:
            # any-of across several uploaders (the /sources ?user=
            # repeatable param) — substring per user, OR-combined
            m = pd.Series(False, index=merged.index)
            for u in added_by_any:
                m |= lc("added_by").str.contains(
                    u.lower(), regex=False, na=False
                )
            mask &= m
        if created_after:
            mask &= merged["created"] >= created_after
        if created_before:
            mask &= merged["created"] <= created_before
        if not include_deprecated:
            mask &= ~merged["deprecated"]
        hit = merged[mask]
        if tags_all:
            tags = self.load("tags")
            for t in tags_all:
                with_tag = set(
                    tags[tags["tag"].str.contains(t, case=False, na=False)][
                        "source_ix"
                    ]
                )
                hit = hit[hit["ix"].isin(with_tag)]
        if columns_all:
            sc = self.load("sourcecolumns")
            for c in columns_all:
                with_col = set(
                    sc[sc["header"].str.contains(c, case=False, na=False)]["source_ix"]
                )
                hit = hit[hit["ix"].isin(with_col)]
        if ts_query:
            from lagoon_spark.search import matches_source

            keep = [
                r["ix"]
                for _, r in hit.iterrows()
                if matches_source(self, ts_query, int(r["ix"]))
            ]
            hit = hit[hit["ix"].isin(keep)]
        total = len(hit)
        if order_by:
            col = {"name": "__name", "created": "created", "ix": "ix"}.get(
                order_by, order_by
            )
            hit = hit.sort_values(col, ascending=ascending, kind="mergesort")
        page = hit.iloc[offset : offset + limit if limit is not None else None]
        # page-targeted prefetch: ONE isin pass over sourcecolumns/tags
        # for the whole page. The old ≤20-row branch refiltered the
        # full frames per row — O(page × catalog), ~2-3 ms/row at a
        # 100k catalog, i.e. most of a limit-20 search's warm cost.
        rows = page.to_dict("records")
        page_ixs = [int(r["ix"]) for r in rows]
        cols_by_ix: "dict[int, list]" = {}
        tags_by_ix: "dict[int, list]" = {}
        if page_ixs:
            sc = self.load("sourcecolumns")
            mine = sc[sc["source_ix"].isin(page_ixs)]
            for six, cn, hd, tp in zip(
                mine["source_ix"].tolist(),
                mine["column_name"].tolist(),
                mine["header"].tolist(),
                mine["type"].tolist(),
            ):
                cols_by_ix.setdefault(int(six), []).append((cn, hd, tp))
            tg = self.load("tags")
            tmine = tg[tg["source_ix"].isin(page_ixs)]
            for six, t in zip(
                tmine["source_ix"].tolist(), tmine["tag"].tolist()
            ):
                tags_by_ix.setdefault(int(six), []).append(t)
        infos = [
            self._info_prefetched(
                r,
                r["__name"],
                cols_by_ix.get(int(r["ix"]), []),
                sorted(tags_by_ix.get(int(r["ix"]), [])),
            )
            for r in rows
        ]
        return infos, total
