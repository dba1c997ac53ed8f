"""Catalog plane at population scale (round-8 verdict #6).

The reference's catalog is Postgres tables with indexes — 10k sources
is somebody else's problem. Ours is parquet + a pandas cache, so this
harness MEASURES where that stops scaling: it populates a warehouse to
N sources (the normal new_source → set_columns → update_source →
finalize_source ingest sequence, i.e. the real per-ingest catalog
cost), and at checkpoints records

* the mean per-ingest catalog cost over the last 50 ingests — each
  save() rewrites the whole table parquet, so this is the write-
  amplification curve (O(catalog size) per ingest by construction);
* read latencies on the warm pandas cache (get_source, versions,
  search with filters) and cold (cache dropped, parquet re-read);
* dump_db_info over the full population (catalog-only — no data files
  are touched, the test_catalog_scale.py poison guard pins that);
* delete_source of one version (engine-level: lock + catalog rewrite);
* on-disk catalog parquet sizes.

No Spark session is needed: every measured operation is pandas +
parquet (Lagoon is constructed with spark=None; dump_db_info and
delete_source never touch the data plane here).

Writes CATALOG_SCALE_r8.json. Usage:

    python catalog_scale_bench.py [--n 10000] [--out CATALOG_SCALE_r8.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import tempfile
import time


def _stub_engine(wh, cat):
    from lagoon_spark.engine import Lagoon

    class _SparkCatalogStub:
        # delete_source drops temp views as cleanup; no session exists
        # here (catalog-plane only), so the drop is a no-op
        def dropTempView(self, name: str) -> bool:
            return False

    class _SparkStub:
        catalog = _SparkCatalogStub()

    eng = Lagoon(_SparkStub(), wh, user="admin")
    eng.catalog = cat
    return eng


def synth_read_plane(n: int) -> dict:
    """Read-plane latencies at a BULK-SYNTHESIZED population of ``n``
    source versions (~n/5 datasets, 2 columns each, every 3rd tagged) —
    the same row shapes the ingest-path bench produces, built directly
    as frames so an order of magnitude past the populate-bound 100k
    checkpoint stays measurable (1M ingests at ~20 ms each would be
    6 h of populate for a read-only question). Writes are NOT measured
    here — the per-ingest curve is the normal mode's job."""
    import pandas as pd

    from lagoon_spark.catalog import Catalog

    datasets = max(n // 5, 1)
    wh = tempfile.mkdtemp(prefix="lagoon_catsynth_")
    try:
        cat = Catalog(wh)
        cat.init_db()
        names = pd.DataFrame(
            {
                "ix": range(datasets),
                "name": [f"ds{i}" for i in range(datasets)],
                "created_by": [f"user{i % 7}" for i in range(datasets)],
            }
        )
        sources = pd.DataFrame(
            {
                "ix": range(n),
                "sourcename_ix": [i % datasets for i in range(n)],
                "version": [i // datasets + 1 for i in range(n)],
                "url": [None] * n,
                "description": [
                    f"dataset {i} about {'genes' if i % 3 == 0 else 'planets'}"
                    for i in range(n)
                ],
                "created": [
                    f"2026-{(i % 12) + 1:02d}-01T00:00:00" for i in range(n)
                ],
                "added_by": [f"user{i % 7}" for i in range(n)],
                "table_name": [f"t{i}" for i in range(n)],
                "view_name": [
                    f"ds{i % datasets}_v{i // datasets + 1}" for i in range(n)
                ],
                "typed_table_name": [None] * n,
                "typed_view_name": [None] * n,
                "deprecated": [False] * n,
                "row_count": [100] * n,
                "format": ["tabular"] * n,
                "json_type": [None] * n,
                "pending": [False] * n,
            }
        )
        sc = pd.DataFrame(
            {
                "source_ix": [i for i in range(n) for _ in range(2)],
                "column_name": ["c1", "c2"] * n,
                "header": ["id", "val"] * n,
                "type": ["INTEGER", "TEXT"] * n,
            }
        )
        tags = pd.DataFrame(
            {
                "source_ix": list(range(0, n, 3)),
                "tag": ["genes"] * len(range(0, n, 3)),
            }
        )
        with cat.writer_lock():
            cat.save("sourcenames", names)
            cat.save("sources", sources)
            cat.save("sourcecolumns", sc)
            cat.save("tags", tags)
        # recommended large-catalog configuration (see the helper's
        # docstring): without it the ≥1M tiers measure GC phase as
        # much as catalog code — burst deletes at 5M swung 78→412
        # ms/op between identical runs on gen-2 pauses over ~10⁸
        # frame-cell objects
        from lagoon_spark.catalog import tune_gc_for_large_catalog

        tune_gc_for_large_catalog()
        eng = _stub_engine(wh, cat)
        point = read_plane_metrics(cat, eng, wh, f"ds{datasets // 2}")
        point["synthesized"] = True
        # ingest plane ON TOP of the synthesized population: the same
        # 4-op sequence the full-mode bench times (new version of an
        # existing dataset + columns + row count + finalize), so the
        # write hot path is measured at populations the populate-bound
        # full mode cannot reach
        t0 = time.perf_counter()
        for i in range(200):
            ix, _v, _t, _vw = cat.new_source(
                f"ds{i % datasets}",
                url=None,
                description=f"rev {i}",
                added_by="u",
                created=None,
                fmt="tabular",
            )
            cat.set_columns(
                ix, [("c1", "id", "INTEGER"), ("c2", "val", "TEXT")]
            )
            cat.update_source(ix, row_count=i)
            cat.finalize_source(ix)
        point["ingest_catalog_ms_mean200"] = round(
            1000 * (time.perf_counter() - t0) / 200, 2
        )
        # delete plane (engine path: lock + reference scan + WAL dels).
        # Worst case flushes the pending-delete mask after every op; a
        # burst amortizes the one materialization copy across k ops.
        mid = datasets // 2
        # 20 ops, not 5: the committed r12 first-cut measured 42, 103,
        # 94, 68 and 198 ms/op for the SAME code paths across windows —
        # a 5-op sample on a metric whose first op pays cache
        # first-touch is noise, not signal
        flush_each = [cat.get_source(f"ds{mid + 1 + j}") for j in range(20)]
        t0 = time.perf_counter()
        for v in flush_each:
            eng.delete_source(v)
            cat.load("sources")
        point["delete_source_flush_each_ms"] = round(
            1000 * (time.perf_counter() - t0) / len(flush_each), 2
        )
        burst = [cat.get_source(f"ds{mid + 10 + j}") for j in range(100)]
        t0 = time.perf_counter()
        for v in burst:
            eng.delete_source(v)
        t1 = time.perf_counter()
        for t in ("sources", "sourcecolumns", "tags"):
            cat.load(t)
        t2 = time.perf_counter()
        point["delete_source_burst100_ms_per_op"] = round(
            1000 * (t1 - t0) / len(burst), 2
        )
        point["delete_burst_flush_ms"] = round(1000 * (t2 - t1), 2)
        # the adaptive compaction cadence (round-12) leaves up to
        # _compact_every(table) lines in the WAL instead of 128, so the
        # two numbers it trades against are measured here explicitly:
        # (a) a fresh process's cold open across the live WAL tail —
        # replay is index-backed (one argsort + O(log n)/line); (b) the
        # base-rewrite cost amortized over the cadence, the term that
        # made the FIXED cadence's ingest cost grow linearly with the
        # catalog (390 ms/op at 5M in CATALOG_SCALE_r12's first cut).
        point["wal_lines_at_cold_open"] = int(
            sum(cat._log_lines.values())
        )
        tune_gc_for_large_catalog()  # the ingest burst's garbage
        fresh = Catalog(wh)
        t0 = time.perf_counter()
        for t in ("sources", "sourcenames", "sourcecolumns", "tags"):
            fresh.load(t)
        point["cold_open_with_wal_ms"] = round(
            1000 * (time.perf_counter() - t0), 2
        )
        t0 = time.perf_counter()
        with cat.writer_lock():
            for t in ("sources", "sourcenames", "sourcecolumns", "tags"):
                cat.save(t, cat.load(t))
        compact_ms = 1000 * (time.perf_counter() - t0)
        point["compact_all_tables_ms"] = round(compact_ms, 1)
        point["compact_amortized_ms_per_op"] = round(
            compact_ms / cat._compact_every("sources"), 3
        )
        return {"n": n, "datasets": datasets, "read_plane": point}
    finally:
        shutil.rmtree(wh, ignore_errors=True)


def read_plane_metrics(cat, eng, wh, name_mid: str) -> dict:
    """Warm/cold read latencies shared by both bench modes."""
    from lagoon_spark.catalog import Catalog

    def timed(fn, reps: int = 5) -> float:
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        return (time.perf_counter() - t0) / reps

    # the first search of an epoch pays merge + Arrow index build once;
    # report it separately so the *_warm metrics mean what they say
    t0 = time.perf_counter()
    cat.search(
        name_contains="ds1",
        description_contains="genes",
        order_by="created",
        limit=20,
    )
    first_ms = round(1000 * (time.perf_counter() - t0), 2)

    point = {
        "search_filters_first_ms": first_ms,
        "get_source_warm_ms": round(
            1000 * timed(lambda: cat.get_source(name_mid)), 2
        ),
        "versions_warm_ms": round(
            1000 * timed(lambda: cat.versions(name_mid)), 2
        ),
        "search_filters_warm_ms": round(
            1000
            * timed(
                lambda: cat.search(
                    name_contains="ds1",
                    description_contains="genes",
                    order_by="created",
                    limit=20,
                )
            ),
            2,
        ),
    }
    # same filters, FRESH needles each rep — the Arrow-scan cost with
    # no bitmap-cache hit (the warm metric above reflects the repeat/
    # pagination path, which is the steady state of a REST consumer)
    ctr = iter(range(1000))

    def fresh():
        i = next(ctr)
        cat.search(
            name_contains=f"ds{i % 7}",
            description_contains="genes" if i % 2 else "planets",
            order_by="created",
            limit=20,
        )

    point["search_filters_uncached_ms"] = round(1000 * timed(fresh), 2)
    # TsQuery: first call pays the token-postings build for the epoch,
    # repeats are bitmap algebra
    t0 = time.perf_counter()
    cat.search(ts_query="genes & ds1", limit=20)
    point["search_ts_first_ms"] = round(
        1000 * (time.perf_counter() - t0), 2
    )
    point["search_ts_warm_ms"] = round(
        1000 * timed(lambda: cat.search(ts_query="genes & ds1", limit=20)),
        2,
    )

    def cold_get():
        cat.refresh(force=True)
        cat.get_source(name_mid)

    point["get_source_cold_ms"] = round(1000 * timed(cold_get, 3), 2)
    t0 = time.perf_counter()
    it = eng.iter_db_info()
    first = next(it)
    point["dump_first_byte_ms"] = round(1000 * (time.perf_counter() - t0), 2)
    nchars = len(first)
    for chunk in it:
        nchars += len(chunk)
    point["dump_db_info_ms"] = round(1000 * (time.perf_counter() - t0), 2)
    point["dump_chars"] = nchars
    # cold open: a fresh process's first load pays base read + WAL
    # replay (bulk, compaction-bounded) — the restart story at scale
    t0 = time.perf_counter()
    cold_cat = Catalog(wh)
    cold_cat.load("sources")
    cold_cat.load("sourcecolumns")
    cold_cat.load("tags")
    point["cold_open_ms"] = round(1000 * (time.perf_counter() - t0), 2)
    point["catalog_bytes"] = sum(
        e.stat().st_size
        for e in os.scandir(cat.dir)
        if e.name.endswith(".parquet")
    )
    point["wal_bytes"] = sum(
        e.stat().st_size
        for e in os.scandir(cat.dir)
        if e.name.endswith(".log.jsonl")
    )
    return point


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--checkpoints", default="1000,10000,100000")
    ap.add_argument("--out", default="CATALOG_SCALE_r10.json")
    ap.add_argument(
        "--synth",
        type=int,
        default=None,
        help="bulk-synthesize N versions and measure the read plane only",
    )
    args = ap.parse_args()
    if args.synth:
        report = synth_read_plane(args.synth)
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=1)
        print(json.dumps(report))
        return
    checkpoints = sorted(
        {int(x) for x in args.checkpoints.split(",") if int(x) <= args.n}
    )

    from lagoon_spark.catalog import Catalog

    wh = tempfile.mkdtemp(prefix="lagoon_catscale_")
    cat = Catalog(wh)
    cat.init_db()
    eng = _stub_engine(wh, cat)

    datasets = max(args.n // 5, 1)  # ~5 versions per dataset

    def ingest_one(i: int) -> float:
        t0 = time.perf_counter()
        ix, _v, _t, _view = cat.new_source(
            f"ds{i % datasets}",
            url=None,
            description=f"dataset {i} about {'genes' if i % 3 == 0 else 'planets'}",
            added_by=f"user{i % 7}",
            created=f"2026-{(i % 12) + 1:02d}-01T00:00:00",
            fmt="tabular",
        )
        cat.set_columns(ix, [("c1", "id", "INTEGER"), ("c2", "val", "TEXT")])
        cat.update_source(ix, row_count=i)
        cat.finalize_source(ix)
        return time.perf_counter() - t0

    report: dict = {"n": args.n, "datasets": datasets, "checkpoints": {}}
    done = 0
    for cp in checkpoints:
        recent: list[float] = []
        while done < cp:
            dt = ingest_one(done)
            done += 1
            if done > cp - 50:
                recent.append(dt)
        # a dataset guaranteed ingested by this checkpoint (i cycles
        # 0..datasets-1, so after `done` ingests ds{min(done,datasets)//2}
        # exists)
        name_mid = f"ds{min(done, datasets) // 2}"
        point = {
            "ingest_catalog_ms_mean_last50": round(
                1000 * sum(recent) / len(recent), 2
            ),
        }
        point.update(read_plane_metrics(cat, eng, wh, name_mid))
        # delete one version, then re-ingest to keep the population
        victim = cat.get_source(name_mid)
        t0 = time.perf_counter()
        eng.delete_source(victim)
        point["delete_source_ms"] = round(
            1000 * (time.perf_counter() - t0), 2
        )
        ingest_one(done - 1)  # restore the population count
        report["checkpoints"][str(cp)] = point
        print(json.dumps({str(cp): point}))

    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))
    shutil.rmtree(wh, ignore_errors=True)


if __name__ == "__main__":
    main()
