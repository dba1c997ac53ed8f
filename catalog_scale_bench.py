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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--checkpoints", default="1000,10000,100000")
    ap.add_argument("--out", default="CATALOG_SCALE_r10.json")
    args = ap.parse_args()
    checkpoints = sorted(
        {int(x) for x in args.checkpoints.split(",") if int(x) <= args.n}
    )

    from lagoon_spark.catalog import Catalog
    from lagoon_spark.engine import Lagoon

    wh = tempfile.mkdtemp(prefix="lagoon_catscale_")
    cat = Catalog(wh)
    cat.init_db()

    class _SparkCatalogStub:
        # delete_source drops temp views as cleanup; no session exists
        # here (catalog-plane only), so the drop is a no-op
        def dropTempView(self, name: str) -> bool:
            return False

    class _SparkStub:
        catalog = _SparkCatalogStub()

    eng = Lagoon(_SparkStub(), wh, user="admin")
    eng.catalog = cat

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

    def timed(fn, reps: int = 5) -> float:
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        return (time.perf_counter() - t0) / reps

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

        def cold_get():
            cat.refresh(force=True)
            cat.get_source(name_mid)

        point["get_source_cold_ms"] = round(1000 * timed(cold_get, 3), 2)
        t0 = time.perf_counter()
        it = eng.iter_db_info()
        first = next(it)
        point["dump_first_byte_ms"] = round(
            1000 * (time.perf_counter() - t0), 2
        )
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
        # delete one version, then re-ingest to keep the population
        victim = cat.get_source(name_mid)
        t0 = time.perf_counter()
        eng.delete_source(victim)
        point["delete_source_ms"] = round(
            1000 * (time.perf_counter() - t0), 2
        )
        ingest_one(done - 1)  # restore the population count
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
        report["checkpoints"][str(cp)] = point
        print(json.dumps({str(cp): point}))

    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))
    shutil.rmtree(wh, ignore_errors=True)


if __name__ == "__main__":
    main()
