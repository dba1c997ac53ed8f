"""Full-coverage correctness artifact generator.

The driver's gate samples 50 registry entries; this script runs EVERY
registered query against its DuckDB oracle at the gate scale (sf0.01)
and writes one row per entry in the driver's CORRECTNESS shape, so the
whole 100-entry surface carries the same hard signal each round:

    python correctness_full.py            # writes CORRECTNESS_FULL.json
    python correctness_full.py out.json   # custom output path

Env: SPARK_GRAFT_SF_SMALL (default /root/testdata/sf0.01),
SPARK_GRAFT_CPUS (default 8).
"""

from __future__ import annotations

import json
import os
import sys


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.01")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    out_path = sys.argv[1] if len(sys.argv) > 1 else "CORRECTNESS_FULL.json"

    from pyspark.sql import SparkSession

    from lagoon_spark.queries import registry
    from lagoon_spark.verify import _hash_rows, duck_connection

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .appName("correctness-full")
        .getOrCreate()
    )
    con = duck_connection(sf_dir)

    results: dict[str, dict] = {}
    failed = 0
    for name, qdef in sorted(registry().items()):
        row = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            sdf = qdef.spark_fn(spark, sf_dir)
            scols = [c.lower() for c in sdf.columns]
            srows = [tuple(r) for r in sdf.collect()]
            row["spark_rows"] = len(srows)
            if qdef.oracle is None:
                # rows-only entries (non-SQL-expressible ops): the
                # driver records the same weaker check
                row.update(
                    rows_match=True, schema_match=True, hash_match=True,
                    oracle_rows=None, err="rows-only (no oracle)",
                )
            else:
                dres = con.execute(qdef.oracle)
                dcols = [d[0].lower() for d in dres.description]
                drows = dres.fetchall()
                row["oracle_rows"] = len(drows)
                row["rows_match"] = len(srows) == len(drows)
                row["schema_match"] = sorted(scols) == sorted(dcols)
                if row["rows_match"] and row["schema_match"]:
                    row["hash_match"] = (
                        _hash_rows(scols, srows) == _hash_rows(dcols, drows)
                    )
        except Exception as e:  # noqa: BLE001 - record, don't abort the sweep
            row["err"] = f"{type(e).__name__}: {str(e)[:300]}"
        ok = row["rows_match"] and row["schema_match"] and row["hash_match"]
        if not ok:
            failed += 1
        results[name] = row
        print(f"{'PASS' if ok else 'FAIL'} {name}", flush=True)

    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"\n{len(results) - failed}/{len(results)} green -> {out_path}")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
