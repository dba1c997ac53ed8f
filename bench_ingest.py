"""Ingest-plane benchmark against the reference's published numbers.

The reference (tweag/lagoon) publishes exactly one wall-time figure:
JSON tokenize + type-inference over a ~100k-object dataset with ~8.3M
string tokens took 9.271 s (baseline) / 6.679 s (optimized),
single-threaded (`src/backend/src/Lagoon/Util/JSON/Stream.hs:28-80`).
Its integration suite also routinely ingests 1M-row CSVs under a
32 MB memory cap (`clients/cmdline/test-cases/runtests.sh:64-92`).

This script reproduces both workload shapes and times this engine on
them end to end:

* ``json_infer_sec`` — standalone JsonType inference (tokenize +
  lattice unification, the exact scope of the reference's number) over
  100k JSON objects carrying ~8.3M string tokens (object keys and
  string values both count as string tokens, matching the lexer-token
  accounting the reference used).
* ``json_ingest_sec`` — the full JSON ingest on top of that: row-id
  assignment, parquet write, inference, catalog registration.
* ``csv_ingest_sec`` — full CSV ingest of 1M rows incl. the two-pass
  type-inference lattice, typed cast, and parquet writes.

Prints one JSON line. Run: ``python bench_ingest.py`` (env
``SPARK_GRAFT_CPUS`` as for bench.py).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lagoon_spark.engine import Lagoon
from lagoon_spark.session import get_spark

N_JSON = 100_000
JSON_STRING_TOKENS = 83  # per object ≈ 8.3M total, the reference's scale
N_CSV = 1_000_000


def gen_json(path: str) -> int:
    """100k objects; keys + string values ≈ JSON_STRING_TOKENS string
    tokens per object (an association-data-like record shape)."""
    # 11 scalar fields -> 11 key tokens; 8 string values among them;
    # one 'tags' array with 63 string elements + 1 key = 64.
    # 11 + 8 + 64 = 83 string tokens per object.
    n_str_fields = 8
    n_tags = 63
    with open(path, "w", encoding="utf-8") as f:
        for i in range(N_JSON):
            obj = {
                "id": i,
                "score": i / 997.0,
                "ok": i % 2 == 0,
                **{f"f{k}": f"value_{k}_{i}" for k in range(n_str_fields)},
                "tags": [f"t{j}_{i % 1000}" for j in range(n_tags)],
            }
            f.write(json.dumps(obj, separators=(",", ":")) + "\n")
    return N_JSON * (11 + n_str_fields + 1 + n_tags)


def gen_csv(path: str) -> None:
    with open(path, "w") as f:
        f.write("id,flag,score,label\n")
        for i in range(N_CSV):
            f.write(f"{i},{'t' if i % 2 else 'f'},{i / 7:.3f},row{i}\n")


def main() -> None:
    spark = get_spark("lagoon_spark_bench_ingest")
    # warm the JVM + Python/Arrow worker pool once (same discipline as
    # bench.py): the pool cold-start is a per-session constant, not an
    # ingest cost, and it would otherwise dominate json_infer_sec
    from pyspark.sql.functions import pandas_udf

    _warm = pandas_udf(lambda s: s, "long")
    spark.range(1000).select(_warm("id")).count()
    tmp = tempfile.mkdtemp(prefix="lagoon_bench_ingest_")
    try:
        warehouse = os.path.join(tmp, "wh")
        lagoon = Lagoon(spark, warehouse, user="bench")
        lagoon.init_db()

        jpath = os.path.join(tmp, "objs.jsonl")
        str_tokens = gen_json(jpath)

        t0 = time.perf_counter()
        jt = lagoon.infer_json_type(jpath)
        json_infer_sec = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        info = lagoon.ingest(jpath, "bench_json")
        json_ingest_sec = round(time.perf_counter() - t0, 3)
        assert info.row_count == N_JSON, info.row_count

        cpath = os.path.join(tmp, "rows.csv")
        gen_csv(cpath)
        t0 = time.perf_counter()
        info = lagoon.ingest(cpath, "bench_csv")
        csv_ingest_sec = round(time.perf_counter() - t0, 3)
        assert info.row_count == N_CSV, info.row_count

        print(
            json.dumps(
                {
                    "metric": "ingest_bench",
                    "unit": "sec",
                    "json_objects": N_JSON,
                    "json_string_tokens": str_tokens,
                    "json_type": jt,
                    "json_infer_sec": json_infer_sec,
                    "json_ingest_sec": json_ingest_sec,
                    "reference_json_infer_sec": {"baseline": 9.271, "optimized": 6.679},
                    "csv_rows": N_CSV,
                    "csv_ingest_sec": csv_ingest_sec,
                    # peak driver-process RSS: the reference's ingest
                    # discipline is constant driver memory (32 MB cap in
                    # its harness); ours must stay flat as files grow
                    "peak_driver_rss_mb": round(
                        __import__("resource")
                        .getrusage(__import__("resource").RUSAGE_SELF)
                        .ru_maxrss
                        / 1024,
                        1,
                    ),
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
