"""Gram-key representation cost at sf0.1 (round-10 verdict #4).

Round 10 moved the gram pipelines (d08 Jaccard, d21/d22/d36 span
dedup) from raw gram STRINGS to 64-bit xxhash64 keys: at 1M docs the
shuffle dropped 2.8× (the 100 TB argument), but at sf0.1 the extra
per-occurrence hash is a real cost that was asserted, not measured.
This harness measures it: the five affected/flagged lanes timed with
``LAGOON_GRAM_KEYS=hash`` (production) and ``=string``, same session,
warm medians with the cold rep discarded, plus both bench calibration
probes so the measurement session's host conditions are on record.
q64 (MinHash LSH — no gram keys in its plan) rides along as a control:
its hash/string walls should agree within noise.

Writes GRAM_COST_r11.json; the SCALE.md table is transcribed from it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

LANES = [
    "q64_d06_minhash_lsh_pairs",
    "q66_d08_ngram_jaccard_pairs",
    "q102_d21_crossdoc_dup_fraction",
    "q104_d22_duplicate_spans",
    "q137_d36_remove_duplicate_spans",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "4"))

    from lagoon_spark.checkpointing import release
    from lagoon_spark.queries import get_query
    from lagoon_spark.session import get_spark

    spark = get_spark("lagoon_gram_cost")
    get_query(LANES[0]).spark_fn(spark, sf_dir).count()  # warm session

    def calib_cpu() -> float:
        t0 = time.perf_counter()
        spark.range(3_000_000_000, numPartitions=96).selectExpr(
            "sum(id * 2654435761 % 1000003) AS s"
        ).collect()
        return time.perf_counter() - t0

    def calib_shuffle() -> float:
        t0 = time.perf_counter()
        spark.range(20_000_000, numPartitions=32).selectExpr(
            "id % 1000000 AS k", "id AS v"
        ).groupBy("k").sum("v").selectExpr("sum(`sum(v)`)").collect()
        return time.perf_counter() - t0

    calib_cpu(), calib_shuffle()  # warm the probes
    probes = {
        "calib_sec": round(min(calib_cpu(), calib_cpu()), 3),
        "calib_shuffle_sec": round(min(calib_shuffle(), calib_shuffle()), 3),
    }

    def lane_wall(name: str) -> float:
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = get_query(name).spark_fn(spark, sf_dir)
            df.count()
            runs.append(time.perf_counter() - t0)
            release(df)
        runs = sorted(runs[1:])  # discard the cold rep, median the rest
        return round(runs[len(runs) // 2], 3)

    out: dict = {"sf": sf_dir, "reps": reps, **probes, "lanes": {}}
    # interleave modes per lane so slow host drift hits both equally
    for name in LANES:
        entry = {}
        for mode in ("hash", "string", "hash2", "string2"):
            os.environ["LAGOON_GRAM_KEYS"] = mode.rstrip("2")
            entry[mode] = lane_wall(name)
        os.environ["LAGOON_GRAM_KEYS"] = "hash"
        h = min(entry["hash"], entry["hash2"])
        st = min(entry["string"], entry["string2"])
        out["lanes"][name] = {
            "hash_sec": h,
            "string_sec": st,
            "hash_over_string": round(h / max(st, 1e-9), 3),
        }
    probes2 = {
        "calib_sec_end": round(min(calib_cpu(), calib_cpu()), 3),
        "calib_shuffle_sec_end": round(
            min(calib_shuffle(), calib_shuffle()), 3
        ),
    }
    out.update(probes2)
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "GRAM_COST_r11.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
