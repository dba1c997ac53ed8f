"""sf1 bench lane (round-11 verdict #2): the sub-second sf0.1 floor.

~90 of the 137 sf0.1 bench lanes run under 0.5 s, where per-query fixed
overhead dominates and probe-mix shifts mint different regression flags
every window. This script runs a FIXED lane set — the 10 slowest
relational lanes of the r11 artifact plus the 5 shuffle-bound dedup
lanes — against a 10× replica of sf0.1 (the synthesized sf1), where the
smallest wall clears the 2 s overhead floor and round-over-round ratios
measure the engine.

Writes BENCH_SF1_r{round}.json (full fidelity) and prints one JSON
line. Comparison vs the newest committed BENCH_SF1_r{N}.json uses the
same per-probe normalization discipline as bench.py: each lane by the
probe of its resource tag, a flag only when EVERY probe agrees.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lagoon_spark.queries import get_query
from lagoon_spark.session import get_spark

# FIXED across rounds so the comparison is apples-to-apples: the 10
# slowest relational (q01–q50) lanes that still clear the 2 s floor AT
# SF1 (q09/q29/q39 from the r11 slowest list don't scale with the
# replica — window-over-small-group and driver-iterative lanes — and
# were swapped for q01/q03/q40, measured 5.1/2.4/4.2 s here) + the 5
# slowest shuffle-bound dedup lanes. Append, never reorder/remove —
# a lane missing from the prior artifact simply has no ratio.
LANES = [
    # relational
    "q01_pricing_summary",
    "q02_revenue_by_nation",
    "q03_left_join_customer_orders",
    "q08_nonequi_join",
    "q32_json_extract",
    "q37_json_containment",
    "q40_rank_family",
    "q41_cube",
    "q45_grouping_sets",
    "q48_variant_json",
    # shuffle-bound dedup
    "q116_d29_dsir_resample",
    "q113_d26_keep_canonical",
    "q77_d19_decontamination",
    "q69_d11_neardup_clusters",
    "q64_d06_minhash_lsh_pairs",
]

_PY_NODES = (
    "ArrowEvalPython",
    "BatchEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "FlatMapCoGroupsInPandas",
    "MapInArrow",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    factor = int(os.environ.get("SPARK_GRAFT_SF1_FACTOR", "10"))
    here = os.path.dirname(os.path.abspath(__file__))
    spark = get_spark("lagoon_spark_bench_sf1")

    import tempfile

    from scale_smoke import build_replica

    rep_dir = os.environ.get("SPARK_GRAFT_SF1_DIR")
    build_sec = 0.0
    if not rep_dir:
        rep_dir = tempfile.mkdtemp(prefix="lagoon_sf1_")
        build_sec = round(build_replica(spark, sf_dir, rep_dir, factor), 1)
        # The verbatim-clone replica multiplies every exact-dup clique
        # by the factor, so ALL-PAIRS dedup output grows quadratically
        # BY SEMANTICS (the round-12 seed fix made q64 emit real
        # cliques again: ~770M pairs at 10×, OOM at the bench heap —
        # the degenerate pre-fix signatures happened to collapse the
        # plan into something that fit). Same reason the scale-smoke
        # dedup audit synthesizes its corpus: the documents table is
        # replaced with the linear-output generator at 10× the audit's
        # small side, so the doc lanes (q64/q69/q77/q113/q116) measure
        # engine scaling, not clique combinatorics. TPC-H relational
        # lanes keep the verbatim clones.
        from scale_smoke import make_registry_docs

        make_registry_docs(spark, 500_000).write.mode(
            "overwrite"
        ).parquet(os.path.join(rep_dir, "documents.parquet"))

    # same worker-pool warmers as bench.py (startup is not query cost)
    from pyspark.sql.functions import pandas_udf

    _warm = pandas_udf(lambda s: s, "long")
    spark.range(1000, numPartitions=32).select(_warm("id")).count()

    def _warm_batches(batches):
        import numpy  # noqa: F401

        for b in batches:
            yield b

    spark.range(32, numPartitions=32).mapInPandas(
        _warm_batches, "id long"
    ).count()

    # the four probes, same definitions as bench.py
    def calibrate() -> float:
        t0 = time.perf_counter()
        spark.range(3_000_000_000, numPartitions=96).selectExpr(
            "sum(id * 2654435761 % 1000003) AS s"
        ).collect()
        return time.perf_counter() - t0

    def calibrate_shuffle() -> float:
        t0 = time.perf_counter()
        spark.range(20_000_000, numPartitions=32).selectExpr(
            "id % 1000000 AS k", "id AS v"
        ).groupBy("k").sum("v").selectExpr("sum(`sum(v)`)").collect()
        return time.perf_counter() - t0

    scan_path = max(
        glob.glob(os.path.join(rep_dir, "*.parquet")), key=_dir_size
    )

    def calibrate_scan() -> float:
        t0 = time.perf_counter()
        spark.read.parquet(scan_path).selectExpr(
            "sum(pmod(xxhash64(*), 1000003)) AS s"
        ).collect()
        return time.perf_counter() - t0

    def _py_probe(batches):
        import numpy as np

        for b in batches:
            ids = b["id"].to_numpy()
            b["id"] = (ids * 2654435761 % 1000003) + np.sqrt(ids + 1.0)
            yield b

    def calibrate_python() -> float:
        t0 = time.perf_counter()
        spark.range(4_000_000, numPartitions=32).mapInPandas(
            _py_probe, "id double"
        ).selectExpr("sum(id)").collect()
        return time.perf_counter() - t0

    probes = {}
    for key, fn in (
        ("cpu", calibrate),
        ("shuffle", calibrate_shuffle),
        ("scan", calibrate_scan),
        ("python", calibrate_python),
    ):
        fn()  # warm
        probes[key] = round(min(fn(), fn()), 3)

    from lagoon_spark.checkpointing import release

    timings: dict[str, float] = {}
    resource_tag: dict[str, str] = {}
    for name in LANES:
        df = get_query(name).spark_fn(spark, rep_dir)
        df.write.format("noop").mode("overwrite").save()  # warm, untimed
        release(df)
        t0 = time.perf_counter()
        df = get_query(name).spark_fn(spark, rep_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        try:
            plan = df._jdf.queryExecution().executedPlan().toString()
            if any(m in plan for m in _PY_NODES):
                resource_tag[name] = "python"
            elif "Exchange" in plan:
                resource_tag[name] = "shuffle"
            else:
                resource_tag[name] = "scan"
        except Exception:
            resource_tag[name] = "shuffle"
        release(df)

    total = round(sum(timings.values()), 3)

    prev, prev_name = None, None
    arts = sorted(
        glob.glob(os.path.join(here, "BENCH_SF1_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    if arts:
        try:
            with open(arts[-1]) as fh:
                prev = json.load(fh)
            prev_name = os.path.basename(arts[-1])
        except (OSError, json.JSONDecodeError):
            prev = None

    per_lane_ratio: dict[str, float] = {}
    regressions: dict[str, float] = {}
    if prev and prev.get("probes") and prev.get("queries"):
        for name, now_s in timings.items():
            p = prev["queries"].get(name)
            if not p:
                continue
            rs = {
                t: (now_s / probes[t]) / (p / prev["probes"][t])
                for t in probes
                if probes.get(t) and prev["probes"].get(t)
            }
            tag = resource_tag.get(name, "cpu")
            r = rs.get(tag, rs.get("cpu"))
            per_lane_ratio[name] = round(r, 3)
            if min(rs.values()) > 1.25:
                regressions[name] = round(r, 2)

    out = {
        "metric": "sf1_lane_wall_sec",
        "value": total,
        "unit": "sec",
        "sf_base": sf_dir,
        "replica_factor": factor,
        "replica_build_sec": build_sec,
        "queries": timings,
        "queries_resource_tag": resource_tag,
        "probes": probes,
        "min_lane_wall_sec": min(timings.values()),
        "prev_artifact": prev_name,
        "queries_norm_ratio_vs_prev": per_lane_ratio,
        "norm_regressions_gt_1_25": regressions,
    }
    try:
        with open(os.path.join(here, "PROGRESS.jsonl")) as fh:
            rnd = json.loads(fh.readlines()[-1]).get("round")
    except (OSError, IndexError, ValueError):
        rnd = None
    if rnd:
        with open(
            os.path.join(here, f"BENCH_SF1_r{rnd}.json"), "w"
        ) as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps(out, separators=(",", ":")))
    spark.stop()


def _dir_size(p: str) -> int:
    if os.path.isfile(p):
        return os.path.getsize(p)
    return sum(
        os.path.getsize(os.path.join(r, f))
        for r, _d, fs in os.walk(p)
        for f in fs
    )


if __name__ == "__main__":
    main()
