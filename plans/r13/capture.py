"""Capture .explain('formatted'), isolated noop-sink timings and
per-lane JOB COUNTS for named lanes (round-13 optimization evidence).

Usage:
    python plans/r13/capture.py <suffix> [lane ...]

Writes plans/r13/<lane>_<suffix>.txt for each lane and prints one JSON
line {"lane": {"wall": sec, "jobs": n}, ...} of noop-sink walls
(median of CAPTURE_REPS after 1 warm run) plus the Spark job count of
the LAST rep — the per-iteration evidence `explain` cannot show for
iterative lanes (the final plan is a checkpoint scan).  Lanes accept
either the full registry key (q116_d29_dsir_resample) or any unique
substring (q116).  SPARK_GRAFT_SF_DIR selects the data directory
(default /root/testdata/sf0.1).
"""

from __future__ import annotations

import io
import json
import os
import statistics
import sys
import time
from contextlib import redirect_stdout

_TREE = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, _TREE)

from lagoon_spark.queries import registry  # noqa: E402
from lagoon_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    wanted = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("CAPTURE_REPS", "3"))
    spark = get_spark("lagoon_spark_plans_r13")
    qs = registry()
    names = []
    for w in wanted:
        hits = [k for k in qs if w == k or k.startswith(w + "_") or w in k]
        if len(hits) != 1:
            raise SystemExit(f"{w!r} matches {hits}")
        names.append(hits[0])

    # same warm-up as bench.py: JVM, parquet footers, worker pools
    qs["q12_distinct"].spark_fn(spark, sf_dir).count()
    import glob

    for p in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        spark.read.parquet(p).count()
    from pyspark.sql.functions import pandas_udf

    _warm = pandas_udf(lambda s: s, "long")
    spark.range(1000, numPartitions=32).select(_warm("id")).count()

    def _warm_batches(batches):
        import numpy  # noqa: F401

        for b in batches:
            yield b

    spark.range(32, numPartitions=32).mapInPandas(_warm_batches, "id long").count()

    tracker = spark.sparkContext.statusTracker()
    out_dir = os.path.dirname(os.path.abspath(__file__))
    walls: dict[str, dict] = {}
    for name in names:
        fn = qs[name].spark_fn
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        ts = []
        jobs = 0
        for i in range(reps + 1):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            j0 = len(tracker.getJobIdsForGroup(None))
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
            jobs = len(tracker.getJobIdsForGroup(None)) - j0
        walls[name] = {
            "wall": round(statistics.median(ts[1:]), 3),
            "jobs": jobs,
        }
        print(f"# {name}: warm={ts[0]:.3f} reps={[round(t,3) for t in ts[1:]]}"
              f" jobs_last_rep={jobs}",
              file=sys.stderr)
    print(json.dumps(walls))


if __name__ == "__main__":
    main()
