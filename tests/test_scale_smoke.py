"""Scale smoke: the reference's routinely-tested large ingests.

The reference regression-tests 1M-row CSV / 1M-value JSON ingests
under a constant-memory cap (`runtests.sh:64-92`). Spark's analog of
the constant-memory guarantee is that no row set ever materializes on
the driver — ingest is scan → agg → write. These tests run the same
shapes at suite-friendly sizes (the 1M-row CSV completes in ~12 s on
local[32]; see SCALE.md).
"""

from __future__ import annotations

import json
import os

N_CSV = int(os.environ.get("SPARK_GRAFT_SCALE_ROWS", "300000"))
N_JSON = N_CSV // 3


def test_wide_csv_ingest_with_inference(lagoon, tmp_path):
    p = tmp_path / "big.csv"
    with open(p, "w") as f:
        f.write("id,flag,score,label\n")
        for i in range(N_CSV):
            f.write(f"{i},{'t' if i % 2 else 'f'},{i / 7:.3f},row{i}\n")
    info = lagoon.ingest(str(p), "big_csv")
    assert info.row_count == N_CSV
    assert [(h, t) for _p, h, t in info.columns] == [
        ("id", "INTEGER"),
        ("flag", "BOOLEAN"),
        ("score", "DOUBLE PRECISION"),
        ("label", "TEXT"),
    ]
    # ix spans exactly 1..N in file order
    top = lagoon.sql("SELECT ix, id FROM big_csv_v1_typed ORDER BY ix LIMIT 3").collect()
    assert [(r.ix, r.id) for r in top] == [(1, 0), (2, 1), (3, 2)]
    mx = lagoon.sql("SELECT MAX(ix) AS m, COUNT(*) AS n FROM big_csv_v1").collect()[0]
    assert (mx.m, mx.n) == (N_CSV, N_CSV)


def test_json_values_ingest(lagoon, tmp_path):
    p = tmp_path / "vals.json"
    with open(p, "w") as f:
        for i in range(N_JSON):
            f.write(json.dumps({"i": i, "s": f"v{i}"}) + "\n")
    info = lagoon.ingest(str(p), "big_json")
    assert info.row_count == N_JSON
    assert info.json_type == '{"i":number, "s":string}'
