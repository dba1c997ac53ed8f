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


def test_compaction_at_scale(lagoon, tmp_path):
    """The reference compacts a 2M-row dataset in its compaction suite
    (`runcompactiontests.sh` over gen-test-data many-rows). Same shape
    at suite-friendly size: v2 = v1 + a suffix (the prefix-extension
    class the reference tests), compacted ix must stay dense 1..N with
    no single-task global window (dense_order_ix)."""
    n = N_CSV // 3
    p1 = tmp_path / "v1.csv"
    p2 = tmp_path / "v2.csv"
    with open(p1, "w") as f:
        f.write("k,x\n")
        for i in range(n):
            f.write(f"{i},{'true' if i % 2 else 'false'}\n")
    with open(p2, "w") as f:
        f.write("k,x\n")
        for i in range(n + 2):
            f.write(f"{i},{'true' if i % 2 else 'false'}\n")
    lagoon.ingest(str(p1), "bigcompact")
    lagoon.ingest(str(p2), "bigcompact")
    lagoon.compact("bigcompact")
    c1 = lagoon.sql("SELECT COUNT(*) AS n FROM bigcompact_v1").collect()[0].n
    c2 = lagoon.sql("SELECT COUNT(*) AS n FROM bigcompact_v2").collect()[0].n
    assert (c1, c2) == (n, n + 2)
    # dense ix across the union: max == distinct count == total rows
    info = lagoon.catalog.get_source("bigcompact", 2)
    shared = lagoon.spark.read.parquet(lagoon._data_path(info.table_name))
    stats = shared.selectExpr(
        "MAX(ix) AS mx", "COUNT(DISTINCT ix) AS d", "COUNT(*) AS n"
    ).collect()[0]
    assert stats.mx == stats.d == stats.n == n + 2
