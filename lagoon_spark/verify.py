"""Local mirror of the driver's correctness gate.

Runs a registered query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted by
their stringified values). Used by tests/test_queries_oracle.py and by
ad-hoc iteration.
"""

from __future__ import annotations

import hashlib
import math
import os
from dataclasses import dataclass

import duckdb

from lagoon_spark.queries import QueryDef
from lagoon_spark.session import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return f"{v:.1f}"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _hash_rows(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode("utf-8", "replace"))
        h.update(b"\n")
    return h.hexdigest()


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    duck_rows: int
    detail: str = ""


def compare(spark, con, qdef: QueryDef, sf_dir: str, sample_mismatch: int = 5) -> CompareResult:
    sdf = qdef.spark_fn(spark, sf_dir)
    scols = list(sdf.columns)
    srows = [tuple(r) for r in sdf.collect()]

    if qdef.oracle is None:
        return CompareResult(qdef.name, True, len(srows), -1, "rows-only (no oracle)")

    dres = con.execute(qdef.oracle)
    dcols = [d[0] for d in dres.description]
    drows = dres.fetchall()

    if sorted(c.lower() for c in scols) != sorted(c.lower() for c in dcols):
        return CompareResult(
            qdef.name, False, len(srows), len(drows),
            f"column mismatch: spark={sorted(scols)} duck={sorted(dcols)}",
        )
    if len(srows) != len(drows):
        return CompareResult(
            qdef.name, False, len(srows), len(drows), "row count mismatch"
        )
    sh = _hash_rows([c.lower() for c in scols], srows)
    dh = _hash_rows([c.lower() for c in dcols], drows)
    if sh != dh:
        order_s = sorted(range(len(scols)), key=lambda i: scols[i].lower())
        order_d = sorted(range(len(dcols)), key=lambda i: dcols[i].lower())
        s_lines = sorted("|".join(_norm_cell(r[i]) for i in order_s) for r in srows)
        d_lines = sorted("|".join(_norm_cell(r[i]) for i in order_d) for r in drows)
        diffs = [
            f"  spark: {a}\n  duck : {b}"
            for a, b in zip(s_lines, d_lines)
            if a != b
        ][:sample_mismatch]
        return CompareResult(
            qdef.name, False, len(srows), len(drows),
            "value hash mismatch; first diffs:\n" + "\n".join(diffs),
        )
    return CompareResult(qdef.name, True, len(srows), len(drows))
