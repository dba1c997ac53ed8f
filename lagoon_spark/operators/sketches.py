"""Distributed sketches: a cross-engine-exact HyperLogLog.

Spark's ``approx_count_distinct`` and DuckDB's ``approx_count_distinct``
are both HLL but with different hash functions and register layouts, so
their estimates can't be compared. This module implements HLL with a
fully specified, engine-portable recipe so the *same estimate* comes
out of any SQL engine — which is what lets the DuckDB oracle hash-match
a sketch, normally the least comparable of operators:

* hash: Knuth multiplicative ``(v * 2654435761) mod 2^32`` followed by
  two xorshift-multiply avalanche rounds (the lowbias32 finalizer) —
  exact 64-bit integer arithmetic everywhere (a bare multiplicative
  hash leaves sequential keys correlated in the low bits and HLL's
  rho statistic biased);
* bucket = top ``p`` bits, w = remaining ``32-p`` bits;
* rho(w) = leading-zero count + 1 via ``length(bin(w))`` (both engines
  print minimal binary);
* indicator sum Σ 2^-rho is a sum of dyadic rationals with ≤ 25
  fractional bits and ≤ 2^p terms — **exactly representable in a
  double regardless of accumulation order**, so the shuffle's
  nondeterministic reduce order cannot change the result;
* the only transcendental (ln in the linear-counting branch) is
  rounded to 4 decimals to absorb last-ulp libm differences.

Scale: one shuffle to (group, bucket) with map-side partial max, then
one tiny per-group reduce over ≤ 2^p registers. Register state is
O(2^p) per group — the entire point of HLL at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KNUTH = 2654435761
MIX = 0x45D9F3B
M32 = 1 << 32


def _mix_spark(h):
    """lowbias32-style finalizer; >> is exact integer div for h >= 0."""
    for _ in range(2):
        h = (h.bitwiseXOR((h / F.lit(1 << 16)).cast("long")) * F.lit(MIX)) % F.lit(M32)
    return h.bitwiseXOR((h / F.lit(1 << 16)).cast("long"))


def _mix_duck(h: str) -> str:
    for _ in range(2):
        h = f"(xor({h}, ({h}) // {1 << 16}) * {MIX}) % {M32}"
    return f"xor({h}, ({h}) // {1 << 16})"


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 8,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Per-group portable-HLL distinct estimate (rounded to 4 decimals).

    NULL values are ignored (COUNT DISTINCT semantics). The hash domain
    assumes ``|value| < 2^31`` so ``value * KNUTH`` stays inside int64
    (Spark would wrap silently, DuckDB would error — staying in range
    keeps both exact); wider keys should pre-hash to 32 bits.
    """
    df = df.filter(F.col(value_col).isNotNull())
    m = 1 << p
    w_bits = 32 - p
    max_rho = w_bits + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)

    h = _mix_spark((F.col(value_col).cast("long") * F.lit(KNUTH)) % F.lit(M32))
    bucket = (h / F.lit(1 << w_bits)).cast("long")
    w = h % F.lit(1 << w_bits)
    rho = F.when(w == 0, F.lit(max_rho)).otherwise(
        F.lit(max_rho) - F.length(F.bin(w))
    )

    regs = (
        df.select(*group_cols, bucket.alias("__b"), rho.alias("__rho"))
        .groupBy(*group_cols, "__b")
        .agg(F.max("__rho").alias("__r"))
    )
    per_group = regs.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("__r"))).alias("__s"),
        F.count(F.lit(1)).alias("__nb"),
    )
    # empty registers contribute 2^0 = 1 each; V = empty-register count
    s_all = F.col("__s") + (F.lit(float(m)) - F.col("__nb"))
    v = F.lit(m) - F.col("__nb")
    raw = F.lit(alpha * m * m) / s_all
    est = F.when(
        (v > 0) & (raw <= F.lit(2.5 * m)),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)
    return per_group.select(*group_cols, F.round(est, 4).alias(out_col))


def hll_oracle_sql(
    table: str,
    group_cols: list[str],
    value_col: str,
    p: int = 8,
    out_col: str = "approx_distinct",
) -> str:
    """The identical recipe as DuckDB SQL (the oracle side)."""
    m = 1 << p
    w_bits = 32 - p
    max_rho = w_bits + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    gc = ", ".join(group_cols)
    return f"""
WITH h0 AS (
  SELECT {gc},
         (CAST({value_col} AS BIGINT) * {KNUTH}) % {M32} AS hh
  FROM {table}
  WHERE {value_col} IS NOT NULL
),
h1 AS (SELECT {gc}, (xor(hh, hh // 65536) * {MIX}) % {M32} AS hh FROM h0),
h2 AS (SELECT {gc}, (xor(hh, hh // 65536) * {MIX}) % {M32} AS hh FROM h1),
h AS (SELECT {gc}, xor(hh, hh // 65536) AS hh FROM h2),
b AS (
  SELECT {gc}, hh // {1 << w_bits} AS bucket, hh % {1 << w_bits} AS w FROM h
),
regs AS (
  SELECT {gc}, bucket,
         MAX(CASE WHEN w = 0 THEN {max_rho} ELSE {max_rho} - length(bin(w)) END) AS r
  FROM b GROUP BY {gc}, bucket
),
g AS (
  SELECT {gc},
         SUM(power(2.0, -r)) AS s,
         COUNT(*) AS nb
  FROM regs GROUP BY {gc}
)
SELECT {gc},
       round(
         CASE WHEN ({m} - nb) > 0
               AND (CAST({alpha * m * m!r} AS DOUBLE)) / (s + ({m} - nb)) <= {2.5 * m}
              THEN CAST({m} AS DOUBLE) * ln(CAST({m} AS DOUBLE) / CAST({m} - nb AS DOUBLE))
              ELSE (CAST({alpha * m * m!r} AS DOUBLE)) / (s + ({m} - nb))
         END, 4) AS {out_col}
FROM g
"""
