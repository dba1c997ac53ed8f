"""Distributed sketches: cross-engine-exact HyperLogLog and Count-Min.

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
    keeps both exact); wider keys should pre-hash to 32 bits. Negative
    values are folded into the non-negative residue class up front
    (``pmod``) — Spark's truncating and DuckDB's flooring division
    diverge on negatives, so everything downstream stays non-negative.
    """
    df = df.filter(F.col(value_col).isNotNull())
    m = 1 << p
    w_bits = 32 - p
    max_rho = w_bits + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)

    h = _mix_spark(F.pmod(F.col(value_col).cast("long") * F.lit(KNUTH), F.lit(M32)))
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
         ((CAST({value_col} AS BIGINT) * {KNUTH}) % {M32} + {M32}) % {M32} AS hh
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


# ---------------------------------------------------------------------------
# Count-Min sketch — engine-portable token-frequency estimation
# ---------------------------------------------------------------------------
#
# The same philosophy as the HLL above: a fully specified integer recipe
# so the identical estimate comes out of Spark and the DuckDB oracle.
#
# * token hash fp = the portable rolling hash from operators/text.py
#   (left fold of acc*31 + ascii, mod 1e9+7) — already the minhash
#   building block, exact in both engines;
# * row i of the sketch maps fp to cell ((fp * a_i + b_i) mod P) mod W
#   with the same golden-ratio seed family as dedup.minhash_seeds
#   (well-spread multipliers mod P → the d row-maps are effectively
#   pairwise independent; the original a_i = 2i+1 family made rows
#   affine with tiny slopes, weakening the min-over-rows bound);
#   fp < P keeps the product inside int64 in both engines
#   ((1e9+7)^2 ~ 1.1e18 < 2^63);
# * estimate(token) = min over rows of the cell counter — the classic
#   CMS upper bound: est >= true, est <= true + eps*N w.h.p. with
#   eps = e/W over d = depth independent rows.
#
# Scale: the build is two map-side-combinable shuffles — (fp -> count)
# collapses token occurrences to distinct tokens, then (row, cell) sums
# to a d*W-cell table (a few KB) regardless of corpus size. That tiny
# table is the broadcast side of every probe join. At 100 TB the fp
# shuffle is the only data-sized stage and it is a uniform-key
# aggregation with partial combine.

from lagoon_spark.operators import text as _text


def cms_seeds(depth: int) -> list[tuple[int, int]]:
    """Same well-spread family as ``dedup.minhash_seeds`` (and for the
    same reason — see the degeneracy note there); every consumer,
    including the DuckDB oracle SQL, regenerates from this function,
    so both engines move together."""
    from lagoon_spark.operators.dedup import minhash_seeds

    return minhash_seeds(depth)


def token_fp_py(s: str) -> int:
    """Driver-side twin of operators/text.py word_fingerprints (probes
    are compile-time constants, so both engines get them as literals)."""
    acc = 0
    for ch in s:
        acc = (acc * _text.MULT + ord(ch)) % _text.MOD
    return acc


def cms_per_fp_counts(df: DataFrame, text_col: str) -> DataFrame:
    """The one data-sized pass: token occurrences → (fp, count).

    Both the sketch build and the exact-count comparison derive from
    this aggregate, so callers that need both (cms_token_estimates)
    tokenize the corpus exactly once.
    """
    toks = df.select(F.explode(_text.word_fingerprints(text_col)).alias("fp"))
    return toks.groupBy("fp").agg(F.count(F.lit(1)).alias("c"))


def cms_sketch(
    df: DataFrame, text_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build the (row, cell, cnt) sketch table over all token occurrences."""
    return cms_sketch_from_counts(
        cms_per_fp_counts(df, text_col), depth=depth, width=width
    )


def cms_sketch_from_counts(
    per_fp: DataFrame, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Sketch table from an existing (fp, c) aggregate — metadata-sized."""
    cells = per_fp.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        (((F.col("fp") * a + b) % F.lit(_text.MOD)) % width).alias(
                            "cell"
                        ),
                    )
                    for i, (a, b) in enumerate(cms_seeds(depth))
                ]
            )
        ).alias("s"),
        "c",
    )
    return cells.groupBy("s.row", "s.cell").agg(F.sum("c").alias("cnt"))


def cms_token_estimates(
    df: DataFrame,
    text_col: str,
    probes: list[str],
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """CMS estimate vs exact count for a fixed probe-token list.

    The sketch side is broadcast (d*W cells); absent cells count 0, so
    a never-seen token still gets a (possibly collision-inflated)
    estimate — the defining CMS behavior.
    """
    spark = df.sparkSession
    # NO persist: caching the (fp, count) aggregate is executor memory
    # proportional to the VOCABULARY (billions of fps at 100 TB) and
    # it was never unpersisted. The exact side below re-tokenizes, but
    # its probe IN-filter sits under the aggregate, so the second pass
    # is map-only with a ~len(probes)-row shuffle — two cheap map
    # passes beat one pass + a data-sized cache (and measured faster
    # at sf0.1 too: the StorageLevel serialization cost exceeded the
    # recompute).
    per_fp = cms_per_fp_counts(df, text_col)
    sketch = cms_sketch_from_counts(per_fp, depth=depth, width=width)
    probe_rows = [(t, token_fp_py(t)) for t in probes]
    probe = spark.createDataFrame(probe_rows, "token string, fp bigint")
    pcells = probe.select(
        "token",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        (((F.col("fp") * a + b) % F.lit(_text.MOD)) % width).alias(
                            "cell"
                        ),
                    )
                    for i, (a, b) in enumerate(cms_seeds(depth))
                ]
            )
        ).alias("s"),
    ).select("token", "fp", "s.row", "s.cell")
    est = (
        pcells.join(F.broadcast(sketch), ["row", "cell"], "left")
        .groupBy("token", "fp")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est_count"))
    )
    # the exact side is the FULL vocabulary aggregate — data-sized (a
    # 100 TB corpus has a billion-fp vocabulary; broadcasting it is a
    # driver OOM). The probe fps are compile-time constants, so filter
    # the vocabulary down to the probe set first: the IN-list pushes
    # into the aggregate scan and the broadcast is ≤ len(probes) rows.
    probe_fps = [fp for _t, fp in probe_rows]
    exact = per_fp.filter(F.col("fp").isin(probe_fps)).select(
        "fp", F.col("c").alias("exact_count")
    )
    return (
        est.join(F.broadcast(exact), "fp", "left")
        .select(
            "token",
            "est_count",
            F.coalesce("exact_count", F.lit(0)).alias("exact_count"),
        )
    )


def cms_oracle_sql(
    table: str,
    text_col: str,
    probes: list[str],
    depth: int = 4,
    width: int = 1024,
) -> str:
    """The identical CMS recipe as DuckDB SQL."""
    mod, mult = _text.MOD, _text.MULT
    fps = (
        f"list_transform(list_filter(string_split({text_col}, ' '), w -> w <> ''), "
        f"w -> list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(range(1, length(w) + 1), i -> CAST(ascii(substr(w, i, 1)) AS BIGINT))), "
        f"(a, b) -> (a * {mult} + b) % {mod}))"
    )
    seeds_vals = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(cms_seeds(depth)))
    probe_vals = ", ".join(f"('{t}', {token_fp_py(t)})" for t in probes)
    return f"""
WITH toks AS (SELECT unnest({fps}) AS fp FROM {table}),
per_fp AS (SELECT fp, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY fp),
seeds(row, a, b) AS (VALUES {seeds_vals}),
sketch AS (
  SELECT s.row, ((CAST(p.fp AS BIGINT) * s.a + s.b) % {mod}) % {width} AS cell,
         CAST(SUM(p.c) AS BIGINT) AS cnt
  FROM per_fp p, seeds s GROUP BY 1, 2
),
probes(token, fp) AS (VALUES {probe_vals}),
pcells AS (
  SELECT p.token, CAST(p.fp AS BIGINT) AS fp, s.row,
         ((CAST(p.fp AS BIGINT) * s.a + s.b) % {mod}) % {width} AS cell
  FROM probes p, seeds s
),
est AS (
  SELECT pc.token, pc.fp, CAST(MIN(COALESCE(sk.cnt, 0)) AS BIGINT) AS est_count
  FROM pcells pc LEFT JOIN sketch sk ON sk.row = pc.row AND sk.cell = pc.cell
  GROUP BY pc.token, pc.fp
)
SELECT e.token, e.est_count,
       CAST(COALESCE(x.c, 0) AS BIGINT) AS exact_count
FROM est e LEFT JOIN per_fp x ON x.fp = e.fp
"""


# ---------------------------------------------------------------------------
# Histogram quantile sketch — approximate percentiles without a global sort
# ---------------------------------------------------------------------------
#
# Exact percentiles (q44) need a per-group sort; at 100 TB that is a
# full range-partitioned shuffle of the data. The histogram sketch
# replaces it with ONE map-side-combinable groupBy onto fixed-width
# bins — the histogram is O(value_range/step) per group no matter how
# many rows feed it — then a window over the tiny histogram picks the
# first bin whose cumulative count crosses each target rank. Error is
# bounded by the bin width, cost by the histogram size.
#
# Portability: bin = floor(v/step) is one exactly-rounded IEEE divide +
# exact floor; rank crossings compare cum*100 >= pct*n in pure integer
# arithmetic — no ceil(q*n) float threshold to differ in the last ulp.


def histogram_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    step: int,
    pcts: list[int],
) -> DataFrame:
    """Per-group approximate percentiles (lower bin edge), error <= step.

    ``pcts`` are integer percents (e.g. [50, 90, 99]). Returns one row
    per group with ``p<pct>`` columns plus the group row count.
    """
    from pyspark.sql import Window

    b = F.floor(F.col(value_col) / F.lit(float(step))).cast("long")
    hist = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, b.alias("__bin"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("__bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*group_cols)
    cw = hist.select(
        *group_cols,
        "__bin",
        F.sum("__c").over(w_cum).alias("__cum"),
        F.sum("__c").over(w_all).alias("__n"),
    )
    aggs = [
        (
            F.min(
                F.when(F.col("__cum") * 100 >= F.lit(p) * F.col("__n"), F.col("__bin"))
            )
            * step
        ).alias(f"p{p}")
        for p in pcts
    ]
    return cw.groupBy(*group_cols).agg(*aggs, F.max("__n").alias("n_rows"))


def histogram_quantiles_oracle_sql(
    table: str,
    group_cols: list[str],
    value_col: str,
    step: int,
    pcts: list[int],
) -> str:
    gc = ", ".join(group_cols)
    sel = ",\n       ".join(
        f"CAST(MIN(CASE WHEN cum * 100 >= {p} * n THEN bin END) * {step} AS BIGINT) AS p{p}"
        for p in pcts
    )
    return f"""
WITH h AS (
  SELECT {gc}, CAST(floor({value_col} / {float(step)!r}) AS BIGINT) AS bin,
         COUNT(*) AS c
  FROM {table} WHERE {value_col} IS NOT NULL
  GROUP BY {gc}, bin
),
cw AS (
  SELECT {gc}, bin,
         SUM(c) OVER (PARTITION BY {gc} ORDER BY bin) AS cum,
         SUM(c) OVER (PARTITION BY {gc}) AS n
  FROM h
)
SELECT {gc},
       {sel},
       CAST(MAX(n) AS BIGINT) AS n_rows
FROM cw GROUP BY {gc}
"""
