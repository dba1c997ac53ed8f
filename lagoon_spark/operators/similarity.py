"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — brute-force top-k against one query vector: one
  narrow scan, row-local fold for the dot product (JVM expression, no
  UDF), then a k-row takeOrdered. The baseline every ANN variant is
  measured against.
* ``pairwise_cosine`` — blocked all-pairs verifier (label / bucket
  blocking bounds the join).
* ``rp_lsh_buckets`` — sign-random-projection LSH: each vector gets a
  b-bit bucket key from deterministic pseudo-random hyperplanes; at
  scale candidates come from equal (or near) bucket keys, turning the
  O(n²) search into a bucket-local join.

Determinism: all dot products are explicit left folds over the vector
elements cast to double — the same fold the DuckDB oracle runs, so
results are bitwise-comparable.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot_expr(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _norm_expr(a: str) -> str:
    return (
        f"SQRT(aggregate(transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
    )


def cosine_to(vec_col: str, other_col: str) -> Column:
    """cosine(vec_col, other_col) as a single JVM expression."""
    return F.expr(
        f"{_dot_expr(vec_col, other_col)} / ({_norm_expr(vec_col)} * {_norm_expr(other_col)})"
    )


def cosine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_df: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Top-k rows by cosine similarity to the (single-row) query vector.

    The query side is crossJoin-broadcast (one row), similarity is a
    row-local fold, and the top-k is an orderBy+limit — Spark executes
    it as TakeOrderedAndProject (per-partition heaps, no full sort).
    """
    q = query_df.select(F.col(vec_col).alias("__qvec"))
    return (
        df.crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            F.round(cosine_to(vec_col, "__qvec"), 9).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def pairwise_cosine(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_cols: list[str] | None = None,
    min_cosine: float = 0.0,
) -> DataFrame:
    """Blocked pairwise cosine — the near-duplicate verifier stage.

    Norms are computed once per *row* before the pair join (computing
    them per pair would fold each vector O(bucket) times); the per-pair
    work is a single dot-product fold. The base projection is persisted
    so the self-join's two sides don't recompute it — at 100 TB scale
    this intermediate would be a materialized signature table.
    """
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        F.expr(_norm_expr(vec_col)).alias("__norm"),
        *[F.col(c) for c in (block_cols or [])],
    ).persist()
    base.count()  # eager materialization (see dedup.lsh_candidate_pairs)
    a = base.select(
        F.col("__id").alias("id_a"),
        F.col("__v").alias("v_a"),
        F.col("__norm").alias("norm_a"),
        *[F.col(c) for c in (block_cols or [])],
    )
    b = base.select(
        F.col("__id").alias("id_b"),
        F.col("__v").alias("v_b"),
        F.col("__norm").alias("norm_b"),
        *[F.col(c).alias(f"{c}__b") for c in (block_cols or [])],
    )
    cond = F.col("id_a") < F.col("id_b")
    for c in block_cols or []:
        cond = cond & (F.col(c) == F.col(f"{c}__b"))
    scored = a.join(b, cond).select(
        "id_a",
        "id_b",
        F.round(
            F.expr(_dot_expr("v_a", "v_b")) / (F.col("norm_a") * F.col("norm_b")), 9
        ).alias("cosine"),
    )
    # barrier before the threshold filter — without it Catalyst pushes
    # the filter into the join condition and the dot-product fold runs
    # multiple times per candidate pair (see dedup.ngram_jaccard_pairs)
    scored = scored.persist()
    scored.count()
    return scored.filter(F.col("cosine") >= min_cosine)


def _pseudo_hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic unit-free hyperplanes from a splitmix-style PRNG.

    Good enough for LSH (only signs matter); avoids numpy so the exact
    constants are reproducible anywhere.
    """
    planes = []
    state = seed & 0xFFFFFFFFFFFFFFFF
    for _ in range(bits):
        row = []
        for _ in range(dim):
            state = (state + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
            z = state
            z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
            z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
            z = z ^ (z >> 31)
            # map to (-1, 1): Box-Muller is unnecessary, signs suffice
            row.append((z / 2**63) - 1.0)
        planes.append(row)
    return planes


def rp_lsh_buckets(
    df: DataFrame,
    vec_col: str,
    dim: int,
    bits: int = 16,
    seed: int = 42,
    out_col: str = "lsh_bucket",
) -> DataFrame:
    """Sign-random-projection bucket key (bits-wide int) per vector.

    Row-local: bucket bit k = sign(<v, plane_k>). Vectors in the same
    bucket are ANN candidates; multi-probe = hamming-adjacent buckets.
    """
    planes = _pseudo_hyperplanes(dim, bits, seed)
    bucket: Column = F.lit(0).cast("long")
    for k, plane in enumerate(planes):
        arr = "array(" + ",".join(f"CAST({w:.17g} AS DOUBLE)" for w in plane) + ")"
        dot = F.expr(
            f"aggregate(zip_with({vec_col}, {arr}, (x, y) -> CAST(x AS DOUBLE) * y), "
            f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << k)).otherwise(F.lit(0))
    return df.withColumn(out_col, bucket)


def ivf_assign(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    out_col: str = "ivf_cell",
) -> DataFrame:
    """Assign each vector to its nearest centroid (IVF coarse quantizer).

    Centroids are a small broadcast list evaluated row-locally; at scale
    they come from a sampled k-means (see tests for the flow).
    """
    best_cell: Column = F.lit(-1)
    best_d: Column = F.lit(math.inf)
    for ci, c in enumerate(centroids):
        arr = "array(" + ",".join(f"CAST({w:.17g} AS DOUBLE)" for w in c) + ")"
        d = F.expr(
            f"aggregate(zip_with({vec_col}, {arr}, (x, y) -> "
            f"(CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
            f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        better = d < best_d
        best_cell = F.when(better, F.lit(ci)).otherwise(best_cell)
        best_d = F.when(better, d).otherwise(best_d)
    return df.withColumn(out_col, best_cell)


def quantize_embeddings(
    df: DataFrame,
    vec_col: str,
    *,
    levels: int = 127,
    out_col: str = "quantized",
    scale_col: str = "scale",
) -> DataFrame:
    """Symmetric int8-style quantization: q = floor(v * scale + 0.5).

    ``scale = levels / max(|v|)`` per row (absmax quantization — the
    standard int8 embedding compression). floor(x + 0.5) instead of
    round() because round-half modes differ across engines while
    floor is IEEE-exact everywhere; all arithmetic is float64, so the
    identical bits come out of any engine. Row-local, no shuffle —
    a pure map over 100 TB of vectors.
    """
    amax = F.array_max(
        F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double")))
    )
    scale = F.when(amax > 0, F.lit(float(levels)) / amax).otherwise(F.lit(1.0))
    df = df.withColumn(scale_col, scale)
    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.col(scale_col) + F.lit(0.5)).cast(
            "int"
        ),
    )
    return df.withColumn(out_col, q)
