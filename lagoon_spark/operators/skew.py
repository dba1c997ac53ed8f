"""Skew mitigation: salted aggregation and salted joins.

AQE's skew-join handling covers moderate cases at runtime; these
helpers are for *structural* skew known in advance (a hot grouping key
with >> partition-size rows, a dimension key matched by a large share
of the fact table). Both preserve exact results:

* ``salted_agg``: two-stage aggregation — stage 1 groups on
  (keys, salt) so the hot key's rows spread over ``salt`` reducers;
  stage 2 combines the partials. Legal for decomposable aggregates
  (sum/count/min/max — avg is sum/count).
* ``salted_join``: replicates the (small) build side ``salt`` times
  and scatters the probe side uniformly, so a hot join key fans out
  over ``salt`` tasks instead of one straggler.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
_PARTIAL = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Exact two-stage aggregation over skewed grouping keys.

    ``aggs`` maps output column → (function, input column) with
    function in {sum, count, min, max}. Example::

        salted_agg(df, ["k"], {"n": ("count", "v"), "total": ("sum", "v")})
    """
    for fn, _ in aggs.values():
        if fn not in _PARTIAL:
            raise ValueError(f"non-decomposable aggregate {fn!r}")
    salted = df.withColumn("__salt", F.pmod(F.monotonically_increasing_id(), salt))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[_PARTIAL[fn](c).alias(out) for out, (fn, c) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[_MERGE[fn](out).alias(out) for out, (fn, _c) in aggs.items()]
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join with the build side replicated ``salt`` times.

    The probe side gets a uniform random-ish salt (row-id modulo), the
    build side is exploded over all salt values; the join key becomes
    (on..., salt), so each hot key spreads over ``salt`` shuffle
    partitions. Result equals the unsalted join exactly.
    """
    p = probe.withColumn("__salt", F.pmod(F.monotonically_increasing_id(), salt))
    b = build.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = p.join(b, on + ["__salt"], how)
    return out.drop("__salt")


def top_frequent_keys(df: DataFrame, key: str, min_count: int) -> Column:
    """Helper for hybrid plans: collect the hot-key set (bounded size)
    to split a join into broadcast (hot keys) + shuffle (rest)."""
    hot = (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= min_count)
        .select(key)
    )
    return hot


def capped_per_key(
    df: DataFrame,
    key: str,
    order_by: "list[Column]",
    n: int,
    *,
    salt: Column,
    salt_buckets: int = 32,
    rank_col: str = "rank",
) -> DataFrame:
    """Keep at most ``n`` rows per key (exact), skew-safely.

    The naive plan — ``row_number() OVER (PARTITION BY key ORDER BY
    ...) <= n`` — sorts EVERY row of a key inside one task; a hot key
    holding 60% of a 100 TB corpus (one dominant crawl domain is the
    canonical case) becomes a single straggler sort. This runs two
    phases, both bounded:

    1. rank within (key, salt) and keep ``n`` per salted group — the
       hot key spreads over ``salt_buckets`` tasks, each sorting only
       its slice and emitting ≤ n rows;
    2. rank the ≤ ``salt_buckets * n`` survivors per key — now a
       metadata-sized sort per key regardless of corpus size.

    ``order_by`` must be a total order (unique tiebreak) for the
    result to equal the single-window plan exactly; ``salt`` must be a
    deterministic row expression (e.g. ``id % salt_buckets``).
    """
    from pyspark.sql import Window

    w1 = Window.partitionBy(key, "__salt").orderBy(*order_by)
    w2 = Window.partitionBy(key).orderBy(*order_by)
    local = (
        df.withColumn("__salt", F.pmod(salt, F.lit(salt_buckets)))
        .withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= n)
    )
    return (
        local.withColumn(rank_col, F.row_number().over(w2))
        .filter(F.col(rank_col) <= n)
        .drop("__salt", "__r1")
    )
