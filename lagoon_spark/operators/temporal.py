"""Temporal join operators: as-of join and range join.

Spark has no native ASOF JOIN (DuckDB/Pandas do) and a naive range join
degenerates to a per-key cross product. These are the two custom
operators the reference's surface never needed (Lagoon is batch
Postgres) but a time-series/event pipeline does; both are built from
DataFrame primitives so Catalyst/AQE still plan them.

Scale design:

* **as-of join** uses the union+window formulation: tag both sides,
  union, and take ``last(right_payload, ignoreNulls)`` over a window
  ordered by (ts, side, tiebreak) per key. ONE shuffle on the join key,
  zero candidate-pair blow-up, and skew behaves exactly like a window
  function (AQE-salvageable). The alternative — join on key with a
  ``r.ts <= l.ts`` predicate — is a per-key cross product that dies at
  scale.
* **range join** bands the time axis: each left row joins only the
  right buckets its window overlaps, so the shuffle key is
  (key, bucket) and the per-bucket fan-out is bounded by the band
  width. This is the classic interval-banding strategy used by every
  distributed range-join implementation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _micros(c: Column) -> Column:
    """Exact integer microseconds; TIMESTAMP_NTZ casts through TIMESTAMP
    (sessions here pin UTC, so the cast is deterministic)."""
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    *,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tiebreak: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` (per ``on`` key; inclusive, backward).

    ``tiebreak``: right column ordering simultaneous right rows (the
    greatest wins) — required for deterministic results when right
    timestamps can collide. Output = all left columns + right payload
    columns (suffixed), NULL when no right row precedes.
    """
    extra = [tiebreak] if tiebreak and tiebreak not in right_payload else []
    r_struct = F.struct(
        *[F.col(c) for c in extra],
        *[F.col(c).alias(c) for c in right_payload],
    )
    l_cols = left.columns
    tagged_r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        r_struct.alias("__r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in l_cols],
    )
    tagged_l = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(tagged_r.schema["__r"].dataType).alias("__r"),
        *[F.col(c).alias(f"__l_{c}") for c in l_cols],
    )
    order = [F.col("__ts"), F.col("__side")]
    if tiebreak:
        order.append(F.col("__r").getField(tiebreak))
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = tagged_r.unionByName(tagged_l).withColumn(
        "__match", F.last("__r", ignorenulls=True).over(w)
    )
    out_cols = [F.col(f"__l_{c}").alias(c) for c in l_cols] + [
        F.col("__match").getField(p).alias(f"{p}{suffix}") for p in right_payload
    ]
    return matched.filter(F.col("__side") == 1).select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    *,
    left_ts: str,
    right_ts: str,
    lower_sec: float,
    upper_sec: float,
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> DataFrame:
    """Equi-key join restricted to ``left.ts + lower <= right.ts <=
    left.ts + upper`` via time-banding.

    Each left row is exploded to the hour-scale buckets its window
    overlaps (ceil(span/band)+1 rows, a small constant); the join runs
    on (key, bucket) and the exact interval predicate filters after.
    """
    # integer microseconds end to end: a double epoch (unix_micros/1e6)
    # is not exactly representable and can flip boundary comparisons
    lower_us = int(round(lower_sec * 1_000_000))
    upper_us = int(round(upper_sec * 1_000_000))
    band_us = max(upper_us - lower_us, 1)
    l_us = _micros(F.col(left_ts))
    r_us = _micros(F.col(right_ts))

    lo_bucket = F.floor((l_us + F.lit(lower_us)) / F.lit(band_us))
    hi_bucket = F.floor((l_us + F.lit(upper_us)) / F.lit(band_us))
    lhs = left.select(
        *[F.col(c) for c in on],
        F.explode(F.sequence(lo_bucket, hi_bucket)).alias("__bucket"),
        *[F.col(c).alias(f"{c}{suffixes[0]}") for c in left.columns if c not in on],
    )
    rhs = right.select(
        *[F.col(c) for c in on],
        F.floor(r_us / F.lit(band_us)).alias("__bucket"),
        *[F.col(c).alias(f"{c}{suffixes[1]}") for c in right.columns if c not in on],
    )
    lt = _micros(F.col(f"{left_ts}{suffixes[0]}"))
    rt = _micros(F.col(f"{right_ts}{suffixes[1]}"))
    return lhs.join(rhs, on=[*on, "__bucket"]).filter(
        (rt >= lt + F.lit(lower_us)) & (rt <= lt + F.lit(upper_us))
    ).drop("__bucket")
