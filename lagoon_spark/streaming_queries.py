"""Registry entries for the streaming plane, run on the batch path.

The plan builders in ``lagoon_spark.streaming.ops`` are mode-agnostic;
here they run over the batch ``events`` view so the DuckDB oracle gates
their semantics. ``tests/test_streaming.py`` runs the same builders
over ``readStream`` and asserts parity with these batch results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lagoon_spark.queries import df_query
from lagoon_spark.session import register_views
from lagoon_spark.streaming import ops


# Tumbling windows are epoch-aligned, so a 1-hour window start is
# exactly date_trunc('hour', ts) — DuckDB computes the same bucket.
_ST01_ORACLE = """
SELECT date_trunc('hour', ts) AS bucket_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


@df_query(
    "st01_windowed_event_stats",
    "Tumbling 1-hour event-time window × event_type: count + exact sum (streaming builder, batch-gated).",
    _ST01_ORACLE,
)
def st01(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return ops.windowed_event_stats(spark.table("events"), window="1 hour")


_ST02_ORACLE = """
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
),
flagged AS (
  SELECT user_id, event_id, us,
         CASE WHEN us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
numbered AS (
  SELECT user_id, us,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       COUNT(*) AS n_events,
       MIN(us) AS start_us,
       MAX(us) AS end_us
FROM numbered
GROUP BY user_id, session_id
"""


@df_query(
    "st02_sessionize",
    "30-minute-gap sessionization per user (lag/cumsum plan; session_window on the stream path).",
    _ST02_ORACLE,
)
def st02(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return ops.sessionize_batch(spark.table("events"))


# The applyInPandasWithState operator's final state equals this batch
# aggregation (parity asserted in tests/test_streaming.py); gating the
# batch form gives the custom stateful op an oracle too.
_ST03_ORACLE = """
SELECT user_id, COUNT(*) AS n_events, MAX(ts) AS last_ts
FROM events
GROUP BY user_id
"""


@df_query(
    "st03_stateful_user_counts",
    "Final state of the applyInPandasWithState per-user counter (batch-equivalent form).",
    _ST03_ORACLE,
)
def st03(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    register_views(spark, sf_dir)
    return spark.table("events").groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"), F.max("ts").alias("last_ts")
    )


# Hypertable-style hierarchical rollup: the daily tier is computed FROM
# the hourly tier's partials (decimal sums are associative, so the
# re-aggregation is exact) — the pattern a continuous-aggregate /
# hypertable maintains incrementally at scale.
_ST04_ORACLE = """
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


# Survivor identity pinned to min event_id per key so batch, streaming
# (first-arrival == min id: the file stream delivers in file order),
# and the oracle agree on *which* row survives.
_ST05_ORACLE = """
SELECT user_id, event_type, event_id, value FROM (
  SELECT user_id, event_type, event_id, value,
         MIN(event_id) OVER (PARTITION BY user_id, event_type) AS keeper
  FROM events
) t WHERE event_id = keeper
"""


@df_query(
    "st05_stream_dedup",
    "Online dedup (dropDuplicatesWithinWatermark on the stream path): "
    "first event per (user, type), min-id survivor in batch form.",
    _ST05_ORACLE,
)
def st05(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    register_views(spark, sf_dir)
    ev = spark.table("events").select("user_id", "event_type", "event_id", "value")
    keep = F.min("event_id").over(W.partitionBy("user_id", "event_type"))
    return ev.withColumn("__k", keep).filter(F.col("event_id") == F.col("__k")).drop("__k")


_ST06_ORACLE = """
SELECT l.event_id AS error_id, l.user_id, r.event_id AS purchase_id, r.value
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') l
JOIN (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id
 AND r.ts >= l.ts
 AND r.ts <= l.ts + INTERVAL 1 HOUR
"""


@df_query(
    "st06_stream_stream_join",
    "Stream-stream interval join (watermarked, state-bounded): purchases "
    "within 1h after each error (batch twin of the same plan).",
    _ST06_ORACLE,
)
def st06(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    register_views(spark, sf_dir)
    ev = spark.table("events")
    return ops.error_purchase_join_stream(
        ev.filter(F.col("event_type") == "error"),
        ev.filter(F.col("event_type") == "purchase"),
    )


@df_query(
    "st04_hierarchical_rollup",
    "Daily rollup computed from the hourly tier's partial aggregates (hypertable pattern).",
    _ST04_ORACLE,
)
def st04(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    register_views(spark, sf_dir)
    hourly = (
        spark.table("events")
        .groupBy(
            F.date_trunc("hour", "ts").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("s"),
        )
    )
    return (
        hourly.groupBy(
            F.to_date("hour").alias("day"),
            "event_type",
        )
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("s").alias("s2"),
        )
        .select(
            "day",
            "event_type",
            "n_events",
            F.col("s2").cast("double").alias("sum_value"),
        )
    )


_ST07_ORACLE = """
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS micro_total
FROM events
GROUP BY user_id
"""


@df_query(
    "st07_running_user_totals",
    "Running per-user count + fixed-point value total (transformWithState "
    "arbitrary-state API on the stream path; integer-micros accumulation "
    "makes batch, stream, and oracle bit-identical).",
    _ST07_ORACLE,
)
def st07(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return ops.running_user_value_totals(spark.table("events"))


_ST08_ORACLE = """
WITH c AS (
  SELECT date_trunc('hour', ts) AS bucket_start, event_type,
         COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT bucket_start, event_type, n_events, CAST(rank AS INTEGER) AS rank
FROM (
  SELECT c.*, row_number() OVER (
           PARTITION BY bucket_start
           ORDER BY n_events DESC, event_type) AS rank
  FROM c
) WHERE rank <= 2
"""


@df_query(
    "st08_windowed_topk_types",
    "Windowed top-k ('trending types'): streamable watermarked counts per "
    "(1h window, type), rank finalized per closed window on the sink side "
    "(the split every streaming top-k uses — rank is not incremental).",
    _ST08_ORACLE,
)
def st08(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return ops.finalize_topk(
        ops.windowed_type_counts(spark.table("events")), k=2
    )


# ---------------------------------------------------------------------------
# st09 — continuous document quality gate (stream == batch, row-local)
# ---------------------------------------------------------------------------

from lagoon_spark.oracle_fragments import (
    D27_FPS as _D27_FPS,
    D28_F as _D28_F,
    D28_WEIGHTS as _D28_WEIGHTS,
)

# near the corpus's score median, so the gate visibly keeps and drops
_ST09_MIN_SCORE = 0.42
_ST09_MIN_TOK, _ST09_MAX_TOK = 3, 10_000

_ST09_ORACLE = f"""
WITH f AS (SELECT doc_id, {_D27_FPS} AS fps FROM documents),
s AS (
  SELECT doc_id, len(fps) AS n,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(fps,
             x -> CAST(list_extract([{", ".join(repr(w) for w in _D28_WEIGHTS)}],
                       CAST(x % {_D28_F} AS INT) + 1) AS DOUBLE))),
           (a, b) -> a + b) AS sw
  FROM f),
scored AS (
  SELECT doc_id,
         round(1.0 / (1.0 + exp(-(CASE WHEN n > 0 THEN sw / n
                                       ELSE 0.0 END))), 9) AS quality_score,
         CAST(n AS INT) AS n_tokens
  FROM s)
SELECT doc_id, quality_score, n_tokens
FROM scored
WHERE quality_score >= {_ST09_MIN_SCORE}
  AND n_tokens BETWEEN {_ST09_MIN_TOK} AND {_ST09_MAX_TOK}
"""


@df_query(
    "st09_stream_quality_gate",
    "Continuous document quality gate: hashed-linear score (trained "
    "weights) + token bounds as ONE row-local plan shared by batch and "
    "readStream→writeStream deployments — no state, no shuffle, any "
    "trigger.",
    _ST09_ORACLE,
)
def st09(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return ops.quality_gate(
        spark.table("documents"),
        weights=_D28_WEIGHTS,
        min_score=_ST09_MIN_SCORE,
        min_tokens=_ST09_MIN_TOK,
        max_tokens=_ST09_MAX_TOK,
    )
