"""Temporal join queries over the events table: as-of join, range join.

The reference never needed these (its surface is whatever Postgres
runs), but they are the canonical "operator Spark lacks" pair for
event/time-series pipelines — implemented in
`lagoon_spark/operators/temporal.py` as shuffle-lean compositions of
DataFrame primitives. Oracles use exact correlated-subquery /
inequality-join formulations (deterministic tie-breaks; DuckDB's native
ASOF JOIN leaves equal-timestamp ties unspecified).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lagoon_spark.operators import temporal
from lagoon_spark.queries import df_query
from lagoon_spark.session import register_views

# ---------------------------------------------------------------------------
# t01 — as-of join: latest purchase at-or-before each click, per user
# ---------------------------------------------------------------------------

_T01_ORACLE = """
WITH l AS (SELECT event_id, ts, user_id FROM events WHERE event_type = 'click'),
r AS (SELECT event_id, ts, user_id, value FROM events WHERE event_type = 'purchase')
SELECT l.event_id, l.user_id,
  (SELECT r.event_id FROM r
    WHERE r.user_id = l.user_id AND r.ts <= l.ts
    ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) AS prev_purchase_id,
  (SELECT r.value FROM r
    WHERE r.user_id = l.user_id AND r.ts <= l.ts
    ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) AS prev_purchase_value
FROM l
"""


@df_query(
    "t01_asof_join",
    "As-of join (backward, inclusive): latest prior purchase per click, "
    "per user. Union+window formulation — one shuffle, no range blow-up.",
    _T01_ORACLE,
)
def t01(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    ev = spark.table("events")
    left = ev.filter(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id"
    )
    right = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id", "value"
    )
    out = temporal.asof_join(
        left,
        right,
        ["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_payload=["event_id", "value"],
        tiebreak="event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("event_id_right").alias("prev_purchase_id"),
        F.col("value_right").alias("prev_purchase_value"),
    )


# ---------------------------------------------------------------------------
# t02 — range join: purchases within one hour after each error, per user
# ---------------------------------------------------------------------------

_T02_ORACLE = """
WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
r AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase')
SELECT l.event_id, COUNT(*) AS n_following,
       CAST(SUM(CAST(r.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM l JOIN r
  ON l.user_id = r.user_id
 AND r.ts >= l.ts
 AND r.ts <= l.ts + INTERVAL 1 HOUR
GROUP BY l.event_id
"""


@df_query(
    "t02_range_join",
    "Banded range join: count/sum of same-user purchases within 1h after "
    "each error event. Shuffle key is (user, hour-bucket).",
    _T02_ORACLE,
)
def t02(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    ev = spark.table("events")
    left = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    right = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = temporal.range_join(
        left,
        right,
        ["user_id"],
        left_ts="ts",
        right_ts="ts",
        lower_sec=0,
        upper_sec=3600,
    )
    return joined.groupBy(F.col("event_id_l").alias("event_id")).agg(
        F.count(F.lit(1)).alias("n_following"),
        F.sum(F.col("value_r").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_value"),
    )
