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


# ---------------------------------------------------------------------------
# st10 — continuous structural-cleaning gate (C4 → Gopher, stream == batch)
# ---------------------------------------------------------------------------
#
# The crawl first pass run continuously: C4 line/page rules produce the
# cleaned text, the Gopher rule set judges the CLEANED text, one
# row-local plan shared by batch and readStream deployments. Planted
# multi-line bodies reuse d33's expression; the oracle composes both
# rule sets over the same clean_text.

_ST10_MIN_WORDS = 10
_ST10_MAX_WORDS = 1000


def _st10_oracle() -> str:
    import lagoon_spark.operators.text as _text
    from lagoon_spark.oracle_fragments import D33_PLANT_DUCK as _D33_PLANT_DUCK

    _D32_STOPS = ", ".join(f"'{s}'" for s in _text.GOPHER_STOPWORDS)

    return f"""
WITH planted AS (
  SELECT doc_id, {_D33_PLANT_DUCK} AS body FROM documents
),
t AS (
  SELECT doc_id, body,
         list_filter(string_split(body, chr(10)), l -> l <> '') AS lines
  FROM planted
),
k AS (
  SELECT doc_id, body,
         list_filter(lines, l ->
           (l LIKE '%.' OR l LIKE '%!' OR l LIKE '%?' OR l LIKE '%"')
           AND len(list_filter(string_split(l, ' '), w -> w <> '')) >= 5
           AND NOT contains(lower(l), 'javascript')) AS kept
  FROM t
),
c AS (
  SELECT doc_id, body, kept,
         array_to_string(kept, chr(10)) AS clean_text
  FROM k
),
g AS (
  SELECT doc_id, body, kept, clean_text,
         list_filter(string_split_regex(clean_text, '[ \n]'), w -> w <> '') AS w,
         list_filter(string_split(clean_text, chr(10)), l -> l <> '') AS ls
  FROM c
),
sig AS (
  SELECT doc_id,
    CAST(len(kept) AS INT) AS n_kept_lines,
    CAST(length(clean_text) AS INT) AS clean_len,
    NOT (contains(lower(body), 'lorem ipsum') OR contains(body, '{{'))
      AND (length(clean_text) - length(translate(clean_text, '.!?', '')) >= 3)
      AS c4_keep,
    CAST(len(w) AS BIGINT) AS n_words,
    round(list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(w, x -> CAST(length(x) AS BIGINT))),
          (a, b) -> a + b) / greatest(len(w), 1), 6) AS mean_word_len,
    round(len(list_filter(w, x -> regexp_matches(lower(x), '[a-z]')))
          / greatest(len(w), 1), 6) AS alpha_word_frac,
    CAST(len(list_filter(w, x -> list_contains([{_D32_STOPS}], lower(x))))
         AS BIGINT) AS n_stopwords,
    round(((length(clean_text) - length(replace(clean_text, '#', '')))
           + (length(clean_text) - length(replace(clean_text, '...', ''))) / 3)
          / greatest(len(w), 1), 6) AS symbol_word_ratio,
    round(len(list_filter(ls, l -> l LIKE '- %' OR l LIKE '* %'))
          / greatest(len(ls), 1), 6) AS bullet_line_frac,
    round(len(list_filter(ls, l -> l LIKE '%...'))
          / greatest(len(ls), 1), 6) AS ellipsis_line_frac
  FROM g
)
SELECT doc_id, n_kept_lines, clean_len, c4_keep,
       c4_keep
       AND (n_words BETWEEN {_ST10_MIN_WORDS} AND {_ST10_MAX_WORDS})
       AND (mean_word_len BETWEEN 3.0 AND 10.0)
       AND alpha_word_frac >= 0.8
       AND n_stopwords >= 2
       AND symbol_word_ratio <= 0.1
       AND bullet_line_frac <= 0.9
       AND ellipsis_line_frac <= 0.3 AS keep
FROM sig
"""


@df_query(
    "st10_stream_clean_gate",
    "Continuous structural cleaning: C4 line/page rules producing the "
    "cleaned text, Gopher rules judging the CLEANED text — one row-local "
    "plan (no state, no shuffle) shared by batch and streaming "
    "deployments.",
    _st10_oracle(),
)
def st10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from lagoon_spark.oracle_fragments import D33_PLANT_SPARK as _D33_PLANT_SPARK

    register_views(spark, sf_dir)
    docs = spark.table("documents").select(
        "doc_id", F.expr(_D33_PLANT_SPARK).alias("__body")
    )
    return ops.clean_gate(
        docs, "__body",
        min_words=_ST10_MIN_WORDS, max_words=_ST10_MAX_WORDS,
    )


# ---------------------------------------------------------------------------
# st11 — streaming near-dup dedup by MinHash signature (one stateful op)
# ---------------------------------------------------------------------------

def _st11_oracle() -> str:
    from lagoon_spark.operators.dedup import minhash_seeds

    from lagoon_spark.oracle_fragments import D27_FPS

    mod = 1_000_000_007
    sig_items = ", ".join(
        f"CAST(list_min(list_transform(f, x -> (x % {mod} * {a} + {b}) % {mod})) AS VARCHAR)"
        for a, b in minhash_seeds(16)
    )
    return f"""
WITH fps AS (
  SELECT doc_id, list_distinct({D27_FPS}) AS f FROM documents
),
k AS (
  SELECT doc_id, array_to_string([{sig_items}], '_') AS sig_key FROM fps
)
SELECT doc_id, sig_key FROM (
  SELECT doc_id, sig_key,
         row_number() OVER (PARTITION BY sig_key ORDER BY doc_id) AS rn
  FROM k
) WHERE rn = 1
"""


@df_query(
    "st11_stream_signature_dedup",
    "Online near-dup dedup: 16-hash MinHash signature equality (the "
    "highest-precision LSH tier) as one watermark-bounded stateful "
    "dropDuplicates — signature is a row-local JVM fold; batch twin "
    "keeps the min-id survivor per signature.",
    _st11_oracle(),
)
def st11(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return ops.signature_dedup(spark.table("documents"))
