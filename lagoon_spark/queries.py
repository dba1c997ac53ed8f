"""Query registry: every operator in SURVEY.md §2 as a (Spark, oracle) pair.

Each entry implements one operator family from the reference's
relational surface (the Plane-B inventory derived from the reference's
EXPLAIN-plan parser, `src/backend/src/Lagoon/Util/PostgreSQL/QueryPlan.hs:144-178`,
and its R dplyr translations, `clients/RLagoon/R/dplyrlagoon.r:86-131`)
or one of the training-data-pipeline extensions (dedup, similarity,
text analysis).

Cross-engine determinism rules (Spark vs DuckDB must hash-match):

* Money/qty aggregates go through DECIMAL: ``CAST(x AS DECIMAL(18,2))``
  is exact for the 2-decimal synthetic data, decimal SUM is exact and
  order-independent, and the final ``CAST(... AS DOUBLE)`` is a single
  deterministic rounding. Floating SUM would differ in low bits between
  engines because accumulation order differs.
* Statistical moments (stddev/var/corr/covar) are computed from exact
  decimal sums via their closed forms instead of the engines' one-pass
  streaming implementations (which are order-dependent).
* AVG is written as exact-decimal SUM divided by COUNT (both engines
  then perform one identical double division).
* Vector math (dot products, norms) uses an explicit left fold
  (Spark ``aggregate``, DuckDB ``list_reduce``) so both engines add in
  the same order → bitwise-equal doubles.
* string_agg is always explicitly ordered.
* LIMIT always rides on a total order (unique tiebreak column).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from lagoon_spark.session import register_views


@dataclass
class QueryDef:
    name: str
    doc: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # DuckDB SQL; None => rows-only check
    tags: tuple = field(default=())


_REGISTRY: dict[str, QueryDef] = {}

# Driver-gate naming: the correctness driver samples registry keys that
# look like q<NN>_..., so every extension entry carries a pinned q-number
# prefix in its canonical key (e.g. ``q59_d01_text_stats``). The numbers
# are explicit — adding a query never renumbers an existing one — and
# the short name still resolves through ``get_query``/``registry``
# lookups via this map.
_DRIVER_PREFIX = {
    "c01_stratified_sample": "q51", "c02_train_val_test_split": "q52",
    "c03_chunk_documents": "q53", "c04_corpus_mixture": "q54",
    "c05_global_shuffle": "q55", "c06_pack_sequences": "q56",
    "c07_e2e_corpus_pipeline": "q57", "c08_token_budget_mix": "q58",
    "d01_text_stats": "q59", "d02_lang_id": "q60",
    "d03_fingerprint": "q61", "d04_exact_dup_clusters": "q62",
    "d05_dedup_keep_first": "q63", "d06_minhash_lsh_pairs": "q64",
    "d07_simhash": "q65", "d08_ngram_jaccard_pairs": "q66",
    "d09_bpe_token_count": "q67", "d10_quality_filter": "q68",
    "d11_neardup_clusters": "q69", "d12_vocabulary": "q70",
    "d13_hll_distinct": "q71", "d14_cms_token_counts": "q72",
    "d15_pii_redaction": "q73", "d16_boilerplate_removal": "q74",
    "d17_histogram_quantiles": "q75", "d18_repetition_score": "q76",
    "d19_decontamination": "q77",
    "d20_semantic_dedup": "q101", "d21_crossdoc_dup_fraction": "q102",
    "s09_ivf_probe_topk": "q103", "d22_duplicate_spans": "q104", "s10_knn_graph": "q105", "s11_multiprobe_ann_topk": "q106", "st08_windowed_topk_types": "q107", "d23_char_entropy": "q108", "d24_url_canonicalize": "q109", "d25_containment_pairs": "q110", "m05_perceptual_hash": "q111",
    "s12_ivf_probe_batched": "q112",
    "d26_keep_canonical": "q113", "d27_hashed_linear_score": "q114",
    "d28_trained_quality_score": "q115",
    "d29_dsir_resample": "q116",
    "d30_lm_perplexity": "q117",
    "st09_stream_quality_gate": "q118",
    "m06_png_decode": "q119",
    "m07_wav_decode": "q120",
    "m08_gif_frames": "q121",
    "d31_gopher_char_repetition": "q122",
    "m09_jpeg_decode": "q123",
    "d32_gopher_quality": "q124",
    "d33_c4_clean": "q125",
    "d34_domain_cap": "q126",
    "c09_curriculum_order": "q127",
    "s13_pq_adc_topk": "q128",
    "d35_domain_pagerank": "q129",
    "m10_audio_frame_features": "q130",
    "st10_stream_clean_gate": "q131",
    "c10_temperature_mix": "q132",
    "m11_video_frames": "q133",
    "st11_stream_signature_dedup": "q134",
    "m12_phash_neardup": "q135",
    "m13_pixel_resize": "q136",
    "d36_remove_duplicate_spans": "q137",
    "m01_asset_metadata": "q78", "m02_byte_features": "q79",
    "m03_frame_sample": "q80", "m04_image_decode": "q81",
    "s01_cosine_topk": "q82", "s02_cosine_pairs_blocked": "q83",
    "s03_rp_lsh_buckets": "q84", "s04_lsh_ann_topk": "q85",
    "s05_ivf_cells": "q86", "s06_bm25_topk": "q87",
    "s07_quantize_embeddings": "q88", "s08_kmeans_cells": "q89",
    "st01_windowed_event_stats": "q90", "st02_sessionize": "q91",
    "st03_stateful_user_counts": "q92", "st04_hierarchical_rollup": "q93",
    "st05_stream_dedup": "q94", "st06_stream_stream_join": "q95",
    "st07_running_user_totals": "q96",
    "t01_asof_join": "q97", "t02_range_join": "q98",
}

def _register(q: QueryDef) -> None:
    prefix = _DRIVER_PREFIX.get(q.name)
    if prefix:
        q.name = f"{prefix}_{q.name}"
    _REGISTRY[q.name] = q


def sql_query(name: str, doc: str, spark_sql: str, duck_sql: str | None = None) -> None:
    """Register a query given as SQL text (duck_sql defaults to spark_sql)."""

    def fn(spark: SparkSession, sf_dir: str, _sql=spark_sql) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(_sql)

    _register(QueryDef(name, doc, fn, duck_sql if duck_sql is not None else spark_sql))


def df_query(name: str, doc: str, duck_sql: str | None):
    """Decorator to register a DataFrame-API implementation."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _register(QueryDef(name, doc, fn, duck_sql))
        return fn

    return deco


def registry() -> dict[str, QueryDef]:
    return dict(_REGISTRY)


# ---------------------------------------------------------------------------
# Aggregation: GROUP BY + sum/avg/count   (QueryPlan.hs:146 Aggregate/Group)
# ---------------------------------------------------------------------------

_Q1 = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

sql_query(
    "q01_pricing_summary",
    "TPC-H Q1-style hash aggregate with decimal-exact sums/averages.",
    _Q1,
)

# ---------------------------------------------------------------------------
# Multi-way inner join + agg (hash join; QueryPlan.hs:157 HashJoin)
# ---------------------------------------------------------------------------

_Q2_ORACLE = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


@df_query(
    "q02_revenue_by_nation",
    "5-way inner join (fact + broadcast dims) with decimal-exact revenue.",
    _Q2_ORACLE,
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    register_views(spark, sf_dir)
    li = spark.table("lineitem")
    orders = spark.table("orders")
    cust = spark.table("customer")
    nation = spark.table("nation")
    region = spark.table("region").filter(F.col("r_name") == "ASIA")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Outer joins (left / right / full)
# ---------------------------------------------------------------------------

_Q3_ORACLE = """
SELECT c_custkey, c_name,
       COUNT(o_orderkey) AS n_orders,
       CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spend
FROM customer
LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
"""


@df_query(
    "q03_left_join_customer_orders",
    "LEFT OUTER join keeping order-less customers (COUNT over nullable key).",
    _Q3_ORACLE,
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    register_views(spark, sf_dir)
    cust = spark.table("customer")
    orders = spark.table("orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), F.lit(0))
            .cast("double")
            .alias("total_spend"),
        )
    )


sql_query(
    "q04_right_join",
    "RIGHT OUTER join: all nations retained against suppliers.",
    """
SELECT n_nationkey, n_name, COUNT(s_suppkey) AS n_suppliers
FROM supplier
RIGHT JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_nationkey, n_name
""",
)

sql_query(
    "q05_full_outer_join",
    "FULL OUTER join of customer-nation presence vs supplier-nation presence.",
    """
WITH cn AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey),
     sn AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey)
SELECT COALESCE(cn.nk, sn.nk) AS nationkey,
       COALESCE(n_cust, 0) AS n_cust,
       COALESCE(n_supp, 0) AS n_supp
FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
""",
)

# ---------------------------------------------------------------------------
# Semi / anti joins (QueryPlan.hs JoinSemi/JoinAnti)
# ---------------------------------------------------------------------------

_Q6_ORACLE = """
SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS c_acctbal
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 200000)
"""


@df_query(
    "q06_semi_join",
    "LEFT SEMI join: customers having at least one order > 200000.",
    _Q6_ORACLE,
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    register_views(spark, sf_dir)
    cust = spark.table("customer")
    big = spark.table("orders").filter(F.col("o_totalprice") > 200000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name", F.col("c_acctbal").cast("double").alias("c_acctbal")
    )


_Q7_ORACLE = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


@df_query(
    "q07_anti_join",
    "LEFT ANTI join: customers with no orders at all.",
    _Q7_ORACLE,
)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    cust = spark.table("customer")
    orders = spark.table("orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# ---------------------------------------------------------------------------
# Non-equi join (nested loop; QueryPlan.hs:166 NestedLoop)
# ---------------------------------------------------------------------------

_Q08_ORACLE = """
SELECT s_suppkey, COUNT(*) AS n_lower_nation_customers
FROM supplier JOIN customer ON s_nationkey < c_nationkey
GROUP BY s_suppkey
"""


@df_query(
    "q08_nonequi_join",
    "Inequality-only join predicate → nested loop, rewritten over the "
    "nationkey histogram: COUNT(*) per supplier depends only on "
    "s_nationkey, so the customer side collapses to ≤25 (nationkey, n) "
    "rows before the inequality join — the pair loop runs |supplier|×25 "
    "instead of |supplier|×|customer| (guide §3: shrink the build side "
    "before a nested-loop join).",
    _Q08_ORACLE,
)
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    register_views(spark, sf_dir)
    hist = (
        spark.table("customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    sup = spark.table("supplier")
    # inner-join semantics preserved: a supplier with no strictly
    # greater customer nationkey matches zero histogram rows and drops
    return (
        sup.join(F.broadcast(hist), sup.s_nationkey < hist.c_nationkey)
        .groupBy("s_suppkey")
        .agg(F.sum("__n").alias("n_lower_nation_customers"))
    )

# ---------------------------------------------------------------------------
# Window functions (QueryPlan.hs:176 WindowAgg; dplyrlagoon.r:112-131)
# ---------------------------------------------------------------------------

_Q9_ORACLE = """
SELECT o_orderpriority, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice, rk
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
) t
WHERE rk <= 3
"""


@df_query(
    "q09_window_topk_per_group",
    "rank() over partition, top-3 per group (deterministic tiebreak).",
    _Q9_ORACLE,
)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    register_views(spark, sf_dir)
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        spark.table("orders")
        .withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "rk",
        )
    )


_Q10_ORACLE = """
SELECT user_id, event_id,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
FROM events
"""


@df_query(
    "q10_window_running_sum",
    "Cumulative frame (ROWS UNBOUNDED PRECEDING..CURRENT) + row_number.",
    _Q10_ORACLE,
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    register_views(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return spark.table("events").select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("double")
        .alias("running_value"),
        F.row_number().over(w).alias("rn"),
    )


sql_query(
    "q11_window_lag_lead",
    "lag/lead navigation over ordered partitions.",
    """
SELECT user_id, event_id,
       CAST(value AS DOUBLE) AS value,
       CAST(value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE) AS delta_prev,
       LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
FROM events
""",
)

# ---------------------------------------------------------------------------
# DISTINCT / sort / limit / offset (QueryPlan.hs:174 Unique, :171 Sort, :160 Limit)
# ---------------------------------------------------------------------------

sql_query(
    "q12_distinct",
    "DISTINCT over a projection.",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)

sql_query(
    "q13_sort_limit_offset",
    "Total-order sort with LIMIT and OFFSET.",
    """
SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20 OFFSET 10
""",
)

# ---------------------------------------------------------------------------
# Set operations (QueryPlan.hs:147,163,170 Append/SetOp)
# ---------------------------------------------------------------------------

sql_query(
    "q14_union_all",
    "UNION ALL then re-aggregate.",
    """
SELECT key_side, COUNT(*) AS n FROM (
  SELECT c_nationkey AS nk, 'cust' AS key_side FROM customer
  UNION ALL
  SELECT s_nationkey AS nk, 'supp' AS key_side FROM supplier
) u GROUP BY key_side
""",
)

sql_query(
    "q15_union_distinct",
    "UNION (distinct) of two key sets.",
    """
SELECT nk FROM (
  SELECT c_nationkey AS nk FROM customer
  UNION
  SELECT s_nationkey AS nk FROM supplier
) u
""",
)

sql_query(
    "q16_intersect",
    "INTERSECT of nation-key sets.",
    """
SELECT c_nationkey AS nk FROM customer
INTERSECT
SELECT s_nationkey AS nk FROM supplier
""",
)

sql_query(
    "q17_except",
    "EXCEPT: nations with customers but no suppliers.",
    """
SELECT c_nationkey AS nk FROM customer
EXCEPT
SELECT s_nationkey AS nk FROM supplier
""",
)

sql_query(
    "q18_intersect_all",
    "INTERSECT ALL (multiset semantics) on order-priority rows.",
    """
SELECT o_orderpriority FROM orders WHERE o_totalprice > 150000
INTERSECT ALL
SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
""",
)

sql_query(
    "q19_except_all",
    "EXCEPT ALL (multiset semantics).",
    """
SELECT o_orderpriority FROM orders WHERE o_totalprice > 150000
EXCEPT ALL
SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
""",
)

# ---------------------------------------------------------------------------
# CTEs and subqueries (QueryPlan.hs:153 CteScan, :172 SubqueryScan)
# ---------------------------------------------------------------------------

sql_query(
    "q20_cte",
    "WITH clause (CTE) reused twice.",
    """
WITH big_orders AS (
  SELECT o_custkey, COUNT(*) AS n_big
  FROM orders WHERE o_totalprice > 150000 GROUP BY o_custkey
)
SELECT n_big, COUNT(*) AS n_customers
FROM big_orders
GROUP BY n_big
""",
)

sql_query(
    "q21_scalar_subquery",
    "Scalar subquery in WHERE (decimal-exact avg so selection matches).",
    """
SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal
FROM customer
WHERE c_acctbal > (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM customer
)
""",
)

sql_query(
    "q22_correlated_exists",
    "Correlated EXISTS subquery (decorrelated by Catalyst into a semi join).",
    """
SELECT o_orderkey, o_orderstatus
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 49
)
""",
)

sql_query(
    "q23_in_subquery",
    "IN (subquery) membership predicate.",
    """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
""",
)

# ---------------------------------------------------------------------------
# Aggregate function breadth (dplyrlagoon.r:101-111):
# corr/covar/stddev/var via exact closed forms; bool_and/bool_or; string_agg.
# ---------------------------------------------------------------------------

_Q24 = """
SELECT event_type,
       n,
       sum_v,
       -- sample variance/stddev/covariance from exact decimal moments:
       -- (sxx - sx^2/n)/(n-1); rounded to 6 decimals because the final
       -- DECIMAL→DOUBLE cast of the high-scale moments can differ by
       -- 1 ulp between engines when the unscaled value exceeds 2^53
       ROUND((sxx - sx * sx / n) / (n - 1), 6) AS var_v,
       ROUND(SQRT((sxx - sx * sx / n) / (n - 1)), 6) AS stddev_v,
       ROUND((sxu - sx * su / n) / (n - 1), 6) AS covar_vu
FROM (
  SELECT event_type,
         COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_v,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(value AS DECIMAL(18,6)) * user_id) AS DOUBLE) AS sxu,
         CAST(SUM(CAST(user_id AS DECIMAL(18,0))) AS DOUBLE) AS su
  FROM events
  GROUP BY event_type
) m
"""

sql_query(
    "q24_stats_aggregates",
    "variance/stddev/covariance via exact decimal moment sums (order-independent).",
    _Q24,
)

sql_query(
    "q25_bool_aggregates",
    "bool_and / bool_or aggregate functions.",
    """
SELECT event_type,
       BOOL_AND(value > 1.0) AS all_above_1,
       BOOL_OR(value > 99.0) AS any_above_99
FROM events
GROUP BY event_type
""",
)

sql_query(
    "q26_string_agg",
    "Ordered string aggregation (reference: string_agg via dplyr).",
    """
SELECT n_name,
       ARRAY_JOIN(ARRAY_SORT(COLLECT_LIST(c_name)), ',') AS members
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > 9900
GROUP BY n_name
""",
    """
SELECT n_name,
       STRING_AGG(c_name, ',' ORDER BY c_name) AS members
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > 9900
GROUP BY n_name
""",
)

# ---------------------------------------------------------------------------
# HAVING / CASE / conditional aggregation / ROLLUP
# ---------------------------------------------------------------------------

sql_query(
    "q27_having",
    "Post-aggregation filter (HAVING).",
    """
SELECT o_custkey, COUNT(*) AS n
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 15
""",
)

sql_query(
    "q28_case_conditional_agg",
    "CASE WHEN inside aggregates (pivot-style conditional aggregation).",
    """
SELECT l_returnflag,
       SUM(CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END) AS n_high_disc,
       SUM(CASE WHEN l_discount <  0.05 THEN 1 ELSE 0 END) AS n_low_disc,
       CAST(SUM(CASE WHEN l_tax > 0.04 THEN CAST(l_extendedprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS taxed_price
FROM lineitem
GROUP BY l_returnflag
""",
    """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_disc,
       CAST(SUM(CASE WHEN l_discount <  0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_low_disc,
       CAST(SUM(CASE WHEN l_tax > 0.04 THEN CAST(l_extendedprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS taxed_price
FROM lineitem
GROUP BY l_returnflag
""",
)

sql_query(
    "q29_rollup",
    "GROUP BY ROLLUP (hierarchical subtotals).",
    """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)

# ---------------------------------------------------------------------------
# VALUES scan (QueryPlan.hs:175 ValuesScan)
# ---------------------------------------------------------------------------

sql_query(
    "q30_values_scan",
    "Inline VALUES relation joined to a table.",
    """
SELECT m.label, COUNT(*) AS n
FROM nation
JOIN (VALUES (0, 'rest'), (1, 'rest'), (2, 'focus'), (3, 'rest'), (4, 'rest'))
  AS m(rk, label)
ON n_regionkey = m.rk
GROUP BY m.label
""",
)

# ---------------------------------------------------------------------------
# Table functions / explode (QueryPlan.hs:154 FunctionScan)
# ---------------------------------------------------------------------------

sql_query(
    "q31_explode_array",
    "Array explode / unnest of the embedding vectors.",
    """
SELECT vec_id, CAST(e AS DOUBLE) AS component
FROM embeddings
LATERAL VIEW EXPLODE(embedding) AS e
WHERE vec_id < 5
""",
    """
SELECT vec_id, CAST(UNNEST(embedding) AS DOUBLE) AS component
FROM embeddings
WHERE vec_id < 5
""",
)

# ---------------------------------------------------------------------------
# JSON access (reference JSON operators, dplyrlagoon.r:88-100)
# ---------------------------------------------------------------------------

sql_query(
    "q32_json_extract",
    "JSON field extraction from a JSON-typed text column.",
    """
SELECT CAST(GET_JSON_OBJECT(props, '$.k') AS BIGINT) % 10 AS k_mod,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY CAST(GET_JSON_OBJECT(props, '$.k') AS BIGINT) % 10
""",
    """
SELECT CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) % 10 AS k_mod,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) % 10
""",
)

# ---------------------------------------------------------------------------
# Scalar function surface: strings, dates, math
# ---------------------------------------------------------------------------

sql_query(
    "q33_string_functions",
    "String scalar functions: upper/substr/length/replace/concat/trim.",
    """
SELECT p_partkey,
       UPPER(p_brand) AS brand_u,
       SUBSTR(p_name, 1, 8) AS name_prefix,
       LENGTH(p_name) AS name_len,
       REPLACE(p_type, ' ', '_') AS type_snake,
       p_brand || ':' || p_type AS brand_type
FROM part
WHERE p_size BETWEEN 10 AND 20
""",
)

sql_query(
    "q34_date_functions",
    "Date part extraction and grouping on timestamps.",
    """
SELECT YEAR(o_orderdate) AS yr, MONTH(o_orderdate) AS mo,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY YEAR(o_orderdate), MONTH(o_orderdate)
""",
)

sql_query(
    "q35_math_functions",
    "Math scalar functions: round/floor/ceil/abs/power/mod.",
    """
SELECT l_linenumber,
       CAST(ROUND(AVG_D, 2) AS DOUBLE) AS avg_rounded,
       CAST(FLOOR(AVG_D) AS DOUBLE) AS avg_floor,
       CAST(CEIL(AVG_D) AS DOUBLE) AS avg_ceil
FROM (
  SELECT l_linenumber,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS AVG_D
  FROM lineitem GROUP BY l_linenumber
) t
""",
    """
SELECT l_linenumber,
       CAST(ROUND(AVG_D, 2) AS DOUBLE) AS avg_rounded,
       CAST(FLOOR(AVG_D) AS DOUBLE) AS avg_floor,
       CAST(CEIL(AVG_D) AS DOUBLE) AS avg_ceil
FROM (
  SELECT l_linenumber,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS AVG_D
  FROM lineitem GROUP BY l_linenumber
) t
""",
)

sql_query(
    "q36_cross_join",
    "Cartesian product of small dims.",
    """
SELECT r_name, n_name
FROM region CROSS JOIN nation
WHERE n_regionkey <> r_regionkey AND n_nationkey < 5 AND r_regionkey < 3
""",
)


# ---------------------------------------------------------------------------
# Postgres JSON operator family (`dplyrlagoon.r:88-100`): @>, ?, ->
# ---------------------------------------------------------------------------

_Q37_ORACLE = """
SELECT event_type,
       COUNT(*) AS n_contains
FROM events
WHERE json_contains(props, '{"k": 7}')
GROUP BY event_type
"""


def _q37(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from lagoon_spark.functions.json_ops import filter_jsonb_contains

    register_views(spark, sf_dir)
    return (
        filter_jsonb_contains(spark.table("events"), "props", '{"k": 7}')
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_contains"))
    )


_register(
    QueryDef(
        "q37_json_containment",
        "Postgres @> structural containment over a JSON column (vectorized shim).",
        _q37,
        _Q37_ORACLE,
    )
)


_Q38_ORACLE = """
SELECT event_type,
       CAST(SUM(CASE WHEN list_contains(json_keys(props), 'k') THEN 1 ELSE 0 END)
            AS BIGINT) AS n_has_k,
       CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
                THEN 1 ELSE 0 END) AS BIGINT) AS n_big_k
FROM events
GROUP BY event_type
"""


def _q38(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from lagoon_spark.functions import json_get_text, jsonb_exists

    register_views(spark, sf_dir)
    return (
        spark.table("events")
        .groupBy("event_type")
        .agg(
            F.sum(F.when(jsonb_exists("props", "k"), 1).otherwise(0)).alias("n_has_k"),
            F.sum(
                F.when(json_get_text("props", "k").cast("bigint") > 50, 1).otherwise(0)
            ).alias("n_big_k"),
        )
    )


_register(
    QueryDef(
        "q38_json_key_ops",
        "Postgres ? key-existence and ->> extraction operators (JVM-side shims).",
        _q38,
        _Q38_ORACLE,
    )
)


# jsonb modifiers (`-`, `||`; `functions/json_ops.py` also ships `#-`).
# Raw modifier output is engine-canonical text, so the comparison rides
# extraction (sorted key list + one extracted value), never raw bytes.
# the object guard pins the comparison to the shapes where Spark's
# PG-semantics modifiers and DuckDB's json_merge_patch agree (on a
# JSON array `||`/merge_patch genuinely differ, and NULL props would
# group as '' in Spark vs NULL in DuckDB)
_Q100_ORACLE = """
WITH m AS (
  SELECT json_merge_patch(json_merge_patch(props, '{"k":null}'), '{"z":"w"}') AS stamped
  FROM events
  WHERE props IS NOT NULL AND ltrim(props) LIKE '{%'
)
SELECT array_to_string(list_sort(json_keys(stamped)), ',') AS keys_after,
       json_extract_string(stamped, '$.z') AS z,
       COUNT(*) AS n
FROM m GROUP BY keys_after, z
"""


def _q100(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from lagoon_spark.functions import jsonb_concat, jsonb_delete_key
    from lagoon_spark.functions.json_ops import jsonb_map_and_gate

    register_views(spark, sf_dir)
    # the `{%` filter below guarantees object documents, admitting the
    # pure-JVM modifier tier (no Python worker in the plan)
    stamped = jsonb_concat(
        jsonb_delete_key(F.col("props"), "k", object_only=True),
        '{"z":"w"}',
        object_only=True,
    )
    # the comparison rides extraction (sorted keys + one value), so it
    # reads the chain's UNSERIALIZED map: the old shape serialized the
    # merged map to canonical text and re-parsed it twice (once per
    # extractor). Extraction semantics are unchanged — the map is NULL
    # exactly when the text was (keys_after then groups as '' through
    # concat_ws, z as NULL), key sets match the canonical text's, and
    # the merged 'z' variant renders the same string.
    m, _gate = jsonb_map_and_gate(stamped)
    return (
        spark.table("events")
        .filter(
            F.col("props").isNotNull() & F.ltrim(F.col("props")).startswith("{")
        )
        .select(
            F.concat_ws(",", F.sort_array(F.map_keys(m))).alias("keys_after"),
            F.try_variant_get(
                F.try_element_at(m, F.lit("z")), "$", "string"
            ).alias("z"),
        )
        .groupBy("keys_after", "z")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_register(
    QueryDef(
        "q100_jsonb_modifiers",
        "Postgres jsonb modifier operators - and || (delete key, shallow merge).",
        _q100,
        _Q100_ORACLE,
    )
)


# ---------------------------------------------------------------------------
# Recursive CTE (QueryPlan.hs:167 RecursiveUnion) — Spark has none;
# the Spark-native pattern is a driver-controlled iterative union with
# a fixpoint test. Each iteration is a distributed map; the driver only
# checks emptiness.
# ---------------------------------------------------------------------------

_Q39_ORACLE = """
WITH RECURSIVE anc AS (
  SELECT n_nationkey AS node, n_nationkey // 2 AS anc FROM nation WHERE n_nationkey > 0
  UNION ALL
  SELECT node, anc // 2 FROM anc WHERE anc > 0
)
SELECT node, anc FROM anc
"""


def _q39(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    base = (
        spark.table("nation")
        .selectExpr("n_nationkey AS node", "n_nationkey DIV 2 AS anc")
        .filter("node > 0")
    )
    acc = base
    frontier = base
    # fixpoint loop — ancestor chains halve each step, so depth is
    # O(log max_key); each step is a narrow map over the frontier only
    while True:
        frontier = frontier.filter("anc > 0").selectExpr("node", "anc DIV 2 AS anc")
        if frontier.isEmpty():
            break
        acc = acc.unionByName(frontier)
    return acc


_register(
    QueryDef(
        "q39_recursive_ancestors",
        "Recursive CTE (ancestor closure) as a driver-controlled iterative union with fixpoint.",
        _q39,
        _Q39_ORACLE,
    )
)

# Native WITH RECURSIVE (Spark 4 RecursiveUnion; reference surface
# QueryPlan.hs:167 RecursiveUnion). Same ancestor closure as q39, but
# expressed as SQL text — the form a /sql user would POST — instead of
# the driver-controlled fixpoint loop.
sql_query(
    "q99_recursive_cte_sql",
    "WITH RECURSIVE ancestor closure as native SQL (RecursiveUnion).",
    """
WITH RECURSIVE anc AS (
  SELECT n_nationkey AS node, n_nationkey DIV 2 AS anc FROM nation WHERE n_nationkey > 0
  UNION ALL
  SELECT node, anc DIV 2 FROM anc WHERE anc > 0
)
SELECT node, anc FROM anc
""",
    """
WITH RECURSIVE anc AS (
  SELECT n_nationkey AS node, n_nationkey // 2 AS anc FROM nation WHERE n_nationkey > 0
  UNION ALL
  SELECT node, anc // 2 FROM anc WHERE anc > 0
)
SELECT node, anc FROM anc
""",
)

# ---------------------------------------------------------------------------
# Ranking window-function family (QueryPlan.hs:176 WindowAgg;
# dplyrlagoon.r:112-131 window variants)
# ---------------------------------------------------------------------------

sql_query(
    "q40_rank_family",
    "rank/dense_rank/percent_rank/cume_dist/ntile over one shared window sort.",
    """
SELECT l_orderkey, l_linenumber,
       RANK() OVER w AS rnk,
       DENSE_RANK() OVER w AS drnk,
       PERCENT_RANK() OVER w AS prnk,
       CUME_DIST() OVER w AS cd,
       NTILE(4) OVER w AS tile
FROM lineitem
WINDOW w AS (PARTITION BY l_linenumber ORDER BY l_quantity, l_orderkey)
""",
)

# ---------------------------------------------------------------------------
# CUBE grouping sets (Aggregate/Group family; beyond q29's ROLLUP)
# ---------------------------------------------------------------------------

# Spark side pre-aggregates: COUNT/SUM re-aggregate exactly (decimal
# sums are exact), so the CUBE's 4-way Expand runs over the ≤|rf×ls|
# pre-aggregate instead of multiplying every lineitem row by 4 (guide
# §2.3: aggregate before you shuffle/expand). GROUPING() markers come
# from the outer CUBE and are unchanged; data NULLs stay group keys in
# the pre-aggregate. The DuckDB oracle keeps the single-level form.
sql_query(
    "q41_cube",
    "CUBE over (returnflag, linestatus) with GROUPING() markers and exact decimal sums.",
    """
WITH pre AS (
  SELECT l_returnflag, l_linestatus,
         COUNT(*) AS pn,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS pq
  FROM lineitem
  GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus,
       SUM(pn) AS n,
       CAST(SUM(pq) AS DOUBLE) AS sum_qty,
       GROUPING(l_returnflag) AS g_rf,
       GROUPING(l_linestatus) AS g_ls
FROM pre
GROUP BY CUBE(l_returnflag, l_linestatus)
""",
    """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       GROUPING(l_returnflag) AS g_rf,
       GROUPING(l_linestatus) AS g_ls
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
""",
)


# ---------------------------------------------------------------------------
# Unpivot / melt (the A25 multi-part-ingest building block, exposed as
# a first-class relational operator)
# ---------------------------------------------------------------------------

_Q42_ORACLE = """
SELECT o_orderkey, measure, CAST(val AS DOUBLE) AS val
FROM (SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price,
             CAST(o_custkey AS DOUBLE) AS custkey
      FROM orders WHERE o_orderkey < 100)
UNPIVOT (val FOR measure IN (price, custkey))
"""


def _q42(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    register_views(spark, sf_dir)
    base = (
        spark.table("orders")
        .filter("o_orderkey < 100")
        .select(
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("price"),
            F.col("o_custkey").cast("double").alias("custkey"),
        )
    )
    return base.unpivot(
        ["o_orderkey"], ["price", "custkey"], "measure", "val"
    )


_register(
    QueryDef(
        "q42_unpivot",
        "Unpivot/melt wide measures into (key, measure, value) rows.",
        _q42,
        _Q42_ORACLE,
    )
)


# ---------------------------------------------------------------------------
# Pivot (wide conditional aggregation)
# ---------------------------------------------------------------------------

_Q43_ORACLE = """
SELECT l_linenumber,
       CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_A,
       CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_N,
       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_R
FROM lineitem
GROUP BY l_linenumber
"""


def _q43(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    register_views(spark, sf_dir)
    return (
        spark.table("lineitem")
        .groupBy("l_linenumber")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"))
        .select(
            "l_linenumber",
            F.col("A").alias("qty_A"),
            F.col("N").alias("qty_N"),
            F.col("R").alias("qty_R"),
        )
    )


_register(
    QueryDef(
        "q43_pivot",
        "Pivot long→wide: per-linenumber quantity sums split by return flag.",
        _q43,
        _Q43_ORACLE,
    )
)

# ---------------------------------------------------------------------------
# Exact percentiles (quantile_cont family)
# ---------------------------------------------------------------------------
# l_quantity is integer-valued, so interpolated quantiles land on exact
# quarters — bitwise-identical across engines.

sql_query(
    "q44_percentiles",
    "Exact continuous percentiles (p25/p50/p75) of quantity per line number.",
    """
SELECT l_linenumber,
       PERCENTILE(l_quantity, 0.25) AS p25,
       PERCENTILE(l_quantity, 0.5) AS p50,
       PERCENTILE(l_quantity, 0.75) AS p75
FROM lineitem
GROUP BY l_linenumber
""",
    """
SELECT l_linenumber,
       quantile_cont(l_quantity, 0.25) AS p25,
       quantile_cont(l_quantity, 0.5) AS p50,
       quantile_cont(l_quantity, 0.75) AS p75
FROM lineitem
GROUP BY l_linenumber
""",
)


# ---------------------------------------------------------------------------
# Explicit GROUPING SETS (generalizes q29 ROLLUP / q41 CUBE)
# ---------------------------------------------------------------------------

_Q45 = """
SELECT l_returnflag,
       l_linestatus,
       GROUPING(l_returnflag) AS g_flag,
       GROUPING(l_linestatus) AS g_status,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus), ())
"""

# Spark side pre-aggregates by (rf, ls) first — the 4-way Expand then
# runs over the tiny pre-aggregate, not over every lineitem row
# (guide §2.3); COUNT/decimal-SUM re-aggregate exactly, the oracle
# keeps the single-level form.
_Q45_SPARK = """
WITH pre AS (
  SELECT l_returnflag, l_linestatus,
         COUNT(*) AS pn,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS pq
  FROM lineitem
  GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag,
       l_linestatus,
       GROUPING(l_returnflag) AS g_flag,
       GROUPING(l_linestatus) AS g_status,
       CAST(SUM(pq) AS DOUBLE) AS sum_qty,
       SUM(pn) AS n_rows
FROM pre
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus), ())
"""

sql_query(
    "q45_grouping_sets",
    "Explicit GROUPING SETS with GROUPING() markers (Aggregate/Group family).",
    _Q45_SPARK,
    _Q45,
)

# ---------------------------------------------------------------------------
# Value-based RANGE window frame (WindowAgg family, peer semantics)
# ---------------------------------------------------------------------------
# RANGE frames are value-based: all peers of the current o_totalprice are
# in or out together, so the count is deterministic regardless of tie
# order — no tiebreak column needed.

_Q46 = """
SELECT o_orderkey,
       o_custkey,
       COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                      RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS n_close
FROM orders
"""

sql_query(
    "q46_window_range_frame",
    "Value-based RANGE window frame: orders within a 1000-unit price band per customer.",
    _Q46,
)

# ---------------------------------------------------------------------------
# Correlated LATERAL subquery (top-2 orders per customer)
# ---------------------------------------------------------------------------

_Q47 = """
SELECT c_custkey, t.o_orderkey, t.o_totalprice
FROM customer,
LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders
  WHERE o_custkey = c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) t
"""

sql_query(
    "q47_lateral_topn",
    "Correlated LATERAL subquery: per-customer top-2 orders by price.",
    _Q47,
)


sql_query(
    "q48_variant_json",
    "Spark 4 VariantType JSON access: parse_json + typed variant_get "
    "(the open-format binary JSON column SURVEY §1.2 maps ColJSON to on "
    "Spark 4); try_variant_get on a missing path exercises NULL-safety.",
    """
SELECT v.kv % 7 AS k_mod,
       COUNT(*) AS n,
       MIN(v.kv) AS min_k,
       MAX(v.kv) AS max_k,
       SUM(CASE WHEN v.av IS NULL THEN 1 ELSE 0 END) AS n_missing
FROM events
LATERAL VIEW EXPLODE(ARRAY(STRUCT(
    VARIANT_GET(PARSE_JSON(props), '$.k', 'bigint') AS kv,
    TRY_VARIANT_GET(PARSE_JSON(props), '$.absent', 'string') AS av))) t AS v
GROUP BY v.kv % 7
""",
    """
SELECT CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) % 7 AS k_mod,
       COUNT(*) AS n,
       MIN(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS max_k,
       CAST(SUM(CASE WHEN JSON_EXTRACT_STRING(props, '$.absent') IS NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
FROM events
GROUP BY CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) % 7
""",
)


sql_query(
    "q49_funnel",
    "Ordered conversion funnel (view -> click -> purchase by first-occurrence "
    "time per user): one conditional-aggregation pass, no self-joins — the "
    "scalable funnel shape (a 3-way self-join would shuffle the events table "
    "three times; this shuffles once on user_id with map-side combine).",
    """
WITH stages AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT COUNT(CASE WHEN t_view IS NOT NULL THEN 1 END) AS n_view,
       COUNT(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                  THEN 1 END) AS n_view_click,
       COUNT(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                   AND t_purchase > t_click THEN 1 END) AS n_funnel_complete,
       COUNT(*) AS n_users
FROM stages
""",
)


_Q50_ORACLE = """
WITH days AS (
  SELECT user_id, CAST(ts AS DATE) AS d FROM events
),
first AS (
  SELECT user_id, CAST(date_trunc('week', MIN(d)) AS DATE) AS cohort_week
  FROM days GROUP BY user_id
),
activity AS (
  SELECT DISTINCT f.cohort_week, dy.user_id,
         CAST((dy.d - f.cohort_week) // 7 AS INTEGER) AS week_offset
  FROM days dy JOIN first f ON f.user_id = dy.user_id
)
SELECT cohort_week, week_offset,
       COUNT(DISTINCT user_id) AS n_active_users
FROM activity GROUP BY cohort_week, week_offset
"""


@df_query(
    "q50_cohort_retention",
    "Cohort retention: users grouped by first-activity week, counted per "
    "active week offset — two shuffles on user_id (first-touch agg + "
    "activity distinct), both map-side combinable.",
    _Q50_ORACLE,
)
def q50(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    register_views(spark, sf_dir)
    days = spark.table("events").select(
        "user_id", F.col("ts").cast("date").alias("d")
    )
    first = days.groupBy("user_id").agg(
        F.date_trunc("week", F.min("d")).cast("date").alias("cohort_week")
    )
    activity = (
        days.join(first, "user_id")
        .select(
            "cohort_week",
            "user_id",
            F.floor(F.datediff("d", "cohort_week") / 7).cast("int").alias(
                "week_offset"
            ),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct("user_id").alias("n_active_users")
    )


def get_query(name: str) -> QueryDef:
    """Fetch by canonical key or by the extension short name."""
    if name in _REGISTRY:
        return _REGISTRY[name]
    prefix = _DRIVER_PREFIX.get(name)
    if prefix:
        return _REGISTRY[f"{prefix}_{name}"]
    raise KeyError(name)


# register the training-data pipeline queries (import side effect; the
# module imports sql_query/df_query from here, which are defined above)
from lagoon_spark import pipeline_queries  # noqa: E402,F401  (circular-safe)
from lagoon_spark import multimodal_queries  # noqa: E402,F401
from lagoon_spark import streaming_queries  # noqa: E402,F401
from lagoon_spark import corpus_queries  # noqa: E402,F401
from lagoon_spark import temporal_queries  # noqa: E402,F401
