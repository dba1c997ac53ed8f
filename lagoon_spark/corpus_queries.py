"""Corpus-assembly queries (c01-c06): the training-data operations a
100 TB pipeline runs after cleaning — deterministic sampling, holdout
splits, chunking, corpus mixing, global shuffle, sequence packing.

Every query is oracle-gated: the keep/split/order decisions are pure
integer functions of the row id (operators/corpus.py), so DuckDB
computes the identical result with plain SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lagoon_spark.operators import corpus
from lagoon_spark.queries import df_query
from lagoon_spark.session import register_views

_BUCKET = corpus.duck_id_bucket("doc_id")

# ---------------------------------------------------------------------------
# c01 — stratified sampling (per-language rates, hash-bucket determinism)
# ---------------------------------------------------------------------------

_C01_RATES = {"en": 85, "zh": 60, "de": 40, "fr": 40, "es": 40}
_C01_DEFAULT = 20

_C01_CASE = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in sorted(_C01_RATES.items()))
    + f" ELSE {_C01_DEFAULT} END"
)

_C01_ORACLE = f"""
SELECT doc_id, lang, {_BUCKET} AS sample_bucket
FROM documents
WHERE {_BUCKET} < {_C01_CASE}
"""


@df_query(
    "c01_stratified_sample",
    "Stratified corpus sampling: per-language keep rates via stable hash buckets (no RNG).",
    _C01_ORACLE,
)
def c01(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "lang")
    return corpus.stratified_sample(docs, "doc_id", "lang", _C01_RATES, _C01_DEFAULT)


# ---------------------------------------------------------------------------
# c02 — train/val/test split (stable holdout assignment)
# ---------------------------------------------------------------------------

_C02_ORACLE = f"""
SELECT doc_id,
       CASE WHEN {_BUCKET} < 80 THEN 'train'
            WHEN {_BUCKET} < 90 THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


@df_query(
    "c02_train_val_test_split",
    "Deterministic train/val/test assignment by id hash bucket (stable across runs/engines).",
    _C02_ORACLE,
)
def c02(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id")
    return corpus.train_val_test_split(docs, "doc_id").select("doc_id", "split")


# ---------------------------------------------------------------------------
# c03 — document chunking into token windows (size 64, stride 32)
# ---------------------------------------------------------------------------

_C03_ORACLE = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS toks
  FROM documents
),
s AS (
  SELECT doc_id, toks, unnest(range(0, len(toks), 32)) AS st
  FROM t WHERE len(toks) > 0
)
SELECT doc_id,
       CAST(st // 32 AS INTEGER) AS chunk_idx,
       CAST(len(toks[st + 1 : st + 64]) AS INTEGER) AS n_chunk_tokens,
       array_to_string(toks[st + 1 : st + 64], ' ') AS chunk_text
FROM s
"""


@df_query(
    "c03_chunk_documents",
    "Explode documents into overlapping 64-token windows with stride 32 (row-local, no shuffle).",
    _C03_ORACLE,
)
def c03(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text")
    return corpus.chunk_tokens(docs, "doc_id", "text", size=64, stride=32)


# ---------------------------------------------------------------------------
# c04 — corpus mixture: per-source sampling rates + mixture report
# ---------------------------------------------------------------------------

# rate is a pure function of the source id digits: 15 + 5 * (num % 10)
_C04_RATE_DUCK = "15 + 5 * (CAST(substr(source, 4) AS BIGINT) % 10)"

_C04_ORACLE = f"""
SELECT source,
       COUNT(*) AS n_total,
       SUM(CASE WHEN {_BUCKET} < {_C04_RATE_DUCK} THEN 1 ELSE 0 END) AS n_kept,
       SUM(CASE WHEN {_BUCKET} < {_C04_RATE_DUCK} THEN n_chars ELSE 0 END) AS chars_kept
FROM documents
GROUP BY source
"""


@df_query(
    "c04_corpus_mixture",
    "Weighted corpus mixing: per-source keep rates with a kept/total mixture report.",
    _C04_ORACLE,
)
def c04(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "source", "n_chars")
    rate = 15 + 5 * (F.pmod(F.substring("source", 4, 16).cast("long"), F.lit(10)))
    kept = (corpus.id_bucket("doc_id") < rate).cast("long")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(kept).alias("n_kept"),
        F.sum(kept * F.col("n_chars")).alias("chars_kept"),
    )


# ---------------------------------------------------------------------------
# c05 — deterministic global shuffle (total order by id hash)
# ---------------------------------------------------------------------------

_C05_ORACLE = f"""
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY {corpus.duck_id_hash('doc_id')}, doc_id) AS BIGINT)
         AS shuffle_pos
FROM documents
"""


@df_query(
    "c05_global_shuffle",
    "Deterministic global training-order shuffle: range-partitioned sort by hash(id).",
    _C05_ORACLE,
)
def c05(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id")
    from lagoon_spark.checkpointing import pin_handles

    out, _pinned = corpus.global_shuffle(docs, "doc_id")
    out = pin_handles(out, _pinned)
    return out


# ---------------------------------------------------------------------------
# c06 — sequence packing: global token offsets + fixed-budget bins
# ---------------------------------------------------------------------------

_C06_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT) AS n_tokens,
         {corpus.duck_id_hash('doc_id')} AS h
  FROM documents
)
SELECT doc_id, n_tokens,
       COALESCE(SUM(n_tokens) OVER (ORDER BY h, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_offset,
       COALESCE(SUM(n_tokens) OVER (ORDER BY h, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 1024 AS bin_id
FROM t
"""


@df_query(
    "c06_pack_sequences",
    "Sequence packing: concat-order token offsets and 1024-token bin ids over the shuffled order.",
    _C06_ORACLE,
)
def c06(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text")
    # the pinned frame must outlive the caller's collect (unpersisting
    # early would resample the range boundaries under the numbering);
    # once the returned DF is collected and dropped, ContextCleaner
    # reclaims the (metadata-sized) checkpoint blocks
    from lagoon_spark.checkpointing import pin_handles

    out, _pinned = corpus.pack_token_offsets(docs, "doc_id", "text", budget=1024)
    out = pin_handles(out, _pinned)
    return out


# ---------------------------------------------------------------------------
# c08 — token-budget mixing: per-source cumulative cutoff
# ---------------------------------------------------------------------------

_C08_BUDGET = 600

_C08_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source,
         CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT) AS n_tokens,
         {corpus.duck_id_hash('doc_id')} AS h
  FROM documents
),
o AS (
  SELECT doc_id, source, n_tokens,
         COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS src_tok_offset
  FROM t
)
SELECT doc_id, source, n_tokens, src_tok_offset
FROM o WHERE src_tok_offset < {_C08_BUDGET}
"""


@df_query(
    "c08_token_budget_mix",
    "Token-budget corpus mixing: per-source running-sum cutoff in deterministic "
    "shuffled order (how a '2B tokens of web, 500M of code' mixture spec is realized).",
    _C08_ORACLE,
)
def c08(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "source", "text")
    return corpus.token_budget_sample(
        docs, "doc_id", "text", "source", budget=_C08_BUDGET
    )


# ---------------------------------------------------------------------------
# c07 — the end-to-end corpus pipeline, composed from the operator library
# ---------------------------------------------------------------------------
#
# normalize → quality-filter → exact-dedup → split → chunk, as ONE
# DataFrame plan (Catalyst sees the whole pipeline: the normalize and
# filter stages fuse into the scan, dedup is the only wide shuffle
# before chunking's row-local explode). This is the shape of a real
# 100 TB pretraining-data job; the oracle mirrors every stage as a CTE.

_C07_ORACLE = f"""
WITH cleaned AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
  FROM documents
),
stats AS (
  SELECT doc_id, t,
         len(list_filter(string_split(t, ' '), w -> w <> '')) AS n_tokens,
         round((length(t) - (len(string_split(t, ' ')) - 1))
               / greatest(len(list_filter(string_split(t, ' '), w -> w <> '')), 1), 6) AS mtl,
         round(len(list_filter(string_split(t, ' '),
               w -> list_contains(['the','a','of','and','is','to','in'], w)))
               / greatest(len(list_filter(string_split(t, ' '), w -> w <> '')), 1), 6) AS swr
  FROM cleaned
),
quality AS (
  SELECT doc_id, t FROM stats
  WHERE n_tokens BETWEEN 10 AND 1000
    AND mtl BETWEEN 2.0 AND 12.0
    AND swr >= 0.01
),
dedup AS (
  SELECT doc_id, t FROM (
    SELECT doc_id, t, MIN(doc_id) OVER (PARTITION BY t) AS keeper FROM quality
  ) WHERE doc_id = keeper
),
sp AS (
  SELECT doc_id, t,
         CASE WHEN {_BUCKET} < 80 THEN 'train'
              WHEN {_BUCKET} < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM dedup
),
tk AS (
  SELECT doc_id, split,
         list_filter(string_split(t, ' '), w -> w <> '') AS toks
  FROM sp
),
s AS (
  SELECT doc_id, split, toks, unnest(range(0, len(toks), 32)) AS st
  FROM tk WHERE len(toks) > 0
)
SELECT doc_id, split,
       CAST(st // 32 AS INTEGER) AS chunk_idx,
       CAST(len(toks[st + 1 : st + 64]) AS INTEGER) AS n_chunk_tokens,
       array_to_string(toks[st + 1 : st + 64], ' ') AS chunk_text
FROM s
"""


@df_query(
    "c07_e2e_corpus_pipeline",
    "End-to-end corpus build: normalize -> quality filter -> exact dedup -> "
    "train/val/test split -> overlapping token chunks, one composed plan "
    "(the oracle mirrors each stage as a CTE).",
    _C07_ORACLE,
)
def c07(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lagoon_spark.operators import dedup as dedup_ops
    from lagoon_spark.operators import text as text_ops

    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text")
    cleaned = docs.select("doc_id", text_ops.normalize_text("text").alias("t"))
    stats = cleaned.select(
        "doc_id",
        "t",
        text_ops.token_count("t").alias("__nt"),
        text_ops.mean_token_len("t").alias("__mtl"),
        text_ops.stopword_ratio("t").alias("__swr"),
    )
    quality = stats.filter(
        F.col("__nt").between(10, 1000)
        & F.col("__mtl").between(2.0, 12.0)
        & (F.col("__swr") >= 0.01)
    ).select("doc_id", "t")
    deduped = dedup_ops.exact_dedup(quality, ["t"], id_col="doc_id")
    sp = corpus.train_val_test_split(deduped, "doc_id")
    # split rides through the explode (keep_cols) — a join-back here
    # would recompute the entire normalize/stats/dedup plan twice and
    # add a shuffle for a column the chunk row already determines
    chunks = corpus.chunk_tokens(
        sp, "doc_id", "t", size=64, stride=32, keep_cols=["split"]
    )
    return chunks.select(
        "doc_id", "split", "chunk_idx", "n_chunk_tokens", "chunk_text"
    )


# ---------------------------------------------------------------------------
# c10 — temperature-scaled source mixing (p^alpha sampling)
# ---------------------------------------------------------------------------
#
# The multilingual-pretraining mixing rule (sampling ∝ p_s^alpha)
# realized as deterministic per-source keep rates; rates are rounded
# to 6 decimals before the integer threshold so both engines' pow()
# agree on every membership decision.

_C10_ALPHA = 0.3
_C10_GRAN = 1_000_000

_C10_ORACLE = f"""
WITH cnt AS (SELECT source, COUNT(*) AS sc FROM documents GROUP BY source),
tot AS (SELECT SUM(sc) AS total_docs FROM cnt),
x AS (SELECT source, sc,
             pow(CAST(sc AS DOUBLE) / total_docs, {_C10_ALPHA - 1.0!r}) AS xv
      FROM cnt CROSS JOIN tot),
mx AS (SELECT MAX(xv) AS mxv FROM x),
r AS (SELECT source, sc,
             CAST(floor(round(xv / mxv, 6) * {_C10_GRAN} + 0.5) AS BIGINT)
               AS ppm
      FROM x CROSS JOIN mx)
SELECT d.source,
       r.ppm AS keep_rate_ppm,
       CAST(r.sc AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN ({corpus.duck_id_hash('d.doc_id')}) % {_C10_GRAN} < r.ppm
                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM documents d JOIN r USING (source)
GROUP BY d.source, r.ppm, r.sc
"""


@df_query(
    "c10_temperature_mix",
    "Temperature-scaled source sampling (p^0.3): per-source keep rates "
    "from the tempered distribution (smallest source keeps all), "
    "membership by portable hash — the multilingual mixing knob as a "
    "broadcast rate table + one report aggregate.",
    _C10_ORACLE,
)
def c10(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "source")
    return corpus.temperature_mix(
        docs, "doc_id", "source", alpha=_C10_ALPHA, granularity=_C10_GRAN
    )
