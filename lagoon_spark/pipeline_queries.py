"""Training-data pipeline queries: dedup / similarity / text analysis.

Spark side uses the operator library (lagoon_spark/operators/*) —
idiomatic DataFrame transformations. The DuckDB oracle SQL is generated
from the same constants (seeds, hyperplanes, thresholds) so both
engines compute the identical deterministic function.

Portable-hash contract (shared with operators/text.py):
fp(s) = left-fold over chars of (acc*31 + ascii(c)) mod 1e9+7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lagoon_spark.operators import corpus, dedup, similarity, text
from lagoon_spark.queries import df_query
from lagoon_spark.session import register_views

MOD = text.MOD


# ---------------------------------------------------------------------------
# DuckDB SQL fragment generators (mirror operators/text.py semantics)
# ---------------------------------------------------------------------------

def _duck_fp(expr: str, max_chars: int | None = None) -> str:
    n = f"least(length({expr}), {max_chars})" if max_chars else f"length({expr})"
    return (
        f"CASE WHEN length({expr}) = 0 THEN CAST(0 AS BIGINT) ELSE "
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(range(1, {n} + 1), i -> CAST(ascii(substr({expr}, i, 1)) AS BIGINT))), "
        f"(a, b) -> (a * {text.MULT} + b) % {MOD}) END"
    )


_DUCK_WORD_FPS = (
    "list_transform(list_filter(string_split(text, ' '), w -> w <> ''), "
    "w -> list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(range(1, length(w) + 1), i -> CAST(ascii(substr(w, i, 1)) AS BIGINT))), "
    f"(a, b) -> (a * {text.MULT} + b) % {MOD}))"
)


def _duck_marker(word: str) -> str:
    pad = f"' ' || text || ' '"
    needle = f" {word} "
    return (
        f"CAST((length({pad}) - length(replace({pad}, '{needle}', ' '))) / {len(needle) - 1} AS BIGINT)"
    )


# ---------------------------------------------------------------------------
# d01 — token / quality statistics
# ---------------------------------------------------------------------------

_D01_ORACLE = """
SELECT doc_id,
       length(text) AS n_chars,
       len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_tokens,
       round((length(text) - (len(string_split(text, ' ')) - 1))
             / greatest(len(list_filter(string_split(text, ' '), w -> w <> '')), 1), 6) AS mean_token_len,
       round(len(list_filter(string_split(text, ' '),
                 w -> list_contains(['the','a','of','and','is','to','in'], w)))
             / greatest(len(list_filter(string_split(text, ' '), w -> w <> '')), 1), 6) AS stopword_ratio
FROM documents
"""


@df_query(
    "d01_text_stats",
    "Per-document token count, mean token length, stopword ratio (quality scoring).",
    _D01_ORACLE,
)
def d01(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.table("documents").select(
        "doc_id",
        text.char_count("text").alias("n_chars"),
        text.token_count("text").cast("long").alias("n_tokens"),
        text.mean_token_len("text").alias("mean_token_len"),
        text.stopword_ratio("text").alias("stopword_ratio"),
    )


# ---------------------------------------------------------------------------
# d02 — language identification (marker-word heuristic)
# ---------------------------------------------------------------------------

def _d02_oracle() -> str:
    scores = ",\n       ".join(
        " + ".join(_duck_marker(w) for w in ws) + f" AS s_{lang}"
        for lang, ws in text.DEFAULT_LANG_MARKERS.items()
    )
    # same fold as text.lang_id: iterate sorted langs, strict > wins
    langs = sorted(text.DEFAULT_LANG_MARKERS)
    best_l, best_s = "'und'", "CAST(0 AS BIGINT)"
    for lang in langs:
        best_l = f"CASE WHEN s_{lang} > {best_s} THEN '{lang}' ELSE {best_l} END"
        best_s = f"CASE WHEN s_{lang} > {best_s} THEN s_{lang} ELSE {best_s} END"
    return f"""
SELECT doc_id, lang, lang_pred FROM (
  SELECT doc_id, lang, {best_l} AS lang_pred FROM (
    SELECT doc_id, lang,
       {scores}
    FROM documents
  ) s
) p
"""


@df_query(
    "d02_lang_id",
    "Language ID via marker-stopword counting (n-gram heuristic family).",
    _d02_oracle(),
)
def d02(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.table("documents").select(
        "doc_id", "lang", text.lang_id("text").alias("lang_pred")
    )


# ---------------------------------------------------------------------------
# d03 — document fingerprint (rolling hash)
# ---------------------------------------------------------------------------

_D03_ORACLE = f"""
SELECT doc_id, {_duck_fp('text', 64)} AS fp64
FROM documents
"""


@df_query(
    "d03_fingerprint",
    "Rolling-hash document fingerprint (first 64 chars, mod 1e9+7).",
    _D03_ORACLE,
)
def d03(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.table("documents").select(
        "doc_id", text.fingerprint("text", 64).alias("fp64")
    )


# ---------------------------------------------------------------------------
# d04 — exact dedup via content digest (hash groupBy)
# ---------------------------------------------------------------------------

_D04_ORACLE = """
SELECT md5(text) AS digest, COUNT(*) AS n_copies, MIN(doc_id) AS canonical_id
FROM documents
GROUP BY md5(text)
"""


@df_query(
    "d04_exact_dup_clusters",
    "Exact dedup: content-digest groupBy → cluster size + canonical id.",
    _D04_ORACLE,
)
def d04(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return (
        spark.table("documents")
        .groupBy(dedup.content_digest("text", "md5").alias("digest"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("canonical_id"),
        )
    )


# ---------------------------------------------------------------------------
# d05 — dedup survivors (keep min id per key) — window-based selection
# ---------------------------------------------------------------------------

_D05_ORACLE = """
SELECT doc_id, lang, n_chars FROM (
  SELECT doc_id, lang, n_chars,
         MIN(doc_id) OVER (PARTITION BY lang, n_chars) AS keeper
  FROM documents
) t WHERE doc_id = keeper
"""


@df_query(
    "d05_dedup_keep_first",
    "Dedup selection: survivor rows (min doc_id) per (lang, n_chars) key.",
    _D05_ORACLE,
)
def d05(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "lang", "n_chars")
    return dedup.exact_dedup(docs, ["lang", "n_chars"], id_col="doc_id")


# ---------------------------------------------------------------------------
# d06 — MinHash signatures + LSH banding candidate pairs
# ---------------------------------------------------------------------------

def _d06_oracle(num_hashes: int = 16, bands: int = 4, rows: int = 4) -> str:
    seeds = dedup.minhash_seeds(num_hashes)
    sig_items = ", ".join(
        f"list_min(list_transform(f, x -> (x % {MOD} * {a} + {b}) % {MOD}))"
        for a, b in seeds
    )
    band_keys = ", ".join(
        " || '_' || ".join(f"s[{b * rows + r + 1}]" for r in range(rows))
        for b in range(bands)
    )
    band_ids = ", ".join(str(b) for b in range(bands))
    matches = " + ".join(
        f"CASE WHEN sa[{i + 1}] = sb[{i + 1}] THEN 1 ELSE 0 END"
        for i in range(num_hashes)
    )
    return f"""
WITH fps AS (
  SELECT doc_id, list_distinct({_DUCK_WORD_FPS}) AS f FROM documents
),
sig AS (
  SELECT doc_id, [{sig_items}] AS s FROM fps
),
banded AS (
  SELECT doc_id, s, unnest([{band_ids}]) AS band, unnest([{band_keys}]) AS key FROM sig
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.s AS sa, b.s AS sb
  FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, ({matches}) / {num_hashes} AS est_jaccard FROM pairs
"""


@df_query(
    "d06_minhash_lsh_pairs",
    "MinHash(16) + LSH banding (4x4): near-dup candidate pairs with estimated Jaccard.",
    _d06_oracle(),
)
def d06(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text")
    sigs = dedup.minhash_signature(docs, "text", num_hashes=16, method="portable")
    from lagoon_spark.checkpointing import handles, pin_handles

    pairs = dedup.lsh_candidate_pairs(sigs, "doc_id", bands=4, rows_per_band=4)
    # projections drop the handle attribute; re-attach for release()
    return pin_handles(
        pairs.select("id_a", "id_b", "est_jaccard"), *handles(pairs)
    )


# ---------------------------------------------------------------------------
# d11 — near-dup clusters: LSH pairs → connected components → representative
# ---------------------------------------------------------------------------

def _d11_oracle(num_hashes: int = 16, bands: int = 4, rows: int = 4, min_matches: int = 8) -> str:
    return (
        _d11_ctes(num_hashes, bands, rows, min_matches)
        + "\nSELECT node AS doc_id, MIN(reach) AS cluster FROM walk GROUP BY node\n"
    )


def _d11_ctes(num_hashes: int = 16, bands: int = 4, rows: int = 4, min_matches: int = 8) -> str:
    """The MinHash→LSH→CC chain as a reusable CTE prefix (ends after
    the recursive ``walk`` CTE; callers append their own final
    select)."""
    seeds = dedup.minhash_seeds(num_hashes)
    sig_items = ", ".join(
        f"list_min(list_transform(f, x -> (x % {MOD} * {a} + {b}) % {MOD}))"
        for a, b in seeds
    )
    band_keys = ", ".join(
        " || '_' || ".join(f"s[{b * rows + r + 1}]" for r in range(rows))
        for b in range(bands)
    )
    band_ids = ", ".join(str(b) for b in range(bands))
    matches = " + ".join(
        f"CASE WHEN sa[{i + 1}] = sb[{i + 1}] THEN 1 ELSE 0 END"
        for i in range(num_hashes)
    )
    return f"""
WITH RECURSIVE fps AS (
  SELECT doc_id, list_distinct({_DUCK_WORD_FPS}) AS f FROM documents
),
sig AS (
  SELECT doc_id, [{sig_items}] AS s FROM fps
),
banded AS (
  SELECT doc_id, s, unnest([{band_ids}]) AS band, unnest([{band_keys}]) AS key FROM sig
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.s AS sa, b.s AS sb
  FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
),
strong AS (
  SELECT id_a, id_b FROM pairs WHERE ({matches}) >= {min_matches}
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM strong
  UNION
  SELECT id_b AS src, id_a AS dst FROM strong
),
walk(node, reach) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT w.node, e.dst FROM walk w JOIN edges e ON e.src = w.reach
)"""


@df_query(
    "d11_neardup_clusters",
    "Full near-dup pipeline: MinHash LSH pairs (est>=0.5) -> connected "
    "components -> (doc_id, cluster representative) for every document.",
    _d11_oracle(),
)
def d11(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text")
    return dedup.neardup_clusters(
        docs, "doc_id", "text",
        num_hashes=16, bands=4, rows_per_band=4, min_matches=8,
    )


# ---------------------------------------------------------------------------
# d12 — vocabulary: token document-frequency + idf, top 100
# ---------------------------------------------------------------------------

_D12_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         unnest(list_distinct(list_filter(string_split(text, ' '), w -> w <> ''))) AS token
  FROM documents
),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents)
SELECT token, COUNT(*) AS doc_freq,
       round(ln((SELECT n_docs FROM n) / CAST(COUNT(*) AS DOUBLE)), 6) AS idf
FROM toks
GROUP BY token
ORDER BY doc_freq DESC, token
LIMIT 100
"""


@df_query(
    "d12_vocabulary",
    "Corpus vocabulary: per-token document frequency + idf, top 100 "
    "(explode distinct tokens -> one shuffle on token).",
    _D12_ORACLE,
)
def d12(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    docs = spark.table("documents")
    n_docs = float(docs.count())
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("token"),
    ).filter(F.col("token") != "")
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .withColumn(
            "idf",
            F.round(F.log(F.lit(n_docs) / F.col("doc_freq").cast("double")), 6),
        )
        .orderBy(F.desc("doc_freq"), "token")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# d07 — SimHash
# ---------------------------------------------------------------------------

def _d07_oracle(bits: int = 16) -> str:
    terms = []
    for k in range(bits):
        pw = 1 << k
        contrib = (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_transform(f, x -> CAST(CASE WHEN (x // {pw}) % 2 = 1 THEN 1 ELSE -1 END AS BIGINT))), "
            f"(a, b) -> a + b)"
        )
        terms.append(f"CASE WHEN {contrib} > 0 THEN {pw} ELSE 0 END")
    total = " + ".join(terms)
    return f"""
WITH fps AS (
  SELECT doc_id, {_DUCK_WORD_FPS} AS f FROM documents
)
SELECT doc_id, CAST({total} AS BIGINT) AS simhash FROM fps
"""


@df_query(
    "d07_simhash",
    "16-bit SimHash per document (token-multiset sign sums).",
    _d07_oracle(),
)
def d07(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text")
    return dedup.simhash(docs, "text", bits=16).select("doc_id", "simhash")


# ---------------------------------------------------------------------------
# d08 — word 3-gram Jaccard over blocked candidate pairs
# ---------------------------------------------------------------------------

_D08_ORACLE = """
WITH g AS (
  SELECT doc_id, lang, source,
         list_distinct(list_transform(
           range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
           i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS grams
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(len(list_intersect(a.grams, b.grams))
             / greatest(len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)), 1), 6) AS jaccard
FROM g a JOIN g b
  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
WHERE round(len(list_intersect(a.grams, b.grams))
             / greatest(len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)), 1), 6) >= 0.05
"""


@df_query(
    "d08_ngram_jaccard_pairs",
    "Word-3-gram Jaccard verifier over (lang, source)-blocked pairs.",
    _D08_ORACLE,
)
def d08(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text", "lang", "source")
    from lagoon_spark.checkpointing import handles, pin_handles

    pairs = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, block_cols=["lang", "source"], min_jaccard=0.05
    )
    return pin_handles(
        pairs.select("id_a", "id_b", "jaccard"), *handles(pairs)
    )


# ---------------------------------------------------------------------------
# s01 — brute-force cosine top-k (the ANN baseline)
# ---------------------------------------------------------------------------

_S01_ORACLE = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
d AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id <> 0)
SELECT vec_id,
       round(
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_transform(d.embedding, (x, i) -> CAST(x AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))),
           (a, b) -> a + b)
         / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
              list_transform(d.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
              (a, b) -> a + b))
            * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
              list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
              (a, b) -> a + b))), 9) AS cosine
FROM d, q
ORDER BY cosine DESC, vec_id
LIMIT 10
"""


@df_query(
    "s01_cosine_topk",
    "Brute-force cosine top-10 against the vec_id=0 query vector.",
    _S01_ORACLE,
)
def s01(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    emb = spark.table("embeddings")
    query = emb.filter(F.col("vec_id") == 0).select("embedding")
    return similarity.cosine_topk(
        emb.filter(F.col("vec_id") != 0), "vec_id", "embedding", query, k=10
    )


# ---------------------------------------------------------------------------
# s02 — blocked pairwise cosine (embedding near-dup verifier)
# ---------------------------------------------------------------------------

_S02_ORACLE = """
WITH e AS (SELECT vec_id, label, embedding FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_transform(a.embedding, (x, i) -> CAST(x AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))),
           (acc, v) -> acc + v)
         / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
              list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
              (acc, v) -> acc + v))
            * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
              list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
              (acc, v) -> acc + v))), 9) AS cosine
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_transform(a.embedding, (x, i) -> CAST(x AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))),
           (acc, v) -> acc + v)
         / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
              list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
              (acc, v) -> acc + v))
            * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
              list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
              (acc, v) -> acc + v))), 9) >= 0.25
"""


@df_query(
    "s02_cosine_pairs_blocked",
    "Label-blocked pairwise cosine ≥ 0.25 (embedding near-dup detection).",
    _S02_ORACLE,
)
def s02(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    emb = spark.table("embeddings")
    return similarity.pairwise_cosine(
        emb, "vec_id", "embedding", block_cols=["label"], min_cosine=0.25
    )


# ---------------------------------------------------------------------------
# s03 — sign-random-projection LSH bucket assignment
# ---------------------------------------------------------------------------

def _s03_oracle(dim: int = 64, bits: int = 8, seed: int = 42) -> str:
    planes = similarity._pseudo_hyperplanes(dim, bits, seed)
    terms = []
    for k, plane in enumerate(planes):
        arr = "[" + ", ".join(f"CAST({w:.17g} AS DOUBLE)" for w in plane) + "]"
        dot = (
            f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
            f"list_transform(embedding, (x, i) -> CAST(x AS DOUBLE) * ({arr})[i])), "
            f"(acc, v) -> acc + v)"
        )
        terms.append(f"CASE WHEN {dot} > 0 THEN {1 << k} ELSE 0 END")
    total = " + ".join(terms)
    return f"""
SELECT vec_id, CAST({total} AS BIGINT) AS lsh_bucket FROM embeddings
"""


@df_query(
    "s03_rp_lsh_buckets",
    "Sign-random-projection LSH bucket key per embedding (ANN scale path).",
    _s03_oracle(),
)
def s03(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    emb = spark.table("embeddings").select("vec_id", "embedding")
    return similarity.rp_lsh_buckets(emb, "embedding", dim=64, bits=8, seed=42).select(
        "vec_id", "lsh_bucket"
    )


# ---------------------------------------------------------------------------
# s04 — LSH-bucketed ANN top-k (the scale path: candidates from the
# query's bucket only, then exact cosine re-rank)
# ---------------------------------------------------------------------------

def _s04_oracle(dim: int = 64, bits: int = 8, seed: int = 42, k: int = 5) -> str:
    bucket_sql = _s03_oracle(dim, bits, seed)
    bucket_expr = bucket_sql.split("SELECT vec_id, ")[1].split(" AS lsh_bucket")[0]
    cos = (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        "list_transform(d.embedding, (x, i) -> CAST(x AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))), "
        "(a, b) -> a + b) "
        "/ (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        "list_transform(d.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), "
        "(a, b) -> a + b)) "
        "* sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        "list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), "
        "(a, b) -> a + b)))"
    )
    return f"""
WITH b AS (SELECT vec_id, embedding, {bucket_expr} AS lsh_bucket FROM embeddings),
q AS (SELECT lsh_bucket AS qb, embedding AS qv FROM b WHERE vec_id = 0),
d AS (SELECT b.vec_id, b.embedding FROM b, q WHERE b.lsh_bucket = q.qb AND b.vec_id <> 0)
SELECT vec_id, round({cos}, 9) AS cosine
FROM d, q
ORDER BY cosine DESC, vec_id
LIMIT {k}
"""


@df_query(
    "s04_lsh_ann_topk",
    "ANN top-5: LSH bucket pre-filter (query's bucket only) + exact cosine re-rank.",
    _s04_oracle(),
)
def s04(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    emb = spark.table("embeddings").select("vec_id", "embedding")
    buckets = similarity.rp_lsh_buckets(emb, "embedding", dim=64, bits=8, seed=42)
    q = buckets.filter(F.col("vec_id") == 0).select(
        F.col("lsh_bucket").alias("__qb"), F.col("embedding").alias("__qvec")
    )
    cands = (
        buckets.filter(F.col("vec_id") != 0)
        .join(F.broadcast(q), F.col("lsh_bucket") == F.col("__qb"))
    )
    return (
        cands.select(
            "vec_id",
            F.round(similarity.cosine_to("embedding", "__qvec"), 9).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(5)
    )


# ---------------------------------------------------------------------------
# s05 — IVF coarse-quantizer cell assignment
# ---------------------------------------------------------------------------

def _ivf_centroids(dim: int = 64, cells: int = 4, seed: int = 7) -> list[list[float]]:
    return similarity._pseudo_hyperplanes(dim, cells, seed)


def _s05_oracle(dim: int = 64, cells: int = 4, seed: int = 7) -> str:
    cents = _ivf_centroids(dim, cells, seed)
    dists = []
    for c in cents:
        arr = "[" + ", ".join(f"CAST({w:.17g} AS DOUBLE)" for w in c) + "]"
        dists.append(
            f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
            f"list_transform(embedding, (x, i) -> "
            f"(CAST(x AS DOUBLE) - ({arr})[i]) * (CAST(x AS DOUBLE) - ({arr})[i]))), "
            f"(a, b) -> a + b)"
        )
    # same fold as ivf_assign: strict < keeps the earliest argmin
    best_c, best_d = "-1", "CAST('inf' AS DOUBLE)"
    for ci, d in enumerate(dists):
        best_c = f"CASE WHEN ({d}) < {best_d} THEN {ci} ELSE {best_c} END"
        best_d = f"CASE WHEN ({d}) < {best_d} THEN ({d}) ELSE {best_d} END"
    return f"SELECT vec_id, CAST({best_c} AS INTEGER) AS ivf_cell FROM embeddings"


@df_query(
    "s05_ivf_cells",
    "IVF coarse-quantizer: nearest-centroid cell per embedding (ANN partition path).",
    _s05_oracle(),
)
def s05(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    emb = spark.table("embeddings").select("vec_id", "embedding")
    return similarity.ivf_assign(emb, "embedding", _ivf_centroids()).select(
        "vec_id", F.col("ivf_cell").cast("int").alias("ivf_cell")
    )


# ---------------------------------------------------------------------------
# d10 — composite quality filter (Gopher-style keep/drop gate)
# ---------------------------------------------------------------------------

_D10_ORACLE = """
WITH s AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_tokens,
         round((length(text) - (len(string_split(text, ' ')) - 1))
               / greatest(len(list_filter(string_split(text, ' '), w -> w <> '')), 1), 6)
           AS mean_token_len,
         round(len(list_filter(string_split(text, ' '),
                   w -> list_contains(['the','a','of','and','is','to','in'], w)))
               / greatest(len(list_filter(string_split(text, ' '), w -> w <> '')), 1), 6)
           AS stopword_ratio
  FROM documents
)
SELECT doc_id, n_tokens, mean_token_len, stopword_ratio,
       (n_tokens BETWEEN 10 AND 1000)
         AND (mean_token_len BETWEEN 2.0 AND 12.0)
         AND (stopword_ratio >= 0.01) AS keep
FROM s
"""


@df_query(
    "d10_quality_filter",
    "Composite quality gate: token-count, token-length, and stopword-ratio rules → keep flag.",
    _D10_ORACLE,
)
def d10(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    stats = spark.table("documents").select(
        "doc_id",
        text.token_count("text").cast("long").alias("n_tokens"),
        text.mean_token_len("text").alias("mean_token_len"),
        text.stopword_ratio("text").alias("stopword_ratio"),
    )
    return stats.withColumn(
        "keep",
        F.col("n_tokens").between(10, 1000)
        & F.col("mean_token_len").between(2.0, 12.0)
        & (F.col("stopword_ratio") >= 0.01),
    )


# ---------------------------------------------------------------------------
# d09 — BPE-ish regex token counting
# ---------------------------------------------------------------------------

# letter runs | digit runs | single non-alnum — leftmost-first in both
# Java regex (Spark) and RE2 (DuckDB); no lookahead (RE2 lacks it).
_BPE_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

_D09_ORACLE = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS INTEGER) AS n_bpe_tokens,
       CAST(len(list_distinct(regexp_extract_all(text, '{_BPE_PATTERN}'))) AS INTEGER)
         AS n_unique_tokens
FROM documents
"""


@df_query(
    "d09_bpe_token_count",
    "BPE-ish regex tokenizer: total + distinct subword-token counts per document.",
    _D09_ORACLE,
)
def d09(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    # pattern via lit(): Spark SQL string literals would eat the \s
    toks = F.regexp_extract_all(F.col("text"), F.lit(_BPE_PATTERN), F.lit(0))
    return spark.table("documents").select(
        "doc_id",
        F.size(toks).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
    )


# ---------------------------------------------------------------------------
# d13 — portable HyperLogLog: cross-engine-identical distinct sketch
# ---------------------------------------------------------------------------

def _d13_oracle() -> str:
    from lagoon_spark.operators.sketches import hll_oracle_sql

    inner = hll_oracle_sql("events", ["event_type"], "user_id", p=8)
    return f"""
WITH hll AS ({inner})
SELECT h.event_type, h.approx_distinct, e.exact_distinct
FROM hll h
JOIN (SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
      FROM events GROUP BY event_type) e
  ON h.event_type = e.event_type
"""


@df_query(
    "d13_hll_distinct",
    "Portable HyperLogLog (p=8): per-event-type distinct-user estimate that "
    "is bit-identical across engines (dyadic register sums are order-free), "
    "side-by-side with the exact count.",
    _d13_oracle(),
)
def d13(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lagoon_spark.operators.sketches import hll_distinct

    register_views(spark, sf_dir)
    ev = spark.table("events")
    hll = hll_distinct(ev, ["event_type"], "user_id", p=8)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return hll.join(exact, "event_type").select(
        "event_type", "approx_distinct", "exact_distinct"
    )


# ---------------------------------------------------------------------------
# s06 — BM25 keyword search: inverted-index scoring, top-10
# ---------------------------------------------------------------------------

_BM25_TERMS = ("spark", "join", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75


def _s06_oracle() -> str:
    k1, b = _BM25_K1, _BM25_B
    terms_list = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    # per-term score columns summed in a fixed order (a groupBy SUM over
    # doubles would be accumulation-order-dependent)
    per_term = " + ".join(
        f"COALESCE(MAX(CASE WHEN term = '{t}' THEN s END), 0.0)" for t in _BM25_TERMS
    )
    return f"""
WITH stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         SUM(len(list_filter(string_split(text, ' '), w -> w <> ''))) AS total_len
  FROM documents
),
docs AS (
  SELECT doc_id, len(list_filter(string_split(text, ' '), w -> w <> '')) AS dl,
         text FROM documents
),
tf AS (
  SELECT doc_id, dl, term, CAST(COUNT(*) AS DOUBLE) AS tf
  FROM (SELECT doc_id, dl, unnest(list_filter(string_split(text, ' '),
              w -> list_contains([{terms_list}], w))) AS term
        FROM docs) x
  GROUP BY doc_id, dl, term
),
df AS (
  SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df FROM tf GROUP BY term
),
scored AS (
  SELECT tf.doc_id, tf.term,
         ln((s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * {k1 + 1.0!r})
           / (tf.tf + {k1!r} * (1.0 - {b!r} + {b!r} * tf.dl
              / (s.total_len / s.n_docs))) AS s
  FROM tf JOIN df ON tf.term = df.term, stats s
)
SELECT doc_id, round({per_term}, 6) AS bm25
FROM scored
GROUP BY doc_id
ORDER BY bm25 DESC, doc_id
LIMIT 10
"""


@df_query(
    "s06_bm25_topk",
    "BM25 keyword relevance (k1=1.2, b=0.75) for a 3-term query; "
    "fixed-order per-term summation keeps doubles engine-identical.",
    _s06_oracle(),
)
def s06(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    k1, b = _BM25_K1, _BM25_B
    docs = spark.table("documents").select(
        "doc_id",
        text.token_count("text").cast("long").alias("dl"),
        F.col("text"),
    )
    # df(term) rides the SAME one-row stats aggregate (one corpus pass):
    # round 12 derived it with count().over(partitionBy(term)), which
    # funnels the whole tf frame through at most |terms| partitions — a
    # single-task ceiling at corpus scale (round-12 advice) and an extra
    # term-keyed Exchange at any scale. A per-term conditional SUM in
    # the aggregate the lane already runs keeps per-doc parallelism and
    # drops that Exchange; the integer doc count is exact in a double,
    # so every BM25 score is bit-identical.
    stats = docs.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum("dl").alias("total_len"),
        *[
            F.sum(
                F.array_contains(F.split(F.col("text"), " "), t).cast("long")
            )
            .cast("double")
            .alias(f"__df{i}")
            for i, t in enumerate(_BM25_TERMS)
        ],
    )
    terms = docs.select(
        "doc_id",
        "dl",
        F.explode(
            F.filter(
                F.split(F.col("text"), " "),
                lambda w: w.isin(*[F.lit(t) for t in _BM25_TERMS]),
            )
        ).alias("term"),
    )
    tf = terms.groupBy("doc_id", "dl", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    dfq = None
    for i, t in enumerate(_BM25_TERMS):
        dfq = (F.when if dfq is None else dfq.when)(
            F.col("term") == t, F.col(f"__df{i}")
        )
    scored = (
        tf.crossJoin(F.broadcast(stats))
        .withColumn("df", dfq)
        .withColumn(
            "s",
            F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b)
                    * F.col("dl")
                    / (F.col("total_len") / F.col("n_docs"))
                )
            ),
        )
    )
    per_term = None
    for t in _BM25_TERMS:
        c = F.coalesce(
            F.max(F.when(F.col("term") == t, F.col("s"))), F.lit(0.0)
        )
        per_term = c if per_term is None else per_term + c
    return (
        scored.groupBy("doc_id")
        .agg(F.round(per_term, 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# d14 — portable Count-Min sketch: token-frequency estimates vs exact
# ---------------------------------------------------------------------------

_CMS_PROBES = ["table", "spark", "hash", "merge", "the", "window", "zzz_absent"]


def _d14_oracle() -> str:
    from lagoon_spark.operators.sketches import cms_oracle_sql

    return cms_oracle_sql("documents", "text", _CMS_PROBES, depth=4, width=1024)


@df_query(
    "d14_cms_token_counts",
    "Portable Count-Min sketch (4x1024): corpus token-frequency estimates "
    "bit-identical across engines, side-by-side with exact counts "
    "(includes a never-seen probe exercising the zero/collision path).",
    _d14_oracle(),
)
def d14(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lagoon_spark.operators.sketches import cms_token_estimates

    register_views(spark, sf_dir)
    return cms_token_estimates(
        spark.table("documents"), "text", _CMS_PROBES, depth=4, width=1024
    )


# ---------------------------------------------------------------------------
# d15 — PII redaction + normalization (corpus cleaning pass)
# ---------------------------------------------------------------------------
#
# The testdata corpus carries no PII, so the query plants a
# deterministic email/IP/phone per document (same expression in both
# engines) and the operator chain must scrub it back out. Patterns are
# Java-regex/RE2-portable (see operators/text.py PII_RULES).

_D15_SYNTH = (
    "concat(text, ' contact user', CAST(doc_id AS STRING), "
    "'@example.com from 10.0.', CAST(doc_id % 256 AS STRING), "
    "'.7 call 555-123-4567')"
)


def _d15_oracle() -> str:
    red = _D15_SYNTH
    for _, pat, repl in text.PII_RULES:
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    red = f"trim(regexp_replace(lower({red}), '\\s+', ' ', 'g'))"
    counts = ", ".join(
        f"len(regexp_extract_all({_D15_SYNTH}, '{pat}')) AS n_{kind}"
        for kind, pat, _ in text.PII_RULES
    )
    return f"SELECT doc_id, {red} AS redacted, {counts} FROM documents"


@df_query(
    "d15_pii_redaction",
    "PII scrub (emails/SSNs/phones/IPv4 -> typed placeholders) + whitespace/"
    "case normalization, with per-kind audit counts — all JVM-side regex, "
    "row-local, no shuffle.",
    _d15_oracle(),
)
def d15(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    docs = spark.table("documents").withColumn("__synth", F.expr(_D15_SYNTH))
    counts = text.pii_counts("__synth")
    return docs.select(
        "doc_id",
        text.normalize_text(text.redact_pii("__synth")).alias("redacted"),
        *[c.alias(f"n_{kind}") for kind, c in counts.items()],
    )


# ---------------------------------------------------------------------------
# d16 — boilerplate line removal (CCNet-style line-frequency filter)
# ---------------------------------------------------------------------------
#
# Documents get a synthetic second line: half share one footer line
# (appears in n/2 docs -> boilerplate, removed), half get a unique tail
# (kept). The original text line is unique per doc (kept).

_D16_SYNTH = (
    "concat(text, chr(10), CASE WHEN doc_id % 2 = 0 "
    "THEN 'standard footer all rights reserved' "
    "ELSE concat('unique tail ', CAST(doc_id AS STRING)) END)"
)
_D16_MAX_DOCS = 3


def _d16_oracle() -> str:
    return f"""
WITH docs AS (SELECT doc_id, {_D16_SYNTH} AS t FROM documents),
ls AS (SELECT doc_id, string_split(t, chr(10)) AS arr FROM docs),
lines AS (
  SELECT doc_id, unnest(range(1, len(arr) + 1)) AS pos, unnest(arr) AS line
  FROM ls
),
freq AS (SELECT line, COUNT(DISTINCT doc_id) AS dfreq FROM lines GROUP BY line),
kept AS (
  SELECT l.doc_id, l.pos, l.line
  FROM lines l JOIN freq f ON f.line = l.line
  WHERE f.dfreq <= {_D16_MAX_DOCS}
),
agg AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(a.clean_text, '') AS clean_text
FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
"""


@df_query(
    "d16_boilerplate_removal",
    "Line-frequency boilerplate filter: lines occurring in > K documents "
    "(injected shared footer) are dropped, docs reassembled in line order.",
    _d16_oracle(),
)
def d16(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lagoon_spark.operators.corpus import remove_boilerplate_lines

    register_views(spark, sf_dir)
    docs = spark.table("documents").select(
        "doc_id", F.expr(_D16_SYNTH).alias("__t")
    )
    return remove_boilerplate_lines(
        docs, "doc_id", "__t", max_docs=_D16_MAX_DOCS
    )


# ---------------------------------------------------------------------------
# s07 — int8 embedding quantization (absmax, engine-exact)
# ---------------------------------------------------------------------------

_S07_ORACLE = """
WITH m AS (
  SELECT vec_id, embedding,
         list_aggregate(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'max') AS amax
  FROM embeddings
),
s AS (
  SELECT vec_id, embedding,
         CASE WHEN amax > 0 THEN 127.0 / amax ELSE 1.0 END AS scale
  FROM m
)
SELECT vec_id, scale,
       list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * scale + 0.5) AS INTEGER)) AS quantized
FROM s
"""


@df_query(
    "s07_quantize_embeddings",
    "Absmax int8 quantization of the embedding column: q = floor(v*scale+0.5),"
    " scale = 127/max|v| — float64 throughout so both engines emit identical "
    "bits; a pure row-local map (the 100 TB compression pass).",
    _S07_ORACLE,
)
def s07(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return similarity.quantize_embeddings(
        spark.table("embeddings"), "embedding"
    ).select("vec_id", "scale", "quantized")


# ---------------------------------------------------------------------------
# d17 — histogram quantile sketch: percentiles without a global sort
# ---------------------------------------------------------------------------

def _d17_oracle() -> str:
    from lagoon_spark.operators.sketches import histogram_quantiles_oracle_sql

    return histogram_quantiles_oracle_sql(
        "lineitem", ["l_returnflag"], "l_extendedprice", step=64, pcts=[50, 90, 99]
    )


@df_query(
    "d17_histogram_quantiles",
    "Histogram quantile sketch: per-group p50/p90/p99 of extendedprice from "
    "fixed-width bins — one map-side-combinable shuffle instead of q44's "
    "global sort; integer rank crossings keep engines bit-identical.",
    _d17_oracle(),
)
def d17(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lagoon_spark.operators.sketches import histogram_quantiles

    register_views(spark, sf_dir)
    return histogram_quantiles(
        spark.table("lineitem"),
        ["l_returnflag"],
        "l_extendedprice",
        step=64,
        pcts=[50, 90, 99],
    )


# ---------------------------------------------------------------------------
# s08 — deterministic k-means: IVF centroid training + final assignment
# ---------------------------------------------------------------------------

def _s08_oracle() -> str:
    from lagoon_spark.operators.similarity import kmeans_oracle_sql

    return kmeans_oracle_sql(
        "embeddings", "vec_id", "embedding", k=8, iters=2, dim=64
    )


@df_query(
    "s08_kmeans_cells",
    "Deterministic distributed k-means (k=8, 2 Lloyd rounds): id-mod init, "
    "fixed-point integer mean accumulation (shuffle-order-free), lowest-cell "
    "tie-break — the IVF coarse-quantizer trainer, bit-identical across "
    "engines; each round is one (cell,dim) groupBy + a broadcast "
    "centroid-literal assignment.",
    _s08_oracle(),
)
def s08(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lagoon_spark.operators.similarity import kmeans_fit_predict

    register_views(spark, sf_dir)
    assigned, _ = kmeans_fit_predict(
        spark.table("embeddings"), "vec_id", "embedding", k=8, iters=2, dim=64
    )
    return assigned


# ---------------------------------------------------------------------------
# d18 — repetition score (Gopher-style quality signal)
# ---------------------------------------------------------------------------
#
# Fraction of duplicated word 3-grams per document: repetitive docs
# (boilerplate loops, keyword stuffing, degenerate generations) score
# high and get filtered. Row-local array arithmetic — a pure map.

_D18_N = 3

_D18_ORACLE = f"""
WITH g AS (
  SELECT doc_id,
         list_transform(
           range(1, greatest(len(list_filter(string_split(text, ' '), w -> w <> '')) - {_D18_N - 1}, 0) + 1),
           i -> array_to_string(list_filter(string_split(text, ' '), w -> w <> '')[i : i + {_D18_N - 1}], ' ')
         ) AS grams
  FROM documents
)
SELECT doc_id,
       CAST(len(grams) AS BIGINT) AS n_grams,
       round(CASE WHEN len(grams) = 0 THEN 0.0
             ELSE 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams)
             END, 6) AS rep_ratio
FROM g
"""


@df_query(
    "d18_repetition_score",
    "Gopher-style repetition signal: duplicated word-trigram fraction per "
    "document (row-local array arithmetic, no shuffle).",
    _D18_ORACLE,
)
def d18(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    n = _D18_N
    # dedup._ngrams_expr: sequence(1, 0) counts DOWN in Spark, so the
    # greatest(..., 0) bound would crash on a sub-n-token document
    docs = (
        spark.table("documents")
        .withColumn("__toks", F.filter(F.split(F.col("text"), " "), lambda w: w != ""))
        .select("doc_id", dedup._ngrams_expr("__toks", n).alias("__g"))
    )
    return docs.select(
        "doc_id",
        F.size("__g").cast("long").alias("n_grams"),
        F.round(
            F.when(F.size("__g") == 0, F.lit(0.0)).otherwise(
                F.lit(1.0)
                - F.size(F.array_distinct("__g")).cast("double") / F.size("__g")
            ),
            6,
        ).alias("rep_ratio"),
    )


# ---------------------------------------------------------------------------
# d31 — Gopher character-level repetition signals
# ---------------------------------------------------------------------------
#
# The two Gopher (Rae et al. 2021, table A1) repetition rules d18's
# count-based ratio doesn't cover, both CHARACTER-weighted:
#   - top n-gram character fraction: chars covered by all occurrences
#     of the single most frequent word 2-gram / total chars (ties
#     break to the lexicographically smallest gram, both engines);
#   - duplicate n-gram character fraction: chars covered by word
#     3-grams occurring more than once / total chars (the paper uses
#     n=5..10; this corpus's synthetic docs only repeat up to n=3,4 —
#     n is a constant, the shape is identical).
# Occurrence coverage is overlap-unaware (count x gram chars), capped
# at 1.0 — the standard approximation; the paper's thresholds are
# 0.20 (top, n=2) / 0.18-0.16 (dup) for these two.
#
# Shape: gram streams are relational (posexplode + count), NOT per-row
# array lambdas — a 100k-token document costs O(tokens) rows here, vs
# O(tokens^2) row-local comparisons; the per-doc reductions are
# map-side-combinable aggregates and the final joins are doc-scale.

_D31_TOP_N = 2
_D31_DUP_N = 3


def _d31_gram_stream_sql(n: int) -> str:
    return f"""
  SELECT doc_id, chars,
         array_to_string(toks[i : i + {n - 1}], ' ') AS g
  FROM t, unnest(range(1, greatest(len(toks) - {n - 1}, 0) + 1)) AS r(i)
"""


_D31_ORACLE = f"""
WITH t AS (
  SELECT doc_id, length(text) AS chars,
         list_filter(string_split(text, ' '), w -> w <> '') AS toks
  FROM documents
),
c2 AS (
  SELECT doc_id, chars, g, count(*) AS cnt
  FROM ({_d31_gram_stream_sql(_D31_TOP_N)}) GROUP BY ALL
),
top2 AS (
  SELECT doc_id,
         least(1.0, (-(m.nc)) * length(m.g) / chars) AS f
  FROM (
    SELECT doc_id, chars, min({{'nc': -cnt, 'g': g}}) AS m
    FROM c2 GROUP BY doc_id, chars
  )
),
c3 AS (
  SELECT doc_id, chars, g, count(*) AS cnt
  FROM ({_d31_gram_stream_sql(_D31_DUP_N)}) GROUP BY ALL
),
dup3 AS (
  SELECT doc_id,
         least(1.0, coalesce(sum(CASE WHEN cnt > 1 THEN cnt * length(g) END), 0)
                    / chars) AS f
  FROM c3 GROUP BY doc_id, chars
)
SELECT t.doc_id,
       round(coalesce(top2.f, 0.0), 6) AS top_2gram_char_frac,
       round(coalesce(dup3.f, 0.0), 6) AS dup_3gram_char_frac
FROM t LEFT JOIN top2 USING (doc_id) LEFT JOIN dup3 USING (doc_id)
"""


@df_query(
    "d31_gopher_char_repetition",
    "Gopher character-weighted repetition rules: top word-2-gram character "
    "fraction and duplicated word-5-gram character fraction per document "
    "(relational gram streams, map-side-combinable reductions).",
    _D31_ORACLE,
)
def d31(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    base = (
        spark.table("documents")
        .withColumn("__toks", F.filter(F.split(F.col("text"), " "), lambda w: w != ""))
        .select("doc_id", F.length("text").alias("__chars"), "__toks")
    )

    def grams(n: int) -> DataFrame:
        return base.select(
            "doc_id",
            "__chars",
            F.explode(dedup._ngrams_expr("__toks", n)).alias("g"),
        )

    c2 = grams(_D31_TOP_N).groupBy("doc_id", "__chars", "g").count()
    # highest count, ties to the smallest gram: min of (-cnt, gram)
    top2 = (
        c2.groupBy("doc_id")
        .agg(
            F.min(F.struct((-F.col("count")).alias("nc"), F.col("g"))).alias("m"),
            F.first("__chars").alias("chars"),
        )
        .select(
            "doc_id",
            F.least(
                F.lit(1.0),
                (-F.col("m.nc")).cast("double") * F.length("m.g") / F.col("chars"),
            ).alias("top_f"),
        )
    )
    c3 = grams(_D31_DUP_N).groupBy("doc_id", "__chars", "g").count()
    dup3 = (
        c3.groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("count") > 1, F.col("count") * F.length("g"))
            ).alias("dup_chars"),
            F.first("__chars").alias("chars"),
        )
        .select(
            "doc_id",
            F.least(
                F.lit(1.0),
                F.coalesce(F.col("dup_chars").cast("double"), F.lit(0))
                / F.col("chars"),
            ).alias("dup_f"),
        )
    )
    return (
        base.select("doc_id")
        .join(top2, "doc_id", "left")
        .join(dup3, "doc_id", "left")
        .select(
            "doc_id",
            F.round(F.coalesce("top_f", F.lit(0.0)), 6).alias("top_2gram_char_frac"),
            F.round(F.coalesce("dup_f", F.lit(0.0)), 6).alias("dup_3gram_char_frac"),
        )
    )


# ---------------------------------------------------------------------------
# d19 — benchmark decontamination (shared n-grams vs a held-out eval set)
# ---------------------------------------------------------------------------
#
# The eval set is the hash-bucket >= 95 slice of the corpus (a stable
# 5% holdout standing in for benchmark data); a training document is
# contaminated if it shares any word 3-gram with any eval document.
# The eval gram dictionary broadcasts; the corpus side never shuffles
# until the per-doc count.

_D19_N = 3
_D19_EVAL_BUCKET = 95

_D19_GRAMS = f"""
  SELECT doc_id, {corpus.duck_id_bucket('doc_id')} AS b,
         list_distinct(list_transform(
           range(1, greatest(len(string_split(text, ' ')) - {_D19_N - 1}, 0) + 1),
           i -> array_to_string(string_split(text, ' ')[i : i + {_D19_N - 1}], ' '))) AS grams
  FROM documents
  WHERE len(string_split(text, ' ')) >= {_D19_N}
"""

_D19_ORACLE = f"""
WITH g AS ({_D19_GRAMS}),
eg AS (
  SELECT DISTINCT unnest(grams) AS gram FROM g WHERE b >= {_D19_EVAL_BUCKET}
),
tg AS (
  SELECT doc_id, unnest(grams) AS gram FROM g WHERE b < {_D19_EVAL_BUCKET}
)
SELECT tg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_grams
FROM tg JOIN eg USING (gram)
GROUP BY tg.doc_id
"""


@df_query(
    "d19_decontamination",
    "Benchmark decontamination: training documents sharing word 3-grams with "
    "a hash-defined eval holdout (broadcast gram dictionary, map-side probe).",
    _D19_ORACLE,
)
def d19(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text")
    b = corpus.id_bucket("doc_id")
    eval_df = docs.filter(b >= _D19_EVAL_BUCKET)
    train_df = docs.filter(b < _D19_EVAL_BUCKET)
    return corpus.shared_gram_counts(train_df, eval_df, "doc_id", "text", n=_D19_N)


# ---------------------------------------------------------------------------
# d20 — semantic dedup (SemDeDup: cluster, then cosine-drop within cells)
# ---------------------------------------------------------------------------

_D20_TAU = 0.30  # within-cell cosine at sf0.01: p99≈0.33, max≈0.51 —
# 0.30 exercises both drop and keep paths on the synthetic embeddings


def _d20_oracle() -> str:
    from lagoon_spark.operators.similarity import semantic_dedup_oracle_sql

    return semantic_dedup_oracle_sql(
        "embeddings", "vec_id", "embedding", k=8, iters=2, dim=64,
        threshold=_D20_TAU,
    )


@df_query(
    "d20_semantic_dedup",
    "SemDeDup: deterministic k-means cells, then drop vectors with cosine ≥ "
    "0.30 to a lower-id cell member — cluster blocking bounds the pair join "
    "(k ≈ √n cells in production keeps cluster size and parallelism healthy).",
    _d20_oracle(),
)
def d20(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return similarity.semantic_dedup(
        spark.table("embeddings").select("vec_id", "embedding"),
        "vec_id",
        "embedding",
        k=8,
        iters=2,
        dim=64,
        threshold=_D20_TAU,
    )


# ---------------------------------------------------------------------------
# d21 — cross-document duplicated n-gram fraction (corpus-level dup signal)
# ---------------------------------------------------------------------------

_D21_N = 5

_D21_ORACLE = f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS toks
  FROM documents
),
g AS (
  SELECT doc_id,
         unnest(list_transform(
           range(1, greatest(len(toks) - {_D21_N - 1}, 0) + 1),
           i -> array_to_string(toks[i : i + {_D21_N - 1}], ' ')
         )) AS gram
  FROM t
),
gdf AS (
  SELECT gram, COUNT(DISTINCT doc_id) AS df FROM g GROUP BY gram
),
per_doc AS (
  SELECT g.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(SUM(CASE WHEN gdf.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_shared_grams
  FROM g JOIN gdf USING (gram)
  GROUP BY g.doc_id
)
SELECT d.doc_id,
       COALESCE(p.n_grams, 0) AS n_grams,
       COALESCE(p.n_shared_grams, 0) AS n_shared_grams,
       round(COALESCE(p.n_shared_grams, 0)
             / greatest(COALESCE(p.n_grams, 0), 1), 6) AS dup_fraction
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


@df_query(
    "d21_crossdoc_dup_fraction",
    "Cross-document duplicated 5-gram fraction per document (boilerplate / "
    "mirror / template signal): one gram-keyed doc-frequency aggregate + one "
    "shuffle join back — nothing broadcast, nothing quadratic.",
    _D21_ORACLE,
)
def d21(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return dedup.crossdoc_dup_fraction(
        spark.table("documents").select("doc_id", "text"), "doc_id", "text",
        n=_D21_N,
    )


# ---------------------------------------------------------------------------
# s09 — IVF probe search (assign → nprobe nearest cells → exact re-rank)
# ---------------------------------------------------------------------------

_S09_K = 5
_S09_NPROBE = 2


def _s09_oracle(dim: int = 64, cells: int = 4, seed: int = 7) -> str:
    cents = _ivf_centroids(dim, cells, seed)

    def dist(arr: str) -> str:
        return (
            f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
            f"list_transform(v, (x, i) -> "
            f"(CAST(x AS DOUBLE) - ({arr})[i]) * (CAST(x AS DOUBLE) - ({arr})[i]))), "
            f"(a, b) -> a + b)"
        )

    lits = [
        "[" + ", ".join(f"CAST({w:.17g} AS DOUBLE)" for w in c) + "]"
        for c in cents
    ]
    qdists = " UNION ALL ".join(
        f"SELECT {ci} AS ci, {dist(arr)} AS d FROM q" for ci, arr in enumerate(lits)
    )
    # corpus cell assignment — same strict-< fold as the s05 oracle
    best_c, best_d = "-1", "CAST('inf' AS DOUBLE)"
    for ci, arr in enumerate(lits):
        d = dist(arr).replace("(v,", "(embedding,")
        best_c = f"CASE WHEN ({d}) < {best_d} THEN {ci} ELSE {best_c} END"
        best_d = f"CASE WHEN ({d}) < {best_d} THEN ({d}) ELSE {best_d} END"
    dot = (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        "list_transform(list_zip(e.embedding, q.v), "
        "t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE))), (x, y) -> x + y)"
    )
    nrm_e = (
        "sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        "list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), "
        "(x, y) -> x + y))"
    )
    nrm_q = (
        "sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        "list_transform(q.v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), "
        "(x, y) -> x + y))"
    )
    return f"""
WITH q AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 0),
qd AS ({qdists}),
probe AS (SELECT ci FROM qd ORDER BY d, ci LIMIT {_S09_NPROBE}),
cells AS (
  SELECT vec_id, embedding, CAST({best_c} AS INTEGER) AS ivf_cell
  FROM embeddings
)
SELECT e.vec_id, e.ivf_cell,
       round({dot} / ({nrm_e} * {nrm_q}), 9) AS cosine
FROM cells e JOIN probe p ON e.ivf_cell = p.ci CROSS JOIN q
ORDER BY cosine DESC, e.vec_id
LIMIT {_S09_K}
"""


@df_query(
    "s09_ivf_probe_topk",
    "IVF probe ANN search: corpus→cell assignment (row-local), query's 2 "
    "nearest cells broadcast, exact cosine re-rank of only those cells' "
    "members (TakeOrderedAndProject).",
    _s09_oracle(),
)
def s09(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    emb = spark.table("embeddings").select("vec_id", "embedding")
    return similarity.ivf_probe_topk(
        emb,
        "vec_id",
        "embedding",
        _ivf_centroids(),
        emb.filter(F.col("vec_id") == 0),
        k=_S09_K,
        nprobe=_S09_NPROBE,
    )


# ---------------------------------------------------------------------------
# s12 — batched IVF probe search (many queries through one corpus pass)
# ---------------------------------------------------------------------------

_S12_QIDS = (0, 1, 2)


def _s12_oracle(dim: int = 64, cells: int = 4, seed: int = 7) -> str:
    """DuckDB twin of the batched probe: per-query probe-cell window +
    per-query rank window — the production read path, where a batch of
    queries shares ONE corpus assignment pass."""
    cents = _ivf_centroids(dim, cells, seed)

    def dist(arr: str) -> str:
        return (
            f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
            f"list_transform(v, (x, i) -> "
            f"(CAST(x AS DOUBLE) - ({arr})[i]) * (CAST(x AS DOUBLE) - ({arr})[i]))), "
            f"(a, b) -> a + b)"
        )

    lits = [
        "[" + ", ".join(f"CAST({w:.17g} AS DOUBLE)" for w in c) + "]"
        for c in cents
    ]
    qdists = " UNION ALL ".join(
        f"SELECT qid, {ci} AS ci, {dist(arr)} AS d FROM q"
        for ci, arr in enumerate(lits)
    )
    best_c, best_d = "-1", "CAST('inf' AS DOUBLE)"
    for ci, arr in enumerate(lits):
        d = dist(arr).replace("(v,", "(embedding,")
        best_c = f"CASE WHEN ({d}) < {best_d} THEN {ci} ELSE {best_c} END"
        best_d = f"CASE WHEN ({d}) < {best_d} THEN ({d}) ELSE {best_d} END"
    dot = (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        "list_transform(list_zip(e.embedding, q.v), "
        "t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE))), (x, y) -> x + y)"
    )
    nrm_e = (
        "sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        "list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), "
        "(x, y) -> x + y))"
    )
    nrm_q = (
        "sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        "list_transform(q.v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), "
        "(x, y) -> x + y))"
    )
    qids = ", ".join(str(q) for q in _S12_QIDS)
    return f"""
WITH q AS (
  SELECT vec_id AS qid, embedding AS v FROM embeddings
  WHERE vec_id IN ({qids})
),
qd AS ({qdists}),
probe AS (
  SELECT qid, ci FROM (
    SELECT qid, ci,
           row_number() OVER (PARTITION BY qid ORDER BY d, ci) AS pr
    FROM qd
  ) WHERE pr <= {_S09_NPROBE}
),
cells AS (
  SELECT vec_id, embedding, CAST({best_c} AS INTEGER) AS ivf_cell
  FROM embeddings
),
scored AS (
  SELECT q.qid, e.vec_id, e.ivf_cell,
         round({dot} / ({nrm_e} * {nrm_q}), 9) AS cosine
  FROM cells e JOIN probe p ON e.ivf_cell = p.ci JOIN q ON q.qid = p.qid
)
SELECT qid, vec_id, ivf_cell, cosine, CAST(rank AS INTEGER) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
) WHERE rank <= {_S09_K}
"""


@df_query(
    "s12_ivf_probe_batched",
    "Batched IVF probe search: N query vectors through ONE corpus "
    "assignment pass — probe-cell selection and the final top-k both "
    "windowed per query id (round-5: the single-query path used global "
    "limits that silently mixed candidates across queries).",
    _s12_oracle(),
)
def s12(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    emb = spark.table("embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id").isin(*_S12_QIDS)).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    return similarity.ivf_probe_topk(
        emb,
        "vec_id",
        "embedding",
        _ivf_centroids(),
        queries,
        k=_S09_K,
        nprobe=_S09_NPROBE,
        query_id_col="qid",
    )


# ---------------------------------------------------------------------------
# d22 — duplicate span detection (passage-level dedup, Lee et al. 2022)
# ---------------------------------------------------------------------------

_D22_N = 5
_D22_MIN_TOKENS = 8

_D22_ORACLE = f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS toks
  FROM documents
),
g AS (
  SELECT doc_id, i AS pos,
         array_to_string(toks[i : i + {_D22_N - 1}], ' ') AS gram
  FROM t, unnest(range(1, greatest(len(toks) - {_D22_N - 1}, 0) + 1)) u(i)
),
shared AS (
  SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
),
marked AS (
  SELECT g.doc_id, g.pos FROM g JOIN shared USING (gram)
),
runs AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS run
  FROM marked
)
SELECT doc_id,
       CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos) + {_D22_N - 1} AS BIGINT) AS span_end,
       CAST(MAX(pos) + {_D22_N - 1} - MIN(pos) + 1 AS BIGINT) AS span_tokens
FROM runs
GROUP BY doc_id, run
HAVING MAX(pos) + {_D22_N - 1} - MIN(pos) + 1 >= {_D22_MIN_TOKENS}
"""


@df_query(
    "d22_duplicate_spans",
    "Passage-level dedup: maximal cross-document duplicated token spans "
    "(gram doc-frequency -> consecutive-position run merge). One gram-keyed "
    "aggregate + shuffle join + one per-doc window — no suffix array, "
    "nothing broadcast, nothing quadratic.",
    _D22_ORACLE,
)
def d22(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return dedup.duplicate_spans(
        spark.table("documents").select("doc_id", "text"),
        "doc_id",
        "text",
        n=_D22_N,
        min_tokens=_D22_MIN_TOKENS,
    )


# ---------------------------------------------------------------------------
# s10 — approximate kNN graph (bucket-blocked top-k neighbours per vector)
# ---------------------------------------------------------------------------

_S10_K = 3
_S10_BITS = 6  # 64 buckets: ~8/bucket at sf0.01, ~78/bucket at sf0.1


def _s10_oracle(dim: int = 64, bits: int = _S10_BITS, seed: int = 42) -> str:
    planes = similarity._pseudo_hyperplanes(dim, bits, seed)

    def bucket(col: str) -> str:
        terms = []
        for kbit, plane in enumerate(planes):
            arr = "[" + ", ".join(f"CAST({w:.17g} AS DOUBLE)" for w in plane) + "]"
            dot = (
                f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
                f"list_transform({col}, (x, i) -> CAST(x AS DOUBLE) * ({arr})[i])), "
                f"(acc, v) -> acc + v)"
            )
            terms.append(f"CASE WHEN {dot} > 0 THEN {1 << kbit} ELSE 0 END")
        return " + ".join(terms)

    dot_ab = (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        "list_transform(list_zip(a.v, b.v), "
        "t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE))), (x, y) -> x + y)"
    )
    nrm = (
        "sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        "list_transform({s}.v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), "
        "(x, y) -> x + y))"
    )
    cos = f"round({dot_ab} / ({nrm.format(s='a')} * {nrm.format(s='b')}), 9)"
    return f"""
WITH e AS (
  SELECT vec_id, embedding AS v, CAST({bucket('embedding')} AS BIGINT) AS b
  FROM embeddings
),
scored AS (
  SELECT a.vec_id, b.vec_id AS neighbor_id, {cos} AS cosine
  FROM e a JOIN e b ON a.b = b.b AND a.vec_id <> b.vec_id
)
SELECT vec_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
  SELECT vec_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {_S10_K}
"""


@df_query(
    "s10_knn_graph",
    "Approximate kNN graph: per-vector top-3 cosine neighbours within "
    "sign-random-projection LSH buckets (bucket-blocked self-join, per-id "
    "rank window) — the retrieval/dedup graph construction pass.",
    _s10_oracle(),
)
def s10(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return similarity.knn_graph(
        spark.table("embeddings").select("vec_id", "embedding"),
        "vec_id",
        "embedding",
        dim=64,
        k=_S10_K,
        bits=_S10_BITS,
    )


# ---------------------------------------------------------------------------
# s11 — multi-probe LSH ANN (query's bucket + hamming-1 buckets, re-rank)
# ---------------------------------------------------------------------------

_S11_BITS = 8
_S11_K = 5


def _s11_oracle(dim: int = 64, bits: int = _S11_BITS, seed: int = 42, k: int = _S11_K) -> str:
    bucket_sql = _s03_oracle(dim, bits, seed)
    bucket_expr = bucket_sql.split("SELECT vec_id, ")[1].split(" AS lsh_bucket")[0]
    cos = (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        "list_transform(d.embedding, (x, i) -> CAST(x AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))), "
        "(a, b) -> a + b) "
        "/ (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        "list_transform(d.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), "
        "(a, b) -> a + b)) "
        "* sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        "list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), "
        "(a, b) -> a + b)))"
    )
    flips = ", ".join(f"xor(qb, {1 << i})" for i in range(bits))
    return f"""
WITH b AS (SELECT vec_id, embedding, {bucket_expr} AS lsh_bucket FROM embeddings),
q AS (SELECT lsh_bucket AS qb, embedding AS qv FROM b WHERE vec_id = 0),
probes AS (SELECT unnest([qb, {flips}]) AS pb FROM q),
d AS (
  SELECT DISTINCT b.vec_id, b.embedding
  FROM b JOIN probes ON b.lsh_bucket = probes.pb
  WHERE b.vec_id <> 0
)
SELECT vec_id, round({cos}, 9) AS cosine
FROM d, q
ORDER BY cosine DESC, vec_id
LIMIT {k}
"""


@df_query(
    "s11_multiprobe_ann_topk",
    "Multi-probe LSH ANN top-5: the query probes its own bucket plus every "
    "hamming-1 bucket (Lv et al. VLDB'07 recall knob), exact cosine re-rank "
    "of the candidate union — probe expansion on the query side only.",
    _s11_oracle(),
)
def s11(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    emb = spark.table("embeddings").select("vec_id", "embedding")
    buckets = similarity.rp_lsh_buckets(
        emb, "embedding", dim=64, bits=_S11_BITS, seed=42
    )
    q = similarity.multiprobe_buckets(
        buckets.filter(F.col("vec_id") == 0).select(
            F.col("lsh_bucket"), F.col("embedding").alias("__qvec")
        ),
        bits=_S11_BITS,
    ).select("probe_bucket", "__qvec")
    # no distinct: a corpus vector has ONE bucket and the 9 probe
    # values are distinct, so each candidate matches at most one probe
    # — a dedup here would shuffle the embedding vectors for nothing
    cands = (
        buckets.filter(F.col("vec_id") != 0)
        .join(F.broadcast(q), F.col("lsh_bucket") == F.col("probe_bucket"))
        .select("vec_id", "embedding", "__qvec")
    )
    return (
        cands.select(
            "vec_id",
            F.round(similarity.cosine_to("embedding", "__qvec"), 9).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(_S11_K)
    )


# ---------------------------------------------------------------------------
# d23 — character entropy (quality signal: degenerate / junk detection)
# ---------------------------------------------------------------------------

_D23_ORACLE = """
WITH c AS (
  SELECT doc_id, string_split(text, '') AS chars FROM documents
)
SELECT doc_id,
       CASE WHEN len(chars) = 0 THEN 0.0 ELSE
         round(-list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_transform(list_sort(list_distinct(chars)),
             ch -> (CAST(len(list_filter(chars, x -> x = ch)) AS DOUBLE)
                    / len(chars))
                   * log2(CAST(len(list_filter(chars, x -> x = ch)) AS DOUBLE)
                          / len(chars)))),
           (a, b) -> a + b), 6)
       END AS entropy_bits,
       CAST(len(list_distinct(chars)) AS INTEGER) AS n_distinct_chars
FROM c
"""


@df_query(
    "d23_char_entropy",
    "Per-document character entropy (bits/char): degenerate generations and "
    "binary junk sit at the extremes — row-local, fold over sorted distinct "
    "chars so the float sum is engine-deterministic.",
    _D23_ORACLE,
)
def d23(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.table("documents").select(
        "doc_id",
        text.char_entropy("text").alias("entropy_bits"),
        F.size(F.array_distinct(F.split(F.col("text"), ""))).alias(
            "n_distinct_chars"
        ),
    )


# ---------------------------------------------------------------------------
# d24 — URL extraction + canonicalization (link graph / URL dedup pass)
# ---------------------------------------------------------------------------
#
# The corpus carries no URLs, so (like the PII query) each document
# plants deterministic ones — messy case, default ports, fragments,
# trailing slashes — with the same expression in both engines; the
# operator chain must normalize them to identical canonical forms.

_D24_PLANT_SPARK = (
    "concat(text, ' see HTTPS://Host', CAST(doc_id % 5 AS STRING),"
    "'.Example.COM:443/P/', CAST(doc_id % 3 AS STRING),"
    "'/#frag also http://ex.org:80/', CAST(doc_id % 2 AS STRING))"
)
_D24_PLANT_DUCK = (
    "text || ' see HTTPS://Host' || CAST(doc_id % 5 AS VARCHAR)"
    " || '.Example.COM:443/P/' || CAST(doc_id % 3 AS VARCHAR)"
    " || '/#frag also http://ex.org:80/' || CAST(doc_id % 2 AS VARCHAR)"
)

_D24_ORACLE = f"""
WITH planted AS (
  SELECT doc_id, {_D24_PLANT_DUCK} AS body FROM documents
),
urls AS (
  SELECT doc_id,
         unnest(regexp_extract_all(body, '(?i)https?://[^\\s]+')) AS u
  FROM planted
),
canon AS (
  SELECT doc_id,
         sh2 || regexp_replace(rest, '/+$', '') AS url
  FROM (
    SELECT doc_id, rest,
           CASE WHEN sh LIKE 'http://%' AND sh LIKE '%:80'
                  THEN left(sh, length(sh) - 3)
                WHEN sh LIKE 'https://%' AND sh LIKE '%:443'
                  THEN left(sh, length(sh) - 4)
                ELSE sh END AS sh2
    FROM (
      SELECT doc_id,
             lower(regexp_extract(u1, '(?i)^https?://[^/?]+')) AS sh,
             substr(u1, length(regexp_extract(u1, '(?i)^https?://[^/?]+')) + 1)
               AS rest
      FROM (SELECT doc_id, split_part(u, '#', 1) AS u1 FROM urls)
    )
  )
)
SELECT url, COUNT(*) AS n_refs, COUNT(DISTINCT doc_id) AS n_docs
FROM canon GROUP BY url
"""


@df_query(
    "d24_url_canonicalize",
    "URL extraction + canonicalization (fragment strip, scheme/host "
    "lowercase, default-port and trailing-slash removal) aggregated into a "
    "link-frequency table — row-local string expressions, one uniform-key "
    "groupBy; the backref-free steps run verbatim in both regex engines.",
    _D24_ORACLE,
)
def d24(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    planted = spark.table("documents").select(
        "doc_id", F.expr(_D24_PLANT_SPARK).alias("body")
    )
    urls = planted.select(
        "doc_id", F.explode(text.extract_urls("body")).alias("u")
    )
    return (
        urls.select("doc_id", text.canonicalize_url("u").alias("url"))
        .groupBy("url")
        .agg(
            F.count(F.lit(1)).alias("n_refs"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
    )


# ---------------------------------------------------------------------------
# d25 — containment pairs (asymmetric near-dup: quote/subset detection)
# ---------------------------------------------------------------------------

_D25_TAU = 0.5

_D25_ORACLE = f"""
WITH g AS (
  SELECT doc_id, lang, source,
         list_distinct(list_transform(
           range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
           i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS grams
  FROM documents
),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.grams, b.grams)) AS inter,
         len(a.grams) AS na, len(b.grams) AS nb
  FROM g a JOIN g b
    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       round(inter / greatest(na + nb - inter, 1), 6) AS jaccard,
       round(inter / greatest(na, 1), 6) AS containment_a,
       round(inter / greatest(nb, 1), 6) AS containment_b
FROM p
WHERE round(inter / greatest(na, 1), 6) >= {_D25_TAU}
   OR round(inter / greatest(nb, 1), 6) >= {_D25_TAU}
"""


@df_query(
    "d25_containment_pairs",
    "Asymmetric near-dup verifier: n-gram containment per side over blocked "
    "pairs — a short document quoted whole inside a long one has near-1 "
    "containment but low Jaccard, so symmetric thresholds miss it.",
    _D25_ORACLE,
)
def d25(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text", "lang", "source")
    pairs = dedup.ngram_jaccard_pairs(
        docs,
        "doc_id",
        "text",
        n=3,
        block_cols=["lang", "source"],
        include_containment=True,
    )
    from lagoon_spark.checkpointing import handles, pin_handles

    return pin_handles(
        pairs.filter(
            (F.col("containment_a") >= _D25_TAU)
            | (F.col("containment_b") >= _D25_TAU)
        ),
        *handles(pairs),
    )


# ---------------------------------------------------------------------------
# d26 — survivor selection: one canonical doc per near-dup cluster
# ---------------------------------------------------------------------------


def _d26_oracle() -> str:
    return _d11_ctes() + """,
clusters AS (
  SELECT node AS doc_id, MIN(reach) AS cluster FROM walk GROUP BY node
),
q AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS DOUBLE)
           AS quality
  FROM documents
)
SELECT c.doc_id, c.cluster, q.quality,
       (row_number() OVER (PARTITION BY c.cluster
                           ORDER BY q.quality DESC, c.doc_id) = 1)
         AS is_canonical
FROM clusters c JOIN q ON q.doc_id = c.doc_id
"""


@df_query(
    "d26_keep_canonical",
    "Survivor selection: MinHash-LSH near-dup clusters, then exactly one "
    "canonical document per cluster (highest quality, ties toward the "
    "lowest id) — the which-copy-survives policy of a web-scale dedup pass.",
    _d26_oracle(),
)
def d26(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text")
    return dedup.keep_canonical(
        docs, "doc_id", "text",
        num_hashes=16, bands=4, rows_per_band=4, min_matches=8,
    )


# ---------------------------------------------------------------------------
# d27 — hashed linear quality scorer (fasttext-style serving plan)
# ---------------------------------------------------------------------------

from lagoon_spark.oracle_fragments import D27_FPS as _D27_FPS

_D27_ORACLE = f"""
WITH f AS (SELECT doc_id, {_D27_FPS} AS fps FROM documents),
s AS (
  SELECT doc_id, len(fps) AS n,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(fps,
             x -> (CAST(x % 2001 AS DOUBLE) - 1000.0) / 1000.0)),
           (a, b) -> a + b) AS sw
  FROM f
)
SELECT doc_id,
       round(1.0 / (1.0 + exp(-(CASE WHEN n > 0 THEN sw / n ELSE 0.0 END))), 9)
         AS quality_score
FROM s
"""


@df_query(
    "d27_hashed_linear_score",
    "Hashed linear text classifier scoring (the fastText/CCNet "
    "quality-filter serving shape): token feature-hash -> fixed weight "
    "table -> mean -> sigmoid, one row-local codegen expression.",
    _D27_ORACLE,
)
def d27(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.table("documents").select(
        "doc_id",
        text.hashed_linear_score("text").alias("quality_score"),
    )


# ---------------------------------------------------------------------------
# d28 — hashed linear scorer serving TRAINED weights (round-5 verdict #6)
# ---------------------------------------------------------------------------
#
# d27's pseudo-weight arithmetic stands in for a weight table; this
# entry serves an actual coefficient vector through the same plan:
# element_at(<weight array>, fp % F + 1) — the feature-hashing trick,
# so any vocabulary serves through a fixed-size broadcast table. The
# coefficients are multiples of 1/64 (binary-exact), so the DuckDB
# twin's literal list converts to DOUBLE losslessly and the float fold
# hash-matches.

from lagoon_spark.oracle_fragments import D28_F as _D28_F
from lagoon_spark.oracle_fragments import D28_WEIGHTS as _D28_WEIGHTS

_D28_ORACLE = f"""
WITH f AS (SELECT doc_id, {_D27_FPS} AS fps FROM documents),
s AS (
  SELECT doc_id, len(fps) AS n,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(fps,
             x -> CAST(list_extract([{", ".join(repr(w) for w in _D28_WEIGHTS)}],
                       CAST(x % {_D28_F} AS INT) + 1) AS DOUBLE))),
           (a, b) -> a + b) AS sw
  FROM f
)
SELECT doc_id,
       round(1.0 / (1.0 + exp(-(CASE WHEN n > 0 THEN sw / n ELSE 0.0 END))), 9)
         AS quality_score
FROM s
"""


@df_query(
    "d28_trained_quality_score",
    "Hashed linear classifier serving a trained coefficient table: "
    "element_at(weights, fp % F + 1) lookup, mean, sigmoid — identical "
    "map-only codegen plan as d27, real weights instead of arithmetic.",
    _D28_ORACLE,
)
def d28(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.table("documents").select(
        "doc_id",
        text.hashed_linear_score("text", weights=_D28_WEIGHTS).alias(
            "quality_score"
        ),
    )


# ---------------------------------------------------------------------------
# d29 — DSIR importance resampling (Xie et al., NeurIPS 2023)
# ---------------------------------------------------------------------------
#
# Select raw documents whose hashed-n-gram distribution matches a target
# corpus (here: the English subset) — importance weights over a
# fixed-size feature-hash table, per-doc order-pinned log-weight fold,
# Gumbel-top-k resample under the deterministic portable id hash.

_D29_B = 512
_D29_K = 50

_D29_ORACLE = f"""
WITH f AS (SELECT doc_id, lang, {_D27_FPS} AS fps FROM documents),
g AS (
  SELECT doc_id, lang,
         flatten(list_transform(range(1, len(fps) + 1),
           i -> CASE WHEN i < len(fps)
                THEN [CAST(fps[i] % {_D29_B} AS INT),
                      CAST(((fps[i] * {text.MULT} + fps[i + 1])
                            % {MOD}) % {_D29_B} AS INT)]
                ELSE [CAST(fps[i] % {_D29_B} AS INT)] END)) AS grams
  FROM f),
tc AS (SELECT bucket, COUNT(*) AS ct
       FROM (SELECT unnest(grams) AS bucket FROM g WHERE lang = 'en')
       GROUP BY bucket),
rc AS (SELECT bucket, COUNT(*) AS cr
       FROM (SELECT unnest(grams) AS bucket FROM g) GROUP BY bucket),
jx AS (SELECT COALESCE(tc.bucket, rc.bucket) AS bucket,
              COALESCE(ct, 0) AS ct, COALESCE(cr, 0) AS cr
       FROM tc FULL OUTER JOIN rc ON tc.bucket = rc.bucket),
tot AS (SELECT SUM(ct) AS tt, SUM(cr) AS rt FROM jx),
lr AS (SELECT bucket,
              ln((ct + 1.0) / (tt + 1.0 * {_D29_B}))
              - ln((cr + 1.0) / (rt + 1.0 * {_D29_B})) AS log_ratio
       FROM jx, tot),
docg AS (SELECT g.doc_id, t.i AS pos, grams[t.i] AS bucket
         FROM g, UNNEST(range(1, len(grams) + 1)) AS t(i)),
sc AS (SELECT d.doc_id,
              list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list(COALESCE(lr.log_ratio, 0.0) ORDER BY d.pos)),
                (a, b) -> a + b) AS w
       FROM docg d LEFT JOIN lr USING (bucket) GROUP BY d.doc_id),
scored AS (SELECT a.doc_id, round(COALESCE(sc.w, 0.0), 9) AS dsir_logweight
           FROM (SELECT doc_id FROM documents) a LEFT JOIN sc USING (doc_id)),
keyed AS (SELECT doc_id, dsir_logweight,
                 round(dsir_logweight
                       + -ln(-ln((({corpus.duck_id_hash('doc_id')}) + 0.5)
                                 / {corpus.HASH_MOD}.0)), 9) AS gumbel_key
          FROM scored)
SELECT doc_id, dsir_logweight, gumbel_key
FROM keyed ORDER BY gumbel_key DESC, doc_id LIMIT {_D29_K}
"""


@df_query(
    "d29_dsir_resample",
    "DSIR importance resampling (Xie et al., NeurIPS 2023): hashed "
    "unigram+bigram importance weights target-vs-raw, order-pinned "
    "per-doc log-weight fold, Gumbel-top-k selection — the "
    "train-like-the-target data selection pass.",
    _D29_ORACLE,
)
def d29(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text")
    # the target is a SUBSET of the scored corpus (lang='en'), so the
    # importance model fits in ONE gram pass via the flagged counts
    # (identical ratios to the two-frame fit; guide §2.3) — scoring is
    # then the only other corpus pass
    flagged = spark.table("documents").select(
        "text", (F.col("lang") == "en").alias("__tgt")
    )
    ratios = corpus.dsir_log_ratios_flagged(
        flagged, "__tgt", "text", buckets=_D29_B
    )
    return corpus.dsir_resample(
        docs, "doc_id", "text", None, k=_D29_K, buckets=_D29_B,
        ratios_df=ratios,
    )


# ---------------------------------------------------------------------------
# d30 — hashed bigram LM perplexity (CCNet-style quality filter)
# ---------------------------------------------------------------------------
#
# Wenzek et al. 2020 filter corpora by LM perplexity under a model
# trained on a trusted reference; a feature-hashed bigram count LM with
# Stupid Backoff (Brants et al. 2007) stands in for KenLM with the
# identical serving shape: broadcast count tables, one token-scale lag
# window, order-pinned per-doc log-prob fold.

_D30_B1 = 4096
_D30_B2 = 65536

_D30_ORACLE = f"""
WITH f AS (SELECT doc_id, lang, {_D27_FPS} AS fps FROM documents),
refu AS (SELECT CAST(u % {_D30_B1} AS INT) AS bucket, COUNT(*) AS c1
         FROM (SELECT unnest(fps) AS u FROM f WHERE lang = 'en')
         GROUP BY bucket),
refb AS (SELECT CAST(((fps[i] * {text.MULT} + fps[i + 1]) % {MOD})
                     % {_D30_B2} AS INT) AS bucket, COUNT(*) AS c2
         FROM f, UNNEST(range(1, len(fps))) AS t(i)
         WHERE lang = 'en' GROUP BY bucket),
tot AS (SELECT SUM(c1) AS n FROM refu),
toks AS (SELECT doc_id, t.i AS pos, fps[t.i] AS fp,
                CASE WHEN t.i > 1 THEN fps[t.i - 1] END AS prev_fp
         FROM f, UNNEST(range(1, len(fps) + 1)) AS t(i)),
lp AS (SELECT toks.doc_id, toks.pos,
              CASE WHEN prev_fp IS NULL THEN NULL
                   WHEN COALESCE(b.c2, 0) > 0 AND COALESCE(p.c1, 0) > 0
                     THEN ln(CAST(b.c2 AS DOUBLE) / p.c1)
                   ELSE ln(0.4 * (COALESCE(cu.c1, 0) + 1.0)
                           / (tot.n + {_D30_B1})) END AS logp
       FROM toks CROSS JOIN tot
       LEFT JOIN refu cu ON cu.bucket = CAST(toks.fp % {_D30_B1} AS INT)
       LEFT JOIN refu p ON p.bucket = CAST(toks.prev_fp % {_D30_B1} AS INT)
       LEFT JOIN refb b
         ON b.bucket = CAST(((toks.prev_fp * {text.MULT} + toks.fp)
                             % {MOD}) % {_D30_B2} AS INT)),
sc AS (SELECT doc_id,
              list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list(COALESCE(logp, 0.0) ORDER BY pos)), (a, b) -> a + b) AS s,
              SUM(CASE WHEN logp IS NOT NULL THEN 1 ELSE 0 END) AS nsc
       FROM lp GROUP BY doc_id)
SELECT a.doc_id,
       CASE WHEN COALESCE(sc.nsc, 0) > 0
            THEN round(exp(-(sc.s / sc.nsc)), 6) END AS ppl
FROM (SELECT doc_id FROM documents) a LEFT JOIN sc USING (doc_id)
"""


@df_query(
    "d30_lm_perplexity",
    "CCNet-style LM perplexity filter: hashed bigram count LM with "
    "Stupid Backoff trained on the English reference subset, per-doc "
    "perplexity via an order-pinned log-prob fold — the quality gate "
    "that keeps reference-like text.",
    _D30_ORACLE,
)
def d30(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text")
    ref = spark.table("documents").filter(F.col("lang") == "en").select("text")
    uni, bi = corpus.hashed_bigram_lm(ref, "text", _D30_B1, _D30_B2)
    return corpus.lm_perplexity(
        docs, "doc_id", "text", uni, bi, _D30_B1, _D30_B2
    )


# ---------------------------------------------------------------------------
# d32 — full Gopher document-quality rule set (Rae et al. 2021, Table A1)
# ---------------------------------------------------------------------------
#
# The non-repetition half of Gopher's quality filter (d18/d31 carry the
# repetition half): word-count and mean-word-length bounds, the
# alphabetic-word fraction, the 8-word stopword requirement, the
# symbol-to-word ratio, and the two line-shape rules (bullet starts,
# ellipsis ends). The corpus has no line structure or symbols, so each
# document plants a deterministic multi-line body — numeric words,
# '#' runs, bullet blocks (10 lines on every 10th doc to cross the 0.9
# threshold), ellipsis lines — with the same expression in both
# engines; the operator then computes every signal and the conjunction
# keep flag. Pure row-local map: no shuffle, no Python, composes with
# d18/d31 for the complete published rule set.

_D32_PLANT_SPARK = (
    "concat(text,"
    " CASE WHEN doc_id % 3 = 0 THEN ' 1 22 333 4444' ELSE '' END,"
    " CASE WHEN doc_id % 7 = 0 THEN ' ### #' ELSE '' END,"
    " CASE WHEN doc_id % 5 = 0 THEN repeat(concat(chr(10), '- bullet line'),"
    "   CASE WHEN doc_id % 10 = 0 THEN 10 ELSE 2 END) ELSE '' END,"
    " CASE WHEN doc_id % 4 = 0 THEN concat(chr(10), 'to be continued...')"
    "   ELSE '' END)"
)
_D32_PLANT_DUCK = (
    "text"
    " || CASE WHEN doc_id % 3 = 0 THEN ' 1 22 333 4444' ELSE '' END"
    " || CASE WHEN doc_id % 7 = 0 THEN ' ### #' ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN repeat(chr(10) || '- bullet line',"
    "      CASE WHEN doc_id % 10 = 0 THEN 10 ELSE 2 END) ELSE '' END"
    " || CASE WHEN doc_id % 4 = 0 THEN chr(10) || 'to be continued...'"
    "      ELSE '' END"
)

_D32_MIN_WORDS = 10
_D32_MAX_WORDS = 1000

_D32_STOPS = ", ".join(f"'{s}'" for s in text.GOPHER_STOPWORDS)

_D32_ORACLE = f"""
WITH planted AS (
  SELECT doc_id, {_D32_PLANT_DUCK} AS body FROM documents
),
t AS (
  SELECT doc_id, body,
         list_filter(string_split_regex(body, '[ \n]'), w -> w <> '') AS w,
         list_filter(string_split(body, chr(10)), l -> l <> '') AS lines
  FROM planted
),
sig AS (
  SELECT doc_id,
    CAST(len(w) AS BIGINT) AS n_words,
    round(list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(w, x -> CAST(length(x) AS BIGINT))),
          (a, b) -> a + b) / greatest(len(w), 1), 6) AS mean_word_len,
    round(len(list_filter(w, x -> regexp_matches(lower(x), '[a-z]')))
          / greatest(len(w), 1), 6) AS alpha_word_frac,
    CAST(len(list_filter(w, x -> list_contains([{_D32_STOPS}], lower(x))))
         AS BIGINT) AS n_stopwords,
    round(((length(body) - length(replace(body, '#', '')))
           + (length(body) - length(replace(body, '...', ''))) / 3)
          / greatest(len(w), 1), 6) AS symbol_word_ratio,
    round(len(list_filter(lines, l -> l LIKE '- %' OR l LIKE '* %'))
          / greatest(len(lines), 1), 6) AS bullet_line_frac,
    round(len(list_filter(lines, l -> l LIKE '%...'))
          / greatest(len(lines), 1), 6) AS ellipsis_line_frac
  FROM t
)
SELECT *,
       (n_words BETWEEN {_D32_MIN_WORDS} AND {_D32_MAX_WORDS})
       AND (mean_word_len BETWEEN 3.0 AND 10.0)
       AND alpha_word_frac >= 0.8
       AND n_stopwords >= 2
       AND symbol_word_ratio <= 0.1
       AND bullet_line_frac <= 0.9
       AND ellipsis_line_frac <= 0.3 AS keep
FROM sig
"""


@df_query(
    "d32_gopher_quality",
    "Full Gopher (Rae et al. 2021 Table A1) quality rule set: word/length "
    "bounds, alphabetic-word fraction, stopword requirement, symbol ratio, "
    "bullet/ellipsis line shapes → per-signal columns + conjunction keep "
    "flag (row-local JVM map over a planted multi-line body).",
    _D32_ORACLE,
)
def d32(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    docs = spark.table("documents").select(
        "doc_id", F.expr(_D32_PLANT_SPARK).alias("__body")
    )
    sig = text.gopher_signals("__body")
    keep = text.gopher_keep(
        sig, min_words=_D32_MIN_WORDS, max_words=_D32_MAX_WORDS
    )
    return docs.select(
        "doc_id",
        *[v.alias(k) for k, v in sig.items()],
        keep.alias("keep"),
    )


# ---------------------------------------------------------------------------
# d33 — C4 page cleaning (Raffel et al. 2020, §2.2)
# ---------------------------------------------------------------------------
#
# The classic web-corpus first pass: line-level terminal-punctuation /
# min-words / "javascript" rules, page-level "lorem ipsum" / curly-
# brace / min-sentences drops. The corpus is single-line symbol-free
# words, so each document plants a deterministic multi-line page —
# a good first sentence, a too-short line, an unpunctuated line, and
# (by doc_id residue) a javascript line, two extra good sentences, a
# lorem-ipsum line, a code line with braces — the same expression in
# both engines.

from lagoon_spark.oracle_fragments import (
    D33_PLANT_DUCK as _D33_PLANT_DUCK,
    D33_PLANT_SPARK as _D33_PLANT_SPARK,
)

_D33_ORACLE = (
    "WITH planted AS (\n"
    "  SELECT doc_id, " + _D33_PLANT_DUCK + " AS body FROM documents\n"
    "),\n"
    "t AS (\n"
    "  SELECT doc_id, body,\n"
    "         list_filter(string_split(body, chr(10)), l -> l <> '') AS lines\n"
    "  FROM planted\n"
    "),\n"
    "k AS (\n"
    "  SELECT doc_id, body, lines,\n"
    "         list_filter(lines, l ->\n"
    "           (l LIKE '%.' OR l LIKE '%!' OR l LIKE '%?' OR l LIKE '%\"')\n"
    "           AND len(list_filter(string_split(l, ' '), w -> w <> '')) >= 5\n"
    "           AND NOT contains(lower(l), 'javascript')) AS kept\n"
    "  FROM t\n"
    "),\n"
    "c AS (\n"
    "  SELECT doc_id, body, lines, kept,\n"
    "         array_to_string(kept, chr(10)) AS clean_text\n"
    "  FROM k\n"
    ")\n"
    "SELECT doc_id,\n"
    "       CAST(len(lines) AS INT) AS n_lines,\n"
    "       CAST(len(kept) AS INT) AS n_kept_lines,\n"
    "       CAST(length(clean_text) - length(translate(clean_text, '.!?', ''))\n"
    "            AS INT) AS n_sentences,\n"
    "       NOT (contains(lower(body), 'lorem ipsum') OR contains(body, '{'))\n"
    "       AND (length(clean_text) - length(translate(clean_text, '.!?', ''))\n"
    "            >= 3) AS keep,\n"
    "       clean_text\n"
    "FROM c"
)


@df_query(
    "d33_c4_clean",
    "C4 page cleaning (Raffel et al. 2020): terminal-punctuation / "
    "min-words / javascript line rules, lorem-ipsum / curly-brace / "
    "min-sentences page rules → kept-line reassembly + keep flag "
    "(row-local JVM map over a planted multi-line page).",
    _D33_ORACLE,
)
def d33(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    docs = spark.table("documents").select(
        "doc_id", F.expr(_D33_PLANT_SPARK).alias("__body")
    )
    return corpus.c4_clean(docs, "doc_id", "__body")


# ---------------------------------------------------------------------------
# d34 — per-domain document cap (skew-aware two-phase top-N)
# ---------------------------------------------------------------------------
#
# Crawl corpora are dominated by a few giant domains; capping documents
# per registered domain (RefinedWeb-style content balancing) is a
# top-N-per-key where the key is PATHOLOGICALLY skewed — the planted
# domain map sends 60% of the corpus to one host exactly so the hot
# key is real. The operator runs the two-phase salted cap
# (skew.capped_per_key): no task ever sorts more than its salt slice
# of the hot domain, survivors are metadata-sized. The oracle is the
# semantically-equal single-window plan.

_D34_DOMAIN_SPARK = (
    "CASE WHEN doc_id % 10 < 6 THEN 'big.example.com'"
    " ELSE concat('host', CAST(doc_id % 17 AS STRING), '.example.com') END"
)
_D34_DOMAIN_DUCK = (
    "CASE WHEN doc_id % 10 < 6 THEN 'big.example.com'"
    " ELSE 'host' || CAST(doc_id % 17 AS VARCHAR) || '.example.com' END"
)
_D34_CAP = 25

_D34_ORACLE = f"""
WITH d AS (
  SELECT doc_id, n_chars, {_D34_DOMAIN_DUCK} AS domain FROM documents
),
r AS (
  SELECT doc_id, domain,
         row_number() OVER (PARTITION BY domain
                            ORDER BY n_chars DESC, doc_id) AS domain_rank
  FROM d
)
SELECT doc_id, domain, CAST(domain_rank AS BIGINT) AS domain_rank
FROM r WHERE domain_rank <= {_D34_CAP}
"""


@df_query(
    "d34_domain_cap",
    "Per-domain document cap (content balancing over a 60%-hot domain "
    "key): exact top-25 per domain by quality via the two-phase salted "
    "rank — no straggler sort on the hot key.",
    _D34_ORACLE,
)
def d34(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lagoon_spark.operators.skew import capped_per_key

    register_views(spark, sf_dir)
    d = spark.table("documents").select(
        "doc_id", "n_chars", F.expr(_D34_DOMAIN_SPARK).alias("domain")
    )
    capped = capped_per_key(
        d,
        "domain",
        [F.col("n_chars").desc(), F.col("doc_id").asc()],
        _D34_CAP,
        salt=F.col("doc_id"),
        rank_col="domain_rank",
    )
    return capped.select(
        "doc_id", "domain", F.col("domain_rank").cast("long").alias("domain_rank")
    )


# ---------------------------------------------------------------------------
# c09 — curriculum ordering (quality-staged, shuffled within stage)
# ---------------------------------------------------------------------------
#
# The training-loader ordering pass: stage documents by a quality
# signal (fixed thresholds — never a global quantile sort), shuffle
# deterministically inside each stage, and assign the global serving
# position with the engine's range-partitioned dense numbering (no
# single-task window). Stage signal here is the stopword ratio —
# any scalar score (d28's trained scorer in a real pipeline) slots in.

_C09_T0 = 0.12
_C09_T1 = 0.05

_C09_SCORE_DUCK = (
    "round(len(list_filter(string_split(text, ' '),"
    " w -> list_contains(['the','a','of','and','is','to','in'], w)))"
    " / greatest(len(list_filter(string_split(text, ' '), w -> w <> '')), 1), 6)"
)

_C09_ORACLE = f"""
WITH s AS (
  SELECT doc_id, {_C09_SCORE_DUCK} AS score FROM documents
),
st AS (
  SELECT doc_id,
         CASE WHEN score >= {_C09_T0} THEN 0
              WHEN score >= {_C09_T1} THEN 1
              ELSE 2 END AS stage
  FROM s
)
SELECT doc_id, CAST(stage AS INT) AS stage,
       CAST({{pos}} AS BIGINT) AS curriculum_pos
FROM st
""".replace("{pos}", corpus.duck_curriculum_pos("doc_id", "stage"))


@df_query(
    "c09_curriculum_order",
    "Curriculum ordering: fixed-threshold quality stages, deterministic "
    "in-stage shuffle, global position via range-partitioned dense "
    "numbering (no single-task sort at any size).",
    _C09_ORACLE,
)
def c09(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    docs = spark.table("documents").select(
        "doc_id", text.stopword_ratio("text").alias("__score")
    )
    from lagoon_spark.checkpointing import pin_handles as _ph

    out, _pinned = corpus.curriculum_order(
        docs, "doc_id", "__score", thresholds=(_C09_T0, _C09_T1)
    )
    # the checkpoint backing the numbering rides out as a handle so the
    # bench's per-lane release() can free it
    return _ph(out.select("doc_id", "stage", "curriculum_pos"), _pinned)


# ---------------------------------------------------------------------------
# s13 — product quantization + asymmetric-distance top-k (IVFADC's PQ half)
# ---------------------------------------------------------------------------
#
# Jégou et al. 2011: per-subspace deterministic Lloyd codebooks, every
# vector compressed to m small codes (64-dim float64 → 4 bytes here:
# 128×), queries ranked by table-lookup ADC sums without ever touching
# the original vectors. The oracle re-runs the full per-subspace
# trainer chains (prefixed CTE stacks) and the identical lookup fold.

_S13_M = 4
_S13_K = 16
_S13_ITERS = 2
_S13_TOPK = 10


def _s13_oracle() -> str:
    from lagoon_spark.operators.similarity import pq_adc_oracle_sql

    return pq_adc_oracle_sql(
        "embeddings", "vec_id", "embedding",
        m=_S13_M, k=_S13_K, iters=_S13_ITERS, dim=64,
        query_id=0, topk=_S13_TOPK,
    )


@df_query(
    "s13_pq_adc_topk",
    "Product quantization (Jégou et al. 2011): per-subspace deterministic "
    "codebooks compress vectors 128×, then asymmetric-distance top-k runs "
    "as m broadcast table lookups over the codes column — the memory side "
    "of web-scale ANN.",
    _s13_oracle(),
)
def s13(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lagoon_spark.operators.similarity import pq_adc_topk, pq_fit_encode

    register_views(spark, sf_dir)
    emb = spark.table("embeddings")
    codes, books = pq_fit_encode(
        emb, "vec_id", "embedding", m=_S13_M, k=_S13_K, iters=_S13_ITERS,
        dim=64,
    )
    query = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return pq_adc_topk(codes, "vec_id", books, list(query), topk=_S13_TOPK)


# ---------------------------------------------------------------------------
# d35 — domain-graph PageRank (authority weighting for crawl corpora)
# ---------------------------------------------------------------------------
#
# The Common Crawl-style host ranking: documents plant two outlinks
# each (deterministic domain residues; 6 dst-only domains exercise the
# dangling-mass redistribution), and PageRank runs its iterative
# fixpoint with FIXED-POINT integer rank sums so both engines emit
# bit-identical doubles — the same associativity trick as the k-means
# trainer. The oracle unrolls the identical 3 iterations.

_D35_EDGES_DUCK = """
SELECT 'h' || CAST(doc_id % 23 AS VARCHAR) AS src,
       'h' || CAST((doc_id * 7 + 1) % 29 AS VARCHAR) AS dst
FROM documents
UNION ALL
SELECT 'h' || CAST(doc_id % 23 AS VARCHAR) AS src,
       'h' || CAST((doc_id * 13 + 5) % 29 AS VARCHAR) AS dst
FROM documents
"""


def _d35_oracle() -> str:
    from lagoon_spark.operators.graph import pagerank_oracle_sql

    return pagerank_oracle_sql(_D35_EDGES_DUCK, iters=3)


@df_query(
    "d35_domain_pagerank",
    "PageRank over the planted domain link graph (authority weighting "
    "for crawl corpora): 3 fixed-point iterations — one edge join + one "
    "map-side-combinable aggregate each, dangling mass via a one-row "
    "broadcast, state pinned between rounds.",
    _d35_oracle(),
)
def d35(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lagoon_spark.operators.graph import pagerank

    register_views(spark, sf_dir)
    docs = spark.table("documents")
    e1 = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 23).cast("string")).alias("src"),
        F.concat(F.lit("h"), ((F.col("doc_id") * 7 + 1) % 29).cast("string")).alias("dst"),
    )
    e2 = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 23).cast("string")).alias("src"),
        F.concat(F.lit("h"), ((F.col("doc_id") * 13 + 5) % 29).cast("string")).alias("dst"),
    )
    from lagoon_spark.checkpointing import handles, pin_handles

    pr = pagerank(e1.unionAll(e2), "src", "dst", iters=3)
    # projections drop the handle attribute — re-attach so the bench's
    # per-lane release() frees the pagerank checkpoint
    return pin_handles(
        pr.select(F.col("node"), F.col("pagerank")), *handles(pr)
    )


# ---------------------------------------------------------------------------
# d36 — passage removal: the ExactSubstr REWRITE (Lee et al. 2022)
# ---------------------------------------------------------------------------
#
# d22 detects cross-document duplicated spans; d36 is the transform a
# training pipeline actually runs — rewrite each document with every
# token inside such a span dropped. The rewrite itself is pure JVM
# higher-order array functions over the span arrays joined back per
# doc (transform/filter/exists/array_join): no second corpus explode,
# no Python, nothing quadratic.

_D36_ORACLE = f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS toks
  FROM documents
),
g AS (
  SELECT doc_id, i AS pos,
         array_to_string(toks[i : i + {_D22_N - 1}], ' ') AS gram
  FROM t, unnest(range(1, greatest(len(toks) - {_D22_N - 1}, 0) + 1)) u(i)
),
shared AS (
  SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
),
marked AS (
  SELECT g.doc_id, g.pos FROM g JOIN shared USING (gram)
),
runs AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS run
  FROM marked
),
spans AS (
  SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + {_D22_N - 1} AS span_end
  FROM runs GROUP BY doc_id, run
  HAVING MAX(pos) + {_D22_N - 1} - MIN(pos) + 1 >= {_D22_MIN_TOKENS}
),
tok AS (
  SELECT doc_id, i AS pos, toks[i] AS w
  FROM t, unnest(range(1, len(toks) + 1)) u(i)
),
kept AS (
  SELECT tok.doc_id, tok.pos, tok.w
  FROM tok
  WHERE NOT EXISTS (
    SELECT 1 FROM spans s
    WHERE s.doc_id = tok.doc_id
      AND tok.pos BETWEEN s.span_start AND s.span_end)
),
agg AS (
  SELECT doc_id, string_agg(w, ' ' ORDER BY pos) AS text_clean,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
       coalesce(a.text_clean, '') AS text_clean,
       CAST(len(t.toks) AS BIGINT) AS n_tokens,
       CAST(len(t.toks) - coalesce(a.n_kept, 0) AS BIGINT) AS n_tokens_removed
FROM t LEFT JOIN agg a USING (doc_id)
"""


@df_query(
    "d36_remove_duplicate_spans",
    "Passage REMOVAL (Lee et al. 2022 ExactSubstr rewrite): drop every token "
    "inside a cross-document duplicated span and rejoin — d22's detection "
    "plus one span-array join back; the rewrite is pure JVM higher-order "
    "array functions, no second corpus explode.",
    _D36_ORACLE,
)
def d36(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return dedup.remove_duplicate_spans(
        spark.table("documents").select("doc_id", "text"),
        "doc_id",
        "text",
        n=_D22_N,
        min_tokens=_D22_MIN_TOKENS,
    )
