"""Corpus assembly operators for training-data pipelines: deterministic
sampling, train/val/test splits, document chunking, corpus mixing,
global shuffle, and sequence packing.

These are the operations that turn a cleaned document table into model
training input. None exist in the reference (tweag/lagoon stops at
ingest + SQL); they extend the engine the way SURVEY.md §7 step 9
prescribes. All are pure DataFrame transformations built from JVM-side
expressions — no UDFs, no driver collects.

Scale design:

* **Hash-bucket sampling** replaces `rand()`-based sampling: the keep
  decision is a pure function of the row id, so it is reproducible
  across runs/engines, re-executable per partition (no RNG state), and
  stable under retries/speculative execution — exactly what a 100 TB
  sampling job needs. Map-only: no shuffle at all.
* **Chunking** is a row-local explode: output size ~ tokens/stride per
  document, parallelism follows the input splits.
* **Global shuffle / packing** use one range-partitioned global sort
  (Spark's orderBy) — the canonical distributed shuffle-sort; the only
  whole-data shuffle in the family and unavoidable for a total order.
  Packing then needs only a running sum over the same order (no second
  shuffle: the window rides the sort's partitioning).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from lagoon_spark.operators.text import token_count

# Knuth-style multiplicative hash, exact in int64 for ids < 2^63/MULT;
# ids are reduced mod HASH_MOD first so arbitrary 64-bit ids stay exact.
HASH_MULT = 2654435761
HASH_ADD = 40503
HASH_MOD = 1_000_000_007


def id_hash(id_col: str | Column) -> Column:
    """Deterministic engine-portable hash of an integer id column."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (F.pmod(c, F.lit(HASH_MOD)) * HASH_MULT + HASH_ADD) % HASH_MOD


def id_bucket(id_col: str | Column, buckets: int = 100) -> Column:
    """Stable bucket in [0, buckets) — the sampling/splitting primitive."""
    return id_hash(id_col) % buckets


def duck_id_hash(expr: str) -> str:
    """The identical hash as DuckDB SQL (oracle side)."""
    return f"(({expr}) % {HASH_MOD} * {HASH_MULT} + {HASH_ADD}) % {HASH_MOD}"


def duck_id_bucket(expr: str, buckets: int = 100) -> str:
    return f"({duck_id_hash(expr)}) % {buckets}"


def stratified_sample(
    df: DataFrame, id_col: str, strata_col: str, rates: dict[str, int], default_rate: int
) -> DataFrame:
    """Keep rows where hash-bucket(id) < per-stratum percentage.

    Map-only (no shuffle, no RNG): the sample is a deterministic
    function of (id, stratum), identical on every engine and rerun.
    """
    rate: Column = F.lit(default_rate)
    for key in sorted(rates):
        rate = F.when(F.col(strata_col) == key, F.lit(rates[key])).otherwise(rate)
    return df.withColumn("sample_bucket", id_bucket(id_col)).filter(
        F.col("sample_bucket") < rate
    )


def train_val_test_split(
    df: DataFrame, id_col: str, train_pct: int = 80, val_pct: int = 10
) -> DataFrame:
    """Append a 'split' column: train/val/test by stable hash bucket.

    The holdout assignment must never move between runs or engines —
    hash-bucketing the id guarantees that; `rand()` would not.
    """
    b = id_bucket(id_col)
    return df.withColumn(
        "split",
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def chunk_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int = 64,
    stride: int = 32,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Explode documents into overlapping token windows (size, stride).

    Row-local: tokenize once, generate window starts 0, stride, 2*stride
    … < n_tokens, slice. Output rows = ceil(n/stride) per doc; empty
    documents yield no chunks. The explode is the chunking analog of the
    reference's JSON array split (SURVEY A3) — one input row to many
    output rows with provenance kept. ``keep_cols`` ride along through
    the explode — carrying labels (e.g. a split assignment) here is free
    and map-only, where a join-back after the fact recomputes the whole
    upstream plan a second time and shuffles.
    """
    keep = [F.col(c) for c in (keep_cols or [])]
    toks = F.filter(F.split(F.col(text_col), " "), lambda w: w != F.lit(""))
    base = (
        df.select(F.col(id_col), *keep, toks.alias("__toks"))
        .withColumn("__n", F.size("__toks"))
        .filter(F.col("__n") > 0)
    )
    starts = F.sequence(F.lit(0), F.col("__n") - 1, F.lit(stride))
    chunk = F.slice(F.col("__toks"), F.col("__start") + 1, size)
    return (
        base.select(F.col(id_col), *keep, "__toks", F.explode(starts).alias("__start"))
        .select(
            F.col(id_col),
            *keep,
            (F.col("__start") / stride).cast("int").alias("chunk_idx"),
            F.size(chunk).alias("n_chunk_tokens"),
            F.concat_ws(" ", chunk).alias("chunk_text"),
        )
    )


def global_shuffle(df: DataFrame, id_col: str, pos_col: str = "shuffle_pos"):
    """Deterministic global shuffle: total order by hash(id).

    The position comes from the engine's range-partitioned dense
    numbering (``rowid.dense_order_ix``): a parallel sampled-boundary
    sort over the composite (hash, id) key plus a broadcast
    prefix-offset map — never the single-task window a plain global
    ``row_number`` compiles to (a one-reducer sort is the classic
    100 TB shuffle trap). Determinism comes from the (hash, id)
    composite being a total order; ids must fit 31 bits — larger ids
    raise at run time instead of silently corrupting the order.

    Returns ``(out_df, pinned)`` like ``dense_order_ix``; ``checkpointing.unpin``
    ``pinned`` after materializing ``out_df`` to free the checkpoint.
    """
    key = _guarded_key(
        id_col, 1 << 31, "global_shuffle requires ids in [0, 2^31)"
    )
    out, pinned = _dense_order(
        df.withColumn("__gs_key", key), "__gs_key", pos_col
    )
    return out.drop("__gs_key"), pinned


def _guarded_key(id_col: str, bound: int, msg: str):
    """hash<<31 + id composite, raising row-locally on out-of-range
    ids (the old window implementation accepted any id; the dense
    numbering must not silently reorder or collide instead)."""
    ok = (F.col(id_col) >= 0) & (F.col(id_col) < F.lit(bound))
    key = id_hash(id_col) * F.lit(1 << 31) + F.col(id_col)
    return F.when(ok, key).otherwise(F.raise_error(F.lit(msg)))


def _dense_order(df: DataFrame, order_col: str, out_col: str):
    from lagoon_spark.ingest.rowid import dense_order_ix

    return dense_order_ix(df, order_col, out_col)


def pack_token_offsets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget: int = 1024,
    order_col: str | None = None,
):
    """Concatenation packing: assign each document a global token offset
    and a fixed-budget bin id, in deterministic shuffled order.

    This is the "concat then cut every `budget` tokens" packing used to
    build fixed-length training sequences: tok_offset = running sum of
    token counts over the shuffled order; bin = tok_offset // budget.
    ``order_col`` replaces the default (hash, id) order — pass a
    curriculum position to pack in curriculum order (must be a total
    order, e.g. ``curriculum_order``'s dense output).

    Scale design: the running sum rides
    :func:`lagoon_spark.ingest.rowid.dense_prefix_sum` — a
    range-partitioned parallel sort, per-partition running sums, and a
    broadcast prefix-offset map — never the unpartitioned window a
    naive ``SUM() OVER (ORDER BY …)`` compiles to (a one-task global
    sort, the same trap ``global_shuffle``/``curriculum_order``
    avoid). Default order requires ids in [0, 2^31) (the composite-key
    guard shared with :func:`global_shuffle`).

    Returns ``(out_df, pinned)`` like ``dense_order_ix``; ``checkpointing.unpin``
    ``pinned`` after materializing ``out_df``.
    """
    from lagoon_spark.ingest.rowid import dense_prefix_sum

    carry = [F.col(order_col)] if order_col is not None else []
    base = df.select(
        F.col(id_col), *carry,
        token_count(text_col).cast("long").alias("n_tokens"),
    )
    if order_col is not None:
        key_name = order_col
    else:
        key_name = "__pack_key"
        base = base.withColumn(
            key_name,
            _guarded_key(
                id_col, 1 << 31,
                "pack_token_offsets requires ids in [0, 2^31)",
            ),
        )
    out, pinned = dense_prefix_sum(base, key_name, "n_tokens", "tok_offset")
    out = out.withColumn(
        "bin_id", (F.col("tok_offset") / budget).cast("long")
    ).drop(key_name)
    return out, pinned


def token_budget_sample(
    df: DataFrame,
    id_col: str,
    text_col: str,
    source_col: str,
    budget: int,
) -> DataFrame:
    """Per-source token-budget sampling: walk each source's documents in
    deterministic shuffled order and keep every document that *starts*
    before the source's token budget is exhausted.

    This is how a mixture spec like "2B tokens of web, 500M of code" is
    realized: the cut point is a running sum of token counts over the
    (hash, id) order, so the selected set is a pure function of the data
    — stable across runs, engines, and retries.

    Scale design: one shuffle keyed by source (mixture sources are a
    bounded set). Within a source the running sum is a window over the
    deterministic order. A pathologically hot source is the classic
    skew case — handle it two-phase (per-salt partial sums, then a
    prefix-sum over salt totals, cf. operators/skew.py); at any sane
    source cardinality the direct window is the right plan.
    """
    w = (
        Window.partitionBy(source_col)
        .orderBy(id_hash(id_col).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = df.select(
        F.col(id_col),
        F.col(source_col),
        token_count(text_col).cast("long").alias("n_tokens"),
    ).withColumn("src_tok_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return out.filter(F.col("src_tok_offset") < budget)


def distinct_ngrams(text_col: str, n: int = 3) -> Column:
    """Distinct word ``n``-gram shingles of a text column (row-local).

    Tokenization matches the rest of the library (split on single
    spaces); shingles are space-joined token windows. Returns an empty
    array for texts shorter than ``n`` tokens.
    """
    toks = F.split(F.col(text_col), " ")
    # lower bound 1 (not 0): sequence(1, 0) counts *down* in Spark, and
    # slice(…, 0, …) is a runtime error; the WHEN guard below makes the
    # short-text value irrelevant, this keeps it well-defined too
    grams = F.expr(
        f"transform(sequence(1, greatest(size(split({text_col}, ' ')) - {n - 1}, 1)), "
        f"i -> concat_ws(' ', slice(split({text_col}, ' '), i, {n})))"
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def shared_gram_counts(
    train_df: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
) -> DataFrame:
    """Benchmark decontamination: for each training document, count the
    distinct word ``n``-grams it shares with *any* evaluation document.
    Returns (id, n_shared_grams) for contaminated documents only —
    anti-join the result against the corpus to drop them.

    Scale design: the eval side (benchmarks, held-out sets) is tiny
    relative to a 100 TB corpus, so its distinct-gram dictionary is a
    broadcast build side; the training side explodes shingles and
    probes map-side. The only shuffle is the final per-doc count —
    O(contaminated shingles), not O(corpus).
    """
    eval_grams = (
        eval_df.select(F.explode(distinct_ngrams(text_col, n)).alias("gram"))
        .distinct()
    )
    train_grams = train_df.select(
        F.col(id_col), F.explode(distinct_ngrams(text_col, n)).alias("gram")
    )
    return (
        train_grams.join(F.broadcast(eval_grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


def remove_boilerplate_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_docs: int | None = None,
    max_doc_frac: float | None = None,
    sep: str = "\n",
    out_col: str = "clean_text",
) -> DataFrame:
    """CCNet-style boilerplate removal: drop lines shared by many docs.

    A line (``sep``-delimited segment) is boilerplate when it occurs in
    more than ``max_docs`` documents (or ``max_doc_frac`` of the corpus)
    — headers, footers, cookie banners, license blurbs. Docs are
    reassembled from their surviving lines in original order; a doc
    that was all boilerplate comes back as ''.

    Scale design: explode to (line, doc) — the only data-sized shuffle
    is the line-frequency groupBy (uniform key, map-side combinable;
    hash the line to a fixed-width key first at real scale). The
    frequency table joins back per line, and reassembly is one more
    groupBy on doc id. The corpus-size scalar rides a broadcast
    1-row cross join, never a driver round-trip.
    """
    if (max_docs is None) == (max_doc_frac is None):
        raise ValueError("exactly one of max_docs / max_doc_frac")
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("__pos", "__line"),
    )
    freq = lines.groupBy("__line").agg(
        F.countDistinct(id_col).alias("__dfreq")
    )
    if max_docs is not None:
        keep_cond = F.col("__dfreq") <= F.lit(max_docs)
        joined = lines.join(freq, "__line")
    else:
        total = df.agg(F.count(F.lit(1)).alias("__n"))
        joined = lines.join(freq, "__line").crossJoin(F.broadcast(total))
        keep_cond = F.col("__dfreq") <= F.lit(max_doc_frac) * F.col("__n")
    kept = joined.filter(keep_cond).select(id_col, "__pos", "__line")
    agg = kept.groupBy(id_col).agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                lambda s: s["__line"],
            ),
        ).alias(out_col)
    )
    return df.select(id_col).join(agg, id_col, "left").select(
        id_col, F.coalesce(out_col, F.lit("")).alias(out_col)
    )


def temperature_mix(
    df: DataFrame,
    id_col: str,
    source_col: str,
    *,
    alpha: float = 0.3,
    granularity: int = 1_000_000,
) -> DataFrame:
    """Temperature-scaled multinomial source sampling (the multilingual
    pretraining mixing rule — sampling probabilities ∝ p_s^α, α<1
    up-weights small sources; public method, e.g. Conneau & Lample
    2019, mT5). Realized as deterministic per-source KEEP RATES: r_s =
    p_s^(α-1) / max_t p_t^(α-1) (the smallest source keeps everything,
    larger sources subsample toward the tempered distribution), with
    the portable id hash deciding membership at ``granularity``
    resolution. Returns a per-source report (rate, totals, kept).

    Scale shape: the rate table is one row per source (metadata-sized,
    broadcast); membership is a row-local hash compare; the only
    corpus-scale shuffle is the per-source count/report aggregate
    (map-side combinable). Rates are rounded to 6 decimals BEFORE the
    integer threshold so both engines' ``pow`` agree bit-for-bit on
    the comparison.
    """
    # the rate table is one row per source — unpartitioned windows
    # over it are metadata-sized, never a data-scale single-task sort
    w = Window.partitionBy()
    n = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n"))
    x = n.select(
        source_col,
        "__n",
        F.pow(
            F.col("__n") / F.sum("__n").over(w), F.lit(alpha - 1.0)
        ).alias("__x"),
    )
    rates = x.select(
        source_col,
        "__n",
        F.floor(
            F.round(F.col("__x") / F.max("__x").over(w), 6) * granularity
            + F.lit(0.5)
        ).cast("long").alias("__ppm"),
    )
    kept = (
        id_hash(id_col) % granularity < F.col("__ppm")
    ).cast("long")
    return (
        df.join(F.broadcast(rates), source_col)
        .groupBy(source_col, "__ppm", "__n")
        .agg(F.sum(kept).alias("n_kept"))
        .select(
            source_col,
            F.col("__ppm").alias("keep_rate_ppm"),
            F.col("__n").cast("long").alias("n_total"),
            "n_kept",
        )
    )


_CURR_SHUF_BUCKETS = 1 << 20
_CURR_ID_SPAN = 1 << 30
_CURR_STAGE_SPAN = 1 << 50  # shuf * id span


def curriculum_order(
    df: DataFrame,
    id_col: str,
    score_col: str | Column,
    *,
    thresholds: "tuple[float, ...]",
    stage_col: str = "stage",
    pos_col: str = "curriculum_pos",
):
    """Curriculum ordering: quality-staged buckets, shuffled within.

    ``thresholds`` are descending score cutoffs: stage 0 is
    ``score >= thresholds[0]`` (cleanest, served first), the last
    stage is everything below ``thresholds[-1]``. Within a stage,
    examples are shuffled by the portable id hash (1M buckets, id
    tiebreak) so each stage streams in a deterministic pseudo-random
    order.

    Scale design: stages come from FIXED thresholds — no global sort
    or ntile to find quantile boundaries (compute thresholds offline
    from d17's histogram sketch if they must be data-driven). The
    global position folds (stage, shuffle-hash, id) into one composite
    long and numbers it with :func:`lagoon_spark.ingest.rowid.dense_order_ix`
    — a range-partitioned parallel sort plus a broadcast prefix-offset
    map, never a single-task window. :func:`global_shuffle` numbers its
    (hash, id) key with the same ``dense_order_ix`` scheme — the two
    operators share one scale story.

    Returns ``(out_df, pinned)`` like ``dense_order_ix`` — ``checkpointing.unpin``
    ``pinned`` after materializing. Requires ids in [0, 2^30) and at
    most 8192 stages (composite-key bit budget).
    """
    from lagoon_spark.ingest.rowid import dense_order_ix

    if len(thresholds) + 1 > 8192:
        raise ValueError("too many stages for the composite key")
    if sorted(thresholds, reverse=True) != list(thresholds):
        raise ValueError("thresholds must be descending")
    s = F.col(score_col) if isinstance(score_col, str) else score_col
    stage = F.lit(len(thresholds))
    for i in range(len(thresholds) - 1, -1, -1):
        stage = F.when(s >= F.lit(thresholds[i]), F.lit(i)).otherwise(stage)
    shuf = id_hash(id_col) % _CURR_SHUF_BUCKETS
    key = (
        stage.cast("long") * F.lit(_CURR_STAGE_SPAN)
        + shuf.cast("long") * F.lit(_CURR_ID_SPAN)
        + F.col(id_col)
    )
    ok = (F.col(id_col) >= 0) & (F.col(id_col) < F.lit(_CURR_ID_SPAN))
    key = F.when(ok, key).otherwise(
        F.raise_error(F.lit("curriculum_order requires ids in [0, 2^30)"))
    )
    staged = df.withColumn(stage_col, stage.cast("int")).withColumn(
        "__curr_key", key
    )
    out, pinned = dense_order_ix(staged, "__curr_key", pos_col)
    return out.drop("__curr_key"), pinned


def duck_curriculum_pos(id_expr: str, stage_expr: str) -> str:
    """Oracle-side position: row_number over the identical composite order."""
    shuf = f"({duck_id_hash(id_expr)}) % {_CURR_SHUF_BUCKETS}"
    return (
        f"row_number() OVER (ORDER BY {stage_expr}, {shuf}, {id_expr})"
    )


C4_TERMINALS = (".", "!", "?", '"')


def c4_clean(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_words_per_line: int = 5,
    min_sentences: int = 3,
    line_drop_marker: str = "javascript",
    page_drop_markers: tuple[str, ...] = ("lorem ipsum", "{"),
) -> DataFrame:
    """C4 page cleaning (Raffel et al. 2020, §2.2 — public method).

    Line rules: keep only lines that end in a terminal punctuation
    mark (``. ! ? "``), contain at least ``min_words_per_line`` words,
    and do not mention ``line_drop_marker`` ("javascript" in the
    paper). Page rules: drop any page whose lowercased body contains a
    ``page_drop_markers`` phrase ("lorem ipsum" / a curly brace) or
    whose cleaned text carries fewer than ``min_sentences`` sentences
    (terminal-punctuation count — the paper's sentence heuristic).

    Returns (id, n_lines, n_kept_lines, n_sentences, keep, clean_text).
    Everything is a row-local array/string expression — a pure JVM map
    with no shuffle and no Python, which is what a 100 TB first-pass
    cleaner must be.
    """
    c = F.col(text_col)
    lines = F.filter(F.split(c, "\n"), lambda l: l != F.lit(""))

    def line_ok(l):
        n_words = F.size(F.filter(F.split(l, " "), lambda w: w != F.lit("")))
        term = F.lit(False)
        for t in C4_TERMINALS:
            term = term | l.endswith(t)
        return (
            term
            & (n_words >= F.lit(min_words_per_line))
            & ~F.contains(F.lower(l), F.lit(line_drop_marker))
        )

    kept = F.filter(lines, line_ok)
    clean = F.array_join(kept, "\n")
    n_sent = (
        F.length(clean) - F.length(F.translate(clean, ".!?", ""))
    ).cast("int")
    page_bad = F.lit(False)
    for m in page_drop_markers:
        page_bad = page_bad | F.contains(F.lower(c), F.lit(m))
    return df.select(
        F.col(id_col),
        F.size(lines).cast("int").alias("n_lines"),
        F.size(kept).cast("int").alias("n_kept_lines"),
        n_sent.alias("n_sentences"),
        (~page_bad & (n_sent >= F.lit(min_sentences))).alias("keep"),
        clean.alias("clean_text"),
    )


# ---------------------------------------------------------------------------
# DSIR importance resampling (Xie et al., "Data Selection for Language
# Models via Importance Resampling", NeurIPS 2023 — public method).
#
# Select raw documents whose hashed n-gram distribution looks like a
# TARGET corpus: fit bag-of-hashed-grams importance weights
# log(p_target(bucket) / p_raw(bucket)), score each raw document by the
# sum of its grams' log-ratios, resample top-k under deterministic
# Gumbel noise. Everything is feature-hashed into a fixed bucket table,
# so the importance model is metadata-sized at any corpus scale.
# ---------------------------------------------------------------------------


def dsir_grams(
    df: DataFrame, id_col: str, text_col: str, buckets: int = 8192
) -> DataFrame:
    """The DSIR feature stream: one row per hashed unigram/bigram —
    (``id_col`` if given, ``pos``, ``bucket``) — over the portable
    rolling-hash token fingerprints. Bigrams combine adjacent
    fingerprints with the same (mult, mod) fold so the oracle
    reproduces them exactly; ``pos`` interleaves (unigram_i at 2i,
    bigram_i at 2i+1), pinning the per-document fold order. A
    document with no tokens keeps one NULL-bucket row, so scoring
    never drops it.

    Shape notes (round 12): the fingerprint array materializes ONCE
    through a generator barrier — ``explode(array(fps))`` makes the
    array a concrete attribute, which a projected alias is not
    (CollapseProject inlines an alias into every use site and re-runs
    the whole rolling-hash fold at each; a measured 20× slowdown in
    the naive array-lambda form). Bigram adjacency is then a row-LOCAL
    indexed lambda over the materialized array (``get(fps, i+1)``), so
    the old per-document ``lead`` window — a full token-scale shuffle
    before any aggregation — is gone from the plan entirely (guide
    §2.4: remove shuffles outright)."""
    from lagoon_spark.operators.text import MOD, MULT, word_fingerprints

    base = df.select(
        F.col(id_col),
        F.explode(F.array(word_fingerprints(text_col))).alias("__fps"),
    )
    uni = F.transform(
        "__fps",
        lambda x, i: F.struct(
            (i * 2).alias("pos"),
            F.pmod(x, F.lit(buckets)).cast("int").alias("bucket"),
        ),
    )
    # the last token's partner is get(fps, i+1) == NULL → bucket NULL
    # → filtered, matching the old lead()-isNotNull gate
    bi = F.filter(
        F.transform(
            "__fps",
            lambda x, i: F.struct(
                (i * 2 + 1).alias("pos"),
                F.pmod(
                    F.pmod(x * MULT + F.get("__fps", i + 1), F.lit(MOD)),
                    F.lit(buckets),
                )
                .cast("int")
                .alias("bucket"),
            ),
        ),
        lambda s: s["bucket"].isNotNull(),
    )
    # explode_outer keeps one (NULL pos, NULL bucket) row for an empty
    # document, matching the old posexplode_outer behavior
    return base.select(
        F.col(id_col), F.explode_outer(F.concat(uni, bi)).alias("__g")
    ).select(
        id_col,
        F.col("__g.pos").alias("pos"),
        F.col("__g.bucket").alias("bucket"),
    )


def _gram_bucket_stream(
    df: DataFrame, text_col: str, buckets: int, keep: "tuple[str, ...]" = ()
) -> DataFrame:
    """Bucket-only DSIR gram stream for COUNTING: (``keep``..., bucket)
    rows, no doc ids, no positions, no NULL rows for empty documents —
    the multiset of buckets is identical to :func:`dsir_grams` minus
    its NULL padding, which counting filters anyway. One generator
    barrier (fingerprints fold once), adjacency row-local."""
    from lagoon_spark.operators.text import MOD, MULT, word_fingerprints

    base = df.select(
        *[F.col(c) for c in keep],
        F.explode(F.array(word_fingerprints(text_col))).alias("__fps"),
    )
    uni = F.transform(
        "__fps", lambda x: F.pmod(x, F.lit(buckets)).cast("int")
    )
    bi = F.filter(
        F.transform(
            "__fps",
            lambda x, i: F.pmod(
                F.pmod(x * MULT + F.get("__fps", i + 1), F.lit(MOD)),
                F.lit(buckets),
            ).cast("int"),
        ),
        lambda b: b.isNotNull(),
    )
    return base.select(
        *keep, F.explode(F.concat(uni, bi)).alias("bucket")
    )


def dsir_log_ratios(
    target: DataFrame,
    raw: DataFrame,
    text_col: str,
    buckets: int = 8192,
    smoothing: float = 1.0,
) -> DataFrame:
    """The importance model: (bucket, log_ratio) with add-``smoothing``
    estimates, ``log((ct+s)/(T+sB)) - log((cr+s)/(R+sB))``.

    Scale shape: two explode → count aggregates (partial-aggregated,
    token-count scale), then a full-outer join and a broadcast of the
    one-row totals — the result is ≤ ``buckets`` rows, metadata-sized
    regardless of corpus size, ready to broadcast into scoring."""
    def counts(df: DataFrame, name: str) -> DataFrame:
        # counting needs no doc identity, no positions, no windows —
        # just the bucket multiset (round 12: was a synthesized-id
        # dsir_grams pass paying the full positional machinery)
        return (
            _gram_bucket_stream(df, text_col, buckets)
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(name))
        )

    joined = (
        counts(target, "ct")
        .join(counts(raw, "cr"), "bucket", "full_outer")
        .fillna(0, ["ct", "cr"])
    )
    totals = joined.agg(
        F.sum("ct").alias("__t_total"), F.sum("cr").alias("__r_total")
    )
    s = float(smoothing)
    return joined.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("ct") + s) / (F.col("__t_total") + s * buckets))
            - F.log((F.col("cr") + s) / (F.col("__r_total") + s * buckets))
        ).alias("log_ratio"),
    )


def dsir_log_ratios_flagged(
    df: DataFrame,
    flag_col: str,
    text_col: str,
    buckets: int = 8192,
    smoothing: float = 1.0,
) -> DataFrame:
    """:func:`dsir_log_ratios` for the common case where the target is
    a SUBSET of the raw corpus, marked by boolean ``flag_col``: one
    gram pass and ONE aggregate computes both count columns
    (``ct`` = flagged grams, ``cr`` = all grams), where the two-frame
    form pays two full gram passes plus a full-outer join. Identical
    output for ``target = df.filter(flag)`` / ``raw = df`` — every
    target bucket is a raw bucket, so the outer join degenerates to
    the conditional count. Guide §2.3: aggregate before you shuffle
    (and scan once, not twice)."""
    s = _gram_bucket_stream(df, text_col, buckets, keep=(flag_col,))
    joined = s.groupBy("bucket").agg(
        F.sum(F.when(F.col(flag_col), 1).otherwise(0)).alias("ct"),
        F.count(F.lit(1)).alias("cr"),
    )
    totals = joined.agg(
        F.sum("ct").alias("__t_total"), F.sum("cr").alias("__r_total")
    )
    sm = float(smoothing)
    return joined.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("ct") + sm) / (F.col("__t_total") + sm * buckets))
            - F.log((F.col("cr") + sm) / (F.col("__r_total") + sm * buckets))
        ).alias("log_ratio"),
    )


def dsir_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ratios: DataFrame,
    buckets: int = 8192,
) -> DataFrame:
    """Per-document log importance weight: the sum of its grams'
    log-ratios, folded in GRAM ORDER (the interleaved ``pos`` from
    :func:`dsir_grams`, sorted-struct fold) so the float total is
    order-pinned and engine-reproducible, then rounded to 9 decimals.
    Documents with no tokens score 0.

    Scale shape: explode is token-count scale; the ratio table joins
    broadcast; one partial-aggregated groupBy on the doc id."""
    g = dsir_grams(df, id_col, text_col, buckets)
    j = g.join(F.broadcast(ratios), "bucket", "left")
    folded = F.aggregate(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("pos").alias("pos"),
                    F.coalesce(F.col("log_ratio"), F.lit(0.0)).alias("lr"),
                )
            )
        ),
        F.lit(0.0),
        lambda acc, x: acc + x["lr"],
    )
    return j.groupBy(id_col).agg(
        F.round(folded, 9).alias("dsir_logweight")
    )


def dsir_resample(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target: DataFrame | None,
    k: int,
    buckets: int = 8192,
    smoothing: float = 1.0,
    ratios_df: DataFrame | None = None,
) -> DataFrame:
    """DSIR end to end: fit log-ratios target-vs-``df``, score every
    document, keep the top ``k`` under Gumbel-perturbed weights —
    importance sampling without replacement (the Gumbel-top-k trick).
    The noise is the deterministic portable id hash mapped through
    ``-log(-log(u))``, so the selected set is a pure function of the
    data, reproducible across runs and engines.

    Returns (id, dsir_logweight, gumbel_key), ordered by key desc; the
    final top-k is a TakeOrderedAndProject, never a global sort.

    ``ratios_df`` short-circuits the fit: a pipeline that already
    called :func:`dsir_log_ratios` (or selects repeatedly against one
    fixed target — the serving shape) passes the (bucket, log_ratio)
    frame and pays only scoring; ``target`` may then be None."""
    if ratios_df is not None:
        missing = {"bucket", "log_ratio"} - set(ratios_df.columns)
        if missing:
            raise ValueError(
                f"ratios_df must carry (bucket, log_ratio); missing {sorted(missing)}"
            )
        ratios = ratios_df
    else:
        if target is None:
            raise ValueError("pass target= or ratios_df=")
        ratios = dsir_log_ratios(target, df, text_col, buckets, smoothing)
    scores = dsir_scores(df, id_col, text_col, ratios, buckets)
    u = (id_hash(id_col) + F.lit(0.5)) / F.lit(float(HASH_MOD))
    gumbel = -F.log(-F.log(u))
    return (
        scores.select(
            F.col(id_col),
            F.col("dsir_logweight"),
            F.round(F.col("dsir_logweight") + gumbel, 9).alias("gumbel_key"),
        )
        .orderBy(F.col("gumbel_key").desc(), F.col(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Hashed bigram language-model perplexity (the CCNet-style quality
# filter, Wenzek et al. 2020 — public method — with a feature-hashed
# count LM standing in for KenLM, and Stupid Backoff smoothing,
# Brants et al. 2007).
# ---------------------------------------------------------------------------


def _token_stream(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, tpos, fp, prev_fp) token rows: portable rolling-hash
    fingerprints posexploded (the array is referenced once, so the
    fold runs once per document), previous-token adjacency via one lag
    window keyed on the doc id. Empty documents keep one NULL-fp row."""
    from lagoon_spark.operators.text import word_fingerprints

    tok = df.withColumn("__fps", word_fingerprints(text_col)).select(
        F.col(id_col), F.posexplode_outer("__fps").alias("tpos", "fp")
    )
    return tok.withColumn(
        "prev_fp",
        F.lag("fp").over(Window.partitionBy(id_col).orderBy("tpos")),
    )


def hashed_bigram_lm(
    reference: DataFrame,
    text_col: str,
    uni_buckets: int = 4096,
    bi_buckets: int = 65536,
) -> tuple[DataFrame, DataFrame]:
    """Count a feature-hashed bigram LM over a reference corpus:
    (unigram_counts(bucket, c1), bigram_counts(bucket, c2)). Both
    tables are bucket-bounded — broadcast-sized at any corpus scale —
    which is the point: the trained-KenLM swap keeps this exact serving
    shape (hash buckets → real vocabulary ids)."""
    from lagoon_spark.operators.text import MOD, MULT

    ref = reference.withColumn("__doc", F.monotonically_increasing_id())
    s = _token_stream(ref, "__doc", text_col).filter(F.col("fp").isNotNull())
    uni = (
        s.groupBy(
            F.pmod("fp", F.lit(uni_buckets)).cast("int").alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    bi = (
        s.filter(F.col("prev_fp").isNotNull())
        .groupBy(
            F.pmod(
                F.pmod(F.col("prev_fp") * MULT + F.col("fp"), F.lit(MOD)),
                F.lit(bi_buckets),
            )
            .cast("int")
            .alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    return uni, bi


def lm_perplexity(
    df: DataFrame,
    id_col: str,
    text_col: str,
    uni: DataFrame,
    bi: DataFrame,
    uni_buckets: int = 4096,
    bi_buckets: int = 65536,
    alpha: float = 0.4,
) -> DataFrame:
    """Per-document perplexity under the hashed bigram LM:
    ``exp(-mean log P(w_i | w_{i-1}))`` over tokens 2..n, with Stupid
    Backoff — ``P = c2/c1(prev)`` when the bigram was seen, else
    ``alpha * (c1(w_i)+1)/(N+B1)``. Documents with fewer than two
    tokens return NULL (no scored transitions). The log-prob fold is
    order-pinned (sorted-struct aggregate) and rounded to 6 decimals,
    so scores hash-match across engines.

    Scale shape: the token stream is one lag window keyed on the doc
    id; both count tables and the one-row total broadcast; the per-doc
    aggregate reuses the window's partitioning — one token-scale
    shuffle end to end."""
    from lagoon_spark.operators.text import MOD, MULT

    s = _token_stream(df, id_col, text_col)
    n_total = uni.agg(F.sum("c1").alias("__lm_n"))
    cur = uni.select(F.col("bucket").alias("__cb"), F.col("c1").alias("c1_cur"))
    prev = uni.select(F.col("bucket").alias("__pb"), F.col("c1").alias("c1_prev"))
    big = bi.select(F.col("bucket").alias("__bb"), F.col("c2"))
    j = (
        s.crossJoin(F.broadcast(n_total))
        .join(
            F.broadcast(cur),
            F.pmod("fp", F.lit(uni_buckets)).cast("int") == F.col("__cb"),
            "left",
        )
        .join(
            F.broadcast(prev),
            F.pmod("prev_fp", F.lit(uni_buckets)).cast("int") == F.col("__pb"),
            "left",
        )
        .join(
            F.broadcast(big),
            F.pmod(
                F.pmod(F.col("prev_fp") * MULT + F.col("fp"), F.lit(MOD)),
                F.lit(bi_buckets),
            ).cast("int")
            == F.col("__bb"),
            "left",
        )
    )
    logp = (
        F.when(F.col("prev_fp").isNull(), F.lit(None).cast("double"))
        .when(
            (F.coalesce(F.col("c2"), F.lit(0)) > 0)
            & (F.coalesce(F.col("c1_prev"), F.lit(0)) > 0),
            F.log(F.col("c2") / F.col("c1_prev")),
        )
        .otherwise(
            F.log(
                F.lit(alpha)
                * (F.coalesce(F.col("c1_cur"), F.lit(0)) + 1.0)
                / (F.col("__lm_n") + uni_buckets)
            )
        )
    )
    scored = j.select(F.col(id_col), F.col("tpos"), logp.alias("logp"))
    folded = F.aggregate(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("tpos").alias("tpos"),
                    F.coalesce(F.col("logp"), F.lit(0.0)).alias("lp"),
                )
            )
        ),
        F.lit(0.0),
        lambda acc, x: acc + x["lp"],
    )
    return scored.groupBy(id_col).agg(
        F.when(
            F.sum(F.col("logp").isNotNull().cast("long")) > 0,
            F.round(
                F.exp(
                    -(folded / F.sum(F.col("logp").isNotNull().cast("long")))
                ),
                6,
            ),
        ).alias("ppl")
    )
