"""End-to-end LLM training-data pipeline over the engine's operators.

A runnable tour of the corpus-preparation plane at demo scale: load the
documents table, clean and score it, deduplicate with survivor
selection, select for target-likeness (DSIR) and reference-likeness
(LM perplexity), and pack the survivors into fixed-budget training
bins. Every step is the same oracle-gated operator the registry
exposes (d15/d26/d27-d30, c06); at 100 TB only the input path changes.

Run: ``python examples/llm_pipeline.py [sf_dir]`` (default
``/root/testdata/sf0.001``).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lagoon_spark.operators import corpus, dedup, text
from lagoon_spark.session import get_spark, register_views


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("lagoon_llm_pipeline", cpus="4")
    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text", "lang")
    print(f"corpus: {docs.count()} documents from {sf_dir}")

    # 1. clean: PII redaction + whitespace normalization (map-only)
    cleaned = docs.withColumn(
        "text", text.normalize_text(text.redact_pii("text"))
    )

    # 2. near-dup dedup with survivor selection: one canonical doc per
    #    MinHash-LSH cluster, clustering computed once and reused
    clusters = dedup.neardup_clusters(
        cleaned, "doc_id", "text",
        num_hashes=16, bands=4, rows_per_band=4, min_matches=8,
    )
    survivors = dedup.keep_canonical(
        cleaned, "doc_id", "text", clusters_df=clusters
    ).filter("is_canonical")
    kept = cleaned.join(survivors.select("doc_id"), "doc_id")
    print(f"after dedup: {kept.count()} canonical documents")

    # 2b. passage removal (ExactSubstr, Lee et al. 2022): even canonical
    #     docs can share boilerplate spans — drop the spanned tokens
    # pin the rewrite BEFORE consuming it: the span pipeline (window +
    # joins) is too deep to recompute per consumer, and both the token
    # count and the join below read it
    rewritten = dedup.remove_duplicate_spans(
        kept, "doc_id", "text"
    ).localCheckpoint()
    removed = rewritten.agg(F.sum("n_tokens_removed")).collect()[0][0]
    kept = kept.drop("text").join(
        rewritten.select("doc_id", F.col("text_clean").alias("text")),
        "doc_id",
    )
    print(f"passage removal dropped {removed} duplicated tokens")

    # 3. quality gates: trained-weights linear score + LM perplexity
    #    under a hashed bigram model fit on the English subset
    from lagoon_spark.oracle_fragments import D28_WEIGHTS

    ref = kept.filter(F.col("lang") == "en").select("text")
    uni, bi = corpus.hashed_bigram_lm(ref, "text")
    ppl = corpus.lm_perplexity(kept, "doc_id", "text", uni, bi)
    scored = (
        kept.withColumn(
            "quality", text.hashed_linear_score("text", weights=D28_WEIGHTS)
        )
        .join(ppl, "doc_id")
        .filter("quality >= 0.40 AND ppl IS NOT NULL")
    )
    print(f"after quality + perplexity gates: {scored.count()}")

    # 4. target-likeness selection: DSIR top-k against the English subset
    picked = corpus.dsir_resample(
        scored.select("doc_id", "text"), "doc_id", "text",
        target=ref, k=100,
    )
    final = scored.join(picked.select("doc_id"), "doc_id")
    print(f"after DSIR selection: {final.count()}")

    # 5. structural gates from the crawl side: full Gopher + C4 rules
    #    (map-only) and a skew-safe per-domain cap over a planted
    #    domain key (60% of docs on one host — the hot-key shape)
    from lagoon_spark.operators.skew import capped_per_key

    sig = text.gopher_signals("text")
    gated = final.filter(
        text.gopher_keep(sig, min_words=5, max_words=100_000,
                         min_stopwords=0, min_alpha_frac=0.5)
    )
    domain = F.when(F.col("doc_id") % 10 < 6, F.lit("big.example.com")).otherwise(
        F.concat(F.lit("host"), (F.col("doc_id") % 17).cast("string"))
    )
    capped = capped_per_key(
        gated.withColumn("domain", domain), "domain",
        [F.length("text").desc(), F.col("doc_id").asc()], 25,
        salt=F.col("doc_id"),
    )
    print(f"after Gopher gate + domain cap: {capped.count()}")

    # 6. curriculum: stage by quality, shuffle within, number globally
    #    with the range-partitioned dense rank (no single-task sort)
    ordered, _pinned = corpus.curriculum_order(
        capped.select("doc_id", "text", "quality"), "doc_id", "quality",
        thresholds=(0.6, 0.45),
    )
    stages = ordered.groupBy("stage").count().orderBy("stage").collect()
    print("curriculum stages: "
          + ", ".join(f"s{r['stage']}={r['count']}" for r in stages))

    # 7. pack into fixed-budget training bins IN CURRICULUM ORDER —
    #    the serving order computed in step 6 decides the bin layout
    packed, _pack_pinned = corpus.pack_token_offsets(
        ordered.select("doc_id", "text", "curriculum_pos"),
        "doc_id", "text", budget=512, order_col="curriculum_pos",
    )
    n_bins = packed.agg(F.countDistinct("bin_id")).collect()[0][0]
    print(f"packed into {n_bins} bins of 512 tokens")
    packed.orderBy("tok_offset").show(5)
    _pack_pinned.unpersist()
    _pinned.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()

# Note: the driver's synthetic documents are heavily templated, so the
# near-dup pass collapses most of them — the same 8 canonical clusters
# the d26 registry query finds at this scale. On a real crawl the
# dedup rate is the interesting output, not a constant of the data.
