"""Corpus-operator invariants beyond the oracle gate: determinism of
hash sampling, split completeness, chunk reconstruction, packing
monotonicity."""

from __future__ import annotations

from pyspark.sql import functions as F

from lagoon_spark.operators import corpus
from lagoon_spark.session import register_views


def _docs(spark, sf_small):
    register_views(spark, sf_small)
    return spark.table("documents")


def test_sampling_is_deterministic_and_stratified(spark, sf_small):
    docs = _docs(spark, sf_small).select("doc_id", "lang")
    rates = {"en": 85, "zh": 60, "de": 40, "fr": 40, "es": 40}
    a = corpus.stratified_sample(docs, "doc_id", "lang", rates, 20)
    b = corpus.stratified_sample(docs, "doc_id", "lang", rates, 20)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # every kept row's bucket is under its stratum rate
    assert a.filter(F.col("sample_bucket") >= 85).count() == 0


def test_split_is_total_and_disjoint(spark, sf_small):
    docs = _docs(spark, sf_small).select("doc_id")
    out = corpus.train_val_test_split(docs, "doc_id")
    assert out.count() == docs.count()
    per = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(per) == {"train", "val", "test"}
    assert per["train"] > per["val"] and per["train"] > per["test"]


def test_chunks_reconstruct_document(spark, sf_small):
    docs = _docs(spark, sf_small).select("doc_id", "text")
    # non-overlapping chunks concatenated in order == the tokenized doc
    chunks = corpus.chunk_tokens(docs, "doc_id", "text", size=16, stride=16)
    rebuilt = (
        chunks.groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ", F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk_text"))).getField("chunk_text")
            ).alias("rebuilt")
        )
    )
    orig = docs.select(
        "doc_id",
        F.concat_ws(
            " ", F.filter(F.split("text", " "), lambda w: w != F.lit(""))
        ).alias("norm"),
    ).filter(F.length("norm") > 0)
    joined = orig.join(rebuilt, "doc_id")
    assert joined.filter(F.col("norm") != F.col("rebuilt")).count() == 0
    assert joined.count() == orig.count()


def test_global_shuffle_is_a_permutation(spark, sf_small):
    docs = _docs(spark, sf_small).select("doc_id")
    n = docs.count()
    out, _pinned = corpus.global_shuffle(docs, "doc_id")
    agg = out.agg(
        F.countDistinct("shuffle_pos").alias("d"),
        F.min("shuffle_pos").alias("lo"),
        F.max("shuffle_pos").alias("hi"),
    ).collect()[0]
    assert (agg["d"], agg["lo"], agg["hi"]) == (n, 1, n)
    # and it is not the identity order (hash actually shuffles)
    moved = out.filter(F.col("shuffle_pos") != F.col("doc_id") + 1).count()
    assert moved > n // 2


def test_packing_offsets_are_contiguous(spark, sf_small):
    docs = _docs(spark, sf_small).select("doc_id", "text")
    out, _pinned = corpus.pack_token_offsets(docs, "doc_id", "text", budget=256)
    # offsets sorted by (hash, id) are a prefix-sum: next offset ==
    # previous offset + previous n_tokens
    rows = out.withColumn("h", corpus.id_hash("doc_id")).orderBy("h", "doc_id").collect()
    pos = 0
    for r in rows:
        assert r["tok_offset"] == pos
        assert r["bin_id"] == pos // 256
        pos += r["n_tokens"]


def test_token_budget_sample_prefix_property(spark, sf_small):
    """Kept docs are exactly the prefix of each source's (hash, id) walk
    whose starting offset is under budget; offsets are running sums."""
    docs = _docs(spark, sf_small).select("doc_id", "source", "text")
    out = corpus.token_budget_sample(docs, "doc_id", "text", "source", budget=600)
    rows = out.collect()
    assert rows, "budget 600 should keep at least the first doc per source"
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    n_sources = docs.select("source").distinct().count()
    # every source keeps at least its first document (offset 0 < budget)
    assert len(by_src) == n_sources
    for src, members in by_src.items():
        members.sort(key=lambda r: r["src_tok_offset"])
        assert members[0]["src_tok_offset"] == 0
        running = 0
        for m in members:
            assert m["src_tok_offset"] == running, (src, m)
            assert m["src_tok_offset"] < 600
            running += m["n_tokens"]


def test_token_budget_sample_is_deterministic(spark, sf_small):
    docs = _docs(spark, sf_small).select("doc_id", "source", "text")
    a = corpus.token_budget_sample(docs, "doc_id", "text", "source", budget=600)
    b = corpus.token_budget_sample(docs, "doc_id", "text", "source", budget=600)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_decontamination_flags_planted_copy(spark, sf_small):
    """A training doc that IS an eval doc's text shares all its grams;
    a doc with no 3-gram overlap is not flagged."""
    eval_df = spark.createDataFrame(
        [(1000001, "alpha beta gamma delta epsilon")], ["doc_id", "text"]
    )
    train_df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),   # exact copy: 3 shared grams
            (2, "prefix words then alpha beta gamma suffix"),  # one shared gram
            (3, "zeta eta theta iota kappa"),        # disjoint: not flagged
            (4, "too short"),                        # < n tokens: not flagged
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["n_shared_grams"]
        for r in corpus.shared_gram_counts(train_df, eval_df, "doc_id", "text", n=3).collect()
    }
    assert out == {1: 3, 2: 1}


def test_decontamination_empty_eval_set(spark, sf_small):
    docs = _docs(spark, sf_small).select("doc_id", "text")
    empty = docs.filter(F.lit(False))
    out = corpus.shared_gram_counts(docs, empty, "doc_id", "text", n=3)
    assert out.count() == 0


def test_dsir_scores_favor_target_like_documents(spark):
    """DSIR (Xie et al. 2023): documents sharing the target corpus's
    n-grams must out-score documents that don't; empty documents score
    0; the resample is deterministic and k-bounded."""
    from lagoon_spark.operators.corpus import (
        dsir_log_ratios,
        dsir_resample,
        dsir_scores,
    )

    target = spark.createDataFrame(
        [("the cat sat on the mat",), ("a cat and a dog",)], "text string"
    )
    raw = spark.createDataFrame(
        [
            (1, "the cat sat on the mat today"),
            (2, "quantum flux capacitor resonance cascade"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    ratios = dsir_log_ratios(target, raw, "text", buckets=256)
    scores = {
        r["doc_id"]: r["dsir_logweight"]
        for r in dsir_scores(raw, "doc_id", "text", ratios, buckets=256).collect()
    }
    assert scores[1] > scores[2]  # cat-like doc matches the cat target
    assert scores[3] == 0.0       # no tokens -> neutral
    picked = dsir_resample(raw, "doc_id", "text", target, k=2, buckets=256)
    rows = picked.collect()
    assert len(rows) == 2
    assert [r["doc_id"] for r in rows] == [
        r["doc_id"] for r in dsir_resample(
            raw, "doc_id", "text", target, k=2, buckets=256
        ).collect()
    ]  # deterministic
    plan = picked._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # top-k, never a global sort
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_lm_perplexity_favors_reference_like_text(spark):
    """The hashed bigram LM (CCNet-style filter): documents made of the
    reference's bigrams score LOWER perplexity than unseen-vocabulary
    documents; sub-2-token documents return NULL; the plan carries no
    Python stage."""
    from lagoon_spark.operators.corpus import hashed_bigram_lm, lm_perplexity

    ref = spark.createDataFrame(
        [("the cat sat on the mat",), ("the dog sat on the rug",)],
        "text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the rug"),     # all-seen bigrams
            (2, "zorp blix quantum flux nine"),  # unseen vocabulary
            (3, "single"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    uni, bi = hashed_bigram_lm(ref, "text", 512, 4096)
    out = lm_perplexity(docs, "doc_id", "text", uni, bi, 512, 4096)
    got = {r["doc_id"]: r["ppl"] for r in out.collect()}
    assert got[1] is not None and got[2] is not None
    assert got[1] < got[2]  # reference-like text is less surprising
    assert got[3] is None and got[4] is None  # no scored transitions
    again = {r["doc_id"]: r["ppl"] for r in out.collect()}
    assert again == got
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_dsir_resample_accepts_prefit_ratios(spark):
    """Serving shape: fit the importance model once, select many times —
    ratios_df skips the fit and must reproduce the fit-inline result;
    a malformed ratios frame is refused."""
    from pyspark.sql import functions as F

    from lagoon_spark.operators.corpus import dsir_log_ratios, dsir_resample

    target = spark.createDataFrame(
        [("the cat sat on the mat",)], "text string"
    )
    raw = spark.createDataFrame(
        [(1, "the cat sat here"), (2, "unrelated gibberish zz qq")],
        "doc_id long, text string",
    )
    ratios = dsir_log_ratios(target, raw, "text", buckets=128)
    inline = dsir_resample(raw, "doc_id", "text", target, k=2, buckets=128)
    prefit = dsir_resample(
        raw, "doc_id", "text", None, k=2, buckets=128, ratios_df=ratios
    )
    assert sorted(map(tuple, inline.collect())) == sorted(
        map(tuple, prefit.collect())
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="log_ratio"):
        dsir_resample(
            raw, "doc_id", "text", None, k=2,
            ratios_df=ratios.withColumnRenamed("log_ratio", "oops"),
        )
    with _pytest.raises(ValueError, match="target"):
        dsir_resample(raw, "doc_id", "text", None, k=2)
