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
    out = corpus.global_shuffle(docs, "doc_id")
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
    out = corpus.pack_token_offsets(docs, "doc_id", "text", budget=256)
    # offsets sorted by (hash, id) are a prefix-sum: next offset ==
    # previous offset + previous n_tokens
    rows = out.withColumn("h", corpus.id_hash("doc_id")).orderBy("h", "doc_id").collect()
    pos = 0
    for r in rows:
        assert r["tok_offset"] == pos
        assert r["bin_id"] == pos // 256
        pos += r["n_tokens"]
