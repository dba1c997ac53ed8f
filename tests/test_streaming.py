"""Streaming plane: stream/batch parity for the shared plan builders,
plus the custom stateful operator.

Each test drives the real Structured Streaming engine: file source over
the events parquet → trigger(availableNow) → memory sink, then compares
against the batch plan (itself gated by the DuckDB oracle in
test_queries_oracle.py).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lagoon_spark.session import register_views
from lagoon_spark.streaming import ops


def _run_stream(df, name, output_mode):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def _rows(df, key_cols):
    return sorted(tuple(r) for r in df.select(*key_cols).collect())


def test_windowed_stats_stream_matches_batch(spark, sf_small):
    register_views(spark, sf_small)
    batch = ops.windowed_event_stats(spark.table("events"))
    stream = ops.windowed_event_stats(ops.read_events_stream(spark, sf_small))
    # complete mode: emit every window (append would withhold windows
    # newer than the final watermark, which never close in a finite run)
    _run_stream(stream, "win_stats", "complete")
    got = spark.table("win_stats")
    cols = ["bucket_start", "event_type", "n_events", "sum_value"]
    assert _rows(got, cols) == _rows(batch, cols)
    assert len(got.collect()) > 0


def test_session_windows_stream_matches_batch_sessions(spark, sf_small):
    register_views(spark, sf_small)
    stream = ops.sessionize_stream(ops.read_events_stream(spark, sf_small))
    _run_stream(stream, "sessions", "complete")
    got = spark.table("sessions")

    batch = ops.sessionize_batch(spark.table("events"))
    # session_window's (start, end] extends gap past the last event;
    # compare the invariant parts: per-user session count and sizes.
    b = _rows(
        batch.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        ),
        ["user_id", "n_sessions", "n_events"],
    )
    s = _rows(
        got.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        ),
        ["user_id", "n_sessions", "n_events"],
    )
    assert s == b


def test_stateful_user_counts(spark, sf_small):
    register_views(spark, sf_small)
    stream = ops.stateful_user_counts(ops.read_events_stream(spark, sf_small))
    _run_stream(stream, "user_counts", "update")
    got = spark.table("user_counts")
    # memory sink in update mode appends every emission; the last row
    # per user is the final state
    final = {
        r["user_id"]: r["n_events"]
        for r in got.orderBy("user_id", "n_events").collect()
    }
    expect = {
        r["user_id"]: r["n"]
        for r in spark.table("events").groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert final == expect


def test_stream_dedup_matches_batch_keys(spark, sf_small):
    register_views(spark, sf_small)
    stream = ops.dedup_events(
        ops.read_events_stream(spark, sf_small), ["user_id", "event_type"]
    )
    _run_stream(stream, "dedup_ev", "append")
    got = spark.table("dedup_ev")
    batch = ops.dedup_events(spark.table("events"), ["user_id", "event_type"])
    # survivor identity is arrival-order-dependent in both engines;
    # the invariant is the key set (and so the row count)
    assert _rows(got, ["user_id", "event_type"]) == _rows(
        batch, ["user_id", "event_type"]
    )


def test_stream_stream_join_matches_batch_pairs(spark, sf_small):
    register_views(spark, sf_small)
    ev = ops.read_events_stream(spark, sf_small)
    stream = ops.error_purchase_join_stream(
        ev.filter(F.col("event_type") == "error"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    _run_stream(stream, "ss_join", "append")
    got = spark.table("ss_join")

    bev = spark.table("events")
    batch = ops.error_purchase_join_stream(
        bev.filter(F.col("event_type") == "error"),
        bev.filter(F.col("event_type") == "purchase"),
    )
    cols = ["error_id", "user_id", "purchase_id", "value"]
    assert _rows(got, cols) == _rows(batch, cols)
    assert len(got.collect()) > 0


def test_watermark_in_plan(spark, sf_small):
    stream = ops.windowed_event_stats(
        ops.read_events_stream(spark, sf_small), watermark="2 hours"
    )
    plan = stream._jdf.queryExecution().logical().toString()
    assert "EventTimeWatermark" in plan


@pytest.mark.skipif(
    not ops.tws_available(),
    reason="transformWithStateInPandas needs protobuf in the Python worker",
)
def test_running_totals_stream_matches_batch(spark, sf_small):
    register_views(spark, sf_small)
    stream = ops.running_user_value_totals(ops.read_events_stream(spark, sf_small))
    _run_stream(stream, "tws_totals", "update")
    got = {
        r["user_id"]: (r["n_events"], r["micro_total"])
        for r in spark.table("tws_totals").orderBy("n_events").collect()
    }
    batch = {
        r["user_id"]: (r["n_events"], r["micro_total"])
        for r in ops.running_user_value_totals(spark.table("events")).collect()
    }
    assert got == batch


def test_running_totals_batch_twin(spark, sf_small):
    register_views(spark, sf_small)
    out = ops.running_user_value_totals(spark.table("events"))
    assert out.columns == ["user_id", "n_events", "micro_total"]
    assert out.count() > 0


def test_checkpoint_processes_each_file_exactly_once(spark, tmp_path):
    """Restarting a checkpointed file-source stream must process only
    files that arrived since the last run — the exactly-once property a
    100 TB object-store ingest pipeline rests on."""
    import pandas as pd

    src = tmp_path / "stream_src"
    src.mkdir()
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def write_batch(name, ids):
        pd.DataFrame({"event_id": ids}).to_parquet(src / name, index=False)

    def run_once():
        stream = (
            spark.readStream.schema("event_id long").parquet(str(src))
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write_batch("f1.parquet", [1, 2, 3])
    run_once()
    assert spark.read.parquet(sink).count() == 3
    # second run with no new files appends nothing
    run_once()
    assert spark.read.parquet(sink).count() == 3
    # a new file is processed exactly once; the old one never re-reads
    write_batch("f2.parquet", [4, 5])
    run_once()
    got = sorted(r.event_id for r in spark.read.parquet(sink).collect())
    assert got == [1, 2, 3, 4, 5]


def test_windowed_topk_stream_matches_batch(spark, sf_small):
    register_views(spark, sf_small)
    batch = ops.finalize_topk(
        ops.windowed_type_counts(spark.table("events")), k=2
    )
    stream = ops.windowed_type_counts(ops.read_events_stream(spark, sf_small))
    _run_stream(stream, "topk_counts", "complete")
    got = ops.finalize_topk(spark.table("topk_counts"), k=2)
    cols = ["bucket_start", "event_type", "n_events", "rank"]
    assert _rows(got, cols) == _rows(batch, cols)
    assert len(got.collect()) > 0


def test_quality_gate_stream_matches_batch(spark, sf_small):
    """st09: the row-local quality gate is ONE plan for both modes —
    the streaming run over the documents file source must emit exactly
    the batch result, and some documents must actually be filtered."""
    register_views(spark, sf_small)
    from lagoon_spark.streaming_queries import (
        _D28_WEIGHTS,
        _ST09_MAX_TOK,
        _ST09_MIN_SCORE,
        _ST09_MIN_TOK,
    )

    kw = dict(
        weights=_D28_WEIGHTS,
        min_score=_ST09_MIN_SCORE,
        min_tokens=_ST09_MIN_TOK,
        max_tokens=_ST09_MAX_TOK,
    )
    batch = ops.quality_gate(spark.table("documents"), **kw)
    stream = ops.quality_gate(
        ops.read_documents_stream(spark, sf_small), **kw
    )
    _run_stream(stream, "qgate", "append")
    got = spark.table("qgate")
    cols = ["doc_id", "quality_score", "n_tokens"]
    assert _rows(got, cols) == _rows(batch, cols)
    n_all = spark.table("documents").count()
    n_kept = got.count()
    assert 0 < n_kept < n_all  # the gate actually gates


def test_quality_gate_broadcast_weights_stream_matches_batch(spark, sf_small):
    """Round-7 verdict ask #2: the one-row-broadcast weight carrier
    works inside the SAME streaming plan (a stream-static broadcast
    join) and emits exactly the literal-tier batch result."""
    register_views(spark, sf_small)
    from lagoon_spark.streaming_queries import (
        _D28_WEIGHTS,
        _ST09_MAX_TOK,
        _ST09_MIN_SCORE,
        _ST09_MIN_TOK,
    )

    kw = dict(
        min_score=_ST09_MIN_SCORE,
        min_tokens=_ST09_MIN_TOK,
        max_tokens=_ST09_MAX_TOK,
    )
    batch = ops.quality_gate(spark.table("documents"), weights=_D28_WEIGHTS, **kw)
    wdf = spark.createDataFrame(
        [([float(w) for w in _D28_WEIGHTS],)], "__weights array<double>"
    )
    stream = ops.quality_gate(
        ops.read_documents_stream(spark, sf_small), weights_df=wdf, **kw
    )
    _run_stream(stream, "qgate_bw", "append")
    got = spark.table("qgate_bw")
    cols = ["doc_id", "quality_score", "n_tokens"]
    assert _rows(got, cols) == _rows(batch, cols)
    assert got.count() > 0


def test_clean_gate_stream_matches_batch(spark, sf_small):
    """st10: the C4→Gopher structural cleaning gate is one row-local
    plan — the streaming run must emit exactly the batch result."""
    register_views(spark, sf_small)
    from pyspark.sql import functions as F

    from lagoon_spark.oracle_fragments import D33_PLANT_SPARK as _D33_PLANT_SPARK

    def planted(df):
        return df.select("doc_id", F.expr(_D33_PLANT_SPARK).alias("__body"))

    batch = ops.clean_gate(planted(spark.table("documents")), "__body",
                           min_words=10, max_words=1000)
    stream = ops.clean_gate(
        planted(ops.read_documents_stream(spark, sf_small)), "__body",
        min_words=10, max_words=1000,
    )
    _run_stream(stream, "cgate", "append")
    got = spark.table("cgate")
    cols = ["doc_id", "n_kept_lines", "clean_len", "c4_keep", "keep"]
    assert _rows(got, cols) == _rows(batch, cols)
    kept = got.filter("keep").count()
    assert 0 < kept < got.count()  # both verdicts represented


def test_signature_dedup_stream_matches_batch(spark, sf_small):
    """st11: one survivor per signature on both paths. WHICH duplicate
    survives is only defined up to the signature (within a micro-batch
    dropDuplicates keeps an arbitrary member), so the contract is the
    signature SET + count, and that every streaming survivor's id maps
    to the same signature the batch survivor carries."""
    register_views(spark, sf_small)
    from pyspark.sql import functions as F

    batch = ops.signature_dedup(spark.table("documents"))
    stream_docs = ops.read_documents_stream(spark, sf_small).withColumn(
        "__ts", F.timestamp_seconds(F.col("doc_id"))
    )
    stream = ops.signature_dedup(
        stream_docs, ts_col="__ts", watermark="1 hour"
    )
    _run_stream(stream, "sigdedup", "append")
    got = spark.table("sigdedup")
    b_keys = {r["sig_key"] for r in batch.collect()}
    s_rows = got.collect()
    assert {r["sig_key"] for r in s_rows} == b_keys
    assert len(s_rows) == len(b_keys)  # exactly one survivor per sig
    # near-dups exist in the corpus: the dedup actually drops rows
    assert got.count() < spark.table("documents").count()
