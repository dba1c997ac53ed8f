"""Property test: duplicate_spans and crossdoc_dup_fraction against a
pure-Python reference implementation, over random small corpora.

The generator draws documents from a tiny token alphabet so cross-doc
gram collisions are common, and includes short/empty docs to keep the
short-document guard honest."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pytest

# hypothesis span-vs-python-reference property soak (~40 s) - kept out of the driver's verify window
# (round-12 verdict #3); run with SPARK_GRAFT_RUN_SLOW=1
pytestmark = pytest.mark.slow

_TOKEN = st.sampled_from(["a", "b", "c", "d"])
_DOC = st.lists(_TOKEN, min_size=0, max_size=12).map(" ".join)
_CORPUS = st.lists(_DOC, min_size=1, max_size=6)

_N = 3
_MIN_TOKENS = 4


def _py_grams(text: str, n: int) -> list[str]:
    toks = [w for w in text.split(" ") if w != ""]
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def _py_spans(docs: list[str], n: int, min_tokens: int):
    gram_docs: dict[str, set[int]] = {}
    for i, d in enumerate(docs):
        for g in set(_py_grams(d, n)):
            gram_docs.setdefault(g, set()).add(i)
    out = set()
    for i, d in enumerate(docs):
        shared = [
            p + 1
            for p, g in enumerate(_py_grams(d, n))
            if len(gram_docs[g]) >= 2
        ]
        # merge consecutive positions into maximal runs
        run: list[int] = []
        for p in shared + [None]:
            if run and (p is None or p != run[-1] + 1):
                start, end = run[0], run[-1] + n - 1
                if end - start + 1 >= min_tokens:
                    out.add((i, start, end, end - start + 1))
                run = []
            if p is not None:
                run.append(p)
    return out


def _py_fraction(docs: list[str], n: int):
    gram_docs: dict[str, set[int]] = {}
    for i, d in enumerate(docs):
        for g in set(_py_grams(d, n)):
            gram_docs.setdefault(g, set()).add(i)
    out = {}
    for i, d in enumerate(docs):
        grams = _py_grams(d, n)
        shared = sum(1 for g in grams if len(gram_docs[g]) >= 2)
        out[i] = (len(grams), shared)
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_CORPUS)
def test_duplicate_spans_matches_python_reference(spark, docs):
    from lagoon_spark.operators.dedup import duplicate_spans

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in duplicate_spans(
            df, "doc_id", "text", n=_N, min_tokens=_MIN_TOKENS
        ).collect()
    }
    assert got == _py_spans(docs, _N, _MIN_TOKENS)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_CORPUS)
def test_crossdoc_dup_fraction_matches_python_reference(spark, docs):
    from lagoon_spark.operators.dedup import crossdoc_dup_fraction

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_shared_grams"])
        for r in crossdoc_dup_fraction(df, "doc_id", "text", n=_N).collect()
    }
    assert got == _py_fraction(docs, _N)


def _py_remove(docs: list[str], n: int, min_tokens: int):
    spans = _py_spans(docs, n, min_tokens)
    out = {}
    for i, d in enumerate(docs):
        toks = [w for w in d.split(" ") if w != ""]
        drop = set()
        for (j, start, end, _len) in spans:
            if j == i:
                drop.update(range(start, end + 1))
        kept = [w for p, w in enumerate(toks, 1) if p not in drop]
        out[i] = (" ".join(kept), len(toks), len(toks) - len(kept))
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_CORPUS)
def test_remove_duplicate_spans_matches_python_reference(spark, docs):
    from lagoon_spark.operators.dedup import remove_duplicate_spans

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["text_clean"], r["n_tokens"], r["n_tokens_removed"])
        for r in remove_duplicate_spans(
            df, "doc_id", "text", n=_N, min_tokens=_MIN_TOKENS
        ).collect()
    }
    assert got == _py_remove(docs, _N, _MIN_TOKENS)
