"""Robustness property tests for pure engine components: the name
sanitizer/deduper and the error-recovering TsQuery parser. Pure Python
— no Spark session — so hypothesis can run hundreds of examples."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from lagoon_spark.ingest.names import MAX_ID_LEN, no_dup_names, sanitize
from lagoon_spark.search import evaluate, parse

names_strategy = st.lists(
    st.text(max_size=80),
    min_size=1,
    max_size=30,
)


@settings(max_examples=300, deadline=None)
@given(names_strategy)
def test_no_dup_names_invariants(names):
    out = no_dup_names(names)
    # one output per input, all within the identifier limit
    assert len(out) == len(names)
    assert all(len(n) <= MAX_ID_LEN for n in out)
    # case-insensitively unique (the reference dedups on lowercase,
    # SensibleNames.hs:59-92)
    lowered = [n.lower() for n in out]
    assert len(set(lowered)) == len(lowered)
    # determinism: the same input list always dedups identically
    assert out == no_dup_names(names)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.sampled_from(["a", "A", "a ", " a", "a!", "a?"]), min_size=2, max_size=12))
def test_no_dup_names_collision_heavy(names):
    out = no_dup_names(names)
    lowered = [n.lower() for n in out]
    assert len(set(lowered)) == len(lowered)


@settings(max_examples=500, deadline=None)
@given(st.text(max_size=60))
def test_tsquery_parser_never_raises(s):
    """The reference's parser is error-recovering (TsQuery.hs:127-179:
    'we never fail'); arbitrary garbage must parse to a query-or-None,
    and whatever parses must evaluate without raising."""
    q = parse(s)
    if q is not None:
        evaluate(
            q,
            {"A": ["alpha", "name"], "B": ["tag"], "C": ["desc"], "D": ["user"]},
        )


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="ab ()|&!:*", max_size=30))
def test_tsquery_operator_soup(s):
    q = parse(s)
    if q is not None:
        evaluate(q, {"A": ["a"], "B": [], "C": [], "D": []})
