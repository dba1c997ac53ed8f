"""Property test: the JsonType unifier is a commutative, associative,
idempotent join — the exact algebraic contract that lets inference run
as a partition-parallel fold (any grouping/order of partial results
must produce the same type). No Spark session needed: the lattice is
pure Python.
"""

from __future__ import annotations

import functools

from hypothesis import given, settings
from hypothesis import strategies as st

from lagoon_spark.ingest.jsontype import parse, render, type_of_value, unify

json_values = st.recursive(
    st.none()
    | st.booleans()
    | st.integers(min_value=-(10**6), max_value=10**6)
    | st.floats(allow_nan=False, allow_infinity=False, width=32)
    | st.text(max_size=8),
    lambda inner: st.lists(inner, max_size=4)
    | st.dictionaries(st.sampled_from(["a", "b", "c", "k"]), inner, max_size=3),
    max_leaves=12,
)

# arbitrary (including quote/backslash/unicode) object keys — the
# render/parse round-trip must survive them because the distributed
# inference ships rendered partial types between executors and driver
json_values_hostile_keys = st.recursive(
    st.none() | st.booleans() | st.integers(-100, 100) | st.text(max_size=6),
    lambda inner: st.lists(inner, max_size=3)
    | st.dictionaries(st.text(min_size=1, max_size=6), inner, max_size=3),
    max_leaves=8,
)


@settings(max_examples=300, deadline=None)
@given(st.lists(json_values, min_size=1, max_size=6), st.randoms())
def test_fold_order_and_grouping_invariant(values, rnd):
    types = [type_of_value(v) for v in values]

    left = functools.reduce(unify, types)

    shuffled = list(types)
    rnd.shuffle(shuffled)
    permuted = functools.reduce(unify, shuffled)
    assert left == permuted, "unify must be commutative for distributed folds"

    # right-associated grouping (simulates a different partition tree)
    right = types[0]
    for t in reversed(types[1:]):
        right = unify(t, right)
    # fold direction may differ; compare against the same element order
    right_ordered = types[-1]
    for t in reversed(types[:-1]):
        right_ordered = unify(t, right_ordered)
    assert left == right_ordered, "unify must be associative"


@settings(max_examples=200, deadline=None)
@given(json_values)
def test_idempotent(v):
    t = type_of_value(v)
    assert unify(t, t) == t


@settings(max_examples=300, deadline=None)
@given(json_values_hostile_keys)
def test_render_parse_roundtrip(v):
    """render∘parse must be the identity on rendered types for ANY
    object key — quotes and backslashes included (a raw-f-string render
    once corrupted this and crashed distributed inference)."""
    t = type_of_value(v)
    r = render(t)
    assert render(parse(r)) == r


@settings(max_examples=200, deadline=None)
@given(json_values, json_values)
def test_absorbing_upper_bound(a, b):
    ta, tb = type_of_value(a), type_of_value(b)
    joined = unify(ta, tb)
    # joining again with either input must not change the result
    assert unify(joined, ta) == joined
    assert unify(joined, tb) == joined
