"""Unit tests for temporal joins and connected components.

Edge semantics pinned here (the oracle queries exercise bulk paths):
as-of inclusivity and tie-breaks, range-join boundary inclusivity
across band edges, CC chains vs cliques vs singletons.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from lagoon_spark.operators import dedup, temporal


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "u1"),  # exact tie with r2
            (2, _ts("2024-01-01 11:30:00"), "u1"),  # between r2 and r3
            (3, _ts("2024-01-01 09:00:00"), "u1"),  # before all rights
            (4, _ts("2024-01-01 12:00:00"), "u2"),  # other key, no rights
        ],
        ["lid", "ts", "user"],
    )
    right = spark.createDataFrame(
        [
            (101, _ts("2024-01-01 09:30:00"), "u1", 1.0),
            (102, _ts("2024-01-01 10:00:00"), "u1", 2.0),  # ties lid=1
            (103, _ts("2024-01-01 10:00:00"), "u1", 3.0),  # same ts: greater id wins
            (104, _ts("2024-01-01 12:00:00"), "u1", 4.0),
        ],
        ["rid", "ts", "user", "v"],
    )
    out = temporal.asof_join(
        left, right, ["user"], left_ts="ts", right_ts="ts",
        right_payload=["rid", "v"], tiebreak="rid",
    )
    got = {r["lid"]: (r["rid_right"], r["v_right"]) for r in out.collect()}
    assert got == {
        1: (103, 3.0),   # inclusive, max tiebreak among equal ts
        2: (103, 3.0),   # latest at-or-before 11:30
        3: (None, None), # nothing precedes
        4: (None, None), # no right rows for u2
    }
    assert out.count() == left.count()  # left-preserving


def test_range_join_boundaries(spark):
    base = _ts("2024-01-01 00:00:00")
    left = spark.createDataFrame([(1, base, "u")], ["lid", "ts", "user"])
    sec = dt.timedelta(seconds=1)
    right = spark.createDataFrame(
        [
            (10, base - sec, "u"),           # just before window
            (11, base, "u"),                 # lower bound inclusive
            (12, base + 1799 * sec, "u"),    # inside, band 0
            (13, base + 1800 * sec, "u"),    # band boundary
            (14, base + 3600 * sec, "u"),    # upper bound inclusive
            (15, base + 3601 * sec, "u"),    # just past
            (16, base + 100 * sec, "x"),     # other key
        ],
        ["rid", "ts", "user"],
    )
    out = temporal.range_join(
        left, right, ["user"], left_ts="ts", right_ts="ts",
        lower_sec=0, upper_sec=3600,
    )
    assert sorted(r["rid_r"] for r in out.collect()) == [11, 12, 13, 14]
    # each qualifying pair appears exactly once despite multi-bucket explode
    assert out.count() == 4


def test_connected_components_shapes(spark):
    # chain 1-2-3, clique 10-11-12, isolated 99
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11), (11, 12), (10, 12)], ["id_a", "id_b"]
    )
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 11, 12, 99]], ["node"])
    cc = dedup.connected_components(edges, nodes=nodes)
    got = {r["node"]: r["cluster"] for r in cc.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 99: 99}


def test_connected_components_long_chain(spark):
    # path graph 0-1-2-...-12: needs multiple propagation rounds
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], ["id_a", "id_b"]
    )
    cc = dedup.connected_components(edges)
    assert {r["cluster"] for r in cc.collect()} == {0}
    assert cc.count() == 13


def test_neardup_clusters_groups_exact_dups(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),      # exact dup of 1
        (3, "alpha beta gamma delta epsilon eta"),       # near dup of 1
        (4, "totally different words entirely here now"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = dedup.neardup_clusters(
        df, "doc_id", "text", num_hashes=16, bands=4, rows_per_band=4,
        min_matches=6,
    )
    got = {r["doc_id"]: r["cluster"] for r in out.collect()}
    assert got[1] == got[2] == 1   # exact dups share the min-id cluster
    assert got[4] == 4             # singleton keeps its own id
    assert set(got) == {1, 2, 3, 4}
