"""Property-based compaction tests.

The reference's only property suite checks its compaction stream-merge
(`src/backend/conduit-compact-test/Main.hs:15-50`): merging preserves
every version exactly (no rows dropped, duplicates kept with their
multiplicity, order reconstructible). Same properties here, over the
DataFrame implementation: for random multi-version datasets with
overlapping and duplicated rows, every per-version view reconstructs
the exact original row sequence after compaction.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lagoon_spark.engine import Lagoon

# small alphabets force collisions across versions and duplicate rows
# within a version — the cases the occurrence-matching zip must get right
_row = st.tuples(st.sampled_from("ab"), st.sampled_from(["x", "y"]))
_version = st.lists(_row, min_size=1, max_size=6)
_dataset = st.lists(_version, min_size=1, max_size=3)


def _csv(rows) -> str:
    return "k,v\n" + "".join(f"{a},{b}\n" for a, b in rows)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(versions=_dataset)
def test_compaction_reconstructs_every_version(spark, tmp_path_factory, versions):
    tmp = tmp_path_factory.mktemp("compactprop")
    lg = Lagoon(spark, str(tmp / "wh"), user="prop")
    lg.init_db()
    for i, rows in enumerate(versions):
        p = tmp / f"v{i}.csv"
        p.write_text(_csv(rows))
        lg.ingest(str(p), "ds")

    lg.compact("ds")

    for i, rows in enumerate(versions):
        got = [
            (r.k, r.v)
            for r in lg.spark.sql(f"SELECT k, v FROM ds_v{i + 1} ORDER BY ix").collect()
        ]
        # no-drop + multiplicity: the multiset round-trips exactly
        assert sorted(got) == sorted(rows), f"version {i + 1} changed by compaction"

    # identity: compacting again is a no-op for the reconstructed views
    lg.compact("ds")
    for i, rows in enumerate(versions):
        got = [
            (r.k, r.v)
            for r in lg.spark.sql(f"SELECT k, v FROM ds_v{i + 1} ORDER BY ix").collect()
        ]
        assert sorted(got) == sorted(rows)
