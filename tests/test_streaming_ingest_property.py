"""Property test: streaming append ≡ one-shot ingest, for any batching.

The defining invariant of append mode: however the same rows are
sliced into files and micro-batches, the end state (row ids, values,
inferred column types, row count) must be byte-equal to a single
ingest of the concatenated input. Hypothesis drives random cell
content through the type lattice (bools/ints/reals/text/empties) and
random batch boundaries; the one-shot path is the oracle.

Kept to a handful of examples — each example spins real Spark jobs —
but the content generator is broad enough to hit lattice widenings
(a later batch flipping a column INT → REAL → TEXT) and ragged widths.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pytest

# hypothesis streaming-batching property soak (~60 s) - kept out of the driver's verify window
# (round-12 verdict #3); run with SPARK_GRAFT_RUN_SLOW=1
pytestmark = pytest.mark.slow

# cells that exercise every lattice rank (bool/int/bigint/real/text/null)
_CELL = st.sampled_from(
    ["1", "0", "true", "no", "7", "123456789012", "3.5", "-2e2", "x y", "", "txt"]
)
_ROW = st.lists(_CELL, min_size=1, max_size=4)


@st.composite
def _batched_rows(draw):
    rows = draw(st.lists(_ROW, min_size=1, max_size=12))
    # random batch boundaries: partition of the row list into 1-3 files
    n_files = draw(st.integers(min_value=1, max_value=min(3, len(rows))))
    cuts = sorted(
        draw(
            st.lists(
                st.integers(min_value=1, max_value=len(rows)),
                min_size=n_files - 1,
                max_size=n_files - 1,
                unique=True,
            )
        )
    )
    batches, prev = [], 0
    for c in cuts + [len(rows)]:
        if c > prev:
            batches.append(rows[prev:c])
        prev = c
    return batches


def _csv(rows: list[list[str]], width: int) -> str:
    header = ",".join(f"h{i}" for i in range(width))
    body = "\n".join(",".join(r + [""] * (width - len(r))) for r in rows)
    return header + "\n" + (body + "\n" if body else "")


def _oneshot(lg, tmp, name: str, rows: list[list[str]]):
    """One-shot ingest of the given rows; returns SourceInfo or the
    raised exception (the lattice does not guarantee castability — a
    word-boolean column widened to INT fails, as it would in the
    reference's Postgres cast — so 'raises' is a comparable outcome)."""
    w = max(len(r) for r in rows)
    f = tmp / f"{name}.csv"
    f.write_text(_csv(rows, w))
    try:
        return lg.ingest(str(f), name)
    except Exception as e:  # noqa: BLE001 — outcome, not control flow
        return e


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=_batched_rows())
def test_append_equals_oneshot_for_any_batching(spark, tmp_path_factory, batches):
    from lagoon_spark.engine import Lagoon

    tmp = tmp_path_factory.mktemp("stream_prop")
    lg = Lagoon(spark, str(tmp / "wh"), user="tester")
    lg.init_db()
    inbox = tmp / "inbox"
    inbox.mkdir()

    # width is fixed per file (header included) but may differ ACROSS
    # files — that is exactly the ragged-width streaming case
    ing = lg.ingest_stream(
        str(inbox), "prop", checkpoint_dir=str(tmp / "ckpt"), mode="append"
    )
    committed: list[list[str]] = []
    failed = False
    for i, rows in enumerate(batches):
        w = max(len(r) for r in rows)
        (inbox / f"f{i:03d}.csv").write_text(_csv(rows, w))
        try:
            ing._batch_append(
                [(str(inbox / f"f{i:03d}.csv"), datetime.datetime.now())], batch_id=i
            )
        except Exception:
            # streaming failed on this batch → a one-shot ingest of
            # everything seen so far must fail the same way
            failed = True
            out = _oneshot(lg, tmp, "prop_fail", committed + rows)
            assert isinstance(out, Exception), (
                "streaming batch raised but one-shot of the same prefix "
                "succeeded"
            )
            break
        # a row of empty cells in a width-1 file serializes to a fully
        # blank line, which the CSV reader skips (identically on both
        # paths for identical bytes) — but the one-shot oracle below
        # re-serializes at the GLOBAL width, where the same row pads to
        # ",,," and survives as a null row. Track only rows that survive
        # their own file's serialization, so the oracle compares the
        # rows the stream could actually see.
        committed.extend(
            r for r in rows if not (w == 1 and all(c == "" for c in r))
        )

    if not committed:
        if failed:
            # first batch failed and rolled back — no trace may remain
            assert lg.catalog.versions("prop") == []
        elif lg.catalog.versions("prop"):
            # every line was blank: streamed state, if created, is empty
            assert lg.catalog.get_source("prop", 1).row_count == 0
        return

    # committed streaming state ≡ one-shot of the committed rows,
    # whether or not a later batch failed (rollback must leave the
    # last committed state intact)
    ref = _oneshot(lg, tmp, "prop_ref", committed)
    assert not isinstance(ref, Exception)
    got = lg.catalog.get_source("prop", 1)
    # NB not compared against len(committed): Spark's CSV reader skips
    # fully-empty lines, identically on both paths
    assert got.row_count == ref.row_count
    # same lattice outcome per column (by position; headers may differ
    # when a later file introduced the column)
    assert [c[2] for c in got.columns] == [c[2] for c in ref.columns]
    g = lg.dataframe(got, typed=True).orderBy("ix").collect()
    r = lg.dataframe(ref, typed=True).orderBy("ix").collect()
    assert [tuple(x) for x in g] == [tuple(x) for x in r]
