"""JsonType lattice tests (fixture F13 family)."""

import pytest

from lagoon_spark.ingest.jsontype import (
    infer_strings,
    parse,
    render,
)


@pytest.mark.parametrize(
    "values,expected",
    [
        (["[]"], "[unknown]"),
        (["[1,2]"], "[number]"),
        (['[1,"a"]'], "[mixed]"),
        (["[1,null]"], "[nullable number]"),
        (["[null,1]"], "[nullable number]"),
        (['{"a":true,"b":1}'], '{"a":bool, "b":number}'),
        (['[{"a":1},{"b":true}]'], '{"a":optional number, "b":optional bool}'
         .join(["[", "]"])),
        (["1", "2"], "number"),
        (['"x"'], "string"),
        (["null"], "nullable unknown"),
        (["[[1],[2]]"], "[[number]]"),
        (['{"a":{"b":1}}'], '{"a":{"b":number}}'),
        # across values: key missing in one object → optional
        (['{"id":1}', '{"id":2,"name":"test"}'],
         '{"id":number, "name":optional string}'),
        # nullable value vs optional key are distinct
        (['{"a":null}', '{"a":1}'], '{"a":nullable number}'),
        (['{"a":1}', '{}'], '{"a":optional number}'),
    ],
)
def test_lattice(values, expected):
    assert render(infer_strings(values)) == expected


def test_mixed_scalars():
    assert render(infer_strings(["1", '"a"'])) == "mixed"
    assert render(infer_strings(["true", "1"])) == "mixed"


def test_parse_roundtrip():
    for s in [
        "mixed",
        "unknown",
        "number",
        "[nullable number]",
        '{"a":bool, "b":optional [string]}',
        '{"items":[string], "place":string}',
    ]:
        assert render(parse(s)) == render(parse(render(parse(s))))


def test_invalid_json_fails():
    with pytest.raises(ValueError):
        infer_strings(['{"a": 5'])
