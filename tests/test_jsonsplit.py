import io

import pytest

from lagoon_spark.ingest.jsonsplit import (
    HERE,
    JsonSplitError,
    parse_path,
    render_path,
    split_values,
)


def split(text, path=HERE):
    return list(split_values(io.StringIO(text), path))


def test_jsonl_top_level():
    assert split('{"id": 1}\n{"id": 2, "name": "test"}\n') == [
        '{"id": 1}',
        '{"id": 2, "name": "test"}',
    ]


def test_whitespace_separated_values():
    assert split("1 2 3") == ["1", "2", "3"]
    assert split('true false null "x"') == ["true", "false", "null", '"x"']


def test_array_split_path():
    # F16: giant array with path [_] → one row per element
    assert split("[1,2,3]", parse_path("[_]")) == ["1", "2", "3"]
    assert split('[{"a":1}, {"b":2}]', parse_path("[_]")) == ['{"a":1}', '{"b":2}']


def test_field_path():
    doc = '{"meta": 1, "items": [10, 20]}'
    assert split(doc, parse_path('{"items":[_]}')) == ["10", "20"]
    assert split(doc, parse_path('{"meta":_}')) == ["1"]


def test_raw_bytes_preserved():
    # F14: escapes must byte-roundtrip
    doc = '{"name": "John \\"Crazy\\" Smith"}'
    assert split(doc) == [doc]


def test_nested_path():
    doc = '[{"xs": [1, 2]}, {"xs": [3]}]'
    assert split(doc, parse_path('[{"xs":[_]}]')) == ["1", "2", "3"]


def test_invalid_json_fails():
    with pytest.raises(JsonSplitError):
        split('{"a": 5')


def test_multiline_value():
    doc = '{\n  "a": 1\n}'
    assert split(doc) == [doc]


def test_path_render_roundtrip():
    for s in ["_", "[_]", '{"k":_}', '{"k":[_]}']:
        assert render_path(parse_path(s)) == s


def test_constant_memory_large_array():
    # 100k elements through a 64KB-chunk scanner
    big = "[" + ",".join(str(i) for i in range(100_000)) + "]"
    vals = split(big, parse_path("[_]"))
    assert len(vals) == 100_000
    assert vals[0] == "0" and vals[-1] == "99999"
