"""Postgres JSON operator shim semantics (lagoon_spark.functions)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lagoon_spark.functions import json_ops as j


@pytest.fixture(scope="module")
def jdf(spark):
    rows = [
        (1, '{"a": {"b": [1, 2]}, "tag": "x"}'),
        (2, '{"a": 1, "b": 2}'),
        (3, '[1, 2, 3]'),
        (4, '{"a": [1, 2, 3]}'),
        (5, None),
    ]
    return spark.createDataFrame(rows, "id long, js string")


def _vals(df, col):
    return {r["id"]: r[col] for r in df.collect()}


def test_arrow_operators(jdf):
    out = jdf.select(
        "id",
        j.json_get("js", "a").alias("ga"),
        j.json_path_text("js", ["a", "b", 0]).alias("p"),
    )
    v = _vals(out, "ga")
    assert v[2] == "1"
    assert v[1] == '{"b":[1,2]}'
    assert _vals(out, "p")[1] == "1"


def test_exists_operators(jdf):
    out = jdf.select(
        "id",
        j.jsonb_exists("js", "a").alias("e"),
        j.jsonb_exists_all("js", ["a", "b"]).alias("ea"),
        j.jsonb_exists_any("js", ["tag", "zzz"]).alias("eo"),
    )
    assert _vals(out, "e")[1] is True and _vals(out, "e")[3] is None
    assert _vals(out, "ea")[2] is True and _vals(out, "ea")[1] is False
    assert _vals(out, "eo")[1] is True and _vals(out, "eo")[2] is False


@pytest.mark.parametrize(
    "hay,needle,expect",
    [
        ('{"a": 1, "b": 2}', '{"a": 1}', True),
        ('{"a": 1}', '{"a": 2}', False),
        ('{"a": {"b": [1, 2]}}', '{"a": {"b": [2]}}', True),
        ('[1, 2, 3]', '[3, 1]', True),
        ('[1, 2, 3]', '[4]', False),
        ('[1, 2, 3]', '2', True),  # scalar-in-array special case
        ('{"a": 1}', '[1]', False),
    ],
)
def test_pg_containment_rules(spark, hay, needle, expect):
    df = spark.createDataFrame([(hay,)], "js string")
    got = df.select(j.jsonb_contains("js", needle).alias("c")).collect()[0]["c"]
    assert got is expect


def test_contained_is_reverse(spark):
    df = spark.createDataFrame([('{"a": 1}',)], "js string")
    got = df.select(j.jsonb_contained("js", '{"a": 1, "b": 2}').alias("c")).collect()[0]["c"]
    assert got is True


def test_null_and_invalid_json(jdf):
    out = _vals(jdf.select("id", j.jsonb_contains("js", "{}").alias("c")), "c")
    assert out[5] is None
    bad = jdf.sparkSession.createDataFrame([(1, "{not json")], "id long, js string")
    assert _vals(bad.select("id", j.jsonb_contains("js", "{}").alias("c")), "c")[1] is None


@pytest.mark.parametrize(
    "js,key,expect",
    [
        ('{"a": 1, "k": 7}', "k", '{"a":1}'),
        ('{"a": 1}', "k", '{"a":1}'),  # absent key → unchanged
        ('["x", "y", "x"]', "x", '["y"]'),  # string element removal
        ('["a", "b", "c"]', 1, '["a","c"]'),  # index removal
        ('["a", "b", "c"]', -1, '["a","b"]'),  # negative index
    ],
)
def test_jsonb_delete_key(spark, js, key, expect):
    df = spark.createDataFrame([(js,)], "js string")
    got = df.select(j.jsonb_delete_key("js", key).alias("d")).collect()[0]["d"]
    assert got == expect


@pytest.mark.parametrize(
    "js,path,expect",
    [
        ('{"a": {"b": 1, "c": 2}}', ["a", "b"], '{"a":{"c":2}}'),
        ('{"a": [10, 20]}', ["a", 0], '{"a":[20]}'),
        ('{"a": 1}', ["x", "y"], '{"a":1}'),  # absent path → unchanged
        ('{"a": 1}', [], '{"a":1}'),  # #- '{}' → operand unchanged
    ],
)
def test_jsonb_delete_path(spark, js, path, expect):
    df = spark.createDataFrame([(js,)], "js string")
    got = df.select(j.jsonb_delete_path("js", path).alias("d")).collect()[0]["d"]
    assert got == expect


@pytest.mark.parametrize(
    "js,other,expect",
    [
        ('{"a": 1}', '{"b": 2}', '{"a":1,"b":2}'),
        ('{"a": 1}', '{"a": 9}', '{"a":9}'),  # right wins
        ("[1]", "[2, 3]", "[1,2,3]"),
        ('"x"', "[1]", '["x",1]'),  # scalar promotes to array
    ],
)
def test_jsonb_concat(spark, js, other, expect):
    df = spark.createDataFrame([(js,)], "js string")
    got = df.select(j.jsonb_concat("js", other).alias("d")).collect()[0]["d"]
    assert got == expect
