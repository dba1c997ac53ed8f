"""Type-inference lattice tests (fixtures F1-F5 semantics)."""

import re

import pytest

from lagoon_spark.ingest.infer import (
    BOOL_RE,
    INT4_RE,
    INT8_RE,
    MAX_TEXT_LEN,
    REAL_RE,
    ColumnType,
    R_BIGINT,
    R_BOOL,
    R_INT,
    R_REAL,
    R_TEXT,
    rank_to_type,
)


def classify(v: str) -> int:
    if re.match(BOOL_RE, v):
        return R_BOOL
    if re.match(INT4_RE, v):
        return R_INT
    if re.match(INT8_RE, v):
        return R_BIGINT
    if re.match(REAL_RE, v):
        return R_REAL
    return R_TEXT


@pytest.mark.parametrize(
    "v",
    ["t", "T", "true", "TRUE", "True", "y", "yes", "YES", "on", "ON", "1",
     "f", "false", "n", "no", "off", "0", "  t  ", "\ttrue\n"],
)
def test_bool_literals(v):
    assert classify(v) == R_BOOL


@pytest.mark.parametrize("v", ["tr", "tru", "yess", "onn", "truee", "10"])
def test_not_bool(v):
    assert classify(v) != R_BOOL


def test_int_widths():
    assert classify("2") == R_INT
    assert classify("-123456789") == R_INT  # 9 digits
    assert classify("1234567890") == R_BIGINT  # 10 digits
    assert classify("123456789012345678") == R_BIGINT  # 18
    assert classify("1234567890123456789") == R_TEXT  # 19 → text
    assert classify("+42") == R_INT


def test_reals_postgres_syntax():
    assert classify("2.5") == R_REAL
    assert classify("-4.") == R_REAL
    assert classify(".5") == R_REAL
    assert classify("+5e11") == R_REAL
    assert classify("2.3e-44") == R_REAL
    assert classify("-6.7e+5") == R_REAL
    assert classify("5e123") == R_REAL


def test_out_of_range_exponent_is_text():
    # F3: exponent longer than 3 digits pre-rejected
    assert classify("11e1111") == R_TEXT
    assert classify("-66.77e-4444") == R_TEXT


def test_misc_text():
    assert classify("") == R_TEXT
    assert classify("   ") == R_TEXT
    assert classify("abc") == R_TEXT
    assert classify("1 2") == R_TEXT
    assert classify("café") == R_TEXT


def test_lattice_unify_is_max():
    # bool ⊔ int = int; int ⊔ real = real; x ⊔ text = text
    assert rank_to_type(max(R_BOOL, R_INT), 1) == ColumnType.INT
    assert rank_to_type(max(R_INT, R_REAL), 3) == ColumnType.REAL
    assert rank_to_type(max(R_BOOL, R_REAL), 3) == ColumnType.REAL
    assert rank_to_type(max(R_INT, R_BIGINT), 10) == ColumnType.BIGINT
    assert rank_to_type(max(R_REAL, R_TEXT), 3) == ColumnType.TEXT


def test_document_threshold():
    assert rank_to_type(R_TEXT, MAX_TEXT_LEN) == ColumnType.TEXT
    assert rank_to_type(R_TEXT, MAX_TEXT_LEN + 1) == ColumnType.DOCUMENT


def test_spark_inference_f1(spark, tmp_path):
    """F1-style CSV through the Spark aggregation path."""
    from lagoon_spark.ingest.csv import CsvFormat, read_untyped, scan_width
    from lagoon_spark.ingest.infer import infer_column_types

    p = tmp_path / "f1.csv"
    p.write_text(
        "bool,int,bigint,real,text\n"
        "0,0,0,0,t\n"
        "1,1,1,1,f\n"
        "t,2,2,2,0\n"
        "f,3,3,3,1\n"
        "true,4,4,3.5,a\n"
        "false,5,1123456789,3.6,b\n"
    )
    fmt = CsvFormat()
    width, header, _bad = scan_width(spark, str(p), fmt)
    assert width == 5 and header == ["bool", "int", "bigint", "real", "text"]
    df = read_untyped(spark, str(p), fmt, width)
    types = [ic.type for ic in infer_column_types(df)]
    assert types == [
        ColumnType.BOOL,
        ColumnType.INT,
        ColumnType.BIGINT,
        ColumnType.REAL,
        ColumnType.TEXT,
    ]
