"""Differential test of the inference lattice: the Spark rank
expression vs an independent hand-written lexer that follows the
reference's Alex rules directly (InferFieldType.x:28-83) — character
walking, not regexes — over a generated adversarial corpus. Catches
regex-vs-spec divergence the fixture tests can't (they share the
regexes with the implementation).
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from lagoon_spark.ingest.infer import (
    R_BIGINT,
    R_BOOL,
    R_INT,
    R_REAL,
    R_TEXT,
    rank_expr,
)

ASCII_WS = " \t\n\r\f\x0b"
BOOLS = {"t", "true", "y", "yes", "on", "1", "f", "false", "n", "no", "off", "0"}


def model_classify(v: str) -> int:
    """InferFieldType.x re-implemented as a character walk: optional
    ASCII whitespace around the token (Java \\s semantics — unicode
    spaces are NOT whitespace), Postgres bool literals, digit-count int
    widths, Postgres float syntax with a 3-digit exponent cap."""
    s = v.strip(ASCII_WS)
    if s.lower() in BOOLS:
        return R_BOOL

    body = s[1:] if s[:1] in "+-" else s
    if body.isascii() and body.isdigit():
        if 1 <= len(body) <= 9:
            return R_INT
        if 10 <= len(body) <= 18:
            return R_BIGINT
        return R_TEXT

    # Postgres float: digits[.digits][e[+-]ddd] | .digits[e..] | digits.[e..]
    i = 0
    t = body
    int_digits = 0
    while i < len(t) and t[i].isascii() and t[i].isdigit():
        int_digits += 1
        i += 1
    frac_digits = 0
    has_dot = i < len(t) and t[i] == "."
    if has_dot:
        i += 1
        while i < len(t) and t[i].isascii() and t[i].isdigit():
            frac_digits += 1
            i += 1
    if int_digits + frac_digits == 0:
        return R_TEXT
    has_exp = i < len(t) and t[i] in "eE"
    if has_exp:
        i += 1
        if i < len(t) and t[i] in "+-":
            i += 1
        exp_digits = 0
        while i < len(t) and t[i].isascii() and t[i].isdigit():
            exp_digits += 1
            i += 1
        if not (1 <= exp_digits <= 3):
            return R_TEXT
    if i != len(t):
        return R_TEXT
    # a bare integer (no dot, no exponent) was already handled above;
    # reaching here with neither dot nor exponent means stray chars
    if not has_dot and not has_exp:
        return R_TEXT
    return R_REAL


def _corpus() -> list[str]:
    vals: list[str] = []
    signs = ["", "+", "-"]
    bodies = ["0", "7", "123456789", "1234567890", "123456789012345678",
              "1234567890123456789", "00000000001"]
    dots = ["", ".", ".5", ".25"]
    exps = ["", "e5", "E+07", "e-123", "e1234", "e", "e+", "E-"]
    for s, b, d, e in itertools.product(signs, bodies, dots, exps):
        vals.append(s + b + d + e)
    for s, d, e in itertools.product(signs, [".5", "."], exps):
        vals.append(s + d + e)
    for w in ["t", "TRUE", "Yes", "oFF", "no", "on", "0", "1", "tr", "truee",
              "ye", "offf", "falsey"]:
        for pad in ["", " ", "  \t", "\n"]:
            vals.append(pad + w + pad)
    vals += ["", " ", "\t", "\xa0", "\xa0true", "true\xa0", " +1 ", "+ 1",
             "1 2", "١٢٣", "1.2.3", "--5", "++5", "5-", "e5", ".e5", "NaN",
             "inf", "0x1F", "1_000", "¼", "3,14", "∞", "true false"]
    return vals


def test_spark_expr_matches_independent_lexer(spark):
    corpus = _corpus()
    df = spark.createDataFrame([(v,) for v in corpus], "v string")
    got = {
        r["v"]: r["rank"]
        for r in df.select("v", rank_expr("v").alias("rank")).collect()
    }
    bad = [
        (v, got[v], model_classify(v))
        for v in corpus
        if got[v] != model_classify(v)
    ]
    assert not bad, f"{len(bad)} divergences, first 10: {bad[:10]}"
