"""Expressions compiler (functions/expressions.py) — grammar,
function table, and bindings per JavascriptCompiler.java semantics."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.functions.expressions import compile_expression


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [(1, 4.0, 100.0), (2, 9.0, 50.0)], "id long, a double, b double"
    )


def _run(df, src):
    b = {"a": F.col("a"), "b": F.col("b"), "_score": F.col("b")}
    return [
        r[0] for r in df.orderBy("id").select(compile_expression(src, b)).collect()
    ]


def test_arithmetic_and_functions(df):
    assert _run(df, "sqrt(a) + ln(b)") == [
        2 + math.log(100), 3 + math.log(50)
    ]
    assert _run(df, "min(a, b) * 2 + max(a, 3)") == [12.0, 27.0]
    assert _run(df, "logn(2, 8)") == [3.0, 3.0]  # MathUtil.log(base, x)
    assert _run(df, "pow(a, 2) % 7") == [2.0, 4.0]


def test_hex_literals_and_unary(df):
    assert _run(df, "0x10 + -a") == [12.0, 7.0]


def test_booleans_are_one_or_zero(df):
    # JavascriptCompiler class docs: boolean ops return 1 or 0 doubles
    assert _run(df, "a == 4 && b >= 100") == [1.0, 0.0]
    assert _run(df, "!(a < 5) || b == 50") == [0.0, 1.0]
    assert _run(df, "a != 4") == [0.0, 1.0]


def test_ternary(df):
    assert _run(df, "a > 5 ? b : -b") == [-100.0, 50.0]
    assert _run(df, "a > 0 ? (a > 5 ? 1 : 2) : 3") == [2.0, 1.0]


def test_score_binding(df):
    assert _run(df, "_score / 2") == [50.0, 25.0]


def test_haversin_kilometres(df):
    # one degree of longitude on the equator ~ 111.2 km
    got = _run(df, "haversin(0, 0, 0, 1)")[0]
    assert 110.5 < got < 112.0


def test_errors(df):
    b = {"a": F.col("a")}
    with pytest.raises(ValueError):
        compile_expression("nope(a)", b)
    with pytest.raises(ValueError):
        compile_expression("zz + 1", b)
    with pytest.raises(ValueError):
        compile_expression("min(a)", b)  # wrong arity
    with pytest.raises(ValueError):
        compile_expression("a +", b)
    with pytest.raises(ValueError):
        compile_expression("a ? 1", b)  # missing ':'
