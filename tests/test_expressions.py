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


def test_randomized_parity_with_python_eval(spark):
    """50 seeded random ASTs rendered BOTH as expression source and as
    a direct Python value, all compiled into ONE select (the
    JavascriptCompiler testsuite strategy: random expressions vs a
    reference evaluator)."""
    import math
    import random

    rng = random.Random(42)
    vals = {"a": 4.0, "b": 7.5, "c": -2.0}
    UN = {"abs": abs, "exp": math.exp,
          "floor": lambda x: float(math.floor(x)),
          "ceil": lambda x: float(math.ceil(x))}
    BIN = {"min": lambda x, y: float(min(x, y)),
           "max": lambda x, y: float(max(x, y)),
           "atan2": math.atan2}
    CMP = {"<": lambda x, y: 1.0 if x < y else 0.0,
           "<=": lambda x, y: 1.0 if x <= y else 0.0,
           ">": lambda x, y: 1.0 if x > y else 0.0,
           ">=": lambda x, y: 1.0 if x >= y else 0.0,
           "==": lambda x, y: 1.0 if x == y else 0.0,
           "!=": lambda x, y: 1.0 if x != y else 0.0}
    ARITH = {"+": lambda x, y: x + y, "-": lambda x, y: x - y,
             "*": lambda x, y: x * y}

    def gen(depth=0):
        """Returns (source_fragment, python_value)."""
        r = rng.random()
        if depth > 3 or r < 0.25:
            if rng.random() < 0.5:
                x = round(rng.uniform(1e-3, 10), 3)  # positive literal:
                return repr(x), x  # negative handled by unary minus
            n = rng.choice(sorted(vals))
            return n, vals[n]
        if r < 0.5:
            op = rng.choice(sorted(ARITH))
            (sa, va), (sb, vb) = gen(depth + 1), gen(depth + 1)
            return f"({sa} {op} {sb})", ARITH[op](va, vb)
        if r < 0.62:
            fn = rng.choice(sorted(UN))
            sa, va = gen(depth + 1)
            return f"{fn}({sa})", UN[fn](va)
        if r < 0.72:
            fn = rng.choice(sorted(BIN))
            (sa, va), (sb, vb) = gen(depth + 1), gen(depth + 1)
            return f"{fn}({sa}, {sb})", BIN[fn](va, vb)
        if r < 0.82:
            op = rng.choice(sorted(CMP))
            (sa, va), (sb, vb) = gen(depth + 1), gen(depth + 1)
            return f"({sa} {op} {sb})", CMP[op](va, vb)
        if r < 0.9:
            sa, va = gen(depth + 1)
            return f"(-{sa})", -va
        (sc, vc), (sa, va), (sb, vb) = (
            gen(depth + 1), gen(depth + 1), gen(depth + 1)
        )
        return f"({sc} ? {sa} : {sb})", (va if vc != 0.0 else vb)

    exprs = [gen() for _ in range(50)]
    df = spark.createDataFrame(
        [tuple(vals[n] for n in sorted(vals))], "a double, b double, c double"
    )
    b = {n: F.col(n) for n in vals}
    row = df.select(
        *[compile_expression(src, b).alias(f"e{i}")
          for i, (src, _) in enumerate(exprs)]
    ).first()
    for i, (src, exp) in enumerate(exprs):
        assert row[i] == pytest.approx(exp, rel=1e-12, abs=1e-12), (
            src, row[i], exp
        )


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
