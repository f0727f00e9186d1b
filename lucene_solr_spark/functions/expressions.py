"""Lucene expressions module analog — compiled score expressions
(lucene/expressions/src/java/org/apache/lucene/expressions/js/
JavascriptCompiler.java + Javascript.g grammar, SimpleBindings.java).

The reference compiles an arithmetic expression string ("sqrt(_score)
+ ln(popularity)") into JVM BYTECODE once, then evaluates it per doc
against bound value sources. The Spark-first twin compiles the same
grammar into a Catalyst `Column` expression tree once — Tungsten
whole-stage codegen then JIT-compiles it into the generated stage
exactly like the reference's ASM bytecode, so evaluation is JVM-native
per row with zero interpretation overhead (and zero Python in the
loop).

Bindings map expression variables to Columns (SimpleBindings: a
variable is a field's doc values or the relevance `_score`).

Function table = the reference's full DEFAULT_FUNCTIONS registry
(expressions/js/JavascriptCompiler.properties): abs acos acosh asin
asinh atan atan2 atanh ceil cos cosh exp floor haversin ln log10 logn
max min pow sin sinh sqrt tan tanh — all double-typed like the
reference (everything is a double; booleans are 1/0,
JavascriptCompiler.java class docs).

Grammar subset of Javascript.g: ternary `?:`, `||`, `&&`, comparisons
(`== != < <= > >=`), `+ - * / %`, unary `- !`, parentheses, decimal /
hex literals, dotted identifiers. Bitwise/shift operators are out of
scope (documented).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def _haversin(lat1, lon1, lat2, lon2) -> Column:
    # SloppyMath.haversin returns KILOMETres; spatial.haversine_m is
    # the same Sinnott formula in metres (deviation documented there)
    from lucene_solr_spark.search.spatial import haversine_m

    return haversine_m(lat1, lon1, lat2, lon2) / F.lit(1000.0)


_FUNCS = {
    # name: (arity, builder) — JavascriptCompiler.properties
    "abs": (1, F.abs),
    "acos": (1, F.acos),
    "acosh": (1, F.acosh),
    "asin": (1, F.asin),
    "asinh": (1, F.asinh),
    "atan": (1, F.atan),
    "atan2": (2, F.atan2),
    "atanh": (1, F.atanh),
    "ceil": (1, F.ceil),
    "cos": (1, F.cos),
    "cosh": (1, F.cosh),
    "exp": (1, F.exp),
    "floor": (1, F.floor),
    "haversin": (4, _haversin),
    "ln": (1, F.log),
    "log10": (1, F.log10),
    # MathUtil.log(base, x) = log(x) / log(base)
    "logn": (2, lambda base, x: F.log(x) / F.log(base)),
    "max": (2, F.greatest),
    "min": (2, F.least),
    "pow": (2, F.pow),
    "sin": (1, F.sin),
    "sinh": (1, F.sinh),
    "sqrt": (1, F.sqrt),
    "tan": (1, F.tan),
    "tanh": (1, F.tanh),
}

_NUM = r"(?:0[xX][0-9a-fA-F]+|\d+\.?\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?)"
_LEX = re.compile(
    rf"""\s*(?:
      (?P<num>{_NUM})
    | (?P<ident>[A-Za-z_][A-Za-z0-9_.]*)
    | (?P<op>\|\||&&|==|!=|<=|>=|[?:<>+\-*/%(),!])
    )""",
    re.X,
)


def _tokens(src: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(src):
        m = _LEX.match(src, i)
        if not m or m.end() == i:
            if src[i:].strip():
                raise ValueError(f"expression lex error at {src[i:]!r}")
            break
        i = m.end()
        for g in ("num", "ident", "op"):
            if m.group(g):
                out.append((g, m.group(g)))
                break
    return out


def _bool(c: Column) -> Column:
    """Truthiness per the reference: nonzero double is true."""
    return c != F.lit(0.0)


def _num(c: Column) -> Column:
    """Boolean-producing ops return 1/0 doubles (JavascriptCompiler
    class docs: 'boolean operators return 1 or 0')."""
    return F.when(c, F.lit(1.0)).otherwise(F.lit(0.0))


class _Compiler:
    def __init__(self, toks: list[tuple[str, str]],
                 bindings: dict[str, Column]):
        self.toks = toks
        self.b = bindings
        self.i = 0

    def _peek(self) -> str | None:
        if self.i < len(self.toks):
            k, v = self.toks[self.i]
            return v if k == "op" else None
        return None

    def _eat(self, op: str) -> bool:
        if self._peek() == op:
            self.i += 1
            return True
        return False

    def compile(self) -> Column:
        c = self._ternary()
        if self.i != len(self.toks):
            raise ValueError(f"trailing tokens {self.toks[self.i:]}")
        return c

    def _ternary(self) -> Column:
        cond = self._or()
        if self._eat("?"):
            a = self._ternary()
            if not self._eat(":"):
                raise ValueError("expected ':' in conditional")
            b = self._ternary()
            return F.when(_bool(cond), a).otherwise(b)
        return cond

    def _or(self) -> Column:
        c = self._and()
        while self._eat("||"):
            c = _num(_bool(c) | _bool(self._and()))
        return c

    def _and(self) -> Column:
        c = self._eq()
        while self._eat("&&"):
            c = _num(_bool(c) & _bool(self._eq()))
        return c

    def _eq(self) -> Column:
        c = self._cmp()
        while True:
            if self._eat("=="):
                c = _num(c == self._cmp())
            elif self._eat("!="):
                c = _num(c != self._cmp())
            else:
                return c

    def _cmp(self) -> Column:
        c = self._add()
        while True:
            if self._eat("<="):
                c = _num(c <= self._add())
            elif self._eat(">="):
                c = _num(c >= self._add())
            elif self._eat("<"):
                c = _num(c < self._add())
            elif self._eat(">"):
                c = _num(c > self._add())
            else:
                return c

    def _add(self) -> Column:
        c = self._mul()
        while True:
            if self._eat("+"):
                c = c + self._mul()
            elif self._eat("-"):
                c = c - self._mul()
            else:
                return c

    def _mul(self) -> Column:
        c = self._unary()
        while True:
            if self._eat("*"):
                c = c * self._unary()
            elif self._eat("/"):
                c = c / self._unary()
            elif self._eat("%"):
                c = c % self._unary()
            else:
                return c

    def _unary(self) -> Column:
        if self._eat("-"):
            return -self._unary()
        if self._eat("!"):
            return _num(~_bool(self._unary()))
        return self._atom()

    def _atom(self) -> Column:
        if self._eat("("):
            c = self._ternary()
            if not self._eat(")"):
                raise ValueError("expected ')'")
            return c
        if self.i >= len(self.toks):
            raise ValueError("unexpected end of expression")
        kind, val = self.toks[self.i]
        self.i += 1
        if kind == "num":
            x = float(int(val, 16)) if val[:2].lower() == "0x" else float(val)
            return F.lit(x)
        if kind == "ident":
            if self._eat("("):
                if val not in _FUNCS:
                    raise ValueError(f"unknown function {val!r}")
                arity, fn = _FUNCS[val]
                args = [self._ternary()]
                while self._eat(","):
                    args.append(self._ternary())
                if not self._eat(")"):
                    raise ValueError("expected ')'")
                if len(args) != arity:
                    raise ValueError(
                        f"{val} takes {arity} args, got {len(args)}"
                    )
                return fn(*args).cast("double")
            if val not in self.b:
                raise ValueError(
                    f"unbound variable {val!r} (have {sorted(self.b)})"
                )
            return self.b[val].cast("double")
        raise ValueError(f"unexpected token {val!r}")


def compile_expression(src: str, bindings: dict[str, Column]) -> Column:
    """Compile a Javascript-grammar expression into one Catalyst
    Column (the Expression.getValues analog — evaluate by selecting
    it). Every variable must be bound (SimpleBindings.validate)."""
    return _Compiler(_tokens(src), bindings).compile()
