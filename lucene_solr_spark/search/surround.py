"""Surround query parser — the span-proximity grammar
(lucene/queryparser/src/java/org/apache/lucene/queryparser/surround/):
`W` = ordered distance, `N` = unordered distance, with an optional
distance number prefix (`3W`, `2N`; default 1 = adjacent), composing
under AND / OR / NOT and parentheses, plus truncated terms (`pre*`,
`wild*card`, `?`).

Reference semantics:
- `a 3W b` -> SpanNearQuery([a, b], slop = opDistance - 1, inOrder)
  (surround/query/DistanceQuery.java:100: `new SpanNearQuery(
  spanClauses, getOpDistance() - 1, subQueriesOrdered())`).
- Prefix form `3W(a, b, c)` is the same operator n-ary
  (parser/QueryParser.jj:345-417 N/W productions).
- OR inside a distance operand becomes a SpanOr (SpanNearClause
  Factory.java builds the union); AND / NOT inside a distance operand
  is rejected, as in the reference (DistanceQuery.
  distanceSubQueryNotAllowed).
- Truncated words lift through SpanMultiTermQueryWrapper (SrndPrefix
  Query / SrndTruncQuery -> the dictionary expansion).
- AND / OR / NOT above distance level build an ordinary BooleanQuery
  whose span operands stay span leaves (SrndBooleanQuery.java) — the
  engine's boolean tree kernel accepts spans leaves for exactly this.
- Operators are case-insensitive (`and`/`AND`, `5w`/`5W`); terms
  lowercase. Precedence (loosest to tightest): OR, AND, NOT, distance
  (QueryParser.jj: OrQuery > AndQuery > NotQuery > NQuery > WQuery).

Subset: boosts (`^f`) and nested field scoping are out of scope.
"""

from __future__ import annotations

import re

from lucene_solr_spark.search.query import (
    BooleanQuery,
    Clause,
    PrefixQuery,
    Query,
    SpanMultiTermQueryWrapper,
    SpanNearQuery,
    SpanOrQuery,
    SpanQuery,
    SpanTermQuery,
    TermQuery,
    WildcardQuery,
)

_TOK = re.compile(
    r"""\s*(?:
      (?P<lparen>\()
    | (?P<rparen>\))
    | (?P<comma>,)
    | (?P<dist>(?P<dnum>\d+)?(?P<dop>[WwNn])\b)
    | (?P<word>[^\s(),]+)
    )""",
    re.X,
)

_OPS = {"and", "or", "not"}


def _lex(s: str) -> list[tuple[str, object]]:
    out: list[tuple[str, object]] = []
    i = 0
    while i < len(s):
        m = _TOK.match(s, i)
        if not m or m.end() == i:
            if s[i:].strip():
                raise ValueError(f"surround lex error at {s[i:]!r}")
            break
        i = m.end()
        if m.group("lparen"):
            out.append(("(", None))
        elif m.group("rparen"):
            out.append((")", None))
        elif m.group("comma"):
            out.append((",", None))
        elif m.group("dist"):
            n = int(m.group("dnum")) if m.group("dnum") else 1
            if n < 1:
                raise ValueError("distance must be >= 1")
            out.append(("dist", (n, m.group("dop").lower() == "w")))
        else:
            w = m.group("word")
            lw = w.lower()
            out.append(("op", lw) if lw in _OPS else ("word", lw))
    return out


class _Parser:
    """Recursive descent over the surround precedence chain."""

    def __init__(self, toks: list[tuple[str, object]]):
        self.toks = toks
        self.i = 0

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def _next(self):
        t = self._peek()
        self.i += 1
        return t

    def parse(self):
        q = self._or()
        if self._peek()[0] is not None:
            raise ValueError(f"trailing tokens at {self.toks[self.i:]}")
        return q

    def _or(self):
        subs = [self._and()]
        while self._peek() == ("op", "or"):
            self._next()
            subs.append(self._and())
        return subs[0] if len(subs) == 1 else ("or", subs)

    def _and(self):
        subs = [self._not()]
        while self._peek() == ("op", "and"):
            self._next()
            subs.append(self._not())
        return subs[0] if len(subs) == 1 else ("and", subs)

    def _not(self):
        left = self._dist()
        while self._peek() == ("op", "not"):
            self._next()
            right = self._dist()
            left = ("not", [left, right])
        return left

    def _dist(self):
        left = self._prim()
        while self._peek()[0] == "dist":
            _, (n, ordered) = self._next()
            right = self._prim()
            # same-op chains collect n-ary (a W b W c == W(a,b,c))
            if (
                isinstance(left, tuple)
                and left[0] == "dist"
                and left[1] == (n, ordered)
            ):
                left = ("dist", (n, ordered), left[2] + [right])
            else:
                left = ("dist", (n, ordered), [left, right])
        return left

    def _prim(self):
        kind, val = self._peek()
        if kind == "(":
            self._next()
            q = self._or()
            if self._next()[0] != ")":
                raise ValueError("expected ')'")
            return q
        if kind == "dist":
            # prefix form: 3W(a, b, c)
            self._next()
            if self._next()[0] != "(":
                raise ValueError("expected '(' after prefix distance op")
            subs = [self._or()]
            while self._peek()[0] == ",":
                self._next()
                subs.append(self._or())
            if self._next()[0] != ")":
                raise ValueError("expected ')'")
            return ("dist", val, subs)
        if kind == "word":
            self._next()
            return ("word", val)
        raise ValueError(f"unexpected token {kind!r}")


def _to_span(ast) -> SpanQuery:
    """Distance-operand conversion: word/trunc/or/dist only
    (DistanceQuery.distanceSubQueryNotAllowed for and/not)."""
    if ast[0] == "word":
        w = ast[1]
        if "*" in w or "?" in w:
            if w.endswith("*") and "*" not in w[:-1] and "?" not in w:
                return SpanMultiTermQueryWrapper(PrefixQuery(w[:-1]))
            return SpanMultiTermQueryWrapper(WildcardQuery(w))
        return SpanTermQuery(w)
    if ast[0] == "or":
        return SpanOrQuery(tuple(_to_span(s) for s in ast[1]))
    if ast[0] == "dist":
        (n, ordered), subs = ast[1], ast[2]
        return SpanNearQuery(
            tuple(_to_span(s) for s in subs), n - 1, ordered
        )
    raise ValueError(
        f"operator {ast[0].upper()} not allowed inside a distance operand"
    )


def _to_query(ast) -> Query:
    if ast[0] == "word":
        w = ast[1]
        if "*" in w or "?" in w:
            return _to_span(ast)  # standalone truncation: span or leaf
        return TermQuery(w)
    if ast[0] == "dist":
        return _to_span(ast)
    if ast[0] == "or":
        return BooleanQuery(
            tuple(Clause("SHOULD", _to_query(s)) for s in ast[1])
        )
    if ast[0] == "and":
        return BooleanQuery(
            tuple(Clause("MUST", _to_query(s)) for s in ast[1])
        )
    if ast[0] == "not":
        left, right = ast[1]
        return BooleanQuery(
            (
                Clause("MUST", _to_query(left)),
                Clause("MUST_NOT", _to_query(right)),
            )
        )
    raise ValueError(f"bad ast {ast!r}")


def surround_query(s: str) -> Query:
    """Parse a surround expression into the engine's query algebra."""
    return _to_query(_Parser(_lex(s)).parse())
