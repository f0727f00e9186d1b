"""Streaming-expression STRING grammar — the reference's actual
user-facing entry point for the dataflow algebra.

`StreamExpressionParser.java:37-81` parses prefix-notation clauses
(`name(operand, operand, named=value, ...)`) into a tree of
StreamExpression / StreamExpressionNamedParameter /
StreamExpressionValue nodes; `StreamFactory.java:66` maps function
names to TupleStream classes (the registration set the reference's own
tests use: search/merge/unique/top/group/rollup/parallel +
count/sum/min/max/avg metrics — `StreamingTest.java:116-121`,
`StreamExpressionToExpessionTest.java:43-49`).

This module is that parser + factory rebuilt over the DataFrame-native
decorators in `streaming/expressions.py`: `construct()` turns an
expression STRING into one lazy DataFrame, so the whole pipeline is a
single Catalyst plan (the reference instantiates a per-tuple iterator
chain). The parser is a hand-rolled recursive splitter like the
reference's (quote- and paren-aware `splitOn`), not a transliteration.

Per-stream parameter shapes (each stream's expression ctor):
- `search(table, q=..., fl="a,b,c", sort="f asc,...")`
  (CloudSolrStream.java:97-117; `q` subset documented in `_q_filter`)
- `merge(left, right, on="f asc")` (MergeStream)
- `unique(stream, over="f")` (UniqueStream — equality on `over`,
  first tuple in STREAM order wins, so the inner sort threads through)
- `top(n=4, stream, sort="f desc")` (RankStream.java:61-87)
- `group(stream, by="f asc")` (ReducerStream.java:67-78)
- `rollup(stream, over="a,b", count(*), sum(c), ...)`
  (RollupStream.java:66-80 + metrics/*.java — MeanMetric's name is
  "avg", CountMetric takes literal `*`)
- `parallel(workers=N, stream, sort=...)` (ParallelStream.java:51-60
  hash-partitions workers and merges by sort — that IS Spark's
  execution model, so it reduces to re-asserting the sort)

Metric output columns keep the reference's tuple keys — `count(*)`,
`sum(n_chars)`, `avg(n_chars)` (Metric.getIdentifier()).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .expressions import (
    merge_stream,
    rank_stream,
    reducer_stream,
    search_stream,
    unique_stream,
)

# ---------------------------------------------------------------- parser


@dataclass
class Expr:
    """StreamExpression: a function name + ordered parameters."""

    name: str
    params: list = field(default_factory=list)  # Expr | Named | str


@dataclass
class Named:
    """StreamExpressionNamedParameter: name=value (value: Expr | str)."""

    name: str
    value: object


def _split_top(s: str, sep: str) -> list[str]:
    """Split on `sep` at paren/quote depth zero (splitOn semantics:
    the reference scans with findNextClear skipping quoted runs and
    nested parens)."""
    parts, depth, quote, start = [], 0, False, 0
    for i, ch in enumerate(s):
        if ch == '"':
            quote = not quote
        elif not quote:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == sep and depth == 0:
                parts.append(s[start:i])
                start = i + 1
    parts.append(s[start:])
    return parts


def _find_clear(s: str, target: str) -> int:
    depth, quote = 0, False
    for i, ch in enumerate(s):
        if ch == '"':
            quote = not quote
        elif not quote:
            if ch == target and depth == 0:
                return i
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
    return -1


def _is_expr(s: str) -> bool:
    """Expression clause = `name( ... )` with the name's chars
    word-like (isExpressionClause: letters/digits/`_ . -`)."""
    i = _find_clear(s, "(")
    if i <= 0 or not s.endswith(")"):
        return False
    name = s[:i].strip()
    return bool(name) and all(c.isalnum() or c in "_.-*" for c in name)


def parse_expression(clause: str) -> Expr:
    """StreamExpressionParser.parse — raises ValueError on a clause
    that is not `name(...)` (the reference throws
    IllegalArgumentException)."""
    working = clause.strip()
    if not _is_expr(working):
        raise ValueError(f"{working!r} is not a proper expression clause")
    opn = _find_clear(working, "(")
    expr = Expr(working[:opn].strip())
    inner = working[opn + 1 : -1].strip()
    if not inner:
        return expr
    for part in _split_top(inner, ","):
        part = part.strip()
        if not part:
            continue
        if _is_expr(part):
            expr.params.append(parse_expression(part))
            continue
        eq = _find_clear(part, "=")
        if eq > 0:
            name, val = part[:eq].strip(), part[eq + 1 :].strip()
            if _is_expr(val):
                expr.params.append(Named(name, parse_expression(val)))
            else:
                expr.params.append(Named(name, _unquote(val)))
        else:
            expr.params.append(_unquote(part))
    return expr


def _unquote(v: str) -> str:
    v = v.strip()
    if len(v) >= 2 and v.startswith('"') and v.endswith('"'):
        return v[1:-1].strip()
    return v


# ---------------------------------------------------------------- factory

_METRICS = ("count", "sum", "min", "max", "avg")


class StreamFactory:
    """StreamFactory.java analog: resolves function names against the
    registered table set and constructs ONE lazy DataFrame for the
    whole expression — every decorator is planned by Catalyst, so the
    pipeline scales as ordinary exchanges instead of a single-node
    tuple pump."""

    def __init__(self, tables: dict[str, DataFrame]):
        self.tables = tables

    def construct(self, expression: str) -> DataFrame:
        df, _sort = self._build(parse_expression(expression))
        return df

    # each builder returns (df, current stream sort spec) — decorators
    # that need "stream order" (unique/group) read the inner sort the
    # same way the reference's iterator chain inherits it.
    def _build(self, e: Expr) -> tuple[DataFrame, str]:
        named = {p.name: p.value for p in e.params if isinstance(p, Named)}
        subs = [p for p in e.params if isinstance(p, Expr)]
        vals = [p for p in e.params if isinstance(p, str)]

        if e.name == "search":
            if not vals:
                raise ValueError("search() needs a table operand")
            tname = vals[0]
            if tname not in self.tables:
                raise ValueError(f"unknown table {tname!r}")
            df = self.tables[tname]
            q = named.get("q", "*:*")
            df = df.where(_q_filter(q)) if q != "*:*" else df
            if "fl" in named:
                df = df.select(
                    *[c.strip() for c in named["fl"].split(",") if c.strip()]
                )
            sort = named.get("sort")
            if not sort:
                raise ValueError("search() needs a sort parameter")
            return search_stream(df, sort), sort

        if e.name == "merge":
            if len(subs) != 2 or "on" not in named:
                raise ValueError("merge(left, right, on=...) expected")
            (left, _), (right, _) = self._build(subs[0]), self._build(subs[1])
            return merge_stream(left, right, named["on"]), named["on"]

        if e.name == "unique":
            if len(subs) != 1 or "over" not in named:
                raise ValueError("unique(stream, over=...) expected")
            inner, sort = self._build(subs[0])
            over = ",".join(_comparator_fields(named["over"]))
            return unique_stream(inner, over, sort), sort

        if e.name == "top":
            if len(subs) != 1 or "n" not in named or "sort" not in named:
                raise ValueError("top(n=.., stream, sort=..) expected")
            inner, _ = self._build(subs[0])
            return rank_stream(inner, int(named["n"]), named["sort"]), named[
                "sort"
            ]

        if e.name == "group":
            if len(subs) != 1 or "by" not in named:
                raise ValueError("group(stream, by=...) expected")
            inner, sort = self._build(subs[0])
            by = ",".join(_comparator_fields(named["by"]))
            return reducer_stream(inner, by, sort), sort

        if e.name == "rollup":
            if len(subs) < 2 or "over" not in named:
                raise ValueError("rollup(stream, over=.., metrics..) expected")
            inner, sort = self._build(subs[0])
            buckets = [
                c.strip() for c in named["over"].split(",") if c.strip()
            ]
            aggs = [_metric_agg(m) for m in subs[1:]]
            out = inner.groupBy(*buckets).agg(*aggs)
            return out.orderBy(*buckets), sort

        if e.name == "parallel":
            # ParallelStream hash-partitions workers and merges by the
            # sort comparator — Spark already executes every stage that
            # way, so the wrapper reduces to re-asserting the sort.
            if len(subs) != 1:
                raise ValueError("parallel(stream, ...) expected")
            inner, sort = self._build(subs[0])
            sort = named.get("sort", sort)
            return search_stream(inner, sort), sort

        raise ValueError(f"unknown stream function {e.name!r}")


def _comparator_fields(spec: str) -> list[str]:
    """'a asc, b desc' -> field names (equality ignores direction —
    UniqueStream/ReducerStream build an EqualTo from the comparator)."""
    out = []
    for part in spec.split(","):
        bits = part.strip().split()
        if bits:
            out.append(bits[0])
    return out


def _metric_agg(m: Expr):
    """metrics/*.java -> one aggregate Column named by the metric's
    tuple identifier (`sum(n_chars)`, `count(*)`; MeanMetric keeps the
    reference's double mean)."""
    if m.name not in _METRICS:
        raise ValueError(f"unknown metric {m.name!r}")
    if m.name == "count":
        return F.count(F.lit(1)).alias("count(*)")
    if len(m.params) != 1 or not isinstance(m.params[0], str):
        raise ValueError(f"{m.name}() expects one column operand")
    col = m.params[0]
    ident = f"{m.name}({col})"
    fn = {"sum": F.sum, "min": F.min, "max": F.max, "avg": F.avg}[m.name]
    return fn(F.col(col).cast("double")).alias(ident)


def _q_filter(q: str):
    """CloudSolrStream passes `q` straight to Solr; here a documented
    subset translates to ONE pushdown-eligible predicate: `*:*`,
    `field:value` term clauses, `field:[lo TO hi]` inclusive ranges,
    joined by AND. (The full classic-parser grammar lives in
    `search/parser.py`; stream sources are filter-shaped in the
    reference's own tests — q=*:* almost everywhere.)"""
    import re

    pred = F.lit(True)
    for clause in re.split(r"\s+AND\s+", q.strip()):
        clause = clause.strip()
        if not clause or clause == "*:*":
            continue
        mr = re.fullmatch(r"([\w.]+):\[(\S+)\s+TO\s+(\S+)\]", clause)
        if mr:
            fld, lo, hi = mr.groups()
            c = F.col(fld)
            pred = pred & (c >= _lit(lo)) & (c <= _lit(hi))
            continue
        mt = re.fullmatch(r'([\w.]+):"?([^"\s]+)"?', clause)
        if mt:
            fld, val = mt.groups()
            pred = pred & (F.col(fld) == _lit(val))
            continue
        raise ValueError(f"unsupported q clause {clause!r}")
    return pred


def _lit(v: str):
    try:
        return F.lit(int(v))
    except ValueError:
        try:
            return F.lit(float(v))
        except ValueError:
            return F.lit(v)
