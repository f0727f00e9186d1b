"""Parallel SQL handler: Solr 6.0's /sql endpoint re-expressed as ONE
Catalyst plan per statement.

Reference: `solr/core/src/java/org/apache/solr/handler/SQLHandler.java`
(875 LoC) — a Presto `SqlParser` AST walked by `SQLVisitor`, compiled
to the streaming-expression operator set: `CloudSolrStream` (sorted
/export scan of the WHERE match set) -> `RollupStream` (group-by
metrics over the bucket sort) -> `HavingStream` -> `RankStream`
(bounded top-k when ORDER BY differs from the bucket sort) /
`LimitStream`. The WHERE tree is translated to a Lucene query string
by `ExpressionVisitor` (`SQLHandler.java:531-561`): comparisons become
`(field:"value")` phrase clauses, AND/OR parenthesize, NOT prefixes
`-`.

Spark-first mapping — the reference's whole stream pipeline IS a
DataFrame plan, so each handler stage collapses to the operator
Catalyst would pick anyway:

- WHERE          -> one boolean Column. Text-field equality compiles
                    to the percolator's analyzed term/phrase predicate
                    (map-only, codegen); non-text equality and
                    `'[lo TO hi]'` ranges stay native column
                    predicates, so they reach the parquet scan as
                    PushedFilters (plan-pinned in tests) — the /export
                    `fq` analog.
- GROUP BY + agg -> one hash aggregate with map-side partial
                    aggregation (RollupStream over the bucket-sorted
                    export stream needs the full sort; the hash
                    aggregate does not — same tuples, one exchange on
                    the bucket keys, no sort).
- HAVING         -> a filter on the aggregated frame
                    (HavingStream/HavingVisitor semantics: numeric
                    comparisons on metric tuple keys, AND/OR).
- ORDER BY       -> the reference's `sortsEqual` split
                    (`SQLHandler.java:218-232,321-354`): sort-equals-
                    buckets keeps the bucket order and only limits;
                    anything else is a RankStream — a bounded top-k,
                    i.e. TakeOrderedAndProject, with the reference's
                    DEFAULT LIMIT 100 when the statement has none.
- metric columns keep the reference TUPLE KEYS verbatim: `count(*)`,
  `sum(col)`, `min(col)`, `max(col)`, `avg(col)`
  (`getMetrics`, SQLHandler.java:425-453).

Faithfully reproduced quirks (each pinned in tests/test_sql.py):
- GROUP BY + LIMIT *without* ORDER BY silently drops the limit — the
  reference wraps LimitStream only inside the `sorts != null` branch
  (`SQLHandler.java:218-232`).
- GROUP BY + ORDER BY with no LIMIT ranks only the top 100
  (`int limit = sqlVisitor.limit == -1 ? 100 : sqlVisitor.limit`).
- Error surface kept verbatim: "Group by queries must include atleast
  one aggregate function.", "Aggregate functions only supported with
  group by queries.", "* is not supported for column selection.",
  "score is not a valid field for unlimited select queries",
  "order by is required for unlimited select statements.",
  "Invalid function: f".

Documented deviations:
- WHERE `<`/`>` comparisons RAISE here. The reference's
  `ExpressionVisitor.visitComparisonExpression` ignores the operator
  and emits `field:value` for every comparison type — silently turning
  `a > 5` into an equality match. Solr's own documented form is the
  range literal (`WHERE a = '[5 TO *]'`), which is supported.
- The score-sorted SELECT path (`sql_search`) delegates to the
  index-backed engine exactly like the reference delegates to the
  collection, and supports score-desc ordering (the reference's only
  score sort); field-sorted SELECTs run on `sql_stream`.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Cmp:
    field: str
    op: str  # '=', '<', '<=', '>', '>=', '<>'
    value: object  # str for quoted literals, int/float for numbers
    quoted: bool


@dataclass(frozen=True)
class And:
    left: object
    right: object


@dataclass(frozen=True)
class Or:
    left: object
    right: object


@dataclass(frozen=True)
class Not:
    value: object


@dataclass(frozen=True)
class SQLQuery:
    fields: tuple[str, ...]
    table: str
    where: object  # Cmp/And/Or/Not or None
    group_by: tuple[str, ...]
    having: object
    sorts: tuple[tuple[str, str], ...] | None  # ((key, 'asc'|'desc'), ...)
    limit: int  # -1 == unlimited


class SQLParseError(IOError):
    pass


_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<str>'(?:[^']|'')*')
      | (?P<num>-?\d+(?:\.\d+)?)
      | (?P<qid>"[^"]*")
      | (?P<id>[A-Za-z_][A-Za-z_0-9.]*)
      | (?P<op><>|!=|<=|>=|[=<>(),*])
    )""",
    re.X,
)

_KEYWORDS = frozenset(
    {"select", "from", "where", "group", "by", "having", "order",
     "limit", "and", "or", "not", "asc", "desc"}
)

_FUNCTIONS = ("min", "max", "sum", "avg", "count")


def _lex(sql: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if not m or m.end() == m.start():
            rest = sql[pos:].strip()
            if not rest:
                break
            raise SQLParseError(f"cannot lex SQL at: {rest[:40]!r}")
        pos = m.end()
        if m.group("str") is not None:
            out.append(("str", m.group("str")[1:-1].replace("''", "'")))
        elif m.group("num") is not None:
            out.append(("num", m.group("num")))
        elif m.group("qid") is not None:
            out.append(("id", m.group("qid")[1:-1]))
        elif m.group("id") is not None:
            w = m.group("id")
            if w.lower() in _KEYWORDS:
                out.append(("kw", w.lower()))
            else:
                out.append(("id", w))
        else:
            out.append(("op", m.group("op")))
    out.append(("eof", ""))
    return out


class _Parser:
    def __init__(self, sql: str):
        self.toks = _lex(sql)
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect_kw(self, kw: str):
        t = self.next()
        if t != ("kw", kw):
            raise SQLParseError(f"expected {kw.upper()}, got {t[1]!r}")

    def accept_kw(self, kw: str) -> bool:
        if self.peek() == ("kw", kw):
            self.i += 1
            return True
        return False

    def accept_op(self, op: str) -> bool:
        if self.peek() == ("op", op):
            self.i += 1
            return True
        return False

    # -- select items ------------------------------------------------
    def select_item(self) -> str:
        k, v = self.next()
        if k != "id":
            if (k, v) == ("op", "*"):
                raise SQLParseError(
                    "* is not supported for column selection."
                )
            raise SQLParseError(f"bad select item near {v!r}")
        if self.accept_op("("):
            fn = v.lower()
            ak, av = self.next()
            if (ak, av) == ("op", "*"):
                arg = "*"
            elif ak == "id":
                arg = av
            else:
                raise SQLParseError(f"bad aggregate argument near {av!r}")
            if not self.accept_op(")"):
                raise SQLParseError("expected ) in aggregate")
            return f"{fn}({arg})"
        return v

    # -- boolean expression (WHERE / HAVING share the grammar) --------
    def expr(self):
        left = self.expr_and()
        while self.accept_kw("or"):
            left = Or(left, self.expr_and())
        return left

    def expr_and(self):
        left = self.expr_unary()
        while self.accept_kw("and"):
            left = And(left, self.expr_unary())
        return left

    def expr_unary(self):
        if self.accept_kw("not"):
            return Not(self.expr_unary())
        if self.accept_op("("):
            e = self.expr()
            if not self.accept_op(")"):
                raise SQLParseError("expected ) in expression")
            return e
        return self.cmp()

    def cmp(self) -> Cmp:
        field = self.select_item()  # allows metric keys in HAVING
        k, op = self.next()
        if k != "op" or op not in ("=", "<", "<=", ">", ">=", "<>", "!="):
            raise SQLParseError(f"expected comparison operator, got {op!r}")
        if op == "!=":
            op = "<>"
        vk, vv = self.next()
        if vk == "str":
            return Cmp(field, op, vv, True)
        if vk == "num":
            return Cmp(field, op, float(vv) if "." in vv else int(vv), False)
        if vk == "id":  # unquoted literal (Presto idents pass through)
            return Cmp(field, op, vv, True)
        raise SQLParseError(f"bad comparison value near {vv!r}")

    # -- statement -----------------------------------------------------
    def statement(self) -> SQLQuery:
        self.expect_kw("select")
        fields = [self.select_item()]
        while self.accept_op(","):
            fields.append(self.select_item())
        self.expect_kw("from")
        k, table = self.next()
        if k != "id":
            raise SQLParseError(f"expected table name, got {table!r}")
        where = group_by = having = sorts = None
        limit = -1
        if self.accept_kw("where"):
            where = self.expr()
        if self.accept_kw("group"):
            self.expect_kw("by")
            group_by = [self.select_item()]
            while self.accept_op(","):
                group_by.append(self.select_item())
        if self.accept_kw("having"):
            having = self.expr()
        if self.accept_kw("order"):
            self.expect_kw("by")
            sorts = []
            while True:
                key = self.select_item()
                direction = "asc"
                if self.accept_kw("desc"):
                    direction = "desc"
                elif self.accept_kw("asc"):
                    direction = "asc"
                sorts.append((key, direction))
                if not self.accept_op(","):
                    break
        if self.accept_kw("limit"):
            k, v = self.next()
            if k != "num":
                raise SQLParseError(f"expected LIMIT count, got {v!r}")
            limit = int(v)
        if self.peek() != ("eof", ""):
            raise SQLParseError(
                f"unexpected trailing tokens near {self.peek()[1]!r}"
            )
        return SQLQuery(
            tuple(fields), table, where,
            tuple(group_by or ()), having,
            tuple(sorts) if sorts is not None else None, limit,
        )


def parse_sql(sql: str) -> SQLQuery:
    return _Parser(sql).statement()


# ---------------------------------------------------------------------------
# WHERE compilation
# ---------------------------------------------------------------------------

_RANGE_RE = re.compile(r"^([\[{])\s*(\S+)\s+TO\s+(\S+)\s*([\]}])$")


def _analyze_literal(value: str) -> list[str]:
    """Analyze a quoted literal with the standard chain, driver-side
    (the reference phrase-quotes WHERE values and lets the collection's
    query analyzer split them — ExpressionVisitor, SQLHandler.java:548-553)."""
    import pandas as pd

    from lucene_solr_spark.analysis.analyzers import tokenize_standard

    return list(tokenize_standard(pd.Series([value])).iloc[0])


def _text_predicate(terms_col: Column, tp_col: Column, value: str) -> Column:
    from lucene_solr_spark.search.percolate import _compile
    from lucene_solr_spark.search.query import PhraseQuery, TermQuery

    toks = _analyze_literal(value)
    if not toks:
        return F.lit(False)
    q = TermQuery(toks[0]) if len(toks) == 1 else PhraseQuery(tuple(toks))
    return _compile(q, tp_col, terms_col)


def _bound(col: Column, raw: str, quoted_numeric: bool):
    if raw == "*":
        return None
    if quoted_numeric:
        try:
            v: object = float(raw) if "." in raw else int(raw)
        except ValueError:
            v = raw
    else:
        v = raw
    return F.lit(v)


def _range_predicate(col: Column, m: re.Match) -> Column:
    lo_inc, lo, hi, hi_inc = m.group(1) == "[", m.group(2), m.group(3), m.group(4) == "]"
    pred = F.lit(True)
    lo_l = _bound(col, lo, True)
    hi_l = _bound(col, hi, True)
    if lo_l is not None:
        pred = pred & (col >= lo_l if lo_inc else col > lo_l)
    if hi_l is not None:
        pred = pred & (col <= hi_l if hi_inc else col < hi_l)
    return pred


def _compile_where(expr, df: DataFrame, text_field: str,
                   terms_col, tp_col) -> Column:
    if isinstance(expr, And):
        return _compile_where(expr.left, df, text_field, terms_col, tp_col) & \
            _compile_where(expr.right, df, text_field, terms_col, tp_col)
    if isinstance(expr, Or):
        return _compile_where(expr.left, df, text_field, terms_col, tp_col) | \
            _compile_where(expr.right, df, text_field, terms_col, tp_col)
    if isinstance(expr, Not):
        return ~_compile_where(expr.value, df, text_field, terms_col, tp_col)
    assert isinstance(expr, Cmp)
    if expr.op != "=":
        raise SQLParseError(
            f"unsupported WHERE comparison {expr.op!r} on {expr.field} — "
            "use = or a '[lo TO hi]' range literal (the reference "
            "silently degrades <,> to equality; this engine raises)"
        )
    if expr.field == text_field:
        if not expr.quoted:
            raise SQLParseError(f"{text_field} comparisons take a string")
        return _text_predicate(terms_col, tp_col, str(expr.value))
    col = F.col(expr.field)
    if expr.quoted:
        m = _RANGE_RE.match(str(expr.value))
        if m:
            return _range_predicate(col, m)
    return col == F.lit(expr.value)


# ---------------------------------------------------------------------------
# Metrics (tuple keys preserved — SQLHandler.getMetrics)
# ---------------------------------------------------------------------------


def _split_metric(item: str) -> tuple[str, str] | None:
    if "(" not in item:
        return None
    fn, arg = item[:-1].split("(", 1)
    return fn, arg


def _metric_col(fn: str, arg: str) -> Column:
    if fn not in _FUNCTIONS:
        raise SQLParseError(f"Invalid function: {fn}")
    key = f"{fn}({arg})"
    if fn == "count":
        return F.count(F.lit(1)).alias(key)
    col = F.col(arg)
    agg = {"min": F.min, "max": F.max, "sum": F.sum, "avg": F.avg}[fn]
    return agg(col).alias(key)


def _bt(name: str) -> Column:
    return F.col(f"`{name}`")


def _compile_having(expr) -> Column:
    """HavingVisitor (SQLHandler.java:823-873): numeric comparisons on
    metric tuple keys composed with AND/OR. NOT has no visitor in the
    reference (it would NPE); raise instead."""
    if isinstance(expr, And):
        return _compile_having(expr.left) & _compile_having(expr.right)
    if isinstance(expr, Or):
        return _compile_having(expr.left) | _compile_having(expr.right)
    if isinstance(expr, Not):
        raise SQLParseError("HAVING NOT is unsupported (as in the reference)")
    assert isinstance(expr, Cmp)
    if expr.quoted:
        raise SQLParseError("HAVING comparisons are numeric")
    col = _bt(expr.field).cast("double")
    v = F.lit(float(expr.value))
    return {
        "=": col == v, "<>": col != v,
        "<": col < v, "<=": col <= v,
        ">": col > v, ">=": col >= v,
    }[expr.op]


# ---------------------------------------------------------------------------
# Execution
# ---------------------------------------------------------------------------


def _sort_cols(sorts) -> list[Column]:
    return [
        _bt(k).desc() if d == "desc" else _bt(k).asc() for k, d in sorts
    ]


def _sorts_equal(buckets: tuple[str, ...], sorts) -> bool:
    """sortsEqual (SQLHandler.java:321-354): same length, bucket[i]
    matches sort key i, and one shared direction (getSortDirection
    takes the FIRST sort item's direction for the whole export sort)."""
    if sorts is None or len(sorts) != len(buckets):
        return False
    if len({d for _, d in sorts}) > 1:
        return False
    return all(b == k for b, (k, _) in zip(buckets, sorts))


def sql_stream(
    sql: str,
    tables: dict[str, DataFrame],
    text_field: str = "text",
) -> DataFrame:
    """Compile one SQL statement to a DataFrame (the /sql handler's
    TupleStream). `tables` maps FROM names to DataFrames, like the
    streaming StreamFactory registry."""
    q = parse_sql(sql)
    if q.table not in tables:
        raise SQLParseError(f"Table {q.table} not found")
    df = tables[q.table]

    terms_col = tp_col = None
    if q.where is not None and _where_touches(q.where, text_field):
        from lucene_solr_spark.analysis.jvm import standard_tokens_pos_col

        tp_col = standard_tokens_pos_col(F.col(text_field))
        df = df.withColumn("_tp", tp_col).withColumn(
            "_terms", F.transform(F.col("_tp"), lambda s: s["term"])
        )
        terms_col, tp_col = F.col("_terms"), F.col("_tp")
    if q.where is not None:
        df = df.filter(
            _compile_where(q.where, df, text_field, terms_col, tp_col)
        )

    if q.group_by:
        return _group_by_stream(q, df)
    return _select_stream(q, df)


def _where_touches(expr, text_field: str) -> bool:
    if isinstance(expr, (And, Or)):
        return _where_touches(expr.left, text_field) or _where_touches(
            expr.right, text_field
        )
    if isinstance(expr, Not):
        return _where_touches(expr.value, text_field)
    return isinstance(expr, Cmp) and expr.field == text_field


def _group_by_stream(q: SQLQuery, df: DataFrame) -> DataFrame:
    buckets = q.group_by
    metrics = []
    for item in q.fields:
        sp = _split_metric(item)
        if sp is not None:
            metrics.append(_metric_col(*sp))
        elif item not in buckets:
            raise SQLParseError(
                f"select field {item} is not in the GROUP BY list"
            )
    if not metrics:
        raise SQLParseError(
            "Group by queries must include atleast one aggregate function."
        )
    out = df.groupBy(*[F.col(b) for b in buckets]).agg(*metrics)
    if q.having is not None:
        out = out.filter(_compile_having(q.having))
    out = out.select(*[_bt(f) for f in q.fields])

    # SQLHandler.java:218-232 — ORDER BY handling (incl. the two quirks)
    if q.sorts is not None:
        if _sorts_equal(buckets, q.sorts):
            out = out.orderBy(*_sort_cols(q.sorts))
            if q.limit > -1:
                out = out.limit(q.limit)
        else:
            limit = 100 if q.limit == -1 else q.limit  # RankStream default
            out = out.orderBy(*_sort_cols(q.sorts)).limit(limit)
    else:
        # bucket-sorted rollup output; LimitStream is never applied
        out = out.orderBy(*[_bt(b) for b in buckets])
    return out


def _select_stream(q: SQLQuery, df: DataFrame) -> DataFrame:
    for field in q.fields:
        if "(" in field:
            raise SQLParseError(
                "Aggregate functions only supported with group by queries."
            )
        if "*" in field:
            raise SQLParseError("* is not supported for column selection.")
    if "score" in q.fields:
        if q.limit < 0:
            raise SQLParseError(
                "score is not a valid field for unlimited select queries"
            )
        raise SQLParseError(
            "score-sorted SELECT runs on the index-backed engine — "
            "use sql_search(searcher, sql)"
        )
    if q.sorts is None and q.limit < 0:
        raise SQLParseError(
            "order by is required for unlimited select statements."
        )
    out = df.select(*[F.col(f) for f in q.fields])
    if q.sorts is not None:
        out = out.orderBy(*_sort_cols(q.sorts))
    if q.limit > -1:
        out = out.limit(q.limit)
    return out


# ---------------------------------------------------------------------------
# Score-sorted SELECT: delegate to the engine like the reference
# delegates to the collection (CloudSolrStream with rows=limit,
# default sort "score desc" — SQLHandler.java:287-296)
# ---------------------------------------------------------------------------


def _to_query_string(expr, text_field: str) -> str:
    """ExpressionVisitor (SQLHandler.java:531-561): comparisons become
    phrase clauses, AND/OR parenthesize, NOT prefixes '-'. The default
    text field drops its prefix (the engine's default field)."""
    if isinstance(expr, And):
        return (f"({_to_query_string(expr.left, text_field)} AND "
                f"{_to_query_string(expr.right, text_field)})")
    if isinstance(expr, Or):
        return (f"({_to_query_string(expr.left, text_field)} OR "
                f"{_to_query_string(expr.right, text_field)})")
    if isinstance(expr, Not):
        return "-" + _to_query_string(expr.value, text_field)
    assert isinstance(expr, Cmp)
    if expr.op != "=":
        raise SQLParseError(
            f"unsupported WHERE comparison {expr.op!r} in engine query"
        )
    val = str(expr.value)
    prefix = "" if expr.field == text_field else f"{expr.field}:"
    if val.startswith("(") or val.startswith("["):
        return f"({prefix}{val})"
    if len(val.split()) > 1:
        return f'({prefix}"{val}")'
    return f"({prefix}{val})"


def sql_search(searcher, sql: str, text_field: str = "text") -> DataFrame:
    """SELECT ... score ... FROM <index> WHERE ... LIMIT n — the
    reference's score-sorted select (rows=limit, sort score desc)."""
    q = parse_sql(sql)
    if q.group_by:
        raise SQLParseError("sql_search takes plain SELECT statements")
    if q.limit < 0:
        raise SQLParseError(
            "score is not a valid field for unlimited select queries"
        )
    if q.sorts is not None:
        raise SQLParseError(
            "sql_search sorts by score desc (the reference's only "
            "engine-side sort); field sorts run on sql_stream"
        )
    from lucene_solr_spark.search.parser import parse_query

    qs = _to_query_string(q.where, text_field) if q.where is not None else None
    if qs is None:
        raise SQLParseError("sql_search requires a WHERE clause")
    hits = searcher.search(parse_query(qs), k=q.limit)
    cols = [F.col(f) for f in q.fields]
    return hits.select(*cols)
