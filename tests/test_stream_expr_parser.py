"""Streaming-expression STRING grammar (streaming/expr.py) —
StreamExpressionParser.java parse shapes + StreamFactory construction
over the DataFrame decorators, pinned against hand-built pipelines."""

from __future__ import annotations

import pytest

from lucene_solr_spark.streaming.expr import (
    Expr,
    Named,
    StreamFactory,
    parse_expression,
)


def test_parse_nested_named_and_positional():
    e = parse_expression(
        'top(n=2, unique(search(documents, q="lang:en", '
        'fl="doc_id,lang", sort="doc_id asc"), over="lang"), '
        'sort="doc_id desc")'
    )
    assert e.name == "top"
    named = {p.name: p.value for p in e.params if isinstance(p, Named)}
    assert named["n"] == "2" and named["sort"] == "doc_id desc"
    inner = [p for p in e.params if isinstance(p, Expr)][0]
    assert inner.name == "unique"
    search = [p for p in inner.params if isinstance(p, Expr)][0]
    assert search.name == "search"
    snamed = {p.name: p.value for p in search.params if isinstance(p, Named)}
    # quotes stripped like generateNamedParameterExpression
    assert snamed["q"] == "lang:en"
    assert snamed["fl"] == "doc_id,lang"
    assert [p for p in search.params if isinstance(p, str)] == ["documents"]


def test_parse_quoted_commas_do_not_split():
    e = parse_expression('merge(a(sort="x asc"), b(sort="x asc"), on="x asc, y desc")')
    named = {p.name: p.value for p in e.params if isinstance(p, Named)}
    assert named["on"] == "x asc, y desc"
    assert len([p for p in e.params if isinstance(p, Expr)]) == 2


def test_parse_rejects_non_expression():
    with pytest.raises(ValueError):
        parse_expression("not an expression")
    with pytest.raises(ValueError):
        parse_expression("fn(unclosed")


def test_metric_star_operand():
    e = parse_expression("rollup(s(sort=\"a asc\"), over=\"a\", count(*), sum(v))")
    metrics = [p for p in e.params if isinstance(p, Expr) and p.name != "s"]
    assert [m.name for m in metrics] == ["count", "sum"]
    assert metrics[0].params == ["*"]


@pytest.fixture(scope="module")
def factory(spark):
    df = spark.createDataFrame(
        [
            ("en", 1, 30),
            ("en", 2, 30),
            ("de", 3, 10),
            ("de", 4, 50),
            ("fr", 5, 40),
            ("en", 6, 20),
        ],
        "lang string, id long, v long",
    )
    return StreamFactory({"docs": df})


def test_factory_search_q_and_fl(factory):
    rows = factory.construct(
        'search(docs, q="lang:en", fl="id,v", sort="v desc, id asc")'
    ).collect()
    assert [tuple(r) for r in rows] == [(1, 30), (2, 30), (6, 20)]


def test_factory_q_range_clause(factory):
    rows = factory.construct(
        'search(docs, q="v:[20 TO 40] AND lang:en", fl="id", sort="id asc")'
    ).collect()
    assert [r.id for r in rows] == [1, 2, 6]


def test_factory_top_over_unique(factory):
    # unique keeps stream-order-first per lang; top re-ranks by v desc
    rows = factory.construct(
        'top(n=2, unique(search(docs, q="*:*", fl="lang,id,v", '
        'sort="lang asc, v desc, id asc"), over="lang"), sort="v desc")'
    ).collect()
    assert [(r.lang, r.id) for r in rows] == [("de", 4), ("fr", 5)]


def test_factory_rollup_metric_identifiers(factory):
    out = factory.construct(
        'rollup(search(docs, q="*:*", sort="lang asc"), over="lang", '
        "count(*), sum(v), avg(v), min(v), max(v))"
    )
    # tuple keys match Metric.getIdentifier()
    assert out.columns == [
        "lang", "count(*)", "sum(v)", "avg(v)", "min(v)", "max(v)",
    ]
    r = {row.lang: row for row in out.collect()}
    assert r["en"]["count(*)"] == 3 and r["en"]["sum(v)"] == 80.0
    assert r["de"]["avg(v)"] == 30.0


def test_factory_parallel_is_passthrough_with_sort(factory):
    rows = factory.construct(
        'parallel(search(docs, q="*:*", fl="id,v", sort="id asc"), '
        'workers=4, sort="v desc, id asc")'
    ).collect()
    assert [r.id for r in rows] == [4, 5, 1, 2, 6, 3]


def test_factory_group_matches_reducer(factory, spark):
    out = factory.construct(
        'group(search(docs, q="*:*", fl="lang,id,v", '
        'sort="lang asc, id asc"), by="lang asc")'
    )
    r = {row.lang: row for row in out.collect()}
    assert r["en"].id == 1 and len(r["en"].tuples) == 3
    assert r["fr"].id == 5 and len(r["fr"].tuples) == 1


def test_factory_errors(factory):
    with pytest.raises(ValueError):
        factory.construct('search(nope, q="*:*", sort="id asc")')
    with pytest.raises(ValueError):
        factory.construct('frobnicate(search(docs, sort="id asc"))')
    with pytest.raises(ValueError):
        factory.construct('search(docs, q="v:{1 TO 2}", sort="id asc")')
