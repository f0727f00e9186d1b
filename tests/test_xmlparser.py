"""XML query parser (search/xmlparser.py) — CoreParser builder
registry: element shapes -> Query dataclasses, search parity with
hand-built queries, and the reference's error behavior."""

from __future__ import annotations

import pytest

from lucene_solr_spark.search.query import (
    BooleanQuery,
    BoostQuery,
    Clause,
    ConstantScoreQuery,
    DisMaxQuery,
    MatchAllDocsQuery,
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanTermQuery,
    TermQuery,
    TermRangeQuery,
)
from lucene_solr_spark.search.xmlparser import parse_xml_query


def test_term_and_boost():
    assert parse_xml_query("<TermQuery>Table</TermQuery>") == TermQuery(
        "table"
    )
    assert parse_xml_query(
        '<TermQuery boost="2.5" fieldName="source">src1</TermQuery>'
    ) == BoostQuery(TermQuery("src1", field="source"), 2.5)


def test_boolean_clauses_and_msm():
    q = parse_xml_query(
        """
        <BooleanQuery minimumNumberShouldMatch="1">
          <Clause occurs="must"><TermQuery>table</TermQuery></Clause>
          <Clause occurs="should"><TermQuery>scan</TermQuery></Clause>
          <Clause occurs="mustNot"><TermQuery>dup</TermQuery></Clause>
          <Clause occurs="filter"><MatchAllDocsQuery/></Clause>
        </BooleanQuery>"""
    )
    assert isinstance(q, BooleanQuery) and q.min_should_match == 1
    assert [c.occur for c in q.clauses] == [
        "MUST", "SHOULD", "MUST_NOT", "FILTER",
    ]
    assert q.clauses[3].query == MatchAllDocsQuery()


def test_range_dismax_constant_terms():
    q = parse_xml_query(
        '<RangeQuery lowerTerm="sa" upperTerm="sd" includeUpper="false"/>'
    )
    assert q == TermRangeQuery("sa", "sd", include_upper=False)

    q = parse_xml_query(
        """<DisjunctionMaxQuery tieBreaker="0.1">
             <TermQuery>table</TermQuery><TermQuery>scan</TermQuery>
           </DisjunctionMaxQuery>"""
    )
    assert isinstance(q, DisMaxQuery) and q.tie == 0.1

    q = parse_xml_query(
        '<ConstantScoreQuery boost="3.0"><TermQuery>table</TermQuery>'
        "</ConstantScoreQuery>"
    )
    assert q == ConstantScoreQuery(TermQuery("table"), boost=3.0)

    q = parse_xml_query("<TermsQuery>Table scan the</TermsQuery>")
    assert isinstance(q, ConstantScoreQuery)
    inner = q.query
    assert isinstance(inner, BooleanQuery)
    assert {c.query.term for c in inner.clauses} == {"table", "scan"}


def test_user_query_delegates_to_classic_parser():
    q = parse_xml_query("<UserQuery>+table +scan</UserQuery>")
    assert isinstance(q, BooleanQuery)
    assert {c.occur for c in q.clauses} == {"MUST"}


def test_span_builders():
    q = parse_xml_query(
        """<SpanNear slopFactor="3" inOrder="false">
             <SpanTerm>table</SpanTerm>
             <SpanOrTerms>scan vector</SpanOrTerms>
           </SpanNear>"""
    )
    assert q == SpanNearQuery(
        (
            SpanTermQuery("table"),
            SpanOrQuery((SpanTermQuery("scan"), SpanTermQuery("vector"))),
        ),
        slop=3,
        in_order=False,
    )
    q = parse_xml_query(
        '<SpanFirst end="10"><SpanTerm>table</SpanTerm></SpanFirst>'
    )
    assert q == SpanFirstQuery(SpanTermQuery("table"), 10)
    q = parse_xml_query(
        """<SpanNot>
             <Include><SpanTerm>scan</SpanTerm></Include>
             <Exclude><SpanTerm>table</SpanTerm></Exclude>
           </SpanNot>"""
    )
    assert q == SpanNotQuery(SpanTermQuery("scan"), SpanTermQuery("table"))
    q = parse_xml_query(
        """<SpanOr><SpanTerm>a</SpanTerm><SpanTerm>b</SpanTerm></SpanOr>"""
    )
    assert q == SpanOrQuery((SpanTermQuery("a"), SpanTermQuery("b")))


def test_errors_match_reference_behavior():
    with pytest.raises(ValueError, match="no query builder"):
        parse_xml_query("<FrobQuery>x</FrobQuery>")
    with pytest.raises(ValueError, match="Error parsing XML"):
        parse_xml_query("<TermQuery>unclosed")
    with pytest.raises(ValueError, match="requires text"):
        parse_xml_query("<TermQuery></TermQuery>")
    with pytest.raises(ValueError):
        parse_xml_query(
            "<BooleanQuery><TermQuery>x</TermQuery></BooleanQuery>"
        )


def test_search_parity_with_hand_built(spark, docs_index):
    from lucene_solr_spark.search.searcher import IndexSearcher

    s = IndexSearcher(spark, docs_index[0])
    xml = """
      <BooleanQuery>
        <Clause occurs="must"><TermQuery>table</TermQuery></Clause>
        <Clause occurs="should">
          <TermQuery boost="2.0">vector</TermQuery>
        </Clause>
        <Clause occurs="mustNot"><TermQuery>dup</TermQuery></Clause>
      </BooleanQuery>"""
    want_q = BooleanQuery(
        (
            Clause("MUST", TermQuery("table")),
            Clause("SHOULD", BoostQuery(TermQuery("vector"), 2.0)),
            Clause("MUST_NOT", TermQuery("dup")),
        )
    )
    got = s.search(parse_xml_query(xml), k=10).collect()
    want = s.search(want_q, k=10).collect()
    assert [(r.doc_id, r.score) for r in got] == [
        (r.doc_id, r.score) for r in want
    ]
