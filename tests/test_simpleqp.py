"""SimpleQueryParser (search/simpleqp.py) — never-throws grammar,
buildQueryTree left-fold shapes, negation wrap via MatchAllDocsQuery,
and end-to-end search parity with hand-built queries."""

from __future__ import annotations

from lucene_solr_spark.search.query import (
    BooleanQuery,
    Clause,
    FuzzyQuery,
    MatchAllDocsQuery,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
)
from lucene_solr_spark.search.simpleqp import parse_simple_query


def occurs(q):
    assert isinstance(q, BooleanQuery)
    return [(c.occur, c.query) for c in q.clauses]


def test_single_term():
    assert parse_simple_query("Table") == TermQuery("table")


def test_default_operator_should():
    q = parse_simple_query("table scan")
    assert occurs(q) == [
        ("SHOULD", TermQuery("table")),
        ("SHOULD", TermQuery("scan")),
    ]


def test_explicit_and_or_refold():
    # buildQueryTree:458-464 — op change re-parents: a + b | c
    # becomes ((+a +b) c)
    q = parse_simple_query("table + scan | vector")
    cl = occurs(q)
    assert cl[0][0] == "SHOULD" and occurs(cl[0][1]) == [
        ("MUST", TermQuery("table")),
        ("MUST", TermQuery("scan")),
    ]
    assert cl[1] == ("SHOULD", TermQuery("vector"))


def test_negation_wraps_with_match_all():
    q = parse_simple_query("-table")
    assert occurs(q) == [
        ("MUST_NOT", TermQuery("table")),
        ("SHOULD", MatchAllDocsQuery()),
    ]
    # doubled negation cancels (:193-198)
    assert parse_simple_query("--table") == TermQuery("table")
    # whitespace between '-' and the term breaks the attachment
    assert parse_simple_query("- table") == TermQuery("table")


def test_phrase_slop_prefix_fuzzy():
    assert parse_simple_query('"table scan"') == PhraseQuery(
        ("table", "scan")
    )
    assert parse_simple_query('"table scan"~2') == PhraseQuery(
        ("table", "scan"), slop=2
    )
    assert parse_simple_query("tab*") == PrefixQuery("tab")
    assert parse_simple_query("table~1") == FuzzyQuery("table", max_edits=1)
    # fuzziness is capped at the automaton max (2) and ~0 degrades to
    # a plain term
    assert parse_simple_query("table~9") == FuzzyQuery("table", max_edits=2)
    assert parse_simple_query("table~0") == TermQuery("table")
    assert parse_simple_query("table~x") == TermQuery("table")


def test_forgiving_syntax_never_raises():
    # unmatched ')' extraneous; unclosed '(' and '"' dropped
    assert parse_simple_query(")table") == TermQuery("table")
    assert parse_simple_query("(table scan") is not None
    assert parse_simple_query('"table scan') is not None
    # dangling operators with no previous clause are ignored
    assert parse_simple_query("+table") == TermQuery("table")
    assert parse_simple_query("| table") == TermQuery("table")
    # empty group / empty phrase reset the pending op
    assert parse_simple_query("table ()") == TermQuery("table")
    assert parse_simple_query("") is None


def test_escape_and_mid_token_star():
    # a mid-token '*' is NOT a prefix operator; the token then runs
    # through the analyzer, which (like the reference's
    # StandardAnalyzer) splits on it -> default-occur disjunction
    q = parse_simple_query("tab\\*le")
    assert occurs(q) == [
        ("SHOULD", TermQuery("tab")),
        ("SHOULD", TermQuery("le")),
    ]
    assert parse_simple_query("ta*ble") == parse_simple_query("table") or (
        occurs(parse_simple_query("ta*ble"))
        == [("SHOULD", TermQuery("ta")), ("SHOULD", TermQuery("ble"))]
    )


def test_subquery_groups():
    q = parse_simple_query("vector + (table | scan)")
    cl = occurs(q)
    assert cl[0] == ("MUST", TermQuery("vector"))
    assert occurs(cl[1][1]) == [
        ("SHOULD", TermQuery("table")),
        ("SHOULD", TermQuery("scan")),
    ]
    assert cl[1][0] == "MUST"


def test_stopword_token_drops_branch():
    # 'the' analyzes to nothing under the standard chain
    assert parse_simple_query("the") is None
    assert parse_simple_query("the table") == TermQuery("table")


def test_search_parity_and_negation(spark, docs_index):
    from lucene_solr_spark.search.query import BooleanNot
    from lucene_solr_spark.search.searcher import IndexSearcher

    s = IndexSearcher(spark, docs_index[0])
    # +table +scan via SQP == hand-built BooleanAnd scores
    got = s.search(parse_simple_query("+table +scan"), k=10).collect()
    from lucene_solr_spark.search.query import BooleanAnd

    want = s.search(BooleanAnd(("table", "scan")), k=10).collect()
    assert [(r.doc_id, r.score) for r in got] == [
        (r.doc_id, r.score) for r in want
    ]

    # 'table -scan': negation wrap — hit set must equal BooleanNot
    got = s.search(parse_simple_query("+table + -scan"), k=None).collect()
    want = s.search(BooleanNot(("table",), ("scan",)), k=None).collect()
    assert {r.doc_id for r in got} == {r.doc_id for r in want}

    # pure negation: everything except docs containing 'table'
    n_all = s.search(MatchAllDocsQuery(), k=None).count()
    n_t = s.search(TermQuery("table"), k=None).count()
    got = s.search(parse_simple_query("-table"), k=None)
    assert got.count() == n_all - n_t
    assert n_all == s.max_doc


def test_match_all_standalone_scores(spark, docs_index):
    from lucene_solr_spark.search.searcher import IndexSearcher

    s = IndexSearcher(spark, docs_index[0])
    rows = s.search(MatchAllDocsQuery(), k=5).collect()
    assert [r.score for r in rows] == [1.0] * 5
    # docID-asc tie-break on the constant score
    assert [r.doc_id for r in rows] == sorted(r.doc_id for r in rows)


def test_never_raises_property():
    """The reference's core contract: SimpleQueryParser NEVER throws on
    user input (syntax errors degrade). Property-checked over random
    operator-dense strings."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    alphabet = st.sampled_from(list('ab("|+-~*\\) c"~2'))

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet=alphabet, max_size=40))
    def check(s):
        q = parse_simple_query(s)  # must not raise
        assert q is None or q.terms() is not None

    check()
