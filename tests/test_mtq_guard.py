"""maxClauseCount guard + df-bounded top-terms rewrite
(BooleanQuery.java:39-48, TopTermsRewrite.java, MultiTermQuery.java:
68-115) and the FieldValueQuery analog (search/FieldValueQuery.java)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.search.query import (
    BooleanQuery,
    Clause,
    ConstantScoreQuery,
    FieldValueQuery,
    FuzzyQuery,
    PrefixQuery,
    TermQuery,
    TooManyClauses,
    WildcardQuery,
)
from lucene_solr_spark.search.searcher import IndexSearcher
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def searcher(spark, docs_index):
    out, _ = docs_index
    return IndexSearcher(spark, out)


def test_too_many_clauses_fires(searcher):
    """A scoring/tree rewrite past max_clause_count raises instead of
    materializing an unbounded driver list."""
    old = searcher.max_clause_count
    searcher.max_clause_count = 2
    try:
        with pytest.raises(TooManyClauses):
            searcher._expand_mtq(PrefixQuery("s"))
        # end-to-end: a prefix clause inside a BooleanQuery takes the
        # tree path, which expands on the driver -> guarded
        q = BooleanQuery(
            (
                Clause("MUST", TermQuery("table")),
                Clause("MUST", ConstantScoreQuery(PrefixQuery("s"))),
            )
        )
        with pytest.raises(TooManyClauses):
            searcher.search(q, k=5).collect()
    finally:
        searcher.max_clause_count = old


def test_constant_score_path_is_exempt(searcher):
    """The pure constant-score path never builds a driver term list
    (CONSTANT_SCORE_FILTER bitset analog) — no guard, still correct."""
    old = searcher.max_clause_count
    searcher.max_clause_count = 2
    try:
        hits = searcher.search(PrefixQuery("s"), k=5).collect()
        assert len(hits) == 5
    finally:
        searcher.max_clause_count = old


def test_top_terms_rewrite_keeps_highest_df(searcher):
    """max_expansions keeps the N highest-df matching terms (df desc,
    term asc) and the capped search equals the manual expansion."""
    stats = (
        searcher._term_stats.where(F.col("term").startswith("s"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(3)
        .collect()
    )
    want_terms = sorted(r.term for r in stats)
    got_terms = searcher._expand_top_terms(
        F.col("term").startswith("s"), 3
    )
    assert got_terms == want_terms

    capped = searcher.search(PrefixQuery("s", max_expansions=3), k=None)
    # manual union of the 3 terms' postings, constant score
    manual = set()
    for t in want_terms:
        for r in searcher.search(TermQuery(t), k=None).collect():
            manual.add(r.doc_id)
    got = {r.doc_id for r in capped.collect()}
    assert got == manual and len(got) > 0


def test_capped_equals_uncapped_for_narrow_pattern(searcher):
    """A pattern expanding to fewer terms than the cap is unchanged by
    the top-terms rewrite."""
    full = [
        (r.doc_id, r.score)
        for r in searcher.search(WildcardQuery("v?lue"), k=None).collect()
    ]
    capped = [
        (r.doc_id, r.score)
        for r in searcher.search(
            WildcardQuery("v?lue", max_expansions=1000), k=None
        ).collect()
    ]
    assert full == capped and len(full) > 0


def test_fuzzy_expansion_capped_and_ranked(searcher):
    """Fuzzy expansion ranks (dist asc, df desc, term asc) and caps at
    max_expansions (TopTermsBlendedFreqScoringRewrite semantics)."""
    full = searcher._expand_fuzzy(FuzzyQuery("tabl", max_edits=1))
    assert "table" in full
    one = searcher._expand_fuzzy(
        FuzzyQuery("tabl", max_edits=1, max_expansions=1)
    )
    assert len(one) == 1


def test_fuzzy_cap_is_prefix_of_ranking(searcher):
    full2 = searcher._expand_fuzzy(
        FuzzyQuery("tabl", max_edits=1, max_expansions=50)
    )
    head = searcher._expand_fuzzy(
        FuzzyQuery("tabl", max_edits=1, max_expansions=2)
    )
    assert head == full2[:2]


@pytest.fixture(scope="module")
def gap_index(spark, tmp_path_factory):
    """Index with docs that have NO indexed tokens in the default
    field (all stopwords) -> norm byte 0 -> FieldValueQuery excludes
    them."""
    from lucene_solr_spark.index.builder import IndexConfig, build_index

    rows = [
        (0, "alpha beta", "en", "s1", 10),
        (1, "the a", "en", "s1", 5),          # all stopwords -> len 0
        (2, "gamma", "en", "s2", 5),
        (3, "a the the a", "en", "s2", 11),   # all stopwords -> len 0
        (4, "alpha gamma beta", "en", "s1", 16),
    ]
    src = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path_factory.mktemp("fvq") / "ix")
    build_index(
        spark, src, out,
        IndexConfig(n_shards=2, segs_per_shard=1, id_col="doc_id",
                    text_col="text", sharding="range_int"),
    )
    return IndexSearcher(spark, out)


def test_field_value_query_excludes_empty_fields(gap_index):
    hits = gap_index.search(FieldValueQuery(), k=None).collect()
    assert sorted(r.doc_id for r in hits) == [0, 2, 4]
    assert all(r.score == 1.0 for r in hits)


def test_field_value_query_as_filter_clause(gap_index):
    """FieldValueQuery composes as a FILTER clause (scoreless gate).

    Lucene semantics: with a required (FILTER) clause present, SHOULD
    is purely optional — filter-only matches survive at score 0
    (BooleanWeight.java); min_should_match=1 gates on the SHOULD."""
    clauses = (
        Clause("SHOULD", TermQuery("alpha")),
        Clause("FILTER", FieldValueQuery()),
    )
    loose = gap_index.search(BooleanQuery(clauses), k=None).collect()
    assert sorted(r.doc_id for r in loose) == [0, 2, 4]
    assert {r.doc_id: r.score for r in loose}[2] == 0.0

    hits = gap_index.search(
        BooleanQuery(clauses, min_should_match=1), k=None
    ).collect()
    assert sorted(r.doc_id for r in hits) == [0, 4]
    # score equals the plain TermQuery score (FILTER never scores)
    plain = {r.doc_id: r.score for r in gap_index.search(TermQuery("alpha"), k=None).collect()}
    for r in hits:
        assert np.float32(r.score) == np.float32(plain[r.doc_id])


def test_field_value_query_unknown_field_raises(gap_index):
    with pytest.raises(KeyError):
        gap_index.search(FieldValueQuery("nope"), k=5).collect()
