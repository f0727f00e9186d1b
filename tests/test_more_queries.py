"""Tests for BooleanMustShould (req+opt), CommonTermsQuery,
searchAfter paging, and MoreLikeThis."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def searcher(spark, docs_index):
    from lucene_solr_spark.search.searcher import IndexSearcher

    out, _ = docs_index
    return IndexSearcher(spark, out)


def test_reqopt_scores(searcher):
    """score = f32(f32(sum must) + f32(sum matching should)); matching
    set = docs containing every MUST term."""
    from lucene_solr_spark.search.query import (
        BooleanMustShould,
        TermQuery,
    )

    must_hits = {
        r.doc_id: r.score
        for r in searcher.search(TermQuery("vector"), k=None, prune=False).collect()
    }
    opt_t = {
        r.doc_id: r.score
        for r in searcher.search(TermQuery("table"), k=None, prune=False).collect()
    }
    opt_s = {
        r.doc_id: r.score
        for r in searcher.search(TermQuery("scan"), k=None, prune=False).collect()
    }
    got = searcher.search(
        BooleanMustShould(("vector",), ("table", "scan")), k=None
    ).collect()
    assert {r.doc_id for r in got} == set(must_hits)
    for r in got:
        opt64 = 0.0
        if r.doc_id in opt_t:
            opt64 += float(np.float32(opt_t[r.doc_id]))
        if r.doc_id in opt_s:
            opt64 += float(np.float32(opt_s[r.doc_id]))
        want = np.float32(
            np.float32(must_hits[r.doc_id]) + np.float32(opt64)
        )
        assert np.float32(r.score) == want, r.doc_id


def test_common_terms_split(searcher):
    """With a cutoff above every df the query degrades to pure AND; with
    a tiny cutoff all terms go optional -> BooleanAnd(should)."""
    from lucene_solr_spark.search.query import (
        BooleanAnd,
        BooleanMustShould,
        CommonTermsQuery,
    )

    q = CommonTermsQuery(("vector", "table"), max_term_frequency=1.0)
    all_must = searcher.search(q, k=20).collect()
    plain_and = searcher.search(BooleanAnd(("vector", "table")), k=20).collect()
    # cutoff=1.0 -> no term is "common" -> same as AND... but AND sums
    # both clauses as required; reqopt with empty should == AND
    assert [(r.doc_id, r.score) for r in all_must] == [
        (r.doc_id, r.score) for r in plain_and
    ]

    # table is high-df: with a mid cutoff it becomes optional
    dfs = searcher.term_dfs(["vector", "table"])
    frac = (dfs["table"] - 1) / searcher.max_doc
    q2 = CommonTermsQuery(("vector", "table"), max_term_frequency=frac)
    manual = searcher.search(
        BooleanMustShould(("vector",), ("table",)), k=20
    ).collect()
    got2 = searcher.search(q2, k=20).collect()
    assert [(r.doc_id, r.score) for r in got2] == [
        (r.doc_id, r.score) for r in manual
    ]


def test_search_after_pages_partition_results(searcher):
    from lucene_solr_spark.search.query import TermQuery

    q = TermQuery("table")
    full = [(r.doc_id, r.score) for r in searcher.search(q, k=30, prune=False).collect()]
    page1 = [(r.doc_id, r.score) for r in searcher.search(q, k=10).collect()]
    cur = page1[-1]
    page2 = [
        (r.doc_id, r.score)
        for r in searcher.search_after(
            q, k=10, after_score=cur[1], after_doc=cur[0]
        ).collect()
    ]
    cur2 = page2[-1]
    page3 = [
        (r.doc_id, r.score)
        for r in searcher.search_after(
            q, k=10, after_score=cur2[1], after_doc=cur2[0]
        ).collect()
    ]
    assert page1 + page2 + page3 == full


def test_more_like_this(spark, searcher):
    from tests.conftest import SF_SMALL

    text = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .where(F.col("doc_id") == 7)
        .select("text")
        .first()[0]
    )
    terms = searcher.mlt_terms(text, max_query_terms=5)
    assert 1 <= len(terms) <= 5
    # extracted terms must occur in the source doc
    toks = set(text.lower().split())
    for t in terms:
        assert t in toks
    hits = searcher.more_like_this(text, k=10).collect()
    assert len(hits) == 10
    # the source doc itself should rank well (it contains all its terms)
    assert 7 in {r.doc_id for r in hits}


def test_explain_recomposes_search_scores(spark, docs_index):
    """IndexSearcher.explain analog: for hits of every flat query kind,
    explain(q, doc).score must equal the search score bitwise, leaf
    details must recompose, and a non-matching doc must explain as
    match=False score=0."""
    from lucene_solr_spark.search.query import (
        BooleanAnd,
        BooleanMustShould,
        BooleanNot,
        BooleanOr,
        DisjunctionMax,
        TermQuery,
    )
    from lucene_solr_spark.search.searcher import IndexSearcher

    s = IndexSearcher(spark, docs_index[0])
    queries = [
        TermQuery("table"),
        BooleanAnd(("scan", "table")),
        BooleanOr(("customer", "spark", "vector")),
        BooleanNot(("table",), ("scan",)),
        BooleanMustShould(("vector",), ("table", "scan")),
        DisjunctionMax(("table", "scan"), tie=0.3),
    ]
    for q in queries:
        hits = s.search(q, k=3).collect()
        assert hits, q
        for r in hits:
            ex = s.explain(q, r.doc_id)
            assert ex["match"] is True, (q, r.doc_id)
            assert np.float32(ex["score"]) == np.float32(r.score), (q, r.doc_id)
            assert any(d["match"] for d in ex["details"])
            # every matching leaf's pieces recompose: wv*tf/(tf+cache)
            for d in ex["details"]:
                if d["match"]:
                    wv = np.float32(d["weight_value"])
                    tf = np.float32(d["tf"])
                    c = np.float32(d["norm_cache"])
                    assert np.float32(d["score"]) == np.float32(
                        (wv * tf) / (tf + c)
                    ), d
    # non-matching doc: excluded by MUST_NOT
    nq = BooleanNot(("table",), ("scan",))
    both = s.search(BooleanAnd(("table", "scan")), k=1).collect()
    ex = s.explain(nq, both[0].doc_id)
    assert ex["match"] is False and ex["score"] == 0.0


def test_highlight_snippets(spark, docs_index):
    """Highlighter subset: the snippet is the ±window display-token
    passage around the FIRST match; every matching token inside is
    wrapped; passage clamps at doc start; hit set == search top-k."""
    from lucene_solr_spark.search.query import BooleanOr, TermQuery
    from lucene_solr_spark.search.searcher import IndexSearcher

    s = IndexSearcher(spark, docs_index[0])
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    out = s.highlight(TermQuery("table"), docs, k=10, window=2).collect()
    top = s.search_with_keys(TermQuery("table"), k=10).collect()
    assert [r.doc_id for r in out] == [r.key for r in top]
    text_by_id = {r.doc_id: r.text for r in docs.collect()}
    for r in out:
        assert "<em>table</em>" in r.snippet
        plain = r.snippet.replace("<em>", "").replace("</em>", "")
        toks = plain.split()
        assert len(toks) <= 5  # 2*window + 1
        src = text_by_id[r.doc_id].split()
        first = next(
            i for i, t in enumerate(src) if t.lower() == "table"
        )
        lo = max(0, first - 2)
        assert toks == src[lo : first + 3]
    # multi-term: every query-term occurrence inside the window wraps
    out2 = s.highlight(BooleanOr(("table", "scan")), docs, k=5).collect()
    for r in out2:
        assert "<em>" in r.snippet
