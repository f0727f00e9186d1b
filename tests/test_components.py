"""Tests for the Solr component analogs: significant terms, query
elevation, interval facets (entry-level), stats percentiles."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def searcher(spark, docs_index):
    from lucene_solr_spark.search.searcher import IndexSearcher

    return IndexSearcher(spark, docs_index[0])


@pytest.fixture(scope="module")
def docs(spark):
    # unpersist on module teardown: a leaked cache of the bare scan
    # makes Spark's CacheManager substitute an InMemoryRelation into
    # every later test that reads the same path, hiding PushedFilters
    df = spark.read.parquet(f"{SF_SMALL}/documents.parquet").cache()
    yield df
    df.unpersist()


def test_significant_terms_seed_has_max_possible_fg(searcher, docs):
    from lucene_solr_spark.search.query import TermQuery

    out = searcher.significant_terms(TermQuery("table"), docs, k=50).collect()
    assert out, "foreground set should yield terms"
    by_term = {r.term: r for r in out}
    # the seed term appears in EVERY foreground doc: fg_df == bg_df,
    # so its lift is exactly N / |F| -- the maximum possible score
    seed = by_term["table"]
    assert seed.fg_df == seed.bg_df
    assert seed.score == max(r.score for r in out)
    # scores are (fg_df/F)/(bg_df/N): every fg_df <= bg_df
    for r in out:
        assert r.fg_df <= r.bg_df
    # ordering: score desc, fg_df desc, term asc
    keys = [(-r.score, -r.fg_df, r.term) for r in out]
    assert keys == sorted(keys)


def test_search_elevated_pins_and_excludes(searcher):
    from lucene_solr_spark.search.query import TermQuery

    q = TermQuery("table")
    organic = searcher.search(q, k=5).collect()
    top1 = organic[0].doc_id
    matched_ids = {r.doc_id for r in searcher.search(q, k=None).collect()}
    non_match = next(d for d in range(200) if d not in matched_ids)
    pinned_match = organic[2].doc_id

    out = searcher.search_elevated(
        q, elevated=(non_match, pinned_match), excluded=(top1,), k=8
    ).collect()
    assert [r.doc_id for r in out[:2]] == [non_match, pinned_match]
    assert out[0].elevated and out[1].elevated
    assert out[0].score == 0.0  # non-matching elevated doc
    assert out[1].score == organic[2].score  # organic score preserved
    assert all(r.doc_id != top1 for r in out)  # exclusion applied
    assert all(not r.elevated for r in out[2:])
    assert [r.rank for r in out] == list(range(1, len(out) + 1))
    # organic tail stays score-ordered
    tail = [(-r.score, r.doc_id) for r in out[2:]]
    assert tail == sorted(tail)


def test_search_elevated_excluded_elevated_doc_dropped(searcher):
    from lucene_solr_spark.search.query import TermQuery

    q = TermQuery("table")
    organic = searcher.search(q, k=3).collect()
    d = organic[1].doc_id
    out = searcher.search_elevated(q, elevated=(d,), excluded=(d,), k=5).collect()
    assert all(r.doc_id != d for r in out)
