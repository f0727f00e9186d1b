"""SpanPositionRangeQuery + BoostingQuery."""
from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def pos_index(spark, tmp_path_factory):
    from lucene_solr_spark.index.builder import IndexConfig, build_index
    from lucene_solr_spark.search.searcher import IndexSearcher
    from tests.conftest import SF_SMALL

    out = str(tmp_path_factory.mktemp("posix") / "ix")
    src = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    build_index(spark, src, out,
                IndexConfig(n_shards=2, segs_per_shard=2,
                            index_positions=True))
    return IndexSearcher(spark, out)


def test_posrange_vs_first(pos_index):
    """S=0 posrange must equal SpanFirst exactly; a nonzero S
    restricts to later positions."""
    from lucene_solr_spark.search.query import (
        SpanFirstQuery, SpanPositionRangeQuery, SpanTermQuery,
    )

    s = pos_index
    t = SpanTermQuery("table")
    first = [(r.doc_id, r.score)
             for r in s.search(SpanFirstQuery(t, 8), k=None).collect()]
    pr0 = [(r.doc_id, r.score)
           for r in s.search(SpanPositionRangeQuery(t, 0, 8), k=None).collect()]
    assert first == pr0 and len(first) > 0
    late = {r.doc_id for r in
            s.search(SpanPositionRangeQuery(t, 3, 8), k=None).collect()}
    assert late <= {d for d, _ in first}


def test_boosting_demotes_not_excludes(spark, docs_index):
    from lucene_solr_spark.search.query import BoostingQuery, TermQuery
    from lucene_solr_spark.search.searcher import IndexSearcher

    s = IndexSearcher(spark, docs_index[0])
    base = {r.doc_id: r.score
            for r in s.search(TermQuery("table"), k=None).collect()}
    ctx = {r.doc_id for r in s.search(TermQuery("dup"), k=None).collect()}
    got = {r.doc_id: r.score
           for r in s.search_boosting(
               TermQuery("table"), TermQuery("dup"), 0.5, k=None
           ).collect()}
    assert set(got) == set(base)  # demoted, never excluded
    assert ctx & set(base)        # overlap exists in the corpus
    for d, sc in got.items():
        want = (np.float32(np.float32(base[d]) * np.float32(0.5))
                if d in ctx else np.float32(base[d]))
        assert np.float32(sc) == want


def test_terms_query_constant_score(spark, docs_index):
    """TermsQuery: union of term doc-sets at constant 1.0, docID asc;
    equals the BooleanOr MATCH SET but never its scores."""
    from lucene_solr_spark.search.query import BooleanOr, TermsQuery
    from lucene_solr_spark.search.searcher import IndexSearcher

    s = IndexSearcher(spark, docs_index[0])
    rows = s.search(TermsQuery(("vector", "dup")), k=None).collect()
    assert all(r.score == 1.0 for r in rows)
    assert [r.doc_id for r in rows] == sorted(r.doc_id for r in rows)
    union = {r.doc_id
             for r in s.search(BooleanOr(("vector", "dup")), k=None).collect()}
    assert {r.doc_id for r in rows} == union
