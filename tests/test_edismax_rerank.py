"""edismax (multi-field DisMax parser subset) and two-phase rerank.

References: solr/.../search/DisMaxQParser.java:77-131 (per-term DisMax
across qf fields, SHOULD-combined), search/DisjunctionMaxQuery.java:60
(max + tie*(sum-max)), solr/core/.../search/ReRankQParserPlugin.java
(ReRankCollector: top-N of the main query rescored with the rerank
query's weighted score added)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.search.parser import edismax_query
from lucene_solr_spark.search.query import (
    BooleanOr,
    BoostQuery,
    DisMaxQuery,
    TermQuery,
)
from lucene_solr_spark.search.searcher import IndexSearcher
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def xfield(spark, tmp_path_factory):
    """Corpus where a token appears in BOTH fields, so the cross-field
    DisMax genuinely maxes (the documents corpus has disjoint text /
    source vocabularies)."""
    from lucene_solr_spark.index.builder import IndexConfig, build_index

    rows = [
        (0, "alpha beta gamma", "alpha"),
        (1, "alpha alpha delta", "beta"),
        (2, "beta gamma", "alpha"),
        (3, "delta epsilon", "gamma"),
        (4, "alpha beta", "delta"),
    ]
    out = str(tmp_path_factory.mktemp("xf") / "ix")
    src = spark.createDataFrame(rows, "doc_id long, text string, source string")
    build_index(
        spark, src, out,
        IndexConfig(n_shards=1, segs_per_shard=1, id_col="doc_id",
                    text_col="text", extra_fields=("source",),
                    sharding="range_int"),
    )
    return IndexSearcher(spark, out)


def _scores(df):
    return {r.doc_id: np.float32(r.score) for r in df.collect()}


def test_edismax_crossfield_max_tie(xfield):
    """Single-term edismax over both fields == f32 dismax of the two
    single-field scores: max + tie*(sum-max), f32 accumulation
    (DisjunctionMaxScorer.java:28)."""
    tie = 0.5
    got = _scores(xfield.search(
        edismax_query("alpha", {"text": 1.0, "source": 2.0}, tie=tie),
        k=None,
    ))
    s_text = _scores(xfield.search(TermQuery("alpha"), k=None))
    s_src = _scores(xfield.search(
        BoostQuery(TermQuery("alpha", field="source"), 2.0), k=None
    ))
    assert set(got) == set(s_text) | set(s_src)
    t32 = np.float32(tie)
    for d, sc in got.items():
        subs = [s for s in (s_text.get(d), s_src.get(d)) if s is not None]
        if len(subs) == 1:
            want = subs[0]
        else:
            acc = np.float32(0.0)
            mx = np.float32(-np.inf)
            for s in subs:
                acc = np.float32(acc + s)
                mx = max(mx, s)
            want = np.float32(mx + np.float32(acc - mx) * t32)
        # pure-SHOULD single-clause bool: f32(f64(dismax)) == dismax
        assert sc == want, d


def test_edismax_multi_term_sums_should(xfield):
    """Two-term edismax == f32(f64 sum of the per-term DisMax scores)
    over the union (DisjunctionSumScorer)."""
    q = edismax_query("alpha gamma", {"text": 1.0, "source": 2.0}, tie=0.1)
    got = _scores(xfield.search(q, k=None))
    a = _scores(xfield.search(
        DisMaxQuery((TermQuery("alpha"),
                     BoostQuery(TermQuery("alpha", field="source"), 2.0)),
                    tie=0.1), k=None))
    g = _scores(xfield.search(
        DisMaxQuery((TermQuery("gamma"),
                     BoostQuery(TermQuery("gamma", field="source"), 2.0)),
                    tie=0.1), k=None))
    assert set(got) == set(a) | set(g)
    for d, sc in got.items():
        want = np.float32(
            np.float64(a.get(d, np.float32(0.0)))
            + np.float64(g.get(d, np.float32(0.0)))
        )
        assert sc == want, d


def test_edismax_empty_and_mm():
    assert edismax_query("the and of", {"text": 1.0}) is None  # all stops
    q = edismax_query("alpha beta", {"text": 1.0}, mm=2)
    assert q.min_should_match == 2


def test_edismax_phrase_fields_boost(spark, tmp_path):
    """pf/ps (DisMaxQParser.addBoostQuery): the analyzed query string
    becomes a boosted optional PhraseQuery per pf field on top of the
    required main query — docs matching the phrase add its score, the
    rest keep the main score; with equal term stats the phrase doc
    outranks the bag-of-words doc."""
    from lucene_solr_spark.index.builder import IndexConfig, build_index
    from lucene_solr_spark.search.query import (
        BooleanQuery,
        BoostQuery,
        Clause,
        PhraseQuery,
    )

    rows = [
        (0, "alpha gamma beta"),   # exact phrase "alpha gamma"
        (1, "gamma alpha beta"),   # transposed: adjusted spread 2
    ]
    out = str(tmp_path / "pfix")
    src = spark.createDataFrame(rows, "doc_id long, text string")
    build_index(
        spark, src, out,
        IndexConfig(n_shards=1, segs_per_shard=1, id_col="doc_id",
                    text_col="text", sharding="range_int",
                    index_positions=True),
    )
    s = IndexSearcher(spark, out)
    q = edismax_query("alpha gamma", {"text": 1.0}, pf={"text": 2.0})
    got = _scores(s.search(q, k=None))
    manual = BooleanQuery(
        (
            Clause("MUST", edismax_query("alpha gamma", {"text": 1.0})),
            Clause(
                "SHOULD",
                BoostQuery(PhraseQuery(("alpha", "gamma"), field="text"), 2.0),
            ),
        )
    )
    want = _scores(s.search(manual, k=None))
    assert got == want and set(got) == {0, 1}
    assert got[0] > got[1]  # phrase match boosts doc 0
    # ps relaxes adjacency: slop 2 reaches doc 1's transposed pair too
    q2 = edismax_query("alpha gamma", {"text": 1.0}, pf={"text": 2.0}, ps=2)
    got2 = _scores(s.search(q2, k=None))
    assert got2[1] > got[1]
    # no pf or a one-token string -> plain main query
    assert edismax_query("alpha gamma", {"text": 1.0}) == edismax_query(
        "alpha gamma", {"text": 1.0}, pf=None
    )
    assert edismax_query("alpha", {"text": 1.0}, pf={"text": 2.0}) == \
        edismax_query("alpha", {"text": 1.0})


def test_rerank_matches_manual(spark, docs_index):
    """rerank == manual: top-100 of the main query, +w*rq where rq
    matches (f64 combine, f32 cast), reordered (score desc, doc asc)."""
    s = IndexSearcher(spark, docs_index[0])
    main = BooleanOr(("table", "vector", "customer"))
    rq = TermQuery("scan")
    w = 2.0
    top = [(r.doc_id, np.float32(r.score))
           for r in s.search(main, k=100).collect()]
    rqs = {r.doc_id: np.float32(r.score)
           for r in s.search(rq, k=None).collect()}
    want = sorted(
        (
            (d, np.float32(np.float64(sc) + w * np.float64(rqs.get(d, 0.0))))
            for d, sc in top
        ),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    got = [(r.doc_id, np.float32(r.score))
           for r in s.rerank(main, rq, rerank_docs=100,
                             rerank_weight=w, k=10).collect()]
    assert got == want
    # reranking must actually change the order vs the plain main top-10
    plain = [r.doc_id for r in s.search(main, k=10).collect()]
    assert [d for d, _ in got] != plain
