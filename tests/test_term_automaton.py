"""TermAutomatonQuery (search/query.py TermAutomatonQuery,
searcher.search_term_automaton; reference lucene/sandbox/.../search/
TermAutomatonQuery.java + TermAutomatonScorer.java)."""

import numpy as np
import pytest

from lucene_solr_spark.functions import bm25
from lucene_solr_spark.functions.smallfloat import encode_norm
from lucene_solr_spark.search.query import PhraseQuery, TermAutomatonQuery

DOCS = [
    (0, "table scan fast merge sort"),
    (1, "scan table scan table scan"),
    (2, "table big scan merge table"),
    (3, "table scan scan big table"),
    (4, "sort table merge scan scan table x scan"),
    (5, "merge join sort"),
]


@pytest.fixture(scope="module")
def ta_index(spark, tmp_path_factory):
    from lucene_solr_spark.index.builder import IndexConfig, build_index
    from lucene_solr_spark.search.searcher import IndexSearcher

    out = str(tmp_path_factory.mktemp("taix") / "ix")
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_index(
        spark, docs, out,
        IndexConfig(n_shards=2, segs_per_shard=1, index_positions=True),
    )
    return IndexSearcher(spark, out)


def _phrase_automaton():
    q = TermAutomatonQuery()
    s1 = q.create_state()
    s2 = q.create_state()
    q.add_transition(0, s1, "table")
    q.add_transition(s1, s2, "scan")
    q.set_accept(s2)
    return q.finish()


def _gap_automaton():
    # table <ANY> scan
    q = TermAutomatonQuery()
    s1 = q.create_state()
    s2 = q.create_state()
    s3 = q.create_state()
    q.add_transition(0, s1, "table")
    q.add_any_transition(s1, s2)
    q.add_transition(s2, s3, "scan")
    q.set_accept(s3)
    return q.finish()


def test_phrase_automaton_equals_phrase_query(ta_index):
    got = {
        r.doc_id: np.float32(r.score)
        for r in ta_index.search_term_automaton(
            _phrase_automaton(), k=10
        ).collect()
    }
    exp = {
        r.doc_id: np.float32(r.score)
        for r in ta_index.search(PhraseQuery(("table", "scan")),
                                 k=10).collect()
    }
    assert got == exp and got  # non-empty, bitwise identical


def _expected_gap(freq_by_doc):
    """BM25 with idf = f32(idf(table) + idf(scan)) over DOCS stats."""
    toks = {d: t.split() for d, t in DOCS}
    n = len(DOCS)
    dfv = {
        t: sum(1 for ts in toks.values() if t in ts)
        for t in ("table", "scan")
    }
    idf_sum = np.float32(
        np.float32(bm25.idf(dfv["table"], n))
        + np.float32(bm25.idf(dfv["scan"], n))
    )
    out = {}
    for d, f in freq_by_doc.items():
        nb = encode_norm(np.array([len(toks[d])]))
        av = bm25.avgdl(sum(len(t) for t in toks.values()), n)
        cch = bm25.norm_cache(av)
        s = bm25.score_term(np.array([f], np.int64), nb, idf_sum, cch)
        out[d] = np.float32(s[0])
    return out


def test_gap_automaton_freqs(ta_index):
    # doc 0: table@0 scan@2? text = "table scan fast ..." ->
    #   table@0, scan@1: NOT a gap match (needs scan at table+2). no.
    # doc 2: table@0 big@1 scan@2 -> 1 match (gap token not a query
    #   term: counted once)
    # doc 3: table@0 scan@1 scan@2 -> gap token IS a query term ->
    #   the reference's double-step quirk counts 2
    # doc 1: scan table scan table scan: table@1 scan@3? no (scan@3 is
    #   'table'). positions: scan@0 table@1 scan@2 table@3 scan@4:
    #   table@1 + scan@3 -> no ('table'); table@3 + scan@5 -> no.
    #   table@1: pos 3 is table, no. -> 0 matches... but wait:
    #   table@1, gap scan@2, accept needs scan@3 (= table) -> no.
    # doc 4: sort table merge scan scan table x scan:
    #   table@1 + scan@3 (gap merge@2): 1
    #   table@5 + scan@7 (gap x@6, not indexed as query term): 1
    got = {
        r.doc_id: np.float32(r.score)
        for r in ta_index.search_term_automaton(
            _gap_automaton(), k=10
        ).collect()
    }
    exp = _expected_gap({2: 1, 3: 2, 4: 2})
    assert got == exp


def test_disjunction_automaton(ta_index):
    q = TermAutomatonQuery()
    s1 = q.create_state()
    q.add_transition(0, s1, "merge")
    q.add_transition(0, s1, "sort")
    q.set_accept(s1)
    q.finish()
    got = {
        r.doc_id: np.float32(r.score)
        for r in ta_index.search_term_automaton(q, k=10).collect()
    }
    # freq = tf(merge) + tf(sort) per doc; score BM25(freq, idf sum)
    toks = {d: t.split() for d, t in DOCS}
    freqs = {
        d: ts.count("merge") + ts.count("sort")
        for d, ts in toks.items()
    }
    freqs = {d: f for d, f in freqs.items() if f}
    n = len(DOCS)
    dfv = {
        t: sum(1 for ts in toks.values() if t in ts)
        for t in ("merge", "sort")
    }
    idf_sum = np.float32(
        np.float32(bm25.idf(dfv["merge"], n))
        + np.float32(bm25.idf(dfv["sort"], n))
    )
    av = bm25.avgdl(sum(len(t) for t in toks.values()), n)
    cch = bm25.norm_cache(av)
    exp = {}
    for d, f in freqs.items():
        nb = encode_norm(np.array([len(toks[d])]))
        exp[d] = np.float32(
            bm25.score_term(np.array([f], np.int64), nb, idf_sum, cch)[0]
        )
    assert got == exp


def test_any_validation():
    q = TermAutomatonQuery()
    s1 = q.create_state()
    q.add_any_transition(0, s1)
    q.set_accept(s1)
    with pytest.raises(ValueError, match="lead with an ANY"):
        q.finish()

    q = TermAutomatonQuery()
    s1 = q.create_state()
    s2 = q.create_state()
    q.add_transition(0, s1, "a")
    q.add_any_transition(s1, s2)
    q.set_accept(s2)
    with pytest.raises(ValueError, match="end with an ANY"):
        q.finish()


def test_unfinished_raises(ta_index):
    q = TermAutomatonQuery()
    s1 = q.create_state()
    q.add_transition(0, s1, "table")
    q.set_accept(s1)
    with pytest.raises(ValueError, match="finish"):
        ta_index.search_term_automaton(q, k=5)


def test_absent_terms_empty(ta_index):
    q = TermAutomatonQuery()
    s1 = q.create_state()
    q.add_transition(0, s1, "zzzzz")
    q.set_accept(s1)
    q.finish()
    assert ta_index.search_term_automaton(q, k=5).collect() == []


def test_token_stream_to_automaton_synonym_sausage(ta_index):
    from lucene_solr_spark.search.query import (
        MultiPhraseQuery,
        token_stream_to_term_automaton,
    )

    # (merge|big) table — a query-time synonym at position 0
    q = token_stream_to_term_automaton(
        [("merge", 1, 1), ("big", 0, 1), ("table", 1, 1)]
    )
    got = {
        r.doc_id: np.float32(r.score)
        for r in ta_index.search_term_automaton(q, k=10).collect()
    }
    exp = {
        r.doc_id: np.float32(r.score)
        for r in ta_index.search(
            MultiPhraseQuery((("merge", "big"), ("table",))), k=10
        ).collect()
    }
    assert got == exp and got


def test_token_stream_star_and_holes():
    from lucene_solr_spark.search.query import (
        token_stream_to_term_automaton,
    )

    q = token_stream_to_term_automaton(
        [("table", 1, 1), ("*", 1, 1), ("scan", 1, 1)]
    )
    assert q.any_id is not None
    with pytest.raises(ValueError, match="holes"):
        token_stream_to_term_automaton(
            [("table", 1, 1), ("scan", 2, 1)]
        )
    # squashed holes accepted
    q2 = token_stream_to_term_automaton(
        [("table", 1, 1), ("scan", 2, 1)],
        preserve_position_increments=False,
    )
    assert q2.terms() == ["table", "scan"]


def test_multiword_synonym_pos_length(ta_index):
    from lucene_solr_spark.search.query import (
        token_stream_to_term_automaton,
    )

    # "fast" as a 2-position synonym alternative to "big scan":
    # path A: big(1) scan(1); path B: fast spanning both positions.
    # doc 2 has "table big scan" (path A); doc 0 has "table scan fast"
    # -> table@0 then fast@2? no: needs fast right after table.
    q = token_stream_to_term_automaton(
        [("table", 1, 1), ("fast", 1, 2), ("big", 0, 1), ("scan", 1, 1)]
    )
    got = {r.doc_id for r in
           ta_index.search_term_automaton(q, k=10).collect()}
    # doc 2: table@0 big@1 scan@2 matches path A
    assert 2 in got
