"""PhraseQuery + positions tests, plus multi-term expansion queries."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def pos_index(spark, tmp_path_factory):
    from lucene_solr_spark.index.builder import IndexConfig, build_index

    out = str(tmp_path_factory.mktemp("pos_ix") / "ix")
    src = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    build_index(
        spark,
        src,
        out,
        IndexConfig(n_shards=4, segs_per_shard=2, id_col="doc_id",
                    text_col="text", sharding="range_int",
                    index_positions=True),
    )
    return out


@pytest.fixture(scope="module")
def pos_searcher(spark, pos_index):
    from lucene_solr_spark.search.searcher import IndexSearcher

    return IndexSearcher(spark, pos_index)


def _brute_phrase(spark, phrase, k=20):
    """Brute-force oracle: analyzed tokens with positions, consecutive
    match count per doc, BM25 with idf = float32 sum of term idfs."""
    import pandas as pd

    from lucene_solr_spark.analysis.analyzers import (
        tokenize_standard_with_positions,
    )
    from lucene_solr_spark.functions import bm25
    from lucene_solr_spark.functions.smallfloat import encode_norm

    docs = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    tok = tokenize_standard_with_positions(docs["text"])
    doc_lens = tok.str.len().to_numpy(np.int64)
    norms = encode_norm(doc_lens)
    max_doc = len(docs)
    dfs = {}
    for t in set(phrase):
        dfs[t] = sum(1 for lst in tok if any(tt == t for tt, _ in lst))
    cache = bm25.norm_cache(bm25.avgdl(int(doc_lens.sum()), max_doc))
    idf_sum = np.float32(0.0)
    for t in phrase:
        idf_sum = np.float32(idf_sum + bm25.idf(dfs[t], max_doc))
    rows = []
    for i, lst in enumerate(tok):
        posmap = {}
        for tt, p in lst:
            posmap.setdefault(tt, set()).add(p)
        if any(t not in posmap for t in phrase):
            continue
        freq = sum(
            1
            for p in posmap[phrase[0]]
            if all((p + j) in posmap[phrase[j]] for j in range(1, len(phrase)))
        )
        if freq:
            s = bm25.score_term(
                np.array([freq]), norms[i : i + 1], idf_sum, cache
            )[0]
            rows.append((int(docs["doc_id"].iloc[i]), np.float32(s)))
    rows.sort(key=lambda r: (-float(r[1]), r[0]))
    return rows[:k]


def test_phrase_matches_bruteforce(spark, pos_searcher):
    from lucene_solr_spark.search.query import PhraseQuery

    for phrase in [("table", "scan"), ("fast", "slow"), ("value", "table", "part")]:
        got = [
            (r.doc_id, np.float32(r.score))
            for r in pos_searcher.search(PhraseQuery(phrase), k=20).collect()
        ]
        want = _brute_phrase(spark, phrase, 20)
        assert got == want, phrase


def test_phrase_absent_and_single(spark, pos_searcher):
    from lucene_solr_spark.search.query import PhraseQuery

    assert pos_searcher.search(PhraseQuery(("zzz", "qqq")), k=5).collect() == []
    # phrase through a stopword gap does NOT match adjacent ("a" removed
    # but its position counts): "x the y" indexes x@0, y@2 — ("x","y")
    # must not match
    import pandas as pd


def test_phrase_stopword_gap(spark, tmp_path):
    from lucene_solr_spark.index.builder import IndexConfig, build_index
    from lucene_solr_spark.search.query import PhraseQuery
    from lucene_solr_spark.search.searcher import IndexSearcher

    df = spark.createDataFrame(
        [(0, "alpha the beta"), (1, "alpha beta gamma"), (2, "beta alpha")],
        "doc_id long, text string",
    )
    out = str(tmp_path / "ix")
    build_index(
        spark, df, out,
        IndexConfig(n_shards=1, segs_per_shard=1, index_positions=True),
    )
    s = IndexSearcher(spark, out)
    hits = s.search(PhraseQuery(("alpha", "beta")), k=10).collect()
    # doc 1 matches adjacently; doc 0 has a stopword position gap -> no
    assert [r.doc_id for r in hits] == [1]


def test_prefix_and_wildcard_constant_score(pos_searcher):
    from lucene_solr_spark.search.query import PrefixQuery, WildcardQuery

    rows = pos_searcher.search(PrefixQuery("tab"), k=10).collect()
    assert len(rows) == 10
    assert all(r.score == 1.0 for r in rows)
    ids = [r.doc_id for r in rows]
    assert ids == sorted(ids)

    w = pos_searcher.search(WildcardQuery("tab*"), k=10).collect()
    assert [(r.doc_id, r.score) for r in w] == [(r.doc_id, r.score) for r in rows]


def test_fuzzy_expansion(pos_searcher):
    from lucene_solr_spark.search.query import FuzzyQuery, TermQuery

    # 'tabl' is within edit distance 1 of 'table'
    terms = pos_searcher._expand_fuzzy(FuzzyQuery("tabl", max_edits=1))
    assert "table" in terms
    hits = pos_searcher.search(FuzzyQuery("tabl", max_edits=1), k=5).collect()
    assert len(hits) == 5


def test_phrase_aware_highlighting(spark, tmp_path):
    """FVH parity (FieldPhraseList): an exact phrase highlights only
    COMPLETE occurrences — isolated phrase terms stay unwrapped, and
    a stop word between the terms breaks the match."""
    from lucene_solr_spark.index.builder import IndexConfig, build_index
    from lucene_solr_spark.search.query import PhraseQuery
    from lucene_solr_spark.search.searcher import IndexSearcher

    rows = [
        (0, "full table scan then a lone table here"),
        (1, "table the scan never adjacent"),
        (2, "table scan table scan"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ix = str(tmp_path / "hlix")
    build_index(
        spark, docs, ix,
        IndexConfig(n_shards=2, segs_per_shard=1, index_positions=True),
    )
    s = IndexSearcher(spark, ix)
    q = PhraseQuery(("table", "scan"))
    out = {
        r.doc_id: r.snippet
        for r in s.highlight(q, docs, k=10, window=50,
                             max_passages=2).collect()
    }
    # doc 1 has no phrase match at all -> not a hit
    assert 1 not in out
    # doc 0: the adjacent pair wrapped, the lone 'table' NOT wrapped
    assert "<em>table</em> <em>scan</em>" in out[0]
    assert "lone <em>table</em>" not in out[0]
    assert "lone table" in out[0]
    # doc 2: both occurrences wrapped
    assert out[2].count("<em>table</em> <em>scan</em>") == 2

    # phrase_aware=False restores per-term marking
    legacy = {
        r.doc_id: r.snippet
        for r in s.highlight(q, docs, k=10, window=50,
                             phrase_aware=False).collect()
    }
    assert "lone <em>table</em>" in legacy[0]
