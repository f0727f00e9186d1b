"""TermVectorComponent analog tests (searcher.term_vectors)."""

from __future__ import annotations

from collections import Counter

from tests.conftest import SF_SMALL


def test_term_vectors_match_manual_counts(spark, docs_index):
    from lucene_solr_spark.analysis.analyzers import ANALYZERS
    from lucene_solr_spark.search.query import TermQuery
    from lucene_solr_spark.search.searcher import IndexSearcher

    s = IndexSearcher(spark, docs_index[0])
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    tv = s.term_vectors(TermQuery("table"), docs, k=3).toPandas()
    top3 = [r.doc_id for r in s.search(TermQuery("table"), k=3).collect()]
    assert sorted(tv["doc_id"].unique()) == sorted(top3)

    analyze = ANALYZERS[s.manifest["config"]["analyzer"]]
    import pandas as pd

    dp = docs.where(docs.doc_id.isin([int(x) for x in top3])).toPandas()
    for _, row in dp.iterrows():
        want = Counter(analyze(pd.Series([row["text"]]))[0])
        got = dict(
            tv[tv["doc_id"] == row["doc_id"]][["term", "tf"]].itertuples(
                index=False, name=None
            )
        )
        assert got == dict(want), row["doc_id"]

    # df column equals the dictionary's df for every term
    stats = {
        r.term: r.df
        for r in s._term_stats.where(
            s._term_stats.term.isin([str(t) for t in tv["term"].unique()])
        ).collect()
    }
    assert all(int(r.df) == int(stats[r.term]) for r in tv.itertuples())
