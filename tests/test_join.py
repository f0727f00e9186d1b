"""JoinUtil score-mode tests (search/join.py) — parity with a pandas
recomputation of ScoreMode None/Max/Total/Avg (join/.../JoinUtil.java,
ScoreMode.java)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def joined(spark, docs_index):
    from lucene_solr_spark.search.query import TermQuery
    from lucene_solr_spark.search.searcher import IndexSearcher

    s = IndexSearcher(spark, docs_index[0])
    hits = s.search(TermQuery("table"), k=None)
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    hp = hits.toPandas()
    hp["score"] = hp["score"].astype("float64")
    dp = docs.select("doc_id", "source").toPandas()
    return hits, docs, hp, dp


@pytest.mark.parametrize("mode", ["none", "max", "total", "avg"])
def test_join_modes_match_pandas(spark, joined, mode):
    from lucene_solr_spark.search.join import join_util

    hits, docs, hp, dp = joined
    got = (
        join_util(hits, docs, "source", docs, "source", mode)
        .toPandas()
        .set_index("doc_id")["score"]
        .sort_index()
    )
    m = hp.merge(dp, on="doc_id")
    g = m.groupby("source")["score"].agg(["max", "sum", "mean", "size"])
    agg = {
        "none": (g["size"] * 0 + 1.0),
        "max": g["max"],
        "total": g["sum"],
        "avg": g["mean"],
    }[mode]
    want = (
        dp[dp["source"].isin(g.index)]
        .assign(score=lambda x: x["source"].map(agg))
        .set_index("doc_id")["score"]
        .sort_index()
    )
    assert len(got) == len(want)
    # total/avg sum float64 in shuffle order — allow ulp-level slack
    assert (abs(got - want.astype(float)) < 1e-9 * (1 + abs(want))).all()


def test_join_rejects_unknown_mode(spark, joined):
    from lucene_solr_spark.search.join import join_util

    hits, docs, _, _ = joined
    with pytest.raises(ValueError, match="score_mode"):
        join_util(hits, docs, "source", docs, "source", "weird")
