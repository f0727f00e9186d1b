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


@pytest.mark.parametrize("mode", ["none", "max", "total", "avg"])
def test_to_parent_block_join_modes(spark, joined, mode):
    from lucene_solr_spark.search.join import to_parent_block_join

    hits, docs, hp, dp = joined
    got = (
        to_parent_block_join(hits, docs, "source", mode)
        .toPandas()
        .set_index("parent_key")
        .sort_index()
    )
    m = hp.merge(dp, on="doc_id")
    g = m.groupby("source")["score"].agg(["max", "sum", "mean", "size"])
    want = {
        "none": g["size"] * 0 + 1.0,
        "max": g["max"],
        "total": g["sum"],
        "avg": g["mean"],
    }[mode]
    assert got["n_children"].to_dict() == g["size"].to_dict()
    assert got["score"].sort_index().round(9).to_dict() == pytest.approx(
        want.sort_index().round(9).to_dict()
    )


def test_to_child_block_join_propagates_parent_score(spark, joined):
    from lucene_solr_spark.search.join import (
        to_child_block_join,
        to_parent_block_join,
    )
    from pyspark.sql import functions as F

    hits, docs, hp, dp = joined
    parents = to_parent_block_join(hits, docs, "source", "max").where(
        F.col("n_children") >= 2
    )
    pmap = {
        r.parent_key: r.score for r in parents.collect()
    }
    assert pmap, "fixture must yield a multi-child parent"
    kids = to_child_block_join(parents, docs, "source").toPandas()
    dmap = dp.set_index("doc_id")["source"].to_dict()
    # every child of a surviving parent appears exactly once, with the
    # parent's score; children of filtered-out parents are absent
    want = {
        did: pmap[src] for did, src in dmap.items() if src in pmap
    }
    got = kids.set_index("doc_id")["score"].to_dict()
    assert got == pytest.approx(want)


def test_to_parent_block_join_rejects_unknown_mode(spark, joined):
    from lucene_solr_spark.search.join import to_parent_block_join

    hits, docs, _, _ = joined
    with pytest.raises(ValueError):
        to_parent_block_join(hits, docs, "source", "nope")
