"""Index sorting (index/sorting.py — SortingMergePolicy / index-sort
analog): docID order == (sort_value, id) order, exact early-terminated
sorted top-k with per-shard work capped at k."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lucene_solr_spark.index.builder import IndexConfig
from lucene_solr_spark.index.sorting import build_sorted_index, sorted_topk
from lucene_solr_spark.search.query import BooleanOr, TermQuery
from lucene_solr_spark.search.searcher import IndexSearcher

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def sorted_ix(spark, tmp_path_factory):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    out = str(tmp_path_factory.mktemp("sorted") / "ix")
    build_sorted_index(
        spark, docs, out, "n_chars", IndexConfig(n_shards=4, segs_per_shard=2)
    )
    return out, docs


def test_docid_order_is_sort_order_per_shard(spark, sorted_ix):
    out, _ = sorted_ix
    s = IndexSearcher(spark, out)
    dm = s.doc_map().select("shard", "doc_id", "key").orderBy("shard", "doc_id")
    rows = dm.collect()
    for a, b in zip(rows, rows[1:]):
        if a["shard"] == b["shard"]:
            assert a["key"] <= b["key"]


def test_sorted_topk_exact_and_budgeted(spark, sorted_ix):
    out, docs = sorted_ix
    s = IndexSearcher(spark, out)
    for q, k in ((TermQuery("table"), 15), (BooleanOr(("scan", "vector")), 7)):
        got = [
            (r.doc_id, r.sort_value) for r in sorted_topk(s, q, k).collect()
        ]
        # brute-force oracle on the full match set
        full = s.search(q, k=None)  # doc_id here is the sorted-internal id
        keys = s.doc_map().select(F.col("doc_id"), "key")
        want = [
            ((r.key & ((1 << 20) - 1)), r.key >> 20)
            for r in full.join(keys, "doc_id")
            .orderBy("key")
            .limit(k)
            .collect()
        ]
        assert got == want
        # work cap: no shard collects more than k matches
        raw = s.early_terminated_frame(q, max_docs_per_shard=k)
        assert all(
            r["count"] <= k
            for r in raw.groupBy("shard").count().collect()
        )


def test_sorted_build_validation(spark):
    bad = spark.createDataFrame([(0, "x", -3)], ["doc_id", "text", "v"])
    with pytest.raises(ValueError, match="non-negative"):
        build_sorted_index(spark, bad, "/tmp/never", "v")
    huge = spark.createDataFrame([(1 << 21, "x", 1)], ["doc_id", "text", "v"])
    with pytest.raises(ValueError, match="non-negative"):
        build_sorted_index(spark, huge, "/tmp/never", "v")


def test_sorted_desc_and_paging(spark, tmp_path):
    """Descending build (reverse SortField) + searchAfter paging with
    the extended collection budget: pages tile the full sorted match
    set exactly, even when a shard's first-page prefix precedes the
    page-2 cursor."""
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    out = str(tmp_path / "dix")
    build_sorted_index(
        spark, docs, out, "n_chars",
        IndexConfig(n_shards=4, segs_per_shard=2), descending=True,
    )
    s = IndexSearcher(spark, out)
    q = TermQuery("table")
    k = 8
    p1 = [(r.doc_id, r.sort_value) for r in sorted_topk(s, q, k).collect()]
    assert len(p1) == k
    # desc order, doc_id asc tiebreak
    assert all(
        (a[1] > b[1]) or (a[1] == b[1] and a[0] < b[0]) for a, b in zip(p1, p1[1:])
    )
    p2 = [
        (r.doc_id, r.sort_value)
        for r in sorted_topk(s, q, k, after=p1[-1], before_count=k).collect()
    ]
    p3 = [
        (r.doc_id, r.sort_value)
        for r in sorted_topk(s, q, 10_000, after=p2[-1], before_count=2 * k).collect()
    ]
    # tiling == one big page
    allp = [(r.doc_id, r.sort_value) for r in sorted_topk(s, q, 10_000).collect()]
    assert p1 + p2 + p3 == allp
    # and the full set matches brute force on the source
    from pyspark.sql import functions as F

    want = (
        docs.where(F.array_contains(F.split("text", " "), "table"))
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .select("doc_id", "n_chars")
        .collect()
    )
    assert allp == [(r.doc_id, r.n_chars) for r in want]
