"""IndexWriter.addIndexes analog: fold N independent indexes into one.

Pinned contract (index/IndexWriter.java addIndexes(Directory...) +
MergeState docBase remap): the folded index carries GLOBAL collection
statistics, so ranks and scores equal an index built over the
concatenated corpus bitwise."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.index.builder import IndexConfig, build_index
from lucene_solr_spark.index.storage import add_indexes
from lucene_solr_spark.search.searcher import IndexSearcher
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def merged_and_full(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("addix"))
    src = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    a = src.where("doc_id < 250")
    b = src.where("doc_id >= 250")
    build_index(spark, a, f"{root}/A",
                IndexConfig(n_shards=2, segs_per_shard=2,
                            index_positions=True))
    build_index(spark, b, f"{root}/B",
                IndexConfig(n_shards=2, segs_per_shard=2,
                            index_positions=True))
    build_index(spark, src, f"{root}/FULL",
                IndexConfig(n_shards=4, segs_per_shard=2,
                            index_positions=True))
    add_indexes(spark, [f"{root}/A", f"{root}/B"], f"{root}/MERGED")
    return (IndexSearcher.open(spark, f"{root}/MERGED"),
            IndexSearcher.open(spark, f"{root}/FULL"), root)


def _keyed(s, q, k=10):
    return [
        (r.key, r.score)
        for r in s.search_with_keys(q, k=k)
        .select(F.col("key").cast("long").alias("key"), "score")
        .collect()
    ]


def test_global_stats(merged_and_full, spark):
    sm, sf, _ = merged_and_full
    assert sm.max_doc == sf.max_doc == 500
    assert sm.avgdl == sf.avgdl  # summed sumTotalTermFreq / maxDoc
    # per-term df merged across sources
    dfm = {r.term: r.df for r in
           sm._term_stats.where(F.col("term") == "table").collect()}
    dff = {r.term: r.df for r in
           sf._term_stats.where(F.col("term") == "table").collect()}
    assert dfm == dff


@pytest.mark.parametrize("qname", ["term", "and", "phrase"])
def test_bitwise_vs_full_build(merged_and_full, qname):
    from lucene_solr_spark.search.query import (
        BooleanAnd, PhraseQuery, TermQuery,
    )

    q = {
        "term": TermQuery("table"),
        "and": BooleanAnd(("table", "scan")),
        "phrase": PhraseQuery(("table", "scan")),
    }[qname]
    sm, sf, _ = merged_and_full
    assert _keyed(sm, q) == _keyed(sf, q)


def test_rejects_tombstoned_source(merged_and_full, spark, tmp_path):
    from lucene_solr_spark.index.deletes import delete_by_keys

    _, _, root = merged_and_full
    delete_by_keys(spark, f"{root}/A", [0])
    with pytest.raises(ValueError, match="tombstones"):
        add_indexes(spark, [f"{root}/A", f"{root}/B"],
                    str(tmp_path / "out"))


def test_rejects_codec_mismatch(spark, tmp_path):
    src = spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(50)
    build_index(spark, src, str(tmp_path / "v"),
                IndexConfig(n_shards=1, segs_per_shard=1))
    build_index(spark, src, str(tmp_path / "f"),
                IndexConfig(n_shards=1, segs_per_shard=1, codec="for"))
    with pytest.raises(ValueError, match="codec mismatch"):
        add_indexes(spark, [str(tmp_path / "v"), str(tmp_path / "f")],
                    str(tmp_path / "out"))
