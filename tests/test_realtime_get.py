"""Realtime get tests (searcher.get_by_keys — RealTimeGetHandler
analog: current doc versions by key across NRT generations/deletes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


@pytest.fixture()
def rtg_index(spark, tmp_path):
    from lucene_solr_spark.index.builder import IndexConfig, build_index

    out = str(tmp_path / "rtg_ix")
    src = spark.read.parquet(f"{SF_SMALL}/documents.parquet").where(
        F.col("doc_id") < 300
    )
    build_index(
        spark, src, out,
        IndexConfig(n_shards=2, segs_per_shard=2, id_col="doc_id",
                    text_col="text", sharding="hash"),
    )
    return out


def test_get_by_keys_sees_deltas_and_deletes(spark, rtg_index):
    from lucene_solr_spark.index.deletes import delete_by_keys
    from lucene_solr_spark.search.searcher import IndexSearcher
    from lucene_solr_spark.streaming.nrt import append_batch

    batch = spark.createDataFrame(
        [(9_001, "rtg alpha beta gamma")], "doc_id long, text string"
    )
    append_batch(spark, batch, rtg_index, batch_id=0)
    delete_by_keys(spark, rtg_index, [5, 6])

    s = IndexSearcher.open(spark, rtg_index)
    got = s.get_by_keys([4, 5, 6, 9_001, 777_777]).collect()
    keys = [int(r.key) for r in got]
    assert keys == [4, 9_001]  # deleted + absent keys return nothing
    assert int(got[1].doc_len) == 4  # the delta doc's token count


def test_get_by_keys_update_returns_newest_version(spark, rtg_index):
    from lucene_solr_spark.index.deletes import update_documents
    from lucene_solr_spark.search.searcher import IndexSearcher

    batch = spark.createDataFrame(
        [(7, "one two three")], "doc_id long, text string"
    )
    update_documents(spark, rtg_index, batch, 0)
    s = IndexSearcher.open(spark, rtg_index)
    got = s.get_by_keys([7]).collect()
    assert len(got) == 1  # old version tombstoned away
    assert int(got[0].doc_len) == 3  # the replacement's length
