"""Tombstone scale discipline (round-4 verdict #3).

The serving path must never FORCE a broadcast of the unrestricted
tombstone frame (a deletes-heavy window between compactions can grow it
past executor memory), and per-shard deleted sets ship as packed
liveDocs bitmaps (one bit per local docID, Lucene50LiveDocsFormat
analog), not int64 arrays.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


@pytest.fixture()
def heavy_del_index(spark, tmp_path):
    """Majority-deleted index: every doc_id not divisible by 4."""
    from lucene_solr_spark.index.builder import IndexConfig, build_index
    from lucene_solr_spark.index.deletes import delete_by_keys

    out = str(tmp_path / "ix")
    src = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    build_index(spark, src, out, IndexConfig(n_shards=2, segs_per_shard=2))
    victims = [int(r.doc_id) for r in
               src.where(F.col("doc_id") % 4 != 0).collect()]
    delete_by_keys(spark, out, victims)
    return out, set(victims)


def test_no_forced_tombstone_broadcast(spark, heavy_del_index):
    """With auto-broadcast disabled, the deleted_df plan must not
    contain a broadcast join — proving there is no broadcast HINT on
    the tombstone frame (small frames may still auto-broadcast under
    the threshold, which is the size guard)."""
    from lucene_solr_spark.search.searcher import IndexSearcher

    out, _ = heavy_del_index
    s = IndexSearcher(spark, out)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = s.deleted_df()._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        assert "BroadcastExchange" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_deleted_ships_as_packed_bitmap(spark, heavy_del_index):
    """_norms_for_query attaches a BINARY deleted_bm column (packed
    bits), and the unpacked local IDs round-trip exactly."""
    from lucene_solr_spark.search.searcher import IndexSearcher, _local_deleted
    import pandas as pd

    out, victims = heavy_del_index
    s = IndexSearcher(spark, out)
    nf = s._norms_for_query(None)
    field = dict((f.name, f.dataType.simpleString()) for f in nf.schema.fields)
    assert field.get("deleted_bm") == "binary"
    assert "deleted" not in field

    got = set()
    for r in nf.select("shard", "deleted_bm").collect():
        pdf = pd.DataFrame({"deleted_bm": [r.deleted_bm]})
        local = _local_deleted(pdf, 0)
        if local is None:
            continue
        off = s._doc_offsets.get(int(r.shard), 0)
        got |= {int(x) + off for x in local}
    assert got == victims


def test_majority_deleted_search_correct(spark, heavy_del_index):
    """End-to-end on the majority-deleted index: only live docs return,
    scores bit-identical to the pre-delete run for survivors."""
    from lucene_solr_spark.index.builder import IndexConfig, build_index
    from lucene_solr_spark.search.query import BooleanOr, TermQuery
    from lucene_solr_spark.search.searcher import IndexSearcher

    out, victims = heavy_del_index
    s = IndexSearcher(spark, out)
    for q in (TermQuery("table"), BooleanOr(("scan", "merge"))):
        rows = s.search(q, k=None).collect()
        assert rows, "query should still match live docs"
        assert all(int(r.doc_id) not in victims for r in rows)
        assert all(int(r.doc_id) % 4 == 0 for r in rows)
