"""Compaction: merge deltas + apply deletes; scores must equal a fresh
build over the logically-current corpus (SegmentMerger-with-deletions
equivalence)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _scores_by_key(spark, ix, queries):
    from lucene_solr_spark.search.searcher import IndexSearcher

    s = IndexSearcher.open(spark, ix)
    out = {}
    for name, q in queries:
        rows = s.search_with_keys(q, k=None).collect()
        out[name] = sorted((r.key, np.float32(r.score)) for r in rows)
    return out


def test_compact_equals_fresh_build(spark, tmp_path):
    from lucene_solr_spark.index.builder import IndexConfig, build_index
    from lucene_solr_spark.index.check import check_index
    from lucene_solr_spark.index.compact import compact
    from lucene_solr_spark.index.deletes import delete_by_keys, update_documents
    from lucene_solr_spark.search.query import BooleanAnd, BooleanOr, TermQuery

    src = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    ix = str(tmp_path / "ix")
    cfg = IndexConfig(n_shards=2, segs_per_shard=2)
    build_index(spark, src, ix, cfg)

    # mutate: delete 5 docs, update 2, append 2 new
    delete_by_keys(spark, ix, [1, 2, 3, 4, 5])
    upd = spark.createDataFrame(
        [(10, "updated content table scan"), (11, "another updated value")],
        "doc_id long, text string",
    )
    update_documents(spark, ix, upd, batch_id="u")
    from lucene_solr_spark.streaming.nrt import append_batch

    new = spark.createDataFrame(
        [(9001, "brand new table doc"), (9002, "fresh vector doc")],
        "doc_id long, text string",
    )
    append_batch(spark, new, ix, batch_id="n")

    queries = [
        ("t", TermQuery("table")),
        ("v", TermQuery("vector")),
        ("a", BooleanAnd(("scan", "table"))),
        ("o", BooleanOr(("customer", "spark", "vector"))),
    ]

    # compact
    cix = str(tmp_path / "cix")
    m = compact(spark, ix, cix)
    check_index(spark, cix, sample_terms=40)

    # gold: fresh build over the logically-current corpus
    cur = (
        src.select("doc_id", "text")
        .where(~F.col("doc_id").isin([1, 2, 3, 4, 5, 10, 11]))
        .unionByName(upd)
        .unionByName(new)
    )
    gold_ix = str(tmp_path / "gold")
    build_index(spark, cur, gold_ix, cfg)

    got = _scores_by_key(spark, cix, queries)
    want = _scores_by_key(spark, gold_ix, queries)
    assert m["max_doc"] == cur.count()
    for name, _ in queries:
        assert got[name] == want[name], name

    # compacted view must equal the pre-compaction live view too
    live = _scores_by_key(spark, ix, queries)
    for name, _ in queries:
        assert {k for k, _ in got[name]} == {k for k, _ in live[name]}, name


def test_split_index(spark, tmp_path):
    """Index split (SolrIndexSplitter analog): disjoint hash-range
    splits whose union of keys equals the source; each split is an
    independent index with recomputed stats."""
    from lucene_solr_spark.index.builder import IndexConfig, build_index
    from lucene_solr_spark.index.check import check_index
    from lucene_solr_spark.index.compact import split_index
    from lucene_solr_spark.search.query import TermQuery
    from lucene_solr_spark.search.searcher import IndexSearcher

    src = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    ix = str(tmp_path / "ix")
    build_index(spark, src, ix, IndexConfig(n_shards=2, segs_per_shard=2))
    outs = [str(tmp_path / "s0"), str(tmp_path / "s1")]
    ms = split_index(spark, ix, outs)
    assert sum(m["max_doc"] for m in ms) == 500
    keys = set()
    all_hits = set()
    for od in outs:
        check_index(spark, od, sample_terms=20)
        s = IndexSearcher(spark, od)
        ks = {r.key for r in s.doc_map().select("key").collect()}
        assert not (keys & ks)  # disjoint
        keys |= ks
        all_hits |= {
            r.key
            for r in s.search_with_keys(TermQuery("table"), k=None).collect()
        }
    assert len(keys) == 500
    s_full = IndexSearcher(spark, ix)
    full_hits = {
        r.key
        for r in s_full.search_with_keys(TermQuery("table"), k=None).collect()
    }
    assert all_hits == full_hits


def test_hll_cardinality_close_to_exact(spark):
    """HLLAgg analog: approx_count_distinct (HLL++) within 5% of the
    exact distinct count (solr/.../facet/HLLAgg.java:36)."""
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    row = docs.agg(
        F.countDistinct("text").alias("exact"),
        F.approx_count_distinct("text").alias("hll"),
    ).first()
    assert abs(row.hll - row.exact) <= 0.05 * row.exact


def test_compact_preserves_positions(spark, tmp_path):
    """Phrase queries must keep working on a compacted positions index."""
    from lucene_solr_spark.index.builder import IndexConfig, build_index
    from lucene_solr_spark.index.compact import compact
    from lucene_solr_spark.index.deletes import delete_by_keys
    from lucene_solr_spark.search.query import PhraseQuery
    from lucene_solr_spark.search.searcher import IndexSearcher

    src = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    ix = str(tmp_path / "pix")
    build_index(
        spark, src, ix,
        IndexConfig(n_shards=2, segs_per_shard=2, index_positions=True),
    )
    s0 = IndexSearcher(spark, ix)
    before = [
        (r.key, np.float32(r.score))
        for r in s0.search_with_keys(PhraseQuery(("table", "scan")), k=None).collect()
    ]
    victims = [k for k, _ in before[:2]]
    delete_by_keys(spark, ix, victims)
    cix = str(tmp_path / "pcix")
    compact(spark, ix, cix)
    s1 = IndexSearcher(spark, cix)
    after = sorted(
        (r.key, np.float32(r.score))
        for r in s1.search_with_keys(PhraseQuery(("table", "scan")), k=None).collect()
    )
    # scores change (stats recomputed) but the surviving match SET is exact
    assert {k for k, _ in after} == {k for k, _ in before} - set(victims)


def test_compact_multi_field(spark, tmp_path):
    """Multi-field compaction (SegmentMerger.java:74-130 merges ALL
    fields): per-field postings, norms, and collection stats survive a
    compact with deletes; fielded + cross-field scores equal a fresh
    build over the surviving corpus."""
    from lucene_solr_spark.index.builder import IndexConfig, build_index
    from lucene_solr_spark.index.check import check_index
    from lucene_solr_spark.index.compact import compact
    from lucene_solr_spark.index.deletes import delete_by_keys
    from lucene_solr_spark.search.query import (
        BooleanQuery,
        Clause,
        TermQuery,
    )

    src = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    ix = str(tmp_path / "fix")
    cfg = IndexConfig(
        n_shards=2, segs_per_shard=2, id_col="doc_id", text_col="text",
        extra_fields=("source",),
    )
    build_index(spark, src, ix, cfg)
    victims = [1, 2, 3, 4, 5]
    delete_by_keys(spark, ix, victims)

    cix = str(tmp_path / "fcix")
    m = compact(spark, ix, cix)
    check_index(spark, cix, sample_terms=40)
    assert set(m["fields"]) == {"text", "source"}
    assert set(m["field_stats"]) == {"text", "source"}

    gold_ix = str(tmp_path / "fgold")
    build_index(
        spark, src.where(~F.col("doc_id").isin(victims)), gold_ix, cfg
    )

    queries = [
        ("f_src", TermQuery("src3", field="source")),
        ("f_text", TermQuery("table")),
        (
            "f_cross",
            BooleanQuery(
                (
                    Clause("MUST", TermQuery("table")),
                    Clause("SHOULD", TermQuery("src3", field="source")),
                )
            ),
        ),
    ]
    got = _scores_by_key(spark, cix, queries)
    want = _scores_by_key(spark, gold_ix, queries)
    for name, _ in queries:
        assert got[name] == want[name], name
        assert len(got[name]) > 0, name
