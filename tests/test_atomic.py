"""Atomic updates (index/atomic.py — AtomicUpdateDocumentMerger
analog: set/add/remove/removeregex/inc merged against the stored docs,
then reindexed through update_documents)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from lucene_solr_spark.index.atomic import atomic_update, merge_atomic

OPS = MapType(StringType(), ArrayType(StringType()))


def _stored(spark):
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("views", IntegerType()),
        StructField("tags", ArrayType(StringType())),
    ])
    return spark.createDataFrame(
        [
            (1, "alpha beta", 10, ["a", "b", "a"]),
            (2, "gamma delta", 0, None),
            (3, "epsilon", 7, ["x"]),
        ],
        schema,
    )


def _updates(spark, rows):
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", OPS),
        StructField("views", OPS),
        StructField("tags", OPS),
    ])
    return spark.createDataFrame(rows, schema)


def _merge(spark, rows):
    out = merge_atomic(_stored(spark), _updates(spark, rows))
    return {r.doc_id: r for r in out.collect()}


def test_set_replaces_and_null_removes(spark):
    got = _merge(spark, [
        (1, {"set": ["new text"]}, None, None),
        (3, {"set": None}, None, None),
    ])
    assert got[1].text == "new text"
    assert got[1].views == 10 and got[1].tags == ["a", "b", "a"]
    assert got[3].text is None  # set null removes the field


def test_inc_adds_and_creates(spark):
    got = _merge(spark, [
        (1, None, {"inc": ["5"]}, None),
        (2, None, {"inc": ["-3"]}, None),
        (99, None, {"inc": ["4"]}, None),  # absent doc -> created
    ])
    assert got[1].views == 15
    assert got[2].views == -3
    assert got[99].views == 4 and got[99].text is None


def test_add_appends_and_creates_field(spark):
    got = _merge(spark, [
        (1, None, None, {"add": ["c", "a"]}),
        (2, None, None, {"add": ["z"]}),  # stored tags null
    ])
    assert got[1].tags == ["a", "b", "a", "c", "a"]
    assert got[2].tags == ["z"]


def test_remove_keeps_duplicates_of_survivors(spark):
    # removeAll semantics: every 'a' goes, both... the duplicate 'b'
    # case: seed tags with dups via add first
    got = _merge(spark, [(1, None, None, {"remove": ["a"]})])
    assert got[1].tags == ["b"]
    got = _merge(spark, [(1, None, None, {"add": ["b"], "remove": ["a"]})])
    # fixed op order: add then remove
    assert got[1].tags == ["b", "b"]


def test_removeregex_whole_value_match(spark):
    got = _merge(spark, [(1, None, None, {"removeregex": ["a|b"]})])
    assert got[1].tags == []  # both match whole-value
    got = _merge(spark, [(3, None, None, {"removeregex": ["y.*"]})])
    assert got[3].tags == ["x"]  # anchored: 'x' doesn't match y.*


def test_unknown_op_and_id_mutation_raise(spark):
    with pytest.raises(ValueError, match="Unknown operation"):
        _merge(spark, [(1, {"frobnicate": ["x"]}, None, None)])
    schema = StructType([
        StructField("doc_id", OPS), StructField("text", OPS),
    ])
    bad = spark.createDataFrame([({"set": ["9"]}, None)], schema)
    with pytest.raises(ValueError, match="id field"):
        merge_atomic(_stored(spark), bad)
    with pytest.raises(ValueError, match="unknown field"):
        merge_atomic(
            _stored(spark),
            spark.createDataFrame(
                [(1, {"set": ["x"]})],
                StructType([
                    StructField("doc_id", LongType()),
                    StructField("nope", OPS),
                ]),
            ),
        )


def test_duplicate_keys_in_one_batch_raise(spark):
    """Same key twice in one batch raises — the reference applies
    same-id updates sequentially (cumulative), which one fetch-merge
    join cannot reproduce; silently merging would leave two live docs
    with the same key above the watermark."""
    with pytest.raises(ValueError, match="duplicate key"):
        _merge(spark, [
            (1, {"set": ["first"]}, None, None),
            (1, {"set": ["second"]}, None, None),
        ])


def test_atomic_update_reindexes(spark, tmp_path):
    from lucene_solr_spark.index.builder import IndexConfig, build_index
    from lucene_solr_spark.search.query import TermQuery
    from lucene_solr_spark.search.searcher import IndexSearcher

    ix = str(tmp_path / "aix")
    stored = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha alpha")],
        "doc_id long, text string",
    )
    build_index(spark, stored, ix, IndexConfig(n_shards=2, segs_per_shard=1))
    ups = spark.createDataFrame(
        [(1, {"set": ["zeta eta theta"]})],
        StructType([
            StructField("doc_id", LongType()), StructField("text", OPS),
        ]),
    )
    merged = atomic_update(spark, ix, stored, ups, batch_id="at0")
    assert merged.collect()[0].text == "zeta eta theta"

    s = IndexSearcher.open(spark, ix)
    alpha_docs = {r.doc_id for r in
                  s.search_with_keys(TermQuery("alpha"), k=10).collect()}
    zeta = s.search_with_keys(TermQuery("zeta"), k=10).collect()
    # old version of key 1 tombstoned; new version carries zeta
    assert {r.key for r in zeta} == {1}
    assert 3 in {r.key for r in
                 s.search_with_keys(TermQuery("alpha"), k=10).collect()}
    keys_alpha = {r.key for r in
                  s.search_with_keys(TermQuery("alpha"), k=10).collect()}
    assert 1 not in keys_alpha
