"""Percolator tests: engine-equivalence of the compiled per-row
predicates, streaming parity, and the map-only plan shape."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def perc_index(spark, tmp_path_factory):
    from lucene_solr_spark.index.builder import IndexConfig, build_index

    out = str(tmp_path_factory.mktemp("perc_ix") / "ix")
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


def _queries():
    from lucene_solr_spark.search.query import (
        BooleanAnd,
        BooleanOr,
        PhraseQuery,
        TermQuery,
    )

    return {
        "q_term": TermQuery("table"),
        "q_and": BooleanAnd(("table", "scan")),
        "q_or2": BooleanOr(("merge", "sort", "batch"), min_should_match=2),
        "q_phrase": PhraseQuery(("table", "scan")),
        "q_absent": TermQuery("zzzmissing"),
        "q_stop": TermQuery("the"),  # stopword: analyzer drops it
    }


def test_percolate_matches_engine_doc_sets(spark, perc_index):
    """A doc matches a percolated query iff searching that query over
    the index returns the doc (k=None = full match set)."""
    from lucene_solr_spark.search.percolate import percolate
    from lucene_solr_spark.search.searcher import IndexSearcher

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    qs = _queries()
    got: dict[str, set] = {k: set() for k in qs}
    for r in percolate(docs, qs).collect():
        got[r.query_id].add(r.doc_id)
    s = IndexSearcher(spark, perc_index)
    for qid, q in qs.items():
        want = {r.doc_id for r in s.search(q, k=None).collect()}
        assert got[qid] == want, qid
    assert got["q_absent"] == set() and got["q_stop"] == set()
    assert got["q_phrase"] and got["q_phrase"] < got["q_and"]


def test_percolate_stateless_streaming_parity(spark, tmp_path):
    """percolate() runs unchanged on a streaming DataFrame (stateless
    projection) and emits the same pairs as the batch run."""
    from lucene_solr_spark.search.percolate import percolate

    import shutil

    src = f"{SF_SMALL}/documents.parquet"
    docs = spark.read.parquet(src)
    qs = _queries()
    want = {(r.doc_id, r.query_id) for r in percolate(docs, qs).collect()}

    stream_dir = tmp_path / "stream_in"
    stream_dir.mkdir()
    shutil.copy(src, stream_dir / "part-0.parquet")
    stream = spark.readStream.schema(docs.schema).parquet(str(stream_dir))
    out = percolate(stream, qs)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("perc_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.doc_id, r.query_id)
        for r in spark.sql("SELECT * FROM perc_stream").collect()
    }
    assert got == want and len(got) > 0


def test_percolate_plan_is_map_only(spark):
    from lucene_solr_spark.search.percolate import percolate

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    r = percolate(docs, _queries())
    plan = r._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle: pure projection


def test_percolate_inverted_parity_and_plan(spark):
    """The join-based large-registry formulation returns exactly the
    same pairs as the compiled-expression path (phrases excluded), and
    the registry joins are broadcast (no shuffle of the registry)."""
    from lucene_solr_spark.search.percolate import (
        percolate,
        percolate_inverted,
    )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    qs = {k: v for k, v in _queries().items() if k != "q_phrase"}
    want = {(r.doc_id, r.query_id) for r in percolate(docs, qs).collect()}
    inv = percolate_inverted(docs, qs)
    got = {(r.doc_id, r.query_id) for r in inv.collect()}
    assert got == want and len(got) > 0
    plan = inv._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    with pytest.raises(ValueError):
        from lucene_solr_spark.search.query import PhraseQuery

        percolate_inverted(docs, {"p": PhraseQuery(("a", "b"))})


def test_percolate_rejects_unsupported(spark):
    from lucene_solr_spark.search.percolate import percolate
    from lucene_solr_spark.search.query import PhraseQuery, TermQuery

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    with pytest.raises(ValueError):
        percolate(docs, {"f": TermQuery("x", field="source")}).collect()
    with pytest.raises(ValueError):
        percolate(
            docs, {"s": PhraseQuery(("a", "b"), slop=2)}
        ).collect()
