"""Update-format loaders (sources/loaders.py — CSVLoaderBase /
JsonLoader / XMLLoader analogs feeding build_index / deletes)."""

from __future__ import annotations

import pytest


def test_csv_loader_params(spark, tmp_path):
    from lucene_solr_spark.sources.loaders import read_csv_docs

    p = tmp_path / "docs.csv"
    p.write_text(
        "doc_id;text;tags\n"
        "1; table scan ;a|b\n"
        '2;"semi;colon text";c\n'
    )
    df = read_csv_docs(
        spark, str(p), separator=";", trim=True, split={"tags": "|"}
    )
    rows = {r.doc_id: r for r in df.collect()}
    assert rows["1"].text == "table scan"  # trimmed
    assert rows["1"].tags == ["a", "b"]
    assert rows["2"].text == "semi;colon text"  # encapsulated

    with pytest.raises(ValueError, match="Invalid separator"):
        read_csv_docs(spark, str(p), separator=";;")
    with pytest.raises(ValueError, match="Invalid encapsulator"):
        read_csv_docs(spark, str(p), encapsulator="''")


def test_csv_explicit_fieldnames(spark, tmp_path):
    from lucene_solr_spark.sources.loaders import read_csv_docs

    p = tmp_path / "nh.csv"
    p.write_text("7,hello world\n8,more text\n")
    df = read_csv_docs(
        spark, str(p), header=False, fieldnames=["doc_id", "text"]
    )
    assert {r.doc_id for r in df.collect()} == {"7", "8"}
    with pytest.raises(ValueError, match="fieldnames"):
        read_csv_docs(spark, str(p), header=False, fieldnames=["only"])


def test_csv_fieldnames_with_header_skips_first_line(spark, tmp_path):
    """fieldnames + header=True (the default): the file's header line
    is SKIPPED, not ingested as a document — CSVLoaderBase.java:227-229
    skips the first line in exactly this combination."""
    from lucene_solr_spark.sources.loaders import read_csv_docs

    p = tmp_path / "wh.csv"
    p.write_text("id,body\n7,hello world\n8,more text\n")
    df = read_csv_docs(spark, str(p), fieldnames=["doc_id", "text"])
    rows = {r.doc_id: r.text for r in df.collect()}
    assert rows == {"7": "hello world", "8": "more text"}
    assert "id" not in rows  # header line not ingested as data


def test_json_docs_and_commands(spark, tmp_path):
    from lucene_solr_spark.sources.loaders import (
        parse_json_commands,
        read_json_docs,
    )

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "alpha"}\n{"doc_id": 2, "text": "beta"}\n'
    )
    df = read_json_docs(spark, str(p))
    assert df.count() == 2

    body = (
        '{"add": {"doc": {"doc_id": 10, "text": "x"}},'
        ' "add": {"doc": {"doc_id": 11, "text": "y"}},'
        ' "delete": "5",'
        ' "delete": ["6", "7"],'
        ' "delete": {"id": "8"},'
        ' "delete": {"query": "text:stale"},'
        ' "commit": {}}'
    )
    out = parse_json_commands(spark, body)
    assert out["adds"].count() == 2  # duplicate 'add' keys both kept
    assert out["delete_ids"] == ["5", "6", "7", "8"]
    assert out["delete_queries"] == ["text:stale"]

    arr = parse_json_commands(spark, '[{"doc_id": 1}, {"doc_id": 2}]')
    assert arr["adds"].count() == 2 and arr["delete_ids"] == []

    with pytest.raises(ValueError, match="Unknown command"):
        parse_json_commands(spark, '{"frob": {}}')


def test_xml_commands(spark):
    from lucene_solr_spark.sources.loaders import parse_xml_commands

    body = (
        "<update><add>"
        '<doc><field name="doc_id">1</field>'
        '<field name="text">table scan</field>'
        '<field name="tags">a</field><field name="tags">b</field></doc>'
        '<doc><field name="doc_id">2</field>'
        '<field name="text">merge</field></doc>'
        "</add><delete><id>9</id><query>lang:fr</query></delete>"
        "</update>"
    )
    out = parse_xml_commands(spark, body)
    rows = {r.doc_id: r for r in out["adds"].collect()}
    assert rows["1"].text == "table scan"
    assert rows["1"].tags == ["a", "b"]  # repeated field -> multiValued
    assert out["delete_ids"] == ["9"]
    assert out["delete_queries"] == ["lang:fr"]


def test_loader_feeds_index(spark, tmp_path):
    from lucene_solr_spark.index.builder import IndexConfig, build_index
    from lucene_solr_spark.search.query import TermQuery
    from lucene_solr_spark.search.searcher import IndexSearcher
    from lucene_solr_spark.sources.loaders import read_csv_docs
    from pyspark.sql import functions as F

    p = tmp_path / "docs.csv"
    p.write_text(
        "doc_id,text\n1,table scan fast\n2,merge sort\n3,table merge\n"
    )
    docs = read_csv_docs(spark, str(p)).withColumn(
        "doc_id", F.col("doc_id").cast("long")
    )
    ix = str(tmp_path / "csvix")
    build_index(spark, docs, ix, IndexConfig(n_shards=2, segs_per_shard=1))
    s = IndexSearcher(spark, ix)
    got = {r.doc_id for r in s.search_with_keys(TermQuery("table"),
                                               k=10).collect()}
    assert len(got) == 2
