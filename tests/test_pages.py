"""Pages pipeline tests: pinned extraction (byte-identity invariant from
BASELINE.json input_hint), deterministic generation, and end-to-end
index+search over the url-keyed pages table."""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pytest

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


# ------------------------------------------------------------ extractor


def test_extract_text_pinned_behavior():
    from lucene_solr_spark.analysis.html import extract_text

    html = (
        b"<html><head><title>My Title</title><style>p { x: 1 }</style></head>"
        b"<body><!-- c --><p>Hello &amp; <b>world</b></p>"
        b"<script>var s = '<p>not text</p>';</script>"
        b"<p>caf\xc3\xa9 &lt;tag&gt; &nbsp;end</p></body></html>"
    )
    assert extract_text(html) == "My Title Hello & world caf\xe9 <tag> end"


def test_extract_text_invalid_utf8_deterministic():
    from lucene_solr_spark.analysis.html import extract_text

    assert extract_text(b"<p>a\xff b</p>") == "a� b"


def test_extract_scalar_equals_vectorized():
    import pandas as pd

    from lucene_solr_spark.analysis.html import extract_text, extract_text_series
    from lucene_solr_spark.fixtures.pages import pages_pandas

    pdf = pages_pandas(np.arange(50))
    vec = extract_text_series(pdf["html"])
    for h, v in zip(pdf["html"], vec):
        assert extract_text(h) == v


def test_extraction_byte_identity_golden():
    """The per-row invariant: byte-identical extracted text per url,
    pinned by committed sha256 hashes (regenerating the rows must
    reproduce them exactly)."""
    from lucene_solr_spark.fixtures.pages import pages_pandas

    golden = {}
    with open(os.path.join(FIXTURES, "extraction_golden.jsonl")) as fh:
        for line in fh:
            rec = json.loads(line)
            golden[rec["url"]] = rec["sha256"]
    pdf = pages_pandas(np.arange(len(golden)))
    assert len(pdf) == len(golden)
    for u, t in zip(pdf["url"], pdf["text"]):
        assert hashlib.sha256(t.encode("utf-8")).hexdigest() == golden[u], u


# ------------------------------------------------------------ generator


def test_generate_pages_partition_invariant(spark):
    """Same rows at any parallelism (the determinism contract that
    makes two-cluster-size runs byte-identical)."""
    from lucene_solr_spark.fixtures.pages import generate_pages

    a = generate_pages(spark, 120, partitions=2).orderBy("url").collect()
    b = generate_pages(spark, 120, partitions=16).orderBy("url").collect()
    assert a == b
    assert len(a) == 120
    urls = {r.url for r in a}
    assert len(urls) == 120


def test_generated_schema_matches_input_hint(spark):
    from lucene_solr_spark.fixtures.pages import generate_pages

    df = generate_pages(spark, 10, partitions=2)
    assert [ (f.name, f.dataType.simpleString()) for f in df.schema.fields ] == [
        ("url", "string"),
        ("warc_ts", "timestamp"),
        ("html", "binary"),
        ("text", "string"),
        ("lang", "string"),
    ]


# ---------------------------------------------------------- end-to-end


@pytest.fixture(scope="module")
def pages_index(spark, tmp_path_factory):
    from lucene_solr_spark.fixtures.pages import generate_pages
    from lucene_solr_spark.index.builder import IndexConfig, build_index

    out = str(tmp_path_factory.mktemp("pages_ix") / "ix")
    pages = generate_pages(spark, 400, partitions=8)
    manifest = build_index(
        spark,
        pages,
        out,
        IndexConfig(
            n_shards=4,
            segs_per_shard=2,
            analyzer="standard",
            id_col="url",
            text_col="text",
            sharding="hash",
        ),
    )
    return out, manifest


def test_pages_index_url_keys(spark, pages_index):
    out, manifest = pages_index
    assert manifest["key_kind"] == "s"
    assert manifest["max_doc"] == 400
    dm = spark.read.parquet(f"{out}/doc_map")
    assert dict(dm.dtypes)["key"] == "string"
    rows = dm.orderBy("doc_id").collect()
    assert len(rows) == 400
    assert [r.doc_id for r in rows] == list(range(400))
    # within each segment, urls ascend (codepoint == utf-8 byte order)
    from itertools import groupby

    for g, grp in groupby(rows, key=lambda r: r.g):
        urls = [r.key for r in grp]
        assert urls == sorted(urls)


def test_pages_search_matches_bruteforce_oracle(spark, pages_index):
    from lucene_solr_spark.search.oracle import build_oracle_index, oracle_topk
    from lucene_solr_spark.search.query import BooleanAnd, BooleanOr, TermQuery
    from lucene_solr_spark.search.searcher import IndexSearcher

    out, _ = pages_index
    s = IndexSearcher(spark, out)
    dm = s.doc_map().orderBy("doc_id").collect()
    from lucene_solr_spark.fixtures.pages import pages_pandas

    pdf = pages_pandas(np.arange(400)).set_index("url")
    texts = pdf.loc[[r.key for r in dm]]["text"].reset_index(drop=True)
    ix = build_oracle_index(
        np.array([r.key for r in dm]),
        texts,
        np.array([r.doc_id for r in dm]),
    )
    for q, kind, terms in [
        (TermQuery("table"), "term", ["table"]),
        (TermQuery("caf\xe9"), "term", ["caf\xe9"]),
        (BooleanAnd(("scan", "table")), "and", ["scan", "table"]),
        (BooleanOr(("vector", "render")), "or", ["vector", "render"]),
    ]:
        got = [(r.doc_id, r.score) for r in s.search(q, k=15).collect()]
        want = [(int(d), float(sc)) for d, sc in oracle_topk(ix, kind, terms, 15)]
        assert got == want, (kind, terms)


def test_pages_search_with_url_fetch(spark, pages_index):
    from lucene_solr_spark.search.query import TermQuery
    from lucene_solr_spark.search.searcher import IndexSearcher

    out, _ = pages_index
    s = IndexSearcher(spark, out)
    rows = s.search_with_keys(TermQuery("table"), k=5).collect()
    assert len(rows) == 5
    assert all(r.key.startswith("https://site") for r in rows)
