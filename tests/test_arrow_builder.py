"""Arrow segment-builder equivalence: the JVM-tokenize + pyarrow
dictionary-encode path must produce search results bitwise identical to
the pandas reference path, and the JVM analyzer must match the pandas
analyzer token-for-token."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_SMALL

EDGE_TEXTS = [
    "Hello World the quick",
    "café UPPERCASE O'Neil's state-of-the-art",
    "a an and are 42 3.14159",
    "x" * 300 + " next token",
    "",
    "   ",
    "naïve résumé Mixed-Case",
    "word_with_underscore",
    "don’t stop me",
    "中文 mixed with ascii",
    "tab\tnewline\nsplit",
    "Contact John.Doe+spam@Mail.Example.COM or HTTPS://WWW2.Example.org/p-1?q=a&b=2",
    "see www.foo-bar.com/baz_x and ftp://h0st:21/dir/file.txt now",
    "edge user@localhost @nope http:/broken trailing. u3@m.example.com.",
]


def test_jvm_analyzer_matches_pandas(spark):
    from pyspark.sql import functions as F

    from lucene_solr_spark.analysis.analyzers import (
        tokenize_standard,
        tokenize_standard_with_positions,
    )
    from lucene_solr_spark.analysis.jvm import (
        standard_tokens_col,
        standard_tokens_pos_col,
    )

    df = spark.createDataFrame([(t,) for t in EDGE_TEXTS], "text string")
    jvm = df.select(standard_tokens_col(F.col("text")).alias("t")).collect()
    jvmp = df.select(standard_tokens_pos_col(F.col("text")).alias("t")).collect()
    py = tokenize_standard(pd.Series(EDGE_TEXTS))
    pyp = tokenize_standard_with_positions(pd.Series(EDGE_TEXTS))
    for i in range(len(EDGE_TEXTS)):
        assert list(jvm[i].t) == list(py.iloc[i]), EDGE_TEXTS[i][:40]
        assert [(r.term, r.pos) for r in jvmp[i].t] == list(pyp.iloc[i])


@pytest.mark.parametrize("positions", [False, True])
def test_arrow_engine_identical_to_pandas(spark, tmp_path, positions):
    from lucene_solr_spark.index.builder import IndexConfig, build_index
    from lucene_solr_spark.search.query import (
        BooleanAnd,
        BooleanOr,
        PhraseQuery,
        TermQuery,
    )
    from lucene_solr_spark.search.searcher import IndexSearcher

    src = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    queries = [
        TermQuery("table"),
        BooleanAnd(("scan", "table")),
        BooleanOr(("customer", "spark", "vector")),
    ]
    if positions:
        queries.append(PhraseQuery(("table", "scan")))
    results = {}
    for eng in ("pandas", "arrow"):
        out = str(tmp_path / f"ix_{eng}_{positions}")
        build_index(
            spark, src, out,
            IndexConfig(n_shards=4, segs_per_shard=4, engine=eng,
                        index_positions=positions),
            resume=False,
        )
        s = IndexSearcher(spark, out)
        results[eng] = [
            [(r.doc_id, r.score) for r in s.search(q, k=25).collect()]
            for q in queries
        ]
    assert results["pandas"] == results["arrow"]


def test_arrow_engine_url_keys(spark, tmp_path):
    from lucene_solr_spark.fixtures.pages import generate_pages
    from lucene_solr_spark.index.builder import IndexConfig, build_index
    from lucene_solr_spark.search.query import TermQuery
    from lucene_solr_spark.search.searcher import IndexSearcher

    pages = generate_pages(spark, 200, partitions=4)
    results = {}
    for eng in ("pandas", "arrow"):
        out = str(tmp_path / f"pix_{eng}")
        build_index(
            spark, pages, out,
            IndexConfig(n_shards=2, segs_per_shard=2, id_col="url",
                        text_col="text", sharding="hash", engine=eng),
            resume=False,
        )
        s = IndexSearcher(spark, out)
        results[eng] = [
            (r.doc_id, r.key, r.score)
            for r in s.search_with_keys(TermQuery("table"), k=20).collect()
        ]
    assert results["pandas"] == results["arrow"]


@pytest.mark.parametrize("name", ["simple", "stop", "keyword", "uax29_url_email"])
def test_jvm_extra_analyzers_match_pandas(spark, name):
    """core/SimpleAnalyzer, core/StopAnalyzer, core/KeywordAnalyzer
    analogs: JVM expression == pandas engine token-for-token and
    position-for-position on the edge corpus (incl. the 300-char run,
    which CharTokenizer SPLITS into 255-char chunks rather than
    dropping)."""
    from pyspark.sql import functions as F

    from lucene_solr_spark.analysis.analyzers import ANALYZERS, ANALYZERS_POS
    from lucene_solr_spark.analysis.jvm import JVM_ANALYZERS, JVM_ANALYZERS_POS

    df = spark.createDataFrame([(t,) for t in EDGE_TEXTS], "text string")
    jvm = df.select(JVM_ANALYZERS[name](F.col("text")).alias("t")).collect()
    jvmp = df.select(
        JVM_ANALYZERS_POS[name](F.col("text")).alias("t")
    ).collect()
    py = ANALYZERS[name](pd.Series(EDGE_TEXTS))
    pyp = ANALYZERS_POS[name](pd.Series(EDGE_TEXTS))
    for i in range(len(EDGE_TEXTS)):
        assert list(jvm[i].t) == list(py.iloc[i]), (name, EDGE_TEXTS[i][:40])
        assert [(r.term, r.pos) for r in jvmp[i].t] == list(pyp.iloc[i]), (
            name, EDGE_TEXTS[i][:40],
        )
    # chunk-split semantics: the 300-char run yields a 255+45 pair
    # (not a drop) for the letter tokenizers
    if name in ("simple", "stop"):
        toks = list(py.iloc[3])
        assert len(toks[0]) == 255 and len(toks[1]) == 45


def test_build_and_search_with_extra_analyzers(spark, tmp_path):
    """An index built with analyzer='simple' / 'keyword' round-trips:
    digits split away under simple; keyword matches the verbatim line."""
    from pyspark.sql import functions as F

    from lucene_solr_spark.index.builder import IndexConfig, build_index
    from lucene_solr_spark.search.query import TermQuery
    from lucene_solr_spark.search.searcher import IndexSearcher

    rows = [(0, "Alpha42beta THE gamma"), (1, "alpha beta"), (2, "exact line")]
    src = spark.createDataFrame(rows, "doc_id long, text string")

    out_s = str(tmp_path / "simple")
    build_index(
        spark, src, out_s,
        IndexConfig(n_shards=1, segs_per_shard=1, sharding="range_int",
                    analyzer="simple"),
    )
    s = IndexSearcher(spark, out_s)
    # '42' splits 'Alpha42beta' -> alpha, beta; 'the' is NOT stopped
    assert {r.doc_id for r in s.search(TermQuery("alpha"), k=None).collect()} == {0, 1}
    assert {r.doc_id for r in s.search(TermQuery("the"), k=None).collect()} == {0}
    assert s.search(TermQuery("alpha42beta"), k=None).count() == 0

    out_k = str(tmp_path / "kw")
    build_index(
        spark, src, out_k,
        IndexConfig(n_shards=1, segs_per_shard=1, sharding="range_int",
                    analyzer="keyword"),
    )
    sk = IndexSearcher(spark, out_k)
    assert {r.doc_id for r in sk.search(TermQuery("exact line"), k=None).collect()} == {2}
    assert sk.search(TermQuery("exact"), k=None).count() == 0
