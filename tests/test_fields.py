"""Per-field indexing tests: Term = (field, term) — index/Term.java:36,
FieldInfos.java. The `source` column is indexed as a second analyzed
field with its own postings, norms, df and collection stats."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.functions import bm25
from lucene_solr_spark.search.parser import parse_query
from lucene_solr_spark.search.query import (
    BooleanQuery,
    Clause,
    TermQuery,
)
from lucene_solr_spark.search.searcher import IndexSearcher
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def fielded(spark, tmp_path_factory):
    from lucene_solr_spark.index.builder import IndexConfig, build_index

    out = str(tmp_path_factory.mktemp("fielded") / "ix")
    src = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    build_index(
        spark, src, out,
        IndexConfig(n_shards=2, segs_per_shard=2, id_col="doc_id",
                    text_col="text", extra_fields=("source",),
                    sharding="range_int"),
    )
    return IndexSearcher(spark, out), src


def test_fielded_term_matches_and_scores(fielded):
    s, src = fielded
    hits = s.search(TermQuery("src3", field="source"), k=None).collect()
    want = {r.doc_id for r in src.where(F.col("source") == "src3").collect()}
    assert {r.doc_id for r in hits} == want and len(want) > 0
    # source field: tf=1, doc_len=1 per doc, avgdl=1 -> closed-form BM25
    df = len(want)
    idf = bm25.idf(df, s.max_doc)
    cache = bm25.norm_cache(np.float32(1.0))
    from lucene_solr_spark.functions.smallfloat import encode_norm

    nb = encode_norm(np.array([1], np.int64))[0]
    expect = bm25.score_term(
        np.array([1], np.int64), np.array([nb], np.uint8), idf, cache
    )[0]
    for r in hits:
        assert np.float32(r.score) == np.float32(expect)


def test_default_field_unaffected(fielded, spark, docs_index):
    """Default-field scores are identical with and without the extra
    field indexed (per-field stats isolation)."""
    s, _ = fielded
    s_plain = IndexSearcher(spark, docs_index[0])
    a = [(r.doc_id, r.score) for r in s.search(TermQuery("table"), k=20).collect()]
    b = [(r.doc_id, r.score) for r in s_plain.search(TermQuery("table"), k=20).collect()]
    assert a == b


def test_cross_field_conjunction(fielded):
    s, src = fielded
    q = BooleanQuery(
        (
            Clause("MUST", TermQuery("table")),
            Clause("MUST", TermQuery("src3", field="source")),
        )
    )
    got = s.search(q, k=None).collect()
    text_hits = {r.doc_id for r in s.search(TermQuery("table"), k=None).collect()}
    src_hits = {r.doc_id for r in src.where(F.col("source") == "src3").collect()}
    assert {r.doc_id for r in got} == text_hits & src_hits
    # score = f32(f64(text score) + f64(source score))
    t_scores = dict(
        (r.doc_id, r.score)
        for r in s.search(TermQuery("table"), k=None).collect()
    )
    s_scores = dict(
        (r.doc_id, r.score)
        for r in s.search(TermQuery("src3", field="source"), k=None).collect()
    )
    for r in got:
        want = np.float32(
            np.float64(t_scores[r.doc_id]) + np.float64(s_scores[r.doc_id])
        )
        assert np.float32(r.score) == want


def test_parser_fielded(fielded):
    s, _ = fielded
    q1 = parse_query("source:src3 AND table")
    q2 = BooleanQuery(
        (
            Clause("MUST", TermQuery("src3", field="source")),
            Clause("MUST", TermQuery("table")),
        )
    )
    a = [(r.doc_id, r.score) for r in s.search(q1, k=30).collect()]
    b = [(r.doc_id, r.score) for r in s.search(q2, k=30).collect()]
    assert a == b and len(a) > 0


def test_unknown_field_raises(fielded):
    s, _ = fielded
    with pytest.raises(KeyError):
        s.search(TermQuery("x", field="nope"), k=5).collect()


def test_mtq_expansion_scoped_to_default_field(fielded):
    """Prefix/wildcard/range expansion must not leak field-prefixed
    dictionary entries (regression: PrefixQuery('s') matched the
    internal 'source\\x1d...' keys)."""
    from lucene_solr_spark.index.builder import FIELD_SEP
    from lucene_solr_spark.search.query import (
        PrefixQuery,
        TermRangeQuery,
        WildcardQuery,
    )

    s, src = fielded
    for q in (PrefixQuery("s"), WildcardQuery("s*"), TermRangeQuery("s", "t")):
        terms = s._expand_mtq(q)
        assert terms, q
        assert all(FIELD_SEP not in t for t in terms), q
    # end-to-end: a doc matching only via its source value is NOT a hit
    hits = {r.doc_id for r in s.search(PrefixQuery("src"), k=None).collect()}
    only_source = {
        r.doc_id
        for r in src.where(~F.col("text").rlike(r"(^| )src")).collect()
    }
    assert hits.isdisjoint(only_source)


def test_fielded_mtq_expansion(fielded):
    """Fielded multi-term queries expand against THAT field's
    dictionary only (field-scoped automaton ∩ term-dict seek) and
    return internal field-prefixed keys; unknown fields raise."""
    from lucene_solr_spark.index.builder import FIELD_SEP
    from lucene_solr_spark.search.query import (
        FuzzyQuery,
        PrefixQuery,
        TermRangeQuery,
        WildcardQuery,
    )

    s, src = fielded
    for q in (
        PrefixQuery("src", field="source"),
        WildcardQuery("src?", field="source"),
        TermRangeQuery("src0", "src2", field="source"),
    ):
        terms = s._expand_mtq(q)
        assert terms, q
        assert all(t.startswith(f"source{FIELD_SEP}") for t in terms), q
    fz = s._expand_fuzzy(FuzzyQuery("src3", max_edits=1, field="source"))
    assert fz and all(t.startswith(f"source{FIELD_SEP}") for t in fz)
    with pytest.raises(KeyError):
        s._expand_mtq(PrefixQuery("x", field="nope"))
    # end-to-end: source:src3* matches exactly the src3 docs
    hits = {
        r.doc_id
        for r in s.search(PrefixQuery("src3", field="source"), k=None).collect()
    }
    expect = {r.doc_id for r in src.where(F.col("source") == "src3").collect()}
    assert hits == expect and hits


def test_parser_fielded_prefix_and_range(fielded):
    """Parser: fielded wildcard/prefix/fuzzy clauses and range syntax
    end-to-end (QueryParser.jj Range production)."""
    from lucene_solr_spark.search.query import TermRangeQuery

    s, src = fielded
    a = [
        (r.doc_id, r.score)
        for r in s.search(parse_query("source:src3* AND table"), k=30).collect()
    ]
    assert a
    src3 = {r.doc_id for r in src.where(F.col("source") == "src3").collect()}
    assert {d for d, _ in a} <= src3
    # range through the parser == the TermRangeQuery it compiles to
    p = [
        (r.doc_id, r.score)
        for r in s.search(parse_query("[sc TO so]"), k=30).collect()
    ]
    d = [
        (r.doc_id, r.score)
        for r in s.search(TermRangeQuery("sc", "so"), k=30).collect()
    ]
    assert p == d and p
    # exclusive bounds are strict
    excl = {
        r.doc_id
        for r in s.search(parse_query("{sc TO so}"), k=None).collect()
    }
    incl = {
        r.doc_id
        for r in s.search(parse_query("[sc TO so]"), k=None).collect()
    }
    assert excl <= incl


def test_field_scoped_group_end_to_end(fielded):
    """`source:(src1 OR src3) AND table` == the explicit fielded
    disjunction conjoined with the text term."""
    from lucene_solr_spark.search.query import BooleanQuery, Clause

    s, _ = fielded
    q1 = parse_query("source:(src1 OR src3) AND table")
    q2 = BooleanQuery(
        (
            Clause(
                "MUST",
                BooleanQuery(
                    (
                        Clause("SHOULD", TermQuery("src1", field="source")),
                        Clause("SHOULD", TermQuery("src3", field="source")),
                    )
                ),
            ),
            Clause("MUST", TermQuery("table")),
        )
    )
    a = [(r.doc_id, r.score) for r in s.search(q1, k=30).collect()]
    b = [(r.doc_id, r.score) for r in s.search(q2, k=30).collect()]
    assert a == b and len(a) > 0


def test_classic_rejects_fielded(fielded):
    s, _ = fielded
    with pytest.raises(ValueError):
        s.search_classic(TermQuery("src3", field="source"), k=5)


def test_decode_shard_null_field_is_default(tmp_path):
    """Mixed-generation format: a base index built before the per-field
    norms schema unions with allowMissingColumns, so its norms rows
    arrive with field=None. _decode_shard must treat null as the
    DEFAULT field (norms_map[''] populated) instead of raising
    KeyError at scoring time."""
    import pandas as pd

    from lucene_solr_spark.search import searcher as S

    norms = pd.DataFrame(
        {
            "shard": [0, 0],
            "base": [0, 0],
            "field": [None, "source"],  # None = pre-format-bump base row
            "norms": [bytes([120, 121, 122]), bytes([124, 124, 124])],
        }
    )
    postings = pd.DataFrame(
        {
            "term": pd.Series([], dtype="object"),
            "part": pd.Series([], dtype="int64"),
            "df": pd.Series([], dtype="int64"),
            "df_total": pd.Series([], dtype="int64"),
            "doc_enc": pd.Series([], dtype="object"),
            "tf_enc": pd.Series([], dtype="object"),
        }
    )
    base, norms_map, _lt, _dfs, _ = S._decode_shard(
        postings, norms, default_field="text"
    )
    assert base == 0
    assert list(norms_map[""]) == [120, 121, 122]
    assert list(norms_map["text"]) == [120, 121, 122]
    assert list(norms_map["source"]) == [124, 124, 124]
