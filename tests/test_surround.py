"""Surround query parser (search/surround.py) — grammar, distance
semantics (slop = opDistance - 1), and the spans-leaf-in-boolean-tree
path it introduces."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_solr_spark.search.query import (
    BooleanQuery,
    PrefixQuery,
    SpanMultiTermQueryWrapper,
    SpanNearQuery,
    SpanOrQuery,
    SpanTermQuery,
    TermQuery,
)
from lucene_solr_spark.search.searcher import IndexSearcher
from lucene_solr_spark.search.surround import surround_query


@pytest.fixture(scope="module")
def searcher(spark, tmp_path_factory):
    """Positional index (spans need index_positions=True)."""
    from lucene_solr_spark.index.builder import IndexConfig, build_index
    from tests.conftest import SF_SMALL

    out = str(tmp_path_factory.mktemp("index") / "surround")
    src = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    build_index(
        spark, src, out,
        IndexConfig(n_shards=4, segs_per_shard=4, index_positions=True),
    )
    return IndexSearcher(spark, out)


def test_infix_distance_ops():
    # W ordered, N unordered, slop = opDistance - 1, default distance 1
    assert surround_query("big 3w scan") == SpanNearQuery(
        (SpanTermQuery("big"), SpanTermQuery("scan")), 2, True
    )
    assert surround_query("big N scan") == SpanNearQuery(
        (SpanTermQuery("big"), SpanTermQuery("scan")), 0, False
    )
    # same-op infix chains collect n-ary: a W b W c == W(a, b, c)
    assert surround_query("a w b w c") == surround_query("w(a, b, c)")


def test_prefix_form_and_or_operand():
    q = surround_query("2N((batch OR big), scan)")
    assert q == SpanNearQuery(
        (
            SpanOrQuery((SpanTermQuery("batch"), SpanTermQuery("big"))),
            SpanTermQuery("scan"),
        ),
        1,
        False,
    )


def test_truncation_lifts_to_wrapper():
    q = surround_query("b* 2w scan")
    assert q.clauses[0] == SpanMultiTermQueryWrapper(PrefixQuery("b"))


def test_boolean_composition_keeps_span_leaf():
    q = surround_query("big 2w scan AND table")
    assert isinstance(q, BooleanQuery)
    assert [c.occur for c in q.clauses] == ["MUST", "MUST"]
    assert isinstance(q.clauses[0].query, SpanNearQuery)
    assert q.clauses[1].query == TermQuery("table")


def test_and_not_rejected_inside_distance():
    with pytest.raises(ValueError):
        surround_query("(a AND b) 2w c")
    with pytest.raises(ValueError):
        surround_query("(a NOT b) 2w c")


def test_case_insensitive_ops_and_terms():
    assert surround_query("BIG 3W SCAN") == surround_query("big 3w scan")


def test_spans_leaf_in_tree_bitwise(searcher):
    """The boolean MUST composition over a spans leaf is bitwise
    f32(f64(span) + f64(term)) — the tree kernel's clause-order
    accumulation (BooleanWeight.java:260-359)."""
    q = surround_query("(batch OR big) 2N scan AND table")
    hits = {
        r.doc_id: np.float32(r.score)
        for r in searcher.search(q, k=None).collect()
    }
    span = {
        r.doc_id: np.float32(r.score)
        for r in searcher.search(
            surround_query("(batch OR big) 2N scan"), k=None
        ).collect()
    }
    term = {
        r.doc_id: np.float32(r.score)
        for r in searcher.search(TermQuery("table"), k=None).collect()
    }
    exp = {
        d: np.float32(np.float64(v) + np.float64(term[d]))
        for d, v in span.items()
        if d in term
    }
    assert hits and set(hits) == set(exp)
    for d in hits:
        assert hits[d].tobytes() == exp[d].tobytes()


def test_spans_leaf_pruned_matches_exhaustive(searcher):
    q = surround_query("(batch OR big) 2N scan AND table")
    a = [(r.doc_id, np.float32(r.score))
         for r in searcher.search(q, k=10, prune=True).collect()]
    b = [(r.doc_id, np.float32(r.score))
         for r in searcher.search(q, k=10, prune=False).collect()]
    assert a == b


def test_explain_tree_with_spans_leaf(searcher):
    """explain over a boolean tree containing a spans leaf recomposes
    the search score bitwise and labels the span clause."""
    q = surround_query("(batch OR big) 2N scan AND table")
    top = searcher.search(q, k=1).first()
    ex = searcher.explain(q, int(top.doc_id))
    assert ex["match"] is True
    assert np.float32(ex["score"]).tobytes() == np.float32(top.score).tobytes()
    clause_kinds = [d["kind"] for d in ex["details"][0]["details"]]
    assert "spans" in clause_kinds and "term" in clause_kinds


def test_not_composition(searcher):
    q = surround_query("big 2w scan NOT table")
    docs = {r.doc_id for r in searcher.search(q, k=None).collect()}
    has_table = {
        r.doc_id for r in searcher.search(TermQuery("table"), k=None).collect()
    }
    assert docs and not (docs & has_table)
