"""Payload family: DelimitedPayloadTokenFilter analysis, the .pay
postings stream, and PayloadTermQuery scoring.

Reference semantics pinned here:
- analysis/common/.../payloads/DelimitedPayloadTokenFilter.java:29-37
  (split at the FIRST delimiter; suffix -> payload; no delimiter ->
  null payload) + FloatEncoder.java (Float.parseFloat 4-byte payload).
- core/.../search/payloads/PayloadTermQuery.java:108-181
  (includeSpanScore=false: score = PayloadFunction.docScore) with
  MaxPayloadFunction / MinPayloadFunction / AveragePayloadFunction
  (docScore default 1 when no payloads seen).
"""
from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.index.builder import IndexConfig, build_index
from lucene_solr_spark.search.searcher import IndexSearcher

DOCS = [
    (0, "apple|2.0 banana|1.5 apple|7.25 cherry"),
    (1, "apple banana|3.0"),            # apple with NO payload
    (2, "cherry|9 apple|0.5 apple|-1.5"),
    (3, "apple|bad banana"),            # unparseable suffix -> null
    (4, "banana|4.0 apple|2e1"),        # exponent form parses (2e1=20)
    (5, "date|1|2 apple|0.25"),         # second '|' rides into the suffix
]


def _brute(fn: str, term: str = "apple") -> dict[int, float]:
    """Reference evaluator straight off DOCS (sequential, per the
    PayloadFunction currentScore/docScore contract)."""
    out = {}
    for doc_id, text in DOCS:
        pays, matched = [], False
        for tok in text.split():
            head, _, tail = tok.partition("|")
            if head != term:
                continue
            matched = True
            if _ == "|":
                try:
                    pays.append(np.float32(float(tail)))
                except ValueError:
                    pass
        if not matched:
            continue
        if not pays:
            out[doc_id] = 1.0
        elif fn == "max":
            out[doc_id] = float(max(pays))
        elif fn == "min":
            out[doc_id] = float(min(pays))
        elif fn == "sum":
            out[doc_id] = float(np.float32(sum(float(p) for p in pays)))
        else:
            out[doc_id] = float(
                np.float32(sum(float(p) for p in pays) / len(pays))
            )
    return out


@pytest.fixture(scope="module")
def pay_index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("payidx") / "idx")
    df = spark.createDataFrame(pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    build_index(
        spark, df, out,
        IndexConfig(n_shards=2, segs_per_shard=2,
                    analyzer="delimited_payload", index_positions=True,
                    index_payloads=True),
    )
    return IndexSearcher(spark, out)


def test_analyzer_goldens(spark):
    from lucene_solr_spark.analysis.jvm import delimited_payload_tokens_pos_col

    rows = (
        spark.createDataFrame(
            pd.DataFrame({"text": ["a|1.5 b c|x d|2|3 |z e| f|-0.5"]})
        )
        .select(delimited_payload_tokens_pos_col(F.col("text")).alias("t"))
        .collect()
    )
    toks = [(s["term"], s["pos"], s["pay"]) for s in rows[0].t]
    # first-delimiter split; '|z' -> empty term filtered; 'e|' -> empty
    # suffix -> null; 'd|2|3' -> suffix '2|3' unparseable -> null
    assert toks == [
        ("a", 0, 1.5),
        ("b", 1, None),
        ("c", 2, None),
        ("d", 3, None),
        ("e", 5, None),
        ("f", 6, -0.5),
    ]


@pytest.mark.parametrize("fn", ["max", "min", "avg", "sum"])
def test_payload_functions_vs_brute(pay_index, fn):
    got = {
        r.doc_id: r.score
        for r in pay_index.payload_rows("apple", fn=fn).collect()
    }
    want = _brute(fn)
    assert set(got) == set(want)
    for d in want:
        assert math.isclose(got[d], want[d], rel_tol=1e-6), (fn, d)


def test_payload_topk_order(pay_index):
    rows = pay_index.payload_score_topk("apple", k=3, fn="max").collect()
    want = sorted(_brute("max").items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert [(r.doc_id, r.score) for r in rows] == [
        (d, np.float32(s)) for d, s in want
    ]


def test_payloads_survive_compaction(spark, tmp_path):
    """Delete a doc, compact, re-run the payload query: the .pay
    stream keeps only the alive docs' values (compact.py rewrite).
    Builds its OWN index — delete_by_keys mutates the index dir, so
    the shared module fixture must stay pristine."""
    from lucene_solr_spark.index.compact import compact
    from lucene_solr_spark.index.deletes import delete_by_keys

    ix = str(tmp_path / "own")
    df = spark.createDataFrame(pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    build_index(
        spark, df, ix,
        IndexConfig(n_shards=2, segs_per_shard=2,
                    analyzer="delimited_payload", index_positions=True,
                    index_payloads=True),
    )
    delete_by_keys(spark, ix, [0])
    out = str(tmp_path / "compacted")
    compact(spark, ix, out)
    s2 = IndexSearcher(spark, out)
    got = {
        r.doc_id: r.score for r in s2.payload_rows("apple", fn="max").collect()
    }
    want = _brute("max")
    want.pop(0)
    # compaction renumbers docs; map back through the surviving keys
    keys = {r.doc_id: int(r.key) for r in s2.doc_map().collect()}
    remapped = {keys[d]: v for d, v in got.items()}
    assert remapped == {k: np.float32(v) for k, v in want.items()}


def test_payloadless_index_scores_default(spark, docs_index):
    """An index built WITHOUT payloads has an all-null .pay column:
    every matching doc scores the reference default docScore = 1
    (numPayloadsSeen == 0 for every doc)."""
    s = IndexSearcher(spark, docs_index[0])
    rows = s.payload_rows("table", fn="max").limit(5).collect()
    assert len(rows) > 0
    assert all(r.score == 1.0 for r in rows)


def test_config_validation(spark):
    df = spark.createDataFrame(pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    with pytest.raises(ValueError, match="index_positions"):
        build_index(spark, df, "/tmp/_never",
                    IndexConfig(analyzer="delimited_payload",
                                index_payloads=True))
    with pytest.raises(ValueError, match="payload-bearing"):
        build_index(spark, df, "/tmp/_never",
                    IndexConfig(analyzer="standard", index_positions=True,
                                index_payloads=True))


# ---- SpanPayloadCheckQuery ----------------------------------------------

def test_span_paycheck(spark, pay_index):
    """SpanPayloadCheckQuery.java:118-141: same count + elementwise
    payload equality, collector skips null payloads."""
    from lucene_solr_spark.search.query import (
        SpanNearQuery, SpanPayloadCheckQuery, SpanTermQuery,
    )

    # 'apple' with payload 2.0: only doc 0 ("apple|2.0 ...")
    q = SpanPayloadCheckQuery(SpanTermQuery("apple"), (2.0,))
    assert [r.doc_id for r in pay_index.search(q, k=10).collect()] == [0]
    # payload 0.5 -> doc 2
    q = SpanPayloadCheckQuery(SpanTermQuery("apple"), (0.5,))
    assert [r.doc_id for r in pay_index.search(q, k=10).collect()] == [2]
    # doc 1's 'apple' carries NO payload: collected [] != [anything]
    q = SpanPayloadCheckQuery(SpanTermQuery("apple"), (99.0,))
    assert pay_index.search(q, k=10).collect() == []
    # near(apple, banana, 0, ordered) with payloads (2.0, 1.5): doc 0
    near = SpanNearQuery(
        (SpanTermQuery("apple"), SpanTermQuery("banana")), 0, True
    )
    q = SpanPayloadCheckQuery(near, (2.0, 1.5))
    assert [r.doc_id for r in pay_index.search(q, k=10).collect()] == [0]
    # same near, wrong second payload -> empty
    q = SpanPayloadCheckQuery(near, (2.0, 9.0))
    assert pay_index.search(q, k=10).collect() == []


def test_span_paycheck_score_matches_plain_span(pay_index):
    """A check that every span passes scores EXACTLY like the
    unwrapped span query (FilterSpans preserves freq)."""
    from lucene_solr_spark.search.query import (
        SpanPayloadCheckQuery, SpanTermQuery,
    )

    base = {(r.doc_id, r.score)
            for r in pay_index.search(SpanTermQuery("banana"), k=10).collect()}
    # banana payloads: 1.5 (doc0), 3.0 (doc1), none (doc3), 4.0 (doc4)
    got = {}
    for p in (1.5, 3.0, 4.0):
        q = SpanPayloadCheckQuery(SpanTermQuery("banana"), (p,))
        for r in pay_index.search(q, k=10).collect():
            got[r.doc_id] = r.score
    base_d = dict(base)
    for d, s in got.items():
        assert s == base_d[d]


def test_payload_near_score(pay_index):
    """PayloadNearQuery.java:151-189: score = span score times the
    PayloadFunction docScore over every matched span's payloads."""
    from lucene_solr_spark.search.query import (
        PayloadNearQuery, SpanNearQuery, SpanTermQuery,
    )

    near = SpanNearQuery(
        (SpanTermQuery("apple"), SpanTermQuery("banana")), 0, True
    )
    base = {r.doc_id: r.score
            for r in pay_index.search(near, k=10).collect()}
    # adjacent (apple, banana): doc 0 (pay 2.0, 1.5), doc 1 (apple has
    # no payload, banana 3.0 -> avg over [3.0]), doc 3 (apple null pay,
    # banana none -> no payloads seen -> docScore 1)
    q = PayloadNearQuery(
        (SpanTermQuery("apple"), SpanTermQuery("banana")), 0, True, "avg"
    )
    got = {r.doc_id: r.score for r in pay_index.search(q, k=10).collect()}
    assert set(got) == set(base)
    expect_mult = {0: np.float32((2.0 + 1.5) / 2), 1: np.float32(3.0),
                   3: np.float32(1.0)}
    for d, m in expect_mult.items():
        assert got[d] == np.float32(np.float32(base[d]) * m)
    # max folds differently on doc 0
    qm = PayloadNearQuery(
        (SpanTermQuery("apple"), SpanTermQuery("banana")), 0, True, "max"
    )
    gm = {r.doc_id: r.score for r in pay_index.search(qm, k=10).collect()}
    assert gm[0] == np.float32(np.float32(base[0]) * np.float32(2.0))


def test_explain_payload(pay_index):
    """explain recomposes payload_rows' score bitwise and lists the
    payloads seen; non-matching doc -> {} (Explanation.noMatch)."""
    scores = {r.doc_id: r.score
              for r in pay_index.payload_rows("apple", fn="max").collect()}
    for d, s in scores.items():
        ex = pay_index.explain_payload("apple", d, fn="max")
        assert np.float32(ex["value"]) == np.float32(s)
        if ex["payloads_seen"]:
            assert np.float32(max(ex["payloads"])) == np.float32(s)
        else:
            assert ex["default_applied"] and s == 1.0
    assert pay_index.explain_payload("apple", 999) == {}
